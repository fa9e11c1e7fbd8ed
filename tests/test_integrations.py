"""LangChain/LlamaIndex adapter tests (standalone fallback surface)."""

import sys

import numpy as np
import pytest

sys.path.insert(0, "integrations")

from langchain_velesdb import VelesDBVectorStore  # noqa: E402
from llamaindex_velesdb import VelesDBLlamaStore  # noqa: E402


class FakeEmbedder:
    """Deterministic embedding: hash words into a small dense space."""

    def __init__(self, dim=32):
        self.dim = dim

    def _embed(self, text):
        rng = np.random.default_rng(abs(hash(text)) % (2**32))
        return rng.standard_normal(self.dim).astype(np.float32).tolist()

    def embed_documents(self, texts):
        return [self._embed(t) for t in texts]

    def embed_query(self, text):
        return self._embed(text)


def test_langchain_store_roundtrip(tmp_db_dir):
    store = VelesDBVectorStore(FakeEmbedder(), path=tmp_db_dir)
    ids = store.add_texts(
        ["the fox jumps", "coffee is hot", "tea is warm"],
        metadatas=[{"k": 1}, {"k": 2}, {"k": 3}],
    )
    assert len(ids) == 3
    docs = store.similarity_search("coffee is hot", k=1)
    assert docs[0].page_content == "coffee is hot"
    assert docs[0].metadata == {"k": 2}
    pairs = store.similarity_search_with_score("the fox jumps", k=2)
    assert pairs[0][0].page_content == "the fox jumps"
    assert pairs[0][1] == pytest.approx(1.0, abs=1e-5)
    assert store.delete([ids[1]])
    docs = store.similarity_search("coffee is hot", k=3)
    assert all(d.page_content != "coffee is hot" for d in docs)


def test_langchain_mmr_diversifies(tmp_db_dir):
    store = VelesDBVectorStore(FakeEmbedder(), path=tmp_db_dir)
    # two near-duplicates + one distinct
    store.add_texts(["alpha doc", "alpha doc", "omega doc"])
    out = store.max_marginal_relevance_search(
        "alpha doc", k=2, fetch_k=3, lambda_mult=0.3
    )
    contents = [d.page_content for d in out]
    assert "alpha doc" in contents and "omega doc" in contents


def test_langchain_from_texts(tmp_db_dir):
    store = VelesDBVectorStore.from_texts(
        ["a", "b"], FakeEmbedder(), path=tmp_db_dir
    )
    assert len(store.similarity_search("a", k=2)) == 2


def test_llamaindex_store(tmp_db_dir):
    store = VelesDBLlamaStore(path=tmp_db_dir)
    emb = FakeEmbedder()
    nodes = [
        {"node_id": f"n{i}", "embedding": emb._embed(f"text {i}"),
         "text": f"text {i}", "metadata": {"i": i}}
        for i in range(5)
    ]
    ids = store.add(nodes)
    assert ids == [f"n{i}" for i in range(5)]
    res = store.query(emb._embed("text 3"), similarity_top_k=2)
    assert res.ids[0] == "n3" and res.similarities[0] == pytest.approx(1.0, abs=1e-5)
    store.delete("n3")
    res = store.query(emb._embed("text 3"), similarity_top_k=5)
    assert "n3" not in res.ids
