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


# -- graph retriever + agent-memory adapters (r2, VERDICT #9) ----------------


def test_graph_retriever_seed_and_expand(tmp_db_dir):
    import numpy as np

    from integrations.langchain_velesdb_graph import VelesGraphRetriever
    from velesdb_tpu import Database

    rng = np.random.default_rng(0)
    db = Database(tmp_db_dir)
    docs = db.create_collection("docs", dim=8)
    emb = {t: rng.standard_normal(8).astype(np.float32)
           for t in ["alpha", "beta", "gamma", "delta"]}
    for i, t in enumerate(emb):
        docs.upsert(i, emb[t], {"text": t})
    docs.add_edge(0, 1, "REF")
    docs.add_edge(1, 2, "REF")
    retr = VelesGraphRetriever(
        docs, embedding=lambda t: emb[t], seed_k=1, expand_k=4, max_depth=2,
        rel_types=["REF"],
    )
    got = retr.get_relevant_documents("alpha")
    contents = [d.page_content for d in got]
    assert contents[0] == "alpha"
    assert "beta" in contents and "gamma" in contents  # 1- and 2-hop
    assert "delta" not in contents  # disconnected
    assert got[1].metadata["hop_depth"] >= 1
    # low_latency skips expansion
    fast = VelesGraphRetriever(
        docs, embedding=lambda t: emb[t], seed_k=1, low_latency=True
    )
    assert len(fast.get_relevant_documents("alpha")) == 1


def test_chat_and_semantic_memory(tmp_path):
    import numpy as np

    from integrations.langchain_velesdb_graph import (
        VelesChatMemory,
        VelesSemanticMemory,
    )

    rng = np.random.default_rng(1)
    mem = VelesChatMemory(path=str(tmp_path / "a"), dimension=8)
    mem.save_context({"input": "hello"}, {"output": "hi there"})
    mem.save_context({"input": "more"}, {"output": "sure"})
    hist = mem.load_memory_variables({})["history"]
    assert hist.index("Human: hello") < hist.index("AI: sure")
    mem.clear()
    assert mem.load_memory_variables({})["history"] == ""

    emb = {"alpha": rng.standard_normal(8).astype(np.float32)}
    sem = VelesSemanticMemory(
        path=str(tmp_path / "b"),
        embedding=lambda t: emb.get(t, rng.standard_normal(8).astype(np.float32)),
        dimension=8,
        k=2,
    )
    sem.remember("alpha", importance=0.9)
    assert "alpha" in sem.load_memory_variables({"q": "alpha"})["facts"]


# -- graph toolkit: chunk -> extract -> load (r2) ---------------------------


def test_semantic_chunker_boundaries():
    from integrations.graph_toolkit import SemanticChunker

    text = ("Para one sentence a. Sentence b about things.\n\n"
            "Para two starts here and continues with more words. "
            "It has another sentence that makes it long enough to split.")
    chunks = SemanticChunker(chunk_size=80, chunk_overlap=20).chunk(text)
    assert len(chunks) >= 2
    assert all(c.text for c in chunks)
    # overlap: consecutive chunks share text
    joined = "".join(c.text for c in chunks)
    assert "Para two" in joined and len(joined) >= len(text) - 10


def test_heuristic_extractor():
    from integrations.graph_toolkit import HeuristicExtractor

    ents, rels = HeuristicExtractor().extract(
        "Ada Lovelace works at Analytical Engines. "
        "Charles Babbage founded Analytical Engines."
    )
    names = {e.name for e in ents}
    assert "Ada Lovelace" in names and "Analytical Engines" in names
    typed = {(r.source, r.relation_type, r.target) for r in rels}
    assert ("Ada Lovelace", "WORKS_AT", "Analytical Engines") in typed
    assert ("Charles Babbage", "FOUNDED", "Analytical Engines") in typed


def test_llm_extractor_contract():
    import json

    from integrations.graph_toolkit import LLMExtractor

    def fake_llm(prompt):
        return "sure! " + json.dumps({
            "entities": [{"name": "Mars", "type": "Planet"}],
            "relations": [{"source": "Mars", "target": "Sun",
                           "type": "ORBITS"}],
        })

    ents, rels = LLMExtractor(fake_llm).extract("whatever")
    assert ents[0].entity_type == "Planet"
    assert rels[0].relation_type == "ORBITS"
    assert LLMExtractor(lambda p: "garbage").extract("x") == ([], [])


def test_graph_loader_end_to_end(tmp_db_dir):
    from integrations.graph_toolkit import GraphLoader, SemanticChunker
    from integrations.langchain_velesdb_graph import VelesGraphRetriever
    from velesdb_tpu import Database

    db = Database(tmp_db_dir)
    coll = db.create_collection("kg", dim=16)
    loader = GraphLoader(coll)
    stats = loader.load_document(
        "Marie Curie works at Sorbonne University. "
        "Pierre Curie married to Marie Curie.",
        chunker=SemanticChunker(chunk_size=200, chunk_overlap=40),
    )
    assert stats["entities"] >= 3 and stats["relations"] >= 2
    assert stats["chunks"] >= 1
    # idempotent entity ids: re-loading does not duplicate nodes
    before = coll.count()
    loader2 = GraphLoader(coll)
    loader2.load_document("Marie Curie works at Sorbonne University.")
    rows = coll.execute_match(
        "MATCH (a)-[:WORKS_AT]->(b) RETURN a.name AS a, b.name AS b"
    )
    assert ("Marie Curie", "Sorbonne University") in {
        (r["a"], r["b"]) for r in rows
    }
    # the loaded graph is traversable by the RAG retriever via MENTIONS
    chunk_id = stats["chunk_ids"][0]
    got = coll.get(chunk_id)
    assert got is not None and got[1]["kind"] == "chunk"
    nbrs = coll.neighbors(chunk_id, "out", "MENTIONS")
    assert len(nbrs) >= 1
    db.close()
