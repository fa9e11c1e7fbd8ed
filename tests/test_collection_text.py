"""End-to-end text + hybrid search through Database/Collection.

Counterpart of the reference's integration scenarios over tempdirs
(``tests/integration_scenarios.rs``, SURVEY.md §4).
"""

import numpy as np
import pytest

from velesdb_tpu.database import Database


@pytest.fixture
def coll(tmp_db_dir, rng):
    db = Database.open(tmp_db_dir)
    c = db.create_collection("products", dim=16)
    vecs = rng.standard_normal((6, 16)).astype(np.float32)
    payloads = [
        {"title": "red running shoes", "price": 59},
        {"title": "blue running shorts", "price": 25},
        {"title": "espresso coffee machine", "price": 120},
        {"title": "red coffee mug", "price": 9},
        {"title": "trail running shoes waterproof", "price": 89},
        {"title": "decaf coffee beans", "price": 14},
    ]
    c.upsert_bulk(range(6), vecs, payloads)
    return c, vecs


def test_text_search_ranks_matches(coll):
    c, _ = coll
    hits = c.text_search("running shoes", k=4)
    ids = [h.id for h in hits]
    assert set(ids[:2]) == {0, 4}  # both have running+shoes
    assert all(h.score > 0 for h in hits)
    assert hits[0].payload["title"]


def test_text_search_with_filter(coll):
    c, _ = coll
    hits = c.text_search(
        "coffee", k=5, filter={"type": "lt", "field": "price", "value": 20}
    )
    assert {h.id for h in hits} == {3, 5}


def test_hybrid_search_fuses_branches(coll):
    c, vecs = coll
    # query vector near item 2 (espresso machine), text says "running shoes"
    hits = c.hybrid_search(vecs[2], "running shoes", k=4, vector_weight=0.5)
    ids = {h.id for h in hits}
    assert 2 in ids  # vector branch
    assert ids & {0, 4}  # text branch
    top_vec = c.hybrid_search(vecs[2], "running shoes", k=1, vector_weight=1.0)
    assert top_vec[0].id == 2
    top_txt = c.hybrid_search(vecs[2], "running shoes", k=1, vector_weight=0.0)
    assert top_txt[0].id in (0, 4)


def test_text_index_follows_mutations(coll):
    c, vecs = coll
    assert {h.id for h in c.text_search("coffee", k=5)} == {2, 3, 5}
    c.delete(3)
    assert {h.id for h in c.text_search("coffee", k=5)} == {2, 5}
    c.upsert(7, vecs[0], {"title": "cold brew coffee kit"})
    assert 7 in {h.id for h in c.text_search("coffee", k=5)}


def test_like_mask(coll):
    c, _ = coll
    mask = c.like_mask("%running%")
    slots = set(np.flatnonzero(mask))
    got_ids = {int(c.vectors.occupancy()[0][s]) for s in slots}
    assert got_ids == {0, 1, 4}


def test_text_survives_reopen(tmp_db_dir, rng):
    db = Database.open(tmp_db_dir)
    c = db.create_collection("docs", dim=8)
    c.upsert(1, rng.standard_normal(8).astype(np.float32), {"body": "hello world"})
    c.flush()
    c.close()
    db2 = Database.open(tmp_db_dir)
    c2 = db2.get_collection("docs")
    assert [h.id for h in c2.text_search("hello", k=3)] == [1]
