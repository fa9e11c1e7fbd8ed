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


def test_hybrid_fused_matches_host_fusion(tmp_db_dir, rng):
    """The device-fused RRF path (r4: one readback, on-device fusion) must
    agree with the host ``weighted_rrf`` over the same branch lists —
    including under a filter, per-weight, and with out-of-vocab text."""
    from velesdb_tpu.fusion import weighted_rrf

    db = Database.open(tmp_db_dir)
    c = db.create_collection("h", dim=24, metric="cosine")
    n = 3000
    vecs = rng.standard_normal((n, 24)).astype(np.float32)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    payloads = [
        {"text": f"{words[i % 6]} {words[(i // 6) % 6]}", "price": float(i % 100)}
        for i in range(n)
    ]
    c.upsert_bulk(range(n), vecs, payloads)

    filt = {"type": "lt", "field": "price", "value": 50.0}
    k = 10
    fetch = 2 * k
    for w, f in [(0.5, None), (0.5, filt), (0.3, filt), (1.0, None), (0.0, None)]:
        q = vecs[17] + 0.01 * rng.standard_normal(24).astype(np.float32)
        got = c.hybrid_search(q, "alpha beta", k=k, vector_weight=w, filter=f)
        vec_hits = c.search(q, fetch, filter=f)
        txt_hits = c.text_search("alpha beta", fetch, filter=f)
        want = weighted_rrf(
            [(r.id, r.score) for r in vec_hits],
            [(r.id, r.score) for r in txt_hits],
            k, vector_weight=w,
        )
        want_ids = [vid for vid, s in want if s > 0]
        got_ids = [r.id for r in got]
        # identical candidate sets; order may swap only among exact ties
        assert set(got_ids) == set(want_ids[: len(got_ids)]) or got_ids == want_ids, (
            w, f, got_ids, want_ids)
        want_map = dict(want)
        for r in got:
            assert abs(r.score - want_map[r.id]) < 1e-6, (w, r.id)
        if f is not None:  # filter respected end-to-end
            assert all(r.payload["price"] < 50.0 for r in got)

    # out-of-vocab text: vector ranks alone (host parity: empty text list)
    got = c.hybrid_search(vecs[5], "qwertyuiop", k=5, vector_weight=0.5)
    vec_only = c.search(vecs[5], fetch)
    assert [r.id for r in got] == [r.id for r in vec_only[:5]]


def test_hybrid_quantized_rides_host_rerank_path(tmp_db_dir, rng):
    """SQ8 collections keep the host-fused hybrid (their vector branch IS
    the host-f32 rerank pass) and still find the planted near-duplicate."""
    db = Database.open(tmp_db_dir)
    c = db.create_collection("hq", dim=24, metric="euclidean",
                             storage_mode="sq8")
    n = 2000
    vecs = rng.standard_normal((n, 24)).astype(np.float32)
    c.upsert_bulk(range(n), vecs,
                  [{"text": "alpha" if i % 2 else "beta"} for i in range(n)])
    got = c.hybrid_search(vecs[33], "alpha", k=5, vector_weight=0.8)
    assert got and got[0].id == 33


def test_hybrid_mono_path_engages_and_matches(tmp_db_dir, rng, monkeypatch):
    """r5: the single-program hybrid (`ops/hybrid_mono.py`) must ENGAGE for
    the exact FULL-precision serve (a silent always-fallback would hide a
    5x dispatch-wall regression) and agree id-for-id with the 3-program
    fused form on the same inputs."""
    import velesdb_tpu.ops.hybrid_mono as hm

    calls = []
    orig = hm.hybrid_mono_topk

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(hm, "hybrid_mono_topk", spy)

    db = Database.open(tmp_db_dir)
    c = db.create_collection("hm", dim=24, metric="cosine")
    n = 3000
    vecs = rng.standard_normal((n, 24)).astype(np.float32)
    words = ["alpha", "beta", "gamma", "delta"]
    c.upsert_bulk(
        range(n), vecs,
        [{"text": f"{words[i % 4]} {words[(i // 4) % 4]}",
          "price": float(i % 100)} for i in range(n)],
    )
    filt = {"type": "lt", "field": "price", "value": 50.0}
    q = vecs[17] + 0.01 * rng.standard_normal(24).astype(np.float32)
    got = c.hybrid_search(q, "alpha beta", k=10, vector_weight=0.4,
                          filter=filt)
    assert calls, "mono hybrid path did not engage for exact FULL serve"
    assert all(r.payload["price"] < 50.0 for r in got)

    # force the 3-program form on the SAME collection/inputs and compare
    monkeypatch.setattr(
        c, "_hybrid_mono_dispatch",
        lambda *a, **k: None,
    )
    want = c.hybrid_search(q, "alpha beta", k=10, vector_weight=0.4,
                           filter=filt)
    assert [r.id for r in got] == [r.id for r in want]
    for a, b in zip(got, want):
        assert abs(a.score - b.score) < 1e-6


def test_hybrid_mono_skips_quantized_and_explicit_quality(tmp_db_dir, rng,
                                                          monkeypatch):
    """The mono gate must fall through for quantized storage (vector branch
    is the host rerank pass) — and the fallback still serves correctly."""
    import velesdb_tpu.ops.hybrid_mono as hm

    calls = []
    orig = hm.hybrid_mono_topk

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(hm, "hybrid_mono_topk", spy)

    db = Database.open(tmp_db_dir)
    c = db.create_collection("hq2", dim=24, metric="euclidean",
                             storage_mode="sq8")
    n = 2000
    vecs = rng.standard_normal((n, 24)).astype(np.float32)
    c.upsert_bulk(range(n), vecs,
                  [{"text": "alpha" if i % 2 else "beta"}
                   for i in range(n)])
    got = c.hybrid_search(vecs[33], "alpha", k=5, vector_weight=0.8)
    assert not calls
    assert got and got[0].id == 33
