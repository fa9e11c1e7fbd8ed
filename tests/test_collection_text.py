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


def test_hybrid_mono_composes_assist_cores(tmp_db_dir, rng, monkeypatch):
    """r5 final: the mono hybrid composes the int8-assist vector cores (the
    D<512 FULL-precision serve defaults) instead of falling back to the
    3-program form. On the CPU test mesh the Mosaic kernels can't lower, so
    after the shadows build the Pallas flags are switched off and the
    pure-XLA twins (same shadow arrays, same contract) serve — the dispatch
    ladder is identical either way. Verifies engagement through the PUBLIC
    API and id-for-id agreement with the 3-program form on the same inputs,
    for both assist families."""
    import velesdb_tpu.index.brute as brute_mod
    import velesdb_tpu.ops.bucket_kernel as bk
    import velesdb_tpu.ops.hybrid_mono as hm

    monkeypatch.setattr(brute_mod, "use_pallas", lambda: True)
    monkeypatch.setattr(brute_mod, "BUCKET_MIN_ROWS", 1024)
    # shrink the VMEM chunk model so the 4K-row test corpus spans enough
    # 128-lane buckets to clear _bucket_safe at m = 2*fetch-4
    fake_chunk = lambda b, d, itemsize=4, n=0: 256
    monkeypatch.setattr(bk, "bucket_chunk_for", fake_chunk)
    monkeypatch.setattr(brute_mod, "bucket_chunk_for", fake_chunk)
    saved = (brute_mod._SQ8PD_OK[0], brute_mod._SQ8I_OK[0])
    try:
        _run_assist_mono_case(tmp_db_dir, rng, monkeypatch, hm, brute_mod)
    finally:
        brute_mod._SQ8PD_OK[0], brute_mod._SQ8I_OK[0] = saved


def _run_assist_mono_case(tmp_db_dir, rng, monkeypatch, hm, brute_mod):
    from velesdb_tpu.database import Database

    engaged = []
    orig = hm.hybrid_mono_topk

    def spy(*a, **kw):
        engaged.append(kw.get("vector_core"))
        return orig(*a, **kw)

    monkeypatch.setattr(hm, "hybrid_mono_topk", spy)

    db = Database.open(tmp_db_dir)
    n, d = 4096, 24
    words = ["alpha", "beta", "gamma", "delta"]

    def payloads():
        return [
            {"text": f"{words[i % 4]} {words[(i // 4) % 4]}",
             "price": float(i % 100)} for i in range(n)
        ]

    filt = {"type": "lt", "field": "price", "value": 50.0}

    # build BOTH collections' shadows with the Pallas flags ON (rebuild
    # gates shadow construction on them), then flip the kernel flags off so
    # serve_engine routes to the XLA twins the CPU mesh can run
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    c1 = db.create_collection("hma", dim=d, metric="cosine")
    c1.upsert_bulk(range(n), vecs, payloads())
    c1.refresh_device()
    assert c1._brute._assist_pd is not None

    # far-offset tiny-spread corpus: pd builder refuses (pen_int past the
    # int32 cap), per-row int8 shadow serves — same input as test_streamed
    vecs2 = (rng.standard_normal((n, d)) * 0.001 + 1000.0).astype(np.float32)
    c2 = db.create_collection("hmb", dim=d, metric="euclidean")
    c2.upsert_bulk(range(n), vecs2, payloads())
    c2.refresh_device()
    assert c2._brute._assist_pd is None and c2._brute._assist is not None

    brute_mod._SQ8PD_OK[0] = False
    brute_mod._SQ8I_OK[0] = False

    # per-dim enc-select family
    q = vecs[17] + 0.01 * rng.standard_normal(d).astype(np.float32)
    got = c1.hybrid_search(q, "alpha beta", k=10, vector_weight=0.4,
                           filter=filt)
    assert engaged and engaged[-1] == "assist-pd-xla"
    assert all(r.payload["price"] < 50.0 for r in got)
    monkeypatch.setattr(c1, "_hybrid_mono_dispatch", lambda *a, **kw: None)
    want = c1.hybrid_search(q, "alpha beta", k=10, vector_weight=0.4,
                            filter=filt)
    assert [r.id for r in got] == [r.id for r in want]
    for a, b in zip(got, want):
        assert abs(a.score - b.score) < 1e-6

    # per-row family
    q2 = vecs2[33] + 0.0001 * rng.standard_normal(d).astype(np.float32)
    got2 = c2.hybrid_search(q2, "alpha", k=10, vector_weight=0.6,
                            filter=filt)
    assert engaged[-1] == "assist-xla"
    monkeypatch.setattr(c2, "_hybrid_mono_dispatch", lambda *a, **kw: None)
    want2 = c2.hybrid_search(q2, "alpha", k=10, vector_weight=0.6,
                             filter=filt)
    assert [r.id for r in got2] == [r.id for r in want2]
