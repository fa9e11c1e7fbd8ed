"""Concurrency stress: many-thread upsert/search/delete races.

Counterpart of the reference's ``stress_concurrency_tests.rs`` and loom
model-checking suites (SURVEY.md §4). Python's GIL + the collection RLock
replace the lock hierarchy; these tests assert linearizable-enough behavior:
no crashes, no torn reads, every acked write visible, search always coherent.
"""

import threading

import numpy as np
import pytest

from velesdb_tpu.database import Database
from velesdb_tpu.utils.tracing import set_level, span, span_stats


def test_concurrent_upsert_search_delete(tmp_db_dir, rng):
    db = Database.open(tmp_db_dir)
    c = db.create_collection("stress", dim=16)
    n_writers, per_writer = 4, 60
    vecs = rng.standard_normal((n_writers * per_writer, 16)).astype(np.float32)
    errors: list[Exception] = []
    stop = threading.Event()

    def writer(w):
        try:
            for i in range(per_writer):
                vid = w * per_writer + i
                c.upsert(vid, vecs[vid], {"w": w, "i": i})
                if i % 7 == 3:
                    c.delete(vid)
        except Exception as e:  # pragma: no cover
            errors.append(e)

    def searcher():
        try:
            while not stop.is_set():
                hits = c.search(vecs[0], k=5)
                for h in hits:  # coherent rows only
                    assert h.id >= 0 and h.payload is None or "w" in (h.payload or {})
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=writer, args=(w,)) for w in range(n_writers)]
    s_threads = [threading.Thread(target=searcher) for _ in range(2)]
    for t in threads + s_threads:
        t.start()
    for t in threads:
        t.join()
    stop.set()
    for t in s_threads:
        t.join()
    assert not errors, errors

    expected_alive = {
        w * per_writer + i
        for w in range(n_writers)
        for i in range(per_writer)
        if i % 7 != 3
    }
    assert c.count() == len(expected_alive)
    for vid in list(expected_alive)[:20]:
        got = c.get(vid)
        assert got is not None and got[1]["i"] == vid % per_writer
    # store remains fully searchable after the storm
    alive = sorted(expected_alive)[0]
    assert c.search(vecs[alive], k=1)[0].id == alive
    db.close()


def test_concurrent_text_and_vector(tmp_db_dir, rng):
    db = Database.open(tmp_db_dir)
    c = db.create_collection("mix", dim=8)
    vecs = rng.standard_normal((100, 8)).astype(np.float32)
    c.upsert_bulk(range(100), vecs, [{"body": f"doc number {i}"} for i in range(100)])
    errors = []

    def vec_search():
        try:
            for i in range(30):
                c.search(vecs[i % 100], k=3)
        except Exception as e:
            errors.append(e)

    def txt_search():
        try:
            for i in range(30):
                c.text_search(f"number {i}", k=3)
        except Exception as e:
            errors.append(e)

    def mutate():
        try:
            for i in range(30):
                c.upsert(200 + i, rng.standard_normal(8), {"body": f"new {i}"})
        except Exception as e:
            errors.append(e)

    threads = [
        threading.Thread(target=f) for f in (vec_search, txt_search, mutate)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    assert c.count() == 130
    db.close()


def test_tracing_spans():
    set_level("debug")
    try:
        with span("outer", corpus=10) as path:
            assert path == ("outer",)
            with span("inner") as inner_path:
                assert inner_path == ("outer", "inner")
        assert span_stats("outer").count >= 1
        assert span_stats("inner").count >= 1
        with pytest.raises(ValueError):
            with span("failing"):
                raise ValueError("boom")
    finally:
        set_level("warning")
