"""Micro-batching coalescer: concurrent single searches share dispatches.

TPU-first serving: one streamed search costs ~the same at B=1 and B=256,
so the server coalesces concurrent requests (`utils/batcher.py`), the
moral equivalent of the reference's rayon `search_batch_parallel` for
hardware where batching, not threading, is the throughput lever.
"""

import os
import threading

import numpy as np
import pytest

from velesdb_tpu import Database
from velesdb_tpu.utils.batcher import MicroBatcher


@pytest.fixture
def coll(tmp_path):
    db = Database(str(tmp_path / "db"))
    c = db.create_collection("c", dim=16)
    rng = np.random.default_rng(0)
    c.upsert_bulk(range(500), rng.standard_normal((500, 16)).astype(np.float32))
    yield c
    db.close()


def test_concurrent_searches_coalesce_and_match_direct(coll):
    rng = np.random.default_rng(1)
    vecs = np.array(coll.vectors.slot_view()[:64])
    bt = MicroBatcher(coll, window_ms=25.0, max_batch=64)
    results = [None] * 32
    # park the worker on a first request so the rest land in one window
    barrier = threading.Barrier(32)

    def go(i):
        barrier.wait()
        results[i] = bt.search(vecs[i], k=3)

    threads = [threading.Thread(target=go, args=(i,)) for i in range(32)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    bt.stop()
    for i in range(32):
        assert results[i][0]["id"] == i  # self is nearest
        assert len(results[i]) == 3
    # at least some coalescing happened (timing-dependent, so be lenient)
    assert bt.batches < 32
    assert bt.coalesced > 0


def test_mixed_k_and_errors(coll):
    bt = MicroBatcher(coll, window_ms=5.0)
    v = np.array(coll.vectors.slot_view()[7])
    r5 = bt.search(v, k=5)
    r1 = bt.search(v, k=1)
    assert len(r5) == 5 and len(r1) == 1 and r1[0]["id"] == 7
    with pytest.raises(ValueError):
        bt.search(np.zeros(3, np.float32), k=2)  # dim mismatch propagates
    # the worker survives errors
    assert bt.search(v, k=2)[0]["id"] == 7
    bt.stop()


def test_server_route_uses_batcher(tmp_path, monkeypatch):
    import json as _json
    import urllib.request

    monkeypatch.setenv("VELESDB_BATCH_WINDOW_MS", "10")
    from velesdb_tpu.server.app import make_server

    httpd = make_server(str(tmp_path / "srv"), host="127.0.0.1", port=0)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"

    def req(method, path, body=None):
        data = _json.dumps(body).encode() if body is not None else None
        r = urllib.request.Request(
            base + path, data=data, method=method,
            headers={"Content-Type": "application/json"} if data else {},
        )
        with urllib.request.urlopen(r) as resp:
            return _json.loads(resp.read().decode())

    req("POST", "/collections", {"name": "c", "dim": 8})
    rng = np.random.default_rng(0)
    vecs = rng.standard_normal((100, 8)).astype(np.float32)
    req("PUT", "/collections/c/points",
        {"points": [{"id": i, "vector": vecs[i].tolist()} for i in range(100)]})

    out = [None] * 8

    def go(i):
        out[i] = req("POST", "/collections/c/search",
                     {"vector": vecs[i].tolist(), "k": 2})

    threads = [threading.Thread(target=go, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for i in range(8):
        assert out[i]["results"][0]["id"] == i
    app = httpd.app
    assert app.batch_window_ms == 10.0 and app._batchers  # engaged
    httpd.shutdown()
    app.db.close()
