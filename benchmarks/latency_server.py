"""Serving-path latency: batch=1 p50/p99 through the REST server, with and
without the micro-batcher, under concurrent clients (VERDICT r2 #7).

Starts an in-process `VelesServer` on a loopback port, fires `CLIENTS`
threads x `CALLS` sequential single-vector searches each, and reports
per-call latency percentiles + achieved QPS for window=0 (no coalescing)
vs window=2ms (concurrent requests share device dispatches).

Run on TPU:  python benchmarks/latency_server.py
Knobs: LAT_N (corpus rows), LAT_D, LAT_CLIENTS, LAT_CALLS.
"""

import json
import os
import sys
import threading
import time
import urllib.request

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/velesdb_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N = int(os.environ.get("LAT_N", 100_000))
D = int(os.environ.get("LAT_D", 768))
CLIENTS = int(os.environ.get("LAT_CLIENTS", 8))
CALLS = int(os.environ.get("LAT_CALLS", 40))


def run(window_ms: float, db_path: str, queries: np.ndarray) -> dict:
    os.environ["VELESDB_BATCH_WINDOW_MS"] = str(window_ms)
    from velesdb_tpu.server.app import make_server

    srv = make_server(db_path, host="127.0.0.1", port=0)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    url = f"http://127.0.0.1:{port}/collections/bench/search"

    # warm: the FIRST request triggers device refresh (H2D of the whole
    # corpus) + the batch-1 compile — minutes through the tunnel
    for _ in range(3):
        body = json.dumps({"vector": queries[0].tolist(), "k": 10}).encode()
        urllib.request.urlopen(
            urllib.request.Request(url, body, {"Content-Type": "application/json"}),
            timeout=900,
        ).read()

    lat: list[list[float]] = [[] for _ in range(CLIENTS)]
    barrier = threading.Barrier(CLIENTS)

    def client(ci: int):
        barrier.wait()
        # one untimed concurrent round: compiles the COALESCED batch shape
        body = json.dumps({"vector": queries[ci].tolist(), "k": 10}).encode()
        urllib.request.urlopen(
            urllib.request.Request(url, body, {"Content-Type": "application/json"}),
            timeout=900,
        ).read()
        barrier.wait()
        for j in range(CALLS):
            q = queries[(ci * CALLS + j) % len(queries)]
            body = json.dumps({"vector": q.tolist(), "k": 10}).encode()
            t0 = time.perf_counter()
            r = urllib.request.urlopen(
                urllib.request.Request(
                    url, body, {"Content-Type": "application/json"}
                ),
                timeout=120,
            )
            r.read()
            lat[ci].append((time.perf_counter() - t0) * 1e3)

    threads = [threading.Thread(target=client, args=(i,)) for i in range(CLIENTS)]
    t0 = time.perf_counter()
    [x.start() for x in threads]
    [x.join() for x in threads]
    wall = time.perf_counter() - t0
    srv.shutdown()
    alll = np.concatenate([np.asarray(x) for x in lat])
    return {
        "window_ms": window_ms,
        "clients": CLIENTS,
        "p50_ms": round(float(np.percentile(alll, 50)), 2),
        "p99_ms": round(float(np.percentile(alll, 99)), 2),
        "qps": round(len(alll) / wall, 1),
    }


def main():
    import shutil
    import tempfile

    tmp = tempfile.mkdtemp(prefix="lat_bench_")
    try:
        from velesdb_tpu.database import Database

        rng = np.random.default_rng(42)
        centers = rng.standard_normal((64, D)).astype(np.float32) * 2.0
        corpus = centers[rng.integers(0, 64, N)] + rng.standard_normal(
            (N, D)
        ).astype(np.float32) * 0.7
        queries = centers[rng.integers(0, 64, 512)] + rng.standard_normal(
            (512, D)
        ).astype(np.float32) * 0.7
        db = Database(tmp)
        c = db.create_collection("bench", dim=D)
        c.upsert_bulk(range(N), corpus)
        c.refresh_device()
        db.close()

        out = [run(0.0, tmp, queries), run(2.0, tmp, queries)]
        print(json.dumps({"config": f"{N}x{D}", "runs": out}))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
