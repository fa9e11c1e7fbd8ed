"""Recall/QPS curves across engines — ann-benchmarks-style table.

Counterpart of the reference's `benchmarks/benchmark_recall.py` +
criterion suites: for each engine (exact / IVF / graph) sweep the quality
knob and print recall@10 vs QPS, plus the hybrid (vector+BM25+filter)
configuration from BASELINE.json.

Timings here are CLIENT-OBSERVED (one dispatch per batch): on a
remote-attached chip they include the tunnel round trip, which can dominate
(5-40ms swings). bench.py measures device-side throughput via scan batching;
on a locally-attached TPU host the two converge.

Run: python benchmarks/curve.py          (real TPU; ~5-10 min)
     BENCH_N=20000 python benchmarks/curve.py   (quicker)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed_min(fn, iters=8):
    import jax

    jax.block_until_ready(fn()[0])
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn()[0])
        ts.append(time.perf_counter() - t0)
    return min(ts)


def recall(rows, gt):
    rows = np.asarray(rows)
    return sum(
        len(set(rows[i].tolist()) & set(gt[i].tolist())) for i in range(len(gt))
    ) / (len(gt) * gt.shape[1])


def main():
    n = int(os.environ.get("BENCH_N", 200_000))
    d = int(os.environ.get("BENCH_D", 128))
    b = int(os.environ.get("BENCH_BATCH", 256))
    k = 10

    import jax

    from velesdb_tpu.index.brute import BruteForceIndex
    from velesdb_tpu.index.graph_index import GraphIndex
    from velesdb_tpu.index.ivf import IvfIndex
    from velesdb_tpu.index.params import GraphParams
    from velesdb_tpu.ops import DistanceMetric, StorageMode
    from velesdb_tpu.ops.chunked import brute_force_topk

    metric = DistanceMetric.COSINE
    rng = np.random.default_rng(42)
    centers = rng.standard_normal((64, d)).astype(np.float32) * 2.0
    corpus = centers[rng.integers(0, 64, n)] + 0.7 * rng.standard_normal(
        (n, d)
    ).astype(np.float32)
    queries = centers[rng.integers(0, 64, b)] + 0.7 * rng.standard_normal(
        (b, d)
    ).astype(np.float32)
    _, gt = brute_force_topk(queries, corpus, k, metric)

    print(f"# {n:,} x {d}D cosine, k={k}, batch={b}, one chip")
    print(f"{'engine':28s} {'recall@10':>9s} {'ms/batch':>9s} {'QPS':>12s}")

    def report(name, dt, rec):
        print(f"{name:28s} {rec:9.3f} {dt * 1e3:9.2f} {b / dt:12,.0f}")

    exact = BruteForceIndex(d, metric, StorageMode.FULL)
    t0 = time.perf_counter()
    exact.rebuild(corpus, np.ones(n, bool))
    jax.block_until_ready(exact._full)
    print(f"; exact ingest {time.perf_counter() - t0:.1f}s")
    dt = timed_min(lambda: exact.search(queries, k))
    report("exact (fused pallas)", dt, recall(exact.search(queries, k)[1], gt))

    # note: "exact" recall < 1.0 here is MXU-precision tie swapping on
    # boundary-crowded clustered data (10th-score delta <= 1e-3, recall
    # within oracle-top-12 is ~0.99); see CLAUDE.md.

    binary = BruteForceIndex(d, metric, StorageMode.BINARY)
    binary.rebuild(corpus, np.ones(n, bool))
    dt = timed_min(lambda: binary.search(queries, 16 * k))
    _, coarse = binary.search(queries, 16 * k)
    rows = np.asarray(coarse)
    from velesdb_tpu.ops import pairwise_scores as _ps

    reranked = np.stack(
        [
            rows[i][
                np.argsort(
                    -np.asarray(
                        _ps(queries[i : i + 1], corpus[np.maximum(rows[i], 0)], metric)
                    )[0]
                )[:k]
            ]
            for i in range(len(queries))
        ]
    )
    report("binary(32x) + f32 rerank", dt, recall(reranked, gt))

    ivf = IvfIndex(d, metric)
    t0 = time.perf_counter()
    ivf.build(corpus)
    jax.block_until_ready(ivf._parts)
    print(f"; ivf build {time.perf_counter() - t0:.1f}s ({ivf.c} parts, L={ivf.part_len})")
    for nprobe in (4, 8, 16, 32, 64):
        dt = timed_min(lambda: ivf.search(queries, k, nprobe=nprobe))
        report(
            f"ivf nprobe={nprobe}", dt, recall(ivf.search(queries, k, nprobe=nprobe)[1], gt)
        )

    graph = GraphIndex(d, metric, params=GraphParams.auto(d, n))
    t0 = time.perf_counter()
    graph.build(corpus, np.ones(n, bool))
    print(f"; graph build {time.perf_counter() - t0:.1f}s")
    for ef in (64, 128, 256):
        dt = timed_min(lambda: graph.search(queries, k, ef=ef), iters=4)
        report(f"graph ef={ef}", dt, recall(graph.search(queries, k, ef=ef)[1], gt))

    # hybrid config (BASELINE.json): vector + BM25 + ColumnStore filter
    import tempfile

    from velesdb_tpu.database import Database

    db = Database.open(tempfile.mkdtemp(prefix="curve-"))
    c = db.create_collection("hy", dim=d)
    hn = min(n, 20_000)
    c.upsert_bulk(
        range(hn),
        corpus[:hn],
        [
            {"body": f"item {i} topic {i % 40}", "price": i % 500}
            for i in range(hn)
        ],
    )
    flt = {"type": "lt", "field": "price", "value": 250}
    c.hybrid_search(queries[0], "topic 7", k, filter=flt)  # warm
    t0 = time.perf_counter()
    iters = 10
    for i in range(iters):
        c.hybrid_search(queries[i % b], f"topic {i % 40}", k, filter=flt)
    dt = (time.perf_counter() - t0) / iters
    print(
        f"{'hybrid vec+bm25+filter':28s} {'-':>9s} {dt * 1e3:9.2f} "
        f"{1 / dt:12,.0f}  (single query, {hn:,} rows)"
    )


if __name__ == "__main__":
    main()
