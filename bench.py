"""Headline benchmark: ANN QPS/chip at recall@10 >= 0.95.

Mirrors the reference's flagship configuration (BASELINE.md: 9.2K QPS at
recall@10=0.988 on 10K x 768D cosine, k=10 — `docs/BENCHMARKS.md:58`) but at
10x the corpus (100K x 768D) since batched TPU search does not slow down
meaningfully until HBM streaming dominates. `vs_baseline` divides our QPS by
the reference's 9,200 QPS headline.

Device->host transfers through the remote TPU tunnel carry multi-second
latency, so everything (ground truth, recall accounting) stays on device;
the whole run reads back a handful of scalars.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Env knobs: BENCH_N, BENCH_D, BENCH_QUERIES, BENCH_BATCH.
"""

import json
import os
import sys
import time

import numpy as np

REFERENCE_QPS = 9200.0  # docs/BENCHMARKS.md:58 (10K x 768D, Balanced, k=10)


def make_clustered(rng, n, d, n_clusters=64):
    """Clustered Gaussians — the reference's recall-suite data model
    (`recall_validation.rs`, `benchmarks/benchmark_recall.py:27-50`)."""
    centers = rng.standard_normal((n_clusters, d)).astype(np.float32) * 2.0
    assign = rng.integers(0, n_clusters, n)
    return centers[assign] + rng.standard_normal((n, d)).astype(np.float32) * 0.7


def main():
    n = int(os.environ.get("BENCH_N", 100_000))
    d = int(os.environ.get("BENCH_D", 768))
    n_queries = int(os.environ.get("BENCH_QUERIES", 2048))
    batch = int(os.environ.get("BENCH_BATCH", 256))
    k = 10

    import functools

    import jax
    import jax.numpy as jnp

    from velesdb_tpu.index.graph_index import GraphIndex
    from velesdb_tpu.index.params import GraphParams
    from velesdb_tpu.ops import DistanceMetric
    from velesdb_tpu.ops.chunked import brute_force_topk

    metric = DistanceMetric.COSINE
    rng = np.random.default_rng(42)
    corpus = make_clustered(rng, n, d)
    queries = make_clustered(rng, n_queries, d)
    valid = np.ones(n, bool)

    t0 = time.perf_counter()
    index = GraphIndex(d, metric, params=GraphParams.auto(d, n))
    index.build(corpus, valid)
    build_s = time.perf_counter() - t0
    build_rate = n / build_s

    # exact ground truth, kept on device
    _, gt = brute_force_topk(queries, corpus, k, metric, return_device=True)

    @jax.jit
    def hits_in(ann_idx, gt_idx):
        # for each ground-truth id: is it anywhere in the ANN list?
        eq = (ann_idx[:, :, None] == gt_idx[:, None, :]) & (gt_idx[:, None, :] >= 0)
        return jnp.sum(jnp.any(eq, axis=1))

    chosen = None
    for ef in (128, 192, 256, 384, 512, 768):
        hits = None
        for s in range(0, n_queries, batch):
            _, idx = index.search(queries[s : s + batch], k, ef=ef)
            h = hits_in(idx, jax.lax.dynamic_slice_in_dim(gt, s, batch))
            hits = h if hits is None else hits + h
        recall = float(hits) / (n_queries * k)  # ONE scalar readback per ef
        if recall >= 0.95:
            chosen = (ef, recall)
            break
    if chosen is None:
        chosen = (ef, recall)  # report best-effort; vs_baseline still honest
    ef, recall = chosen

    # throughput: steady-state batched QPS on one chip (no readbacks timed)
    for _ in range(3):  # warmup/compile
        jax.block_until_ready(index.search(queries[:batch], k, ef=ef)[0])
    iters = 20
    t0 = time.perf_counter()
    for i in range(iters):
        s = (i * batch) % max(n_queries - batch, 1)
        jax.block_until_ready(index.search(queries[s : s + batch], k, ef=ef)[0])
    dt = time.perf_counter() - t0
    qps = iters * batch / dt

    print(
        json.dumps(
            {
                "metric": (
                    f"ANN QPS/chip at recall@10={recall:.3f} "
                    f"({n}x{d}D cosine, k={k}, ef={ef}; "
                    f"build {build_rate:,.0f} vec/s)"
                ),
                "value": round(qps, 1),
                "unit": "qps",
                "vs_baseline": round(qps / REFERENCE_QPS, 2),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
