"""Measure graph-index build time + search recall on the live chip.

VERDICT round-1 #2: build must be sub-quadratic (<10s warm @100K) and beam
recall must reach >=0.95 @ ef=128. Compares exact-kNN vs IVF-bucketed builds.
"""

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/velesdb_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--d", type=int, default=768)
    ap.add_argument("--metric", default="cosine")
    ap.add_argument("--force-exact-knn", action="store_true")
    ap.add_argument("--degree", type=int, default=0)
    ap.add_argument("--knn-k", type=int, default=0)
    ap.add_argument("--alpha", type=float, default=0.0)
    ap.add_argument("--entry-points", type=int, default=0)
    ap.add_argument("--build-nprobe", type=int, default=0)
    ap.add_argument("--build-passes", type=int, default=0)
    ap.add_argument("--refine-rounds", type=int, default=-1)
    ap.add_argument("--seed-sample", type=int, default=0)
    ap.add_argument("--restarts", type=int, default=0)
    ap.add_argument("--ef", type=int, default=128)
    ap.add_argument("--queries", type=int, default=256)
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()

    import jax

    from velesdb_tpu.index.graph_index import GraphIndex
    from velesdb_tpu.index.params import GraphParams
    from velesdb_tpu.ops import DistanceMetric
    from velesdb_tpu.ops.chunked import brute_force_topk

    rng = np.random.default_rng(42)
    centers = rng.standard_normal((64, args.d)).astype(np.float32) * 2.0
    corpus = centers[rng.integers(0, 64, args.n)] + rng.standard_normal(
        (args.n, args.d)
    ).astype(np.float32) * 0.7
    queries = centers[rng.integers(0, 64, args.queries)] + rng.standard_normal(
        (args.queries, args.d)
    ).astype(np.float32) * 0.7
    valid = np.ones(args.n, bool)
    metric = DistanceMetric.parse(args.metric)

    gp = GraphParams.auto(args.d, args.n)
    import dataclasses

    overrides = {
        k: v
        for k, v in (
            ("degree", args.degree),
            ("knn_k", args.knn_k),
            ("alpha", args.alpha),
            ("entry_points", args.entry_points),
            ("build_nprobe", args.build_nprobe),
            ("build_passes", args.build_passes),
            ("refine_rounds", args.refine_rounds if args.refine_rounds >= 0 else 0),
            ("seed_sample", args.seed_sample),
            ("restarts", args.restarts),
        )
        if v
    }
    if overrides:
        gp = dataclasses.replace(gp, **overrides)
    print("params:", gp)
    idx = GraphIndex(args.d, metric, gp)
    if args.force_exact_knn:
        idx.EXACT_KNN_MAX_ROWS = 10**9
    # collection context: the corpus is already device-resident (brute._full)
    corpus_dev = jax.device_put(corpus)
    jax.block_until_ready(corpus_dev)
    t0 = time.perf_counter()
    idx.build(corpus, valid, corpus_dev=corpus_dev)
    build_cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    idx.build(corpus, valid, corpus_dev=corpus_dev)
    build_warm = time.perf_counter() - t0

    _, gt = brute_force_topk(queries, corpus, args.k, metric)
    for ef in (64, args.ef, 256):
        t0 = time.perf_counter()
        _, pidx = idx.search(queries, args.k, ef=ef)
        ms = (time.perf_counter() - t0) * 1e3
        pidx = np.asarray(pidx)
        rec = np.mean(
            [len(set(pidx[i]) & set(gt[i])) / args.k for i in range(args.queries)]
        )
        # second timed call (compiled)
        t0 = time.perf_counter()
        _, pidx = idx.search(queries, args.k, ef=ef)
        np.asarray(pidx)
        ms2 = (time.perf_counter() - t0) * 1e3
        print(
            f"ef={ef}: recall@{args.k}={rec:.4f} first={ms:.0f}ms "
            f"warm={ms2:.1f}ms ({args.queries/ms2*1e3:.0f} qps)"
        )
    print(
        f"build cold={build_cold:.1f}s warm={build_warm:.1f}s "
        f"({args.n/max(build_warm,1e-9):,.0f} vec/s warm) n={args.n} d={args.d}"
    )


if __name__ == "__main__":
    main()
