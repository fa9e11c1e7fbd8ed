"""Multi-restart beam-search sweep on the live chip.

Round-2 VERDICT weak #1: graph recall at 1M x 128D plateaus at 0.887
@ef=128 / 0.936 @ef=256 — build-side levers measured recall-neutral, the
single greedy beam's wrong-basin navigation is the limiter. This sweeps
(ef, restarts) on ONE built graph: restarts=R splits the ef budget into R
independent beams seeded from disjoint router partitions / seed bands
(iso-budget), so (ef=256, R=2) costs ~the same device work as
(ef=256, R=1) but attacks basin capture instead of pool width.
"""

import argparse
import dataclasses
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/velesdb_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--metric", default="euclidean")
    ap.add_argument("--queries", type=int, default=256)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--efs", default="128,256")
    ap.add_argument("--restarts", default="1,2,4")
    ap.add_argument("--build-passes", type=int, default=0)
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
    if args.build_passes:
        gp = dataclasses.replace(gp, build_passes=args.build_passes)
    print("params:", gp, flush=True)
    idx = GraphIndex(args.d, metric, gp)
    corpus_dev = jax.device_put(corpus)
    jax.block_until_ready(corpus_dev)
    t0 = time.perf_counter()
    idx.build(corpus, valid, corpus_dev=corpus_dev)
    print(f"build {time.perf_counter() - t0:.1f}s", flush=True)

    _, gt = brute_force_topk(queries, corpus, args.k, metric)
    gt = np.asarray(gt)
    nb = args.queries // args.batch
    for ef in (int(x) for x in args.efs.split(",")):
        for r in (int(x) for x in args.restarts.split(",")):
            idx.params = dataclasses.replace(idx.params, restarts=r)
            # recall over all query batches (batched at the serving batch
            # size so restart folding matches production shapes)
            hits = 0
            t_warm = None
            for i in range(nb):
                qb = queries[i * args.batch : (i + 1) * args.batch]
                t0 = time.perf_counter()
                _, pidx = idx.search(qb, args.k, ef=ef)
                pidx = np.asarray(pidx)
                dt = time.perf_counter() - t0
                if i > 0:  # first batch pays compile
                    t_warm = dt if t_warm is None else min(t_warm, dt)
                for j in range(len(qb)):
                    hits += len(set(pidx[j][pidx[j] >= 0]) & set(gt[i * args.batch + j]))
            rec = hits / (args.queries * args.k)
            qps = args.batch / t_warm if t_warm else 0.0
            print(
                f"ef={ef} R={r}: recall@{args.k}={rec:.4f} "
                f"best-batch={1e3 * (t_warm or 0):.1f}ms ({qps:,.0f} qps)",
                flush=True,
            )


if __name__ == "__main__":
    main()
