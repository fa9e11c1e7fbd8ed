"""Decouple beam width from expansion count at 1M x 128D.

The ef ladder couples beam == expansions, so "ef 256 beats ef 128 by .03"
cannot say WHICH resource binds. This sweeps (beam, expansions)
independently on one cached graph (adjacency persisted to --cache between
runs; the corpus is regenerated deterministically) to locate the recall
bottleneck: pool width (beam), exploration budget (expansions), or
neither (kNN/build quality ceiling).
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
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--metric", default="euclidean")
    ap.add_argument("--queries", type=int, default=256)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--cache", default="/tmp/exp_graph_cache")
    ap.add_argument(
        "--shapes",
        default="128:128,128:256,256:128,256:256,256:512,512:256,512:512",
    )
    ap.add_argument(
        "--probes", default="2",
        help="comma list of entry_probes values; full cross with --shapes",
    )
    ap.add_argument(
        "--entries", type=int, default=0,
        help="entry_points override (0 = GraphParams default)",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from velesdb_tpu.index import graph_index as gmod
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

    os.makedirs(args.cache, exist_ok=True)
    tag = f"{args.n}_{args.d}_{args.metric}"
    gpath = os.path.join(args.cache, f"graph_{tag}.npz")
    gtpath = os.path.join(args.cache, f"gt_{tag}.npz")

    idx = GraphIndex(args.d, metric, GraphParams.auto(args.d, args.n))
    corpus_dev = jax.device_put(corpus)
    jax.block_until_ready(corpus_dev)
    t0 = time.perf_counter()
    if idx.load(gpath, corpus, valid):
        print(f"graph loaded from cache ({time.perf_counter()-t0:.1f}s)", flush=True)
    else:
        idx.build(corpus, valid, corpus_dev=corpus_dev)
        print(f"graph built ({time.perf_counter()-t0:.1f}s)", flush=True)
        idx.save(gpath)

    if os.path.exists(gtpath):
        gt = np.load(gtpath)["gt"]
    else:
        _, gt = brute_force_topk(queries, corpus, args.k, metric)
        gt = np.asarray(gt)
        np.savez_compressed(gtpath, gt=gt)

    b = args.queries
    b_pad = 1 << (b - 1).bit_length()
    qp = jnp.asarray(np.pad(queries, ((0, b_pad - b), (0, 0))))
    router = (
        (idx._route_cents, idx._route_csq, idx._route_rows)
        if idx._route_cents is not None
        else None
    )
    for probes in (int(x) for x in args.probes.split(",")):
        for pair in args.shapes.split(","):
            beam, exp = (int(x) for x in pair.split(":"))
            t0 = time.perf_counter()
            vals, pidx = gmod._beam_search(
                qp, idx._corpus, idx._adj, idx._sqnorm, idx._valid,
                idx._seed_ids, None, None, router,
                k=args.k, beam=beam, expansions=exp, degree=idx._adj.shape[1],
                entry_points=min(args.entries or idx.params.entry_points, beam),
                metric=metric,
                entry_probes=probes,
            )
            pidx = np.asarray(pidx)[:b]
            dt = time.perf_counter() - t0
            rec = np.mean(
                [len(set(pidx[i][pidx[i] >= 0]) & set(gt[i])) / args.k
                 for i in range(b)]
            )
            print(
                f"probes={probes} beam={beam} exp={exp}: "
                f"recall@{args.k}={rec:.4f} ({dt:.1f}s incl compile)",
                flush=True,
            )


if __name__ == "__main__":
    main()
