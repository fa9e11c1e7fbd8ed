"""Expand-width sweep at 1M x 128D: QPS AND recall per EXPAND_WIDTH.

Beam steps are latency-bound on TPU: each iteration pays two XLA row
gathers (~200us fixed, nearly byte-count-independent at these sizes) plus
merge top_k, and ef=128 at EXPAND_WIDTH=4 means 32 *sequential* steps.
Widening the expansion (CAGRA multi-expand) keeps the total exploration
budget (`expansions`) constant while cutting the sequential step count —
if steps are latency-bound this converts directly into QPS. The risk is
recall: wider expansion explores more breadth-first (the 2nd..Eth best
candidates expand before their scores are refined), so this sweeps both.
"""

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/velesdb_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from curve import scan_stats  # noqa: E402  (same measurement protocol)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--metric", default="euclidean")
    ap.add_argument("--queries", type=int, default=256)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--cache", default="/tmp/exp_graph_cache")
    ap.add_argument("--efs", default="64,128")
    ap.add_argument("--ews", default="4,8,16,32")
    ap.add_argument("--batches", default="16")
    ap.add_argument("--probes", type=int, default=64)
    ap.add_argument("--entries", type=int, default=96)
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

    tag = f"{args.n}_{args.d}_{args.metric}"
    gpath = os.path.join(args.cache, f"graph_{tag}.npz")
    gtpath = os.path.join(args.cache, f"gt_{tag}.npz")
    params = GraphParams.auto(args.d, args.n)
    idx = GraphIndex(args.d, metric, params)
    t0 = time.perf_counter()
    if not idx.load(gpath, corpus, valid):
        corpus_dev = jax.device_put(corpus)
        idx.build(corpus, valid, corpus_dev=corpus_dev)
        idx.save(gpath)
    print(f"graph ready ({time.perf_counter()-t0:.1f}s)", flush=True)
    if os.path.exists(gtpath):
        gt = np.load(gtpath)["gt"]
    else:
        _, gt = brute_force_topk(queries, corpus, args.k, metric)
        gt = np.asarray(gt)
        np.savez_compressed(gtpath, gt=gt)

    router_args = (idx._route_cents, idx._route_csq, idx._route_rows)
    b = args.queries
    b_pad = 1 << (b - 1).bit_length()
    qp = jnp.asarray(np.pad(queries, ((0, b_pad - b), (0, 0))))

    eiv = idx._entry_ivf
    if eiv is None:
        print("no entry IVF on this graph — legacy entries", flush=True)
        mode, extra, estate = "legacy", (), None
    else:
        e_aux, e_frows = eiv._kernel_state()
        extra = (eiv._centroids, eiv._cent_sq, eiv._parts, e_aux, e_frows)
        mode = "kernel"

        def estate(rest):
            return tuple(rest)

    for ef in (int(x) for x in args.efs.split(",")):
        beam, expansions = idx.params.beam_for_ef(ef, args.k)
        for ew in (int(x) for x in args.ews.split(",")):

            def beam_fn(q, corp, adj, sn, vd, seeds, rc, rs, rr, *rest):
                return gmod._beam_search(
                    q, corp, adj, sn, vd, seeds, None, None, (rc, rs, rr),
                    estate(rest) if estate else None,
                    k=args.k, beam=beam, expansions=expansions,
                    degree=idx._adj.shape[1],
                    entry_points=min(args.entries, beam), metric=metric,
                    entry_probes=(
                        min(args.probes, eiv.c) if eiv is not None
                        else args.probes
                    ),
                    entry_mode=mode, expand_width=ew,
                )

            arrays = (idx._corpus, idx._adj, idx._sqnorm, idx._valid,
                      idx._seed_ids) + router_args + extra
            _, pidx = beam_fn(qp, *arrays)
            pidx = np.asarray(pidx)[:b]
            rec = np.mean(
                [len(set(pidx[i][pidx[i] >= 0]) & set(gt[i])) / args.k
                 for i in range(b)]
            )
            line = f"ef={ef} ew={ew}: recall={rec:.4f}"
            for bsz in (int(x) for x in args.batches.split(",")):
                qps, qps_med = scan_stats(beam_fn, arrays, queries, bsz, args.d)
                line += f"  b={bsz}: {qps/1e3:.2f}K qps (med {qps_med/1e3:.2f}K)"
            print(line, flush=True)


if __name__ == "__main__":
    main()
