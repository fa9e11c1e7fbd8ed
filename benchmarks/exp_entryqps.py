"""Entry-stage sizing at 1M x 128D: recall AND device-side QPS.

The beam-shape sweep located the 1M recall limiter at the ENTRY stage
(probes=2 -> 64 moves ef=128 recall 0.9145 -> 0.9555 on the same graph,
same beam). This measures what the wider entry scan costs, with the
amortized scan protocol (64 unique batches / dispatch, forced readback),
to pick the default (entry_probes, entry_points) for GraphParams.auto.
"""

import argparse
import functools
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
    ap.add_argument("--ef", type=int, default=128)
    ap.add_argument("--configs", default="2:16,16:64,32:64,64:64",
                    help="mode:probes:entries triples (mode optional, "
                         "legacy|xla|kernel; default legacy)")
    ap.add_argument("--batches", default="16,256")
    ap.add_argument("--build-probes", type=int, default=0,
                    help="override GraphParams entry_probes at build time "
                         "(forces the entry-IVF even where auto keeps 2)")
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
    if args.build_probes:
        import dataclasses

        params = dataclasses.replace(
            params, entry_probes=args.build_probes,
            entry_points=max(params.entry_points, 96),
        )
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

    beam, expansions = idx.params.beam_for_ef(args.ef, args.k)
    router_args = (idx._route_cents, idx._route_csq, idx._route_rows)

    b = args.queries
    b_pad = 1 << (b - 1).bit_length()
    qp = jnp.asarray(np.pad(queries, ((0, b_pad - b), (0, 0))))

    eiv = idx._entry_ivf
    for triple in args.configs.split(","):
        fields = triple.split(":")
        mode = "legacy" if len(fields) == 2 else fields[0]
        probes, entries = (int(x) for x in fields[-2:])
        if mode != "legacy" and eiv is None:
            print(f"{mode}: no entry IVF on this graph — skipped", flush=True)
            continue

        if mode == "kernel":
            e_aux, e_frows = eiv._kernel_state()
            extra = (eiv._centroids, eiv._cent_sq, eiv._parts, e_aux, e_frows)

            def estate(rest):
                return tuple(rest)
        elif mode == "xla":
            extra = (eiv._centroids, eiv._cent_sq, eiv._parts,
                     eiv._part_scale, eiv._part_minv, eiv._part_rows,
                     eiv._part_sq)

            def estate(rest):
                return (rest[0], rest[1], (rest[2], rest[3], rest[4]),
                        rest[5], rest[6])
        else:
            extra, estate = (), None

        def beam_fn(q, corp, adj, sn, vd, seeds, rc, rs, rr, *rest):
            return gmod._beam_search(
                q, corp, adj, sn, vd, seeds, None, None, (rc, rs, rr),
                estate(rest) if estate else None,
                k=args.k, beam=beam, expansions=expansions,
                degree=idx._adj.shape[1],
                entry_points=min(entries, beam), metric=metric,
                entry_probes=min(probes, eiv.c) if eiv is not None else probes,
                entry_mode=mode,
            )

        arrays = (idx._corpus, idx._adj, idx._sqnorm, idx._valid,
                  idx._seed_ids) + router_args + extra
        # recall eval runs the kernel above its serving batch cap too — the
        # cap is dispatch policy, not a kernel limit
        _, pidx = beam_fn(qp, *arrays)
        pidx = np.asarray(pidx)[:b]
        rec = np.mean(
            [len(set(pidx[i][pidx[i] >= 0]) & set(gt[i])) / args.k
             for i in range(b)]
        )
        line = (f"mode={mode} probes={probes} entries={entries} "
                f"ef={args.ef}: recall={'%.4f' % rec if rec is not None else 'n/a'}")
        for bsz in (int(x) for x in args.batches.split(",")):
            qps, qps_med = scan_stats(beam_fn, arrays, queries, bsz, args.d)
            line += f"  b={bsz}: {qps/1e3:.2f}K qps (med {qps_med/1e3:.2f}K)"
        print(line, flush=True)


if __name__ == "__main__":
    main()
