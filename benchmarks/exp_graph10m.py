"""Beyond-scan-scale serving: graph vs SQ8 scan at 10M x 128D, one v5e.

The graph engine's niche is the corpus size where full scans stop being
cheap: scan QPS falls linearly with N while beam steps are ~N-free (the
entry probe scans partitions, ~sqrt(N)). At the 1M flagship the SQ8 scan
still wins small-batch (26.5K vs 7.7K); this experiment measures the
crossover point's far side — 10M rows on one chip (corpus f32 5.1GB +
adjacency 1.3GB + SQ8 entry-IVF ~1.4GB + int8 scan copy 1.3GB ≈ 9.3GB).

Outputs graph QPS/recall at the downshift rung (ef=16) and ef=64 vs the
sq8-int8 bucket scan, both on the host-f32 oracle basis (id + eps).

Graph + ground truth cache under --cache (build ~20-30 min warm once).

Run: python benchmarks/exp_graph10m.py [--n 10000000]
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


def host_gt(queries, corpus, k, chunk=1_000_000):
    """Exact host-f32 oracle over the full corpus, chunked: returns
    (kth_dist, ids). Euclidean squared-distance basis."""
    b = queries.shape[0]
    qsq = np.sum(queries.astype(np.float64) ** 2, axis=1)
    best_d = np.full((b, k), np.inf)
    best_i = np.full((b, k), -1, np.int64)
    for s in range(0, corpus.shape[0], chunk):
        blk = corpus[s : s + chunk].astype(np.float32)
        dots = queries @ blk.T
        csq = np.sum(blk.astype(np.float64) ** 2, axis=1)
        d = qsq[:, None] - 2.0 * dots + csq[None, :]
        part = np.argpartition(d, k - 1, axis=1)[:, :k]
        pd = np.take_along_axis(d, part, axis=1)
        cand_d = np.concatenate([best_d, pd], axis=1)
        cand_i = np.concatenate([best_i, part + s], axis=1)
        order = np.argsort(cand_d, axis=1)[:, :k]
        best_d = np.take_along_axis(cand_d, order, axis=1)
        best_i = np.take_along_axis(cand_i, order, axis=1)
    return best_d, best_i


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10_000_000)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--queries", type=int, default=128)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--cache", default="/tmp/exp_graph_cache")
    ap.add_argument("--capacity", action="store_true",
                    help="quantized traversal, no f32 corpus at serve "
                         "(true 4x rows/chip; required for 10M x 128D)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from curve import scan_stats  # measurement protocol
    from velesdb_tpu.index import graph_index as gmod
    from velesdb_tpu.index.graph_index import GraphIndex
    from velesdb_tpu.index.params import GraphParams
    from velesdb_tpu.ops import DistanceMetric

    # align N to the graph pad quantum: the padded device corpus then
    # ALIASES the build upload instead of copying 4GB+ (r3d OOM)
    N, D, K = (args.n // 1024) * 1024, args.d, args.k
    metric = DistanceMetric.EUCLIDEAN
    rng = np.random.default_rng(42)
    # cluster sizes match the 1M flagship recipe (64 centers per 1M rows)
    n_cent = max(64, (N // 1_000_000) * 64)
    centers = rng.standard_normal((n_cent, D)).astype(np.float32) * 2.0
    corpus = np.empty((N, D), np.float32)
    step = 1_000_000
    for s in range(0, N, step):
        e = min(s + step, N)
        corpus[s:e] = centers[rng.integers(0, n_cent, e - s)]
        corpus[s:e] += rng.standard_normal((e - s, D)).astype(np.float32) * 0.7
    queries = centers[rng.integers(0, n_cent, args.queries)]
    queries = queries + rng.standard_normal(
        (args.queries, D)
    ).astype(np.float32) * 0.7
    valid = np.ones(N, bool)
    print(f"corpus ready {N}x{D} ({corpus.nbytes/1e9:.1f}GB)", flush=True)

    os.makedirs(args.cache, exist_ok=True)
    tag = f"{N}_{D}_euclidean"
    gpath = os.path.join(args.cache, f"graph_{tag}.npz")
    gtpath = os.path.join(args.cache, f"gt_{tag}.npz")

    params = GraphParams.auto(D, N)
    if args.capacity:
        # quantized traversal, no f32 corpus at serve: SQ8 codes 1.28GB +
        # adjacency 2.56GB at 10M x 128D vs 5.1GB for the f32 corpus alone
        import dataclasses

        params = dataclasses.replace(
            params, quantized_traversal=True, traversal_rerank=False
        )
    idx = GraphIndex(D, metric, params)
    t0 = time.perf_counter()
    if idx.load(gpath, corpus, valid):
        print(f"graph loaded ({time.perf_counter()-t0:.1f}s)", flush=True)
    else:
        t0 = time.perf_counter()
        corpus_dev = jax.device_put(corpus)
        jax.block_until_ready(corpus_dev)
        print(f"H2D upload: {time.perf_counter()-t0:.1f}s", flush=True)
        t0 = time.perf_counter()
        idx.build(corpus, valid, corpus_dev=corpus_dev)
        del corpus_dev  # idx._corpus is its own padded copy; free 5.1GB
        print(f"graph built ({time.perf_counter()-t0:.1f}s = "
              f"{N/(time.perf_counter()-t0)/1e3:.1f}K vec/s)", flush=True)
        t0 = time.perf_counter()
        idx.save(gpath)
        print(f"graph saved ({time.perf_counter()-t0:.1f}s)", flush=True)

    if os.path.exists(gtpath):
        z = np.load(gtpath)
        gt, gt_kth = z["gt"], z["kth"]
    else:
        t0 = time.perf_counter()
        gt_d, gt = host_gt(queries, corpus, K)
        gt_kth = gt_d[:, -1]
        np.savez_compressed(gtpath, gt=gt, kth=gt_kth)
        print(f"host GT ({time.perf_counter()-t0:.1f}s)", flush=True)

    def score(pidx):
        """(id-recall, eps-recall) vs the host oracle."""
        b = args.queries
        rid = np.mean(
            [len(set(pidx[i][pidx[i] >= 0]) & set(gt[i])) / K
             for i in range(b)]
        )
        hits = 0
        for i in range(b):
            ids = pidx[i][pidx[i] >= 0]
            if len(ids) == 0:
                continue
            d = np.sum((corpus[ids].astype(np.float64)
                        - queries[i].astype(np.float64)) ** 2, axis=1)
            hits += int(np.sum(d <= gt_kth[i] * 1.002 + 1e-9))
        return rid, min(hits / float(b * K), 1.0)

    # -- graph serve path (entry kernel + ew from params) ----------------
    _beam = functools.partial(
        jax.jit,
        static_argnames=(
            "k", "beam", "expansions", "degree", "entry_points", "metric",
            "entry_probes", "entry_mode", "expand_width",
        ),
    )(gmod.beam_search_impl)
    router = (
        (idx._route_cents, idx._route_csq, idx._route_rows)
        if idx._route_cents is not None else None
    )
    eiv = idx._entry_ivf
    from velesdb_tpu.ops.pallas_kernels import use_pallas
    kernel_entry = eiv is not None and use_pallas()
    if kernel_entry:
        e_aux, e_frows = eiv._kernel_state()
        entry_args = (eiv._centroids, eiv._cent_sq, eiv._parts, e_aux,
                      e_frows)
        mode, probes = "kernel", min(idx.params.entry_probes, eiv.c)
    else:
        entry_args = ()
        mode, probes = "legacy", idx.params.entry_probes
    print(f"entry mode={mode} probes={probes} ew={idx.params.expand_width}",
          flush=True)

    n_router = 3 if router is not None else 0
    # capacity mode: SQ8 codes ARE the traversal corpus, no f32 rerank head
    corpus_op = idx._sq8trav if idx._sq8trav is not None else idx._corpus
    rerank_op = idx._corpus if idx._sq8trav is not None else None

    def beam_fn(q, corp, adj, sn, vd, seeds, *rest, _b, _e):
        rt = tuple(rest[:n_router]) if router is not None else None
        estate = tuple(rest[n_router:n_router + 5]) if mode == "kernel" else None
        return _beam(
            q, corp, adj, sn, vd, seeds, None, rerank_op, rt, estate,
            k=K, beam=_b, expansions=_e, degree=adj.shape[1],
            entry_points=min(idx.params.entry_points, _b), metric=metric,
            entry_probes=probes, entry_mode=mode,
            expand_width=idx.params.expand_width,
        )

    def direct_qps(fn, ops, batch, reps=4):
        """Big-batch direct-dispatch timing: no lax.scan (XLA relayouts the
        giant read-only operands into padded scan-constant copies — +11GB
        at 6M, r3d). At batch>=1024 device time >> tunnel RTT, so a direct
        dispatch is within ~20% of the scan protocol; treat as a LOWER
        bound. Unique inputs per rep + forced readback per the protocol."""
        rng_t = np.random.default_rng(11)
        best = float("inf")
        qb = np.resize(queries, (batch, D))
        for r in range(reps + 1):
            qx = jnp.asarray(
                qb + rng_t.standard_normal((batch, D)).astype(np.float32) * 0.01
            )
            t0 = time.perf_counter()
            v, i = fn(qx, *ops)
            jax.device_get((v[0, 0], i[0, 0]))
            dt = time.perf_counter() - t0
            if r > 0:  # rep 0 pays compile
                best = min(best, dt)
        return batch / best

    ops = ((corpus_op, idx._adj, idx._sqnorm, idx._valid, idx._seed_ids)
           + (tuple(router) if router else ()) + entry_args)
    for ef in (16, 64):
        beam, exp = idx.params.beam_for_ef(ef, K)
        fn = functools.partial(beam_fn, _b=beam, _e=exp)
        # recall on the real query set — print BEFORE timing so a timing
        # failure cannot lose it
        qp = jnp.asarray(queries)
        _, pidx = fn(qp, *ops)
        rid, reps_r = score(np.asarray(pidx))
        print(f"graph ef={ef}: recall={rid:.4f} eps={reps_r:.4f}",
              flush=True)
        # b=1024 is the largest batch whose [B, probes] i32 entry table
        # fits the SMEM prefetch budget (ops/ivf_kernel.SMEM_PROBE_BYTES;
        # b=4096 failed Mosaic compile on-chip)
        for b in (1024,):
            qps = direct_qps(fn, ops, b, reps=6)
            print(f"graph ef={ef} b={b} (direct): {qps/1e3:.2f}K qps",
                  flush=True)

    # -- SQ8 int8-direct scan comparison ---------------------------------
    from velesdb_tpu.ops.bucket_kernel import (
        bucket_chunk_for, sq8_int8_rows, sq8i_bucket_topk,
    )
    from velesdb_tpu.ops.quantization import sq8_dequantize, sq8_quantize

    # capacity mode already holds the SQ8 codes; otherwise quantize the f32
    sq8 = idx._sq8trav if idx._sq8trav is not None else sq8_quantize(idx._corpus)
    rows8 = sq8_int8_rows(sq8.codes)
    n_pad = sq8.codes.shape[0]
    if n_pad * D * 4 > 2 << 30:
        # chunked dequantized norms: the full 10M x 128D f32 dequantize is
        # a 5.1GB transient next to the resident graph arrays
        dn = jnp.concatenate([
            jnp.sum(
                (sq8.codes[s:s + 1_048_576].astype(jnp.float32)
                 * sq8.scale[s:s + 1_048_576, None]
                 + sq8.minv[s:s + 1_048_576, None]) ** 2,
                axis=1,
            )
            for s in range(0, n_pad, 1_048_576)
        ])
    else:
        deq = sq8_dequantize(sq8)
        dn = jnp.sum(deq * deq, axis=1)
        del deq
    pen = jnp.where(idx._valid, dn, jnp.inf)
    for b in (16, 256):
        chunk = min(bucket_chunk_for(b, ((D + 127) // 128) * 128, 1), n_pad)
        fn = functools.partial(sq8i_bucket_topk, k=K, metric=metric,
                               chunk=chunk, interpret=not use_pallas())
        sops = (rows8, sq8.scale.astype(jnp.float32),
                sq8.minv.astype(jnp.float32), pen)
        _, pidx = fn(jnp.asarray(queries), *sops)
        rid, reps_r = score(np.asarray(pidx))
        print(f"sq8-int8: recall={rid:.4f} eps={reps_r:.4f}", flush=True)
        qps, qps_med = scan_stats(fn, sops, queries, b, D)
        print(f"sq8-int8 b={b}: {qps/1e3:.2f}K qps (med {qps_med/1e3:.2f}K)",
              flush=True)


if __name__ == "__main__":
    main()
