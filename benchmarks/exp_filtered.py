"""Filtered-ANN operating points (VERDICT r4 #4).

Measures recall/QPS at filter selectivity {1%, 10%, 50%} for the
exact-serve, IVF, and graph engines at a flagship config. Filters are
masks evaluated INSIDE the kernels (the reference over-fetches 4x and
post-filters, ``search/vector.rs:182``); the graph applies the mask at
result selection, so its pool must be oversized by ~1/selectivity — the
collection-layer guard (collection.py) bumps ef or falls back to the
masked exact scan below the beam cap's coverage. This experiment measures
exactly those served operating points.

Run: python benchmarks/exp_filtered.py                (1M x 128D L2)
     FILT_N=100000 FILT_D=768 FILT_METRIC=cosine ...  (other config)
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/velesdb_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

K = 10
BATCH = 256
ITERS = 32


def scan_qps(fn, arrays, queries, batch, d):
    import jax
    import jax.numpy as jnp

    big = np.resize(queries, (ITERS * batch, d))
    big = big + np.random.default_rng(9).standard_normal(big.shape).astype(
        np.float32
    ) * 0.01
    qs = jnp.asarray(big.reshape(ITERS, batch, d))

    @jax.jit
    def run_many(qs, *ops):
        def body(_, q):
            v, i = fn(q, *ops)
            return None, (v[0, 0], i[0, 0])

        _, outs = jax.lax.scan(body, None, qs)
        return outs

    jax.block_until_ready(run_many(qs, *arrays))
    samples = []
    for s in range(3):
        qs_s = jax.block_until_ready(jnp.roll(qs, 1 + 7 * s, axis=0))
        t0 = time.perf_counter()
        outs = run_many(qs_s, *arrays)
        np.asarray(outs[0])
        samples.append(time.perf_counter() - t0)
    return ITERS * batch / float(np.min(samples))


def main():
    import functools

    import jax
    import jax.numpy as jnp

    from velesdb_tpu.index.brute import BruteForceIndex
    from velesdb_tpu.index.graph_index import GraphIndex, beam_search_impl
    from velesdb_tpu.index.ivf import IvfIndex, ivf_search_impl
    from velesdb_tpu.index.params import GraphParams
    from velesdb_tpu.ops import DistanceMetric, StorageMode
    from velesdb_tpu.ops.chunked import chunked_topk
    from velesdb_tpu.ops.pallas_kernels import use_pallas

    n = int(os.environ.get("FILT_N", 1_000_000))
    d = int(os.environ.get("FILT_D", 128))
    metric = DistanceMetric.parse(os.environ.get("FILT_METRIC", "euclidean"))

    # mask mode (VERDICT r4 weak #6): "random" = uniform bernoulli (the r4
    # rows); "cluster" = CORRELATED — the filter keeps whole embedding
    # clusters, the case that actually starves IVF probe coverage and graph
    # neighborhoods (and the common real-world shape: a category filter
    # correlates with the embedding).
    mask_mode = os.environ.get("FILT_MASK", "random")

    @jax.jit
    def gen(seed):
        k1, k2, k3, k4, k5 = jax.random.split(jax.random.key(seed), 5)
        centers = jax.random.normal(k1, (64, d), jnp.float32) * 2.0
        assign = jax.random.randint(k2, (n,), 0, 64)
        corpus = centers[assign] + jax.random.normal(k3, (n, d)) * 0.7
        qa = jax.random.randint(k4, (512,), 0, 64)
        qs = centers[qa] + jax.random.normal(k5, (512, d)) * 0.7
        return corpus, qs, assign

    corpus_dev, queries_dev, assign_dev = gen(0)
    assign_h = np.asarray(assign_dev)
    if metric is DistanceMetric.COSINE:
        sq = jnp.sum(corpus_dev * corpus_dev, axis=1, keepdims=True)
        corpus_dev = corpus_dev * jax.lax.rsqrt(jnp.maximum(sq, 1e-30))
    n_pad = 1 << (n - 1).bit_length()
    corpus_dev = jnp.pad(corpus_dev, ((0, n_pad - n), (0, 0)))
    valid = jnp.arange(n_pad) < n
    jax.block_until_ready(corpus_dev)
    queries = np.asarray(queries_dev)
    gt_q = jnp.asarray(queries[:BATCH])

    # engines (serve-path forms, mask-parametrized)
    brute = BruteForceIndex(d, metric, StorageMode.FULL)
    brute.rebuild(np.zeros((2, d), np.float32), np.ones(2, bool))  # shape init
    # reuse the resident corpus without a host round trip
    brute.n_pad = n_pad
    brute._valid = valid
    brute._full = corpus_dev
    brute._full_sqnorm = jnp.sum(corpus_dev * corpus_dev, axis=1)
    base = (
        brute._full_sqnorm if metric is DistanceMetric.EUCLIDEAN
        else jnp.zeros(n_pad, jnp.float32)
    )
    brute._bucket_pen = jnp.where(valid, base, jnp.inf)
    brute._assist = None
    brute._full_hl = None
    if use_pallas() and d < 512:
        from velesdb_tpu.index.brute import _deq_sqnorm
        from velesdb_tpu.ops.bucket_kernel import sq8_int8_rows
        from velesdb_tpu.ops.quantization import sq8_quantize

        sq8 = sq8_quantize(corpus_dev)
        rows8 = sq8_int8_rows(sq8.codes)
        deq_sq = _deq_sqnorm(sq8.codes, sq8.scale, sq8.minv)
        if metric is DistanceMetric.COSINE:
            inv = jnp.where(deq_sq > 1e-30,
                            jax.lax.rsqrt(jnp.maximum(deq_sq, 1e-30)), 0.0)
            s2, m2 = sq8.scale * inv, sq8.minv * inv
            pb = jnp.zeros(n_pad, jnp.float32)
        else:
            s2, m2 = sq8.scale, sq8.minv
            pb = deq_sq
        brute._assist = (rows8, s2.astype(jnp.float32), m2.astype(jnp.float32),
                         jnp.where(valid, pb, jnp.inf))

    ivf = IvfIndex(d, metric)
    ivf.build(corpus_dev[:n], np.ones(n, bool))
    nprobe = ivf.nprobe_for(128)

    gi = GraphIndex(d, metric, GraphParams.auto(d, n))
    gi.build(np.zeros((n, d), np.float32), np.ones(n, bool),
             corpus_dev=corpus_dev[:n])

    results = []
    rng = np.random.default_rng(7)
    for sel in (0.01, 0.10, 0.50):
        if mask_mode == "cluster":
            # correlated filter: whole clusters until ~sel of the corpus
            order = rng.permutation(64)
            keep = []
            frac = 0.0
            for cid in order:
                keep.append(cid)
                frac += float(np.mean(assign_h == cid))
                if frac >= sel:
                    break
            mask_h = np.isin(assign_h, keep)
        else:
            mask_h = rng.random(n) < sel
        sel_real = float(np.mean(mask_h))
        mask = jnp.pad(jnp.asarray(mask_h), (0, n_pad - n))
        # filtered exact oracle (device; HIGHEST adds nothing for overlap
        # at these selectivities — near-ties are diluted by the filter)
        _, gt = chunked_topk(gt_q, corpus_dev, valid & mask, K, metric,
                             chunk=min(65536, n_pad))
        gt = np.asarray(gt)

        def rec(idx):
            idx = np.asarray(idx)
            ok = mask_h[np.maximum(idx, 0)] | (idx < 0)
            assert ok.all(), "filter violated"
            return float(np.mean(
                [len(set(idx[i]) & set(gt[i])) / K for i in range(BATCH)]
            ))

        # exact serve path with in-kernel mask. Arrays pass as jit ARGS —
        # calling brute.search inside the scan trace embeds the captured
        # 512MB corpus in the remote-compile payload (HTTP 413, r4)
        if brute._assist is not None:
            from velesdb_tpu.ops.bucket_kernel import (
                bucket_chunk_for,
                sq8i_rerank_topk,
            )

            chunk_i8 = min(
                bucket_chunk_for(BATCH, ((d + 127) // 128) * 128, 1), n_pad
            )
            rows8_a, s2_a, m2_a, pen_a = brute._assist

            def exact_fn(q, m, r8, s2, m2, pen, full):
                return sq8i_rerank_topk(
                    q, r8, s2, m2, jnp.where(m, pen, jnp.inf), full,
                    k=K, m=16, metric=metric, chunk=chunk_i8,
                    interpret=False,
                )

            exact_arrays = (rows8_a, s2_a, m2_a, pen_a, corpus_dev)
        else:
            from velesdb_tpu.ops.streamed import streamed_topk

            def exact_fn(q, m, corp, sn):
                return streamed_topk(q, corp, valid=m, k=K, metric=metric,
                                     corpus_sqnorm=sn)

            exact_arrays = (corpus_dev, brute._full_sqnorm)

        _, ei = exact_fn(gt_q, valid & mask, *exact_arrays)
        r_ex = rec(ei)
        qps_ex = scan_qps(exact_fn, (valid & mask,) + exact_arrays,
                          queries, BATCH, d)
        results.append({"engine": "exact", "sel": sel, "mask": mask_mode,
                        "sel_real": round(sel_real, 4),
                        "recall": round(r_ex, 4), "qps": round(qps_ex)})
        print(results[-1], flush=True)

        # IVF with in-kernel mask
        def ivf_fn(q, m):
            return ivf.search(np.asarray(q), K, nprobe=nprobe, mask=np.asarray(m))

        # ivf.search is host-orchestrated; measure via its jitted inner
        mask_used = jnp.asarray(mask_h)
        _ivf = functools.partial(
            jax.jit, static_argnames=("k", "nprobe", "metric")
        )(ivf_search_impl)
        parts = (
            (ivf._parts, ivf._part_scale, ivf._part_minv)
            if ivf.storage == "sq8" else ivf._parts
        )
        mrow = jnp.pad(mask_used, (0, max(0, ivf.n - n)))

        def ivf_jfn(q, *arr):
            return _ivf(q, arr[0], arr[1], arr[2], arr[3], arr[4], arr[5],
                        k=K, nprobe=nprobe, metric=metric)

        ivf_arrays = (ivf._centroids, ivf._cent_sq, parts, ivf._part_rows,
                      ivf._part_sq, mrow)
        _, ii = ivf_jfn(gt_q, *ivf_arrays)
        r_ivf = rec(ii)
        qps_ivf = scan_qps(ivf_jfn, ivf_arrays, queries, BATCH, d)
        results.append({"engine": "ivf", "sel": sel, "mask": mask_mode,
                        "sel_real": round(sel_real, 4), "nprobe": nprobe,
                        "recall": round(r_ivf, 4), "qps": round(qps_ivf)})
        print(results[-1], flush=True)

        # the collection-layer coverage guard's bumped nprobe (r4 shipped
        # it but every measured row sat at the base — VERDICT r4 weak #6:
        # prove the bump ENGAGES and measure what it buys on-chip)
        L = ivf.part_len
        k_fetch = max(min(4 * K, 128), K)
        need_np = int(np.ceil(1.5 * k_fetch / (max(sel_real, 1e-9) * L)))
        if need_np > nprobe:
            need_np = ((need_np + 7) // 8) * 8
            cap = ivf.c_real or ivf.c
            if need_np <= cap and need_np * L * 2 < n:
                def ivf_bump_fn(q, *arr):
                    return _ivf(q, arr[0], arr[1], arr[2], arr[3], arr[4],
                                arr[5], k=K, nprobe=need_np, metric=metric)

                _, ib = ivf_bump_fn(gt_q, *ivf_arrays)
                r_b = rec(ib)
                qps_b = scan_qps(ivf_bump_fn, ivf_arrays, queries, BATCH, d)
                results.append({"engine": "ivf-bumped", "sel": sel,
                                "mask": mask_mode,
                                "sel_real": round(sel_real, 4),
                                "nprobe": need_np,
                                "recall": round(r_b, 4),
                                "qps": round(qps_b)})
            else:
                results.append({"engine": "ivf-bumped", "sel": sel,
                                "mask": mask_mode, "nprobe": need_np,
                                "served_by": "exact-fallback (guard)"})
            print(results[-1], flush=True)

        # graph with the collection-layer guard semantics. In cluster mode
        # the 1/sel pool-sizing model is WRONG by construction — once the
        # walk reaches the kept cluster its whole neighborhood passes the
        # mask — so ALSO measure forced ef=128/256 points below the guard's
        # coverage bound (VERDICT r4 weak #6: a real graph operating point
        # below sel=30%)
        k_fetch = min(4 * K, 128)
        need = int(np.ceil(1.5 * k_fetch / sel_real))
        forced = need > 512
        if forced and mask_mode != "cluster":
            results.append({"engine": "graph", "sel": sel, "mask": mask_mode,
                            "served_by": "exact-fallback (guard)"})
            print(results[-1], flush=True)
            continue
        ef = max(128, ((need + 7) // 8) * 8) if not forced else 256
        beam, expansions = gi.params.beam_for_ef(ef, k_fetch)
        gmask = jnp.pad(jnp.asarray(mask_h), (0, gi.n_pad - n))
        eiv = gi._entry_ivf
        kernel_entry = eiv is not None
        estate = None
        emode = "legacy"
        if kernel_entry:
            # mirror the production masked path (r5): masked searches use
            # the XLA entry scan — mask-aware probe pruning + masked top-E
            # seeds the beam at filtered-answer candidates
            estate = (
                eiv._centroids, eiv._cent_sq,
                (eiv._parts, eiv._part_scale, eiv._part_minv),
                eiv._part_rows, eiv._part_sq,
            )
            emode = "xla"
        router = (
            (gi._route_cents, gi._route_csq, gi._route_rows)
            if gi._route_cents is not None else None
        )
        _beam = functools.partial(
            jax.jit,
            static_argnames=(
                "k", "beam", "expansions", "degree", "entry_points",
                "metric", "entry_probes", "entry_mode", "expand_width",
            ),
        )(beam_search_impl)
        n_router = 3 if router is not None else 0

        def graph_fn(q, corp, adj, sn, vd, seeds, m, *rest):
            rt = tuple(rest[:n_router]) if router is not None else None
            es = tuple(rest[n_router:]) if emode != "legacy" else None
            return _beam(
                q, corp, adj, sn, vd, seeds, m, None, rt, es,
                k=K, beam=beam, expansions=expansions,
                degree=gi._adj.shape[1],
                entry_points=min(gi.params.entry_points, beam),
                metric=metric,
                entry_probes=(
                    min(gi.params.entry_probes, eiv.c_real or eiv.c)
                    if kernel_entry
                    else gi.params.entry_probes
                ),
                entry_mode=emode,
                expand_width=gi.params.expand_width,
            )

        g_arrays = (gi._corpus, gi._adj, gi._sqnorm, gi._valid, gi._seed_ids,
                    gmask) + (router if router is not None else ()) + (
                        estate if emode != "legacy" else ())
        _, gidx = graph_fn(gt_q, *g_arrays)
        r_g = rec(gidx)
        qps_g = scan_qps(
            lambda q, *a: graph_fn(q, *a), g_arrays, queries, BATCH, d
        )
        results.append({"engine": "graph", "sel": sel, "mask": mask_mode,
                        "sel_real": round(sel_real, 4), "ef": ef,
                        "forced": forced,
                        "recall": round(r_g, 4), "qps": round(qps_g)})
        print(results[-1], flush=True)

    out = {"n": n, "d": d, "metric": metric.value, "k": K,
           "batch": BATCH, "points": results}
    print(json.dumps(out))

    if os.environ.get("FILT_WRITE_CURVE"):
        # merge into the BENCH_curve.json artifact as its own config so
        # the filtered operating points live in the machine-readable
        # artifact, not only in docs (VERDICT r4 weak #6)
        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "BENCH_curve.json",
        )
        name = f"1Mx128D-euclidean-filtered-{mask_mode}"
        cfg = dict(out)
        cfg["config"] = name
        cfg["protocol"] = (
            "exp_filtered.py scan protocol (32 unique batches/dispatch, "
            "min of 3 samples, forced readback); recall vs the exact "
            "FILTERED device oracle"
        )
        try:
            with open(path) as f:
                art = json.load(f)
        except (OSError, ValueError):
            art = {"configs": []}
        art["configs"] = [
            c for c in art.get("configs", []) if c.get("config") != name
        ] + [cfg]
        with open(path, "w") as f:
            json.dump(art, f, indent=1)
        print("merged", name, "into", path, file=sys.stderr)


if __name__ == "__main__":
    main()
