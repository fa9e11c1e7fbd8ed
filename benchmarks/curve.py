"""Recall/QPS curves across engines — ann-benchmarks-style JSON artifact.

Counterpart of the reference's `benchmarks/benchmark_recall.py` + criterion
recall suites: for each engine (exact-bucket / exact-streamed / SQ8 / IVF
nprobe sweep / graph ef sweep) measure recall@10 vs device-side QPS and
write ``BENCH_curve.json`` at the repo root.

Measurement protocol v2 (CLAUDE.md + VERDICT r2 #9): every timed sample is
one dispatch of a jitted ``lax.scan`` over 64 UNIQUE query batches with a
forced readback — the tunnel round trip amortizes to <10% and
repeated-input shortcuts cannot fire. >=3 samples; each point records
``qps`` (min time) AND ``qps_med`` (median) so the artifact carries its own
weather spread. Device arrays pass as jit ARGUMENTS (closure capture embeds
them in the remote-compile payload -> HTTP 413).

Small-batch serving points (VERDICT r2 #1/#7): the flagship engines are
also measured at ``batch=16`` (scan protocol) and ``batch=1`` per-call
latency p50/p99 — host-observed through the tunnel, so the artifact also
records the device-side scan floor at batch=1.

Run: python benchmarks/curve.py                     (real TPU; ~15 min)
     CURVE_CONFIG=sift python benchmarks/curve.py   (1M x 128D L2 only)
     CURVE_CONFIG=cos  python benchmarks/curve.py   (100K x 768D cos only)
"""

import functools
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/velesdb_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from velesdb_tpu.index.brute import pad_rows
from velesdb_tpu.ops.streamed import _pick_chunk

ITERS = 64
K = 10


def _scan_chunk(n_pad):
    """Largest 1024-multiple divisor of n_pad <= 64K (r4 pad_rows quantizes
    to pow2/16 steps; 65536 no longer always divides)."""
    return _pick_chunk(n_pad, 65536) or min(65536, n_pad)
SAMPLES = int(os.environ.get("CURVE_SAMPLES", 3))

# CURVE_ENGINES=graph,graph-sq8 — allowlist: measure only these engines and
# MERGE their fresh points into the existing config row (other engines'
# recorded points are kept). Lets a crashed config's missing ladder re-run
# without paying for the already-captured engines (r5: the 5M graph ladder).
_ENG = os.environ.get("CURVE_ENGINES")
ENGINES = set(_ENG.split(",")) if _ENG else None


def want(*engines):
    return ENGINES is None or any(e in ENGINES for e in engines)


def scan_stats(fn, arrays, queries, batch, d):
    """Device-side timing of ``fn(q, *ops)``: one jitted scan over ITERS
    unique batches; big operands ride as jit arguments. Returns
    ``(qps_min, qps_med)``."""
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
    for s in range(SAMPLES):
        qs_s = jax.block_until_ready(jnp.roll(qs, 1 + 7 * s, axis=0))
        t0 = time.perf_counter()
        outs = run_many(qs_s, *arrays)
        np.asarray(outs[0])
        samples.append(time.perf_counter() - t0)
    n = ITERS * batch
    return n / float(np.min(samples)), n / float(np.median(samples))


def latency_probe(fn, arrays, queries, d, calls=40):
    """Per-call batch=1 latency, host-observed THROUGH the tunnel (each call
    is one dispatch + readback — the reference's p50 table analog,
    docs/BENCHMARKS.md:58). Returns (p50_ms, p99_ms, weather_flag)."""
    import jax
    import jax.numpy as jnp

    q0 = jnp.asarray(queries[:1])
    jax.block_until_ready(fn(q0, *arrays)[0])  # compile at batch 1
    times = []
    for i in range(calls):
        q = jnp.asarray(queries[i % len(queries)][None, :] + np.float32(1e-4 * i))
        jax.block_until_ready(q)
        t0 = time.perf_counter()
        _, idx = fn(q, *arrays)
        np.asarray(idx[0, 0])
        times.append((time.perf_counter() - t0) * 1e3)
    p50 = float(np.percentile(times, 50))
    p99 = float(np.percentile(times, 99))
    # tunnel-wedge samples (30s RTT swings) land silently in p99 next to
    # 28ms engines (VERDICT r4 weak #7): flag cells whose tail is weather,
    # not the engine — p50 stays the honest per-call figure either way
    weather = p99 > max(5.0 * p50, 150.0)
    return p50, p99, weather


def run_config(name, n, d, metric_name, batch=256):
    import jax
    import jax.numpy as jnp

    from velesdb_tpu.index.graph_index import GraphIndex, beam_search_impl
    from velesdb_tpu.index.ivf import IvfIndex, ivf_search_impl
    from velesdb_tpu.index.params import GraphParams
    from velesdb_tpu.ops import DistanceMetric
    from velesdb_tpu.ops.bucket_kernel import (
        bucket_chunk_for,
        bucket_topk_entry,
        sq8_pack_blocked,
        sq8_bucket_topk,
    )
    from velesdb_tpu.ops.chunked import chunked_topk
    from velesdb_tpu.ops.pallas_kernels import use_pallas
    from velesdb_tpu.ops.quantization import sq8_dequantize, sq8_quantize
    from velesdb_tpu.ops.streamed import _streamed_entry

    metric = DistanceMetric.parse(metric_name)
    rng = np.random.default_rng(42)
    centers = rng.standard_normal((64, d)).astype(np.float32) * 2.0
    corpus = centers[rng.integers(0, 64, n)] + rng.standard_normal(
        (n, d)
    ).astype(np.float32) * 0.7
    queries = centers[rng.integers(0, 64, 512)] + rng.standard_normal(
        (512, d)
    ).astype(np.float32) * 0.7
    n_pad = pad_rows(n)
    corpus_dev = jax.device_put(
        jnp.pad(jnp.asarray(corpus), ((0, n_pad - n), (0, 0)))
    )
    if metric is DistanceMetric.COSINE:
        sq = jnp.sum(corpus_dev * corpus_dev, axis=1, keepdims=True)
        norm_dev = corpus_dev * jnp.where(
            sq > 1e-30, jax.lax.rsqrt(jnp.maximum(sq, 1e-30)), 0.0
        )
    else:
        norm_dev = corpus_dev
    sqn = jnp.sum(norm_dev * norm_dev, axis=1)
    valid = jnp.arange(n_pad) < n
    pen = jnp.where(
        valid,
        sqn if metric is DistanceMetric.EUCLIDEAN else 0.0,
        jnp.inf,
    )
    jax.block_until_ready(norm_dev)

    # ground truth: exact chunked oracle on the first 256 queries
    gt_q = jnp.asarray(queries[:batch])
    _, gt = chunked_topk(gt_q, norm_dev, valid, K, metric, chunk=_scan_chunk(n_pad))
    gt = np.asarray(gt)

    # TRUE host-f32 oracle (r3b metrology fix). MXU f32 scores differ
    # from true f32 by ~3e-4 (~0.2% in euclidean distance here), which in
    # concentration-of-distances regimes swaps ~3% of near-tied top-10:
    # device-vs-host oracle agreement is only 0.968 at 1M x 128D. Three
    # recall fields disentangle this:
    #   recall      — identity vs the DEVICE oracle (legacy; flatters
    #                 device-scored engines via correlated MXU error)
    #   recall_host — identity vs the TRUE host-f32 oracle (the honest
    #                 basis-independent number; host-reranked paths
    #                 measure 0.998 here while pure-MXU engines read
    #                 ~0.97 — their selections really are ~0.2% off)
    #   recall_eps  — served distance within 0.1% of the true k-th
    #                 (ann-benchmarks convention; bounds user-visible
    #                 loss, generous where ranks concentrate)
    corpus_host = corpus[:n].astype(np.float32)
    if metric is DistanceMetric.COSINE:
        corpus_host = corpus_host / np.maximum(
            np.linalg.norm(corpus_host, axis=1, keepdims=True), 1e-30
        )
    q_host = np.asarray(queries[:batch], np.float32)
    if metric is DistanceMetric.COSINE:
        q_host = q_host / np.maximum(
            np.linalg.norm(q_host, axis=1, keepdims=True), 1e-30
        )
    # blocked f64 BLAS oracle: the f64 expansion ||x-q||^2 = |x|^2 - 2x.q
    # + |q|^2 is BOTH ~50x faster (dgemm vs a [N, D] broadcast temp per
    # query — the old per-query loop ran ~30 min at 5Mx128) and strictly
    # more accurate than the f32 direct diff (f64 keeps ~1e-12 relative
    # through the cancellation; f32 direct is ~1e-7)
    hib = metric.higher_is_better
    q64 = q_host.astype(np.float64)
    blk_rows = 1 << 18
    cd_parts, ci_parts = [], []
    for s0 in range(0, n, blk_rows):
        blk = corpus_host[s0:s0 + blk_rows].astype(np.float64)
        if metric is DistanceMetric.EUCLIDEAN:
            s = np.maximum(
                np.sum(q64 * q64, axis=1)[:, None]
                - 2.0 * (q64 @ blk.T)
                + np.sum(blk * blk, axis=1)[None, :],
                0.0,
            )
        else:
            s = -(q64 @ blk.T)  # negate: argpartition selects smallest
        kk = min(K, s.shape[1])
        top = np.argpartition(s, kk - 1, axis=1)[:, :kk]
        cd_parts.append(np.take_along_axis(s, top, axis=1))
        ci_parts.append(top + s0)
    cd = np.concatenate(cd_parts, axis=1)
    ci = np.concatenate(ci_parts, axis=1)
    sel = np.argpartition(cd, K - 1, axis=1)[:, :K]
    gt_host = np.take_along_axis(ci, sel, axis=1).astype(np.int64)
    kth_raw = np.take_along_axis(cd, sel, axis=1).max(axis=1)
    if metric is DistanceMetric.EUCLIDEAN:
        kth = np.sqrt(kth_raw)
    else:
        kth = -kth_raw  # max of negated scores = k-th best similarity

    def eps_recall(idx):
        hits = 0
        for i in range(batch):
            ids = idx[i][idx[i] >= 0]
            if len(ids) == 0:
                continue
            rows = corpus_host[ids]
            if metric is DistanceMetric.EUCLIDEAN:
                s = np.linalg.norm(rows - q_host[i][None, :], axis=1)
                hits += int(np.sum(s <= kth[i] * 1.001 + 1e-9))
            else:
                s = rows @ q_host[i]
                hits += int(np.sum(s >= kth[i] - 1e-3 * abs(kth[i]) - 1e-9))
        return hits / float(batch * K)

    points = []

    def measure(engine, knob, fn, arrays, batches=(batch,), latency=False):
        if not want(engine):
            return
        try:
            _measure(engine, knob, fn, arrays, batches, latency)
        except Exception as e:  # one engine's compile/runtime failure must
            # not void the whole config (the r4 bench lesson) — record it
            msg = str(e).splitlines()[0][:200]
            points.append({"engine": engine, "knob": knob, "error": msg})
            print(name, engine, "FAILED:", msg, flush=True)

    def _measure(engine, knob, fn, arrays, batches, latency):
        _, idx = fn(gt_q, *arrays)
        idx = np.asarray(idx)
        r = float(
            np.mean([len(set(idx[i]) & set(gt[i])) / K for i in range(batch)])
        )
        r_host = float(
            np.mean(
                [len(set(idx[i]) & set(gt_host[i])) / K for i in range(batch)]
            )
        )
        r_eps = float(eps_recall(idx))
        for b in batches:
            q_min, q_med = scan_stats(fn, arrays, queries, b, d)
            pt = {
                "engine": engine, "knob": knob, "batch": b,
                "recall": round(r, 4), "recall_host": round(r_host, 4),
                "recall_eps": round(r_eps, 4),
                "qps": round(q_min), "qps_med": round(q_med),
            }
            if latency and b == min(batches):
                p50, p99, wflag = latency_probe(fn, arrays, queries, d)
                pt["b1_p50_ms"] = round(p50, 2)
                pt["b1_p99_ms"] = round(p99, 2)
                if wflag:
                    pt["b1_p99_weather"] = True
            points.append(pt)
            print(name, pt, flush=True)

    interp = not use_pallas()
    chunk = min(bucket_chunk_for(batch, ((d + 127) // 128) * 128, 4, n_pad), n_pad)
    measure(
        "exact-bucket", f"chunk={chunk}",
        functools.partial(
            bucket_topk_entry, k=K, metric=metric, chunk=chunk,
            interpret=interp, prenormalized=True,
        ),
        (norm_dev, pen),
        batches=(batch, 16),
        latency=True,
    )
    # split-bf16 (true-f32 fidelity) bucket kernel — the FULL-collection
    # serve path at D < 512 since r3b. Demotion-ladder engine; skipped at
    # the >=5M configs (its +4B/dim shadow is HBM the ANN ladders need)
    d_pad128 = ((d + 127) // 128) * 128
    if n <= 2_000_000 and want("exact-hl"):
        from velesdb_tpu.ops.bucket_kernel import (
            bucket_topk_hl,
            split_f32_rows,
        )

        hi_dev, lo_dev = split_f32_rows(
            jnp.pad(norm_dev, ((0, 0), (0, d_pad128 - d)))
        )
        chunk_hl = min(bucket_chunk_for(batch, d_pad128, 8, n_pad), n_pad)
        measure(
            "exact-hl", f"chunk={chunk_hl}",
            functools.partial(
                bucket_topk_hl, k=K, metric=metric, chunk=chunk_hl,
                interpret=interp,
            ),
            (hi_dev, lo_dev, pen),
            batches=(batch, 16),
            latency=True,
        )
        del hi_dev, lo_dev

    measure(
        "exact-streamed", f"chunk={_scan_chunk(n_pad)}",
        functools.partial(
            _streamed_entry, k=K, metric=metric, chunk=_scan_chunk(n_pad),
            approx=True, recall_target=0.95,
        ),
        (norm_dev, valid, sqn),
        batches=(batch, 16),
        latency=True,
    )

    sq8i_chunk = min(
        bucket_chunk_for(batch, ((d + 127) // 128) * 128, 1, n_pad), n_pad
    )
    if want("sq8-bucket", "sq8-int8", "exact-assist"):
        sq8 = sq8_quantize(norm_dev)
        words = sq8_pack_blocked(sq8.codes)
        deq = sq8_dequantize(sq8)
        dn = jnp.sum(deq * deq, axis=1)
        del deq  # [N_pad, D] f32 — 2.5GB dead weight at the 5M config
        if metric is DistanceMetric.COSINE:
            inv = jnp.where(
                dn > 1e-30, jax.lax.rsqrt(jnp.maximum(dn, 1e-30)), 0.0
            )
            s2, m2 = sq8.scale * inv, sq8.minv * inv
            sq8_pen = jnp.where(valid, 0.0, jnp.inf)
        elif metric is DistanceMetric.EUCLIDEAN:
            s2, m2 = sq8.scale, sq8.minv
            sq8_pen = jnp.where(valid, dn, jnp.inf)
        else:
            s2, m2 = sq8.scale, sq8.minv
            sq8_pen = jnp.where(valid, 0.0, jnp.inf)
        sq8_chunk = min(
            bucket_chunk_for(batch, ((d + 127) // 128) * 128, 5, n_pad), n_pad
        )
        if n <= 2_000_000:  # staged-unpack fallback; superseded by int8
            measure(
                "sq8-bucket", f"chunk={sq8_chunk}",
                functools.partial(
                    sq8_bucket_topk, k=K, metric=metric, chunk=sq8_chunk,
                    interpret=interp,
                ),
                (words, s2.astype(jnp.float32), m2.astype(jnp.float32),
                 sq8_pen),
                batches=(batch, 16),
                latency=True,
            )
        del words

        # int8-direct SQ8 (int8 MXU dots, no unpack — serves D<512 in prod)
        from velesdb_tpu.ops.bucket_kernel import (
            sq8_int8_rows,
            sq8i_bucket_topk,
        )

        rows8 = sq8_int8_rows(sq8.codes)
        measure(
            "sq8-int8", f"chunk={sq8i_chunk}",
            functools.partial(
                sq8i_bucket_topk, k=K, metric=metric, chunk=sq8i_chunk,
                interpret=interp,
            ),
            (rows8, s2.astype(jnp.float32), m2.astype(jnp.float32), sq8_pen),
            batches=(batch, 16),
            latency=True,
        )

        # int8-assist: coarse int8 scan + exact f32 gather-rerank in one
        # program — the FULL-collection serve default at D < 512 since r3e
        # (`index/brute.py`; benchmarks/exp_sq8_assist.py for the A/B)
        from velesdb_tpu.ops.bucket_kernel import sq8i_rerank_topk

        measure(
            "exact-assist", f"m=16 chunk={sq8i_chunk}",
            functools.partial(
                sq8i_rerank_topk, k=K, m=16, metric=metric, chunk=sq8i_chunk,
                interpret=interp,
            ),
            (rows8, s2.astype(jnp.float32), m2.astype(jnp.float32), sq8_pen,
             norm_dev),
            batches=(batch, 16),
            latency=True,
        )
        del rows8, sq8

    # per-dim enc-select assist — the FULL-collection serve default at
    # D < 512 since r5 (the whole affine epilogue folds into the int dot;
    # single max pass with the slice index in the low 6 bits — see
    # ops/bucket_kernel.py pd family + benchmarks/exp_sq8i_v2.py)
    if d < 512 and want("exact-assist-pd"):
        from velesdb_tpu.ops.bucket_kernel import (
            sq8pd_build,
            sq8pd_ptile,
            sq8pd_rerank_topk,
        )

        pd = sq8pd_build(norm_dev, valid, d, metric)
        if pd is not None:
            rows_pd, pen_int, _pf, sdim, _mid, qu = pd
            pd_chunk = sq8i_chunk
            ptile = sq8pd_ptile(pen_int, pd_chunk)
            measure(
                "exact-assist-pd", f"m=16 chunk={pd_chunk}",
                functools.partial(
                    sq8pd_rerank_topk, k=K, m=16, metric=metric,
                    chunk=pd_chunk, dim=d, interpret=interp,
                ),
                (rows_pd, ptile, sdim, qu, norm_dev),
                batches=(batch, 16),
                latency=True,
            )
            del rows_pd, ptile, pen_int

    import jax as _jax

    _ivf = functools.partial(
        _jax.jit, static_argnames=("k", "nprobe", "metric")
    )(ivf_search_impl)
    if want("ivf"):
        ivf = IvfIndex(d, metric)
        ivf.build(corpus_dev[:n], np.ones(n, bool))
        nprobes = (4, 8, 16, 32, 64, 128) if n >= 500_000 else (4, 8, 16, 32)
        for nprobe in nprobes:
            measure(
                "ivf", f"nprobe={nprobe}",
                functools.partial(
                    lambda q, c, cs, p, pr, ps, _np: _ivf(
                        q, c, cs, p, pr, ps, None, k=K, nprobe=_np,
                        metric=metric
                    ),
                    _np=nprobe,
                ),
                (ivf._centroids, ivf._cent_sq, ivf._parts, ivf._part_rows,
                 ivf._part_sq),
                batches=(batch, 16) if nprobe in (32, 64) else (batch,),
                latency=(nprobe == 64),
            )
        # free the grouped-corpus copy before the graph build — at 5M x
        # 128D it holds ~2.5GB of HBM the build needs
        del ivf

    if 500_000 <= n <= 2_000_000 and want("ivf-spill2"):
        # spill=2: the >=0.95-recall small-batch operating point at 1M
        # (plain probing ceilings at ~0.949 regardless of nprobe). Gated
        # off above 2M: spill doubles the grouped-corpus partition bytes
        # and the SECOND grouped copy RESOURCE_EXHAUSTED the chip at 5M
        # (q5b r5); large-N serving routes to assist/graph anyway.
        ivf2 = IvfIndex(d, metric, spill=2)
        ivf2.build(corpus_dev[:n], np.ones(n, bool))

        from velesdb_tpu.ops.topk import top_k as _topk

        def ivf2_fn(q, c, cs, p, pr, ps, _np):
            kf = min(2 * K + 8, _np * ivf2.part_len)
            v, i = _ivf(q, c, cs, p, pr, ps, None, k=kf, nprobe=_np,
                        metric=metric)
            # spilled rows surface twice (bit-identical scores): dedup
            eq = (i[:, :, None] == i[:, None, :]) & (i[:, :, None] >= 0)
            dup = jnp.tril(eq, -1).any(axis=2)
            vv, pos = _topk(v, K, metric.higher_is_better, mask=~dup & (i >= 0))
            return vv, jnp.take_along_axis(i, pos, axis=1)

        for nprobe in (32, 64, 96):
            measure(
                "ivf-spill2", f"nprobe={nprobe}",
                functools.partial(ivf2_fn, _np=nprobe),
                (ivf2._centroids, ivf2._cent_sq, ivf2._parts,
                 ivf2._part_rows, ivf2._part_sq),
                batches=(batch, 16) if nprobe == 64 else (batch,),
                latency=(nprobe == 64),
            )

    del _ivf
    if not want("graph", "graph-legacy-entry", "graph-sq8"):
        return {"config": name, "n": n, "d": d, "metric": metric.value,
                "batch": batch, "k": K, "iters_per_dispatch": ITERS,
                "samples": SAMPLES, "points": points}
    try:
        gi = GraphIndex(d, metric, GraphParams.auto(d, n))
        src = norm_dev[:n]  # materialized slice copy (build aliases it)
        if ENGINES is not None:
            # graph-only re-run: the PADDED corpus only feeds the (skipped)
            # exact/SQ8 engines — at 5Mx128D it is 2.7GB of HBM the beam
            # ladder needs (the r5 full-ladder run RESOURCE_EXHAUSTED here)
            del corpus_dev, norm_dev, pen, sqn
        gi.build(corpus, np.ones(n, bool), corpus_dev=src)
        del src  # gi keeps its own (padded) copy; drop the build alias
    except Exception as e:
        msg = str(e).splitlines()[0][:200]
        points.append({"engine": "graph", "knob": "build", "error": msg})
        print(name, "graph build FAILED:", msg, flush=True)
        return {"config": name, "n": n, "d": d, "metric": metric.value,
                "batch": batch, "k": K, "iters_per_dispatch": ITERS,
                "samples": SAMPLES, "points": points}
    _beam = functools.partial(
        _jax.jit,
        static_argnames=(
            "k", "beam", "expansions", "degree", "entry_points", "metric",
            "entry_probes", "entry_mode", "expand_width",
        ),
    )(beam_search_impl)
    has_router = gi._route_cents is not None
    router_args = (
        (gi._route_cents, gi._route_csq, gi._route_rows) if has_router else ()
    )

    # the graph SERVE path (r3c): SQ8 entry-IVF probed by the
    # scalar-prefetch kernel at every batch size when the index carries
    # one (n >= 100K auto); the narrow legacy entry rides as a comparison
    # point at ef=128
    eiv = gi._entry_ivf
    kernel_entry = eiv is not None and use_pallas()
    if kernel_entry:
        e_aux, e_frows = eiv._kernel_state()
        entry_args = (eiv._centroids, eiv._cent_sq, eiv._parts, e_aux,
                      e_frows)
    else:
        entry_args = ()

    def beam_fn(q, corp, adj, sn, vd, seeds, *rest, _b, _e, _mode, _probes):
        off = 3 if has_router else 0
        router = tuple(rest[:off]) if has_router else None
        estate = tuple(rest[off:off + 5]) if _mode == "kernel" else None
        return _beam(
            q, corp, adj, sn, vd, seeds, None, None, router, estate,
            k=K, beam=_b, expansions=_e, degree=adj.shape[1],
            entry_points=min(gi.params.entry_points, _b), metric=metric,
            entry_probes=_probes, entry_mode=_mode,
            expand_width=gi.params.expand_width,
        )

    serve_mode = "kernel" if kernel_entry else "legacy"
    serve_probes = (
        min(gi.params.entry_probes, eiv.c) if kernel_entry
        else gi.params.entry_probes
    )
    # 16/32 are the calibrated-downshift serving rungs (r3d: entry-bound
    # graphs are ef-FLAT, so the downshift serves ef=16 at 3x the QPS)
    for ef in (16, 32, 64, 128, 256):
        beam, expansions = gi.params.beam_for_ef(ef, K)
        measure(
            "graph", f"ef={ef}" + ("+entry-kernel" if kernel_entry else ""),
            functools.partial(beam_fn, _b=beam, _e=expansions,
                              _mode=serve_mode, _probes=serve_probes),
            (gi._corpus, gi._adj, gi._sqnorm, gi._valid, gi._seed_ids)
            + router_args + entry_args,
            batches=(batch, 16) if ef in (16, 128) else (batch,),
            latency=(ef == 128),
        )
    if kernel_entry:
        beam, expansions = gi.params.beam_for_ef(128, K)
        measure(
            "graph-legacy-entry", "ef=128",
            functools.partial(beam_fn, _b=beam, _e=expansions,
                              _mode="legacy", _probes=2),
            (gi._corpus, gi._adj, gi._sqnorm, gi._valid, gi._seed_ids)
            + router_args + entry_args,
            batches=(16,),
        )

    # dual-precision beam: SQ8 gathers + f32 final rerank (round-3)
    from velesdb_tpu.ops.quantization import SQ8Vectors

    if not want("graph-sq8"):
        return {"config": name, "n": n, "d": d, "metric": metric.value,
                "batch": batch, "k": K, "iters_per_dispatch": ITERS,
                "samples": SAMPLES, "points": points}
    try:
        sqt = sq8_quantize(gi._corpus)
    except Exception as e:  # capacity shapes: skip the dual-precision row
        points.append({"engine": "graph-sq8", "knob": "quantize",
                       "error": str(e).splitlines()[0][:200]})
        return {"config": name, "n": n, "d": d, "metric": metric.value,
                "batch": batch, "k": K, "iters_per_dispatch": ITERS,
                "samples": SAMPLES, "points": points}

    def beam_sq8_fn(q, cd, sc, mn, corp, adj, sn, vd, seeds, *rest, _b, _e):
        off = 3 if has_router else 0
        router = tuple(rest[:off]) if has_router else None
        estate = tuple(rest[off:off + 5]) if kernel_entry else None
        return _beam(
            q, SQ8Vectors(cd, sc, mn), adj, sn, vd, seeds, None, corp, router,
            estate,
            k=K, beam=_b, expansions=_e, degree=adj.shape[1],
            entry_points=min(gi.params.entry_points, _b), metric=metric,
            entry_probes=serve_probes, entry_mode=serve_mode,
            expand_width=gi.params.expand_width,
        )

    for ef in (128,):
        beam, expansions = gi.params.beam_for_ef(ef, K)
        measure(
            "graph-sq8", f"ef={ef}" + ("+entry-kernel" if kernel_entry else ""),
            functools.partial(beam_sq8_fn, _b=beam, _e=expansions),
            (sqt.codes, sqt.scale, sqt.minv, gi._corpus, gi._adj, gi._sqnorm,
             gi._valid, gi._seed_ids) + router_args + entry_args,
            batches=(batch, 16),
            latency=True,
        )

    return {"config": name, "n": n, "d": d, "metric": metric.value,
            "batch": batch, "k": K, "iters_per_dispatch": ITERS,
            "samples": SAMPLES, "points": points}


def run_config_binary(name, n, d, batch=256):
    """Binary-Hamming serve curve (BASELINE config #3: GloVe-1.2M-class
    100D angular — binary sign sketch + Hamming bucket prefilter + exact
    f32 rerank). Engine rows: hamming-coarse (the prefilter alone) and
    hamming-rerank at an oversample ladder (the serve path). Memory point:
    packed sketch = 1 bit/dim (100D -> 16B/row padded vs 400B f32)."""
    import functools

    import jax
    import jax.numpy as jnp

    from velesdb_tpu.ops import DistanceMetric, binary_quantize
    from velesdb_tpu.ops.bucket_kernel import (
        hamming_bucket_topk,
        hamming_rerank_topk,
    )
    from velesdb_tpu.ops.chunked import chunked_topk
    from velesdb_tpu.ops.pallas_kernels import use_pallas

    metric = DistanceMetric.COSINE
    rng = np.random.default_rng(42)
    # GloVe-like LOCAL neighborhoods: ~40 rows per cluster (a 1-bit/dim
    # sketch separates clusters but cannot rank within dense near-tie
    # blobs — giant-cluster synthetics measure an information limit, not
    # the engine; see tests/test_recall_validation.py)
    n_clusters = max(n // 40, 64)
    n_pad = pad_rows(n)

    @jax.jit
    def gen(seed):
        k1, k2, k3, k4, k5 = jax.random.split(jax.random.key(seed), 5)
        centers = jax.random.normal(k1, (n_clusters, d), jnp.float32) * 2.0
        assign = jax.random.randint(k2, (n,), 0, n_clusters)
        corpus = centers[assign] + jax.random.normal(k3, (n, d)) * 0.7
        qassign = jax.random.randint(k4, (512,), 0, n_clusters)
        qs = centers[qassign] + jax.random.normal(k5, (512, d)) * 0.7
        return corpus, qs

    corpus_dev, queries_dev = gen(0)
    sq = jnp.sum(corpus_dev * corpus_dev, axis=1, keepdims=True)
    norm_dev = jnp.pad(
        corpus_dev * jax.lax.rsqrt(jnp.maximum(sq, 1e-30)),
        ((0, n_pad - n), (0, 0)),
    )
    del corpus_dev
    packed = binary_quantize(norm_dev)
    valid = jnp.arange(n_pad) < n
    pen = jnp.where(valid, 0.0, jnp.inf)
    jax.block_until_ready(packed)
    queries = np.asarray(queries_dev)

    gt_q = jnp.asarray(queries[:batch])
    _, gt = chunked_topk(gt_q, norm_dev, valid, K, metric,
                         chunk=_scan_chunk(n_pad))
    gt = np.asarray(gt)
    # host oracle on the normalized corpus (reads back 100D f32 once)
    corpus_host = np.asarray(norm_dev[:n])
    q_host = np.asarray(queries[:batch], np.float32)
    q_host = q_host / np.maximum(
        np.linalg.norm(q_host, axis=1, keepdims=True), 1e-30
    )
    kth = np.empty(batch, np.float64)
    gt_host = np.empty((batch, K), np.int64)
    for i in range(batch):
        s = corpus_host @ q_host[i]
        top = np.argpartition(-s, K - 1)[:K]
        kth[i] = s[top].min()
        gt_host[i] = top

    points = []

    def measure(engine, knob, fn, arrays, batches=(batch, 16), latency=False):
        _, idx = fn(gt_q, *arrays)
        idx = np.asarray(idx)
        r = float(np.mean(
            [len(set(idx[i]) & set(gt[i])) / K for i in range(batch)]
        ))
        r_host = float(np.mean(
            [len(set(idx[i]) & set(gt_host[i])) / K for i in range(batch)]
        ))
        eps_hits = 0
        for i in range(batch):
            ids = idx[i][idx[i] >= 0]
            if len(ids):
                s = corpus_host[ids] @ q_host[i]
                eps_hits += int(np.sum(s >= kth[i] - 1e-3 * abs(kth[i]) - 1e-9))
        r_eps = eps_hits / float(batch * K)
        for b in batches:
            q_min, q_med = scan_stats(fn, arrays, queries, b, d)
            pt = {"engine": engine, "knob": knob, "batch": b,
                  "recall": round(r, 4), "recall_host": round(r_host, 4),
                  "recall_eps": round(r_eps, 4),
                  "qps": round(q_min), "qps_med": round(q_med)}
            if latency and b == min(batches):
                p50, p99, wflag = latency_probe(fn, arrays, queries, d)
                pt["b1_p50_ms"] = round(p50, 2)
                pt["b1_p99_ms"] = round(p99, 2)
                if wflag:
                    pt["b1_p99_weather"] = True
            points.append(pt)
            print(name, pt, flush=True)

    interp = not use_pallas()

    def coarse_fn(q, pk, pn):
        pq = binary_quantize(q)
        dist, idx = hamming_bucket_topk(pq, pk, pn, k=K, chunk=2048,
                                        interpret=interp)
        return 1.0 - dist / float(d), idx

    measure("hamming-coarse", "prefilter-only", coarse_fn, (packed, pen),
            latency=True)

    for m in (40, 80, 160):
        def rerank_fn(q, pk, pn, c, _m=m):
            pq = binary_quantize(q)
            return hamming_rerank_topk(
                q, pq, pk, pn, c, k=K, m=_m, metric=metric, chunk=2048,
                interpret=interp,
            )

        measure("hamming-rerank", f"m={m}", rerank_fn,
                (packed, pen, norm_dev), latency=(m == 80))

    # bit-plane MXU Hamming (r5 serve default when the 1B/bit shadow fits
    # the HBM budget; packed stays the capacity mode) — measured 5.4x the
    # packed VPU loop at this config (exp_hamming_mxu.py)
    from velesdb_tpu.ops.bucket_kernel import (
        _HAM_BIG,
        bucket_chunk_for,
        hamming_bits_rows,
        hamming_mxu_rerank_topk,
        hamming_mxu_topk,
    )

    bits = hamming_bits_rows(norm_dev, d)
    csum = jnp.sum(bits.astype(jnp.int32), axis=1)
    aux = jnp.where(valid, csum, csum + _HAM_BIG).astype(jnp.int32)
    jax.block_until_ready(aux)
    d_pad = bits.shape[1]
    mxu_chunk = min(bucket_chunk_for(batch, d_pad, 1, n_pad), n_pad)

    def mxu_coarse_fn(q, bt, ax):
        qb = (q >= 0.0).astype(jnp.int8)
        qb = jnp.pad(qb, ((0, 0), (0, d_pad - q.shape[1])))
        dist, idx = hamming_mxu_topk(qb, bt, ax, k=K, chunk=mxu_chunk,
                                     interpret=interp)
        return 1.0 - dist / float(d), idx

    measure("hamming-mxu-coarse", f"chunk={mxu_chunk}", mxu_coarse_fn,
            (bits, aux), latency=True)

    for m in (40, 80):
        def mxu_rerank_fn(q, bt, ax, c, _m=m):
            qb = (q >= 0.0).astype(jnp.int8)
            qb = jnp.pad(qb, ((0, 0), (0, d_pad - q.shape[1])))
            return hamming_mxu_rerank_topk(
                q, qb, bt, ax, c, k=K, m=_m, metric=metric,
                chunk=mxu_chunk, interpret=interp,
            )

        measure("hamming-mxu-rerank", f"m={m}", mxu_rerank_fn,
                (bits, aux, norm_dev), latency=(m == 80))

    return {"config": name, "n": n, "d": d, "metric": metric.value,
            "batch": batch, "k": K, "iters_per_dispatch": ITERS,
            "samples": SAMPLES,
            "memory": "packed sketch 1 bit/dim + f32 rerank corpus",
            "points": points}


def run_config_hybrid(name, n=100_000, d=768, batch=256):
    """End-to-end hybrid (NEAR + BM25 MATCH + columnar filter, device-fused
    RRF) through the PUBLIC ``hybrid_search_batch`` — VERDICT r4 weak #5:
    the hybrid number gets an artifact row with qps/qps_med, its overlap
    quality, and a weather annotation (per-call RTT probe before/after, so
    a 2x swing between runs is attributable). Host-observed wall: the path
    is one fused device program + ONE readback per batch, so the tunnel
    RTT rides each call (amortized across the batch)."""
    import tempfile

    import jax
    import jax.numpy as jnp

    from benchmarks.exp_hybrid import VOCAB
    from velesdb_tpu.database import Database
    from velesdb_tpu.fusion import weighted_rrf

    k = K
    rng = np.random.default_rng(42)
    centers = rng.standard_normal((64, d)).astype(np.float32) * 2.0
    assign = rng.integers(0, 64, n)
    corpus = centers[assign] + 0.7 * rng.standard_normal((n, d)).astype(
        np.float32
    )
    words = np.array(VOCAB)
    topic = words[(assign % len(VOCAB))]
    payloads = []
    for i in range(n):
        extra = " ".join(words[rng.integers(0, len(words), 2)])
        payloads.append(
            {"text": f"{topic[i]} {topic[i]} {extra}",
             "price": float(rng.uniform(1, 100))}
        )
    db = Database(tempfile.mkdtemp(prefix="curve_hybrid_"))
    col = db.create_collection("h", dim=d, metric="cosine")
    step = 50_000
    for s in range(0, n, step):
        col.upsert_bulk(range(s, min(s + step, n)),
                        corpus[s : s + step], payloads[s : s + step])
    col._ensure_text()
    col.refresh_device()

    qa = rng.integers(0, 64, batch)
    qvecs = centers[qa] + 0.7 * rng.standard_normal((batch, d)).astype(
        np.float32
    )
    qtexts = [str(words[a % len(words)]) for a in qa]
    filt = {"type": "lt", "field": "price", "value": 50.0}

    def rtt_probe(calls=7):
        """Median per-call dispatch+readback of a small matmul — the
        weather floor every host-observed hybrid call pays once."""
        a0 = jnp.ones((256, 256), jnp.float32)
        jax.block_until_ready(a0 @ a0)
        ts = []
        for i in range(calls):
            a = jnp.full((256, 256), 1.0 + i, jnp.float32)
            jax.block_until_ready(a)
            t0 = time.perf_counter()
            np.asarray((a @ a)[0, 0])
            ts.append((time.perf_counter() - t0) * 1e3)
        return round(float(np.median(ts)), 2)

    rtt_before = rtt_probe()

    # quality: overlap@10 vs the host-fused oracle (exact host-f32 vector
    # scores + same BM25 scores + host weighted-RRF)
    got = col.hybrid_search_batch(qvecs, qtexts, k, filter=filt)
    mask = np.asarray(col._raw_filter_mask(filt), bool)
    live_ids = np.arange(n)[mask[:n]]
    ch = corpus / np.maximum(
        np.linalg.norm(corpus, axis=1, keepdims=True), 1e-30
    )
    fetch = 2 * k
    overlaps = []
    for i in range(batch):
        qn = qvecs[i] / max(np.linalg.norm(qvecs[i]), 1e-30)
        s = ch[mask[:n]] @ qn
        top = live_ids[np.argsort(-s)[:fetch]]
        vec_list = [(int(t), float(ch[t] @ qn)) for t in top]
        tv, ts = col.text_index.search_batch([qtexts[i]], fetch, n, mask=mask)
        txt_list = [
            (int(sl), float(v))
            for v, sl in zip(tv[0], ts[0]) if sl >= 0 and v > 0
        ]
        want = [vid for vid, _ in weighted_rrf(vec_list, txt_list, k)]
        got_ids = [r.id for r in got[i]]
        overlaps.append(len(set(got_ids) & set(want)) / k)
    quality = round(float(np.mean(overlaps)), 4)

    points = []
    for bsz in (batch, 16):
        reps = max(2, 512 // bsz)
        col.hybrid_search_batch(qvecs[:bsz], qtexts[:bsz], k, filter=filt)
        samples = []
        for s in range(SAMPLES):
            t0 = time.perf_counter()
            for r in range(reps):
                qv = qvecs[:bsz] + np.float32(1e-4 * (s * reps + r + 1))
                col.hybrid_search_batch(qv, qtexts[:bsz], k, filter=filt)
            samples.append(time.perf_counter() - t0)
        nq = reps * bsz
        points.append({
            "engine": "hybrid-fused", "knob": "NEAR+MATCH+filter rrf",
            "batch": bsz, "overlap_host_oracle": quality,
            "qps": round(nq / float(np.min(samples))),
            "qps_med": round(nq / float(np.median(samples))),
        })
        print(name, points[-1], flush=True)

    rtt_after = rtt_probe()
    return {"config": name, "n": n, "d": d,
            "metric": "cosine NEAR + bm25 MATCH + price filter, fused RRF",
            "batch": batch, "k": K, "samples": SAMPLES,
            "protocol": "host-observed public hybrid_search_batch, unique "
                        "inputs/call, one fused program + one readback",
            "rtt_ms_before": rtt_before, "rtt_ms_after": rtt_after,
            "points": points}


def main():
    which = os.environ.get("CURVE_CONFIG", "both")
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "BENCH_curve.json")
    out = {"protocol": "scan-batched device-side, 64 unique batches/dispatch, "
                       "min+median of >=3 samples, forced readback; b1_p50/p99 "
                       "are per-call host-observed through the tunnel",
           "configs": []}
    if os.path.exists(path):  # merge: single-config runs update in place
        try:
            with open(path) as f:
                prev = json.load(f)
            out["configs"] = prev.get("configs", [])
        except ValueError:
            pass
    fresh = []
    if which in ("both", "cos"):
        fresh.append(run_config("100Kx768D-cosine", 100_000, 768, "cosine"))
    if which in ("both", "sift"):
        fresh.append(run_config("1Mx128D-euclidean", 1_000_000, 128, "euclidean"))
    if which in ("all", "glove"):
        # BASELINE config #3 (binary-Hamming prefilter + f32 rerank)
        fresh.append(run_config_binary("1.2Mx100D-angular-binary", 1_200_000, 100))
    if which in ("all", "ref10k"):
        # the reference's own flagship config (BASELINE config #1: 10Kx768D,
        # 9.2K QPS @ 57us p50) — same-config comparison row (VERDICT r4 #10)
        fresh.append(run_config("10Kx768D-cosine-ref", 10_000, 768, "cosine"))
    if which in ("all", "hybrid"):
        # VERDICT r5 #5: the hybrid path's artifact row (qps+qps_med+weather)
        fresh.append(run_config_hybrid("100Kx768D-hybrid-rrf"))
    if which in ("ann5m",):
        # VERDICT r5 #4: the ANN engines' design regime (above
        # ANN_MIN_ROWS=2M, where streaming the corpus stops paying) —
        # graph/IVF/exact ladders at 5Mx128D with host/eps recall
        fresh.append(run_config("5Mx128D-euclidean", 5_000_000, 128,
                                "euclidean"))
    names = {c["config"] for c in fresh}
    if ENGINES is not None:
        # partial re-run: keep the recorded points of engines NOT in the
        # allowlist (and drop any stale error rows for re-run engines)
        old_by_name = {c["config"]: c for c in out["configs"]}
        for c in fresh:
            old = old_by_name.get(c["config"])
            if old is not None:
                kept = [p for p in old.get("points", [])
                        if p.get("engine") not in ENGINES]
                c["points"] = kept + c["points"]
    out["configs"] = [c for c in out["configs"] if c["config"] not in names] + fresh
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
