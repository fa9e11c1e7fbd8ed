"""Experiment: bit-plane MXU Hamming kernel (VERDICT r4 weak #4 / next #3).

The shipped packed-Hamming bucket kernel runs the xor+popcount loop on the
VPU: W words x (xor + popcount + add) = ~12 VPU ops per [B, C] element at
100D (W=4) — 2.5 GB/s effective at 1.2M x 100D (30K QPS), ~50x under the
f32 stream's byte rate. The MXU formulation removes the VPU loop entirely:

    popcount(q XOR c) = |q| + |c| - 2 q.c      (0/1 bit vectors)

Store the corpus as UNPACKED int8 0/1 bit rows [N, D_pad] (1 byte/bit — an
8x shadow over packed, still 4x under f32 at D>=32), pre-double the query
(qi = 2*bits, int8), and rank on the int32 MXU output directly:

    s = doti - aux        aux = |c| + penalty   (int32, one packed tile)
    ham = |q| - s         (restored after selection; |q| is per-query)

Epilogue = 1 subtract + 2 selection passes, all int32 — ~3 VPU ops/elem
vs ~16. Variants:

    h0    shipped hamming_bucket_topk (packed, VPU popcount)
    hm    MXU bit-plane kernel (this experiment)
    h0r   shipped hamming_rerank_topk m=80 (packed coarse + f32 rerank)
    hmr   MXU coarse + the same _exact_rerank_tail at m=80

Run: python benchmarks/exp_hamming_mxu.py  (knobs: EXP_N, EXP_D, EXP_B)
"""

import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/velesdb_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N = int(os.environ.get("EXP_N", 1_200_000))
D = int(os.environ.get("EXP_D", 100))
B = int(os.environ.get("EXP_B", 256))
K = 10
M = 80
ITERS = 64
SAMPLES = 3
_LANES = 128
_BIG = 1 << 20


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from velesdb_tpu.ops import DistanceMetric
    from velesdb_tpu.ops.bucket_kernel import (
        _bucket_select,
        _exact_rerank_tail,
        _final_select,
        hamming_bucket_topk,
        hamming_rerank_topk,
    )
    from velesdb_tpu.ops.quantization import binary_quantize

    def _k_hm(qi_ref, rows_ref, aux_ref, gm_ref, gi_ref, *, chunk):
        c = pl.program_id(0)
        doti = jax.lax.dot_general(
            qi_ref[:], rows_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # [B, C] = 2 q.c
        s = doti - aux_ref[0, :][None, :]
        gm, gi = _bucket_select(s, c * chunk)
        gm_ref[:] = gm.astype(jnp.float32)
        gi_ref[:] = gi

    @functools.partial(jax.jit, static_argnames=("k", "chunk"))
    def hamming_mxu_topk(qbits, rows_bits, aux, *, k, chunk):
        """qbits [B, D_pad] int8 0/1; rows_bits [N_pad, D_pad] int8 0/1;
        aux [N_pad] int32 = colsum + _BIG * knocked_out."""
        b = qbits.shape[0]
        n, d_pad = rows_bits.shape
        b_pad = ((max(b, 8) + 7) // 8) * 8
        qi = jnp.pad(2 * qbits, ((0, b_pad - b), (0, 0)))
        qsum = jnp.sum(qbits.astype(jnp.int32), axis=1)  # [B]
        aux8 = jnp.broadcast_to(aux[None, :], (8, n))
        grid = (n // chunk,)
        nbuckets = (n // chunk) * _LANES
        gm, gi = pl.pallas_call(
            functools.partial(_k_hm, chunk=chunk),
            grid=grid,
            in_specs=[
                pl.BlockSpec((b_pad, d_pad), lambda c: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((chunk, d_pad), lambda c: (c, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, chunk), lambda c: (0, c),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((b_pad, _LANES), lambda c: (0, c),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((b_pad, _LANES), lambda c: (0, c),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((b_pad, nbuckets), jnp.float32),
                jax.ShapeDtypeStruct((b_pad, nbuckets), jnp.int32),
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * b_pad * n * d_pad,
                bytes_accessed=n * d_pad + n * 4,
                transcendentals=0,
            ),
        )(qi, rows_bits, aux8)
        vals, idx = _final_select(gm, gi, k, b)
        empty = vals < -(_BIG // 2)
        dist = jnp.where(empty, jnp.inf, qsum[:, None].astype(jnp.float32) - vals)
        return dist, jnp.where(empty, -1, idx)

    # ---- hme: enc-select — fold (aux, slice-index) into ONE int32 tile.
    # enc = (doti << 6) + ptile, ptile = (-aux << 6) + slice_idx(row):
    # a single max pass (3 ops/elem: shift, add, max) yields value AND
    # exact argmax; the gi output and the 2-op argmax pass disappear.
    def _k_hme(qi_ref, rows_ref, pt_ref, gm_ref, *, chunk):
        doti = jax.lax.dot_general(
            qi_ref[:], rows_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # [B, C] = 2 q.c
        w = chunk // _LANES
        m = None
        for i in range(w):
            sl = slice(i * _LANES, (i + 1) * _LANES)
            e = doti[:, sl] * 64 + pt_ref[0, sl][None, :]
            m = e if m is None else jnp.maximum(m, e)
        gm_ref[:] = m

    @functools.partial(jax.jit, static_argnames=("k", "chunk"))
    def hamming_enc_topk(qbits, rows_bits, ptile, *, k, chunk):
        """ptile [N_pad] int32 = ((csum + BIG*invalid) * -64) + slice_idx."""
        b = qbits.shape[0]
        n, d_pad = rows_bits.shape
        b_pad = ((max(b, 8) + 7) // 8) * 8
        qi = jnp.pad(2 * qbits, ((0, b_pad - b), (0, 0)))
        qsum = jnp.sum(qbits.astype(jnp.int32), axis=1)  # [B]
        pt8 = jnp.broadcast_to(ptile[None, :], (8, n))
        grid = (n // chunk,)
        nbuckets = (n // chunk) * _LANES
        (gm,) = pl.pallas_call(
            functools.partial(_k_hme, chunk=chunk),
            grid=grid,
            in_specs=[
                pl.BlockSpec((b_pad, d_pad), lambda c: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((chunk, d_pad), lambda c: (c, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, chunk), lambda c: (0, c),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((b_pad, _LANES), lambda c: (0, c),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((b_pad, nbuckets), jnp.int32),
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * b_pad * n * d_pad,
                bytes_accessed=n * d_pad + n * 4,
                transcendentals=0,
            ),
        )(qi, rows_bits, pt8)
        af = gm.astype(jnp.float32)
        vals_f, pos = jax.lax.approx_max_k(af, min(k, af.shape[1]),
                                           recall_target=0.99)
        enc = jnp.take_along_axis(gm, pos, axis=1)[:b]
        pos = pos[:b]
        i_dec = enc & 63
        val = (enc - i_dec) // 64  # exact, sign-safe
        chunk_id = pos // _LANES
        lane = pos % _LANES
        idx = chunk_id * chunk + i_dec * _LANES + lane
        empty = val < -(_BIG // 2)
        dist = jnp.where(
            empty, jnp.inf,
            qsum[:b, None].astype(jnp.float32) - val.astype(jnp.float32),
        )
        return dist, jnp.where(empty, -1, idx)

    # ---- data ----------------------------------------------------------
    rng = np.random.default_rng(7)
    corpus = rng.standard_normal((N, D)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    queries = corpus[rng.integers(0, N, B)] + rng.standard_normal(
        (B, D)
    ).astype(np.float32) * 0.25
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)

    import jax.numpy as jnp  # noqa: F811 (scoped import used above)

    n_pad = ((N + 8191) // 8192) * 8192
    d_pad = ((D + 127) // 128) * 128
    cj = jnp.asarray(corpus)
    packed = binary_quantize(cj)
    packed = jnp.pad(packed, ((0, n_pad - N), (0, 0)))
    bits = jnp.pad(
        (cj >= 0.0).astype(jnp.int8), ((0, n_pad - N), (0, d_pad - D))
    )
    csum = jnp.sum(bits.astype(jnp.int32), axis=1)
    valid = jnp.arange(n_pad) < N
    aux = jnp.where(valid, csum, csum + _BIG).astype(jnp.int32)
    rows_pos = jnp.arange(n_pad)
    pt2048 = aux * (-64) + ((rows_pos % 2048) // _LANES)
    pt8192 = aux * (-64) + ((rows_pos % 8192) // _LANES)
    pen = jnp.where(valid, 0.0, jnp.inf)
    cf = jnp.pad(cj, ((0, n_pad - N), (0, 0)))  # f32 for rerank (unpadded D)
    jax.block_until_ready((packed, bits, aux, cf))
    print(f"[hm] state up: bits {bits.shape} packed {packed.shape}", flush=True)

    qbits = (jnp.asarray(queries) >= 0.0).astype(jnp.int8)
    qbits = jnp.pad(qbits, ((0, 0), (0, d_pad - D)))
    pq = binary_quantize(jnp.asarray(queries))

    # host oracles: exact Hamming (coarse fidelity) + cosine f32 (rerank)
    hq = (queries >= 0.0).astype(np.int64)
    hc = (corpus >= 0.0).astype(np.int64)
    ham = (hq[:, None, :] != hc[None, : 200_000, :]).sum(-1) if N <= 200_000 else None
    dots = corpus @ queries.T  # [N, B] cosine (rows unit)
    gt_host = np.empty((B, K), np.int64)
    for i in range(B):
        sc = -dots[:, i]
        part = np.argpartition(sc, K)[:K]
        gt_host[i] = part[np.argsort(sc[part])]

    metric = DistanceMetric.COSINE

    @jax.jit
    def hmr(qf, qbits, bits, aux, cf):
        _, ci = hamming_mxu_topk(qbits, bits, aux, k=M, chunk=2048)
        return _exact_rerank_tail(qf, cf, ci, k=K, metric=metric)

    @jax.jit
    def hmer(qf, qbits, bits, pt, cf):
        _, ci = hamming_enc_topk(qbits, bits, pt, k=M, chunk=8192)
        return _exact_rerank_tail(qf, cf, ci, k=K, metric=metric)

    @jax.jit
    def h0r(qf, pq, packed, pen, cf):
        return hamming_rerank_topk(
            qf, pq, packed, pen, cf, k=K, m=M, metric=metric, chunk=2048,
            interpret=False,
        )

    qf = jnp.asarray(queries)

    # unique lead inputs per iter, precomputed per lead kind
    qv = (np.resize(queries, (ITERS * B, D))
          + rng.standard_normal((ITERS * B, D)).astype(np.float32) * 0.05)
    pqv = np.asarray(binary_quantize(jnp.asarray(qv)))
    qbv = np.pad((qv >= 0.0).astype(np.int8), ((0, 0), (0, d_pad - D)))
    lead_f = jnp.asarray(qv.reshape(ITERS, B, D))
    lead_pq = jnp.asarray(pqv.reshape(ITERS, B, -1))
    lead_qb = jnp.asarray(qbv.reshape(ITERS, B, d_pad))

    # engines: label -> (fn, lead arrays (scanned), static arrays, kind)
    engines = {
        "h0": (
            lambda pq, packed, pen: hamming_bucket_topk(
                pq, packed, pen, k=K, chunk=2048, interpret=False
            ),
            (lead_pq,), (pq,), (packed, pen), "ham",
        ),
        "hm": (
            lambda qbits, bits, aux: hamming_mxu_topk(
                qbits, bits, aux, k=K, chunk=2048
            ),
            (lead_qb,), (qbits,), (bits, aux), "ham",
        ),
        "hm8": (
            lambda qbits, bits, aux: hamming_mxu_topk(
                qbits, bits, aux, k=K, chunk=8192
            ),
            (lead_qb,), (qbits,), (bits, aux), "ham",
        ),
        "hme2": (
            lambda qbits, bits, pt: hamming_enc_topk(
                qbits, bits, pt, k=K, chunk=2048
            ),
            (lead_qb,), (qbits,), (bits, pt2048), "ham",
        ),
        "hme8": (
            lambda qbits, bits, pt: hamming_enc_topk(
                qbits, bits, pt, k=K, chunk=8192
            ),
            (lead_qb,), (qbits,), (bits, pt8192), "ham",
        ),
        "h0r": (h0r, (lead_f, lead_pq), (qf, pq), (packed, pen, cf), "cos"),
        "hmr": (hmr, (lead_f, lead_qb), (qf, qbits), (bits, aux, cf), "cos"),
        "hmer": (hmer, (lead_f, lead_qb), (qf, qbits), (bits, pt8192, cf),
                 "cos"),
    }

    # identity check hm vs h0 on hamming distances
    d0, i0 = hamming_bucket_topk(pq, packed, pen, k=K, chunk=2048,
                                 interpret=False)
    dm, im = hamming_mxu_topk(qbits, bits, aux, k=K, chunk=2048)
    d0, dm = np.asarray(d0), np.asarray(dm)
    print(f"[hm] coarse distance agreement: max|d0-dm| = "
          f"{float(np.max(np.abs(d0 - dm))):.1f} "
          f"(id overlap {float(np.mean([len(set(np.asarray(i0)[i]) & set(np.asarray(im)[i])) / K for i in range(B)])):.4f})",
          flush=True)
    de, ie = hamming_enc_topk(qbits, bits, pt8192, k=K, chunk=8192)
    de = np.asarray(de)
    print(f"[hm] enc-select agreement: max|d0-de| = "
          f"{float(np.max(np.abs(d0 - de))):.1f} "
          f"(id overlap {float(np.mean([len(set(np.asarray(i0)[i]) & set(np.asarray(ie)[i])) / K for i in range(B)])):.4f})",
          flush=True)

    for label, (fn, leads, probe, arrays, kind) in engines.items():
        lead_all = leads
        try:
            v, idx = fn(*probe, *arrays)
            idx = np.asarray(idx)
        except Exception as e:
            print(f"[hm] {label:4s} FAILED: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
            continue
        r_host = float(np.mean(
            [len(set(idx[i].tolist()) & set(gt_host[i].tolist())) / K
             for i in range(B)]
        )) if kind == "cos" else float("nan")

        @jax.jit
        def run_many(leads, *ops):
            def body(_, lead):
                vv, ii = fn(*lead, *ops)
                return None, (vv[0, 0], ii[0, 0])

            _, outs = jax.lax.scan(body, None, leads)
            return outs

        jax.block_until_ready(run_many(lead_all, *arrays))
        samples = []
        for s in range(SAMPLES):
            if isinstance(lead_all, tuple):
                lead_s = tuple(
                    jax.block_until_ready(jnp.roll(x, 1 + 7 * s, axis=0))
                    for x in lead_all
                )
            else:
                lead_s = jax.block_until_ready(
                    jnp.roll(lead_all, 1 + 7 * s, axis=0)
                )
            t0 = time.perf_counter()
            outs = run_many(lead_s, *arrays)
            np.asarray(outs[0])
            samples.append(time.perf_counter() - t0)
        qps = ITERS * B / float(np.min(samples))
        ms = float(np.min(samples)) / ITERS * 1e3
        print(
            f"[hm] {label:4s} N={N:,} D={D} b={B}: {qps:,.0f} QPS "
            f"({ms:.3f} ms/batch) recall_host={r_host:.4f} "
            f"samples={[f'{t:.3f}' for t in samples]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
