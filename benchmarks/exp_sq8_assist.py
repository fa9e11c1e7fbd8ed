"""Experiment: int8-assist serve path for FULL collections at D < 512.

`sq8i_rerank_topk` (coarse int8 bucket scan + in-program f32 gather-rerank)
was measured out in r3b at 94K QPS @1Mx128D, attributed to "XLA's ~3GB/s
row slice-gather" on the [B, m, D] candidate gather. r3d's gather
microbenchmark (exp_gather_kernel.py) then showed per-ROW gathers actually
pipeline to the ~9GB/s transaction wall (477us for 8192 rows x 128D) — the
2-3GB/s reading was partition-scale slices, a different shape. At m=32 the
rerank gather is 256*32 = 8192 rows ~= 0.5ms, which on top of the int8
coarse scan (0.96ms/256-batch, 267.8K QPS) lands ~175K QPS — ABOVE the
current FULL D<512 serve default (split-bf16 hl kernel, 151.8K QPS) at
exact-grade recall (coarse+f32-rerank = 0.998 host-basis vs hl 0.985).

This re-measures the r3b comparison head-to-head with the 64-batch scan
protocol and TRUE host-f32 oracle recall:

    hl    split-bf16 bucket kernel (current serve default)
    f32   plain f32 bucket kernel
    a16/a32/a64  sq8i_rerank_topk at m = 16/32/64

Run: python benchmarks/exp_sq8_assist.py  (knobs: EXP_N, EXP_D, EXP_B)

MEASURED (v5e, 2026-08-19, euclidean clustered, b=256, k=10, same-run A/B;
host-f32 oracle recall):

    200Kx128D   hl  278.8K @ 0.9906 | f32 422.5K @ 0.9578
                a16 383.0K @ 0.9973 | a32 212.7K @ 0.9980 | a64 261.4K @ 0.9980
    1Mx128D     hl  100.1K @ 0.9922 | f32 211.1K @ 0.9539
                a16 236.1K @ 0.9977 | a32 205.8K @ 0.9984 | a64 160.7K @ 0.9992

The r3b "94K cap" was indeed a stale-shape reading: the in-program rerank
adds only ~0.05-0.13 ms/batch over the int8 coarse scan. a16 beats the hl
serve default on BOTH axes at BOTH scales (1M: 2.36x QPS, +0.0055 recall)
and even outruns the plain f32 kernel (the coarse scan reads 1/4 the
bytes). Wired as the FULL D<512 serve default in `index/brute.py` (hl
kept as the fallback build when the int8 kernel family is unavailable);
the a32/a64 non-monotonicity is approx_max_k shape/weather noise — m=16
is already at the recall knee for k=10.
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/velesdb_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N = int(os.environ.get("EXP_N", 1_000_000))
D = int(os.environ.get("EXP_D", 128))
B = int(os.environ.get("EXP_B", 256))
K = 10
ITERS = 64
SAMPLES = 3


def main():
    import jax
    import jax.numpy as jnp

    from velesdb_tpu.ops import DistanceMetric
    from velesdb_tpu.ops.bucket_kernel import (
        bucket_chunk_for,
        bucket_topk_entry,
        bucket_topk_hl,
        split_f32_rows,
        sq8_int8_rows,
        sq8i_rerank_topk,
    )
    from velesdb_tpu.ops.quantization import sq8_quantize

    metric = DistanceMetric.EUCLIDEAN
    rng = np.random.default_rng(42)
    centers = rng.standard_normal((64, D)).astype(np.float32) * 2.0
    corpus = centers[rng.integers(0, 64, N)] + rng.standard_normal(
        (N, D)
    ).astype(np.float32) * 0.7
    queries = centers[rng.integers(0, 64, B)] + rng.standard_normal(
        (B, D)
    ).astype(np.float32) * 0.7

    n_pad = 1 << (N - 1).bit_length()
    d_pad = ((D + 127) // 128) * 128
    t0 = time.perf_counter()
    cf = jnp.pad(jnp.asarray(corpus), ((0, n_pad - N), (0, d_pad - D)))
    jax.block_until_ready(cf)
    print(f"[assist] H2D upload {time.perf_counter() - t0:.1f}s", flush=True)
    sqn = jnp.sum(cf * cf, axis=1)
    valid = jnp.arange(n_pad) < N
    pen = jnp.where(valid, sqn, jnp.inf)

    # hl state
    hi, lo = split_f32_rows(cf)
    # sq8i state (euclidean: scale/minv unfolded, pen = dequantized sqnorm)
    sq = sq8_quantize(cf)
    rows8 = sq8_int8_rows(sq.codes)
    deq = sq.codes.astype(jnp.float32) * sq.scale[:, None] + sq.minv[:, None]
    deq_sq = jnp.sum(deq * deq, axis=1)
    pen8 = jnp.where(valid, deq_sq, jnp.inf)
    scale8 = sq.scale.astype(jnp.float32)
    minv8 = sq.minv.astype(jnp.float32)
    del deq
    jax.block_until_ready(rows8)

    # host-f32 oracle on the B probe queries (blocked matmul form)
    csq = np.sum(corpus.astype(np.float64) ** 2, axis=1)
    gt_host = np.empty((B, K), np.int64)
    dots = corpus @ queries.T  # [N, B]
    for i in range(B):
        d2 = csq - 2.0 * dots[:, i].astype(np.float64)  # + |q|^2 rank-const
        part = np.argpartition(d2, K)[:K]
        gt_host[i] = part[np.argsort(d2[part])]

    b_pad = ((B + 7) // 8) * 8
    chunk_hl = min(bucket_chunk_for(b_pad, d_pad, 8), n_pad)
    chunk_f32 = min(bucket_chunk_for(b_pad, d_pad, 4), n_pad)
    chunk_i8 = min(bucket_chunk_for(b_pad, d_pad, 1), n_pad)

    qp = jnp.pad(jnp.asarray(queries), ((0, 0), (0, d_pad - D)))

    engines = {
        "hl": (
            lambda q, hi, lo, pen: bucket_topk_hl(
                q, hi, lo, pen, None, k=K, metric=metric, chunk=chunk_hl,
                interpret=False,
            ),
            (hi, lo, pen),
        ),
        "f32": (
            lambda q, cf, pen: bucket_topk_entry(
                q, cf, pen, None, k=K, metric=metric, chunk=chunk_f32,
                interpret=False, prenormalized=True,
            ),
            (cf, pen),
        ),
    }
    for m in (16, 32, 64):
        engines[f"a{m}"] = (
            (lambda mm: lambda q, rows8, scale8, minv8, pen8, cf:
                sq8i_rerank_topk(
                    q, rows8, scale8, minv8, pen8, cf, k=K, m=mm,
                    metric=metric, chunk=chunk_i8, interpret=False,
                ))(m),
            (rows8, scale8, minv8, pen8, cf),
        )

    big = np.resize(np.asarray(qp), (ITERS * B, d_pad))
    big = big + rng.standard_normal(big.shape).astype(np.float32) * 0.01
    qs = jnp.asarray(big.reshape(ITERS, B, d_pad))

    for label, (fn, arrays) in engines.items():
        v, idx = fn(qp, *arrays)
        idx = np.asarray(idx)
        r_host = float(np.mean(
            [len(set(idx[i].tolist()) & set(gt_host[i].tolist())) / K
             for i in range(B)]
        ))

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
        qps = ITERS * B / float(np.min(samples))
        ms = float(np.min(samples)) / ITERS * 1e3
        print(
            f"[assist] {label:4s} N={N:,} D={D}: {qps:,.0f} QPS "
            f"({ms:.3f} ms/batch) recall_host={r_host:.4f} "
            f"samples={[f'{t:.3f}' for t in samples]}",
            flush=True,
        )

    # ADVICE r3 #4: mid-range-k A/B of the serve oversample formula
    # (m = min(max(2k-4, 16), 256)) — the heuristic is recall-validated at
    # k=10 only; coarse int8 misses at k=50/100 would be unrecoverable by
    # the exact rerank. hl (true-f32 fidelity) rides as the comparator.
    for kk in (50, 100):
        mm = min(max(2 * kk - 4, 16), 256)
        gt_k = np.empty((B, kk), np.int64)
        for i in range(B):
            d2 = csq - 2.0 * dots[:, i].astype(np.float64)
            part = np.argpartition(d2, kk)[:kk]
            gt_k[i] = part[np.argsort(d2[part])]
        _, ai = sq8i_rerank_topk(
            qp, rows8, scale8, minv8, pen8, cf, k=kk, m=mm, metric=metric,
            chunk=chunk_i8, interpret=False,
        )
        ai = np.asarray(ai)
        r_a = float(np.mean(
            [len(set(ai[i].tolist()) & set(gt_k[i].tolist())) / kk
             for i in range(B)]
        ))
        _, hi_idx = bucket_topk_hl(
            qp, hi, lo, pen, None, k=kk, metric=metric, chunk=chunk_hl,
            interpret=False,
        )
        hi_idx = np.asarray(hi_idx)
        r_h = float(np.mean(
            [len(set(hi_idx[i].tolist()) & set(gt_k[i].tolist())) / kk
             for i in range(B)]
        ))
        print(
            f"[assist] k={kk} m={mm}: assist recall_host={r_a:.4f} "
            f"vs hl {r_h:.4f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
