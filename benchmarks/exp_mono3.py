"""Native-int8 monolithic coarse scan (r4): the XLA twin of the Pallas
int8-direct kernel's math — per-query symmetric int8 quantization,
int8 x int8 -> int32 dot_general on the MXU (1 byte/dim HBM), affine
restore, approx_max_k, exact f32 gather-rerank — all one fused program.

Ladder at 1Mx128 L2 (same run):
  mono-bf16-rr   bf16-cast codes matmul + rerank  (exp_mono2 winner so far)
  mono-qi8       native int8 coarse only          (floor probe)
  mono-qi8-rr    native int8 coarse + f32 rerank  (the shippable candidate)

Run: python benchmarks/exp_mono3.py
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/velesdb_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ITERS = 64
SAMPLES = 3


def scan_time_ms(fn, arrays, queries, batch, d):
    import jax
    import jax.numpy as jnp

    big = np.resize(queries, (ITERS * batch, d))
    big = big + np.random.default_rng(9).standard_normal(big.shape).astype(
        np.float32) * 0.01
    qs = jnp.asarray(big.reshape(ITERS, batch, d))

    @jax.jit
    def run_many(qs, *ops):
        def body(_, q):
            out = fn(q, *ops)
            leaf = jax.tree_util.tree_leaves(out)[0]
            return None, leaf.reshape(-1)[0]

        _, outs = jax.lax.scan(body, None, qs)
        return outs

    jax.block_until_ready(run_many(qs, *arrays))
    samples = []
    for s in range(SAMPLES):
        qs_s = jax.block_until_ready(jnp.roll(qs, 1 + 7 * s, axis=0))
        t0 = time.perf_counter()
        outs = run_many(qs_s, *arrays)
        np.asarray(outs)
        samples.append(time.perf_counter() - t0)
    return float(np.min(samples)) / ITERS * 1e3


def recall_at10(got_idx, gt_idx):
    got = np.asarray(got_idx)[:, :10]
    gt = np.asarray(gt_idx)[:, :10]
    eq = (got[:, :, None] == gt[:, None, :]) & (gt[:, None, :] >= 0)
    return float(eq.any(axis=1).sum() / gt.size)


def main():
    import jax
    import jax.numpy as jnp

    from velesdb_tpu.index.brute import _deq_sqnorm
    from velesdb_tpu.ops.bucket_kernel import sq8_int8_rows
    from velesdb_tpu.ops.quantization import sq8_quantize

    print("devices:", jax.devices(), flush=True)
    n, d = 1_048_576, 128

    @jax.jit
    def gen(s):
        k1, k2, k3, k4, k5 = jax.random.split(jax.random.key(s), 5)
        centers = jax.random.normal(k1, (64, d), jnp.float32) * 2.0
        assign = jax.random.randint(k2, (n,), 0, 64)
        corpus = centers[assign] + jax.random.normal(k3, (n, d)) * 0.7
        qa = jax.random.randint(k4, (1024,), 0, 64)
        qs = centers[qa] + jax.random.normal(k5, (1024, d)) * 0.7
        return corpus, qs

    c, qdev = gen(1)
    c = jax.block_until_ready(c)
    queries = np.asarray(qdev)
    sq = sq8_quantize(c)
    rows8 = jax.block_until_ready(sq8_int8_rows(sq.codes))  # code - 128
    pen8 = jax.block_until_ready(_deq_sqnorm(sq.codes, sq.scale, sq.minv))
    codes_b = jax.block_until_ready(sq.codes.astype(jnp.bfloat16))
    # affine for shifted rows: deq = scale*(c8 + 128) + minv
    #                              = scale*c8 + (minv + 128*scale)
    am = jax.block_until_ready(sq.minv + 128.0 * sq.scale)

    def mono_bf16_rr(q, cb_a, sc_a, mn_a, p_a, c_a):
        qb = q.astype(jnp.bfloat16)
        cd = jax.lax.dot_general(qb, cb_a, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dots = cd * sc_a[None, :] + (
            jnp.sum(q, axis=1, keepdims=True) * mn_a[None, :])
        s = 2.0 * dots - p_a[None, :]
        _, cand = jax.lax.approx_max_k(s, 16)
        rows = jnp.take(c_a, cand, axis=0)
        ex = 2.0 * jnp.einsum("bd,bmd->bm", q, rows,
                              precision=jax.lax.Precision.HIGHEST,
                              ) - jnp.sum(rows * rows, axis=2)
        v, pos = jax.lax.top_k(ex, 10)
        return -v, jnp.take_along_axis(cand, pos, axis=1)

    def _qi8_scores(q, r8_a, sc_a, am_a, p_a):
        # symmetric per-query int8: q ~ qs * qi, qi in [-127, 127]
        qmax = jnp.max(jnp.abs(q), axis=1, keepdims=True)
        qs_ = jnp.maximum(qmax, 1e-30) / 127.0
        qi = jnp.clip(jnp.round(q / qs_), -127, 127).astype(jnp.int8)
        doti = jax.lax.dot_general(qi, r8_a, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.int32)
        sqi = jnp.sum(qi.astype(jnp.float32), axis=1, keepdims=True)
        # q.deq(c) ~ qs * (scale*(qi.c8) + sum(qi)*am)
        dots = qs_ * (doti.astype(jnp.float32) * sc_a[None, :]
                      + sqi * am_a[None, :])
        return 2.0 * dots - p_a[None, :]

    def mono_qi8(q, r8_a, sc_a, am_a, p_a):
        return jax.lax.approx_max_k(_qi8_scores(q, r8_a, sc_a, am_a, p_a), 10)

    def mono_qi8_rr(q, r8_a, sc_a, am_a, p_a, c_a):
        s = _qi8_scores(q, r8_a, sc_a, am_a, p_a)
        _, cand = jax.lax.approx_max_k(s, 16)
        rows = jnp.take(c_a, cand, axis=0)
        ex = 2.0 * jnp.einsum("bd,bmd->bm", q, rows,
                              precision=jax.lax.Precision.HIGHEST,
                              ) - jnp.sum(rows * rows, axis=2)
        v, pos = jax.lax.top_k(ex, 10)
        return -v, jnp.take_along_axis(cand, pos, axis=1)

    qh = np.asarray(queries[:256], np.float64)
    ch = np.asarray(c, np.float64)
    s = 2.0 * (qh @ ch.T) - (ch * ch).sum(1)[None, :]
    gt = np.argsort(-s, axis=1)[:, :10]
    del s, ch

    print(f"== {n}x{d} L2 ==", flush=True)
    for label, fn, arrays in (
        ("mono-bf16-rr", mono_bf16_rr, (codes_b, sq.scale, sq.minv, pen8, c)),
        ("mono-qi8    ", mono_qi8, (rows8[:, :d], sq.scale, am, pen8)),
        ("mono-qi8-rr ", mono_qi8_rr, (rows8[:, :d], sq.scale, am, pen8, c)),
    ):
        ms256 = scan_time_ms(fn, arrays, queries, 256, d)
        ms16 = scan_time_ms(fn, arrays, queries, 16, d)
        _, got = fn(jnp.asarray(queries[:256]), *arrays)
        r = recall_at10(got, gt)
        print(f"  {label}: b256 {256/ms256*1e3:9,.0f} QPS  b16 "
              f"{16/ms16*1e3:8,.0f} QPS  host-recall@10 {r:.4f}", flush=True)


if __name__ == "__main__":
    main()
