"""Final assist-vs-mono decision run (r4): everything in ONE run at
1Mx128 L2 — the shipped Pallas kernel vs native-int8 monolithic XLA
coarse+rerank, sweeping the coarse candidate pool (m) and approx_max_k
recall_target (rt) that exp_mono3 showed caps rerank recall at 0.9887.

Run: python benchmarks/exp_mono4.py
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
    from velesdb_tpu.ops import DistanceMetric
    from velesdb_tpu.ops.bucket_kernel import (
        bucket_chunk_for, sq8_int8_rows, sq8i_rerank_topk,
    )
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
    rows8_pad = jax.block_until_ready(sq8_int8_rows(sq.codes))
    rows8 = rows8_pad[:, :d]
    pen8 = jax.block_until_ready(_deq_sqnorm(sq.codes, sq.scale, sq.minv))
    am = jax.block_until_ready(sq.minv + 128.0 * sq.scale)
    chunk_i8 = min(bucket_chunk_for(256, 128, 1), n)

    def ship(q, r_a, s_a, m_a, p_a, c_a):
        return sq8i_rerank_topk(q, r_a, s_a, m_a, p_a, c_a, k=10, m=16,
                                metric=DistanceMetric.EUCLIDEAN,
                                chunk=chunk_i8, interpret=False)

    def make_qi8_rr(m, rt):
        def fn(q, r8_a, sc_a, am_a, p_a, c_a):
            qmax = jnp.max(jnp.abs(q), axis=1, keepdims=True)
            qs_ = jnp.maximum(qmax, 1e-30) / 127.0
            qi = jnp.clip(jnp.round(q / qs_), -127, 127).astype(jnp.int8)
            doti = jax.lax.dot_general(qi, r8_a, (((1,), (1,)), ((), ())),
                                       preferred_element_type=jnp.int32)
            sqi = jnp.sum(qi.astype(jnp.float32), axis=1, keepdims=True)
            dots = qs_ * (doti.astype(jnp.float32) * sc_a[None, :]
                          + sqi * am_a[None, :])
            s = 2.0 * dots - p_a[None, :]
            _, cand = jax.lax.approx_max_k(s, m, recall_target=rt)
            rows = jnp.take(c_a, cand, axis=0)
            ex = 2.0 * jnp.einsum("bd,bmd->bm", q, rows,
                                  precision=jax.lax.Precision.HIGHEST,
                                  ) - jnp.sum(rows * rows, axis=2)
            v, pos = jax.lax.top_k(ex, 10)
            return -v, jnp.take_along_axis(cand, pos, axis=1)
        return fn

    qh = np.asarray(queries[:256], np.float64)
    ch = np.asarray(c, np.float64)
    s = 2.0 * (qh @ ch.T) - (ch * ch).sum(1)[None, :]
    gt = np.argsort(-s, axis=1)[:, :10]
    del s, ch

    ship_arrays = (rows8_pad, sq.scale, sq.minv, pen8, c)
    mono_arrays = (rows8, sq.scale, am, pen8, c)
    print(f"== {n}x{d} L2, one run ==", flush=True)
    for label, fn, arrays in (
        ("ship-m16      ", ship, ship_arrays),
        ("qi8rr-m16     ", make_qi8_rr(16, 0.95), mono_arrays),
        ("qi8rr-m16-rt99", make_qi8_rr(16, 0.99), mono_arrays),
        ("qi8rr-m32     ", make_qi8_rr(32, 0.95), mono_arrays),
        ("qi8rr-m64     ", make_qi8_rr(64, 0.95), mono_arrays),
        ("qi8rr-m64-rt99", make_qi8_rr(64, 0.99), mono_arrays),
    ):
        ms256 = scan_time_ms(fn, arrays, queries, 256, d)
        ms16 = scan_time_ms(fn, arrays, queries, 16, d)
        _, got = fn(jnp.asarray(queries[:256]), *arrays)
        r = recall_at10(got, gt)
        print(f"  {label}: b256 {256/ms256*1e3:9,.0f} QPS  b16 "
              f"{16/ms16*1e3:8,.0f} QPS  host-recall@10 {r:.4f}", flush=True)


if __name__ == "__main__":
    main()
