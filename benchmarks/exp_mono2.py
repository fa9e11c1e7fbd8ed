"""Assist-replacement decision run (r4): shipped sq8i_rerank_topk Pallas
kernel vs monolithic XLA int8-coarse + exact-f32-rerank, ONE run, both
flagship low-D shapes, b=256 and b=16, m in {16, 24, 32}, generic
cluster-sampled queries (not planted dupes), host-f64 oracle recall.

Run: python benchmarks/exp_mono2.py
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


def run(n, d):
    import jax
    import jax.numpy as jnp

    from velesdb_tpu.index.brute import _deq_sqnorm
    from velesdb_tpu.ops import DistanceMetric
    from velesdb_tpu.ops.bucket_kernel import (
        bucket_chunk_for, sq8_int8_rows, sq8i_rerank_topk,
    )
    from velesdb_tpu.ops.quantization import sq8_quantize

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
    rows8 = jax.block_until_ready(sq8_int8_rows(sq.codes))
    pen8 = jax.block_until_ready(_deq_sqnorm(sq.codes, sq.scale, sq.minv))
    codes_b = jax.block_until_ready(sq.codes.astype(jnp.bfloat16))
    chunk_i8 = min(bucket_chunk_for(256, 128, 1), n)

    def make_ship(m):
        def ship(q, r_a, s_a, m_a, p_a, c_a):
            return sq8i_rerank_topk(q, r_a, s_a, m_a, p_a, c_a, k=10, m=m,
                                    metric=DistanceMetric.EUCLIDEAN,
                                    chunk=chunk_i8, interpret=False)
        return ship

    def make_mono(m):
        def mono(q, cb_a, sc_a, mn_a, p_a, c_a):
            qb = q.astype(jnp.bfloat16)
            cd = jax.lax.dot_general(qb, cb_a, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            dots = cd * sc_a[None, :] + (
                jnp.sum(q, axis=1, keepdims=True) * mn_a[None, :])
            s = 2.0 * dots - p_a[None, :]
            _, cand = jax.lax.approx_max_k(s, m)
            rows = jnp.take(c_a, cand, axis=0)
            ex = 2.0 * jnp.einsum(
                "bd,bmd->bm", q, rows,
                precision=jax.lax.Precision.HIGHEST,
            ) - jnp.sum(rows * rows, axis=2)
            v, pos = jax.lax.top_k(ex, 10)
            return -v, jnp.take_along_axis(cand, pos, axis=1)
        return mono

    # host f64 oracle on 256 generic queries
    qh = np.asarray(queries[:256], np.float64)
    ch = np.asarray(c, np.float64)
    s = 2.0 * (qh @ ch.T) - (ch * ch).sum(1)[None, :]
    gt = np.argsort(-s, axis=1)[:, :10]
    del s, ch

    print(f"== {n//1000}Kx{d} L2 ==", flush=True)
    rows_out = []
    for label, fn, arrays in (
        ("ship-m16", make_ship(16), (rows8, sq.scale, sq.minv, pen8, c)),
        ("mono-m16", make_mono(16), (codes_b, sq.scale, sq.minv, pen8, c)),
        ("mono-m24", make_mono(24), (codes_b, sq.scale, sq.minv, pen8, c)),
        ("mono-m32", make_mono(32), (codes_b, sq.scale, sq.minv, pen8, c)),
    ):
        ms256 = scan_time_ms(fn, arrays, queries, 256, d)
        ms16 = scan_time_ms(fn, arrays, queries, 16, d)
        _, got = fn(jnp.asarray(queries[:256]), *arrays)
        r = recall_at10(got, gt)
        print(f"  {label}: b256 {256/ms256*1e3:9,.0f} QPS  b16 "
              f"{16/ms16*1e3:8,.0f} QPS  host-recall@10 {r:.4f}", flush=True)
        rows_out.append((label, 256 / ms256 * 1e3, 16 / ms16 * 1e3, r))
    return rows_out


def main():
    import jax

    print("devices:", jax.devices(), flush=True)
    run(1_048_576, 128)
    run(212_992, 128)


if __name__ == "__main__":
    main()
