"""Monolithic XLA serve candidates vs the shipped engines (r4).

exp_scan_floor.py showed approx_max_k fuses into a monolithic dot_general
at ~zero cost and the lax.scan chunking costs ~10%. This measures SHIPPABLE
monolithic variants with real metric fixups + penalty masks, against the
shipped kernels, same-run:

100Kx768 cosine (headline):
  ship-scan     shipped streamed_topk structure (scan + amk + merge)
  mono          dots + pen, approx_max_k                      (f32 DEFAULT)
  mono-bf16     bf16 corpus (half bytes, single MXU pass)
  mono-rerank   mono coarse m=16 -> f32 gather + HIGHEST rerank (exact-grade)

1Mx128 L2 (SIFT-class):
  ship-assist   sq8i_rerank_topk Pallas kernel (serve default, 0.998 host)
  mono-i8       SQ8 codes bf16-cast matmul + affine + amk     (coarse-grade)
  mono-i8-rr    mono-i8 m=16 -> f32 gather + HIGHEST rerank   (exact-grade)
  mono-f32-hi   f32 HIGHEST + amk (the precision the scan path ships at D<=256)

Each exact-grade variant also reports host-oracle identity recall@10 on one
256-query batch so fidelity claims ride the same run.

Run: python benchmarks/exp_mono.py
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


def gen_clustered(n_pad, d, seed):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def gen(s):
        k1, k2, k3 = jax.random.split(jax.random.key(s), 3)
        centers = jax.random.normal(k1, (64, d), jnp.float32) * 2.0
        assign = jax.random.randint(k2, (n_pad,), 0, 64)
        return centers[assign] + jax.random.normal(k3, (n_pad, d)) * 0.7

    return jax.block_until_ready(gen(seed))


def host_oracle(queries, corpus, metric):
    """True f64 host oracle top-10 ids."""
    q = np.asarray(queries, np.float64)
    c = np.asarray(corpus, np.float64)
    if metric == "cosine":
        q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-30)
        c = c / np.maximum(np.linalg.norm(c, axis=1, keepdims=True), 1e-30)
        s = q @ c.T
    else:
        s = 2.0 * (q @ c.T) - (c * c).sum(1)[None, :]
    return np.argsort(-s, axis=1)[:, :10]


def config_768():
    import jax
    import jax.numpy as jnp

    from velesdb_tpu.ops import DistanceMetric
    from velesdb_tpu.ops.streamed import _pick_chunk, _streamed_entry

    n, d, batch = 106_496, 768, 256
    c = gen_clustered(n, d, 0)
    sq = jnp.sum(c * c, axis=1, keepdims=True)
    cn = c * jax.lax.rsqrt(jnp.maximum(sq, 1e-30))  # pre-normalized
    cn = jax.block_until_ready(cn)
    cnb = jax.block_until_ready(cn.astype(jnp.bfloat16))
    pen = jnp.zeros(n, jnp.float32)  # all valid
    sqn = jnp.sum(cn * cn, axis=1)
    valid = jnp.ones(n, bool)
    queries = np.asarray(cn[:512] * 1.7)
    chunk = _pick_chunk(n, 65536)

    def ship_scan(q, c_a, v_a, s_a):
        return _streamed_entry(q, c_a, v_a, s_a, k=10,
                               metric=DistanceMetric.COSINE, chunk=chunk,
                               approx=True, recall_target=0.95)

    def _normq(q):
        s = jnp.sum(q * q, axis=1, keepdims=True)
        return q * jax.lax.rsqrt(jnp.maximum(s, 1e-30))

    def mono(q, c_a, p_a):
        s = jax.lax.dot_general(_normq(q), c_a, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return jax.lax.approx_max_k(s - p_a[None, :], 10)

    def mono_bf16(q, cb_a, p_a):
        s = jax.lax.dot_general(_normq(q).astype(jnp.bfloat16), cb_a,
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return jax.lax.approx_max_k(s - p_a[None, :], 10)

    def mono_rerank(q, c_a, p_a):
        qn = _normq(q)
        s = jax.lax.dot_general(qn, c_a, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        _, cand = jax.lax.approx_max_k(s - p_a[None, :], 16)
        rows = jnp.take(c_a, cand, axis=0)  # [B, m, D]
        ex = jnp.einsum("bd,bmd->bm", qn, rows,
                        precision=jax.lax.Precision.HIGHEST)
        v, pos = jax.lax.top_k(ex, 10)
        return v, jnp.take_along_axis(cand, pos, axis=1)

    gt = host_oracle(queries[:256], np.asarray(cn), "cosine")
    print(f"== 100Kx768 cosine b={batch} (n_pad={n}) ==", flush=True)
    for label, fn, arrays in (
        ("ship-scan  ", ship_scan, (cn, valid, sqn)),
        ("mono       ", mono, (cn, pen)),
        ("mono-bf16  ", mono_bf16, (cnb, pen)),
        ("mono-rerank", mono_rerank, (cn, pen)),
    ):
        ms = scan_time_ms(fn, arrays, queries, batch, d)
        _, got = fn(jnp.asarray(queries[:256]), *arrays)
        r = recall_at10(got, gt)
        print(f"  {label}: {ms:7.3f} ms/batch {batch/ms*1e3:9,.0f} QPS  "
              f"host-recall@10 {r:.4f}", flush=True)


def config_1m():
    import jax
    import jax.numpy as jnp

    from velesdb_tpu.index.brute import _deq_sqnorm
    from velesdb_tpu.ops import DistanceMetric
    from velesdb_tpu.ops.bucket_kernel import (
        bucket_chunk_for, sq8_int8_rows, sq8i_rerank_topk,
    )
    from velesdb_tpu.ops.quantization import sq8_quantize

    n, d, batch = 1_048_576, 128, 256
    c = gen_clustered(n, d, 1)
    sq = sq8_quantize(c)
    rows8 = jax.block_until_ready(sq8_int8_rows(sq.codes))
    deq_sq = _deq_sqnorm(sq.codes, sq.scale, sq.minv)
    pen8 = jax.block_until_ready(deq_sq)  # all valid: pen = |c|^2
    codes_b = jax.block_until_ready(sq.codes.astype(jnp.bfloat16))
    queries = np.asarray(c[:512] * 1.01)
    chunk_i8 = min(bucket_chunk_for(256, 128, 1), n)

    def ship_assist(q, r_a, s_a, m_a, p_a, c_a):
        return sq8i_rerank_topk(q, r_a, s_a, m_a, p_a, c_a, k=10, m=16,
                                metric=DistanceMetric.EUCLIDEAN,
                                chunk=chunk_i8, interpret=False)

    def _coarse(q, cb_a, sc_a, mn_a, p_a):
        qb = q.astype(jnp.bfloat16)
        cd = jax.lax.dot_general(qb, cb_a, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dots = cd * sc_a[None, :] + jnp.sum(q, axis=1, keepdims=True) * mn_a[None, :]
        return 2.0 * dots - p_a[None, :]  # maximize 2qc - |c|^2

    def mono_i8(q, cb_a, sc_a, mn_a, p_a):
        return jax.lax.approx_max_k(_coarse(q, cb_a, sc_a, mn_a, p_a), 10)

    def mono_i8_rr(q, cb_a, sc_a, mn_a, p_a, c_a):
        s = _coarse(q, cb_a, sc_a, mn_a, p_a)
        _, cand = jax.lax.approx_max_k(s, 16)
        rows = jnp.take(c_a, cand, axis=0)
        dots = jnp.einsum("bd,bmd->bm", q, rows,
                          precision=jax.lax.Precision.HIGHEST)
        nrm = jnp.sum(rows * rows, axis=2)
        ex = 2.0 * dots - nrm
        v, pos = jax.lax.top_k(ex, 10)
        return v, jnp.take_along_axis(cand, pos, axis=1)

    def mono_f32_hi(q, c_a, nrm_a):
        s = jax.lax.dot_general(q, c_a, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.HIGHEST)
        return jax.lax.approx_max_k(2.0 * s - nrm_a[None, :], 10)

    nrm = jnp.sum(c * c, axis=1)
    gt = host_oracle(queries[:256], np.asarray(c), "l2")
    print(f"== 1Mx128 L2 b={batch} ==", flush=True)
    for label, fn, arrays in (
        ("ship-assist", ship_assist, (rows8, sq.scale, sq.minv, pen8, c)),
        ("mono-i8    ", mono_i8, (codes_b, sq.scale, sq.minv, pen8)),
        ("mono-i8-rr ", mono_i8_rr, (codes_b, sq.scale, sq.minv, pen8, c)),
        ("mono-f32-hi", mono_f32_hi, (c, nrm)),
    ):
        ms = scan_time_ms(fn, arrays, queries, batch, d)
        _, got = fn(jnp.asarray(queries[:256]), *arrays)
        r = recall_at10(got, gt)
        print(f"  {label}: {ms:7.3f} ms/batch {batch/ms*1e3:9,.0f} QPS  "
              f"host-recall@10 {r:.4f}", flush=True)


def main():
    import jax

    print("devices:", jax.devices(), flush=True)
    config_768()
    config_1m()


if __name__ == "__main__":
    main()
