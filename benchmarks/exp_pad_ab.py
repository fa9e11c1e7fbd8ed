"""Same-run A/B: power-of-two padding vs r4 quantized padding on the
streamed-scan headline (100K x 768D cosine, b=256) and the int8-assist
config (200K x 128D L2). Isolates tunnel weather: both variants timed
back-to-back with the scan protocol (64 unique batches, min of samples).

Run: python benchmarks/exp_pad_ab.py
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/velesdb_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ITERS = 64
SAMPLES = int(os.environ.get("AB_SAMPLES", 3))


def scan_qps(fn, arrays, queries, batch, d):
    import jax
    import jax.numpy as jnp

    big = np.resize(queries, (ITERS * batch, d))
    big = big + np.random.default_rng(9).standard_normal(big.shape).astype(
        np.float32) * 0.01
    qs = jnp.asarray(big.reshape(ITERS, batch, d))

    @jax.jit
    def run_many(qs, *ops):
        def body(_, q):
            v, i = fn(q, *ops)
            return None, (v[0, 0], i[0, 0])

        _, outs = jax.lax.scan(body, None, qs)
        return outs

    jax.block_until_ready(run_many(qs, *arrays))  # compile
    samples = []
    for s in range(SAMPLES):
        qs_s = jax.block_until_ready(jnp.roll(qs, 1 + 7 * s, axis=0))
        t0 = time.perf_counter()
        outs = run_many(qs_s, *arrays)
        np.asarray(outs[0])
        samples.append(time.perf_counter() - t0)
    return ITERS * batch / float(np.min(samples))


def streamed_config(n, d, batch):
    import jax
    import jax.numpy as jnp

    from velesdb_tpu.index.brute import pad_rows
    from velesdb_tpu.ops import DistanceMetric
    from velesdb_tpu.ops.streamed import _pick_chunk, _streamed_entry

    metric = DistanceMetric.COSINE

    @jax.jit
    def gen(seed):
        k1, k2, k3, k4, k5 = jax.random.split(jax.random.key(seed), 5)
        centers = jax.random.normal(k1, (64, d), jnp.float32) * 2.0
        assign = jax.random.randint(k2, (n,), 0, 64)
        corpus = centers[assign] + jax.random.normal(k3, (n, d)) * 0.7
        qa = jax.random.randint(k4, (512,), 0, 64)
        qs = centers[qa] + jax.random.normal(k5, (512, d)) * 0.7
        return corpus, qs

    corpus_dev, queries_dev = gen(0)
    sq = jnp.sum(corpus_dev * corpus_dev, axis=1, keepdims=True)
    norm = corpus_dev * jax.lax.rsqrt(jnp.maximum(sq, 1e-30))
    queries = np.asarray(queries_dev)

    out = {}
    for label, n_pad in (
        ("pow2", 1 << (n - 1).bit_length()),
        ("quant", pad_rows(n)),
    ):
        c = jnp.pad(norm, ((0, n_pad - n), (0, 0)))
        sqn = jnp.sum(c * c, axis=1)
        valid = jnp.arange(n_pad) < n
        chunk = _pick_chunk(n_pad, 65536) or min(65536, n_pad)

        def fn(q, c_a, v_a, s_a, _chunk=chunk):
            return _streamed_entry(
                q, c_a, v_a, s_a, k=10, metric=metric, chunk=_chunk,
                approx=True, recall_target=0.95)

        import jax as _j
        _j.block_until_ready(c)
        qps = scan_qps(fn, (c, valid, sqn), queries, batch, d)
        out[label] = (n_pad, chunk, qps)
        print(f"streamed {n}x{d} {label}: n_pad={n_pad} chunk={chunk} "
              f"qps={qps:,.0f}", flush=True)
        del c, sqn, valid
    return out


def assist_config(n, d, batch):
    import jax
    import jax.numpy as jnp

    from velesdb_tpu.index.brute import _deq_sqnorm, pad_rows
    from velesdb_tpu.ops import DistanceMetric
    from velesdb_tpu.ops.bucket_kernel import (
        bucket_chunk_for, sq8_int8_rows, sq8i_rerank_topk,
    )
    from velesdb_tpu.ops.quantization import sq8_quantize

    metric = DistanceMetric.EUCLIDEAN

    @jax.jit
    def gen(seed):
        k1, k2, k3, k4, k5 = jax.random.split(jax.random.key(seed), 5)
        centers = jax.random.normal(k1, (64, d), jnp.float32) * 2.0
        assign = jax.random.randint(k2, (n,), 0, 64)
        corpus = centers[assign] + jax.random.normal(k3, (n, d)) * 0.7
        qa = jax.random.randint(k4, (512,), 0, 64)
        qs = centers[qa] + jax.random.normal(k5, (512, d)) * 0.7
        return corpus, qs

    corpus_dev, queries_dev = gen(1)
    queries = np.asarray(queries_dev)
    d_pad = ((d + 127) // 128) * 128

    out = {}
    for label, n_pad in (
        ("pow2", 1 << (n - 1).bit_length()),
        ("quant", pad_rows(n)),
    ):
        c = jnp.pad(corpus_dev, ((0, n_pad - n), (0, 0)))
        sq = sq8_quantize(jnp.pad(c, ((0, 0), (0, d_pad - d))))
        rows8 = sq8_int8_rows(sq.codes)
        deq_sq = _deq_sqnorm(sq.codes, sq.scale, sq.minv)
        valid = jnp.arange(n_pad) < n
        pen8 = jnp.where(valid, deq_sq, jnp.inf)
        chunk = min(bucket_chunk_for(256, d_pad, 1), n_pad)

        def fn(q, r_a, s_a, m_a, p_a, c_a, _chunk=chunk):
            return sq8i_rerank_topk(
                q, r_a, s_a, m_a, p_a, c_a, k=10, m=16, metric=metric,
                chunk=_chunk, interpret=False)

        jax.block_until_ready(rows8)
        qps = scan_qps(fn, (rows8, sq.scale, sq.minv, pen8, c), queries,
                       batch, d)
        out[label] = (n_pad, chunk, qps)
        print(f"assist {n}x{d} {label}: n_pad={n_pad} chunk={chunk} "
              f"qps={qps:,.0f}", flush=True)
        del c, sq, rows8, deq_sq, valid, pen8
    return out


def main():
    import jax

    print("devices:", jax.devices(), flush=True)
    s = streamed_config(100_000, 768, 256)
    a = assist_config(200_000, 128, 256)
    for name, r in (("streamed-100Kx768", s), ("assist-200Kx128", a)):
        gain = r["quant"][2] / r["pow2"][2]
        print(f"{name}: pow2 {r['pow2'][2]:,.0f} -> quant {r['quant'][2]:,.0f} "
              f"QPS = {gain:.2f}x", flush=True)


if __name__ == "__main__":
    main()
