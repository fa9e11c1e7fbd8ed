"""Experiment: streamed-scan selection overhead at the 768D headline.

exp_bf16_stream measured the 100Kx768 f32 streamed scan at ~0.75ms/batch
with only ~0.37ms of it HBM bandwidth — the rest is per-chunk selection
(approx_max_k + 2k merge per 65536-row chunk; 2 chunks at 100K) and scan
overhead. Sweep the chunk size (one chunk = single selection, no merge)
and the PartialReduce recall_target (fewer per-chunk candidates) to see
how much of the non-bandwidth half is recoverable.

Run: python benchmarks/exp_stream_chunk.py  (knobs: EXP_N, EXP_D)
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/velesdb_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N = int(os.environ.get("EXP_N", 100_000))
D = int(os.environ.get("EXP_D", 768))
B = 256
K = 10
ITERS = 64
SAMPLES = 3


def main():
    import jax
    import jax.numpy as jnp

    from velesdb_tpu.ops import DistanceMetric
    from velesdb_tpu.ops.streamed import _streamed_entry

    rng = np.random.default_rng(42)
    centers = rng.standard_normal((64, D)).astype(np.float32) * 2.0
    corpus = centers[rng.integers(0, 64, N)] + rng.standard_normal(
        (N, D)
    ).astype(np.float32) * 0.7
    queries = centers[rng.integers(0, 64, B)] + rng.standard_normal(
        (B, D)
    ).astype(np.float32) * 0.7

    n_pad = 1 << (N - 1).bit_length()
    cf = jnp.pad(jnp.asarray(corpus), ((0, n_pad - N), (0, 0)))
    sq = jnp.sum(cf * cf, axis=1, keepdims=True)
    cf = cf * jnp.where(sq > 1e-30, jax.lax.rsqrt(jnp.maximum(sq, 1e-30)), 0.0)
    cnorm = jnp.sum(cf * cf, axis=1)
    valid = jnp.arange(n_pad) < N
    qd = jnp.asarray(queries)

    oracle = np.asarray(
        _streamed_entry(
            qd, cf, valid, cnorm, k=K, metric=DistanceMetric.COSINE,
            chunk=min(65536, n_pad), approx=False, recall_target=0.95,
        )[1]
    )

    def recall(idx):
        return sum(
            len(set(idx[i].tolist()) & set(oracle[i].tolist()))
            for i in range(B)
        ) / (B * K)

    big = np.resize(queries, (ITERS * B, D))
    big = big + rng.standard_normal(big.shape).astype(np.float32) * 0.01
    qs = jnp.asarray(big.reshape(ITERS, B, D))

    cases = []
    for chunk in (16384, 32768, 65536, n_pad):
        if n_pad % chunk == 0:
            cases.append((f"chunk={chunk}", chunk, 0.95))
    cases.append((f"chunk={n_pad} rt=0.8", n_pad, 0.8))

    for label, chunk, rt in cases:
        def fn(q, corp, valid, cnorm, _c=chunk, _rt=rt):
            return _streamed_entry(
                q, corp, valid, cnorm, k=K, metric=DistanceMetric.COSINE,
                chunk=_c, approx=True, recall_target=_rt,
            )

        _, idx = fn(qd, cf, valid, cnorm)
        r = recall(np.asarray(idx))

        @jax.jit
        def run_many(qs, corp, valid, cnorm):
            def body(_, q):
                v, i = fn(q, corp, valid, cnorm)
                return None, (v[0, 0], i[0, 0])

            _, outs = jax.lax.scan(body, None, qs)
            return outs

        jax.block_until_ready(run_many(qs, cf, valid, cnorm))
        samples = []
        for s in range(SAMPLES):
            qs_s = jax.block_until_ready(jnp.roll(qs, 1 + 7 * s, axis=0))
            t0 = time.perf_counter()
            outs = run_many(qs_s, cf, valid, cnorm)
            np.asarray(outs[0])
            samples.append(time.perf_counter() - t0)
        qps = ITERS * B / float(np.min(samples))
        ms = float(np.min(samples)) / ITERS * 1e3
        print(
            f"[chunk] {label:22s} N={N:,} D={D}: {qps:,.0f} QPS "
            f"({ms:.3f} ms/batch) recall@10={r:.4f} "
            f"samples={[f'{t:.3f}' for t in samples]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
