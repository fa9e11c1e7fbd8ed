"""Experiment: bf16-corpus STREAMED scan at high D — is the f32 headline
MXU-bound?

At 100Kx768D cosine the f32 streamed scan measures ~338K QPS = ~0.76ms per
256-batch, which is almost exactly the v5e f32-via-MXU roofline for the
39.3 GFLOP batch matmul (f32 matmuls decompose into bf16 passes at ~1/4-1/6
peak). A bf16 corpus runs the same matmul at the native bf16 MXU rate
(~4x) AND halves HBM corpus bytes — both limits move ~2-4x. Round-1 only
ruled bf16 out inside MOSAIC kernels; the streamed path is pure XLA where
bf16 dot_general is native.

Measures (64-unique-batch scan protocol, min of >=3 samples):
  f32 streamed vs bf16 streamed at 100Kx768D cosine + recall@10 vs the
  f32 exact oracle; optionally 1Mx768D (CURVE-style capacity config).

MEASURED (v5e, 2026-08-17): the hypothesis is WRONG in an interesting way —
f32 streamed runs at the HBM ROOFLINE already (1Mx768: 3.34ms/batch =
~900GB/s effective), and the bf16 scan lowers at only ~480GB/s effective
(same wall time at half the bytes; bf16-preferred accumulate identical).
At 100Kx768 both are ~0.75ms/batch (selection + per-batch floor dominates,
bandwidth is 0.37ms of it). Conclusion: bf16 (like SQ8) is a CAPACITY mode
(2x rows/chip at par speed, recall 0.9984 vs f32 oracle), not a speed mode
— the exact engine has no 2x left on one chip.

Run: python benchmarks/exp_bf16_stream.py   (knobs: EXP_N, EXP_D)
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
    ).astype(np.float32)
    queries = centers[rng.integers(0, 64, B)] + rng.standard_normal(
        (B, D)
    ).astype(np.float32)

    n_pad = ((N + 65535) // 65536) * 65536
    chunk = 65536
    corpus_p = np.pad(corpus, ((0, n_pad - N), (0, 0)))
    # serve-path state: cosine corpus stored PRE-NORMALIZED
    cf = jnp.asarray(corpus_p)
    sq = jnp.sum(cf * cf, axis=1, keepdims=True)
    cf = cf * jnp.where(sq > 1e-30, jax.lax.rsqrt(jnp.maximum(sq, 1e-30)), 0.0)
    cnorm = jnp.sum(cf * cf, axis=1)
    valid = jnp.arange(n_pad) < N
    cb = cf.astype(jnp.bfloat16)

    qd = jnp.asarray(queries)
    oracle = np.asarray(
        _streamed_entry(
            qd, cf, valid, cnorm, k=K, metric=DistanceMetric.COSINE,
            chunk=chunk, approx=False, recall_target=0.95,
        )[1]
    )

    def recall(idx):
        hits = sum(
            len(set(idx[i].tolist()) & set(oracle[i].tolist()))
            for i in range(B)
        )
        return hits / (B * K)

    big = np.resize(queries, (ITERS * B, D))
    big = big + rng.standard_normal(big.shape).astype(np.float32) * 0.01
    qs = jnp.asarray(big.reshape(ITERS, B, D))

    for label, corp in (("f32", cf), ("bf16", cb)):
        v, idx = _streamed_entry(
            qd, corp, valid, cnorm, k=K, metric=DistanceMetric.COSINE,
            chunk=chunk, approx=True, recall_target=0.95,
        )
        r = recall(np.asarray(idx))

        @jax.jit
        def run_many(qs, corp, valid, cnorm):
            def body(_, q):
                v, i = _streamed_entry(
                    q, corp, valid, cnorm, k=K, metric=DistanceMetric.COSINE,
                    chunk=chunk, approx=True, recall_target=0.95,
                )
                return None, (v[0, 0], i[0, 0])

            _, outs = jax.lax.scan(body, None, qs)
            return outs

        jax.block_until_ready(run_many(qs, corp, valid, cnorm))
        samples = []
        for s in range(SAMPLES):
            qs_s = jax.block_until_ready(jnp.roll(qs, 1 + 7 * s, axis=0))
            t0 = time.perf_counter()
            outs = run_many(qs_s, corp, valid, cnorm)
            np.asarray(outs[0])
            samples.append(time.perf_counter() - t0)
        qps = ITERS * B / float(np.min(samples))
        ms = float(np.min(samples)) / ITERS * 1e3
        print(
            f"[bf16exp] {label:5s} N={N:,} D={D}: {qps:,.0f} QPS "
            f"({ms:.3f} ms/batch) recall@10={r:.4f} "
            f"samples={[f'{t:.3f}' for t in samples]}",
            flush=True,
        )


if __name__ == "__main__":
    main()


def bf16_pref_variant():
    """bf16 corpus with bf16-preferred dot output: does the half-byte scan
    reach the roofline when the MXU pass is pure bf16?"""
    import functools

    import jax
    import jax.numpy as jnp

    from velesdb_tpu.ops import DistanceMetric
    from velesdb_tpu.ops.streamed import _streamed_entry

    rng = np.random.default_rng(42)
    centers = rng.standard_normal((64, D)).astype(np.float32) * 2.0
    corpus = centers[rng.integers(0, 64, N)] + rng.standard_normal(
        (N, D)
    ).astype(np.float32)
    queries = centers[rng.integers(0, 64, B)] + rng.standard_normal(
        (B, D)
    ).astype(np.float32)
    chunk = 65536
    n_pad = ((N + chunk - 1) // chunk) * chunk
    cf = jnp.asarray(np.pad(corpus, ((0, n_pad - N), (0, 0))))
    sq = jnp.sum(cf * cf, axis=1, keepdims=True)
    cf = cf * jnp.where(sq > 1e-30, jax.lax.rsqrt(jnp.maximum(sq, 1e-30)), 0.0)
    cb = cf.astype(jnp.bfloat16)
    valid = jnp.arange(n_pad) < N

    @functools.partial(jax.jit, static_argnames=("k",))
    def run(qs, corp, valid, k=10):
        def scan_q(_, q):
            qn = q / jnp.maximum(
                jnp.linalg.norm(q, axis=1, keepdims=True), 1e-30
            )
            qb = qn.astype(jnp.bfloat16)
            nc = corp.shape[0] // chunk
            cc = corp.reshape(nc, chunk, D)
            vv = valid.reshape(nc, chunk)

            def body(carry, inp):
                rv, ri = carry
                ci, vecs, ok = inp
                dots = jax.lax.dot_general(
                    qb, vecs, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.bfloat16,  # pure bf16 pass
                ).astype(jnp.float32)
                s = jnp.where(ok[None, :], dots, -jnp.inf)
                v, i = jax.lax.approx_max_k(s, k)
                gi = i + ci * chunk
                mv, pos = jax.lax.top_k(
                    jnp.concatenate([rv, v], axis=1), k
                )
                mi = jnp.take_along_axis(
                    jnp.concatenate([ri, gi], axis=1), pos, axis=1
                )
                return (mv, mi), None

            init = (
                jnp.full((B, k), -jnp.inf, jnp.float32),
                jnp.full((B, k), -1, jnp.int32),
            )
            (v, i), _ = jax.lax.scan(
                body, init, (jnp.arange(nc, dtype=jnp.int32), cc, vv)
            )
            return None, (v[0, 0], i[0, 0])

        _, outs = jax.lax.scan(scan_q, None, qs)
        return outs

    big = np.resize(queries, (ITERS * B, D))
    big = big + rng.standard_normal(big.shape).astype(np.float32) * 0.01
    qs = jnp.asarray(big.reshape(ITERS, B, D))
    jax.block_until_ready(run(qs, cb, valid))
    samples = []
    for s in range(SAMPLES):
        qs_s = jax.block_until_ready(jnp.roll(qs, 1 + 7 * s, axis=0))
        t0 = time.perf_counter()
        outs = run(qs_s, cb, valid)
        np.asarray(outs[0])
        samples.append(time.perf_counter() - t0)
    qps = ITERS * B / float(np.min(samples))
    ms = float(np.min(samples)) / ITERS * 1e3
    print(f"[bf16exp] bf16-pref N={N:,}: {qps:,.0f} QPS ({ms:.3f} ms/batch)",
          flush=True)

