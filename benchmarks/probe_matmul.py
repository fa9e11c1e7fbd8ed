"""Probe raw MXU matmul throughput at the search shapes on the live chip.

Hypothesis: every top-k variant converges at ~2.3ms because the f32 matmul
itself runs multi-pass on the MXU (and bf16 inputs with preferred f32 get
upcast). Measures a scan of pure dot_generals over the corpus with a
1-column readback to defeat DCE.
"""

import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/velesdb_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import jax
import jax.numpy as jnp
import numpy as np

N, D, B, CHUNK = 1 << 20, 128, 256, 65536
ITERS = 16


def make(dtype, prec, pref):
    @jax.jit
    def fn(q, corpus):
        nc = corpus.shape[0] // CHUNK
        cc = corpus.reshape(nc, CHUNK, D)
        qq = q.astype(dtype)

        def body(acc, vecs):
            dots = jax.lax.dot_general(
                qq, vecs, (((1,), (1,)), ((), ())),
                precision=prec, preferred_element_type=pref,
            )
            return acc + dots[:, 0].astype(jnp.float32), None

        acc, _ = jax.lax.scan(body, jnp.zeros(q.shape[0], jnp.float32), cc)
        return acc

    return fn


def main():
    key = jax.random.key(0)
    corpus32 = jax.random.normal(key, (N, D), jnp.float32)
    corpus16 = corpus32.astype(jnp.bfloat16)
    jax.block_until_ready((corpus32, corpus16))
    P = jax.lax.Precision
    cases = {
        "f32_default": (jnp.float32, P.DEFAULT, jnp.float32, corpus32),
        "f32_highest": (jnp.float32, P.HIGHEST, jnp.float32, corpus32),
        "bf16_pref_f32": (jnp.bfloat16, P.DEFAULT, jnp.float32, corpus16),
        "bf16_pref_bf16": (jnp.bfloat16, P.DEFAULT, jnp.bfloat16, corpus16),
    }
    for name, (dt, prec, pref, corp) in cases.items():
        fn = make(dt, prec, pref)
        try:
            samples = []
            for s in range(3):
                q = jax.block_until_ready(
                    jax.random.normal(jax.random.key(100 + s), (ITERS * B, D))
                )

                @jax.jit
                def many(qs, corp):
                    def body(_, qb):
                        return None, fn(qb, corp)[0]

                    _, outs = jax.lax.scan(
                        body, None, qs.reshape(ITERS, B, D)
                    )
                    return outs

                t0 = time.perf_counter()
                outs = many(q, corp)
                np.asarray(outs)
                samples.append((time.perf_counter() - t0) / ITERS)
            ms = min(samples) * 1e3
            tflops = 2 * B * N * D / (ms / 1e3) / 1e12
            print(f"{name}: {ms:.3f} ms/batch  ({tflops:.0f} TFLOP/s)")
        except Exception as e:
            print(f"{name}: FAILED {e}")


if __name__ == "__main__":
    main()
