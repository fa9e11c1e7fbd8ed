"""Isolate the slow stage of SQ8-IVF probing at capacity (5M x 768D showed
3 QPS at b=16 where HBM math says ~400+).

Builds a SMALL quantized-partition layout (so build time is negligible) with
the SAME per-probe shapes as the capacity config (L=736, D=768), then times
each stage separately on device:

  A. probe-loop gather only   (pcodes[pid] per scan step, u8)
  B. gather + bf16 cast
  C. gather + cast + einsum   (the full scoring step)
  D. full ivf_search_impl
  E. same gather but f32 payload (is u8 the problem?)

Run: python benchmarks/exp_ivf_gather.py
"""

import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/velesdb_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

P = 2048       # partitions resident (860MB u8) — gather target
L = 736        # capacity partition length
D = 768
B = 16
NPROBE = 236   # capacity probe count


def timeit(fn, probe, *args, reps=3):
    """Unique probe ids per rep + forced readback (identical-input
    re-dispatches return early under the tunnel; see CLAUDE.md)."""
    import jax
    import jax.numpy as jnp

    np.asarray(fn(probe, *args))  # compile + warm
    ts = []
    for r in range(reps):
        p = jax.block_until_ready((probe + (r + 1) * 7) % P)
        t0 = time.perf_counter()
        out = fn(p, *args)
        np.asarray(out)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    pcodes = jnp.asarray(rng.integers(0, 255, (P, L, D), dtype=np.uint8))
    pf32 = pcodes.astype(jnp.float32)  # 6.2GB? no: 2048*736*768*4 = 4.6GB
    pscale = jnp.asarray(rng.random((P, L), dtype=np.float32))
    pminv = jnp.asarray(rng.random((P, L), dtype=np.float32))
    probe = jnp.asarray(rng.integers(0, P, (B, NPROBE), dtype=np.int32))
    q = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
    qb = q.astype(jnp.bfloat16)

    @jax.jit
    def gather_only(probe, pcodes):
        def body(acc, p):
            pid = probe[:, p]
            blk = pcodes[pid]  # [B, L, D] u8
            return acc + jnp.sum(blk.astype(jnp.int32)), None

        acc, _ = jax.lax.scan(
            body, jnp.int32(0), jnp.arange(NPROBE)
        )
        return acc

    @jax.jit
    def gather_cast(probe, pcodes):
        def body(acc, p):
            pid = probe[:, p]
            blk = pcodes[pid].astype(jnp.bfloat16)
            return acc + jnp.sum(blk.astype(jnp.float32)), None

        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(NPROBE))
        return acc

    @jax.jit
    def gather_score(probe, pcodes, pscale, pminv, qb):
        qsum = jnp.sum(qb.astype(jnp.float32), axis=1, keepdims=True)

        def body(acc, p):
            pid = probe[:, p]
            blk = pcodes[pid].astype(jnp.bfloat16)
            cd = jnp.einsum(
                "bd,bld->bl", qb, blk, preferred_element_type=jnp.float32
            )
            dots = cd * pscale[pid] + qsum * pminv[pid]
            return acc + jnp.sum(dots), None

        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(NPROBE))
        return acc

    @jax.jit
    def gather_f32(probe, pf32):
        def body(acc, p):
            pid = probe[:, p]
            blk = pf32[pid]
            return acc + jnp.sum(blk), None

        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(NPROBE))
        return acc


    @jax.jit
    def gather_rows_flat(probe, pcodes):
        """F: row-granularity gather from the flattened [P*L, D] view —
        B*L indices per step instead of B slice-indices."""
        flat = pcodes.reshape(P * L, D)
        lane = jnp.arange(L, dtype=jnp.int32)

        def body(acc, p):
            pid = probe[:, p]  # [B]
            rid = (pid[:, None] * L + lane[None, :]).reshape(-1)  # [B*L]
            blk = flat[rid]
            return acc + jnp.sum(blk.astype(jnp.int32)), None

        acc, _ = jax.lax.scan(body, jnp.int32(0), jnp.arange(NPROBE))
        return acc

    @jax.jit
    def gather_dynslice(probe, pcodes):
        """H: B unrolled dynamic_slices per step — each is ONE contiguous
        DMA of a [1, L, D] block."""

        def body(acc, p):
            pid = probe[:, p]
            tot = jnp.int32(0)
            blks = [
                jax.lax.dynamic_slice(pcodes, (pid[i], 0, 0), (1, L, D))
                for i in range(B)
            ]
            for blk in blks:
                tot = tot + jnp.sum(blk.astype(jnp.int32))
            return acc + tot, None

        acc, _ = jax.lax.scan(body, jnp.int32(0), jnp.arange(NPROBE))
        return acc

    gb = B * NPROBE * L * D / 2**30
    for name, fn, args in (
        ("A gather-u8 ", gather_only, (probe, pcodes)),
        ("B +bf16 cast", gather_cast, (probe, pcodes)),
        ("C +einsum   ", gather_score, (probe, pcodes, pscale, pminv, qb)),
        ("E gather-f32", gather_f32, (probe, pf32)),
        ("F rows-flat ", gather_rows_flat, (probe, pcodes)),
        ("H dynslice  ", gather_dynslice, (probe, pcodes)),
    ):
        t = timeit(fn, *args)
        print(
            f"[ivfgather] {name}: {t*1e3:8.1f} ms  "
            f"({gb / t:6.1f} GB/s u8-bytes)",
            flush=True,
        )

    from velesdb_tpu.index.ivf import ivf_search_impl
    from velesdb_tpu.ops import DistanceMetric

    cents = jnp.asarray(rng.standard_normal((P, D)).astype(np.float32))
    csq = jnp.sum(cents * cents, axis=1)
    prow = jnp.asarray(
        rng.integers(0, P * L, (P, L), dtype=np.int32)
    )
    psq = jnp.asarray(rng.random((P, L), dtype=np.float32) * 100)
    jivf = functools.partial(
        jax.jit, static_argnames=("k", "nprobe", "metric")
    )(ivf_search_impl)

    def full(probe_unused, q):
        return jivf(
            q, cents, csq, (pcodes, pscale, pminv), prow, psq, None,
            k=10, nprobe=NPROBE, metric=DistanceMetric.EUCLIDEAN,
        )[0]

    # unique queries per rep via the probe-perturbation slot
    import jax.numpy as jnp2
    qs = [q + np.float32(1e-3 * r) for r in range(4)]
    import jax as _jax
    np.asarray(full(None, qs[0]))
    ts = []
    for r in range(1, 4):
        qq = _jax.block_until_ready(jnp2.asarray(qs[r]))
        t0 = time.perf_counter()
        np.asarray(full(None, qq))
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    print(f"[ivfgather] D full search: {t*1e3:8.1f} ms ({gb / t:6.1f} GB/s)",
          flush=True)


if __name__ == "__main__":
    main()
