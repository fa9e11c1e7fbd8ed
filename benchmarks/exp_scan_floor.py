"""Where does the streamed-scan time actually go? (r4)

The pad A/B (exp_pad_ab.py) showed throughput is nearly ROW-COUNT
INSENSITIVE: scanning 23% fewer corpus rows bought only 5% QPS at
100Kx768 and 2% at 200Kx128. So the scan is not HBM-row-bound at these
configs — something per-structure dominates. This experiment peels the
layers at both flagship shapes:

  mono-max      one monolithic dot_general + jnp.max           (matmul floor)
  mono-amk      monolithic matmul + approx_max_k on [B, N]     (one-pass sel)
  mono-topk     monolithic matmul + lax.top_k on [B, N]        (exact sel)
  scan-max      current chunked lax.scan, jnp.max per chunk    (scan floor)
  scan-amk      current streamed_topk structure                (shipped)
  scan-amkXL    chunk x4 (fewer steps)                         (step overhead?)

Run: python benchmarks/exp_scan_floor.py   (knobs FLOOR_N, FLOOR_D, FLOOR_B)
"""

import functools
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
    """ms per batch, scan protocol (64 unique batches, min of samples)."""
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


def run(n, d, batch):
    import jax
    import jax.numpy as jnp

    from velesdb_tpu.index.brute import pad_rows
    from velesdb_tpu.ops import DistanceMetric
    from velesdb_tpu.ops.streamed import _pick_chunk, _streamed_entry

    n_pad = pad_rows(n)

    @jax.jit
    def gen(seed):
        k1, k2, k3 = jax.random.split(jax.random.key(seed), 3)
        centers = jax.random.normal(k1, (64, d), jnp.float32) * 2.0
        assign = jax.random.randint(k2, (n_pad,), 0, 64)
        return centers[assign] + jax.random.normal(k3, (n_pad, d)) * 0.7

    c = jax.block_until_ready(gen(0))
    sqn = jnp.sum(c * c, axis=1)
    valid = jnp.ones(n_pad, bool)
    queries = np.asarray(c[:512]) if n_pad >= 512 else np.asarray(c)
    gb = n_pad * d * 4 / 1e9

    chunk = _pick_chunk(n_pad, 65536) or min(65536, n_pad)
    chunk_xl = _pick_chunk(n_pad, 262144) or chunk

    def mono_max(q, c_a):
        s = jax.lax.dot_general(q, c_a, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return jnp.max(s, axis=1)

    def mono_amk(q, c_a):
        s = jax.lax.dot_general(q, c_a, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return jax.lax.approx_max_k(s, 10)

    def mono_topk(q, c_a):
        s = jax.lax.dot_general(q, c_a, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return jax.lax.top_k(s, 10)

    def scan_max(q, c_a, _chunk=chunk):
        cc = c_a.reshape(n_pad // _chunk, _chunk, d)

        def body(carry, vecs):
            s = jax.lax.dot_general(q, vecs, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            return jnp.maximum(carry, jnp.max(s, axis=1)), None

        out, _ = jax.lax.scan(body, jnp.full((q.shape[0],), -jnp.inf), cc)
        return out

    def scan_amk(q, c_a, v_a, s_a, _chunk=chunk):
        return _streamed_entry(q, c_a, v_a, s_a, k=10,
                               metric=DistanceMetric.DOT_PRODUCT,
                               chunk=_chunk, approx=True, recall_target=0.95)

    def scan_amk_xl(q, c_a, v_a, s_a, _chunk=chunk_xl):
        return _streamed_entry(q, c_a, v_a, s_a, k=10,
                               metric=DistanceMetric.DOT_PRODUCT,
                               chunk=_chunk, approx=True, recall_target=0.95)

    print(f"== {n_pad}x{d} b={batch} ({gb:.2f}GB corpus, chunk={chunk}, "
          f"xl={chunk_xl}) ==", flush=True)
    for label, fn, arrays in (
        ("mono-max ", mono_max, (c,)),
        ("mono-amk ", mono_amk, (c,)),
        ("mono-topk", mono_topk, (c,)),
        ("scan-max ", scan_max, (c,)),
        ("scan-amk ", scan_amk, (c, valid, sqn)),
        ("scan-amkXL", scan_amk_xl, (c, valid, sqn)),
    ):
        try:
            ms = scan_time_ms(fn, arrays, queries, batch, d)
            eff = gb / (ms / 1e3)
            print(f"  {label}: {ms:7.3f} ms/batch  {batch/ms*1e3:9,.0f} QPS  "
                  f"{eff:6.0f} GB/s effective", flush=True)
        except Exception as e:
            print(f"  {label}: FAILED {type(e).__name__}: {e}", flush=True)


def main():
    import jax

    print("devices:", jax.devices(), flush=True)
    n = int(os.environ.get("FLOOR_N", 0))
    if n:
        run(n, int(os.environ.get("FLOOR_D", 128)),
            int(os.environ.get("FLOOR_B", 256)))
        return
    run(100_000, 768, 256)
    run(1_000_000, 128, 256)


if __name__ == "__main__":
    main()
