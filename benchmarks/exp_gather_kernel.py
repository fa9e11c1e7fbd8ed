"""Row-gather microbenchmark: XLA slice-gather vs Pallas per-row DMA.

The beam search's hot step gathers ~B*ew*degree scattered corpus rows and
scores them (`index/graph_index.py beam_search_impl`). XLA lowers the
row gather to a batched slice-gather measured at ~2-3GB/s on v5e
(exp_ivf_gather.py) — a fixed ~200us floor per step that now BOUNDS graph
QPS (ew=16 cut the step count; each step is gather-dominated). The same
wall blocks `sq8i_rerank_topk` wiring (r3b: 94K QPS cap).

This experiment measures a Pallas kernel that issues one HBM->VMEM DMA
per row (row ids scalar-prefetched into SMEM), NSEM in flight, then one
MXU matmul against the gathered block — the "in-kernel DMA gather" design
from the round-1 gap list.

MEASURED NEGATIVE on v5e (r3d, 8192 rows x 128D from 1M):
    XLA gather+dot  477us  8.8 GB/s
    per-row DMA     620us  6.8 GB/s   (G=16 in flight)
    double-buffered 530us  7.9 GB/s   (G=16x2)
    double-buffered 507us  8.3 GB/s   (G=64x2)
Scattered 512B reads are TRANSACTION-bound at ~9GB/s whichever engine
issues them — XLA's per-row gather already pipelines to the wall (the
old "2-3GB/s" reading was partition-scale slices, a different shape).
Consequences: (a) no Pallas beam-gather kernel — the win is not there;
(b) SQ8/byte-shrunk gathers do NOT speed the beam (same transaction
count), matching the dual-precision traversal measurement; (c) the only
way past the wall is FEWER, BIGGER reads — e.g. an adjacency-clustered
[N, degree, D] inline-neighbor store (1 DMA per expanded node), whose
32x duplication is incompatible with the graph engine's beyond-HBM
capacity niche. The beam keeps XLA gathers.

Run: python benchmarks/exp_gather_kernel.py [--n 1000000 --d 128 --r 8192]
"""

import argparse
import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/velesdb_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--r", type=int, default=8192, help="rows gathered/step")
    ap.add_argument("--iters", type=int, default=64)
    ap.add_argument("--group", type=int, default=16, help="DMAs in flight")
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N, D, R, G = args.n, args.d, args.r, args.group
    assert R % G == 0
    rng = np.random.default_rng(0)
    corpus = jnp.asarray(rng.standard_normal((N, D)).astype(np.float32))
    q = jnp.asarray(rng.standard_normal((8, D)).astype(np.float32))
    # unique index sets per scan iteration (measurement warning: identical
    # inputs let the tunnel short-circuit timing)
    idx_all = jnp.asarray(
        rng.integers(0, N, size=(args.iters, R), dtype=np.int32)
    )

    bytes_per = R * D * 4

    def timed(fn, *ops):
        run = jax.jit(
            lambda idxs, *o: jax.lax.scan(
                lambda _, ix: (None, fn(ix, *o)[0, 0]), None, idxs
            )[1]
        )
        out = jax.block_until_ready(run(idx_all, *ops))  # compile
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = run(idx_all, *ops)
            np.asarray(out)
            best = min(best, (time.perf_counter() - t0) / args.iters)
        gbs = bytes_per / best / 1e9
        return best * 1e6, gbs

    # -- XLA baseline: corpus[idx] @ q.T ---------------------------------
    def xla_gather(ix, corpus, q):
        rows = corpus[ix]
        return jax.lax.dot_general(
            q, rows, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    us, gbs = timed(xla_gather, corpus, q)
    print(f"XLA gather+dot:    {us:8.1f} us/step  {gbs:6.1f} GB/s")

    # -- Pallas per-row DMA kernel ---------------------------------------
    def kern(idx_ref, q_ref, corpus_ref, out_ref, rows, sems):
        def group_body(g, _):
            base = g * G
            for j in range(G):  # static unroll: G DMAs in flight
                pltpu.make_async_copy(
                    corpus_ref.at[pl.ds(idx_ref[base + j], 1), :],
                    rows.at[pl.ds(base + j, 1), :],
                    sems.at[j],
                ).start()
            for j in range(G):
                pltpu.make_async_copy(
                    corpus_ref.at[pl.ds(idx_ref[base + j], 1), :],
                    rows.at[pl.ds(base + j, 1), :],
                    sems.at[j],
                ).wait()
            return _

        jax.lax.fori_loop(0, R // G, group_body, 0)
        out_ref[:, :] = jax.lax.dot_general(
            q_ref[:, :], rows[:, :], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((8, D), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # corpus stays in HBM
        ],
        out_specs=pl.BlockSpec((8, R), lambda i, *_: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((R, D), jnp.float32),
            pltpu.SemaphoreType.DMA((G,)),
        ],
    )
    call = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((8, R), jnp.float32),
        interpret=args.interpret,
    )

    def pallas_gather(ix, corpus, q):
        return call(ix, q, corpus)

    us, gbs = timed(pallas_gather, corpus, q)
    print(f"Pallas row-DMA:    {us:8.1f} us/step  {gbs:6.1f} GB/s  (G={G})")

    # -- double-buffered: issue group g+1 before waiting group g ---------
    def kern_db(idx_ref, q_ref, corpus_ref, out_ref, rows, sems):
        n_groups = R // G

        def start_group(g):
            base = g * G
            slot = (g % 2) * G
            for j in range(G):
                pltpu.make_async_copy(
                    corpus_ref.at[pl.ds(idx_ref[base + j], 1), :],
                    rows.at[pl.ds(base + j, 1), :],
                    sems.at[slot + j],
                ).start()

        def wait_group(g):
            base = g * G
            slot = (g % 2) * G
            for j in range(G):
                pltpu.make_async_copy(
                    corpus_ref.at[pl.ds(idx_ref[base + j], 1), :],
                    rows.at[pl.ds(base + j, 1), :],
                    sems.at[slot + j],
                ).wait()

        start_group(0)

        def body(g, carry):
            @pl.when(g + 1 < n_groups)
            def _prefetch():
                start_group(g + 1)

            wait_group(g)
            return carry

        jax.lax.fori_loop(0, n_groups, body, 0, unroll=False)
        out_ref[:, :] = jax.lax.dot_general(
            q_ref[:, :], rows[:, :], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    grid_spec_db = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((8, D), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((8, R), lambda i, *_: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((R, D), jnp.float32),
            pltpu.SemaphoreType.DMA((2 * G,)),
        ],
    )
    call_db = pl.pallas_call(
        kern_db,
        grid_spec=grid_spec_db,
        out_shape=jax.ShapeDtypeStruct((8, R), jnp.float32),
        interpret=args.interpret,
    )

    def pallas_gather_db(ix, corpus, q):
        return call_db(ix, q, corpus)

    us, gbs = timed(pallas_gather_db, corpus, q)
    print(f"Pallas row-DMA db: {us:8.1f} us/step  {gbs:6.1f} GB/s  (G={G}x2)")

    # correctness spot check
    ix0 = idx_all[0]
    want = np.asarray(xla_gather(ix0, corpus, q))
    for nm, fn in (("single", pallas_gather), ("db", pallas_gather_db)):
        got = np.asarray(fn(ix0, corpus, q))
        print(f"max |err| vs XLA ({nm}):", np.max(np.abs(want - got)))


if __name__ == "__main__":
    main()
