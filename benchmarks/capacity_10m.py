"""Single-chip capacity benchmark: 10M x 768D in SQ8 on one v5e (7.7GB HBM).

The reference's headline dataset is 10K x 768D (CPU RAM-bound); one TPU chip
holds 1000x that in SQ8. The corpus is generated AND quantized on device in
chunks inside one jitted loop — a 30GB f32 copy never exists anywhere.

Measures: streamed SQ8 search QPS at batch=256 and 16, and planted
near-duplicate retrieval accuracy (each query is a dequantized stored row
plus noise; top-1 must return the planted row).

Run: python benchmarks/capacity_10m.py    (knobs: CAP_N, CAP_D, CAP_BATCH)
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/velesdb_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N = int(os.environ.get("CAP_N", 10_000_000))
D = int(os.environ.get("CAP_D", 768))
K = 10
CHUNK = 131_072  # generation chunk (f32 transient: 384MB)


def main():
    import functools

    import jax
    import jax.numpy as jnp

    from velesdb_tpu.ops import DistanceMetric
    from velesdb_tpu.ops.quantization import SQ8Vectors
    from velesdb_tpu.ops.streamed import _sq8_streamed_entry

    n_pad = ((N + CHUNK - 1) // CHUNK) * CHUNK
    nc = n_pad // CHUNK

    @functools.partial(jax.jit, static_argnames=("rows", "chunk"))
    def gen_quantized(seed, rows=n_pad, chunk=CHUNK):
        """Generate clustered rows chunk-by-chunk, quantize, store uint8."""
        key = jax.random.key(seed)
        kc, key = jax.random.split(key)
        centers = jax.random.normal(kc, (64, D), jnp.float32) * 2.0

        def body(i, state):
            codes, scale, minv = state
            k1, k2 = jax.random.split(jax.random.fold_in(key, i))
            assign = jax.random.randint(k1, (chunk,), 0, 64)
            x = centers[assign] + jax.random.normal(k2, (chunk, D)) * 0.7
            lo = jnp.min(x, axis=1)
            hi = jnp.max(x, axis=1)
            sc = jnp.maximum((hi - lo) / 255.0, 1e-12)
            cd = jnp.clip(
                jnp.round((x - lo[:, None]) / sc[:, None]), 0, 255
            ).astype(jnp.uint8)
            codes = jax.lax.dynamic_update_slice(codes, cd, (i * chunk, 0))
            scale = jax.lax.dynamic_update_slice(scale, sc, (i * chunk,))
            minv = jax.lax.dynamic_update_slice(minv, lo, (i * chunk,))
            return codes, scale, minv

        init = (
            jnp.zeros((rows, D), jnp.uint8),
            jnp.ones(rows, jnp.float32),
            jnp.zeros(rows, jnp.float32),
        )
        return jax.lax.fori_loop(0, rows // chunk, body, init), centers

    only_ivf = bool(os.environ.get("CAP_ONLY_IVF"))
    rng = np.random.default_rng(7)
    results = {"n": N, "d": D, "mode": "sq8"}
    if not only_ivf:
        t0 = time.time()
        (codes, scale, minv), centers = gen_quantized(0)
        jax.block_until_ready(codes)
        gen_s = time.time() - t0
        print(f"[cap] generated+quantized {N:,} x {D} in {gen_s:.0f}s "
              f"({codes.nbytes/2**30:.1f}GB codes)", file=sys.stderr, flush=True)

        # corpus norms for euclidean scoring (chunked, on device)
        @jax.jit
        def norms(codes, scale, minv):
            def body(_, blk_i):
                cd, sc, mn = blk_i
                deq = cd.astype(jnp.float32) * sc[:, None] + mn[:, None]
                return None, jnp.sum(deq * deq, axis=1)

            _, out = jax.lax.scan(
                body, None,
                (codes.reshape(nc, CHUNK, D), scale.reshape(nc, CHUNK),
                 minv.reshape(nc, CHUNK)),
            )
            return out.reshape(-1)

        cnorm = jax.block_until_ready(norms(codes, scale, minv))
        valid = jnp.arange(n_pad) < N

        # planted queries: dequantized stored rows + small noise
        rng = np.random.default_rng(7)
        plant = rng.integers(0, N, 256)
        plant_dev = jnp.asarray(plant)
        deq_rows = (
            codes[plant_dev].astype(jnp.float32)
            * scale[plant_dev][:, None]
            + minv[plant_dev][:, None]
        )
        queries = deq_rows + 0.05 * jnp.asarray(
            rng.standard_normal((256, D)).astype(np.float32)
        )

        sq = SQ8Vectors(codes, scale, minv)
        t0 = time.time()
        vals, idx = _sq8_streamed_entry(
            queries, codes, scale, minv, cnorm, valid,
            k=K, metric=DistanceMetric.EUCLIDEAN, chunk=65536, approx=True,
        )
        idx = np.asarray(idx)
        acc = float(np.mean(idx[:, 0] == plant))
        print(f"[cap] planted top-1 accuracy {acc:.4f} "
              f"(first search {time.time()-t0:.0f}s incl compile)",
              file=sys.stderr, flush=True)

        results = {"n": N, "d": D, "mode": "sq8", "hbm_gb": round(codes.nbytes / 2**30, 1),
                   "top1_planted": acc, "gen_s": round(gen_s, 1)}
        for batch in (256, 16):
            iters = 16
            qbig = np.resize(np.asarray(queries), (iters * batch, D)).astype(np.float32)
            qbig += rng.standard_normal(qbig.shape).astype(np.float32) * 0.01
            qs = jnp.asarray(qbig.reshape(iters, batch, D))

            @jax.jit
            def run_many(qs, codes, scale, minv, cnorm, valid):
                def body(_, q):
                    v, i = _sq8_streamed_entry(
                        q, codes, scale, minv, cnorm, valid, k=K,
                        metric=DistanceMetric.EUCLIDEAN, chunk=65536, approx=True,
                    )
                    return None, (v[0, 0], i[0, 0])

                _, outs = jax.lax.scan(body, None, qs)
                return outs

            args = (codes, scale, minv, cnorm, valid)
            jax.block_until_ready(run_many(qs, *args))
            samples = []
            for s in range(3):
                qs_s = jax.block_until_ready(jnp.roll(qs, 1 + 5 * s, axis=0))
                t0 = time.perf_counter()
                outs = run_many(qs_s, *args)
                np.asarray(outs[0])
                samples.append(time.perf_counter() - t0)
            results[f"qps_b{batch}"] = round(iters * batch / min(samples))
            print(f"[cap] b={batch}: {results[f'qps_b{batch}']:,} QPS",
                  file=sys.stderr, flush=True)

    # SQ8-storage IVF: the sub-linear engine at capacity (packed-word partitions,
    # pack_factor=1.2 keeps slots ~2.2x rows). The 10M streamed corpus +
    # 5M source slice + partitions exceed 16GB HBM, so this phase frees the
    # streamed state and regenerates a fresh CAP_IVF_N-row corpus (gen is
    # ~2s on device) — source codes + partitions then co-reside fine.
    n_ivf = int(os.environ.get("CAP_IVF_N", min(N, 5_000_000)))
    from velesdb_tpu.index.ivf import IvfIndex, ivf_search_impl

    if not only_ivf:
        del codes, scale, minv, cnorm, valid, sq, deq_rows, queries, qs
        del args, outs
    ivf_chunk = 125_000  # divides 5M: no padding rows to exclude from build
    n_ivf = (n_ivf // ivf_chunk) * ivf_chunk
    (codes, scale, minv), centers = gen_quantized(
        0, rows=n_ivf, chunk=ivf_chunk
    )
    jax.block_until_ready(codes)
    plant = rng.integers(0, n_ivf, 256)
    plant_dev = jnp.asarray(plant)
    deq_rows = (
        codes[plant_dev].astype(jnp.float32)
        * scale[plant_dev][:, None]
        + minv[plant_dev][:, None]
    )
    queries = deq_rows + 0.05 * jnp.asarray(
        rng.standard_normal((256, D)).astype(np.float32)
    )

    # the chip is SHARED: free HBM varies with other tenants, so retry the
    # build down a size ladder (regenerating the smaller corpus each time —
    # generation is seconds; a slice would copy gigabytes) instead of dying
    # on a tenancy spike
    t0 = time.time()
    ivf = None
    for attempt_n in (n_ivf, 4_500_000, 4_000_000):
        attempt_n = (min(attempt_n, n_ivf) // ivf_chunk) * ivf_chunk
        try:
            if codes is None or codes.shape[0] != attempt_n:
                # rebind to None first: frees the device buffers even if
                # the regeneration below itself OOMs
                codes = scale = minv = deq_rows = queries = None
                (codes, scale, minv), centers = gen_quantized(
                    0, rows=attempt_n, chunk=ivf_chunk
                )
                jax.block_until_ready(codes)
                plant = plant[plant < attempt_n]
                plant_dev = jnp.asarray(plant)
                deq_rows = (
                    codes[plant_dev].astype(jnp.float32)
                    * scale[plant_dev][:, None]
                    + minv[plant_dev][:, None]
                )
                queries = deq_rows + 0.05 * jnp.asarray(
                    rng.standard_normal((len(plant), D)).astype(np.float32)
                )
            ivf = IvfIndex(D, DistanceMetric.EUCLIDEAN, pack_factor=1.2)
            ivf.build(SQ8Vectors(codes, scale, minv))
            jax.block_until_ready(ivf._parts)
            n_ivf = attempt_n
            break
        except Exception as e:  # ResourceExhausted: shrink and retry
            print(f"[cap] sq8-ivf build OOM at n={attempt_n:,} ({e!r:.80}); "
                  "retrying smaller", file=sys.stderr, flush=True)
            ivf = None
    if ivf is None:
        raise SystemExit("sq8-ivf build failed at every ladder size")
    nprobe = ivf.nprobe_for(128)
    print(f"[cap] sq8-ivf build {time.time()-t0:.0f}s n={n_ivf:,} "
          f"parts={ivf.c}x{ivf.part_len} "
          f"({ivf._parts.nbytes/2**30:.1f}GB) nprobe={nprobe}",
          file=sys.stderr, flush=True)
    del codes, scale, minv
    _, idx = ivf.search(np.asarray(queries), K, nprobe=nprobe)
    acc_ivf = float(np.mean(np.asarray(idx)[:, 0] == plant))
    results["ivf_n"] = n_ivf
    results["ivf_nprobe"] = nprobe
    results["ivf_top1_planted"] = acc_ivf
    print(f"[cap] sq8-ivf planted top-1 {acc_ivf:.4f}",
          file=sys.stderr, flush=True)
    # IVF at capacity is the SMALL-BATCH engine: per-query probe coverage
    # (3.46% of 5M = 133MB/query) exceeds the whole-corpus stream once the
    # batch shares the scan (b=256 would gather 34GB/batch vs 3.6GB corpus).
    # The serve path routes b<=64 through the Pallas probe kernel
    # (partition reads as pipelined DMAs — ops/ivf_kernel.py); this times
    # that path, scan-amortized. Small iter counts: one b=16 batch still
    # reads ~2GB, and a long scan would trip the device watchdog.
    from velesdb_tpu.ops.ivf_kernel import ivf_probe_topk

    aux, flat_rows = ivf._kernel_state()
    for batch in (16, 4, 1):
        iters = 4 if batch > 1 else 8
        qbig = np.resize(np.asarray(queries), (iters * batch, D)).astype(
            np.float32
        )
        qbig += rng.standard_normal(qbig.shape).astype(np.float32) * 0.01
        qs = jnp.asarray(qbig.reshape(iters, batch, D))

        @jax.jit
        def run_ivf(qs, cents, csq, words, aux, flat_rows):
            def body(_, q):
                v, i = ivf_probe_topk(
                    q, cents, csq, words, aux, flat_rows,
                    k=K, nprobe=nprobe, metric=DistanceMetric.EUCLIDEAN,
                )
                return None, (v[0, 0], i[0, 0])

            _, outs = jax.lax.scan(body, None, qs)
            return outs

        args = (ivf._centroids, ivf._cent_sq, ivf._parts, aux, flat_rows)
        jax.block_until_ready(run_ivf(qs, *args))
        samples = []
        for s in range(3):
            qs_s = jax.block_until_ready(jnp.roll(qs, 1 + 5 * s, axis=0))
            t0 = time.perf_counter()
            outs = run_ivf(qs_s, *args)
            np.asarray(outs[0])
            samples.append(time.perf_counter() - t0)
        results[f"ivf_qps_b{batch}"] = round(iters * batch / min(samples))
        print(f"[cap] sq8-ivf b={batch}: {results[f'ivf_qps_b{batch}']:,} QPS",
              file=sys.stderr, flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
