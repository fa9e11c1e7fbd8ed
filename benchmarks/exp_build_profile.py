"""Graph-build stage profile: where does the 1M x 128D build spend time?

VERDICT r4 #1: the one unmet north-star metric is index build >= 1M
vectors/min (16.7K vec/s); measured r3 was 3-7K vec/s. This experiment
splits a warm build into stages via the ``profile`` hooks threaded through
``GraphIndex.build`` / ``ivf_self_knn``:

- knn.quantize   — SQ8 source quantize (sq8 builds only)
- knn.partition  — IvfIndex.build per pass (kmeans + partition assembly)
- knn.score      — bucketed self-kNN device program (+ readback on sq8)
- knn.readback   — [P, L, k] D2H + host scatter (f32 path)
- knn.merge      — multi-pass ranked union (host)
- prune          — alpha-diversification scan + [n, k] readback
- assemble       — reverse edges + dedup + fill (host numpy)
- upload         — adjacency H2D + entry-IVF assembly + seeds

Run: python benchmarks/exp_build_profile.py            (1M x 128D)
     PROFILE_N=200000 PROFILE_D=768 python ...         (other config)
     PROFILE_COLD=1 ... to include compile time
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/velesdb_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from velesdb_tpu.index.graph_index import GraphIndex
    from velesdb_tpu.index.params import GraphParams
    from velesdb_tpu.ops import DistanceMetric

    n = int(os.environ.get("PROFILE_N", 1_000_000))
    d = int(os.environ.get("PROFILE_D", 128))
    metric = DistanceMetric.parse(os.environ.get("PROFILE_METRIC", "euclidean"))
    warm = not os.environ.get("PROFILE_COLD")

    # device-side clustered generation (uploads through the tunnel cost
    # more than the build at 1M x 128)
    @jax.jit
    def gen(seed):
        k1, k2, k3 = jax.random.split(jax.random.key(seed), 3)
        centers = jax.random.normal(k1, (64, d), jnp.float32) * 2.0
        assign = jax.random.randint(k2, (n,), 0, 64)
        return centers[assign] + jax.random.normal(k3, (n, d)) * 0.7

    corpus_dev = jax.block_until_ready(gen(0))
    if metric is DistanceMetric.COSINE:
        sq = jnp.sum(corpus_dev * corpus_dev, axis=1, keepdims=True)
        corpus_dev = corpus_dev * jax.lax.rsqrt(jnp.maximum(sq, 1e-30))
    # the build needs a HOST copy only for fallback paths; pass the device
    # corpus as the primary operand the way Collection does
    corpus_host = np.zeros((n, d), np.float32)  # placeholder (dev path used)
    valid = np.ones(n, bool)
    params = GraphParams.auto(d, n)
    print(f"[profile] n={n} d={d} {metric.value} params: degree={params.degree} "
          f"knn_k={params.knn_k} nprobe={params.build_nprobe} "
          f"passes={params.build_passes}", flush=True)

    if warm:
        # compile-warm pass on a slice (same shapes classes compile below:
        # partition shapes depend on n, so this warms kmeans/scan code only
        # partially; run PROFILE_COLD=1 to see compile cost explicitly)
        print("[profile] warm-up build on 1/8 slice...", flush=True)
        nw = max(65_537, n // 8)
        gw = GraphIndex(d, metric, GraphParams.auto(d, nw))
        t0 = time.perf_counter()
        gw.build(np.zeros((nw, d), np.float32), valid[:nw],
                 corpus_dev=corpus_dev[:nw])
        print(f"[profile] warm-up done in {time.perf_counter()-t0:.1f}s",
              flush=True)

    repeats = int(os.environ.get("PROFILE_REPEAT", 1))
    for rep in range(max(repeats, 1)):
        prof: dict = {}
        gi = GraphIndex(d, metric, params)
        t0 = time.perf_counter()
        gi.build(corpus_host, valid, corpus_dev=corpus_dev, profile=prof)
        total = time.perf_counter() - t0
        prof["total"] = total
        prof["vec_per_s"] = n / total
        tag = "cold+exec" if rep == 0 else f"warm rep {rep}"
        print(f"[profile] ---- build {rep} ({tag})", flush=True)
        print(json.dumps({k: round(v, 3) for k, v in prof.items()}, indent=1),
              flush=True)
        accounted = sum(v for k, v in prof.items()
                        if k not in ("total", "vec_per_s")
                        and not k.startswith("knn.")
                        and not k.startswith("upload.")
                        and not k.startswith("entry."))
        print(f"[profile] accounted {accounted:.1f}s of {total:.1f}s "
              f"({n/total:,.0f} vec/s)", flush=True)


if __name__ == "__main__":
    main()
