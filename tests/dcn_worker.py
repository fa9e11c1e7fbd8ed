"""Worker for the 2-process DCN test (spawned by test_multihost_dcn.py).

Each process owns half the corpus rows (its DCN segment), fans the shared
query batch out, and the cross-host merged top-k must equal the exact
single-process reference. Run with env:
  VELESDB_COORD_ADDR=localhost:<port> VELESDB_NUM_PROCESSES=2
  VELESDB_PROCESS_ID=<0|1> JAX_PLATFORMS=cpu
  XLA_FLAGS=--xla_force_host_platform_device_count=4
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
# MUST run before any backend-initializing import (velesdb_tpu modules build
# jnp constants at import time); init_distributed() adopts this client.
jax.distributed.initialize(
    coordinator_address=os.environ["VELESDB_COORD_ADDR"],
    num_processes=int(os.environ["VELESDB_NUM_PROCESSES"]),
    process_id=int(os.environ["VELESDB_PROCESS_ID"]),
)

import numpy as np

from velesdb_tpu.ops import DistanceMetric
from velesdb_tpu.parallel.multihost import (
    dcn_sharded_search,
    init_distributed,
    make_global_rows,
    make_hybrid_mesh,
    num_slices,
)


def main() -> int:
    assert init_distributed(), "expected a multi-process runtime"
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, len(jax.devices())
    assert num_slices() == 2, "process boundary must read as a DCN slice"
    mesh = make_hybrid_mesh(dp=1)
    assert mesh.shape == {"dcn": 2, "dp": 1, "rows": 4}
    # the dcn axis must actually cross the process boundary
    mesh_devs = np.asarray(mesh.devices)
    assert {d.process_index for d in mesh_devs[0].reshape(-1)} == {0}
    assert {d.process_index for d in mesh_devs[1].reshape(-1)} == {1}

    n, d, b, k = 4096, 64, 8, 10
    rng = np.random.default_rng(5)
    corpus = rng.standard_normal((n, d)).astype(np.float32)  # same seed both
    queries = rng.standard_normal((b, d)).astype(np.float32)

    # each process materializes only its own segments via the callback
    corpus_g = make_global_rows(
        mesh, lambda s, e: corpus[s:e], n, row_shape=(d,)
    )
    valid_g = make_global_rows(
        mesh, lambda s, e: np.ones(e - s, bool), n, dtype=bool
    )
    sqn = np.sum(corpus * corpus, axis=1).astype(np.float32)
    cnorm_g = make_global_rows(mesh, lambda s, e: sqn[s:e], n)

    from jax.sharding import NamedSharding, PartitionSpec as P

    qg = jax.make_array_from_callback(
        (b, d), NamedSharding(mesh, P("dp", None)), lambda idx: queries[idx]
    )
    vals, idx = dcn_sharded_search(
        mesh, qg, corpus_g, valid_g, cnorm_g, k=k,
        metric=DistanceMetric.EUCLIDEAN,
    )
    # outputs are dp-sharded with dp=1 -> replicated: the local shard IS the
    # full [B, k] result on every process
    vals = np.asarray(vals.addressable_data(0))
    idx = np.asarray(idx.addressable_data(0))

    # exact single-process reference
    d2 = (
        np.sum(queries**2, axis=1)[:, None]
        + sqn[None, :]
        - 2.0 * queries @ corpus.T
    )
    ref = np.argsort(np.sqrt(np.maximum(d2, 0)), axis=1)[:, :k]
    ok = np.array_equal(np.sort(np.asarray(idx), 1), np.sort(ref, 1))
    print(f"proc{jax.process_index()}: cross-host==single-process: {ok}",
          flush=True)
    if not ok:
        return 1

    # r4 #5: the DCN tier dispatches the ANN engines too — per-shard
    # graphs/IVFs row-shard over ("dcn", "rows"); both processes build the
    # same deterministic state, partials merge across the process boundary
    from velesdb_tpu.index.params import GraphParams
    from velesdb_tpu.parallel.sharded_ann import ShardedGraphIndex
    from velesdb_tpu.parallel.sharded_ivf import ShardedIvfIndex

    centers = rng.standard_normal((8, d)).astype(np.float32) * 2.0
    ccorpus = centers[rng.integers(0, 8, n)] + rng.standard_normal(
        (n, d)
    ).astype(np.float32) * 0.5
    cq = ccorpus[:b] + 1e-3
    cd2 = (
        np.sum(cq**2, axis=1)[:, None]
        + np.sum(ccorpus**2, axis=1)[None, :]
        - 2.0 * cq @ ccorpus.T
    )
    cref = np.argsort(np.maximum(cd2, 0), axis=1)[:, :k]

    gi = ShardedGraphIndex(
        mesh, d, DistanceMetric.EUCLIDEAN,
        params=GraphParams(degree=24, knn_k=12),
    )
    gi.build(ccorpus)
    assert gi.n_shards == 8  # dcn(2) x rows(4)
    _, grows = gi.search(cq, k, ef=128)
    g_rec = np.mean([
        len(set(grows[i].tolist()) & set(cref[i].tolist())) / k
        for i in range(b)
    ])
    ivf = ShardedIvfIndex(mesh, d, DistanceMetric.EUCLIDEAN)
    ivf.build(ccorpus)
    _, irows = ivf.search(cq, k, nprobe=8)
    i_rec = np.mean([
        len(set(irows[i].tolist()) & set(cref[i].tolist())) / k
        for i in range(b)
    ])
    print(f"proc{jax.process_index()}: dcn graph recall {g_rec:.3f} "
          f"ivf recall {i_rec:.3f}", flush=True)
    if g_rec < 0.9 or i_rec < 0.9:
        return 1
    print(f"DCN_WORKER_OK:{jax.process_index()}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
