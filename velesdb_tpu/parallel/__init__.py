"""Multi-chip sharding: device meshes, sharded search, ICI top-k merge."""

from velesdb_tpu.parallel.sharded import (
    ShardedBruteForce,
    make_mesh,
    shard_rows,
    sharded_ingest_search_step,
)

from velesdb_tpu.parallel.multihost import (
    init_distributed,
    make_hybrid_mesh,
    segment_for_host,
)
from velesdb_tpu.parallel.sharded_ann import ShardedGraphIndex
from velesdb_tpu.parallel.sharded_ivf import ShardedIvfIndex

__all__ = [
    "ShardedBruteForce",
    "ShardedGraphIndex",
    "ShardedIvfIndex",
    "init_distributed",
    "make_hybrid_mesh",
    "make_mesh",
    "segment_for_host",
    "shard_rows",
    "sharded_ingest_search_step",
]
