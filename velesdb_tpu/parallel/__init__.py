"""Multi-chip sharding: device meshes, sharded search, ICI top-k merge."""

from velesdb_tpu.parallel.sharded import (
    ShardedBruteForce,
    make_mesh,
    shard_rows,
    sharded_ingest_search_step,
)

__all__ = [
    "ShardedBruteForce",
    "make_mesh",
    "shard_rows",
    "sharded_ingest_search_step",
]
