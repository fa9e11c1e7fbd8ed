"""Multi-host (DCN) scale-out: jax.distributed bootstrap + hybrid meshes.

SURVEY.md §5.8: one v5e host tops out at 8 chips on ICI; beyond that,
hosts connect over DCN and JAX needs (a) a distributed runtime handshake
and (b) a mesh whose outer axis maps to DCN so only cheap/infrequent
collectives cross hosts. This module supplies both:

- :func:`init_distributed` — idempotent `jax.distributed.initialize`
  wrapper driven by env (`VELESDB_COORD_ADDR`, `VELESDB_NUM_PROCESSES`,
  `VELESDB_PROCESS_ID`) or explicit args. On a single host it is a no-op.
- :func:`make_hybrid_mesh` — a ``(dcn, dp, rows)`` mesh built with
  `mesh_utils.create_hybrid_device_mesh` when several hosts (slices) are
  present, else a plain local mesh with a unit ``dcn`` axis, so sharded
  code is written ONCE against the 3-axis names.

Sharding policy for the search engines (see `docs/SCALE_OUT.md`):

- **rows over ICI** (`rows` axis): the corpus row-shards inside each host;
  the per-shard top-k merge (`all_gather` of [B, k] candidates) stays on
  ICI exactly as in `parallel/sharded.py`.
- **corpus segments over DCN** (`dcn` axis): each host owns an independent
  row segment; a query fans out to all hosts and merges k-lists ONCE at
  the end — one [B, k]-sized all_gather over DCN per batch, the only
  cross-host traffic in steady state.
- ingest routes rows to their owning host by id hash (the WAL/memmap
  storage stays host-local — there is no cross-host shared disk).

The reference has no distributed backend (single-node rayon); this is a
TPU-native extension, so the design follows the hybrid-mesh recipe rather
than any reference code path.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh

__all__ = ["init_distributed", "make_hybrid_mesh", "num_slices", "segment_for_host"]

_INITIALIZED = [False]


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Idempotent multi-process bootstrap. Returns True when a multi-process
    runtime is active after the call.

    Args default from ``VELESDB_COORD_ADDR`` / ``VELESDB_NUM_PROCESSES`` /
    ``VELESDB_PROCESS_ID``; with no configuration (the single-host case)
    this is a no-op returning False.
    """
    if _INITIALIZED[0]:
        return jax.process_count() > 1
    coordinator_address = coordinator_address or os.environ.get(
        "VELESDB_COORD_ADDR"
    )
    if coordinator_address is None:
        return False
    num_processes = num_processes or int(
        os.environ.get("VELESDB_NUM_PROCESSES", "1")
    )
    process_id = (
        process_id
        if process_id is not None
        else int(os.environ.get("VELESDB_PROCESS_ID", "0"))
    )
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _INITIALIZED[0] = True
    return jax.process_count() > 1


def num_slices(devices=None) -> int:
    """Number of DCN-connected slices (hosts/pods) among ``devices``."""
    devs = list(devices if devices is not None else jax.devices())
    slice_ids = {getattr(d, "slice_index", 0) for d in devs}
    return max(1, len(slice_ids))


def make_hybrid_mesh(dp: int = 1, devices=None) -> Mesh:
    """Build a ``(dcn, dp, rows)`` mesh.

    With multiple slices, the outer ``dcn`` axis spans slices (via
    ``mesh_utils.create_hybrid_device_mesh`` so intra-slice axes stay on
    ICI); with one slice it is a unit axis over the local mesh — sharded
    programs annotate against the same three names either way.
    """
    devs = list(devices if devices is not None else jax.devices())
    slices = num_slices(devs)
    n = len(devs)
    if n % (slices * dp):
        raise ValueError(f"{n} devices not divisible by slices*dp={slices*dp}")
    rows = n // (slices * dp)
    if slices > 1:
        from jax.experimental import mesh_utils

        arr = mesh_utils.create_hybrid_device_mesh(
            (1, dp, rows),
            (slices, 1, 1),
            devices=devs,
        )
        return Mesh(arr, ("dcn", "dp", "rows"))
    arr = np.asarray(devs).reshape(1, dp, rows)
    return Mesh(arr, ("dcn", "dp", "rows"))


def segment_for_host(n_rows_total: int, host: int | None = None,
                     n_hosts: int | None = None) -> tuple[int, int]:
    """Contiguous corpus segment [start, end) owned by ``host`` when rows
    partition across DCN hosts (ingest routing helper)."""
    h = host if host is not None else jax.process_index()
    nh = n_hosts or max(jax.process_count(), 1)
    per = -(-n_rows_total // nh)
    start = h * per
    return start, min(start + per, n_rows_total)
