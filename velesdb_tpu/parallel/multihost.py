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

__all__ = [
    "init_distributed",
    "make_hybrid_mesh",
    "num_slices",
    "segment_for_host",
    "dcn_sharded_search",
    "make_global_rows",
]

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
    try:  # a caller may have bootstrapped jax.distributed directly (it must
        # run before ANY backend-initializing import) — detect and adopt it
        from jax._src import distributed as _dist

        if getattr(_dist.global_state, "client", None) is not None:
            _INITIALIZED[0] = True
            return jax.process_count() > 1
    except (ImportError, AttributeError):
        pass
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
    """Number of DCN-connected slices (hosts/pods) among ``devices``.

    TPU devices carry ``slice_index``; CPU devices (the multi-process test
    rig) don't — there the process boundary IS the DCN boundary."""
    devs = list(devices if devices is not None else jax.devices())
    slice_ids = {getattr(d, "slice_index", 0) or 0 for d in devs}
    if len(slice_ids) > 1:
        # real multi-slice topology: trust the hardware's slice labels
        return len(slice_ids)
    # one slice (or no slice info): only NON-accelerator rigs (the
    # multi-process CPU test harness) treat process boundaries as DCN —
    # a TPU slice legitimately spans several processes over ICI
    if all(d.platform == "cpu" for d in devs):
        return max(1, len({d.process_index for d in devs}))
    return 1


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
        try:
            from jax.experimental import mesh_utils

            arr = mesh_utils.create_hybrid_device_mesh(
                (1, dp, rows),
                (slices, 1, 1),
                devices=devs,
            )
            return Mesh(arr, ("dcn", "dp", "rows"))
        except (ValueError, AttributeError):
            # non-TPU devices (multi-process CPU rig): group by process so
            # the outer axis crosses process/DCN boundaries, inner axes stay
            # process-local
            devs = sorted(devs, key=lambda d: (d.process_index, d.id))
            arr = np.asarray(devs).reshape(slices, dp, rows)
            return Mesh(arr, ("dcn", "dp", "rows"))
    arr = np.asarray(devs).reshape(1, dp, rows)
    return Mesh(arr, ("dcn", "dp", "rows"))


def make_global_rows(mesh: Mesh, make_local, n: int, row_shape=(),
                     dtype=np.float32):
    """Build a global array row-sharded over ``(dcn, rows)`` from per-shard
    host data. ``make_local(start, stop) -> np.ndarray`` produces the rows of
    one shard — each process only materializes the segments it owns (there is
    no cross-host shared memory; this is the DCN ingest path in array form).
    ``n`` must divide evenly by ``dcn*rows`` (pad first)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    spec = P(("dcn", "rows"), *([None] * len(row_shape)))
    sharding = NamedSharding(mesh, spec)

    def cb(index):
        sl = index[0]
        start = sl.start or 0
        stop = sl.stop if sl.stop is not None else n
        return np.asarray(make_local(start, stop), dtype)

    return jax.make_array_from_callback((n, *row_shape), sharding, cb)


def dcn_sharded_search(mesh: Mesh, queries, corpus, valid, cnorm, *, k: int,
                       metric, chunk: int = 65536):
    """Cross-host search over a ``(dcn, dp, rows)`` hybrid mesh (the §5.8
    execution path, not just scaffolding).

    ``corpus [N, D]`` row-shards over BOTH ``dcn`` (host segments) and
    ``rows`` (intra-host ICI shards); ``queries [B, D]`` shard over ``dp``
    and replicate across hosts (the fan-out). Each device runs the streamed
    per-shard engine; the k-list merge all_gathers ``[B, k]`` partials over
    ``rows`` (ICI) *and* ``dcn`` — the single cross-host collective per
    batch, exactly the steady-state traffic budgeted in docs/SCALE_OUT.md.

    Returns ``(values [B, k], global_row_indices [B, k])`` replicated.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from velesdb_tpu.ops.distance import DistanceMetric
    from velesdb_tpu.ops.streamed import streamed_topk
    from velesdb_tpu.ops.topk import top_k as _top_k

    metric = DistanceMetric.parse(metric)
    shards = mesh.shape["dcn"] * mesh.shape["rows"]
    n = corpus.shape[0]
    if n % shards:
        raise ValueError(f"corpus rows {n} must divide by dcn*rows={shards}")
    n_local = n // shards
    k_eff = min(k, n_local)

    import jax.numpy as jnp

    def kernel(q, c, v, cn):
        lv, li = streamed_topk(
            q, c, valid=v, k=k_eff, metric=metric,
            chunk=min(chunk, n_local), corpus_sqnorm=cn,
        )
        dcn_i = jax.lax.axis_index("dcn")
        row_i = jax.lax.axis_index("rows")
        shard = dcn_i * mesh.shape["rows"] + row_i
        gi = jnp.where(li >= 0, li + shard * n_local, -1)
        # ONE merge over ici+dcn: [S_total, B, k'] partials everywhere
        av = jax.lax.all_gather(lv, ("dcn", "rows"))
        ai = jax.lax.all_gather(gi, ("dcn", "rows"))
        b = lv.shape[0]
        av = jnp.moveaxis(av, 0, 1).reshape(b, -1)
        ai = jnp.moveaxis(ai, 0, 1).reshape(b, -1)
        mv, pos = _top_k(av, k, metric.higher_is_better, mask=ai >= 0)
        return mv, jnp.take_along_axis(ai, pos, axis=-1)

    fn = jax.jit(
        jax.shard_map(
            kernel,
            mesh=mesh,
            in_specs=(
                P("dp", None),
                P(("dcn", "rows"), None),
                P(("dcn", "rows")),
                P(("dcn", "rows")),
            ),
            out_specs=(P("dp", None), P("dp", None)),
            check_vma=False,
        )
    )
    return fn(queries, corpus, valid, cnorm)


def segment_for_host(n_rows_total: int, host: int | None = None,
                     n_hosts: int | None = None) -> tuple[int, int]:
    """Contiguous corpus segment [start, end) owned by ``host`` when rows
    partition across DCN hosts (ingest routing helper)."""
    h = host if host is not None else jax.process_index()
    nh = n_hosts or max(jax.process_count(), 1)
    per = -(-n_rows_total // nh)
    start = h * per
    return start, min(start + per, n_rows_total)
