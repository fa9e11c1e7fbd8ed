"""Multi-chip search: row-sharded corpus over a device mesh with ICI merge.

The reference is single-node (SURVEY.md §2.7 — rayon batch parallelism only,
no distribution layer). The TPU-native scale-out replaces both:

- **capacity** — the corpus rows shard across the ``rows`` mesh axis
  (``[N, D]`` → ``[N/S, D]`` per device); each device computes a *local*
  top-k against its shard inside ``shard_map``, then one ``all_gather`` of
  the tiny ``[B, k]`` partials over ICI + a re-select produces the global
  top-k. This is the "allgather top-k merge" of BASELINE.json's north star.
- **QPS** — the query batch shards across the ``dp`` mesh axis
  (data-parallel replicas of nothing: queries never need the full corpus
  locally, so dp×rows composes freely on a 2-D mesh).

Everything is a single jitted ``shard_map`` program: XLA lays the gather on
ICI and overlaps it with the next batch's matmul.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from velesdb_tpu.ops.distance import DistanceMetric, pairwise_scores
from velesdb_tpu.ops.topk import top_k

__all__ = ["make_mesh", "ShardedBruteForce", "shard_rows", "sharded_ingest_search_step"]


def make_mesh(
    n_devices: int | None = None,
    dp: int = 1,
    devices: Sequence[jax.Device] | None = None,
) -> Mesh:
    """Build a ``(dp, rows)`` 2-D mesh over the first ``n_devices`` devices.

    ``rows`` (corpus sharding) is the fast/inner axis so shard-merge
    collectives ride neighbouring ICI links; ``dp`` splits the query batch.
    """
    devs = list(devices if devices is not None else jax.devices())
    n = n_devices or len(devs)
    if n > len(devs):
        raise ValueError(f"requested {n} devices, have {len(devs)}")
    if n % dp != 0:
        raise ValueError(f"n_devices={n} not divisible by dp={dp}")
    arr = np.asarray(devs[:n]).reshape(dp, n // dp)
    return Mesh(arr, ("dp", "rows"))


def shard_rows(mesh: Mesh, array: np.ndarray, pad_value=0) -> jax.Array:
    """Place ``[N, ...]`` host data row-sharded over the ``rows`` axis,
    padding N up to a multiple of the shard count."""
    s = mesh.shape["rows"]
    n = array.shape[0]
    n_pad = -(-n // s) * s
    if n_pad != n:
        widths = [(0, n_pad - n)] + [(0, 0)] * (array.ndim - 1)
        array = np.pad(array, widths, constant_values=pad_value)
    spec = P("rows", *([None] * (array.ndim - 1)))
    return jax.device_put(array, NamedSharding(mesh, spec))


@functools.partial(
    jax.jit, static_argnames=("mesh", "k", "metric", "higher_is_better")
)
def _sharded_search(queries, corpus, valid, mask, *, mesh, k, metric, higher_is_better):
    """One program: local scores+top-k per shard, all_gather partials, merge.

    Shapes inside ``shard_map``: ``q [B/dp, D]``, ``corpus [N/S, D]``,
    ``valid/mask [N/S]``; output ``[B/dp, k]`` per dp shard (replicated over
    ``rows``).
    """
    n_local = corpus.shape[0] // mesh.shape["rows"]

    def kernel(q, c, v, m):
        s = pairwise_scores(q, c, metric)
        vv = v if m is None else jnp.logical_and(v, m)
        lv, li = top_k(s, min(k, n_local), higher_is_better, mask=vv[None, :])
        shard = jax.lax.axis_index("rows")
        gi = jnp.where(li >= 0, li + shard * n_local, -1)
        # [S, B, k'] partials on every device, then re-select global top-k
        av = jax.lax.all_gather(lv, "rows")
        ai = jax.lax.all_gather(gi, "rows")
        av = jnp.moveaxis(av, 0, 1).reshape(q.shape[0], -1)
        ai = jnp.moveaxis(ai, 0, 1).reshape(q.shape[0], -1)
        mv, pos = top_k(av, k, higher_is_better)
        return mv, jnp.take_along_axis(ai, pos, axis=-1)

    in_specs = (P("dp", None), P("rows", None), P("rows"), P("rows") if mask is not None else P())
    if mask is None:
        body = lambda q, c, v: kernel(q, c, v, None)
        return jax.shard_map(
            body,
            mesh=mesh,
            in_specs=in_specs[:3],
            out_specs=(P("dp", None), P("dp", None)),
            check_vma=False,
        )(queries, corpus, valid)
    return jax.shard_map(
        kernel,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=(P("dp", None), P("dp", None)),
        check_vma=False,
    )(queries, corpus, valid, mask)


class ShardedBruteForce:
    """Exact search over a corpus row-sharded across a device mesh.

    The multi-chip counterpart of :class:`~velesdb_tpu.index.brute.
    BruteForceIndex` — same masked-top-k semantics, corpus capacity × S.
    """

    def __init__(self, mesh: Mesh, dim: int, metric: DistanceMetric):
        self.mesh = mesh
        self.dim = dim
        self.metric = DistanceMetric.parse(metric)
        self.n = 0
        self.n_pad = 0
        self._corpus = None
        self._valid = None

    def rebuild(self, corpus: np.ndarray, valid: np.ndarray | None = None) -> None:
        n = corpus.shape[0]
        if valid is None:
            valid = np.ones(n, bool)
        self.n = n
        self._corpus = shard_rows(self.mesh, np.asarray(corpus, np.float32))
        self.n_pad = self._corpus.shape[0]
        self._valid = shard_rows(
            self.mesh, np.pad(np.asarray(valid, bool), (0, self.n_pad - n))
        )

    def search(self, queries, k: int, mask: np.ndarray | None = None):
        """Returns ``(values [B, k], global_row_indices [B, k])``."""
        q = np.atleast_2d(np.asarray(queries, np.float32))
        b = q.shape[0]
        dp = self.mesh.shape["dp"]
        b_pad = -(-b // dp) * dp
        qd = jax.device_put(
            np.pad(q, ((0, b_pad - b), (0, 0))),
            NamedSharding(self.mesh, P("dp", None)),
        )
        md = None
        if mask is not None:
            mask = np.asarray(mask, bool)
            md = shard_rows(self.mesh, np.pad(mask, (0, self.n_pad - mask.shape[0])))
        vals, idx = _sharded_search(
            qd,
            self._corpus,
            self._valid,
            md,
            mesh=self.mesh,
            k=k,
            metric=self.metric,
            higher_is_better=self.metric.higher_is_better,
        )
        return np.asarray(vals)[:b], np.asarray(idx)[:b]


def sharded_ingest_search_step(mesh: Mesh, dim: int, metric: DistanceMetric):
    """Return a jitted full ingest+search step over the mesh (the vector-DB
    analog of a "training step": mutate the sharded corpus buffer, then run a
    sharded query batch against it).

    Returns ``step(corpus, valid, new_rows, write_pos, queries, k) ->
    (corpus', valid', values, indices)`` where ``corpus [N, D]`` is
    row-sharded, ``new_rows [R, D]`` is replicated, ``queries [B, D]`` is
    dp-sharded. Buffer donation keeps the corpus update in-place in HBM.
    """
    metric = DistanceMetric.parse(metric)

    def step(corpus, valid, new_rows, write_pos, queries, *, k):
        s = mesh.shape["rows"]
        n_local = corpus.shape[0] // s
        r = new_rows.shape[0]

        def kernel(c, v, rows, pos, q):
            c = c.reshape(n_local, dim)
            v = v.reshape(n_local)
            shard = jax.lax.axis_index("rows")
            lo, hi = shard * n_local, (shard + 1) * n_local
            # scatter each new row into whichever shard owns its slot
            tgt = pos[0] + jnp.arange(r)
            local = tgt - lo
            mine = (tgt >= lo) & (tgt < hi)
            li = jnp.where(mine, local, 0)
            c = c.at[li].set(jnp.where(mine[:, None], rows, c[li]))
            v = v.at[li].set(jnp.where(mine, True, v[li]))
            sc = pairwise_scores(q, c, metric)
            lv, lidx = top_k(
                sc, min(k, n_local), metric.higher_is_better, mask=v[None, :]
            )
            gi = jnp.where(lidx >= 0, lidx + lo, -1)
            av = jax.lax.all_gather(lv, "rows")
            ai = jax.lax.all_gather(gi, "rows")
            av = jnp.moveaxis(av, 0, 1).reshape(q.shape[0], -1)
            ai = jnp.moveaxis(ai, 0, 1).reshape(q.shape[0], -1)
            mv, ppos = top_k(av, k, metric.higher_is_better)
            return c, v, mv, jnp.take_along_axis(ai, ppos, axis=-1)

        return jax.shard_map(
            kernel,
            mesh=mesh,
            in_specs=(P("rows", None), P("rows"), P(), P(), P("dp", None)),
            out_specs=(
                P("rows", None),
                P("rows"),
                P("dp", None),
                P("dp", None),
            ),
            check_vma=False,
        )(corpus, valid, new_rows, write_pos, queries)

    return jax.jit(step, static_argnames=("k",), donate_argnums=(0, 1))
