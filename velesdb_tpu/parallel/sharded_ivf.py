"""Sharded IVF: per-shard partitioned indexes merged over ICI.

Completes the scale-out triad (sharded exact, sharded graph ANN, sharded
IVF): corpus rows round-robin across the mesh ``rows`` axis, each shard
trains its OWN k-means routing over its rows, and a query batch is one
``shard_map`` program — local IVF probe per shard, ``all_gather`` of the
``[B, k]`` partials, merged top-k. Per-shard HBM read per query =
``nprobe * L`` of 1/S of the corpus; routing quality is preserved because
each shard's centroids cover exactly the rows it owns.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from velesdb_tpu.index.ivf import IvfIndex, ivf_search_impl
from velesdb_tpu.index.params import SearchQuality
from velesdb_tpu.ops.distance import DistanceMetric
from velesdb_tpu.parallel.sharded import (
    n_row_shards as _n_row_shards,
    row_axes as _ra,
)

__all__ = ["ShardedIvfIndex"]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class ShardedIvfIndex:
    """Row-sharded IVF over a device mesh."""

    def __init__(self, mesh: Mesh, dim: int, metric: DistanceMetric,
                 n_clusters: int | None = None):
        self.mesh = mesh
        self.n_shards = _n_row_shards(mesh)
        self.dim = dim
        self.metric = DistanceMetric.parse(metric)
        self.n_clusters = n_clusters
        self.n = 0
        self.c_local = 0
        self.part_len = 0
        self._cents = None  # [S*C, D] sharded over rows
        self._cent_sq = None  # [S*C]
        self._parts = None  # [S*C, L, D] sharded
        self._part_rows = None  # [S*C, L] GLOBAL corpus rows, -1 pad
        self._part_sq = None  # [S*C, L]

    def build(self, corpus: np.ndarray, valid: np.ndarray | None = None) -> None:
        corpus = np.asarray(corpus, np.float32)
        n = corpus.shape[0]
        if valid is None:
            valid = np.ones(n, bool)
        self.n = n
        s = self.n_shards
        subs: list[IvfIndex] = []
        shard_rows: list[np.ndarray] = []
        for shard in range(s):
            rows = np.arange(shard, n, s)
            sub = IvfIndex(self.dim, self.metric, n_clusters=self.n_clusters)
            sub.build(corpus[rows], valid[rows])
            subs.append(sub)
            shard_rows.append(rows)
        # unify partition geometry across shards (uniform [C, L] per shard);
        # c_real strips each sub-index's bucket-padded trailing partitions
        # (zero-centroid sentinel slots, ivf._bucket_n_parts)
        c_max = max(sub.c_real or sub.c for sub in subs)
        l_max = _round_up(max(sub.part_len for sub in subs), 8)
        self.c_local, self.part_len = c_max, l_max

        cents = np.zeros((s, c_max, self.dim), np.float32)
        parts = np.zeros((s, c_max, l_max, self.dim), np.float32)
        prows = np.full((s, c_max, l_max), -1, np.int32)
        for shard, sub in enumerate(subs):
            cr = sub.c_real or sub.c
            cents[shard, :cr] = np.asarray(sub._centroids)[:cr]
            # geometry-padding partitions duplicate the first real centroid:
            # probing them is redundant but never harmful (their rows are -1)
            cents[shard, cr:] = cents[shard, 0]
            parts[shard, :cr, : sub.part_len] = np.asarray(sub._parts)[:cr]
            local = np.asarray(sub._part_rows)[:cr]
            glob = np.where(local >= 0, shard_rows[shard][np.maximum(local, 0)], -1)
            prows[shard, :cr, : sub.part_len] = glob

        spec2 = NamedSharding(self.mesh, P(_ra(self.mesh), None))
        spec3 = NamedSharding(self.mesh, P(_ra(self.mesh), None, None))
        self._cents = jax.device_put(cents.reshape(s * c_max, self.dim), spec2)
        self._cent_sq = jax.device_put(
            np.sum(cents.astype(np.float64) ** 2, axis=2)
            .astype(np.float32)
            .reshape(s * c_max),
            NamedSharding(self.mesh, P(_ra(self.mesh))),
        )
        self._parts = jax.device_put(
            parts.reshape(s * c_max, l_max, self.dim), spec3
        )
        self._part_rows = jax.device_put(prows.reshape(s * c_max, l_max), spec2)
        self._part_sq = jax.device_put(
            np.sum(parts.astype(np.float64) ** 2, axis=3)
            .astype(np.float32)
            .reshape(s * c_max, l_max),
            spec2,
        )

    def search(self, queries, k: int, nprobe: int | None = None,
               ef: int | None = None, quality=None):
        """Returns ``(values [B, k], corpus_row_indices [B, k])`` best-first."""
        if quality is not None:
            ef = SearchQuality.parse(quality).ef
        if nprobe is None:
            ef = ef or 128
            nprobe = max(2, min(-(-ef * 8 // max(self.part_len, 1)), self.c_local))
        q = np.atleast_2d(np.asarray(queries, np.float32))
        b = q.shape[0]
        dp = self.mesh.shape["dp"]
        b_pad = -(-max(b, 8) // dp) * dp
        qd = jax.device_put(
            np.pad(q, ((0, b_pad - b), (0, 0))),
            NamedSharding(self.mesh, P("dp", None)),
        )
        vals, rows = _sharded_ivf(
            qd, self._cents, self._cent_sq, self._parts, self._part_rows,
            self._part_sq, mesh=self.mesh, k=k,
            nprobe=int(min(nprobe, self.c_local)), metric=self.metric,
        )
        return np.asarray(vals[:b]), np.asarray(rows[:b])


@functools.partial(
    jax.jit, static_argnames=("mesh", "k", "nprobe", "metric")
)
def _sharded_ivf(q, cents, cent_sq, parts, part_rows, part_sq, *,
                 mesh, k, nprobe, metric):
    hib = metric.higher_is_better

    def kernel(qb, c, csq, p, pr, psq):
        lv, li = ivf_search_impl(
            qb, c, csq, p, pr, psq, None, k=k, nprobe=nprobe, metric=metric
        )
        av = jax.lax.all_gather(lv, _ra(mesh))  # [S, B, k]
        ai = jax.lax.all_gather(li, _ra(mesh))  # global rows already
        bsz = qb.shape[0]
        av = jnp.moveaxis(av, 0, 1).reshape(bsz, -1)
        ai = jnp.moveaxis(ai, 0, 1).reshape(bsz, -1)
        key = av if hib else -av
        key = jnp.where(ai >= 0, key, -jnp.inf)
        mv, pos = jax.lax.top_k(key, k)
        out_v = jnp.take_along_axis(av, pos, axis=-1)
        out_i = jnp.take_along_axis(ai, pos, axis=-1)
        return out_v, jnp.where(jnp.isinf(mv), -1, out_i)

    return jax.shard_map(
        kernel,
        mesh=mesh,
        in_specs=(
            P("dp", None),
            P(_ra(mesh), None),
            P(_ra(mesh)),
            P(_ra(mesh), None, None),
            P(_ra(mesh), None),
            P(_ra(mesh), None),
        ),
        out_specs=(P("dp", None), P("dp", None)),
        check_vma=False,
    )(q, cents, cent_sq, parts, part_rows, part_sq)
