"""Sharded ANN: per-shard beam-search graphs merged over ICI.

The north star's scale-out design (BASELINE.json: "indexes beyond one chip
shard across ICI with per-shard top-k merged by allgather"): corpus rows
partition across the mesh's ``rows`` axis, each shard owns an independent
beam-search graph over its rows (graphs never cross shards, so there is no
cross-device pointer chasing), and a query batch runs ONE ``shard_map``
program — local beam search per shard, tiny ``[B, k]`` partials
``all_gather``-ed over ICI, merged top-k on every device.

Recall composition: per-shard graphs search their ef over *fewer* rows, so
recall@k at equal ef is >= the single-shard index (each shard's top-k is
exact over its candidates; union of per-shard top-k contains the global ANN
top-k whenever each true neighbor is found by its home shard).

Build is embarrassingly parallel across shards (independent kNN graphs =
1/S^2 of the single-device kNN FLOPs each, S x fewer total).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from velesdb_tpu.index.graph_index import GraphIndex, beam_search_impl
from velesdb_tpu.index.params import GraphParams, SearchQuality
from velesdb_tpu.ops.distance import DistanceMetric
from velesdb_tpu.parallel.sharded import (
    n_row_shards as _n_row_shards,
    row_axes as _ra,
)

__all__ = ["ShardedGraphIndex"]


class ShardedGraphIndex:
    """Row-sharded beam-search ANN over a device mesh."""

    def __init__(
        self,
        mesh: Mesh,
        dim: int,
        metric: DistanceMetric,
        params: GraphParams | None = None,
    ):
        self.mesh = mesh
        self.n_shards = _n_row_shards(mesh)
        self.dim = dim
        self.metric = DistanceMetric.parse(metric)
        self.params = params
        self.n = 0
        self.n_local = 0
        self._corpus = None  # [S*n_local, D] sharded over rows
        self._adj = None  # [S*n_local, degree] sharded, LOCAL indices
        self._sqnorm = None  # [S*n_local]
        self._valid = None  # [S*n_local]
        self._seeds = None  # [S*E] sharded, local indices
        self._row_of = None  # host: global row -> original corpus row
        # per-shard SQ8 entry-IVF (r3c), geometry-unified across shards and
        # sharded over rows; None when sub-builds keep the seed-scan entry
        self._entry = None  # (cents, csq, words, scale, minv, prows, psq)
        self._entry_c = 0  # partitions per shard (padded uniform)
        # folded probe-KERNEL operands (r4 serve parity: the single-chip
        # graph probes entries with the scalar-prefetch Pallas kernel at
        # every batch size; the sharded graph ran XLA-scan only)
        self._entry_kern = None  # (aux [S*C, 8, L], frows [S*C*L]) sharded
        self._entry_len = 0  # partition length L (kernel guard input)

    # -- build ---------------------------------------------------------------

    def build(self, corpus: np.ndarray, valid: np.ndarray | None = None) -> None:
        """Partition rows round-robin across shards and build one graph per
        shard (balanced shards keep per-device work uniform)."""
        corpus = np.asarray(corpus, np.float32)
        n = corpus.shape[0]
        if valid is None:
            valid = np.ones(n, bool)
        self.n = n
        s = self.n_shards
        self.params = self.params or GraphParams.auto(self.dim, max(n // s, 1))
        n_local = -(-n // s)

        corpus_blocks, adj_blocks, valid_blocks, seed_blocks = [], [], [], []
        row_of = np.full(s * n_local, -1, np.int64)
        seeds_per_shard = None
        sub_entries = []
        for shard in range(s):
            rows = np.arange(shard, n, s)  # round-robin partition
            sub = GraphIndex(self.dim, self.metric, params=self.params)
            sub.build(corpus[rows], valid[rows])
            sub_entries.append(sub._entry_ivf)
            pad = n_local - len(rows)
            row_of[shard * n_local : shard * n_local + len(rows)] = rows
            corpus_blocks.append(
                np.pad(corpus[rows], ((0, pad), (0, 0)))
            )
            adj = np.asarray(sub._adj)[: len(rows)] if sub._adj is not None else (
                np.full((len(rows), self.params.degree), -1, np.int32)
            )
            adj_blocks.append(np.pad(adj, ((0, pad), (0, 0)), constant_values=-1))
            valid_blocks.append(np.pad(valid[rows], (0, pad)))
            seeds = (
                np.asarray(sub._seed_ids)
                if sub._seed_ids is not None
                else np.zeros(1, np.int32)
            )
            seed_blocks.append(seeds)
            if seeds_per_shard is None or len(seeds) < seeds_per_shard:
                seeds_per_shard = len(seeds)
        seed_blocks = [b[:seeds_per_shard] for b in seed_blocks]

        self.n_local = n_local
        self._row_of = row_of
        shard_spec = NamedSharding(self.mesh, P(_ra(self.mesh), None))
        vec_spec = NamedSharding(self.mesh, P(_ra(self.mesh)))
        self._corpus = jax.device_put(np.concatenate(corpus_blocks), shard_spec)
        self._adj = jax.device_put(np.concatenate(adj_blocks), shard_spec)
        self._valid = jax.device_put(np.concatenate(valid_blocks), vec_spec)
        self._sqnorm = jax.device_put(
            np.concatenate([np.sum(b.astype(np.float64) ** 2, axis=1).astype(np.float32) for b in corpus_blocks]),
            vec_spec,
        )
        self._seeds = jax.device_put(np.concatenate(seed_blocks), vec_spec)
        self._entry, self._entry_c = None, 0
        if all(e is not None for e in sub_entries):
            self._upload_entry(sub_entries, shard_spec)

    def _upload_entry(self, subs, shard_spec) -> None:
        """Geometry-unify the per-shard SQ8 entry IVFs ([C, L] padded to the
        max across shards — pad partitions duplicate the first centroid and
        carry -1 rows, which the entry scan masks) and shard over rows."""
        s = self.n_shards
        # c_real strips each sub-IVF's bucket-padded trailing partitions
        # (zero-centroid slots whose sentinel csq would be lost below —
        # this packer recomputes csq from the centroids, and a zero
        # centroid OUTSCORES real ones in the shard_map entry routing,
        # starving the beam of live entries)
        c_max = max(e.c_real or e.c for e in subs)
        l_max = max(e.part_len for e in subs)
        w = np.asarray(subs[0]._parts).shape[-1]
        cents = np.zeros((s, c_max, self.dim), np.float32)
        words = np.zeros((s, c_max, l_max, w), np.int32)
        scale = np.zeros((s, c_max, l_max), np.float32)
        minv = np.zeros((s, c_max, l_max), np.float32)
        prows = np.full((s, c_max, l_max), -1, np.int32)
        psq = np.zeros((s, c_max, l_max), np.float32)
        for i, e in enumerate(subs):
            c, L = e.c_real or e.c, e.part_len
            cents[i, :c] = np.asarray(e._centroids)[:c]
            cents[i, c:] = cents[i, 0]
            words[i, :c, :L] = np.asarray(e._parts)[:c]
            scale[i, :c, :L] = np.asarray(e._part_scale)[:c]
            minv[i, :c, :L] = np.asarray(e._part_minv)[:c]
            prows[i, :c, :L] = np.asarray(e._part_rows)[:c]  # LOCAL row ids
            psq[i, :c, :L] = np.asarray(e._part_sq)[:c]
        spec3 = NamedSharding(self.mesh, P(_ra(self.mesh), None, None))
        self._entry = (
            jax.device_put(cents.reshape(s * c_max, self.dim), shard_spec),
            jax.device_put(
                np.sum(cents.astype(np.float64) ** 2, axis=2)
                .astype(np.float32).reshape(s * c_max),
                NamedSharding(self.mesh, P(_ra(self.mesh))),
            ),
            jax.device_put(words.reshape(s * c_max, l_max, w), spec3),
            jax.device_put(scale.reshape(s * c_max, l_max), shard_spec),
            jax.device_put(minv.reshape(s * c_max, l_max), shard_spec),
            jax.device_put(prows.reshape(s * c_max, l_max), shard_spec),
            jax.device_put(psq.reshape(s * c_max, l_max), shard_spec),
        )
        self._entry_c = c_max
        self._entry_len = l_max
        # probe-kernel operands, folded host-side exactly like
        # ``IvfIndex._kernel_state`` (sq8 storage): cosine's 1/|deq| into
        # the affine, euclidean's |deq|^2 as penalty, +inf on dead slots
        inv = np.where(psq > 1e-30, 1.0 / np.sqrt(np.maximum(psq, 1e-30)), 0.0)
        if self.metric is DistanceMetric.COSINE:
            mul, add, pen_base = scale * inv, minv * inv, np.zeros_like(psq)
        elif self.metric is DistanceMetric.EUCLIDEAN:
            mul, add, pen_base = scale, minv, psq
        else:
            mul, add, pen_base = scale, minv, np.zeros_like(psq)
        pen = np.where(prows >= 0, pen_base, np.inf).astype(np.float32)
        zero = np.zeros_like(psq)
        aux = np.stack(
            [mul, add, pen] + [zero] * 5, axis=2
        ).astype(np.float32)  # [S, C, 8, L]
        self._entry_kern = (
            jax.device_put(
                aux.reshape(s * c_max, 8, l_max), spec3
            ),
            jax.device_put(
                prows.reshape(s * c_max * l_max).astype(np.int32),
                NamedSharding(self.mesh, P(_ra(self.mesh))),
            ),
        )

    # -- search ---------------------------------------------------------------

    def search(
        self,
        queries,
        k: int,
        ef: int | None = None,
        quality: SearchQuality | None = None,
        entry_mode: str | None = None,
    ):
        """Returns ``(values [B, k], corpus_row_indices [B, k])`` best-first.

        ``entry_mode``: None = auto (probe KERNEL when Pallas is live and
        the probe table fits — serve-path parity with the single-chip
        graph, r4 — else the XLA SQ8 scan); explicit "kernel"/"xla"
        overrides (tests drive the kernel path in interpret mode on CPU).
        """
        if quality is not None:
            ef = SearchQuality.parse(quality).ef
        ef = ef or 128
        beam, expansions = self.params.beam_for_ef(ef, k)
        q = np.atleast_2d(np.asarray(queries, np.float32))
        b = q.shape[0]
        dp = self.mesh.shape["dp"]
        b_pad = -(-max(b, 8) // dp) * dp
        qd = jax.device_put(
            np.pad(q, ((0, b_pad - b), (0, 0))),
            NamedSharding(self.mesh, P("dp", None)),
        )
        ep = min(self.params.entry_probes, max(self._entry_c, 1))
        emode, interp = "xla", False
        if self._entry is not None and self._entry_kern is not None:
            from velesdb_tpu.ops.ivf_kernel import (
                MIN_BLOCK_BYTES,
                probe_table_fits,
            )
            from velesdb_tpu.ops.pallas_kernels import use_pallas

            fits = (
                self._entry_len * self.dim >= MIN_BLOCK_BYTES
                and probe_table_fits(b_pad // dp, ep)
            )
            if entry_mode == "kernel":
                emode, interp = "kernel", not use_pallas()
            elif entry_mode is None and use_pallas() and fits:
                emode = "kernel"
        vals, gidx = _sharded_beam(
            qd,
            self._corpus,
            self._adj,
            self._sqnorm,
            self._valid,
            self._seeds,
            self._entry,
            self._entry_kern if emode == "kernel" else None,
            mesh=self.mesh,
            k=min(k, beam),
            beam=beam,
            expansions=expansions,
            degree=self._adj.shape[1],
            entry_points=min(self.params.entry_points, beam),
            metric=self.metric,
            n_local=self.n_local,
            entry_probes=ep,
            expand_width=self.params.expand_width,
            entry_interpret=interp,
        )
        vals, gidx = np.asarray(vals[:b]), np.asarray(gidx[:b])
        # map padded global rows back to original corpus rows
        rows = np.where(gidx >= 0, self._row_of[np.maximum(gidx, 0)], -1)
        return vals, rows


@functools.partial(
    jax.jit,
    static_argnames=(
        "mesh",
        "k",
        "beam",
        "expansions",
        "degree",
        "entry_points",
        "metric",
        "n_local",
        "entry_probes",
        "expand_width",
        "entry_interpret",
    ),
)
def _sharded_beam(
    queries, corpus, adj, sqnorm, valid, seeds, entry, entry_kern=None, *,
    mesh, k, beam, expansions, degree, entry_points, metric, n_local,
    entry_probes=2, expand_width=None, entry_interpret=False,
):
    n_ent = 7 if entry is not None else 0

    def kernel(q, c, a, sn, v, sd, *rest):
        ent = rest[:n_ent]
        kern = rest[n_ent:]
        if kern:
            # scalar-prefetch probe kernel per shard (serve parity with
            # the single-chip graph, r4): entry partitions read as
            # pipelined DMAs instead of the XLA per-probe slice loop
            ec, ecsq, ew = ent[0], ent[1], ent[2]
            e_aux, e_frows = kern
            estate = (ec, ecsq, ew, e_aux, e_frows)
            emode = "kernel"
        elif ent:
            ec, ecsq, ew, esc, emn, epr, epsq = ent
            estate = (ec, ecsq, (ew, esc, emn), epr, epsq)
            emode = "xla"  # pure-XLA SQ8 scan composes with shard_map
        else:
            estate, emode = None, "legacy"
        lv, li = beam_search_impl(
            q, c, a, sn, v, sd, None, None, None, estate,
            k=k, beam=beam, expansions=expansions, degree=degree,
            entry_points=entry_points, metric=metric,
            entry_probes=entry_probes, entry_mode=emode,
            expand_width=expand_width, entry_interpret=entry_interpret,
        )
        shard = jax.lax.axis_index(_ra(mesh))
        gi = jnp.where(li >= 0, li + shard * n_local, -1)
        av = jax.lax.all_gather(lv, _ra(mesh))  # [S, B, k]
        ai = jax.lax.all_gather(gi, _ra(mesh))
        bsz = q.shape[0]
        av = jnp.moveaxis(av, 0, 1).reshape(bsz, -1)
        ai = jnp.moveaxis(ai, 0, 1).reshape(bsz, -1)
        # merge best-first in the metric's native orientation
        key = av if metric.higher_is_better else -av
        key = jnp.where(ai >= 0, key, -jnp.inf)
        mv, pos = jax.lax.top_k(key, k)
        out_v = jnp.take_along_axis(av, pos, axis=-1)
        out_i = jnp.take_along_axis(ai, pos, axis=-1)
        out_i = jnp.where(jnp.isinf(mv), -1, out_i)
        return out_v, out_i

    ent_arrays = tuple(entry) if entry is not None else ()
    ent_specs = (
        (P(_ra(mesh), None), P(_ra(mesh)), P(_ra(mesh), None, None),
         P(_ra(mesh), None), P(_ra(mesh), None), P(_ra(mesh), None), P(_ra(mesh), None))
        if entry is not None
        else ()
    )
    if entry_kern is not None:
        ent_arrays = ent_arrays + tuple(entry_kern)
        ent_specs = ent_specs + (P(_ra(mesh), None, None), P(_ra(mesh)))
    return jax.shard_map(
        kernel,
        mesh=mesh,
        in_specs=(
            P("dp", None),
            P(_ra(mesh), None),
            P(_ra(mesh), None),
            P(_ra(mesh)),
            P(_ra(mesh)),
            P(_ra(mesh)),
        ) + ent_specs,
        out_specs=(P("dp", None), P("dp", None)),
        check_vma=False,
    )(queries, corpus, adj, sqnorm, valid, seeds, *ent_arrays)
