"""Multi-chip search: row-sharded corpus over a device mesh with ICI merge.

The reference is single-node (SURVEY.md §2.7 — rayon batch parallelism only,
no distribution layer). The TPU-native scale-out replaces both:

- **capacity** — the corpus rows shard across the ``rows`` mesh axis
  (``[N, D]`` → ``[N/S, D]`` per device); each device runs the *streamed*
  scan+PartialReduce engine (``ops/streamed.py``) against its shard inside
  ``shard_map`` — the ``[B, N_local]`` score matrix is never materialized —
  then one ``all_gather`` of the tiny ``[B, k]`` partials over ICI + a
  re-select produces the global top-k.
- **QPS** — the query batch shards across the ``dp`` mesh axis
  (data-parallel replicas of nothing: queries never need the full corpus
  locally, so dp×rows composes freely on a 2-D mesh).
- **capacity × 4** — ``storage_mode='sq8'`` shards the quantized codes
  (+ per-row affine) instead of f32; ``'bf16'`` shards half-width floats.
  Capacity math for the 50M×768D north star (v5e-8, 16GB HBM/chip):
  f32 = 153.6GB total → 19.2GB/shard (does NOT fit); bf16 = 9.6GB/shard
  (fits); SQ8 = 4.8GB/shard + 0.4GB affine/norms (fits with headroom).

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

from velesdb_tpu.ops.distance import DistanceMetric
from velesdb_tpu.ops.quantization import SQ8Vectors, StorageMode
from velesdb_tpu.ops.streamed import sq8_streamed_topk, streamed_topk
from velesdb_tpu.ops.topk import top_k

__all__ = [
    "make_mesh",
    "ShardedBruteForce",
    "shard_rows",
    "sharded_ingest_search_step",
    "row_axes",
    "n_row_shards",
]


def row_axes(mesh: Mesh):
    """Row-sharding axis names for ``mesh``: hybrid multi-host meshes
    (``make_hybrid_mesh``) shard corpus rows over BOTH the ``dcn`` (host
    segment) and ``rows`` (intra-host ICI) axes — one merged all_gather of
    ``[B, k]`` partials crosses DCN per batch (docs/SCALE_OUT.md); plain
    meshes shard over ``rows`` alone. Engines written against this helper
    dispatch on either mesh unchanged (VERDICT r4 #5: the DCN tier serves
    exact AND ivf AND graph)."""
    return ("dcn", "rows") if "dcn" in mesh.axis_names else ("rows",)


def n_row_shards(mesh: Mesh) -> int:
    n = 1
    for a in row_axes(mesh):
        n *= mesh.shape[a]
    return n


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


def _merge_partials(lv, li, n_local: int, k: int, higher_is_better: bool):
    """Local ``[B, k']`` partials -> global ``[B, k]`` via one ICI
    all_gather + re-select (runs inside ``shard_map``)."""
    shard = jax.lax.axis_index("rows")
    gi = jnp.where(li >= 0, li + shard * n_local, -1)
    av = jax.lax.all_gather(lv, "rows")  # [S, B, k']
    ai = jax.lax.all_gather(gi, "rows")
    b = lv.shape[0]
    av = jnp.moveaxis(av, 0, 1).reshape(b, -1)
    ai = jnp.moveaxis(ai, 0, 1).reshape(b, -1)
    mv, pos = top_k(av, k, higher_is_better, mask=ai >= 0)
    return mv, jnp.take_along_axis(ai, pos, axis=-1)


@functools.partial(
    jax.jit, static_argnames=("mesh", "k", "metric", "chunk")
)
def _sharded_search_streamed(queries, corpus, valid, cnorm, mask, *, mesh, k,
                             metric, chunk):
    """One program: per-shard streamed scan+PartialReduce top-k (round-2
    single-chip selection — no ``[B, N_local]`` materialization), all_gather
    partials over ICI, merge. Replaces the round-1 ``pairwise_scores`` +
    ``lax.top_k`` kernel (VERDICT r2 missing #2)."""
    n_local = corpus.shape[0] // mesh.shape["rows"]
    k_local = min(k, n_local)

    def kernel(q, c, v, cn, m):
        vv = v if m is None else jnp.logical_and(v, m)
        lv, li = streamed_topk(
            q, c, valid=vv, k=k_local, metric=metric,
            chunk=min(chunk, n_local), corpus_sqnorm=cn,
        )
        return _merge_partials(lv, li, n_local, k, metric.higher_is_better)

    specs = [P("dp", None), P("rows", None), P("rows"), P("rows")]
    args = [queries, corpus, valid, cnorm]
    if mask is None:
        body = lambda q, c, v, cn: kernel(q, c, v, cn, None)
    else:
        body = kernel
        specs.append(P("rows"))
        args.append(mask)
    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=tuple(specs),
        out_specs=(P("dp", None), P("dp", None)),
        check_vma=False,
    )(*args)


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "k", "m", "metric", "chunk", "interpret"),
)
def _sharded_search_assist(queries, rows8, scale2, minv2, pen, corpus, mask,
                           *, mesh, k, m, metric, chunk, interpret):
    """int8-assist shard mode (r4, serve-path parity with the single-chip
    default at D < 512): each shard runs the coarse int8 bucket scan +
    in-program exact f32 gather-rerank (``ops/bucket_kernel.
    sq8i_rerank_topk``) over its rows, then the tiny exact-grade ``[B, k]``
    partials merge over ICI. The int8 shadow costs +1B/dim per shard and
    the scan reads 1/4 the f32 bytes — the same 236K-vs-194K QPS win the
    single-chip serve split measured at 1M x 128D (r3e), carried across
    the mesh."""
    from velesdb_tpu.ops.bucket_kernel import sq8i_rerank_topk

    n_local = rows8.shape[0] // mesh.shape["rows"]
    k_local = min(k, n_local)

    def kernel(q, r8, sc, mn, pn, c, msk):
        if msk is not None:
            pn = jnp.where(msk, pn, jnp.inf)
        lv, li = sq8i_rerank_topk(
            q, r8, sc, mn, pn, c, k=k_local, m=m, metric=metric,
            chunk=min(chunk, n_local), interpret=interpret,
        )
        return _merge_partials(lv, li, n_local, k, metric.higher_is_better)

    specs = [P("dp", None), P("rows", None), P("rows"), P("rows"), P("rows"),
             P("rows", None)]
    args = [queries, rows8, scale2, minv2, pen, corpus]
    if mask is None:
        body = lambda q, r8, sc, mn, pn, c: kernel(q, r8, sc, mn, pn, c, None)
    else:
        body = kernel
        specs.append(P("rows"))
        args.append(mask)
    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=tuple(specs),
        out_specs=(P("dp", None), P("dp", None)),
        check_vma=False,
    )(*args)


@functools.partial(
    jax.jit, static_argnames=("mesh", "k", "metric", "chunk")
)
def _sharded_search_sq8(queries, codes, scale, minv, cnorm, valid, mask, *,
                        mesh, k, metric, chunk):
    """SQ8 shard mode: quantized codes stream at 1/4 the HBM bytes per shard
    (the first-class fast path of ``quantization.rs:410``, sharded)."""
    n_local = codes.shape[0] // mesh.shape["rows"]
    k_local = min(k, n_local)

    def kernel(q, cd, sc, mn, cn, v, m):
        vv = v if m is None else jnp.logical_and(v, m)
        lv, li = sq8_streamed_topk(
            q, SQ8Vectors(cd, sc, mn), cnorm=cn, valid=vv, k=k_local,
            metric=metric, chunk=min(chunk, n_local),
        )
        return _merge_partials(lv, li, n_local, k, metric.higher_is_better)

    specs = [P("dp", None), P("rows", None), P("rows"), P("rows"), P("rows"),
             P("rows")]
    args = [queries, codes, scale, minv, cnorm, valid]
    if mask is None:
        body = lambda q, cd, sc, mn, cn, v: kernel(q, cd, sc, mn, cn, v, None)
    else:
        body = kernel
        specs.append(P("rows"))
        args.append(mask)
    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=tuple(specs),
        out_specs=(P("dp", None), P("dp", None)),
        check_vma=False,
    )(*args)


def _sq8_quantize_host(x: np.ndarray):
    """Host-side per-vector affine quantization (``sq8_quantize`` semantics
    without a full-precision device copy — rebuild-time path for corpora
    that only fit in HBM *quantized*)."""
    x = np.asarray(x, np.float32)
    minv = x.min(axis=1)
    maxv = x.max(axis=1)
    scale = (maxv - minv) / 255.0
    scale = np.where(scale > 1e-12, scale, 1.0).astype(np.float32)
    codes = np.clip(
        np.rint((x - minv[:, None]) / scale[:, None]), 0, 255
    ).astype(np.uint8)
    return codes, scale, minv.astype(np.float32)


class ShardedBruteForce:
    """Exact/quantized search over a corpus row-sharded across a device mesh.

    The multi-chip counterpart of :class:`~velesdb_tpu.index.brute.
    BruteForceIndex` — same masked-top-k semantics, corpus capacity × S
    (× 4 more in ``sq8`` mode, × 2 in ``bf16``).
    """

    def __init__(self, mesh: Mesh, dim: int, metric: DistanceMetric,
                 storage_mode: StorageMode = StorageMode.FULL):
        self.mesh = mesh
        self.dim = dim
        self.metric = DistanceMetric.parse(metric)
        self.storage_mode = StorageMode.parse(storage_mode)
        if self.storage_mode not in (
            StorageMode.FULL, StorageMode.BF16, StorageMode.F16, StorageMode.SQ8
        ):
            raise ValueError(
                f"sharded engine does not support mode {self.storage_mode}"
            )
        self.n = 0
        self.n_pad = 0
        self._corpus = None  # [N_pad, D] f32/bf16 (full/half modes)
        self._codes = None  # [N_pad, D] uint8 (sq8)
        self._scale = None  # [N_pad] f32
        self._minv = None  # [N_pad] f32
        self._cnorm = None  # [N_pad] f32 metric-specific corpus norms
        self._valid = None
        # int8-assist shadow (FULL mode, D < 512 — serve-path parity with
        # the single-chip default): (rows8 [N_pad, D_pad128] i8,
        # scale2 [N_pad], minv2 [N_pad], pen [N_pad]), all row-sharded
        self._assist = None
        self._assist_chunk = 0  # max coarse-scan chunk (n_local multiple)

    def rebuild(self, corpus: np.ndarray, valid: np.ndarray | None = None) -> None:
        n = corpus.shape[0]
        if valid is None:
            valid = np.ones(n, bool)
        self.n = n
        corpus = np.asarray(corpus, np.float32)
        mode = self.storage_mode
        if mode is StorageMode.SQ8:
            codes, scale, minv = _sq8_quantize_host(corpus)
            deq_sq = np.sum(
                (codes.astype(np.float32) * scale[:, None] + minv[:, None]) ** 2,
                axis=1,
            )
            self._codes = shard_rows(self.mesh, codes)
            self.n_pad = self._codes.shape[0]
            pad = self.n_pad - n
            self._scale = shard_rows(self.mesh, np.pad(scale, (0, pad)))
            self._minv = shard_rows(self.mesh, np.pad(minv, (0, pad)))
            cnorm = _metric_cnorm(deq_sq, self.metric)
            self._cnorm = shard_rows(self.mesh, np.pad(cnorm, (0, pad)))
        else:
            dtype = {
                StorageMode.FULL: np.float32,
                StorageMode.F16: np.float16,
                StorageMode.BF16: jnp.bfloat16,
            }[mode]
            self._assist = None
            build_assist = mode is StorageMode.FULL and self.dim < 512
            if build_assist and self.metric is DistanceMetric.COSINE:
                # cosine scoring is normalization-invariant: store the
                # scored copy pre-normalized (single-chip brute does the
                # same) so the assist rerank's raw dots are cosine scores
                nrm = np.linalg.norm(corpus, axis=1, keepdims=True)
                corpus = corpus / np.maximum(nrm, 1e-30)
            if build_assist:
                # per-shard rows must be a multiple of the coarse-scan
                # chunk (max 8192, power of two — smaller chunks divide it)
                s = self.mesh.shape["rows"]
                self._assist_chunk = 8192
                n_local = -(-max(n, 1) // s)
                n_local = -(-n_local // self._assist_chunk) * self._assist_chunk
                n_tgt = s * n_local
                corpus = np.pad(corpus, ((0, n_tgt - n), (0, 0)))
                valid = np.pad(np.asarray(valid, bool), (0, n_tgt - n))
            sqn = np.sum(corpus * corpus, axis=1)
            self._corpus = shard_rows(self.mesh, corpus.astype(dtype))
            self.n_pad = self._corpus.shape[0]
            pad = self.n_pad - corpus.shape[0]
            # streamed_topk wants SQUARED norms for every metric
            self._cnorm = shard_rows(self.mesh, np.pad(sqn, (0, pad)))
            if build_assist:
                valid_p = valid  # already padded to n_pad
                codes, scale, minv = _sq8_quantize_host(corpus)
                d_pad = ((self.dim + 127) // 128) * 128
                rows8 = np.zeros((self.n_pad, d_pad), np.int8)
                rows8[:, : self.dim] = codes.astype(np.int16) - 128
                deq_sq = np.sum(
                    (codes.astype(np.float32) * scale[:, None]
                     + minv[:, None]) ** 2,
                    axis=1,
                )
                if self.metric is DistanceMetric.COSINE:
                    inv = np.where(
                        deq_sq > 1e-30, 1.0 / np.sqrt(np.maximum(deq_sq, 1e-30)), 0.0
                    )
                    scale2, minv2 = scale * inv, minv * inv
                    pen_base = np.zeros(self.n_pad, np.float32)
                elif self.metric is DistanceMetric.EUCLIDEAN:
                    scale2, minv2 = scale, minv
                    pen_base = deq_sq.astype(np.float32)
                else:
                    scale2, minv2 = scale, minv
                    pen_base = np.zeros(self.n_pad, np.float32)
                pen = np.where(valid_p, pen_base, np.inf).astype(np.float32)
                self._assist = (
                    shard_rows(self.mesh, rows8),
                    shard_rows(self.mesh, scale2.astype(np.float32)),
                    shard_rows(self.mesh, minv2.astype(np.float32)),
                    shard_rows(self.mesh, pen, pad_value=np.inf),
                )
        self._valid = shard_rows(
            self.mesh, np.pad(np.asarray(valid, bool), (0, self.n_pad - valid.shape[0]))
        )

    def search(self, queries, k: int, mask: np.ndarray | None = None,
               chunk: int = 65536):
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
        if self.storage_mode is StorageMode.SQ8:
            vals, idx = _sharded_search_sq8(
                qd, self._codes, self._scale, self._minv, self._cnorm,
                self._valid, md, mesh=self.mesh, k=k, metric=self.metric,
                chunk=chunk,
            )
        elif self._assist is not None and self._assist_serves(b_pad, k):
            from velesdb_tpu.ops.bucket_kernel import bucket_chunk_for
            from velesdb_tpu.ops.pallas_kernels import use_pallas

            d_pad = ((self.dim + 127) // 128) * 128
            m = min(max(2 * k - 4, 16), 256)
            vals, idx = _sharded_search_assist(
                qd, *self._assist, self._corpus, md,
                mesh=self.mesh, k=k, m=m, metric=self.metric,
                chunk=min(
                    bucket_chunk_for(b_pad, d_pad, 1,
                     self.n_pad // self.mesh.shape["rows"]),
                 self._assist_chunk
                ),
                interpret=not use_pallas(),
            )
        else:
            vals, idx = _sharded_search_streamed(
                qd, self._corpus, self._valid, self._cnorm, md,
                mesh=self.mesh, k=k, metric=self.metric, chunk=chunk,
            )
        return np.asarray(vals)[:b], np.asarray(idx)[:b]

    def _assist_serves(self, b_pad: int, k: int) -> bool:
        """Per-call guard mirroring the single-chip serve split: the
        oversample must cover k and the per-shard bucket count must keep
        the coarse collision loss under ~1% (``index.brute._bucket_safe``
        semantics on the LOCAL shard size)."""
        from velesdb_tpu.index.brute import _SQ8I_OK, _bucket_safe
        from velesdb_tpu.ops.bucket_kernel import bucket_chunk_for

        if not _SQ8I_OK[0]:
            return False
        n_local = self.n_pad // self.mesh.shape["rows"]
        d_pad = ((self.dim + 127) // 128) * 128
        chunk = min(bucket_chunk_for(b_pad, d_pad, 1,
                     self.n_pad // self.mesh.shape["rows"]),
                 self._assist_chunk)
        m = min(max(2 * k - 4, 16), 256)
        return m >= k and _bucket_safe(n_local, chunk, m)


def _metric_cnorm(deq_sq: np.ndarray, metric: DistanceMetric) -> np.ndarray:
    """``sq8_streamed_topk`` cnorm conventions: euclidean -> squared norms,
    cosine -> norms, dot -> zeros."""
    if metric is DistanceMetric.EUCLIDEAN:
        return deq_sq.astype(np.float32)
    if metric is DistanceMetric.COSINE:
        return np.sqrt(deq_sq).astype(np.float32)
    return np.zeros_like(deq_sq, dtype=np.float32)


def sharded_ingest_search_step(mesh: Mesh, dim: int, metric: DistanceMetric):
    """Return a jitted full ingest+search step over the mesh (the vector-DB
    analog of a "training step": mutate the sharded corpus buffer, then run a
    sharded query batch against it).

    Returns ``step(corpus, valid, new_rows, write_pos, queries, k) ->
    (corpus', valid', values, indices)`` where ``corpus [N, D]`` is
    row-sharded, ``new_rows [R, D]`` is replicated, ``queries [B, D]`` is
    dp-sharded. Buffer donation keeps the corpus update in-place in HBM; the
    search half runs the streamed per-shard engine (round-2 selection).
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
            lv, lidx = streamed_topk(
                q, c, valid=v, k=min(k, n_local), metric=metric,
                chunk=min(65536, n_local),
            )
            mv, mi = _merge_partials(
                lv, lidx, n_local, k, metric.higher_is_better
            )
            return c, v, mv, mi

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
