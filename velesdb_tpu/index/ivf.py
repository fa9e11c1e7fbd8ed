"""IVF partitioned ANN index: k-means routing + partition-block scoring.

The second ANN engine next to the beam-search graph (``graph_index.py``), and
the one that actually fits TPU economics: on MXU hardware, *exact* streaming
search wins throughput whenever the batch is large (every HBM read is shared
by the whole batch), while graph traversal is expansion-latency-bound. What a
TPU index must optimize is the **small-batch / large-N** regime — read less
than the whole corpus per query. IVF does exactly that:

- **build**: Lloyd k-means on device (batched assign = one matmul per chunk);
  rows reorder into uniform padded partitions ``[C, L, D]`` so every gather
  is a fixed-shape contiguous block (no pointer chasing, no host round trip).
- **search**: one ``[B, C]`` matmul routes each query to its top-``nprobe``
  partitions; a ``lax.scan`` over probes gathers ``[B, L, D]`` blocks,
  scores them on the MXU, and merges a running top-k. HBM read per query =
  ``nprobe * L`` rows instead of ``N``.

Reference counterpart: the HNSW role of ``index/hnsw/`` (SURVEY.md §2.2) —
this is the same contract (approximate top-k with a recall/probe knob), but
the data structure is chosen for the MXU + HBM cost model instead of a CPU
cache hierarchy. The recall knob ``nprobe`` maps from ef via
``SearchQuality`` exactly like the reference's quality profiles.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from velesdb_tpu.index.params import SearchQuality
from velesdb_tpu.ops.distance import DistanceMetric
from velesdb_tpu.ops.quantization import SQ8Vectors
from velesdb_tpu.ops.topk import top_k

__all__ = ["IvfIndex", "kmeans", "ivf_search_impl", "ivf_self_knn", "merge_ranked", "nn_descent_round"]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


_KM_CHUNK = 65536  # rows scored per assignment step (bounds [chunk, k] VMEM)

_IVF_KERNEL_OK = [True]  # probe-kernel kill switch (scoped to the kernel only)


@functools.partial(jax.jit, static_argnames=("k", "iters"))
def _kmeans_device(xc, *, init, k, iters):
    """Lloyd iterations with chunked assignment.

    ``xc [n_chunks, CHUNK, D]``. Assignment never materializes ``[N, k]`` —
    each scan step scores one chunk (matmul) and scatter-adds into the
    per-cluster sums/counts, so memory is O(chunk*k + k*D) at any N.
    """

    def assign_chunk(cents, cc, blk):
        d = blk @ cents.T - 0.5 * cc[None, :]
        return jnp.argmax(d, axis=1)

    def step(cents, _):
        cc = jnp.sum(cents * cents, axis=1)

        def chunk_body(carry, blk):
            sums, counts = carry
            a = assign_chunk(cents, cc, blk)
            sums = sums.at[a].add(blk)
            counts = counts.at[a].add(1.0)
            return (sums, counts), None

        (sums, counts), _ = jax.lax.scan(
            chunk_body,
            (jnp.zeros((k, xc.shape[2]), xc.dtype), jnp.zeros(k, xc.dtype)),
            xc,
        )
        new = jnp.where(
            counts[:, None] > 0, sums / jnp.maximum(counts[:, None], 1.0), cents
        )
        return new, None

    cents, _ = jax.lax.scan(step, init, None, length=iters)
    cc = jnp.sum(cents * cents, axis=1)

    def final_chunk(_, blk):
        return None, assign_chunk(cents, cc, blk)

    _, assign = jax.lax.scan(final_chunk, None, xc)
    return cents, assign.reshape(-1)


def kmeans(
    x,
    k: int,
    iters: int = 8,
    seed: int = 0,
    train_sample: int | None = 262_144,
):
    """Device k-means; returns ``(centroids [k, D], assign [N])``.

    Lloyd runs on a training SAMPLE (faiss-style — centroid quality
    saturates long before full-data training pays for itself), then ONE
    chunked assignment pass covers the full corpus. ``x`` may already be a
    device array — padding/reshaping/sampling all happen on device (the
    corpus is transferred at most once).
    """
    x = jnp.asarray(x, jnp.float32)
    n, d = x.shape
    rng = np.random.default_rng(seed)
    if train_sample is not None:
        # keep >=32 training points per centroid: the fixed 256K sample is
        # 8/centroid at the 31K-partition builds (r3d uncapped build kNN),
        # which leaves most centroids at their init row
        train_sample = max(train_sample, 32 * k)
    init = x[jnp.asarray(rng.choice(n, size=k, replace=n < k))]

    def to_chunks(arr):
        m = arr.shape[0]
        chunk = min(_KM_CHUNK, _round_up(m, 8))
        m_pad = _round_up(m, chunk)
        if m_pad != m:
            # padded rows repeat row 0 (zero-rows would gravitate a centroid
            # to the origin; repeats just reinforce an existing cluster)
            arr = jnp.concatenate(
                [arr, jnp.broadcast_to(arr[0], (m_pad - m, d))]
            )
        return arr.reshape(-1, chunk, d)

    if train_sample is not None and n > train_sample:
        sample = x[jnp.asarray(rng.choice(n, size=train_sample, replace=False))]
        cents, _ = _kmeans_device(to_chunks(sample), init=init, k=k, iters=iters)
        assign = _assign_full(to_chunks(x), cents, k=k)[:n]
        return cents, assign
    cents, assign = _kmeans_device(to_chunks(x), init=init, k=k, iters=iters)
    return cents, assign[:n]


@functools.partial(jax.jit, static_argnames=("s", "chunk"))
def _assign_topk_chunked(xc, cents, *, s, chunk):
    cc = jnp.sum(cents * cents, axis=1)

    def body(_, blk):
        d = blk @ cents.T - 0.5 * cc[None, :]
        _, i = jax.lax.top_k(d, s)
        return None, i

    _, idx = jax.lax.scan(body, None, xc)
    return idx.reshape(-1, s)


def _assign_topk(x, cents, *, s):
    """Top-``s`` nearest centroids per row (spill assignment)."""
    n, d = x.shape
    chunk = min(_KM_CHUNK, _round_up(n, 8))
    n_pad = _round_up(n, chunk)
    if n_pad != n:
        x = jnp.concatenate([x, jnp.broadcast_to(x[0], (n_pad - n, d))])
    out = _assign_topk_chunked(
        x.reshape(-1, chunk, d), cents, s=s, chunk=chunk
    )
    return out[:n]


@functools.partial(jax.jit, static_argnames=("k",))
def _assign_full(xc, cents, *, k):
    cc = jnp.sum(cents * cents, axis=1)

    def chunk(_, blk):
        return None, jnp.argmax(blk @ cents.T - 0.5 * cc[None, :], axis=1)

    _, assign = jax.lax.scan(chunk, None, xc)
    return assign.reshape(-1)


#: routing sentinel carried in ``cent_sq`` for PADDED partitions (the
#: bucket-rounding slots past the real count, see :func:`_bucket_n_parts`):
#: euclidean routing subtracts ``0.5*cent_sq`` so pads score -5e29; the
#: other metrics mask ``cent_sq >= _PAD_CENT_SQ/2`` columns to -inf
#: explicitly at every routing site.
_PAD_CENT_SQ = 1e30


def _route_mask(route, cent_sq):
    """-inf out padded-partition columns of a ``[B, P]`` routing score."""
    return jnp.where(cent_sq[None, :] >= _PAD_CENT_SQ * 0.5, -jnp.inf, route)


@functools.partial(jax.jit, static_argnames=("c", "L", "n_parts"))
def _group_map(assign, cents, rows_global, *, c, L, n_parts):
    """Partition gather map: sort rows by cluster, derive dest->src (scatter
    of N ints — payload arrays are gathered by the caller, so the map works
    for ANY row-aligned payload: f32 rows, uint8 codes, affine params).

    ``n_parts`` may exceed the exact data-dependent count (bucket rounding
    for compile reuse): trailing partitions past the real total are all-pad
    (``part_rows = -1``) and carry ``cent_sq = _PAD_CENT_SQ`` so routing
    never probes them."""
    n = assign.shape[0]
    order = jnp.argsort(assign)
    sorted_assign = assign[order]
    counts = jnp.bincount(assign, length=c)
    splits = jnp.maximum(-(-counts // L), 1)
    total = jnp.cumsum(splits)[-1]
    base_part = jnp.concatenate([jnp.zeros(1, splits.dtype), jnp.cumsum(splits)[:-1]])
    starts = jnp.concatenate([jnp.zeros(1, counts.dtype), jnp.cumsum(counts)[:-1]])
    pos_within = jnp.arange(n) - starts[sorted_assign]
    dest = (base_part[sorted_assign] + pos_within // L) * L + pos_within % L
    src = jnp.full(n_parts * L, -1, jnp.int32).at[dest].set(order.astype(jnp.int32))
    ok = src >= 0
    part_rows = jnp.where(ok, rows_global[jnp.maximum(src, 0)], -1).reshape(
        n_parts, L
    )
    # routing: partition p belongs to the cluster whose split range covers it
    cluster_of_part = jnp.searchsorted(
        jnp.cumsum(splits), jnp.arange(n_parts), side="right"
    )
    pad = jnp.arange(n_parts) >= total
    route_cents = jnp.where(
        pad[:, None], 0.0, cents[jnp.minimum(cluster_of_part, c - 1)]
    )
    cent_sq = jnp.where(
        pad, _PAD_CENT_SQ, jnp.sum(route_cents * route_cents, axis=1)
    )
    return route_cents, cent_sq, src, ok, part_rows


def _exact_n_parts(assign, c: int, L: int) -> int:
    """Actual partition count: every cluster owns ceil(count/L) >= 1
    partitions. ONE scalar D2H readback at build time replaces the static
    worst-case bound ``c + n//L + 1`` (every cluster splitting), which at
    capacity allocates ~2x the slots actually used — e.g. 14,986 vs ~10K
    partitions (7.9GB vs ~5.3GB) on a 5M x 768D SQ8 build. Reassembly at
    load recomputes the same assignment, so the count stays deterministic."""
    counts = jnp.bincount(assign, length=c)
    return int(jnp.sum(jnp.maximum(-(-counts // L), 1)))


def _bucket_n_parts(raw: int) -> int:
    """Round UP to a ~1/16-granularity grid (next multiple of
    ``2^(bit_length-5)``) — the data-dependent FALLBACK of
    :func:`_padded_n_parts` for heavily skewed assignments."""
    if raw <= 128:
        return raw
    step = 1 << max(raw.bit_length() - 5, 3)
    return -(-raw // step) * step


def _padded_n_parts(raw: int, c: int) -> int:
    """Padded partition count with a SHAPE-DETERMINISTIC fast path, so the
    big jitted assembly/probe/self-kNN programs — all shaped by
    ``n_parts`` — hit the compile cache across kmeans seeds and same-scale
    rebuilds. A fresh 1M x 128D graph build runs TWO kNN passes with
    different seeds whose exact counts differ by a handful of partitions;
    without padding, each pass recompiles every n_parts-shaped program
    (~90s of the measured 192s build, r4 profile).

    The split count (clusters holding > L rows) is data-dependent, so any
    rule keyed on ``raw`` alone can straddle a grid boundary between seeds
    (measured: 247 vs 249 at 60K rows). Instead, whenever the exact count
    fits inside a 12.5% headroom over the cluster count — empirically
    splits run ~5-7% with the default pack_factor 2.0 — the padded count
    depends ONLY on ``c``: guaranteed shape reuse. Heavier skew falls back
    to the bucketed exact count (still reuse-friendly, not guaranteed).
    Pad partitions are all-dead rows; the ``cent_sq`` sentinel keeps them
    out of every probe top-k, and ``c_real`` caps nprobe."""
    det = c + max(16, c // 8)
    if raw <= det:
        return det
    return _bucket_n_parts(raw)


#: pad-slot HBM budget: the deterministic headroom never allocates more
#: than this many bytes of empty partition slots (a 12.5% headroom at a
#: 10M x 768D SQ8 capacity build would otherwise cost ~1.9GB of the 16GB
#: chip — the margin the exact count exists to protect)
_PAD_BYTES_BUDGET = 256 * 1024 * 1024


def _padded_n_parts_capped(raw: int, c: int, n_rows: int, L: int,
                           row_bytes: int = 4) -> int:
    """:func:`_padded_n_parts` with two shape-deterministic caps: the
    physical worst case (splits cannot exceed ``n//L`` — tiny indexes
    never pad past the static bound the exact count exists to beat) and
    the pad-slot HBM budget (capacity builds keep their memory margin;
    a tighter headroom falls back to the bucketed grid past it)."""
    worst = c + n_rows // max(L, 1) + 1
    max_pad = max(16, _PAD_BYTES_BUDGET // max(L * row_bytes, 1))
    if c // 8 <= max_pad:
        padded = _padded_n_parts(raw, c)
    else:  # budget-tightened headroom: same rule, smaller deterministic pad
        det = c + max(16, max_pad)
        padded = det if raw <= det else _bucket_n_parts(raw)
    return min(padded, max(worst, raw))


def _parts_per_block(L: int, n_parts: int) -> int:
    """Partitions gathered per assembly step: bounds the per-step
    intermediates (gathered rows + f32 dequant for norms + pack planes,
    ~6 f32-equivalents/row-byte) to ~131K rows so a capacity-scale build
    never materializes the whole ``[P*L, D]`` payload twice — 5M x 768D
    SQ8 builds peak at source + destination + ~0.7GB transient."""
    return min(n_parts, max(1, 131_072 // max(L, 1)))


@functools.partial(jax.jit, static_argnames=("c", "L", "n_parts"))
def _group_partitions(live, assign, cents, rows_global, *, c, L, n_parts):
    """f32 partition assembly: gather map + blocked row gathers + norms.

    The payload gather runs blockwise into a scan carry (XLA aliases carry
    buffers in place), so peak HBM is source + destination + one ~block —
    NOT source + a second full-size gather intermediate + destination,
    which OOMs a 16GB chip at 5M-row builds."""
    route_cents, cent_sq, src, ok, part_rows = _group_map(
        assign, cents, rows_global, c=c, L=L, n_parts=n_parts
    )
    d = live.shape[1]
    safe = jnp.maximum(src, 0).reshape(n_parts, L)
    okr = ok.reshape(n_parts, L)
    pb = _parts_per_block(L, n_parts)
    nb = -(-n_parts // pb)

    def body(carry, i):
        parts, psq = carry
        start = jnp.minimum(i * pb, n_parts - pb)  # tail overlap: same data
        s_i = jax.lax.dynamic_slice(safe, (start, 0), (pb, L)).reshape(-1)
        o_i = jax.lax.dynamic_slice(okr, (start, 0), (pb, L)).reshape(-1)
        blk = jnp.where(o_i[:, None], live[s_i], 0.0)
        sq_i = jnp.sum(blk * blk, axis=1)
        parts = jax.lax.dynamic_update_slice(
            parts, blk.reshape(pb, L, d), (start, 0, 0)
        )
        psq = jax.lax.dynamic_update_slice(
            psq, sq_i.reshape(pb, L), (start, 0)
        )
        return (parts, psq), None

    (parts, part_sq), _ = jax.lax.scan(
        body,
        (
            jnp.zeros((n_parts, L, d), live.dtype),
            jnp.zeros((n_parts, L), jnp.float32),
        ),
        jnp.arange(nb),
    )
    return route_cents, cent_sq, parts, part_rows, part_sq


def _pack_words_2d(cd):
    """``[M, D] uint8`` -> ``[M, D_pad/4] int32`` block-packed words (same
    dim-block-major layout as :func:`ops.bucket_kernel.sq8_pack_blocked`:
    plane j = dims ``[j*D_pad/4, (j+1)*D_pad/4)``)."""
    m, d = cd.shape
    d_pad = _round_up(d, 4)
    c = jnp.pad(cd, ((0, 0), (0, d_pad - d))).astype(jnp.uint32)
    planes = c.reshape(m, 4, d_pad // 4)
    w = (
        planes[:, 0]
        | (planes[:, 1] << 8)
        | (planes[:, 2] << 16)
        | (planes[:, 3] << 24)
    )
    return w.astype(jnp.int32)


def sq8_unpack_words(w, dtype=jnp.bfloat16):
    """``[..., W] int32`` words -> ``[..., W*4]`` code values 0..255
    (integers <=255 are exact in bf16). Inverse of :func:`_pack_words_2d`
    up to the dim padding (padded dims unpack to code 0, which scores as 0
    against zero-padded query dims)."""
    planes = [
        jnp.bitwise_and(
            jax.lax.shift_right_logical(w, jnp.int32(8 * j)), jnp.int32(0xFF)
        ).astype(dtype)
        for j in range(4)
    ]
    return jnp.concatenate(planes, axis=-1)


@functools.partial(jax.jit, static_argnames=("c", "L", "n_parts"))
def _group_partitions_sq8(codes, scale, minv, assign, cents, rows_global, *,
                          c, L, n_parts):
    """SQ8 partition assembly: codes stay 1 byte/dim end-to-end (a
    [P, L, D] f32 copy would be 4x the HBM — the whole point of quantized
    partitions), stored as block-packed int32 WORDS ``[P, L, D_pad/4]`` —
    the layout both the XLA probing path (4x fewer gather indices) and the
    Pallas probe kernel consume (Mosaic has no u8->f32 cast; i32
    shifts/masks lower). Payload gathered blockwise into the scan carry
    (see :func:`_group_partitions` — same peak-HBM reasoning, which is what
    lets a 5M x 768D quantized build fit next to its source codes)."""
    route_cents, cent_sq, src, ok, part_rows = _group_map(
        assign, cents, rows_global, c=c, L=L, n_parts=n_parts
    )
    d = codes.shape[1]
    w_pad = _round_up(d, 4) // 4
    safe = jnp.maximum(src, 0).reshape(n_parts, L)
    okr = ok.reshape(n_parts, L)
    pscale = jnp.where(okr, scale[safe.reshape(-1)].reshape(n_parts, L), 0.0)
    pminv = jnp.where(okr, minv[safe.reshape(-1)].reshape(n_parts, L), 0.0)
    pb = _parts_per_block(L, n_parts)
    nb = -(-n_parts // pb)

    def body(carry, i):
        pwords, psq = carry
        start = jnp.minimum(i * pb, n_parts - pb)  # tail overlap: same data
        s_i = jax.lax.dynamic_slice(safe, (start, 0), (pb, L)).reshape(-1)
        o_i = jax.lax.dynamic_slice(okr, (start, 0), (pb, L)).reshape(-1)
        sc_i = jax.lax.dynamic_slice(pscale, (start, 0), (pb, L)).reshape(-1)
        mn_i = jax.lax.dynamic_slice(pminv, (start, 0), (pb, L)).reshape(-1)
        cd = jnp.where(o_i[:, None], codes[s_i], jnp.uint8(0))
        deq = cd.astype(jnp.float32) * sc_i[:, None] + mn_i[:, None]
        sq_i = jnp.sum(deq * deq, axis=1)
        pwords = jax.lax.dynamic_update_slice(
            pwords, _pack_words_2d(cd).reshape(pb, L, w_pad), (start, 0, 0)
        )
        psq = jax.lax.dynamic_update_slice(
            psq, sq_i.reshape(pb, L), (start, 0)
        )
        return (pwords, psq), None

    (pwords, psq), _ = jax.lax.scan(
        body,
        (
            jnp.zeros((n_parts, L, w_pad), jnp.int32),
            jnp.zeros((n_parts, L), jnp.float32),
        ),
        jnp.arange(nb),
    )
    return route_cents, cent_sq, pwords, pscale, pminv, part_rows, psq


@functools.partial(jax.jit, static_argnames=("s", "cosine"))
def _assign_topk_sq8(codes, scale, minv, cents, *, s, cosine):
    """Top-``s`` centroids per SQ8 row, dequantizing chunk-by-chunk (the
    full f32 corpus never materializes). Full chunks scan IN PLACE via
    dynamic slices — padding the whole code array to a chunk multiple
    would copy the full 3.6GB source at capacity for a <66K-row tail."""
    n, d = codes.shape
    cc = jnp.sum(cents * cents, axis=1)
    chunk = min(_KM_CHUNK, n)
    nf = n // chunk

    def score(cd, sc, mn):
        x = cd.astype(jnp.float32) * sc[:, None] + mn[:, None]
        if cosine:
            x = x / jnp.maximum(jnp.linalg.norm(x, axis=1, keepdims=True), 1e-30)
        aff = x @ cents.T - 0.5 * cc[None, :]
        _, i = jax.lax.top_k(aff, s)
        return i

    def body(_, ci):
        cd = jax.lax.dynamic_slice(codes, (ci * chunk, 0), (chunk, d))
        sc = jax.lax.dynamic_slice(scale, (ci * chunk,), (chunk,))
        mn = jax.lax.dynamic_slice(minv, (ci * chunk,), (chunk,))
        return None, score(cd, sc, mn)

    _, idx = jax.lax.scan(body, None, jnp.arange(nf, dtype=jnp.int32))
    idx = idx.reshape(-1, s)
    tail = n - nf * chunk
    if tail:
        ti = score(codes[nf * chunk:], scale[nf * chunk:], minv[nf * chunk:])
        idx = jnp.concatenate([idx, ti], axis=0)
    return idx


class IvfIndex:
    """Inverted-file ANN over uniform padded partitions."""

    def __init__(
        self,
        dim: int,
        metric: DistanceMetric,
        n_clusters: int | None = None,
        kmeans_iters: int = 8,
        kmeans_seed: int = 0,
        spill: int = 1,
        pack_factor: float = 2.0,
    ):
        self.dim = dim
        self.metric = DistanceMetric.parse(metric)
        if self.metric not in (
            DistanceMetric.COSINE,
            DistanceMetric.EUCLIDEAN,
            DistanceMetric.DOT_PRODUCT,
        ):
            raise ValueError(f"IVF does not support metric {self.metric}")
        self.n_clusters = n_clusters
        self.kmeans_iters = kmeans_iters
        self.kmeans_seed = kmeans_seed
        # spill assignment: each row lands in its ``spill`` nearest
        # partitions (2 = double memory, much higher recall per probe —
        # kmeans cell boundaries cutting true neighborhoods are THE recall
        # limiter on this probing scheme). Search dedups duplicates.
        self.spill = max(1, int(spill))
        # partition slot budget: L = pack_factor * mean occupancy. Total
        # slots ~ (1 + pack_factor/2) * 1.5... precisely c*L + N_rows: 2.0
        # (default) wastes ~2x N for near-zero split counts; capacity
        # deployments use 1.0-1.2 (more splits, same routing exactness)
        self.pack_factor = float(pack_factor)
        self.n = 0
        self.c = 0  # padded partition count == array leading dim
        self.c_real = 0  # exact live-partition count (nprobe cap basis)
        self.part_len = 0
        self._centroids = None  # [C, D]
        self._cent_sq = None  # [C]
        self._parts = None  # [C, L, D] f32 — or [C, L, D_pad/4] i32 words (sq8)
        self._part_scale = None  # [C, L] f32 (sq8 storage)
        self._part_minv = None  # [C, L] f32 (sq8 storage)
        self._part_rows = None  # [C, L] int32 original row ids, -1 pad
        self._part_sq = None  # [C, L] squared (deq) norms
        self._kmeans_cents = None  # [c, D] device — persistence recipe
        self._kmeans_c = 0
        self._kern = None  # folded (scale2, minv2, pen, flat_rows) probe-kernel state
        self.storage = "f32"  # 'sq8' when built from SQ8Vectors (4x rows)
        self._dirty = True

    # -- build ----------------------------------------------------------------

    def build(self, corpus, valid: np.ndarray | None = None,
              profile: dict | None = None) -> None:
        import time as _time

        def _mark(stage, t0, sync=None):
            if profile is not None:
                if sync is not None:
                    jax.block_until_ready(sync)
                profile[stage] = (
                    profile.get(stage, 0.0) + _time.perf_counter() - t0
                )
            return _time.perf_counter()

        t = _time.perf_counter()
        if not isinstance(corpus, (jax.Array, SQ8Vectors)):
            corpus = np.asarray(corpus, np.float32)
        n = (
            corpus.codes.shape[0]
            if isinstance(corpus, SQ8Vectors)
            else corpus.shape[0]
        )
        if valid is None:
            valid = np.ones(n, bool)
        rows = np.flatnonzero(valid)
        self.n = n
        if len(rows) == 0:
            self._dirty = False
            return
        # ~256 rows per cluster, capped so the routing matmul stays small;
        # 8192 keeps partitions near mean occupancy out to ~2M rows (beyond
        # that L grows linearly and nprobe cost with it)
        c = self.n_clusters or max(1, min(len(rows) // 256, 8192))
        c = min(c, len(rows))
        self.c = c
        if isinstance(corpus, SQ8Vectors):
            # quantized-storage IVF (the ANN engine at one-chip capacity —
            # 10M x 768D of codes fits where f32 cannot): kmeans trains on a
            # dequantized SAMPLE; assignment + partitions stay uint8
            self.storage = "sq8"
            self._build_sq8(corpus, rows, c, profile=profile)
            self._dirty = False
            return
        self.storage = "f32"
        if isinstance(corpus, jax.Array):  # device gather, zero host traffic
            if len(rows) == corpus.shape[0]:  # all-true mask: rows is arange
                live_dev = corpus.astype(jnp.float32)
            else:
                live_dev = corpus[jnp.asarray(rows)].astype(jnp.float32)
        else:
            live_dev = jax.device_put(jnp.asarray(corpus[rows]))  # ONE transfer
        if self.metric is DistanceMetric.COSINE:
            nrm = jnp.linalg.norm(live_dev, axis=1, keepdims=True)
            km_input = live_dev / jnp.maximum(nrm, 1e-30)
        else:
            km_input = live_dev
        t = _mark("partition.gather", t, km_input)
        cents, assign = kmeans(km_input, c, iters=self.kmeans_iters, seed=self.kmeans_seed)
        t = _mark("partition.kmeans", t, (cents, assign))
        self._kmeans_cents = cents  # [c, D] device — the persistence recipe
        self._kmeans_c = c
        self._assemble_partitions(live_dev, km_input, rows, cents, c, assign,
                                  profile=profile)
        _mark("partition.group", t, self._parts)
        self._dirty = False

    def _build_sq8(self, sq: SQ8Vectors, rows: np.ndarray, c: int,
                   profile: dict | None = None) -> None:
        if len(rows) == sq.codes.shape[0]:
            # flatnonzero over an all-true mask — rows IS arange(n); skip
            # the row gather (a full-corpus copy that matters at capacity:
            # 3.6GB extra at 5M x 768D)
            codes = jnp.asarray(sq.codes)
            scale = jnp.asarray(sq.scale, jnp.float32)
            minv = jnp.asarray(sq.minv, jnp.float32)
        else:
            codes = jnp.asarray(sq.codes)[jnp.asarray(rows)]
            scale = jnp.asarray(sq.scale, jnp.float32)[jnp.asarray(rows)]
            minv = jnp.asarray(sq.minv, jnp.float32)[jnp.asarray(rows)]
        n_live = codes.shape[0]
        rng = np.random.default_rng(self.kmeans_seed)
        # >=32 training points per centroid (mirrors kmeans()'s floor —
        # this path passes train_sample=None, so scale the sample here)
        take = min(max(262_144, 32 * c), n_live)
        sample = jnp.asarray(rng.choice(n_live, size=take, replace=False))
        deq_sample = (
            codes[sample].astype(jnp.float32)
            * scale[sample][:, None]
            + minv[sample][:, None]
        )
        cosine = self.metric is DistanceMetric.COSINE
        if cosine:
            deq_sample = deq_sample / jnp.maximum(
                jnp.linalg.norm(deq_sample, axis=1, keepdims=True), 1e-30
            )
        cents, _ = kmeans(
            deq_sample, c, iters=self.kmeans_iters, seed=self.kmeans_seed,
            train_sample=None,
        )
        # free the dequantized training sample (768MB at capacity) BEFORE
        # assembly — holding it through the partition build is the
        # difference between fitting and OOM at 5M x 768D
        del deq_sample, sample
        cents = jax.block_until_ready(cents)
        self._kmeans_cents = cents
        self._kmeans_c = c
        self._assemble_sq8(codes, scale, minv, rows, cents, c,
                           profile=profile)

    def build_from_centroids(self, sq: SQ8Vectors, valid: np.ndarray,
                             cents, profile: dict | None = None) -> None:
        """Assemble SQ8 partitions against GIVEN centroids, skipping the
        kmeans. Used by the graph engine's entry IVF: the approx-kNN
        build's router is already a k-means clustering of the same corpus,
        so its centroids seed the entry IVF for the cost of assembly alone
        (the kmeans re-run tripled the 100Kx768 graph build time)."""
        n = sq.codes.shape[0]
        rows = np.flatnonzero(np.asarray(valid, bool)[:n])
        self.n = n
        if len(rows) == 0:
            self._dirty = False
            return
        self.storage = "sq8"
        cents_dev = jax.device_put(jnp.asarray(cents, jnp.float32))
        self._kmeans_cents = cents_dev
        self._kmeans_c = int(cents_dev.shape[0])
        if len(rows) == n:
            codes = jnp.asarray(sq.codes)
            scale = jnp.asarray(sq.scale, jnp.float32)
            minv = jnp.asarray(sq.minv, jnp.float32)
        else:
            ridx = jnp.asarray(rows)
            codes = jnp.asarray(sq.codes)[ridx]
            scale = jnp.asarray(sq.scale, jnp.float32)[ridx]
            minv = jnp.asarray(sq.minv, jnp.float32)[ridx]
        self._assemble_sq8(codes, scale, minv, rows, cents_dev,
                           self._kmeans_c, profile=profile)
        self._dirty = False

    def _assemble_sq8(self, codes, scale, minv, rows, cents, c,
                      profile: dict | None = None) -> None:
        import time as _time

        def _mark(stage, t0, sync=None):
            if profile is not None:
                if sync is not None:
                    jax.block_until_ready(sync)
                profile[stage] = (
                    profile.get(stage, 0.0) + _time.perf_counter() - t0
                )
            return _time.perf_counter()

        t = _time.perf_counter()
        cosine = self.metric is DistanceMetric.COSINE
        s = min(self.spill, c) if self.spill > 1 else 1
        top = _assign_topk_sq8(codes, scale, minv, cents, s=s, cosine=cosine)
        if s > 1:
            codes = jnp.tile(codes, (s, 1))
            scale = jnp.tile(scale, (s,))
            minv = jnp.tile(minv, (s,))
            rows = np.tile(rows, s)
            assign = jnp.concatenate([top[:, j] for j in range(s)])
        else:
            assign = top[:, 0]
        L = _round_up(
            max(int(np.ceil(self.pack_factor * len(rows) / c)), 8), 8
        )
        self.part_len = L
        t = _mark("partition.assign", t, assign)
        self.c_real = _exact_n_parts(assign, c, L)
        n_parts = _padded_n_parts_capped(
            self.c_real, c, len(rows), L, row_bytes=max(self.dim, 1)
        )
        self.c = n_parts
        t = _mark("partition.nparts", t)
        (
            self._centroids,
            self._cent_sq,
            self._parts,
            self._part_scale,
            self._part_minv,
            self._part_rows,
            self._part_sq,
        ) = _group_partitions_sq8(
            codes, scale, minv, assign, cents,
            jnp.asarray(rows.astype(np.int32)),
            c=c, L=L, n_parts=n_parts,
        )
        _mark("partition.payload", t, self._parts)
        self._kern = None  # folded probe-kernel state derives lazily

    def _assemble_partitions(self, live_dev, km_input, rows, cents, c,
                             assign=None, profile: dict | None = None) -> None:
        """Deterministic partition assembly from centroids (shared by build
        and load — the persisted artifact is centroids + meta ONLY, so no
        multi-MB device->host readback ever sits on the save path; large
        D2H transfers are the tunnel's wedge-prone operation)."""
        import time as _time

        def _mark(stage, t0, sync=None):
            if profile is not None:
                if sync is not None:
                    jax.block_until_ready(sync)
                profile[stage] = (
                    profile.get(stage, 0.0) + _time.perf_counter() - t0
                )
            return _time.perf_counter()

        t = _time.perf_counter()
        if assign is None:
            assign = _assign_topk(km_input, cents, s=1)[:, 0]
        if self.spill > 1:
            # duplicate each row into its top-``spill`` clusters: one more
            # assignment matmul, 2x partition memory, recall/probe jumps
            s = min(self.spill, c)
            top = _assign_topk(km_input, cents, s=s)  # [n_live, s]
            live_dev = jnp.tile(live_dev, (s, 1))
            rows = np.tile(rows, s)
            assign = jnp.concatenate([top[:, j] for j in range(s)])

        # group rows by cluster into uniform padded partitions, ENTIRELY ON
        # DEVICE (the [n_parts, L, D] tensor never exists on the host — at
        # 1M x 128D that is >1GB of round trip). Skewed clusters split into
        # several partitions that SHARE a routing centroid, bounding padding
        # waste to ~pack_factor x mean occupancy while keeping routing
        # exact; the partition count is the EXACT sum of per-cluster splits
        # (one scalar readback — see _exact_n_parts).
        L = _round_up(
            max(int(np.ceil(self.pack_factor * len(rows) / c)), 8), 8
        )
        self.part_len = L
        t = _mark("partition.assign", t, assign)
        self.c_real = _exact_n_parts(assign, c, L)
        n_parts = _padded_n_parts_capped(
            self.c_real, c, len(rows), L, row_bytes=4 * max(self.dim, 1)
        )
        self.c = n_parts
        t = _mark("partition.nparts", t)
        (
            self._centroids,
            self._cent_sq,
            self._parts,
            self._part_rows,
            self._part_sq,
        ) = _group_partitions(
            live_dev,
            assign,
            cents,
            jnp.asarray(rows.astype(np.int32)),
            c=c,
            L=L,
            n_parts=n_parts,
        )
        _mark("partition.payload", t, self._parts)

    def invalidate(self, _ids=None) -> None:
        self._dirty = True

    @property
    def dirty(self) -> bool:
        return self._dirty

    def nprobe_for(self, ef: int | None, quality=None) -> int:
        """Quality knob: ef budget -> partitions probed.

        Calibrated against measured recall curves (r3, clustered data):
        recall tracks CORPUS COVERAGE ``nprobe*L/N`` — ~3.5% coverage lands
        ~0.95 recall at both 100Kx768D and 1Mx128D (spill=1). The balanced
        profile (ef=128) therefore probes ``0.035*N/L`` partitions; other
        profiles scale linearly in ef (fast ~1.7%, accurate ~7%)."""
        if quality is not None:
            ef = SearchQuality.parse(quality).ef
        ef = ef or 128
        n_live = max(self.n, 1)
        cov = ef / 3700.0  # ef=128 -> 3.46% coverage
        # spilled builds hold spill*N row-copies across partitions; unique
        # coverage per probe is ~L/spill, so the probe count scales by spill
        want = -(-int(cov * n_live * self.spill) // max(self.part_len, 1))
        return int(min(max(want, 2), self.c_real or self.c))

    # -- search ----------------------------------------------------------------

    def search(self, queries, k: int, ef: int | None = None, quality=None,
               nprobe: int | None = None, mask=None):
        """Returns ``(values [B, k], row_indices [B, k])`` best-first."""
        q = np.atleast_2d(np.asarray(queries, np.float32))
        b = q.shape[0]
        nprobe = min(nprobe or self.nprobe_for(ef, quality),
                     self.c_real or self.c)
        b_pad = _round_up(b, 8)
        qd = jnp.asarray(np.pad(q, ((0, b_pad - b), (0, 0))))
        mask_dev = None
        if mask is not None:
            m = np.asarray(mask, bool)
            m = np.pad(m, (0, max(0, self.n - m.shape[0])))
            mask_dev = jnp.asarray(m)
        # spilled rows can surface from two probed partitions: over-fetch a
        # little, dedup (duplicates carry bit-identical scores), re-trim
        # worst case every top-k row surfaces from ``spill`` partitions
        k_fetch = min(
            self.spill * k + 8 if self.spill > 1 else k,
            nprobe * self.part_len,
        )
        vals = idx = None
        if mask is None:
            # Pallas probe kernel (SQ8 words or f32 rows): partition reads
            # as pipelined DMAs (the XLA gather path measured 2.3GB/s at
            # capacity shapes — see ops/ivf_kernel.py). Small-batch only;
            # falls back on any Mosaic failure.
            from velesdb_tpu.ops.ivf_kernel import (
                ivf_probe_supported,
                ivf_probe_topk,
            )
            from velesdb_tpu.ops.pallas_kernels import use_pallas

            if (
                _IVF_KERNEL_OK[0]
                and use_pallas()
                and ivf_probe_supported(
                    b, self.part_len, self.dim,
                    1 if self.storage == "sq8" else 4,
                )
            ):
                try:
                    kern = self._kernel_state()
                    vals, idx = ivf_probe_topk(
                        jnp.asarray(q), self._centroids, self._cent_sq,
                        self._parts, *kern,
                        k=k_fetch, nprobe=nprobe, metric=self.metric,
                    )
                except Exception as e:
                    _IVF_KERNEL_OK[0] = False
                    from velesdb_tpu.ops.demotions import record_demotion

                    record_demotion("ivf-probe-kernel", e)
                    vals = idx = None
        if vals is None:
            parts = (
                (self._parts, self._part_scale, self._part_minv)
                if self.storage == "sq8"
                else self._parts
            )
            vals, idx = _ivf_search(
                qd,
                self._centroids,
                self._cent_sq,
                parts,
                self._part_rows,
                self._part_sq,
                mask_dev,
                k=k_fetch,
                nprobe=nprobe,
                metric=self.metric,
            )
        if self.spill > 1:
            # dedup ON DEVICE (host numpy here would force a blocking D2H
            # readback in the serving hot path): duplicates carry
            # bit-identical scores, O(k_fetch^2) mask is trivial
            vals, idx = _dedup_topk(
                vals, idx, k=min(k, k_fetch),
                higher_is_better=self.metric.higher_is_better,
            )
        return vals[:b], idx[:b]

    def _kernel_state(self):
        """Folded probe-kernel operands ``(aux [P, 8, L], flat_rows)``:
        cosine's 1/|deq| folds into the affine so raw kernel dots are
        already cosine scores; euclidean's |deq|^2 rides as the additive
        penalty; dead slots carry +inf. scale2/minv2/pen stack on a
        sublane-padded axis (Mosaic block constraint — see
        ``ops/ivf_kernel.py``). Derived once per assembly (~4% of the
        partition bytes), cached on the index."""
        if self._kern is None:
            psq = self._part_sq
            live = self._part_rows >= 0
            zero = jnp.zeros_like(psq)
            cosine = self.metric is DistanceMetric.COSINE
            inv = jnp.where(
                psq > 1e-30, jax.lax.rsqrt(jnp.maximum(psq, 1e-30)), 0.0
            )
            if self.storage == "sq8":
                if cosine:
                    mul = self._part_scale * inv
                    add = self._part_minv * inv
                    pen_base = zero
                elif self.metric is DistanceMetric.EUCLIDEAN:
                    mul, add = self._part_scale, self._part_minv
                    pen_base = psq
                else:
                    mul, add = self._part_scale, self._part_minv
                    pen_base = zero
            else:  # f32 rows: dots need no affine restore
                mul = inv if cosine else jnp.ones_like(psq)
                add = zero
                pen_base = (
                    psq if self.metric is DistanceMetric.EUCLIDEAN else zero
                )
            pen = jnp.where(live, pen_base, jnp.inf)
            aux = jnp.stack(
                [mul, add, pen] + [zero] * 5, axis=1
            ).astype(jnp.float32)  # [P, 8, L]
            self._kern = (
                jax.device_put(aux),
                self._part_rows.reshape(-1).astype(jnp.int32),
            )
        return self._kern

    # -- persistence -------------------------------------------------------------

    def save(self, path: str, version: int = 0) -> None:
        """Persist the RECIPE (kmeans centroids + meta, ~2MB), not the
        partition layout: ``load`` re-runs the deterministic assembly on
        device. A ``part_rows`` readback at 1M rows is tens of MB of D2H —
        the remote tunnel's wedge-prone operation — and reconstructing the
        [C, L, D] parts tensor host-side at load would be GBs of traffic."""
        if self._parts is None or self._kmeans_cents is None:
            return
        np.savez_compressed(
            path,
            kmeans_cents=np.asarray(self._kmeans_cents),
            kmeans_c=self._kmeans_c,
            n=self.n,
            metric=self.metric.value,
            version=version,
            spill=self.spill,
            storage=self.storage,
        )

    def load(self, path: str, corpus: np.ndarray, valid: np.ndarray,
             version: int = 0) -> bool:
        if not os.path.exists(path):
            return False
        data = np.load(path)
        if (
            str(data["metric"]) != self.metric.value
            or int(data["version"]) != version
            or "kmeans_cents" not in data  # legacy part_rows artifact
        ):
            return False
        saved_storage = str(data["storage"]) if "storage" in data else "f32"
        if saved_storage != ("sq8" if isinstance(corpus, SQ8Vectors) else "f32"):
            return False  # storage mode changed: rebuild
        self.n = (
            corpus.codes.shape[0]
            if isinstance(corpus, SQ8Vectors)
            else corpus.shape[0]
        )
        if int(data["n"]) != self.n:
            return False
        self.spill = int(data["spill"]) if "spill" in data else 1
        rows = np.flatnonzero(np.asarray(valid, bool)[: self.n])
        if len(rows) == 0:
            return False
        cents = jax.device_put(jnp.asarray(data["kmeans_cents"], jnp.float32))
        self._kmeans_cents = cents
        self._kmeans_c = int(data["kmeans_c"])
        if isinstance(corpus, SQ8Vectors):
            self.storage = "sq8"
            ridx = jnp.asarray(rows)
            self._assemble_sq8(
                jnp.asarray(corpus.codes)[ridx],
                jnp.asarray(corpus.scale, jnp.float32)[ridx],
                jnp.asarray(corpus.minv, jnp.float32)[ridx],
                rows, cents, self._kmeans_c,
            )
            self._dirty = False
            return True
        self.storage = "f32"
        if isinstance(corpus, jax.Array):
            if len(rows) == corpus.shape[0]:  # all-true mask: rows is arange
                live_dev = corpus.astype(jnp.float32)
            else:
                live_dev = corpus[jnp.asarray(rows)].astype(jnp.float32)
        else:
            live_dev = jax.device_put(jnp.asarray(corpus[rows], jnp.float32))
        if self.metric is DistanceMetric.COSINE:
            nrm = jnp.linalg.norm(live_dev, axis=1, keepdims=True)
            km_input = live_dev / jnp.maximum(nrm, 1e-30)
        else:
            km_input = live_dev
        self._assemble_partitions(
            live_dev, km_input, rows, cents, self._kmeans_c
        )
        self._dirty = False
        return True


@functools.partial(jax.jit, static_argnames=("k", "higher_is_better"))
def _dedup_topk(vals, idx, *, k, higher_is_better):
    """Drop duplicate row ids (first occurrence wins) and re-trim to k."""
    eq = (idx[:, :, None] == idx[:, None, :]) & (idx[:, :, None] >= 0)
    dup = jnp.any(jnp.tril(eq, -1), axis=2)
    keep = ~dup & (idx >= 0)
    v, pos = top_k(vals, k, higher_is_better, mask=keep)
    i = jnp.take_along_axis(idx, pos, axis=1)
    worst = -jnp.inf if higher_is_better else jnp.inf
    return v, jnp.where(v == worst, -1, i)


def ivf_search_impl(q, cents, cent_sq, parts, part_rows, part_sq, mask, *,
                    k, nprobe, metric, exclude_rows=None):
    """``parts`` is either ``[C, L, D] f32`` or a ``(words i32, scale,
    minv)`` triple (SQ8 storage, block-packed int32 words — probes gather
    1/4 the f32 bytes in 1/4 the indices and score via the rank-1 affine
    identity on the MXU after an in-register unpack)."""
    quant = isinstance(parts, tuple)
    b, d = q.shape
    if metric is DistanceMetric.COSINE:
        qn = q / jnp.maximum(jnp.linalg.norm(q, axis=1, keepdims=True), 1e-30)
    else:
        qn = q
    if quant:
        pwords, pscale, pminv = parts
        qsum = jnp.sum(qn, axis=1, keepdims=True)  # [B, 1]
        d_pad = pwords.shape[-1] * 4
        qb = jnp.pad(qn, ((0, 0), (0, d_pad - d))).astype(jnp.bfloat16)
    # route: centroid affinity (L2-equivalent for euclidean, dot for MIPS)
    route = qn @ cents.T
    if metric is DistanceMetric.EUCLIDEAN:
        route = route - 0.5 * cent_sq[None, :]
    route = _route_mask(route, cent_sq)  # bucket-padded partitions -> -inf
    if mask is not None:
        # mask-aware probe pruning (r5): a CORRELATED filter concentrates
        # the masked rows in few partitions far from the query — distance-
        # ordered probing then reads only masked-out rows (measured: recall
        # collapses to ~selectivity on cluster masks, exp_filtered
        # FILT_MASK=cluster; the r4 uniform-coverage guard never engages
        # because its need model assumes masked rows spread evenly). A
        # partition with ZERO masked rows cannot contribute a result, so
        # drop it from routing: the top-nprobe probe set re-aims at the
        # kept clusters. Strictly recall-non-decreasing (pruned probes
        # contributed nothing); cost is one [C*L] bool gather + a reduce.
        pmask = mask[jnp.maximum(part_rows, 0)] & (part_rows >= 0)
        route = jnp.where(jnp.any(pmask, axis=1)[None, :], route, -jnp.inf)
    _, probe = jax.lax.top_k(route, nprobe)  # [B, P]

    hib = metric.higher_is_better
    worst = -jnp.inf if hib else jnp.inf

    # Partition-payload gather strategy (measured on v5e at capacity shapes,
    # [13834, 736, 768] u8: benchmarks/exp_ivf_gather.py): XLA's batched
    # slice-gather ``pcodes[pid]`` runs at 2.3GB/s (~228us fixed cost per
    # slice, unpipelined) — 350x below HBM peak. Unrolled ``dynamic_slice``
    # (one contiguous DMA per partition) reaches 60GB/s; a flattened
    # row-granularity gather (B*L indices) reaches 37GB/s and keeps the HLO
    # small at large B.
    L = part_rows.shape[1]
    payload = pwords if quant else parts
    dp = payload.shape[-1]  # words (D_pad/4) or f32 dims
    flat_payload = payload.reshape(-1, dp)
    lane = jnp.arange(L, dtype=jnp.int32)
    unroll_slices = b <= 32

    def gather_blocks(pid):
        """[B] partition ids -> [B, L, dp] payload blocks."""
        if unroll_slices:
            blks = [
                jax.lax.dynamic_slice(
                    payload, (pid[i], jnp.int32(0), jnp.int32(0)),
                    (1, L, dp),
                )
                for i in range(b)
            ]
            return jnp.concatenate(blks, axis=0)
        rid = (pid[:, None] * L + lane[None, :]).reshape(-1)
        return flat_payload[rid].reshape(b, L, dp)

    def body(carry, p):
        rv, ri = carry
        pid = probe[:, p]  # [B]
        rows = part_rows[pid]  # [B, L]
        if quant:
            blk = sq8_unpack_words(gather_blocks(pid))  # [B, L, D_pad] bf16
            code_dot = jnp.einsum(
                "bd,bld->bl", qb, blk, preferred_element_type=jnp.float32
            )
            dots = code_dot * pscale[pid] + qsum * pminv[pid]
        else:
            blk = gather_blocks(pid)  # [B, L, D]
            dots = jnp.einsum(
                "bd,bld->bl", qn, blk, preferred_element_type=jnp.float32
            )
        if metric is DistanceMetric.COSINE:
            nrm = jnp.sqrt(jnp.maximum(part_sq[pid], 1e-30))
            s = dots / nrm
        elif metric is DistanceMetric.EUCLIDEAN:
            qq = jnp.sum(qn * qn, axis=1, keepdims=True)
            s = jnp.sqrt(jnp.maximum(qq + part_sq[pid] - 2.0 * dots, 0.0))
        else:
            s = dots
        ok = rows >= 0
        if mask is not None:
            ok = ok & mask[jnp.maximum(rows, 0)]
        if exclude_rows is not None:  # self-kNN: drop the query's own row
            ok = ok & (rows != exclude_rows[:, None])
        s = jnp.where(ok, s, worst)
        rows = jnp.where(ok, rows, -1)
        av = jnp.concatenate([rv, s], axis=1)
        ai = jnp.concatenate([ri, rows], axis=1)
        mv, pos = top_k(av, k, higher_is_better=hib)
        return (mv, jnp.take_along_axis(ai, pos, axis=1)), None

    init = (
        jnp.full((b, k), worst, jnp.float32),
        jnp.full((b, k), -1, jnp.int32),
    )
    (vals, idx), _ = jax.lax.scan(body, init, jnp.arange(nprobe))
    return vals, idx


@functools.partial(jax.jit, static_argnames=("nprobe", "metric", "chunk"))
def _probe_parts(cents, cent_sq, *, nprobe, metric, chunk=2048):
    """Top-``nprobe`` nearest partitions per partition, computed in row
    chunks: the full ``[P, P]`` affinity is 4.6GB at the 34K-partition
    builds the uncapped kNN produces (r3d OOM) — each chunk holds only
    ``[chunk, P]``. ``cent_sq`` is the STORED routing norm (carries the
    padded-partition sentinel, see :func:`_group_map`)."""
    P, d = cents.shape
    P_pad = _round_up(P, chunk)
    cpad = (
        jnp.concatenate([cents, jnp.broadcast_to(cents[0], (P_pad - P, d))])
        if P_pad != P else cents
    )

    def body(_, blk):
        aff = blk @ cents.T
        if metric is DistanceMetric.EUCLIDEAN:
            aff = aff - 0.5 * cent_sq[None, :]
        aff = _route_mask(aff, cent_sq)
        return None, jax.lax.top_k(aff, min(nprobe, P))[1]

    _, idx = jax.lax.scan(body, None, cpad.reshape(-1, chunk, d))
    return idx.reshape(P_pad, -1)[:P]


@functools.partial(jax.jit, static_argnames=("k", "nprobe", "metric"))
def _bucketed_self_knn(parts, part_rows, part_sq, cents, cent_sq, *,
                       k, nprobe, metric):
    """Partition-bucketed approximate self-kNN: each partition scores its
    rows against its ``nprobe`` nearest partitions' rows in ONE matmul, so
    every corpus row is read O(nprobe) times TOTAL (per-query probing reads
    each partition once per querying row — 100-250x more HBM traffic).
    Returns ``[P, L, k]`` neighbor row ids (-1 = none)."""
    P, L, D = parts.shape
    probe = _probe_parts(cents, cent_sq, nprobe=nprobe, metric=metric,
                         chunk=min(2048, _round_up(P, 8)))

    def body(_, p):
        q = parts[p]  # [L, D]
        qrows = part_rows[p]  # [L]
        cand = parts[probe[p]].reshape(-1, D)  # [nprobe*L, D]
        crows = part_rows[probe[p]].reshape(-1)
        csq = part_sq[probe[p]].reshape(-1)
        dots = jax.lax.dot_general(
            q, cand, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [L, nprobe*L]
        if metric is DistanceMetric.EUCLIDEAN:
            s = 2.0 * dots - csq[None, :]
        elif metric is DistanceMetric.COSINE:
            qs = part_sq[p]
            s = (
                dots
                * jax.lax.rsqrt(jnp.maximum(qs, 1e-30))[:, None]
                * jax.lax.rsqrt(jnp.maximum(csq, 1e-30))[None, :]
            )
        else:
            s = dots
        ok = (crows[None, :] >= 0) & (crows[None, :] != qrows[:, None])
        s = jnp.where(ok, s, -jnp.inf)
        v, i = jax.lax.top_k(s, k)
        nbr = jnp.where(v == -jnp.inf, -1, crows[i])
        return None, (v, nbr)

    _, (vals, out) = jax.lax.scan(body, None, jnp.arange(P, dtype=jnp.int32))
    return vals, out


@functools.partial(
    jax.jit, static_argnames=("k", "nprobe", "metric", "d", "count")
)
def _sq8_knn_block(parts_w, pscale, pminv, part_rows, part_sq, probe,
                   start, *, k, nprobe, metric, d, count):
    """One bounded dispatch of the SQ8 bucketed self-kNN: partitions
    ``[start, start+count)`` scored against their probed neighborhoods.
    The single whole-corpus scan program (36K steps at 8M rows) crashed
    the TPU worker (watchdog-scale runtime, r3d) — the host loop in
    :func:`_bucketed_self_knn_sq8` keeps every dispatch a few thousand
    steps and reads each block back as it lands."""
    P, L, W = parts_w.shape
    dim_of = np.concatenate([4 * np.arange(W) + j for j in range(4)])
    dmask = jnp.asarray((dim_of < d).astype(np.float32))

    def deq(words, sc, mn):
        codes = sq8_unpack_words(words, jnp.float32)  # [rows, W*4]
        return (codes * sc[:, None] + mn[:, None]) * dmask[None, :]

    def body(_, p):
        q = deq(parts_w[p], pscale[p], pminv[p])  # [L, D_pad]
        qrows = part_rows[p]
        cw = parts_w[probe[p]].reshape(-1, W)
        cand = deq(cw, pscale[probe[p]].reshape(-1),
                   pminv[probe[p]].reshape(-1))
        crows = part_rows[probe[p]].reshape(-1)
        csq = part_sq[probe[p]].reshape(-1)
        dots = jax.lax.dot_general(
            q, cand, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [L, nprobe*L]
        if metric is DistanceMetric.EUCLIDEAN:
            s = 2.0 * dots - csq[None, :]
        elif metric is DistanceMetric.COSINE:
            qs = part_sq[p]
            s = (
                dots
                * jax.lax.rsqrt(jnp.maximum(qs, 1e-30))[:, None]
                * jax.lax.rsqrt(jnp.maximum(csq, 1e-30))[None, :]
            )
        else:
            s = dots
        ok = (crows[None, :] >= 0) & (crows[None, :] != qrows[:, None])
        s = jnp.where(ok, s, -jnp.inf)
        v, i = jax.lax.top_k(s, k)
        nbr = jnp.where(v == -jnp.inf, -1, crows[i])
        return None, (v, nbr)

    steps = start + jnp.arange(count, dtype=jnp.int32)
    _, (vals, out) = jax.lax.scan(body, None, steps)
    return vals, out


def _bucketed_self_knn_sq8(parts_w, pscale, pminv, part_rows, part_sq,
                           cents, cent_sq, *, k, nprobe, metric, d,
                           block_parts=4096):
    """SQ8 variant of :func:`_bucketed_self_knn`: partitions stay packed
    int32 words in HBM ([P, L, W] = 1/4 the f32 partition bytes) and each
    scan step unpacks + dequantizes only its [~nprobe*L, D_pad] working
    set. This is what lets graph builds past ~4M rows fit one chip: the
    f32 partition copy next to the f32 corpus was the OOM at 8M x 128D
    (r3d). Scoring quality: SQ8 coarse selection equals f32 at these
    densities (r3b, host-basis), and the kNN is refined by the alpha-prune
    + beam rescore downstream.

    ``d``: true (unpadded) dim. Unpacked layouts are PLANE-ordered
    (dim 4i+j lands at j*W+i); both sides of every dot share the
    permutation, so scores are unaffected — but padded dims dequantize to
    ``minv`` (code 0), so they are masked to 0 to match ``part_sq``
    (computed on unpadded codes at assembly).

    Returns HOST arrays ``(vals [P, L, k] f32, nbr [P, L, k] int32)`` —
    execution is chunked over partition blocks (watchdog + readback
    bounds), so results land on host block by block.
    """
    P, L, W = parts_w.shape
    probe = _probe_parts(cents, cent_sq, nprobe=nprobe, metric=metric,
                         chunk=min(2048, _round_up(P, 8)))
    count = min(block_parts, P)
    vals_h = np.empty((P, L, k), np.float32)
    nbr_h = np.empty((P, L, k), np.int32)
    for s0 in range(0, P, count):
        st = min(s0, P - count)  # tail overlap recomputes identical rows
        v, nb = jax.device_get(_sq8_knn_block(
            parts_w, pscale, pminv, part_rows, part_sq, probe,
            jnp.int32(st), k=k, nprobe=nprobe, metric=metric, d=d,
            count=count,
        ))
        vals_h[st:st + count] = v
        nbr_h[st:st + count] = nb
    return vals_h, nbr_h


SQ8_BUILD_MIN_ROWS = int(os.environ.get("VELESDB_SQ8_BUILD_MIN_ROWS",
                                         4_000_000))
# byte-based twin of the row threshold: the f32/bf16 partition copy that
# OOMed one-chip builds "past ~4M rows" (r3d) did so at 128D — what binds
# is BYTES, not rows. At 768D the same copy blows at 1M rows (measured
# 10.2GB HLO temp, r4b): quantize the build corpus whenever the f32 corpus
# itself exceeds the budget. 2GiB == the r3d row threshold at 128D.
SQ8_BUILD_MIN_BYTES = int(os.environ.get("VELESDB_SQ8_BUILD_MIN_BYTES",
                                         2 << 30))


def ivf_self_knn(corpus, k: int, metric: DistanceMetric, valid=None,
                 nprobe: int = 8, qblock: int = 1024,
                 n_clusters: int | None = None, passes: int = 1,
                 return_router: bool = False, sq8: bool | None = None,
                 profile: dict | None = None, return_device: bool = False):
    """Approximate kNN graph of a corpus against itself: ``[N, k] int32``.

    The scalable build path for the graph index (VERDICT round-1 #2a):
    k-means partitions + one partition-vs-neighborhood matmul per partition
    is O(N * nprobe * L * D) FLOPs with O(N * nprobe * D) HBM traffic —
    feasible at the multi-million-row regime where the graph engine
    activates. Reference analog: the HNSW incremental build
    (``native/graph.rs:158``) achieves the same sub-quadratic construction
    by greedy insertion. ``qblock`` is accepted for API compatibility.

    ``return_router=True`` additionally returns the first pass's routing
    structure ``(centroids [P, D], part_rows [P, L])`` — free at build time,
    used by the graph engine for IVF-routed beam entries.

    ``sq8`` (default: auto at n >= SQ8_BUILD_MIN_ROWS): build the
    partitioned corpus copy in packed SQ8 words (1/4 the HBM) and score
    the bucketed kNN on per-step dequantized blocks — the f32 partition
    copy next to the f32 corpus is what OOMed one-chip builds past ~4M
    rows (r3d).
    """
    del qblock
    import time as _time

    def _mark(stage, t0):
        if profile is not None:
            profile[stage] = (
                profile.get(stage, 0.0) + _time.perf_counter() - t0
            )
        return _time.perf_counter()

    t = _time.perf_counter()
    router = None
    corpus_in = (
        corpus if isinstance(corpus, jax.Array) else np.asarray(corpus, np.float32)
    )
    n = corpus_in.shape[0]
    d_true = corpus_in.shape[1]
    metric = DistanceMetric(metric)
    if sq8 is None:
        sq8 = (n >= SQ8_BUILD_MIN_ROWS
               or n * d_true * 4 >= SQ8_BUILD_MIN_BYTES)
    sq_src = None
    if sq8:
        from velesdb_tpu.ops.quantization import sq8_quantize

        sq_src = sq8_quantize(
            corpus_in if isinstance(corpus_in, jax.Array)
            else jnp.asarray(corpus_in)
        )
        if profile is not None:
            jax.block_until_ready(sq_src.codes)
    t = _mark("knn.quantize", t)
    valid_np = np.ones(n, bool) if valid is None else np.asarray(valid, bool)
    pass_vals, pass_ids = [], []
    for p in range(max(passes, 1)):
        t = _time.perf_counter()
        ivf = IvfIndex(
            corpus_in.shape[1], metric, n_clusters=n_clusters, kmeans_seed=p
        )
        ivf.build(sq_src if sq8 else corpus_in, valid_np, profile=profile)
        if profile is not None and ivf._parts is not None:
            jax.block_until_ready(ivf._parts)
        t = _mark("knn.partition", t)
        if ivf._parts is None:
            empty = np.full((n, k), -1, np.int32)
            return (empty, None) if return_router else empty
        if p == 0 and return_router:
            # strip bucket-padded trailing partitions: the router feeds the
            # graph entry stage, which computes its own routing norms and
            # would otherwise see pads as zero-centroids
            router = (
                np.asarray(ivf._centroids)[: ivf.c_real],
                np.asarray(ivf._part_rows)[: ivf.c_real],
            )
        nprobe_p = int(min(max(nprobe, 1), ivf.c_real or ivf.c))
        k_eff = min(k, max(nprobe_p * ivf.part_len - 1, 1))
        if sq8:
            # chunked-readback path (watchdog bounds at >=4M rows): scatter
            # on host, block by block
            vals_h, nbr_h = _bucketed_self_knn_sq8(
                ivf._parts, ivf._part_scale, ivf._part_minv,
                ivf._part_rows, ivf._part_sq, ivf._centroids, ivf._cent_sq,
                k=k_eff, nprobe=nprobe_p, metric=metric, d=d_true,
            )
            t = _mark("knn.score", t)
            rows = np.asarray(ivf._part_rows).reshape(-1)
            live = rows >= 0
            out_i = np.full((n, k), -1, np.int32)
            out_v = np.full((n, k), -np.inf, np.float32)
            out_i[rows[live], :k_eff] = nbr_h.reshape(-1, k_eff)[live]
            out_v[rows[live], :k_eff] = vals_h.reshape(-1, k_eff)[live]
            pass_ids.append(out_i)
            pass_vals.append(out_v)
            t = _mark("knn.readback", t)
        else:
            vals_d, nbr_d = _bucketed_self_knn(
                ivf._parts, ivf._part_rows, ivf._part_sq, ivf._centroids,
                ivf._cent_sq, k=k_eff, nprobe=nprobe_p, metric=metric,
            )  # [P, L, k] each, device
            # scatter [P*L] -> [n] rows ON DEVICE: the per-pass host
            # readback of (vals, ids) partials was ~512MB of D2H through
            # the tunnel at 1M x knn_k=32 x 2 passes (r4 build-rate work);
            # device passes accumulate and merge below, ONE [n, k] id
            # readback total
            sv, si = _scatter_knn(
                vals_d, nbr_d, ivf._part_rows, n=n, k=k, k_eff=k_eff
            )
            if profile is not None:
                jax.block_until_ready(si)
            t = _mark("knn.score", t)
            pass_ids.append(si)
            pass_vals.append(sv)
    if sq8:
        if len(pass_ids) == 1:
            out = pass_ids[0]
        else:
            out = merge_ranked(pass_vals, pass_ids, k)
            _mark("knn.merge", t)
        out[~valid_np] = -1
        if return_device:
            out = jax.device_put(jnp.asarray(out))
        return (out, router) if return_router else out
    if len(pass_ids) == 1:
        out_d = pass_ids[0]
    else:
        out_d = _merge_ranked_device(
            jnp.concatenate(pass_vals, axis=1),
            jnp.concatenate(pass_ids, axis=1),
            k=k,
        )
    if return_device:
        # fully device-resident result: mask dead rows on device; the
        # caller's pipeline (prune -> assembly) stays on device with no
        # [n, k] readback at all (r4 build-rate work)
        if not valid_np.all():
            out_d = jnp.where(
                jnp.asarray(valid_np)[:, None], out_d, jnp.int32(-1)
            )
        if profile is not None:
            out_d = jax.block_until_ready(out_d)
        _mark("knn.merge", t)
        return (out_d, router) if return_router else out_d
    out = np.array(out_d)  # the single kNN readback ([n, k] int32)
    out[~valid_np] = -1
    _mark("knn.merge", t)
    return (out, router) if return_router else out


@functools.partial(jax.jit, static_argnames=("n", "k", "k_eff"))
def _scatter_knn(vals_d, nbr_d, part_rows, *, n, k, k_eff):
    """Scatter partition-shaped kNN results ``[P, L, k_eff]`` to row-shaped
    ``[n, k]`` on device (dead slots route to an out-of-bounds row and are
    dropped)."""
    rows = part_rows.reshape(-1)
    dest = jnp.where(rows >= 0, rows, n)  # OOB = dropped
    fv = vals_d.reshape(-1, k_eff)
    fi = nbr_d.reshape(-1, k_eff)
    out_v = jnp.full((n, k), -jnp.inf, jnp.float32)
    out_i = jnp.full((n, k), -1, jnp.int32)
    out_v = out_v.at[dest, :k_eff].set(fv, mode="drop")
    out_i = out_i.at[dest, :k_eff].set(fi, mode="drop")
    return out_v, out_i


@functools.partial(jax.jit, static_argnames=("k",))
def _merge_ranked_device(allv, alli, *, k):
    """Device counterpart of :func:`merge_ranked`: union-merge ranked
    candidate lists with duplicate suppression, keep the best ``k``."""
    order = jnp.lexsort((alli, -allv), axis=1)
    sv = jnp.take_along_axis(allv, order, axis=1)
    si = jnp.take_along_axis(alli, order, axis=1)
    dup = jnp.concatenate(
        [
            jnp.zeros((si.shape[0], 1), bool),
            (si[:, 1:] == si[:, :-1]) & (si[:, 1:] >= 0),
        ],
        axis=1,
    )
    sv = jnp.where(dup | (si < 0), -jnp.inf, sv)
    vals, pos = jax.lax.top_k(sv, k)
    out = jnp.take_along_axis(si, pos, axis=1)
    return jnp.where(vals == -jnp.inf, -1, out)


def merge_ranked(vals_list, ids_list, k: int) -> np.ndarray:
    """Union-merge ranked candidate lists per row: scores are
    maximize-oriented and deterministic per (row, id) pair, so duplicates
    carry equal values — lexsort (value desc, id) makes them adjacent for
    dedup. Returns ``[N, k] int32`` ids (-1 = none)."""
    allv = np.concatenate(vals_list, axis=1)
    alli = np.concatenate(ids_list, axis=1)
    order = np.lexsort((alli, -allv), axis=1)
    sv = np.take_along_axis(allv, order, axis=1)
    si = np.take_along_axis(alli, order, axis=1)
    dup = np.zeros_like(si, bool)
    dup[:, 1:] = (si[:, 1:] == si[:, :-1]) & (si[:, 1:] >= 0)
    sv[dup | (si < 0)] = -np.inf
    keep = np.argsort(-sv, axis=1, kind="stable")[:, :k]
    out = np.take_along_axis(si, keep, axis=1)
    out[np.take_along_axis(sv, keep, axis=1) == -np.inf] = -1
    return out


@functools.partial(
    jax.jit, static_argnames=("k", "sample", "block", "metric", "out_k")
)
def _nn_descent_scan(corpus, cnorm, knn, valid, *, k, sample, block, metric,
                     out_k):
    """One NN-descent round: per node, rescore {current neighbors} union
    {sampled neighbors-of-neighbors} exactly, dedup IN-program (duplicate
    candidates would crowd the top-k with repeats), and keep the best
    ``out_k``. [N_pad, *] in, ([N_pad, out_k] vals, ids) out; one program."""
    n_pad, kk = knn.shape
    nb = n_pad // block

    def body(_, bi):
        base = bi * block
        q = jax.lax.dynamic_slice_in_dim(corpus, base, block)  # [B, D]
        ids = jax.lax.dynamic_slice_in_dim(knn, base, block)  # [B, kk]
        ids_s = ids[:, :sample]
        nn2 = knn[jnp.maximum(ids_s, 0)][:, :, :sample]  # [B, s, s]
        nn2 = jnp.where(ids_s[:, :, None] >= 0, nn2, -1)
        cand = jnp.concatenate([ids, nn2.reshape(block, -1)], axis=1)  # [B, S]
        self_id = base + jnp.arange(block)[:, None]
        ok = (cand >= 0) & (cand != self_id) & valid[jnp.maximum(cand, 0)]
        # first-occurrence-only: duplicates otherwise fill top-k slots
        eq = cand[:, :, None] == cand[:, None, :]
        scount = cand.shape[1]
        earlier = jnp.tril(jnp.ones((scount, scount), bool), k=-1)[None]
        ok = ok & ~jnp.any(eq & earlier & ok[:, None, :], axis=2)
        vecs = corpus[jnp.maximum(cand, 0)]  # [B, S, D]
        dots = jnp.einsum("bd,bsd->bs", q, vecs, preferred_element_type=jnp.float32)
        cc = cnorm[jnp.maximum(cand, 0)]
        if metric is DistanceMetric.EUCLIDEAN:
            s_ = 2.0 * dots - cc
        elif metric is DistanceMetric.COSINE:
            qn = jax.lax.rsqrt(jnp.maximum(jnp.sum(q * q, axis=1, keepdims=True), 1e-30))
            s_ = dots * qn * jax.lax.rsqrt(jnp.maximum(cc, 1e-30))
        else:
            s_ = dots
        s_ = jnp.where(ok, s_, -jnp.inf)
        v, pos = jax.lax.top_k(s_, out_k)
        i = jnp.take_along_axis(cand, pos, axis=1)
        return None, (v, jnp.where(v == -jnp.inf, -1, i))

    _, (vals, ids) = jax.lax.scan(body, None, jnp.arange(nb, dtype=jnp.int32))
    return vals.reshape(n_pad, out_k), ids.reshape(n_pad, out_k)


def _reverse_knn(knn: np.ndarray, n: int, k: int) -> np.ndarray:
    """First-k reverse edges per node: [N, k] int32, -1 padded."""
    src = np.repeat(np.arange(n, dtype=np.int64), knn.shape[1])
    dst = knn.reshape(-1)
    ok = dst >= 0
    src, dst = src[ok], dst[ok]
    order = np.argsort(dst, kind="stable")
    dst_s, src_s = dst[order], src[order]
    start = np.searchsorted(dst_s, np.arange(n))
    pos = np.arange(len(dst_s)) - start[dst_s]
    keep = pos < k
    out = np.full((n, k), -1, np.int32)
    out[dst_s[keep], pos[keep]] = src_s[keep]
    return out


def nn_descent_round(corpus, knn: np.ndarray, metric: DistanceMetric,
                     valid=None, sample: int = 16, block: int = 512) -> np.ndarray:
    """Refine a kNN graph by one NN-descent round (neighbors-of-neighbors
    rescoring): lifts bucketed-build kNN recall where partition boundaries
    cut true neighborhoods. O(N * (k + sample^2) * D) FLOPs, one program.
    """
    metric = DistanceMetric(metric)
    corpus_in = (
        corpus if isinstance(corpus, jax.Array) else jnp.asarray(corpus, jnp.float32)
    )
    n, k = knn.shape[0], knn.shape[1]
    sample = min(sample, k)
    n_pad = _round_up(n, block)
    corpus_p = jnp.pad(corpus_in.astype(jnp.float32), ((0, n_pad - n), (0, 0)))
    cnorm = jnp.sum(corpus_p * corpus_p, axis=1)
    # canonical NN-descent joins BOTH directions: nodes that point AT me
    # are as informative as the ones I point at
    rev = _reverse_knn(np.asarray(knn, np.int64), n, k)
    both = np.concatenate([np.asarray(knn, np.int32), rev], axis=1)
    knn_p = jnp.pad(jnp.asarray(both, jnp.int32), ((0, n_pad - n), (0, 0)),
                    constant_values=-1)
    valid_np = (
        np.ones(n, bool) if valid is None else np.asarray(valid, bool)
    )
    valid_p = jnp.pad(jnp.asarray(valid_np), (0, n_pad - n))
    out_k = min(2 * k, k + sample * sample)
    vals, ids = _nn_descent_scan(
        corpus_p, cnorm, knn_p, valid_p, k=2 * k, sample=sample, block=block,
        metric=metric, out_k=out_k,
    )
    # candidates are already deduped in-program; a single ranked pass trims
    # to k (merge_ranked also guards against any residual repeats)
    out = merge_ranked([np.asarray(vals[:n])], [np.asarray(ids[:n])], k)
    out[~valid_np] = -1
    return out


_ivf_search = functools.partial(
    jax.jit, static_argnames=("k", "nprobe", "metric")
)(ivf_search_impl)
