"""Bucket-max Pallas kernel: the production exact-search engine on TPU.

Round-1's fused kernel kept a running top-k in VMEM but paid k max-extraction
passes per chunk (VPU-bound: ~10ms of a 12.6ms batch at 1M x 128D,
VERDICT.md weak #1). This kernel removes the in-kernel selection entirely:

    grid step c:  DMA chunk [C, D] -> VMEM       (pipelined by pallas)
                  MXU:  dots = q [B, D] @ chunk.T (bf16/f32, one matmul)
                  VPU:  s = dots - cc             (1 op; validity rides in cc)
                  VPU:  128 bucket maxima per chunk via STATIC lane-aligned
                        [B, 128] slice max/argmax loops (no reshape, no
                        lane<->sublane relayout, scores never leave VMEM)
                  out:  gm/gi [B, 128] bucket winners -> HBM

    host program: jax.lax.approx_max_k over [B, n_buckets] bucket winners
                  (TPU PartialReduce) -> final top-k

Cost model: ~5 VPU ops per score element (vs ~6k for the k-pass merge) and
HBM traffic of one corpus read + [B, N/w * 8B] bucket winners. Measured on
v5e at 1M x 128D, b=256, k=10: 2.27 ms/batch (113K QPS) with a bf16 corpus
at recall 0.992 vs the exact oracle — 5.5x the round-1 kernel, and the
BASELINE.md SIFT-1M north star (>=100K QPS @ recall>=0.95) clears.

Accuracy envelope: one winner per 128-lane bucket means two true top-k hits
colliding in a bucket lose one — P ~ C(k,2)*w/N. The collection layer uses
this kernel only at large N (>= ``BUCKET_MIN_ROWS``) where that probability
is negligible; below it the one-shot XLA path is faster anyway.

Scoring is unified as ``s = dots - cc``:

- EUCLIDEAN: queries pre-scaled by 2, ``cc = |c|^2``  (s = 2 q.c - |c|^2,
  rank-equal to -d^2; distances restored outside via |q|^2)
- COSINE: queries normalized outside, corpus rows pre-normalized by the
  caller (build-time), ``cc = 0``
- DOT: ``cc = 0``

Invalid/padded rows carry ``cc = +inf`` so their score is -inf — masking
costs zero extra VPU ops.

Reference counterpart: ``simd_explicit.rs`` streaming batch top-k; the
dispatch layer (``BruteForceIndex.search``) replaces ``simd_dispatch.rs``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from velesdb_tpu.ops.distance import DistanceMetric

__all__ = [
    "bucket_topk",
    "BUCKET_MIN_ROWS",
    "bucket_chunk_for",
    "hamming_bucket_topk",
    "hamming_bits_rows",
    "hamming_mxu_topk",
    "hamming_mxu_rerank_topk",
    "sq8_pack_blocked",
    "sq8_bucket_topk",
    "sq8_int8_rows",
    "sq8i_bucket_topk",
    "sq8i_rerank_topk",
    "sq8i_xla_rerank_topk",
    "sq8pd_build",
    "sq8pd_ptile",
    "sq8pd_candidates",
    "sq8pd_topk",
    "sq8pd_rerank_topk",
    "sq8pd_xla_rerank_topk",
    "split_f32_rows",
    "bucket_topk_hl",
]

# Below this corpus size bucket collisions bite (few buckets) and a single
# [B, N] score+top_k program is already fast — the dispatcher uses the
# one-shot XLA path instead.
BUCKET_MIN_ROWS = 131_072

_LANES = 128


def bucket_chunk_for(b: int, d: int, itemsize: int = 4, n: int = 0) -> int:
    """Largest power-of-two chunk fitting the ~16MB scoped-VMEM budget.

    Model calibrated on v5e Mosaic outcomes: ``1.5*chunk*d*itemsize``
    (corpus block, partially double-buffered) + ``4*b*chunk`` (score tile)
    <= 15.5MB. Known fits: (8192, 128, f32, b=256), (2048, 768, f32,
    b=256); known OOM: (4096, 128, f32, b=1024) at 20.4MB.

    ``n`` (total padded rows, when known) adds a measured ~0.3 B/row
    scoped-overhead term: at 5.24M x 128D f32 the compiler reports 16.47MB
    for chunk=8192 (484KB over the 16MB limit — AOT-probed r5) while
    chunk=4096 compiles; the same probe shows every int8 kernel still fits
    at 8192, which this linear term reproduces (int8 base is ~5MB lower).
    Callers that omit ``n`` keep the pre-r5 model (safe below ~2M rows)."""
    budget = 15_500_000 - b * d * 4  # resident queries
    chunk = 256
    # cap at 8K even where int8 layouts (itemsize 1) would fit 16K: buckets
    # = N/chunk * 128, so doubling the chunk HALVES the bucket count and
    # doubles the collision loss at small batch — measured as a ~0.5-1%
    # coarse-recall cost at 200K x 128D for no meaningful DMA win
    while chunk < 8192:
        nxt = chunk * 2
        need = (3 * nxt * d * itemsize) // 2 + 4 * b * nxt + 8 * b * _LANES
        need += (3 * n) // 10
        if need > budget:
            break
        chunk = nxt
    return chunk


def _bucket_select(s, base: int):
    """In-kernel bucket selection shared by every bucket kernel: one
    (max, argmax) winner per 128-lane bucket of the ``[B, C]`` score tile,
    via STATIC lane-aligned slice loops — pure elementwise VPU ops, no
    reshape, no lane<->sublane relayout. Returns ``(gm, gi) [B, 128]``
    with ``gi`` holding global corpus indices offset by ``base``."""
    w = s.shape[1] // _LANES
    gm = s[:, 0:_LANES]
    for i in range(1, w):
        gm = jnp.maximum(gm, s[:, i * _LANES : (i + 1) * _LANES])
    off = jnp.full_like(gm, w, jnp.int32)
    for i in range(w - 1, -1, -1):
        off = jnp.where(s[:, i * _LANES : (i + 1) * _LANES] == gm, i, off)
    lane = jax.lax.broadcasted_iota(jnp.int32, (s.shape[0], _LANES), 1)
    return gm, base + off * _LANES + lane


def _final_select(gm, gi, k: int, b: int, recall_target: float = 0.99):
    """Host-program finish shared by every bucket kernel: PartialReduce over
    the [B, nbuckets] bucket winners, empties mapped to -1/-inf."""
    vals, pos = jax.lax.approx_max_k(
        gm, min(k, gm.shape[1]), recall_target=recall_target
    )
    idx = jnp.take_along_axis(gi, pos, axis=1)[:b]
    vals = vals[:b]
    return vals, jnp.where(vals == -jnp.inf, -1, idx)


def _restore_euclidean(vals, idx, qq):
    """Scores were maximize-oriented 2 q.c - |c|^2; surface distances."""
    empty = idx < 0
    d2 = jnp.maximum(qq[:, None] - vals, 0.0)
    return jnp.where(empty, jnp.inf, jnp.sqrt(d2)), idx


def _kernel(q_ref, corpus_ref, cc_ref, gm_ref, gi_ref, *, chunk: int):
    c = pl.program_id(0)
    q = q_ref[:]
    rows = corpus_ref[:]
    if rows.dtype != q.dtype:
        rows = rows.astype(q.dtype)
    dots = jax.lax.dot_general(
        q, rows, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s = dots - cc_ref[0, :][None, :]  # [B, C]
    gm_ref[:], gi_ref[:] = _bucket_select(s, c * chunk)


@functools.partial(jax.jit, static_argnames=("k", "chunk", "interpret"))
def _bucket_call(q, corpus, cc, *, k, chunk, interpret):
    """Pallas bucket sweep + PartialReduce final selection (one program)."""
    b, d = q.shape
    n = corpus.shape[0]
    grid = (n // chunk,)
    nbuckets = (n // chunk) * _LANES
    cc8 = jnp.broadcast_to(cc[None, :], (8, n))
    gm, gi = pl.pallas_call(
        functools.partial(_kernel, chunk=chunk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((b, d), lambda c: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, d), lambda c: (c, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, chunk), lambda c: (0, c), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((b, _LANES), lambda c: (0, c), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, _LANES), lambda c: (0, c), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, nbuckets), jnp.float32),
            jax.ShapeDtypeStruct((b, nbuckets), jnp.int32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * d,
            bytes_accessed=n * d * corpus.dtype.itemsize + b * d * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(q, corpus, cc8)
    return _final_select(gm, gi, k, b)


@functools.partial(
    jax.jit, static_argnames=("k", "metric", "chunk", "interpret", "prenormalized")
)
def bucket_topk_entry(queries, corpus, cnorm_or_penalty, mask=None, *, k,
                      metric, chunk, interpret, prenormalized=True):
    """Jittable entry: prep (normalize/pad/scale) + kernel + value fixup.

    ``cnorm_or_penalty``: euclidean -> ``|c|^2`` with +inf on invalid rows;
    cosine/dot -> 0.0 with +inf on invalid rows. ``mask`` (optional [N]
    bool) is a per-call filter folded into the penalty in-program (zero
    extra VPU work inside the kernel). Cosine assumes the corpus rows were
    pre-normalized at build time (``prenormalized=True``); pass False to
    normalize in-program (one extra corpus pass, ad-hoc callers).
    """
    b, d = queries.shape
    n = corpus.shape[0]
    b_pad = _round_up(b, 8)
    d_pad = _round_up(d, 128)
    n_pad = _round_up(n, chunk)

    if mask is not None:
        m = mask
        if m.shape[0] < n:
            m = jnp.pad(m, (0, n - m.shape[0]))
        cnorm_or_penalty = jnp.where(m[:n], cnorm_or_penalty, jnp.inf)

    q = queries
    qq = jnp.sum(q * q, axis=1)  # euclidean distance restore
    if metric is DistanceMetric.COSINE:
        sq = jnp.sum(q * q, axis=1, keepdims=True)
        q = q * jnp.where(sq > 1e-30, jax.lax.rsqrt(jnp.maximum(sq, 1e-30)), 0.0)
    elif metric is DistanceMetric.EUCLIDEAN:
        q = 2.0 * q
    if metric is DistanceMetric.COSINE and not prenormalized:
        cn = jnp.sum(corpus.astype(jnp.float32) ** 2, axis=1)
        inv = jnp.where(cn > 1e-30, jax.lax.rsqrt(jnp.maximum(cn, 1e-30)), 0.0)
        corpus = (corpus.astype(jnp.float32) * inv[:, None]).astype(corpus.dtype)

    q = jnp.pad(q, ((0, b_pad - b), (0, d_pad - d)))
    corpus = jnp.pad(corpus, ((0, n_pad - n), (0, d_pad - d)))
    cc = jnp.pad(
        cnorm_or_penalty.astype(jnp.float32), (0, n_pad - n),
        constant_values=jnp.inf,
    )
    if corpus.dtype != jnp.float32:
        q = q.astype(corpus.dtype)

    vals, idx = _bucket_call(q, corpus, cc, k=k, chunk=chunk, interpret=interpret)
    vals, idx = vals[:b], idx[:b]
    if metric is DistanceMetric.EUCLIDEAN:
        return _restore_euclidean(vals, idx, qq)
    return vals, idx


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---- split-bf16 f32-emulation scoring (r3b) --------------------------------
#
# MXU f32 dots run at bf16-pass precision (~3e-4), which the 2qc-|c|^2 form
# amplifies by cancellation: at 1M x 128D the f32 bucket kernel's true
# (host-f32-oracle) top-10 identity is only 0.953. Storing the corpus as a
# (hi, lo) bf16 pair — hi = bf16(x), lo = bf16(x - hi), same 4 bytes/dim as
# f32 — and scoring with two bf16 matmuls
#     q.c ~ qhi.chi + [qhi|qlo].[clo|chi]      (qlo.clo ~ 2^-16 rel, dropped)
# restores ~16 mantissa bits. Measured (v5e, 1M x 128D, b=256): same
# ms/batch as the f32 kernel, host-identity 0.953 -> 0.986 (residual is
# bucket collisions + PartialReduce target). A 3-separate-matmul form and
# precision=HIGHEST both crash the Mosaic compile; the concatenated 2-matmul
# form lowers.


def split_f32_rows(corpus):
    """``[N, D] f32`` -> ``(hi, lo)`` bf16 pair for :func:`bucket_topk_hl`."""
    hi = corpus.astype(jnp.bfloat16)
    lo = (corpus - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _kernel_hl(qhi_ref, qlo_ref, hi_ref, lo_ref, cc_ref, gm_ref, gi_ref, *,
               chunk: int):
    c = pl.program_id(0)
    qhi, qlo = qhi_ref[:], qlo_ref[:]
    chi, clo = hi_ref[:], lo_ref[:]
    dn = (((1,), (1,)), ((), ()))
    qcat = jnp.concatenate([qhi, qlo], axis=1)
    ccat = jnp.concatenate([clo, chi], axis=1)
    dots = jax.lax.dot_general(qhi, chi, dn, preferred_element_type=jnp.float32)
    dots += jax.lax.dot_general(qcat, ccat, dn, preferred_element_type=jnp.float32)
    s = dots - cc_ref[0, :][None, :]
    gm_ref[:], gi_ref[:] = _bucket_select(s, c * chunk)


@functools.partial(
    jax.jit, static_argnames=("k", "metric", "chunk", "interpret")
)
def bucket_topk_hl(queries, hi, lo, cnorm_or_penalty, mask=None, *, k,
                   metric, chunk, interpret):
    """Split-bf16 bucket search: :func:`bucket_topk_entry` contract, true-f32
    fidelity. ``hi/lo [N, D_pad]`` bf16 from :func:`split_f32_rows` of the
    (cosine: pre-normalized) corpus; D already lane-padded at build."""
    b, d = queries.shape
    n, d_pad = hi.shape
    b_pad = _round_up(b, 8)
    if mask is not None:
        m = mask
        if m.shape[0] < n:
            m = jnp.pad(m, (0, n - m.shape[0]))
        cnorm_or_penalty = jnp.where(m[:n], cnorm_or_penalty, jnp.inf)
    q = queries
    qq = jnp.sum(q * q, axis=1)
    if metric is DistanceMetric.COSINE:
        sq = jnp.sum(q * q, axis=1, keepdims=True)
        q = q * jnp.where(sq > 1e-30, jax.lax.rsqrt(jnp.maximum(sq, 1e-30)), 0.0)
    elif metric is DistanceMetric.EUCLIDEAN:
        q = 2.0 * q
    q = jnp.pad(q, ((0, b_pad - b), (0, d_pad - d)))
    qhi = q.astype(jnp.bfloat16)
    qlo = (q - qhi.astype(jnp.float32)).astype(jnp.bfloat16)
    cc = cnorm_or_penalty.astype(jnp.float32)
    grid = (n // chunk,)
    nbuckets = (n // chunk) * _LANES
    cc8 = jnp.broadcast_to(cc[None, :], (8, n))
    gm, gi = pl.pallas_call(
        functools.partial(_kernel_hl, chunk=chunk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((b_pad, d_pad), lambda c: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b_pad, d_pad), lambda c: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, d_pad), lambda c: (c, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, d_pad), lambda c: (c, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, chunk), lambda c: (0, c), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((b_pad, _LANES), lambda c: (0, c), memory_space=pltpu.VMEM),
            pl.BlockSpec((b_pad, _LANES), lambda c: (0, c), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b_pad, nbuckets), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, nbuckets), jnp.int32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=6 * b_pad * n * d_pad,
            bytes_accessed=n * d_pad * 4 + b_pad * d_pad * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )(qhi, qlo, hi, lo, cc8)
    # fidelity is this kernel's reason to exist: spend the extra
    # PartialReduce candidates (0.999 vs the shared 0.99 target)
    vals, idx = _final_select(gm, gi, k, b, recall_target=0.999)
    if metric is DistanceMetric.EUCLIDEAN:
        return _restore_euclidean(vals, idx, qq)
    return vals, idx


# ---------------------------------------------------------------------------
# binary (bit-packed) Hamming — same bucket-selection structure; the round-1
# hamming kernel still paid the k-pass VPU merge per chunk
# ---------------------------------------------------------------------------


def _hamming_kernel(q_ref, corpus_ref, pen_ref, gm_ref, gi_ref, *,
                    chunk: int, n_words: int):
    c = pl.program_id(0)
    q = q_ref[:]
    rows = corpus_ref[:]
    b = q.shape[0]
    dist = jnp.zeros((b, chunk), jnp.int32)
    for w in range(n_words):
        x = jnp.bitwise_xor(q[:, w][:, None], rows[:, w][None, :])
        dist = dist + jax.lax.population_count(x).astype(jnp.int32)
    s = -dist.astype(jnp.float32) - pen_ref[0, :][None, :]  # maximize
    gm_ref[:], gi_ref[:] = _bucket_select(s, c * chunk)


@functools.partial(jax.jit, static_argnames=("k", "chunk", "interpret"))
def hamming_bucket_topk(packed_q, packed_corpus, penalty, *, k, chunk,
                        interpret):
    """Bucket-selection packed-Hamming top-k: smallest distance first.

    ``packed_q [B, W] uint32`` vs ``packed_corpus [N_pad, W] uint32``
    (``N_pad`` a multiple of ``chunk``); ``penalty [N_pad] f32`` is 0 on
    valid rows / +inf on masked rows. Returns ``(distances [B, k] f32,
    indices [B, k])`` with +inf / -1 for empties — the large-N BINARY-mode
    engine (reference ``hamming_distance_binary_fast``,
    ``simd_explicit.rs:328``).
    """
    b, w = packed_q.shape
    n = packed_corpus.shape[0]
    b_pad = _round_up(max(b, 8), 8)
    w_pad = _round_up(w, 128)
    q = jnp.pad(packed_q, ((0, b_pad - b), (0, w_pad - w)))
    cps = packed_corpus
    if w_pad != w:
        cps = jnp.pad(cps, ((0, 0), (0, w_pad - w)))
    grid = (n // chunk,)
    nbuckets = (n // chunk) * _LANES
    pen8 = jnp.broadcast_to(penalty[None, :], (8, n))
    gm, gi = pl.pallas_call(
        functools.partial(_hamming_kernel, chunk=chunk, n_words=w),
        grid=grid,
        in_specs=[
            pl.BlockSpec((b_pad, w_pad), lambda c: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, w_pad), lambda c: (c, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, chunk), lambda c: (0, c), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((b_pad, _LANES), lambda c: (0, c), memory_space=pltpu.VMEM),
            pl.BlockSpec((b_pad, _LANES), lambda c: (0, c), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b_pad, nbuckets), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, nbuckets), jnp.int32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=3 * b_pad * n * w,
            bytes_accessed=n * w_pad * 4 + b_pad * w_pad * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(q, cps, pen8)
    vals, idx = _final_select(gm, gi, k, b)
    return jnp.where(idx < 0, jnp.inf, -vals), idx


@functools.partial(
    jax.jit, static_argnames=("k", "m", "metric", "chunk", "interpret")
)
def hamming_rerank_topk(queries, packed_q, packed_corpus, penalty, corpus,
                        *, k, m, metric, chunk, interpret):
    """Binary-Hamming prefilter + in-program exact f32 gather-rerank, ONE
    dispatch (BASELINE config #3: "binary-quantized Hamming prefilter +
    float rerank" — reference ``quantization.rs:48-123`` +
    ``search_with_rerank``).

    The packed-Hamming bucket scan reads 1/32 the f32 bytes and picks the
    ``m`` coarse winners per query; the same program gathers them from the
    f32 ``corpus`` and rescores exactly (HIGHEST-precision einsum — the
    rerank is O(B*m*D), a rounding error next to the scan). The binary
    sign-sketch is a SPEED/memory play: its coarse recall feeds the exact
    rerank the way the reference's CPU float rerank consumes the Hamming
    prefilter. Returns metric-native ``(vals [B, k], ids [B, k])``.
    """
    _, ci = hamming_bucket_topk(
        packed_q, packed_corpus, penalty, k=m, chunk=chunk,
        interpret=interpret,
    )
    safe = jnp.maximum(ci, 0)
    cand = corpus[safe]  # [B, m, D]
    if metric is DistanceMetric.COSINE:
        sq = jnp.sum(queries * queries, axis=1, keepdims=True)
        qn = queries * jnp.where(
            sq > 1e-30, jax.lax.rsqrt(jnp.maximum(sq, 1e-30)), 0.0
        )
    else:
        qn = queries
    dots = jnp.einsum(
        "bd,bmd->bm", qn, cand, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    if metric is DistanceMetric.EUCLIDEAN:
        qq = jnp.sum(qn * qn, axis=1, keepdims=True)
        csq = jnp.sum(cand * cand, axis=-1)
        exact = jnp.where(ci < 0, jnp.inf, qq + csq - 2.0 * dots)
        neg, order = jax.lax.top_k(-exact, k)
        ids = jnp.take_along_axis(ci, order, axis=1)
        return jnp.sqrt(jnp.maximum(-neg, 0.0)), jnp.where(
            jnp.isinf(-neg), -1, ids
        )
    if metric is DistanceMetric.COSINE:
        cn = jnp.sqrt(jnp.maximum(jnp.sum(cand * cand, axis=-1), 1e-30))
        exact = jnp.where(ci < 0, -jnp.inf, dots / cn)
    else:
        exact = jnp.where(ci < 0, -jnp.inf, dots)
    vals, order = jax.lax.top_k(exact, k)
    ids = jnp.take_along_axis(ci, order, axis=1)
    return vals, jnp.where(vals == -jnp.inf, -1, ids)


# ---------------------------------------------------------------------------
# bit-plane MXU Hamming: popcount(q XOR c) = |q| + |c| - 2 q.c on 0/1 bit
# vectors, so with the corpus stored as UNPACKED int8 0/1 rows (1 byte/bit —
# an 8x shadow over packed, still 4x under f32) one int8 MXU matmul replaces
# the packed VPU xor+popcount loop. Measured v5e 1.2M x 100D b=256: packed
# kernel 54K QPS (~2.5 GB/s effective) -> MXU 293K QPS (5.4x; exact distance
# agreement, benchmarks/exp_hamming_mxu.py). Epilogue is 1 int32 subtract +
# the shared 3-op bucket select; masking rides in the aux tile as a +_BIG
# knockout (int32 scores have no inf).
# ---------------------------------------------------------------------------

_HAM_BIG = 1 << 20  # knockout >> max popcount(D) yet far from int32 overflow


def _hamming_mxu_kernel(qi_ref, rows_ref, aux_ref, gm_ref, gi_ref, *,
                        chunk: int):
    c = pl.program_id(0)
    doti = jax.lax.dot_general(
        qi_ref[:], rows_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # [B, C] = 2 q.c  (queries pre-doubled)
    s = doti - aux_ref[0, :][None, :]  # aux = |c| + _BIG*knocked_out
    gm, gi = _bucket_select(s, c * chunk)
    gm_ref[:] = gm.astype(jnp.float32)
    gi_ref[:] = gi


def hamming_bits_rows(slots, dim: int):
    """Build the MXU-Hamming shadow: unpacked int8 0/1 sign-bit rows,
    D padded to a lane multiple (zero pad bits cancel in |q|+|c|-2q.c).
    ``slots`` is the padded f32 corpus ``[N_pad, D]``."""
    d_pad = ((dim + _LANES - 1) // _LANES) * _LANES
    bits = (jnp.asarray(slots)[:, :dim] >= 0.0).astype(jnp.int8)
    if d_pad > dim:
        bits = jnp.pad(bits, ((0, 0), (0, d_pad - dim)))
    return bits


@functools.partial(jax.jit, static_argnames=("k", "chunk", "interpret"))
def hamming_mxu_topk(qbits, rows_bits, aux, *, k, chunk, interpret=False):
    """Bit-plane MXU Hamming top-k: smallest distance first.

    ``qbits [B, D_pad] int8 0/1`` vs ``rows_bits [N_pad, D_pad] int8 0/1``;
    ``aux [N_pad] int32 = colsum(bits) + _HAM_BIG * knocked_out`` carries
    both the |c| popcount term and the validity/filter mask. Returns
    ``(distances [B, k] f32, indices [B, k])`` with +inf / -1 empties —
    contract-identical to :func:`hamming_bucket_topk` (reference
    ``hamming_distance_binary_fast``, ``simd_explicit.rs:328``)."""
    b = qbits.shape[0]
    n, d_pad = rows_bits.shape
    b_pad = _round_up(max(b, 8), 8)
    qi = jnp.pad(2 * qbits, ((0, b_pad - b), (0, 0)))
    qsum = jnp.sum(qbits.astype(jnp.int32), axis=1)  # [B] |q|
    aux8 = jnp.broadcast_to(aux[None, :], (8, n))
    grid = (n // chunk,)
    nbuckets = (n // chunk) * _LANES
    gm, gi = pl.pallas_call(
        functools.partial(_hamming_mxu_kernel, chunk=chunk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((b_pad, d_pad), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, d_pad), lambda c: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, chunk), lambda c: (0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((b_pad, _LANES), lambda c: (0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_pad, _LANES), lambda c: (0, c),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b_pad, nbuckets), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, nbuckets), jnp.int32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b_pad * n * d_pad,
            bytes_accessed=n * d_pad + n * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(qi, rows_bits, aux8)
    vals, idx = _final_select(gm, gi, k, b)
    # int32 scores have no -inf: knocked-out rows sit below -_HAM_BIG/2
    empty = vals < -(_HAM_BIG // 2)
    dist = jnp.where(
        empty, jnp.inf, qsum[:, None].astype(jnp.float32) - vals
    )
    return dist, jnp.where(empty, -1, idx)


@functools.partial(
    jax.jit, static_argnames=("k", "m", "metric", "chunk", "interpret")
)
def hamming_mxu_rerank_topk(queries, qbits, rows_bits, aux, corpus, *, k, m,
                            metric, chunk, interpret=False):
    """MXU-Hamming prefilter + in-program exact f32 gather-rerank, ONE
    dispatch — the serve path for binary collections whose bit shadow fits
    the MXU budget (falls back to :func:`hamming_rerank_topk` past it).
    Measured v5e 1.2M x 100D angular m=80 b=256: 114K QPS vs the packed
    path's 44K at identical rerank recall (exp_hamming_mxu.py)."""
    _, ci = hamming_mxu_topk(qbits, rows_bits, aux, k=m, chunk=chunk,
                             interpret=interpret)
    return _exact_rerank_tail(queries, corpus, ci, k=k, metric=metric)


# ---------------------------------------------------------------------------
# per-DIMENSION SQ8 ("pd") assist family — the r5 selection-bound fix.
#
# The per-row affine assist kernel (sq8i_rerank_topk) pays an ~6-op f32
# epilogue (cast, * scale, two rank-1 outer corrections) plus the 3-op
# bucket select per [B, C] score element; measured 240K QPS at 1M x 128D
# b=256 while the no-epilogue lower bound (raw int32 dots + classic select)
# runs 339K (benchmarks/exp_sq8i_v2.py). Per-dimension quantization
# x_d = sdim_d * code_d + mid_d folds the whole affine into the int dot:
#
#   2 q.x - |x|^2  =  qu * (doti - pen_int) + 2 q.mid  + O(quant)
#       doti    = qi . codes,  qi = round(2 q sdim / qu)  (int8)
#       pen_int = round(|x|^2 / qu)                       (int32, corpus-static)
#       qu      = corpus-calibrated batch-common query quant step
#
# and 2 q.mid is per-QUERY constant — rank-irrelevant. The kernel then
# rides a single ENCODED int32 tile: enc = doti * 64 + ptile with
# ptile = -64 * pen_int + slice_idx — the in-chunk slice index lives in the
# low 6 bits, so ONE max pass (mul, add, max = 3 int ops/elem) yields the
# bucket winner's value AND its exact argmax; the gi output and the 2-op
# argmax pass disappear. Measured v5e 1M x 128D b=256 (exp_sq8i_v2.py):
#
#   coarse:        362K QPS (vs 267K per-row, vs 339K no-epilogue bound)
#   assist m=16:   301K QPS @ host recall 0.9973 (vs 240K @ 0.9977)
#   assist m=32:   227K QPS @ host recall 1.0000
#
# Coarse quality drops vs per-row affine (0.918 vs 0.949 — one shared step
# across all rows), which the in-program exact f32 rerank absorbs. int32
# budget (dim <= 512, the assist regime): |doti| <= 127*127*dim, valid
# pen_int capped at _PD_PEN_CAP (else the builder refuses and the per-row
# family serves), knocked-out rows carry _pd_invalid_pen(dim) chosen so
# masked scores sit strictly below every valid score and |enc| < 2^31.
# ---------------------------------------------------------------------------

_PD_PEN_CAP = 1 << 21


def _pd_doti_max(dim: int) -> int:
    return 127 * 127 * dim


def _pd_invalid_pen(dim: int) -> int:
    return 2 * _pd_doti_max(dim) + 2 * _PD_PEN_CAP


def _pd_empty_thresh(dim: int) -> int:
    return -(_pd_doti_max(dim) + _PD_PEN_CAP)


def sq8pd_build(slots_f32, valid, dim: int, metric: DistanceMetric):
    """Build the per-dim assist shadow from the padded f32 corpus.

    Returns ``(rows_pd [N_pad, D_pad] int8, pen_int [N_pad] int32,
    pen_f32 [N_pad] f32, sdim [D_pad] f32, mid [D_pad] f32, qu float)``
    or ``None`` when the int32 encoding budget doesn't hold (pen_int above
    ``_PD_PEN_CAP`` — huge-norm euclidean corpora — or dim > 512).
    COSINE expects pre-normalized rows (ranks as DOT, pen = 0)."""
    if dim > 512:
        return None
    d_pad = ((dim + _LANES - 1) // _LANES) * _LANES
    x = jnp.asarray(slots_f32, jnp.float32)
    if x.shape[1] < d_pad:
        x = jnp.pad(x, ((0, 0), (0, d_pad - x.shape[1])))
    vcol = jnp.asarray(valid)[:, None]
    big = jnp.max(jnp.where(vcol, x, -jnp.inf), axis=0)
    small = jnp.min(jnp.where(vcol, x, jnp.inf), axis=0)
    mid = jnp.where(jnp.isfinite(big), (big + small) * 0.5, 0.0)
    sdim = jnp.where(big > small, (big - small) / 254.0, 1.0)
    rows_pd = jnp.clip(
        jnp.round((x - mid[None, :]) / sdim[None, :]), -127, 127
    ).astype(jnp.int8)
    rows_pd = jnp.where(vcol, rows_pd, 0)
    if metric is DistanceMetric.EUCLIDEAN:
        deq = rows_pd.astype(jnp.float32) * sdim[None, :] + mid[None, :]
        pen = jnp.sum(deq * deq, axis=1)
        del deq
    else:
        pen = jnp.zeros(x.shape[0], jnp.float32)
    # batch-common query step, calibrated on the corpus itself (queries
    # resemble the corpus distribution; outliers clip in the COARSE pass
    # only — the exact rerank rescores in f32). 1.2x headroom measured
    # adequate (exp_sq8i_v2.py used 1.1x on true queries).
    qmax = jnp.max(jnp.where(vcol, jnp.abs(2.0 * x * sdim[None, :]), 0.0))
    qu = float(qmax) / 127.0 * 1.2
    if qu <= 0.0:
        return None
    vmask = jnp.asarray(valid)
    # cap check in FLOAT (an over-cap penalty would overflow the int32
    # cast below before the guard could see it)
    if float(jnp.max(jnp.where(vmask, pen, 0.0))) / qu > _PD_PEN_CAP:
        return None
    pen_int_raw = jnp.round(pen / qu).astype(jnp.int32)
    pen_int = jnp.where(vmask, pen_int_raw, _pd_invalid_pen(dim)).astype(
        jnp.int32
    )
    pen_f32 = jnp.where(vmask, pen, jnp.inf)
    return rows_pd, pen_int, pen_f32, sdim, mid, qu


def sq8pd_ptile(pen_int, chunk: int):
    """Corpus-static encoded tile for the enc-select kernel: the additive
    penalty in the high bits, the in-chunk slice index in the low 6."""
    n = pen_int.shape[0]
    slice_i = ((jnp.arange(n) % chunk) // _LANES).astype(jnp.int32)
    return pen_int * (-64) + slice_i


def _sq8pd_kernel(qi_ref, rows_ref, pt_ref, gm_ref, *, chunk: int):
    doti = jax.lax.dot_general(
        qi_ref[:], rows_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    w = chunk // _LANES
    m = None
    for i in range(w):
        sl = slice(i * _LANES, (i + 1) * _LANES)
        e = doti[:, sl] * 64 + pt_ref[0, sl][None, :]
        m = e if m is None else jnp.maximum(m, e)
    gm_ref[:] = m


def _sq8pd_quantize_queries(queries, sdim, qu, d_pad: int):
    b = queries.shape[0]
    b_pad = _round_up(max(b, 8), 8)
    q = queries
    if q.shape[1] < d_pad:
        q = jnp.pad(q, ((0, 0), (0, d_pad - q.shape[1])))
    qv = 2.0 * q * sdim[None, :]
    qi = jnp.clip(jnp.round(qv / qu), -127, 127).astype(jnp.int8)
    return jnp.pad(qi, ((0, b_pad - b), (0, 0))), b_pad


@functools.partial(
    jax.jit, static_argnames=("m", "chunk", "dim", "interpret")
)
def sq8pd_candidates(queries, rows_pd, ptile, sdim, qu, *, m, chunk, dim,
                     interpret=False):
    """Coarse top-m candidate ids from the enc-select sweep (−1 empties)."""
    b = queries.shape[0]
    n, d_pad = rows_pd.shape
    qi, b_pad = _sq8pd_quantize_queries(queries, sdim, qu, d_pad)
    pt8 = jnp.broadcast_to(ptile[None, :], (8, n))
    grid = (n // chunk,)
    nbuckets = (n // chunk) * _LANES
    (gm,) = pl.pallas_call(
        functools.partial(_sq8pd_kernel, chunk=chunk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((b_pad, d_pad), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, d_pad), lambda c: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, chunk), lambda c: (0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((b_pad, _LANES), lambda c: (0, c),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct((b_pad, nbuckets), jnp.int32),),
        cost_estimate=pl.CostEstimate(
            flops=2 * b_pad * n * d_pad,
            bytes_accessed=n * d_pad + n * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(qi, rows_pd, pt8)
    # selection on the f32 cast (approx_max_k has no int path); ties from
    # the lost low bits are near-ties in score — the EXACT enc is re-read
    # from the int32 tile for decoding
    _, pos = jax.lax.approx_max_k(
        gm.astype(jnp.float32), min(m, gm.shape[1]), recall_target=0.99
    )
    enc = jnp.take_along_axis(gm, pos, axis=1)[:b]
    pos = pos[:b]
    i_dec = enc & 63
    val = (enc - i_dec) // 64  # exact, sign-safe
    idx = (pos // _LANES) * chunk + i_dec * _LANES + (pos % _LANES)
    empty = val < _pd_empty_thresh(dim)
    return jnp.where(empty, -1, idx), val


@functools.partial(
    jax.jit, static_argnames=("k", "m", "metric", "chunk", "dim", "interpret")
)
def sq8pd_rerank_topk(queries, rows_pd, ptile, sdim, qu, corpus, *, k, m,
                      metric, chunk, dim, interpret=False):
    """Per-dim int8 enc-select coarse scan + in-program exact f32 rerank —
    the FULL-storage D<512 serve default since r5 (301K QPS @ host recall
    0.9973 at 1M x 128D b=256 vs the per-row kernel's 240K @ 0.9977)."""
    ci, _ = sq8pd_candidates(
        queries, rows_pd, ptile, sdim, qu, m=m, chunk=chunk, dim=dim,
        interpret=interpret,
    )
    return _exact_rerank_tail(queries, corpus, ci, k=k, metric=metric)


@functools.partial(
    jax.jit, static_argnames=("k", "chunk", "dim", "metric", "interpret")
)
def sq8pd_topk(queries, rows_pd, ptile, sdim, mid, qu, *, k, chunk, dim,
               metric, interpret=False):
    """Coarse-only pd top-k with metric-native values restored (tests and
    benchmarks; the serve path is :func:`sq8pd_rerank_topk`)."""
    idx, val = sq8pd_candidates(
        queries, rows_pd, ptile, sdim, qu, m=k, chunk=chunk, dim=dim,
        interpret=interpret,
    )
    empty = idx < 0
    # qu * val + 2 q.mid = 2 q.x - pen  (pen = |x|^2 for euclidean, else 0)
    qmid = 2.0 * (queries @ mid[: queries.shape[1]])
    score = qu * val.astype(jnp.float32) + qmid[:, None]
    if metric is DistanceMetric.EUCLIDEAN:
        qq = jnp.sum(queries * queries, axis=1)
        d2 = jnp.maximum(qq[:, None] - score, 0.0)
        return jnp.where(empty, jnp.inf, jnp.sqrt(d2)), idx
    dots = score * 0.5  # q.x
    if metric is DistanceMetric.COSINE:
        qn = jnp.sqrt(jnp.maximum(jnp.sum(queries * queries, axis=1), 1e-30))
        dots = dots / qn[:, None]  # corpus rows pre-normalized
    return jnp.where(empty, -jnp.inf, dots), idx


@functools.partial(
    jax.jit, static_argnames=("k", "m", "metric", "recall_target")
)
def sq8pd_xla_rerank_topk(queries, rows_pd, pen_f32, sdim, qu, corpus, *, k,
                          m, metric, recall_target=0.99):
    """Pure-XLA twin of :func:`sq8pd_rerank_topk` (Mosaic-free fallback,
    same shadow arrays): monolithic int8 ``dot_general`` + f32 penalty
    subtract + ``approx_max_k`` + the shared exact rerank tail."""
    n, d_pad = rows_pd.shape
    qi, _ = _sq8pd_quantize_queries(queries, sdim, qu, d_pad)
    qi = qi[: queries.shape[0]]
    doti = jax.lax.dot_general(
        qi, rows_pd, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    s = qu * doti.astype(jnp.float32) - pen_f32[None, :]
    cv, ci = jax.lax.approx_max_k(s, m, recall_target=recall_target)
    ci = jnp.where(cv == -jnp.inf, -1, ci)
    return _exact_rerank_tail(queries, corpus, ci, k=k, metric=metric)


def bucket_topk(
    queries,
    corpus,
    penalty=None,
    k: int = 10,
    metric: DistanceMetric = DistanceMetric.COSINE,
    chunk: int | None = None,
    interpret: bool | None = None,
    prenormalized: bool = False,
):
    """Convenience wrapper (NumPy/JAX in, device arrays out) matching the
    ``fused_topk`` contract. ``penalty`` is the per-row additive penalty
    vector (see :func:`bucket_topk_entry`); None derives it from the corpus
    (all rows valid)."""
    from velesdb_tpu.ops.pallas_kernels import use_pallas

    metric = DistanceMetric.parse(metric)
    if interpret is None:
        interpret = not use_pallas()
    q = jnp.atleast_2d(jnp.asarray(queries, jnp.float32))
    c = jnp.asarray(corpus)
    if chunk is None:
        chunk = bucket_chunk_for(
            _round_up(q.shape[0], 8), _round_up(q.shape[1], 128),
            c.dtype.itemsize, c.shape[0],
        )
    if penalty is None:
        if metric is DistanceMetric.EUCLIDEAN:
            penalty = jnp.sum(c.astype(jnp.float32) ** 2, axis=1)
        else:
            penalty = jnp.zeros(c.shape[0], jnp.float32)
    return bucket_topk_entry(
        q, c, jnp.asarray(penalty, jnp.float32), k=k, metric=metric,
        chunk=chunk, interpret=interpret, prenormalized=prenormalized,
    )


# ---------------------------------------------------------------------------
# SQ8 bucket kernel: uint8 codes staged through int32 words (Mosaic has no
# u8->f32 cast; i32 shifts/masks + i32->f32 DO lower). Codes pack dim-block-
# major so each byte plane unpacks to a CONTIGUOUS [C, D/4] slice: word k's
# byte j holds dim j*(D/4)+k  ->  plane j = (w >> 8j) & 0xFF.
# ---------------------------------------------------------------------------


@jax.jit
def sq8_pack_blocked(codes):
    """Pack ``[N, D] uint8`` SQ8 codes into ``[N, D/4] int32`` words (dim
    padded to a multiple of 4; see layout note above)."""
    n, d = codes.shape
    d_pad = _round_up(d, 4)
    c = jnp.pad(codes, ((0, 0), (0, d_pad - d))).astype(jnp.uint32)
    planes = c.reshape(n, 4, d_pad // 4)  # plane j = dims [j*D/4, (j+1)*D/4)
    w = (
        planes[:, 0]
        | (planes[:, 1] << 8)
        | (planes[:, 2] << 16)
        | (planes[:, 3] << 24)
    )
    return w.astype(jnp.int32)


def _sq8_kernel(q_ref, words_ref, scale_ref, minv_ref, pen_ref, gm_ref,
                gi_ref, *, chunk: int, d_pad: int, unpack_bf16: bool = False):
    c = pl.program_id(0)
    q = q_ref[:]  # [B, D_pad] f32 (pre-scaled by the wrapper for euclidean)
    w = words_ref[:]  # [C, D_pad/4] int32
    # integers 0..255 are exact in bf16; the bf16 unpack halves the VMEM
    # copy and runs the matmul on the bf16 MXU path
    out_dt = jnp.bfloat16 if unpack_bf16 else jnp.float32
    parts = []
    for j in range(4):
        pj = jnp.bitwise_and(
            jax.lax.shift_right_logical(w, jnp.int32(8 * j)), jnp.int32(0xFF)
        )
        parts.append(pj.astype(out_dt))
    rows = jnp.concatenate(parts, axis=1)  # [C, D_pad] codes (0..255)
    dots = jax.lax.dot_general(
        q.astype(out_dt), rows, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [B, C] = q . codes
    # affine restore + additive penalty: s = scale*(q.codes) + qsum*minv - pen
    qsum = jnp.sum(q, axis=1, keepdims=True)
    s = dots * scale_ref[0, :][None, :] + qsum * minv_ref[0, :][None, :]
    s = s - pen_ref[0, :][None, :]
    gm_ref[:], gi_ref[:] = _bucket_select(s, c * chunk)


@functools.partial(
    jax.jit, static_argnames=("k", "metric", "chunk", "interpret", "unpack_bf16")
)
def sq8_bucket_topk(queries, words, scale, minv, penalty, *, k, metric,
                    chunk, interpret, unpack_bf16=False):
    """Bucket-selection search over block-packed SQ8 codes.

    ``words [N_pad, D_pad/4] int32`` from :func:`sq8_pack_blocked` (N_pad a
    multiple of ``chunk``); ``penalty``: euclidean -> dequantized |c|^2
    (+inf on masked rows); cosine/dot -> 0 (+inf masked). Streams 1/4 the
    HBM bytes of f32. Same output contract as :func:`bucket_topk_entry`;
    cosine assumes rows were normalized BEFORE quantization.
    """
    b, d = queries.shape
    n = words.shape[0]
    d_pad = words.shape[1] * 4
    b_pad = _round_up(max(b, 8), 8)
    q = queries
    qq = jnp.sum(q * q, axis=1)
    if metric is DistanceMetric.COSINE:
        sq = jnp.sum(q * q, axis=1, keepdims=True)
        q = q * jnp.where(sq > 1e-30, jax.lax.rsqrt(jnp.maximum(sq, 1e-30)), 0.0)
    elif metric is DistanceMetric.EUCLIDEAN:
        q = 2.0 * q
    q = jnp.pad(q, ((0, b_pad - b), (0, d_pad - d)))
    grid = (n // chunk,)
    nbuckets = (n // chunk) * _LANES
    s8 = jnp.broadcast_to(scale[None, :], (8, n))
    m8 = jnp.broadcast_to(minv[None, :], (8, n))
    p8 = jnp.broadcast_to(penalty[None, :], (8, n))
    gm, gi = pl.pallas_call(
        functools.partial(_sq8_kernel, chunk=chunk, d_pad=d_pad, unpack_bf16=unpack_bf16),
        grid=grid,
        in_specs=[
            pl.BlockSpec((b_pad, d_pad), lambda c: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (chunk, d_pad // 4), lambda c: (c, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((8, chunk), lambda c: (0, c), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, chunk), lambda c: (0, c), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, chunk), lambda c: (0, c), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((b_pad, _LANES), lambda c: (0, c), memory_space=pltpu.VMEM),
            pl.BlockSpec((b_pad, _LANES), lambda c: (0, c), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b_pad, nbuckets), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, nbuckets), jnp.int32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b_pad * n * d_pad,
            bytes_accessed=n * d_pad + b_pad * d_pad * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(q, words, s8, m8, p8)
    vals, idx = _final_select(gm, gi, k, b)
    if metric is DistanceMetric.EUCLIDEAN:
        return _restore_euclidean(vals, idx, qq)
    return vals, idx


def sq8_int8_rows(codes):
    """Shift ``[N, D] uint8`` SQ8 codes to signed ``[N, D_pad] int8`` rows
    (``code - 128``, dim padded to a lane multiple) for the int8-direct
    kernel: the MXU consumes int8 natively on v5e, so scoring needs NO
    in-kernel unpack at all — the VPU stage the int32-staged kernel pays
    ~3 ops/element for disappears, and the VMEM working set drops to
    1 byte/dim (vs 1 packed + 4 unpacked)."""
    n, d = codes.shape
    d_pad = _round_up(d, _LANES)
    c = jnp.pad(codes, ((0, 0), (0, d_pad - d)), constant_values=128)
    return (c.astype(jnp.int32) - 128).astype(jnp.int8)


def _sq8i_kernel(qi_ref, rows_ref, scale_ref, am_ref, pen_ref, invqs_ref,
                 gm_ref, gi_ref, *, chunk: int):
    c = pl.program_id(0)
    qi = qi_ref[:]  # [B, D_pad] int8 (query / qs, rounded)
    rows = rows_ref[:]  # [C, D_pad] int8 (code - 128)
    doti = jax.lax.dot_general(
        qi, rows, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
    )  # [B, C] int8 x int8 on the MXU
    d = doti.astype(jnp.float32)
    # s/qs = scale*(qi.c8) + sum(qi)*(128*scale + minv) - pen/qs
    # (ranking is invariant to the positive per-query 1/qs scaling; the
    # wrapper multiplies qs back after selection to restore real scores)
    sqi = jnp.sum(qi.astype(jnp.float32), axis=1, keepdims=True)  # [B, 1]
    iq = invqs_ref[:, 0:1]  # [B, 1]
    s = d * scale_ref[0, :][None, :] + sqi * am_ref[0, :][None, :]
    s = s - iq * pen_ref[0, :][None, :]
    gm_ref[:], gi_ref[:] = _bucket_select(s, c * chunk)


@functools.partial(
    jax.jit, static_argnames=("k", "metric", "chunk", "interpret")
)
def sq8i_bucket_topk(queries, rows8, scale, minv, penalty, *, k, metric,
                     chunk, interpret):
    """Bucket-selection search over signed-int8 SQ8 rows with int8 MXU dots.

    ``rows8 [N_pad, D_pad] int8`` from :func:`sq8_int8_rows`. Queries are
    quantized per-row symmetric (``qi = round(q / qs)``, ``qs =
    max|q|/127``) so the matmul runs int8 x int8 -> int32 — 1 HBM byte per
    dim like the packed kernel but zero unpack VPU work. Query quantization
    adds ~qs/2 per-element noise on top of the corpus SQ8 noise; the
    collection layer's auto-rerank recovers it like any quantized path.
    Same output contract as :func:`sq8_bucket_topk`.
    """
    b, d = queries.shape
    n, d_pad = rows8.shape
    b_pad = _round_up(max(b, 8), 8)
    q = queries
    qq = jnp.sum(q * q, axis=1)
    if metric is DistanceMetric.COSINE:
        sq = jnp.sum(q * q, axis=1, keepdims=True)
        q = q * jnp.where(sq > 1e-30, jax.lax.rsqrt(jnp.maximum(sq, 1e-30)), 0.0)
    elif metric is DistanceMetric.EUCLIDEAN:
        q = 2.0 * q
    qs = jnp.max(jnp.abs(q), axis=1) / 127.0  # [B]
    qs = jnp.maximum(qs, 1e-30)
    qi = jnp.round(q / qs[:, None]).astype(jnp.int8)
    qi = jnp.pad(qi, ((0, b_pad - b), (0, d_pad - d)))
    qs = jnp.pad(qs, (0, b_pad - b), constant_values=1.0)
    invqs = jnp.broadcast_to((1.0 / qs)[:, None], (b_pad, _LANES))
    grid = (n // chunk,)
    nbuckets = (n // chunk) * _LANES
    am = 128.0 * scale + minv  # folds the code-128 shift back in
    s8 = jnp.broadcast_to(scale[None, :], (8, n))
    a8 = jnp.broadcast_to(am[None, :], (8, n))
    p8 = jnp.broadcast_to(penalty[None, :], (8, n))
    gm, gi = pl.pallas_call(
        functools.partial(_sq8i_kernel, chunk=chunk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((b_pad, d_pad), lambda c: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, d_pad), lambda c: (c, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, chunk), lambda c: (0, c), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, chunk), lambda c: (0, c), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, chunk), lambda c: (0, c), memory_space=pltpu.VMEM),
            pl.BlockSpec((b_pad, _LANES), lambda c: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((b_pad, _LANES), lambda c: (0, c), memory_space=pltpu.VMEM),
            pl.BlockSpec((b_pad, _LANES), lambda c: (0, c), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b_pad, nbuckets), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, nbuckets), jnp.int32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b_pad * n * d_pad,
            bytes_accessed=n * d_pad + b_pad * d_pad,
            transcendentals=0,
        ),
        interpret=interpret,
    )(qi, rows8, s8, a8, p8, invqs)
    vals, idx = _final_select(gm, gi, k, b)
    vals = vals * qs[:b, None]  # undo the 1/qs ranking normalization
    if metric is DistanceMetric.EUCLIDEAN:
        return _restore_euclidean(vals, idx, qq)
    return vals, idx


@functools.partial(
    jax.jit, static_argnames=("k", "m", "metric", "chunk", "interpret")
)
def sq8i_rerank_topk(queries, rows8, scale, minv, penalty, corpus, *, k, m,
                     metric, chunk, interpret):
    """int8-assisted exact search: coarse int8 bucket scan + in-program f32
    gather-rerank, ONE dispatch.

    The int8 shadow scan reads 1/4 the f32 bytes, then the ``m`` coarse
    winners per query are gathered from the resident f32 corpus and
    rescored exactly in the same program. ``corpus [N_pad, D]`` f32
    (cosine: pre-normalized rows). Returns metric-native ``(vals, ids)``.

    MEASURED ENVELOPE (v5e, 1M x 128D dense clustered): quality is
    exact-grade — 0.998 recall / 1.000 eps-recall(0.1%) vs the TRUE
    host-f32 oracle at m=40 (early "0.96" readings were device-oracle
    near-tie artifacts; MXU f32 swaps ~3% of concentrated top-10).
    Since r3e this IS the serve default for FULL collections at D < 512
    (`index/brute.py`): r3b's "94K QPS gather cap" reading was a
    partition-slice artifact — per-ROW gathers pipeline at the ~9GB/s
    transaction wall (benchmarks/exp_gather_kernel.py), so the
    [B, m, D] candidate gather costs ~0.06ms per 256-batch at m=16 and
    the assist path measures 383K QPS @200Kx128D at host-oracle recall
    0.9973 vs the split-bf16 kernel's 279K @ 0.9906
    (benchmarks/exp_sq8_assist.py). The rerank einsum runs at HIGHEST
    MXU precision (true-f32 emulation; it is O(B*m*D), a rounding error
    next to the scan) so rescored values are genuinely exact.

    Reference analog: ``dual_precision.rs`` int8 scan + f32 rerank, fused
    into one XLA program instead of two passes.
    """
    b, d = queries.shape
    cv, ci = sq8i_bucket_topk(
        queries, rows8, scale, minv, penalty, k=m, metric=metric,
        chunk=chunk, interpret=interpret,
    )  # [B, m] coarse (metric-native values, but we only need ids)
    return _exact_rerank_tail(queries, corpus, ci, k=k, metric=metric)


def _exact_rerank_tail(queries, corpus, ci, *, k, metric):
    """Gather ``ci`` coarse candidates from the resident f32 corpus and
    rescore exactly in the same program (HIGHEST-precision einsum; O(B*m*D),
    a rounding error next to the coarse scan). Shared by the Pallas assist
    kernel and its pure-XLA twin so both serve identical fidelity."""
    safe = jnp.maximum(ci, 0)
    cand = corpus[safe]  # [B, m, D] gather of coarse winners
    if metric is DistanceMetric.COSINE:
        sq = jnp.sum(queries * queries, axis=1, keepdims=True)
        qn = queries * jnp.where(
            sq > 1e-30, jax.lax.rsqrt(jnp.maximum(sq, 1e-30)), 0.0
        )
    else:
        qn = queries
    dots = jnp.einsum(
        "bd,bmd->bm", qn, cand, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    if metric is DistanceMetric.EUCLIDEAN:
        qq = jnp.sum(qn * qn, axis=1, keepdims=True)
        csq = jnp.sum(cand * cand, axis=-1)
        exact = qq + csq - 2.0 * dots  # d^2, lower better
        exact = jnp.where(ci < 0, jnp.inf, exact)
        neg, order = jax.lax.top_k(-exact, k)
        ids = jnp.take_along_axis(ci, order, axis=1)
        return jnp.sqrt(jnp.maximum(-neg, 0.0)), ids
    if metric is DistanceMetric.COSINE:
        # corpus rows pre-normalized -> dots are cosine similarities
        exact = jnp.where(ci < 0, -jnp.inf, dots)
    else:
        exact = jnp.where(ci < 0, -jnp.inf, dots)
    vals, order = jax.lax.top_k(exact, k)
    ids = jnp.take_along_axis(ci, order, axis=1)
    return vals, jnp.where(vals == -jnp.inf, -1, ids)


@functools.partial(
    jax.jit, static_argnames=("k", "m", "metric", "recall_target")
)
def sq8i_xla_rerank_topk(queries, rows8, scale, minv, penalty, corpus, *, k,
                         m, metric, recall_target=0.99):
    """Pure-XLA twin of :func:`sq8i_rerank_topk`: one monolithic
    int8 x int8 ``dot_general`` over the whole shadow (XLA lowers it onto
    the v5e MXU natively), ``approx_max_k`` coarse selection, then the
    shared exact-f32 rerank tail. No Pallas anywhere — this is the assist
    fallback when the Mosaic kernel family demotes, keeping exact-grade
    rerank fidelity from the SAME +1B/dim shadow arrays instead of paying
    the +4B/dim split-bf16 shadow rebuild (ADVICE r3).

    DECISION SWEEP (v5e, same-run, 1M x 128D L2, benchmarks/exp_mono4):

        ship kernel m16 : 250.1K b256 / 26.8K b16   host recall 0.9984
        twin m16 rt0.95 : 267.0K      / 26.0K                   0.9887
        twin m16 rt0.99 : 255.4K      / 26.5K                   0.9973
        twin m32 rt0.95 : 264.9K      / 28.0K                   0.9949
        twin m64 rt0.95 : 223.9K      / 24.7K                   0.9973
        twin m64 rt0.99 : 147.0K      / 25.1K                   0.9988

    ``approx_max_k``'s PartialReduce drops true top-m candidates BEFORE
    the exact rerank — the recall gap vs the kernel's exact bucket
    selection, and why no twin point dominates: at matched recall the QPS
    tie goes to the kernel, so the kernel stays serve default and the
    twin ships at ``recall_target=0.99`` (the best fallback point;
    rt=0.95's +4% QPS is not worth -0.009 recall). Either way the twin
    sits far above the plain f32 bucket kernel's 0.953 demotion floor.
    """
    b, d = queries.shape
    n, d_pad = rows8.shape
    q = queries
    if metric is DistanceMetric.COSINE:
        sq = jnp.sum(q * q, axis=1, keepdims=True)
        q = q * jnp.where(
            sq > 1e-30, jax.lax.rsqrt(jnp.maximum(sq, 1e-30)), 0.0
        )
    elif metric is DistanceMetric.EUCLIDEAN:
        q = 2.0 * q
    qs = jnp.maximum(
        jnp.max(jnp.abs(q), axis=1, keepdims=True), 1e-30
    ) / 127.0  # [B, 1] symmetric per-query quant step
    qi = jnp.round(q / qs).astype(jnp.int8)
    if d_pad > d:
        qi = jnp.pad(qi, ((0, 0), (0, d_pad - d)))
    doti = jax.lax.dot_general(
        qi, rows8, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # [B, N] int8 x int8 -> int32 on the MXU
    am = 128.0 * scale + minv  # folds the code-128 shift back in
    sqi = jnp.sum(qi.astype(jnp.float32), axis=1, keepdims=True)
    s = qs * (
        doti.astype(jnp.float32) * scale[None, :] + sqi * am[None, :]
    ) - penalty[None, :]
    cv, ci = jax.lax.approx_max_k(s, m, recall_target=recall_target)
    # kernel-family contract (_final_select): -inf coarse scores are
    # penalty-knocked-out rows (mask-filtered / tombstoned / pad) — map
    # them to -1 BEFORE the rerank or their true f32 distance un-masks them
    ci = jnp.where(cv == -jnp.inf, -1, ci)
    return _exact_rerank_tail(queries, corpus, ci, k=k, metric=metric)
