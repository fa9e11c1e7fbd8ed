"""Pallas TPU kernels for the search hot path.

The reference's hot loop is one SIMD distance per visited neighbor
(``simd_explicit.rs``, ``simd_avx512.rs``; dispatch ``simd_dispatch.rs``).
The TPU equivalent is a single fused kernel that streams the corpus from HBM
through VMEM in chunks and keeps a **running top-k in VMEM scratch** — the
score matrix ``[B, N]`` is never materialized, so the kernel is HBM-bandwidth
bound at exactly one read of the corpus per query batch (speed-of-light for
exact search):

    grid step c:  DMA chunk [C, D] -> VMEM      (pipelined by pallas)
                  MXU:  scores = q [B, D] @ chunk.T           (one matmul)
                  VPU:  metric fixup (norms / self-dots), validity mask
                  VPU:  merge chunk scores into running top-k [B, K]

The top-k merge is an iterative max-extraction (K static passes with one-hot
index selection) — sort-free, so it maps onto the VPU without Mosaic's sort
lowering. Outputs are written on the last grid step.

All kernels run in interpret mode off-TPU (that is how the CPU test suite
validates them); callers use :func:`use_pallas` to pick the compiled path on
real TPU hardware.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from velesdb_tpu.ops.distance import DistanceMetric

__all__ = [
    "fused_topk",
    "hamming_topk",
    "use_pallas",
    "DEFAULT_CHUNK",
    "fit_chunk",
]

DEFAULT_CHUNK = 2048  # corpus rows per grid step (VMEM: 2048*768*4 = 6MB @768D)
_NEG_INF = float("-inf")  # Python scalar: jnp constants would be captured


def use_pallas() -> bool:
    """Compiled Pallas path only on real TPU backends."""
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def fit_chunk(b: int, d: int, k: int, itemsize: int = 4, n: int | None = None) -> int:
    """Largest corpus-chunk rows fitting the VMEM budget for this (B, D, K).

    Model (empirically calibrated on v5e — chunk=2048 fits at b=256/d=768
    while 3072 OOMs): double-buffered corpus chunk + resident queries +
    ~one [B, chunk+2*k_pad] f32 merge working set (Mosaic fuses the rest).
    An over-estimate only costs speed; an under-estimate trips the sticky
    XLA fallback in BruteForceIndex, so lean aggressive."""
    b_pad = _round_up(b, 8)
    d_pad = _round_up(d, 128)
    k_pad = _round_up(max(k, 8), 128)
    budget = 16 * 1024 * 1024 - b_pad * d_pad * 4 - 8 * b_pad * k_pad
    denom = 2 * d_pad * itemsize + 4 * b_pad
    fit = max(256, (budget // denom) // 256 * 256)
    if n is not None:
        fit = min(fit, _round_up(n, 256))
    return int(min(fit, DEFAULT_CHUNK))


def _merge_topk(run_v, run_i, cand_v, cand_i, k_pad: int, k_sel: int):
    """Merge candidate scores into the running top-k (maximization).

    ``run_v/run_i [B, K]``, ``cand_v/cand_i [B, C]``. Exactly ``k_sel``
    (the caller's true k) passes of max + one-hot extract — no sort
    primitive needed on the VPU; ``k_pad`` is only the lane-aligned layout
    width, never the loop bound.
    """
    b = run_v.shape[0]
    merged_v = jnp.concatenate([run_v, cand_v], axis=1)
    merged_i = jnp.concatenate([run_i, cand_i], axis=1)
    width = merged_v.shape[1]
    cols = jax.lax.broadcasted_iota(jnp.int32, (b, width), 1)
    out_cols = jax.lax.broadcasted_iota(jnp.int32, (b, k_pad), 1)

    def body(j, state):
        mv, mi, ov, oi = state
        best_v = jnp.max(mv, axis=1, keepdims=True)  # [B, 1]
        is_best = mv == best_v
        # first occurrence only
        first_col = jnp.min(jnp.where(is_best, cols, width), axis=1, keepdims=True)
        onehot = cols == first_col
        best_i = jnp.sum(jnp.where(onehot, mi, 0), axis=1, keepdims=True)
        # column write via iota mask (dynamic_update_slice has no Mosaic
        # lowering on the TC kernel type)
        at_j = out_cols == j
        ov = jnp.where(at_j, best_v, ov)
        oi = jnp.where(at_j, best_i, oi)
        mv = jnp.where(onehot, _NEG_INF, mv)
        return mv, mi, ov, oi

    out_v = jnp.full((b, k_pad), _NEG_INF, jnp.float32)
    out_i = jnp.full((b, k_pad), -1, jnp.int32)
    _, _, out_v, out_i = jax.lax.fori_loop(
        0, k_sel, body, (merged_v, merged_i, out_v, out_i)
    )
    return out_v, out_i


def _fused_kernel(
    q_ref,  # [B, D] VMEM (resident across steps)
    corpus_ref,  # [C, D] VMEM (this grid step's chunk)
    valid_ref,  # [8, C] f32 VMEM (row 0 = 1.0 valid / 0.0 masked)
    cnorm_ref,  # [8, C] f32 VMEM (row 0 = |c|^2, corpus-static precompute)
    vals_ref,  # [B, K] out
    idx_ref,  # [B, K] out
    run_v,  # [B, K] VMEM scratch
    run_i,  # [B, K] VMEM scratch
    *,
    metric: DistanceMetric,
    chunk: int,
    k_pad: int,
    k_sel: int,
):
    c = pl.program_id(0)
    nsteps = pl.num_programs(0)

    @pl.when(c == 0)
    def _init():
        run_v[:] = jnp.full_like(run_v, _NEG_INF)
        run_i[:] = jnp.full_like(run_i, -1)

    q = q_ref[:]
    # f16/bf16 corpora halve HBM traffic; upcast per chunk for the MXU
    # (native bf16 dot_general with a transposed rhs lowers poorly in
    # Mosaic — measured 20x slower than upcast+f32 matmul)
    chunk_rows = corpus_ref[:].astype(jnp.float32)
    dots = jax.lax.dot_general(
        q,
        chunk_rows,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [B, C]

    if metric is DistanceMetric.DOT_PRODUCT:
        scores = dots
    elif metric is DistanceMetric.COSINE:
        # queries pre-normalized by the wrapper; corpus norms are a
        # corpus-static input — never recomputed per chunk per batch
        sq = cnorm_ref[0, :][None, :]
        inv = jax.lax.rsqrt(jnp.maximum(sq, 1e-30))
        scores = dots * jnp.where(sq > 1e-30, inv, 0.0)
    elif metric is DistanceMetric.EUCLIDEAN:
        cc = cnorm_ref[0, :][None, :]
        # |q|^2 computed in-kernel from the resident queries: a [B, 128]
        # aux input sliced as [:, :1] read garbage under Mosaic (lane-0
        # slice mis-lowering), which flattened every euclidean score
        qq = jnp.sum(q * q, axis=1, keepdims=True)
        d2 = jnp.maximum(qq + cc - 2.0 * dots, 0.0)
        scores = -d2  # maximize
    else:
        raise ValueError(f"unsupported metric {metric}")

    ok = valid_ref[0, :][None, :] > 0.5
    scores = jnp.where(ok, scores, _NEG_INF)

    b = scores.shape[0]
    base = c * chunk
    gidx = base + jax.lax.broadcasted_iota(jnp.int32, (b, chunk), 1)
    gidx = jnp.where(ok, gidx, -1)

    nv, ni = _merge_topk(run_v[:], run_i[:], scores, gidx, k_pad, k_sel)
    run_v[:] = nv
    run_i[:] = ni

    @pl.when(c == nsteps - 1)
    def _finish():
        vals_ref[:] = run_v[:]
        idx_ref[:] = run_i[:]


@functools.partial(
    jax.jit, static_argnames=("k", "metric", "chunk", "interpret")
)
def _fused_topk_entry(queries, corpus, valid, cnorm, *, k, metric, chunk, interpret):
    """One jitted program: normalize/pad/aux prep + the Pallas kernel.

    Keeping the prep inside the jit collapses ~6 eager dispatches per search
    into one host->device round trip — dispatch latency dominates on
    remote-attached TPUs.
    """
    b, d = queries.shape
    n = corpus.shape[0]
    b_pad = _round_up(b, 8)
    d_pad = _round_up(d, 128)
    n_pad = _round_up(n, chunk)

    q = queries
    if metric is DistanceMetric.COSINE:
        sq = jnp.sum(q * q, axis=1, keepdims=True)
        q = q * jnp.where(sq > 1e-30, jax.lax.rsqrt(jnp.maximum(sq, 1e-30)), 0.0)
    q = jnp.pad(q, ((0, b_pad - b), (0, d_pad - d)))
    corpus = jnp.pad(corpus, ((0, n_pad - n), (0, d_pad - d)))
    v = jnp.pad(valid.astype(jnp.float32), (0, n_pad - n))
    v8 = jnp.broadcast_to(v[None, :], (8, n_pad))
    if cnorm is None:  # ad-hoc callers: one extra corpus read, same program
        cnorm = jnp.sum(corpus.astype(jnp.float32) ** 2, axis=1)
    else:
        cnorm = jnp.pad(cnorm.astype(jnp.float32), (0, n_pad - cnorm.shape[0]))
    c8 = jnp.broadcast_to(cnorm[None, :], (8, n_pad))
    vals, idx = _fused_topk_padded(
        q, corpus, v8, c8, k=k, metric=metric, chunk=chunk, interpret=interpret
    )
    return vals[:b], idx[:b]


def _fused_topk_padded(queries, corpus, valid_f32, cnorm_f32, *, k, metric, chunk, interpret):
    b, d = queries.shape
    n = corpus.shape[0]
    k_pad = _round_up(max(k, 8), 128)
    grid = (n // chunk,)
    kernel = functools.partial(
        _fused_kernel, metric=metric, chunk=chunk, k_pad=k_pad, k_sel=k
    )
    vals, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((b, d), lambda c: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, d), lambda c: (c, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, chunk), lambda c: (0, c), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, chunk), lambda c: (0, c), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((b, k_pad), lambda c: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, k_pad), lambda c: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, k_pad), jnp.float32),
            jax.ShapeDtypeStruct((b, k_pad), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((b, k_pad), jnp.float32),
            pltpu.VMEM((b, k_pad), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * d,
            bytes_accessed=n * d * corpus.dtype.itemsize + b * d * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(queries, corpus, valid_f32, cnorm_f32)
    return vals[:, :k], idx[:, :k]


def fused_topk(
    queries,
    corpus,
    valid=None,
    k: int = 10,
    metric: DistanceMetric = DistanceMetric.COSINE,
    chunk: int = DEFAULT_CHUNK,
    interpret: bool | None = None,
    corpus_sqnorm=None,
):
    """Fused streaming distance + top-k. NumPy/JAX in, device arrays out.

    Returns ``(values [B, k], indices [B, k])`` best-first, in the metric's
    native score orientation (cosine/dot similarity; euclidean distance).
    Indices of masked/padded rows are ``-1``.
    """
    metric = DistanceMetric.parse(metric)
    if interpret is None:
        interpret = not use_pallas()
    q = jnp.atleast_2d(jnp.asarray(queries, jnp.float32))
    c = jnp.asarray(corpus)
    b, d = q.shape
    n = c.shape[0]

    chunk = min(chunk, fit_chunk(b, d, k, c.dtype.itemsize, n))

    v = (
        jnp.ones(n, jnp.float32)
        if valid is None
        else jnp.asarray(valid).astype(jnp.float32)
    )
    # euclidean fixup stays outside jit (cheap [B, k] elementwise) so the
    # jitted entry is shared across metrics with identical output contract
    cn = None if corpus_sqnorm is None else jnp.asarray(corpus_sqnorm)
    vals, idx = _fused_topk_entry(
        q, c, v, cn, k=k, metric=metric, chunk=chunk, interpret=interpret
    )
    if metric is DistanceMetric.EUCLIDEAN:
        # kernel maximizes -d^2; surface sqrt(d^2) with +inf for empties
        empty = idx < 0
        vals = jnp.sqrt(jnp.maximum(-vals, 0.0))
        vals = jnp.where(empty, jnp.inf, vals)
    else:
        vals = jnp.where(idx < 0, -jnp.inf, vals)
    return vals, idx


# ---------------------------------------------------------------------------
# binary (bit-packed) Hamming search
# ---------------------------------------------------------------------------


def _hamming_kernel(
    q_ref,  # [B, W_pad] uint32 packed queries (VMEM, resident)
    corpus_ref,  # [C, W_pad] uint32 packed chunk
    valid_ref,  # [8, C] f32
    vals_ref,  # [B, K] out (negated distance, maximization form)
    idx_ref,  # [B, K] out
    run_v,
    run_i,
    *,
    chunk: int,
    k_pad: int,
    k_sel: int,
    n_words: int,
):
    c = pl.program_id(0)
    nsteps = pl.num_programs(0)

    @pl.when(c == 0)
    def _init():
        run_v[:] = jnp.full_like(run_v, _NEG_INF)
        run_i[:] = jnp.full_like(run_i, -1)

    q = q_ref[:]
    rows = corpus_ref[:]
    b = q.shape[0]
    # XOR + popcount accumulated over the packed words (static unroll: the
    # word count is ceil(D/32), e.g. 24 at 768D). VPU-only: the 32x memory
    # saving of binary mode is the point; no MXU involvement needed.
    dist = jnp.zeros((b, chunk), jnp.int32)
    for w in range(n_words):
        x = jnp.bitwise_xor(q[:, w][:, None], rows[:, w][None, :])
        dist = dist + jax.lax.population_count(x).astype(jnp.int32)

    ok = valid_ref[0, :][None, :] > 0.5
    scores = jnp.where(ok, -dist.astype(jnp.float32), _NEG_INF)
    base = c * chunk
    gidx = base + jax.lax.broadcasted_iota(jnp.int32, (b, chunk), 1)
    gidx = jnp.where(ok, gidx, -1)
    nv, ni = _merge_topk(run_v[:], run_i[:], scores, gidx, k_pad, k_sel)
    run_v[:] = nv
    run_i[:] = ni

    @pl.when(c == nsteps - 1)
    def _finish():
        vals_ref[:] = run_v[:]
        idx_ref[:] = run_i[:]


@functools.partial(jax.jit, static_argnames=("k", "chunk", "n_words", "interpret"))
def _hamming_topk_entry(packed_q, packed_corpus, valid, *, k, chunk, n_words, interpret):
    b, w = packed_q.shape
    n = packed_corpus.shape[0]
    b_pad = _round_up(b, 8)
    w_pad = _round_up(w, 128)
    n_pad = _round_up(n, chunk)
    k_pad = _round_up(max(k, 8), 128)
    q = jnp.pad(packed_q, ((0, b_pad - b), (0, w_pad - w)))
    cps = jnp.pad(packed_corpus, ((0, n_pad - n), (0, w_pad - w)))
    v = jnp.pad(valid.astype(jnp.float32), (0, n_pad - n))
    v8 = jnp.broadcast_to(v[None, :], (8, n_pad))
    kernel = functools.partial(
        _hamming_kernel, chunk=chunk, k_pad=k_pad, k_sel=k, n_words=n_words
    )
    vals, idx = pl.pallas_call(
        kernel,
        grid=(n_pad // chunk,),
        in_specs=[
            pl.BlockSpec((b_pad, w_pad), lambda c: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, w_pad), lambda c: (c, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, chunk), lambda c: (0, c), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((b_pad, k_pad), lambda c: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b_pad, k_pad), lambda c: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b_pad, k_pad), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, k_pad), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((b_pad, k_pad), jnp.float32),
            pltpu.VMEM((b_pad, k_pad), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=3 * b_pad * n_pad * n_words,
            bytes_accessed=n_pad * w_pad * 4 + b_pad * w_pad * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(q, cps, v8)
    return vals[:b, :k], idx[:b, :k]


def hamming_topk(packed_q, packed_corpus, valid=None, k: int = 10,
                 chunk: int = 2048, interpret: bool | None = None):
    """Streaming packed-Hamming top-k: smallest distance first.

    ``packed_q [B, W] uint32`` vs ``packed_corpus [N, W] uint32`` (from
    :func:`velesdb_tpu.ops.binary_quantize`). Returns ``(distances [B, k]
    float32, indices [B, k])``; masked/padded rows surface as +inf / -1.
    The reference's ``hamming_distance_binary_fast`` (POPCNT,
    ``simd_explicit.rs:328``) at batch scale.
    """
    if interpret is None:
        interpret = not use_pallas()
    q = jnp.asarray(packed_q, jnp.uint32)
    cps = jnp.asarray(packed_corpus, jnp.uint32)
    n, w = cps.shape
    v = (
        jnp.ones(n, jnp.float32)
        if valid is None
        else jnp.asarray(valid).astype(jnp.float32)
    )
    chunk = int(min(chunk, _round_up(n, 256)))
    neg_d, idx = _hamming_topk_entry(
        q, cps, v, k=k, chunk=chunk, n_words=w, interpret=interpret
    )
    dist = jnp.where(idx < 0, jnp.inf, -neg_d)
    return dist, idx
