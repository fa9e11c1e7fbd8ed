"""Single-program hybrid search: vector scan + BM25 scatter-add + RRF in ONE
jitted dispatch.

The r5 stage profile (`benchmarks/exp_hybrid_profile.py`) attributed the
hybrid floor to tunnel ROUND TRIPS, not host work: the 3-program form
(`_search_device` + `Bm25Index.search_batch_dev` + `rrf_fuse_topk`) pays a
per-array H2D transfer and a per-program dispatch wall — ~5 round trips ≈
150ms/batch on the remote-attached chip while the device compute itself is
~1ms. This module collapses the device side to ONE program (plus one batched
`device_put` for the host inputs and the existing single readback), serving
every FULL-precision vector core the exact engine dispatches to: the
streamed scan (D>=512), the int8-assist families (the D<512 serve defaults
— per-dim enc-select and per-row, Pallas kernels and their pure-XLA twins)
and the XLA fallback.

Corpus/postings arrays are jit ARGUMENTS, never closure captures (a captured
300MB corpus embeds in the remote compile payload and 413s the tunnel).

Reference contrast: `hybrid_search` (`collection/search/text.rs:113-221`)
walks both branches on host and fuses in a HashMap; here the whole query is
one XLA program and only the fused ``[B, k]`` pair ever leaves the device.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from velesdb_tpu.ops.distance import DistanceMetric, pairwise_scores
from velesdb_tpu.ops.streamed import streamed_topk
from velesdb_tpu.ops.topk import top_k
from velesdb_tpu.text.bm25 import bm25_score_blocks

__all__ = ["hybrid_mono_topk"]


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "fetch", "metric", "n_pad_t", "vector_core", "m", "chunk",
        "dim", "interpret",
    ),
)
def hybrid_mono_topk(
    q,
    corpus,
    valid,
    cnorm,
    mask_v,
    block_docs,
    block_scores,
    bid,
    wt,
    mask_t,
    w_vec,
    w_txt,
    rrf_k,
    assist=None,
    *,
    k: int,
    fetch: int,
    metric: DistanceMetric,
    n_pad_t: int,
    vector_core: str,
    m: int = 0,
    chunk: int = 0,
    dim: int = 0,
    interpret: bool = False,
):
    """Fused hybrid top-k. Returns ``(vals [B, k], slots [B, k])``.

    ``vector_core`` mirrors the exact engine's dispatch ladder
    (`index/brute.py serve_engine`):

    - ``"streamed"`` — the on-TPU D>=512 serve default (scan+PartialReduce)
    - ``"assist-pd"`` / ``"assist"`` — the D<512 serve defaults: coarse
      int8 scan (per-dim enc-select / per-row) + in-program exact f32
      rerank; ``assist`` carries the shadow arrays
      (``(rows_pd, ptile, sdim, qu)`` / ``(rows8, scale, minv, pen)``)
      and ``m``/``chunk``/``dim`` the kernel statics
    - ``"assist-pd-xla"`` / ``"assist-xla"`` — their Mosaic-free twins
      (``assist`` = ``(rows_pd, pen_f32, sdim, qu)`` / same per-row tuple)
    - ``"fused"`` — the XLA fallback core (``pairwise_scores`` + masked
      ``top_k``), what ``brute.search`` runs when Pallas is unavailable

    ``mask_v [n_pad]``/``mask_t [n_pad_t]`` may be ``None`` (separate
    compile). For the assist cores validity is already baked into the
    penalty term, so only the filter mask is applied in-program (same
    ``where`` forms as `index/brute.py search`). ``w_txt``/``rrf_k`` follow
    :func:`rrf_fuse_topk` semantics.
    """
    from velesdb_tpu.ops.fused_rrf import rrf_fuse_topk

    if vector_core == "streamed":
        valid2 = valid if mask_v is None else jnp.logical_and(valid, mask_v)
        v_vals, v_idx = streamed_topk(
            q, corpus, valid=valid2, k=fetch, metric=metric,
            corpus_sqnorm=cnorm,
        )
    elif vector_core == "assist-pd":
        from velesdb_tpu.ops.bucket_kernel import (
            _pd_invalid_pen,
            sq8pd_rerank_topk,
        )

        rows_pd, ptile, sdim, qu = assist
        if mask_v is not None:
            ptile = jnp.where(mask_v, ptile, -64 * _pd_invalid_pen(dim))
        v_vals, v_idx = sq8pd_rerank_topk(
            q, rows_pd, ptile, sdim, qu, corpus,
            k=fetch, m=m, metric=metric, chunk=chunk, dim=dim,
            interpret=interpret,
        )
    elif vector_core == "assist-pd-xla":
        from velesdb_tpu.ops.bucket_kernel import sq8pd_xla_rerank_topk

        rows_pd, pen_f32, sdim, qu = assist
        if mask_v is not None:
            pen_f32 = jnp.where(mask_v, pen_f32, jnp.inf)
        v_vals, v_idx = sq8pd_xla_rerank_topk(
            q, rows_pd, pen_f32, sdim, qu, corpus,
            k=fetch, m=m, metric=metric,
        )
    elif vector_core == "assist":
        from velesdb_tpu.ops.bucket_kernel import sq8i_rerank_topk

        rows8, scale, minv, pen8 = assist
        if mask_v is not None:
            pen8 = jnp.where(mask_v, pen8, jnp.inf)
        v_vals, v_idx = sq8i_rerank_topk(
            q, rows8, scale, minv, pen8, corpus,
            k=fetch, m=m, metric=metric, chunk=chunk, interpret=interpret,
        )
    elif vector_core == "assist-xla":
        from velesdb_tpu.ops.bucket_kernel import sq8i_xla_rerank_topk

        rows8, scale, minv, pen8 = assist
        if mask_v is not None:
            pen8 = jnp.where(mask_v, pen8, jnp.inf)
        v_vals, v_idx = sq8i_xla_rerank_topk(
            q, rows8, scale, minv, pen8, corpus,
            k=fetch, m=m, metric=metric,
        )
    else:
        valid2 = valid if mask_v is None else jnp.logical_and(valid, mask_v)
        s = pairwise_scores(q, corpus.astype(jnp.float32), metric)
        v_vals, v_idx = top_k(
            s, fetch, higher_is_better=metric.higher_is_better,
            mask=valid2[None, :],
        )
    t_vals, t_idx = bm25_score_blocks(
        bid, wt, block_docs, block_scores, mask_t, n_pad=n_pad_t, k=fetch
    )
    return rrf_fuse_topk(
        v_vals, v_idx, t_vals, t_idx, w_vec, w_txt, rrf_k, k=k
    )
