"""Single-program hybrid search: vector scan + BM25 scatter-add + RRF in ONE
jitted dispatch.

The r5 stage profile (`benchmarks/exp_hybrid_profile.py`) attributed the
hybrid floor to tunnel ROUND TRIPS, not host work: the 3-program form
(`_search_device` + `Bm25Index.search_batch_dev` + `rrf_fuse_topk`) pays a
per-array H2D transfer and a per-program dispatch wall — ~5 round trips ≈
150ms/batch on the remote-attached chip while the device compute itself is
~1ms. This module collapses the device side to ONE program (plus one batched
`device_put` for the host inputs and the existing single readback), serving
the common hybrid case: exact vector engine over FULL-precision storage.

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
    static_argnames=("k", "fetch", "metric", "n_pad_t", "vector_core"),
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
    *,
    k: int,
    fetch: int,
    metric: DistanceMetric,
    n_pad_t: int,
    vector_core: str,
):
    """Fused hybrid top-k. Returns ``(vals [B, k], slots [B, k])``.

    ``vector_core``: ``"streamed"`` (the on-TPU D>=512 serve default,
    scan+PartialReduce) or ``"fused"`` (the XLA fallback core —
    ``pairwise_scores`` + masked ``top_k`` — which is what ``brute.search``
    itself runs when Pallas is unavailable, e.g. the CPU test mesh).
    ``mask_v [n_pad]``/``mask_t [n_pad_t]`` may be ``None`` (separate
    compile). ``w_txt``/``rrf_k`` follow :func:`rrf_fuse_topk` semantics.
    """
    from velesdb_tpu.ops.fused_rrf import rrf_fuse_topk

    valid2 = valid if mask_v is None else jnp.logical_and(valid, mask_v)
    if vector_core == "streamed":
        v_vals, v_idx = streamed_topk(
            q, corpus, valid=valid2, k=fetch, metric=metric,
            corpus_sqnorm=cnorm,
        )
    else:
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
