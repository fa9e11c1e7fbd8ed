"""Masked batched top-k and shard-merge primitives.

Replaces the reference's BinaryHeap-based result collection
(``index/hnsw/native/graph.rs:438`` candidate/result heaps and
``batch_similarity_top_k`` ``simd_explicit.rs:583``) with fixed-shape
``lax.top_k`` over score matrices — the idiomatic TPU formulation where the
"heap" is a sort network over a full block of scores.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["top_k", "merge_top_k", "mask_scores"]


def mask_scores(scores: jax.Array, mask, higher_is_better: bool) -> jax.Array:
    """Set masked-out entries to the worst possible score.

    ``mask`` is True for *valid* entries, broadcastable to ``scores``.
    """
    if mask is None:
        return scores
    worst = -jnp.inf if higher_is_better else jnp.inf
    return jnp.where(mask, scores, worst)


@functools.partial(jax.jit, static_argnames=("k", "higher_is_better"))
def top_k(
    scores: jax.Array,
    k: int,
    higher_is_better: bool = True,
    mask=None,
):
    """Top-k over the last axis of ``scores`` with optional validity mask.

    Returns ``(values, indices)``, best first. For lower-is-better metrics the
    returned values are the original (non-negated) scores.
    """
    scores = mask_scores(scores, mask, higher_is_better)
    if higher_is_better:
        vals, idx = jax.lax.top_k(scores, k)
        return vals, idx
    vals, idx = jax.lax.top_k(-scores, k)
    return -vals, idx


@functools.partial(jax.jit, static_argnames=("k", "higher_is_better"))
def merge_top_k(
    values: jax.Array,
    indices: jax.Array,
    k: int,
    higher_is_better: bool = True,
):
    """Merge candidate lists along the last axis into a single top-k.

    ``values/indices`` have shape ``[..., S, K']`` (S shards / partial lists) or
    ``[..., M]``; they are flattened over the trailing axes and re-selected.
    Used to combine per-device partial top-k after an ``all_gather`` over ICI
    (replaces the reference's rayon merge in ``collection/search/batch.rs``).
    """
    flat_v = values.reshape(*values.shape[:-2], -1) if values.ndim > 2 else values
    flat_i = indices.reshape(*indices.shape[:-2], -1) if indices.ndim > 2 else indices
    vals, pos = top_k(flat_v, k, higher_is_better=higher_is_better)
    return vals, jnp.take_along_axis(flat_i, pos, axis=-1)
