"""On-device weighted RRF fusion of two top-k branch lists.

TPU re-architecture of the reference's hybrid fusion (``hybrid_search``,
``collection/search/text.rs:113-221``: fetch 2k per branch, host HashMap
RRF). The host form costs the serving path two readback RTTs through the
tunnel (vector branch + text branch) plus a per-row Python fusion loop; here
both branches stay DEVICE-resident and a single jitted program computes

    fused(slot) = w / (rrf_k + rank_vec + 1) + (1 - w) / (rrf_k + rank_txt + 1)

then top-k — so the whole hybrid query pays ONE readback of ``[B, k]`` pairs.

Duplicate resolution is O(F^2) over the concatenated candidate window
(F = 2*fetch, typically 40-80): an equality mask matmul sums each slot's
contributions and the lower-triangular "earlier occurrence" mask zeroes
duplicates — no ``[B, n_pad]`` dense scatter, so the program is independent
of corpus size (no recompile as the collection grows, no 1GB dense buffer
at 1M rows; the BM25 scorer itself already owns the dense pass).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["rrf_fuse_topk"]

RRF_K = 60.0  # reference default (text.rs hybrid_search)


@functools.partial(jax.jit, static_argnames=("k",))
def rrf_fuse_topk(v_vals, v_idx, t_vals, t_idx, w_vec, w_txt=None, rrf_k=None,
                  *, k):
    """Fuse vector and text branch top lists into a weighted-RRF top-k.

    ``v_vals/v_idx [B, Fv]``: vector branch scores + slot indices, rank
    order, ``-1``/non-finite = empty. ``t_vals/t_idx [B, Ft]``: BM25 branch,
    ``slot == -1`` or ``score <= 0`` = empty. ``w_vec``/``w_txt``: traced
    scalar branch weights (a Python float would bake into the compile;
    ``w_txt`` defaults to ``1 - w_vec`` — the ``hybrid_search`` split).
    ``rrf_k`` defaults to the reference's 60; explicit values serve VelesQL
    ``USING FUSION RRF(k=...)``, where both weights are 1 (plain
    :func:`velesdb_tpu.fusion.rrf_fuse`). Returns ``(fused [B, k],
    slots [B, k])``, empty slots ``-1``.

    Semantics match :func:`velesdb_tpu.fusion.weighted_rrf` (rank is the
    1-based branch position); ties break by candidate-window position
    (vector list first) rather than the host's smaller-id rule.
    """
    w_vec = jnp.asarray(w_vec, jnp.float32)
    w_txt = (1.0 - w_vec) if w_txt is None else jnp.asarray(w_txt, jnp.float32)
    rk = RRF_K if rrf_k is None else jnp.asarray(rrf_k, jnp.float32)
    fv = v_idx.shape[1]
    ft = t_idx.shape[1]
    rv = w_vec / (rk + 1.0 + jnp.arange(fv, dtype=jnp.float32))[None, :]
    rv = jnp.where((v_idx >= 0) & jnp.isfinite(v_vals), rv, 0.0)
    rt = w_txt / (rk + 1.0 + jnp.arange(ft, dtype=jnp.float32))[None, :]
    rt = jnp.where((t_idx >= 0) & (t_vals > 0.0), rt, 0.0)

    ids = jnp.concatenate([v_idx.astype(jnp.int32), t_idx.astype(jnp.int32)],
                          axis=1)                       # [B, F]
    contrib = jnp.concatenate([rv, rt], axis=1)         # [B, F]
    valid = contrib > 0.0
    ids = jnp.where(valid, ids, -1)

    # each candidate's total = sum of contributions at positions holding the
    # same slot; only the FIRST occurrence keeps it (duplicates zero out)
    eq = (ids[:, :, None] == ids[:, None, :]) & valid[:, :, None] & valid[:, None, :]
    tot = jnp.einsum("bij,bj->bi", eq.astype(jnp.float32), contrib)
    f = ids.shape[1]
    earlier = jnp.tril(jnp.ones((f, f), bool), k=-1)[None]
    dup = jnp.any(eq & earlier, axis=2)
    fused = jnp.where(valid & ~dup, tot, 0.0)

    # exact host tie semantics (fusion.py sorts by (-score, id)): a variadic
    # lexicographic sort instead of top_k — rank ties (ubiquitous in RRF:
    # rank r in EITHER branch contributes the identical w/(k+r+1)) resolve
    # to the smaller slot, matching the host fusion id-for-id
    sort_ids = jnp.where(fused > 0.0, ids, jnp.iinfo(jnp.int32).max)
    neg_vals, out_ids = jax.lax.sort(
        (-fused, sort_ids), dimension=1, num_keys=2
    )
    vals = -neg_vals[:, :k]
    out_ids = out_ids[:, :k]
    return vals, jnp.where(vals > 0.0, out_ids, -1)
