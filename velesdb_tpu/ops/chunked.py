"""Chunked exact top-k: stream the corpus through VMEM-sized score blocks.

For corpora too large to score in one materialized ``[B, N]`` matrix, scan over
corpus chunks with a running top-k merge. This is the TPU analog of the
reference's streaming batch top-k (``batch_similarity_top_k``,
``simd_explicit.rs:583``) and the workhorse behind both large-N brute-force
search and kNN-graph construction (SURVEY.md §7 build plan step 3).

The scan body is one MXU matmul (``[qb, D] x [D, cb]``) + ``lax.top_k`` +
merge — XLA pipelines the HBM reads of successive chunks against compute.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from velesdb_tpu.ops.distance import DistanceMetric, pairwise_scores
from velesdb_tpu.ops.topk import top_k

__all__ = ["chunked_topk", "brute_force_topk", "self_knn"]


@functools.partial(
    jax.jit, static_argnames=("k", "metric", "q_block", "chunk")
)
def _self_knn_device(corpus, valid, *, k, metric, q_block, chunk):
    """Exact self-kNN graph (self-edges excluded) as ONE device program.

    Outer ``lax.scan`` over query blocks, inner ``lax.scan`` over corpus
    chunks with a running top-k — the kNN-graph build issues a single
    dispatch regardless of N (per-block host loops pay one tunnel round
    trip each, which dominated build time on remote-attached TPUs).
    """
    n_pad = corpus.shape[0]
    hib = metric.higher_is_better
    worst = jnp.float32(-jnp.inf if hib else jnp.inf)
    corpus_c = corpus.reshape(n_pad // chunk, chunk, corpus.shape[1])
    valid_c = valid.reshape(n_pad // chunk, chunk)

    def q_block_body(_, qi):
        q = jax.lax.dynamic_slice_in_dim(corpus, qi * q_block, q_block)
        row = jax.lax.broadcasted_iota(jnp.int32, (q_block, chunk), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (q_block, chunk), 1)

        def chunk_body(carry, inp):
            run_v, run_i = carry
            c_idx, c_vecs, c_valid = inp
            scores = pairwise_scores(q, c_vecs, metric)
            gcol = col + c_idx * chunk
            m = c_valid[None, :] & (gcol != (row + qi * q_block))
            scores = jnp.where(m, scores, worst)
            vals, idx = top_k(scores, min(k, chunk), higher_is_better=hib)
            gidx = idx + c_idx * chunk
            mv, pos = top_k(
                jnp.concatenate([run_v, vals], axis=1), k, higher_is_better=hib
            )
            mi = jnp.take_along_axis(
                jnp.concatenate([run_i, gidx], axis=1), pos, axis=1
            )
            return (mv, mi), None

        init = (
            jnp.full((q_block, k), worst, jnp.float32),
            jnp.full((q_block, k), -1, jnp.int32),
        )
        (vals, idx), _ = jax.lax.scan(
            chunk_body,
            init,
            (jnp.arange(n_pad // chunk, dtype=jnp.int32), corpus_c, valid_c),
        )
        idx = jnp.where(vals == worst, -1, idx)
        return None, idx

    _, all_idx = jax.lax.scan(
        q_block_body, None, jnp.arange(n_pad // q_block, dtype=jnp.int32)
    )
    return all_idx.reshape(n_pad, k)


def self_knn(corpus, k: int, metric: DistanceMetric, valid=None,
             q_block: int = 1024, c_chunk: int = 16384) -> np.ndarray:
    """kNN graph of a corpus against itself: ``[N, k] int32`` (-1 = none).

    One dispatch, one readback (the graph-index build workhorse).
    """
    is_dev = isinstance(corpus, jax.Array)
    corpus_in = corpus if is_dev else np.asarray(corpus, np.float32)
    n, d = corpus_in.shape
    metric = DistanceMetric(metric)
    if valid is None:
        valid_np = np.ones(n, bool)
    else:
        valid_np = np.asarray(valid, bool)
    c_chunk = min(c_chunk, 1 << max(10, (n - 1).bit_length()))
    block = min(q_block, c_chunk)
    unit = np.lcm(block, c_chunk)
    n_pad = ((n + unit - 1) // unit) * unit
    if is_dev:  # device-resident corpus: pad in place, no host round trip
        corpus_dev = jnp.pad(
            corpus_in.astype(jnp.float32), ((0, n_pad - n), (0, 0))
        )
    else:
        corpus_dev = jax.device_put(np.pad(corpus_in, ((0, n_pad - n), (0, 0))))
    valid_dev = jax.device_put(np.pad(valid_np, (0, n_pad - n)))
    idx = _self_knn_device(
        corpus_dev, valid_dev, k=k, metric=metric, q_block=block, chunk=c_chunk
    )
    return np.asarray(idx[:n])


@functools.partial(
    jax.jit, static_argnames=("k", "metric", "chunk", "exclude_self_base")
)
def chunked_topk(
    queries: jax.Array,
    corpus: jax.Array,
    valid: jax.Array,
    k: int,
    metric: DistanceMetric,
    chunk: int = 65536,
    exclude_self_base: int | None = None,
):
    """Exact top-k of ``queries [B, D]`` against ``corpus [N, D]``.

    ``N`` must be a multiple of ``chunk`` (pad + mask via ``valid``). When
    ``exclude_self_base`` is set, query row ``i`` excludes corpus index
    ``exclude_self_base + i`` (kNN-graph build: a block of the corpus queries
    itself and must not return self-edges).

    Returns ``(values [B, k], indices [B, k])`` best-first.
    """
    metric = DistanceMetric(metric)
    b = queries.shape[0]
    n = corpus.shape[0]
    assert n % chunk == 0, f"corpus rows {n} not a multiple of chunk {chunk}"
    n_chunks = n // chunk
    hib = metric.higher_is_better
    worst = jnp.float32(-jnp.inf if hib else jnp.inf)

    corpus_c = corpus.reshape(n_chunks, chunk, corpus.shape[1])
    valid_c = valid.reshape(n_chunks, chunk)

    def body(carry, inp):
        run_v, run_i = carry
        c_idx, c_vecs, c_valid = inp
        scores = pairwise_scores(queries, c_vecs, metric)
        mask = c_valid[None, :]
        if exclude_self_base is not None:
            row = jax.lax.broadcasted_iota(jnp.int32, (b, chunk), 0)
            col = jax.lax.broadcasted_iota(jnp.int32, (b, chunk), 1)
            gcol = col + c_idx * chunk
            mask = jnp.logical_and(mask, gcol != (row + exclude_self_base))
        scores = jnp.where(mask, scores, worst)
        kk = min(k, chunk)
        vals, idx = top_k(scores, kk, higher_is_better=hib)
        gidx = idx + c_idx * chunk
        all_v = jnp.concatenate([run_v, vals], axis=1)
        all_i = jnp.concatenate([run_i, gidx], axis=1)
        mvals, pos = top_k(all_v, k, higher_is_better=hib)
        mi = jnp.take_along_axis(all_i, pos, axis=1)
        return (mvals, mi), None

    init = (
        jnp.full((b, k), worst, jnp.float32),
        jnp.full((b, k), -1, jnp.int32),
    )
    (vals, idx), _ = jax.lax.scan(
        body,
        init,
        (jnp.arange(n_chunks, dtype=jnp.int32), corpus_c, valid_c),
    )
    return vals, idx


def brute_force_topk(
    queries,
    corpus,
    k: int,
    metric: DistanceMetric,
    valid=None,
    q_block: int = 1024,
    c_chunk: int = 65536,
    exclude_self: bool = False,
    return_device: bool = False,
):
    """Host-orchestrated exact top-k for arbitrary sizes (NumPy in/out).

    Pads the corpus to a chunk multiple, loops query blocks on the host, and
    runs :func:`chunked_topk` per block. The recall ground-truth oracle for the
    ANN suite (reference ``recall_validation.rs``) and the kNN-graph builder.

    Per-block results stay on device and transfer back as ONE concatenated
    array — device->host round trips carry a large fixed latency on
    remote-attached TPUs, so the transfer count (not byte count) dominates.
    ``return_device=True`` skips the host transfer entirely.
    """
    queries = np.atleast_2d(np.asarray(queries, np.float32))
    corpus_np = np.asarray(corpus, np.float32)
    n, d = corpus_np.shape
    c_chunk = min(c_chunk, 1 << max(10, (n - 1).bit_length()))
    n_pad = ((n + c_chunk - 1) // c_chunk) * c_chunk
    if valid is None:
        valid_np = np.ones(n, bool)
    else:
        valid_np = np.asarray(valid, bool)
    corpus_dev = jax.device_put(np.pad(corpus_np, ((0, n_pad - n), (0, 0))))
    valid_dev = jax.device_put(np.pad(valid_np, (0, n_pad - n)))

    out_v, out_i = [], []
    for start in range(0, queries.shape[0], q_block):
        qb = queries[start : start + q_block]
        pad_q = q_block - qb.shape[0]
        qb_p = np.pad(qb, ((0, pad_q), (0, 0)))
        vals, idx = chunked_topk(
            jax.device_put(qb_p),
            corpus_dev,
            valid_dev,
            k,
            metric,
            chunk=c_chunk,
            exclude_self_base=start if exclude_self else None,
        )
        out_v.append(vals[: qb.shape[0]])
        out_i.append(idx[: qb.shape[0]])
    vals = out_v[0] if len(out_v) == 1 else jnp.concatenate(out_v)
    idx = out_i[0] if len(out_i) == 1 else jnp.concatenate(out_i)
    if return_device:
        return vals, idx
    return np.asarray(vals), np.asarray(idx)
