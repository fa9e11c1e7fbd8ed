"""Pallas kernel tests (interpret mode on CPU; compiled on real TPU).

Mirrors the reference's SIMD kernel unit tests (``simd_avx512_tests.rs``
etc., SURVEY.md §4): every kernel validated against the plain jnp reference.
"""

import numpy as np
import pytest

from velesdb_tpu.ops import DistanceMetric, pairwise_scores
from velesdb_tpu.ops.pallas_kernels import fused_topk


def _reference(q, c, k, metric, valid=None):
    s = np.asarray(pairwise_scores(q, c, metric))
    if valid is not None:
        s = np.where(
            np.asarray(valid)[None, :],
            s,
            -np.inf if metric.higher_is_better else np.inf,
        )
    order = (
        np.argsort(-s, axis=1) if metric.higher_is_better else np.argsort(s, axis=1)
    )[:, :k]
    return np.take_along_axis(s, order, axis=1), order


@pytest.mark.parametrize(
    "metric",
    [DistanceMetric.COSINE, DistanceMetric.DOT_PRODUCT, DistanceMetric.EUCLIDEAN],
)
def test_fused_topk_matches_reference(rng, metric):
    b, n, d, k = 16, 1000, 96, 10
    q = rng.standard_normal((b, d)).astype(np.float32)
    c = rng.standard_normal((n, d)).astype(np.float32)
    vals, idx = fused_topk(q, c, k=k, metric=metric, chunk=256)
    ref_v, ref_i = _reference(q, c, k, metric)
    assert np.array_equal(np.asarray(idx), ref_i), metric
    np.testing.assert_allclose(np.asarray(vals), ref_v, rtol=1e-4, atol=1e-4)


def test_fused_topk_masked(rng):
    b, n, d, k = 4, 500, 32, 8
    q = rng.standard_normal((b, d)).astype(np.float32)
    c = rng.standard_normal((n, d)).astype(np.float32)
    valid = rng.random(n) < 0.4
    vals, idx = fused_topk(q, c, valid=valid, k=k, metric=DistanceMetric.COSINE, chunk=256)
    idx = np.asarray(idx)
    assert valid[idx[idx >= 0]].all()
    ref_v, ref_i = _reference(q, c, k, DistanceMetric.COSINE, valid=valid)
    assert np.array_equal(idx, ref_i)


def test_fused_topk_k_exceeds_valid_rows(rng):
    q = rng.standard_normal((2, 16)).astype(np.float32)
    c = rng.standard_normal((20, 16)).astype(np.float32)
    valid = np.zeros(20, bool)
    valid[[3, 7]] = True
    vals, idx = fused_topk(q, c, valid=valid, k=5, metric=DistanceMetric.DOT_PRODUCT)
    idx = np.asarray(idx)
    assert set(idx[0][idx[0] >= 0]) == {3, 7}
    assert (np.asarray(vals)[idx < 0] == -np.inf).all()


def test_fused_topk_duplicate_scores_unique_indices(rng):
    # ties must not yield duplicated indices (one-hot first-occurrence path)
    c = np.zeros((64, 8), np.float32)
    c[:, 0] = 1.0  # every row identical
    q = np.ones((1, 8), np.float32)
    vals, idx = fused_topk(q, c, k=10, metric=DistanceMetric.DOT_PRODUCT, chunk=128)
    row = np.asarray(idx)[0]
    assert len(set(row.tolist())) == 10


def test_fused_topk_unaligned_shapes(rng):
    # b=3 (pad to 8), d=100 (pad to 128), n=777 (pad to chunk multiple)
    q = rng.standard_normal((3, 100)).astype(np.float32)
    c = rng.standard_normal((777, 100)).astype(np.float32)
    vals, idx = fused_topk(q, c, k=7, metric=DistanceMetric.EUCLIDEAN, chunk=256)
    ref_v, ref_i = _reference(q, c, 7, DistanceMetric.EUCLIDEAN)
    assert np.array_equal(np.asarray(idx), ref_i)
    np.testing.assert_allclose(np.asarray(vals), ref_v, rtol=1e-4, atol=1e-4)


# -- binary Hamming kernel -------------------------------------------------------


def test_hamming_topk_matches_reference(rng):
    from velesdb_tpu.ops import binary_quantize, pairwise_hamming_packed
    from velesdb_tpu.ops.pallas_kernels import hamming_topk

    b, n, d, k = 8, 700, 256, 10
    q = rng.standard_normal((b, d)).astype(np.float32)
    c = rng.standard_normal((n, d)).astype(np.float32)
    pq, pc = binary_quantize(q), binary_quantize(c)
    dist, idx = hamming_topk(pq, pc, k=k, chunk=256)
    ref_d = np.asarray(pairwise_hamming_packed(pq, pc))
    order = np.argsort(ref_d, kind="stable", axis=1)[:, :k]
    # distances must match exactly (integer domain); indices up to ties
    np.testing.assert_array_equal(
        np.asarray(dist).astype(int),
        np.take_along_axis(ref_d, order, axis=1),
    )
    got_sets = [set(np.asarray(idx)[i].tolist()) for i in range(b)]
    for i in range(b):
        kth = ref_d[i][order[i][-1]]
        must = set(np.flatnonzero(ref_d[i] < kth).tolist())
        assert must <= got_sets[i]  # strictly-better rows always included


def test_hamming_topk_masked(rng):
    from velesdb_tpu.ops import binary_quantize
    from velesdb_tpu.ops.pallas_kernels import hamming_topk

    q = rng.standard_normal((2, 64)).astype(np.float32)
    c = rng.standard_normal((100, 64)).astype(np.float32)
    valid = np.zeros(100, bool)
    valid[[4, 9]] = True
    dist, idx = hamming_topk(
        binary_quantize(q), binary_quantize(c), valid=valid, k=5, chunk=256
    )
    idx = np.asarray(idx)
    assert set(idx[0][idx[0] >= 0].tolist()) == {4, 9}
    assert np.isinf(np.asarray(dist)[idx < 0]).all()
