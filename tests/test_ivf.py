"""IVF index tests: recall vs exact oracle, masks, persistence, kmeans."""

import numpy as np
import pytest

from velesdb_tpu.index.ivf import IvfIndex, kmeans
from velesdb_tpu.ops import DistanceMetric
from velesdb_tpu.ops.chunked import brute_force_topk


def _clustered(rng, n, d, c=32):
    centers = rng.standard_normal((c, d)).astype(np.float32) * 3
    a = rng.integers(0, c, n)
    return centers[a] + 0.6 * rng.standard_normal((n, d)).astype(np.float32)


def test_kmeans_converges(rng):
    x = _clustered(rng, 2000, 16, c=8)
    cents, assign = kmeans(x, 8, iters=10)
    assign = np.asarray(assign)
    # every cluster used, within-cluster distance << data scale
    assert len(set(assign.tolist())) == 8
    d = np.linalg.norm(x - np.asarray(cents)[assign], axis=1).mean()
    assert d < np.linalg.norm(x - x.mean(0), axis=1).mean() * 0.6


@pytest.mark.parametrize(
    "metric",
    [DistanceMetric.COSINE, DistanceMetric.EUCLIDEAN, DistanceMetric.DOT_PRODUCT],
)
def test_ivf_recall(rng, metric):
    n, d, k = 5000, 32, 10
    corpus = _clustered(rng, n, d)
    queries = _clustered(rng, 64, d)
    idx = IvfIndex(d, metric, n_clusters=32)
    idx.build(corpus)
    vals, rows = idx.search(queries, k, nprobe=8)
    rows = np.asarray(rows)
    _, gt = brute_force_topk(queries, corpus, k, metric)
    hits = sum(len(set(rows[i]) & set(gt[i])) for i in range(len(queries)))
    recall = hits / (len(queries) * k)
    assert recall >= 0.9, f"{metric}: recall {recall}"
    # full probe (every partition incl. splits) = exact
    vals, rows = idx.search(queries, k, nprobe=idx.c)
    rows = np.asarray(rows)
    hits = sum(len(set(rows[i]) & set(gt[i])) for i in range(len(queries)))
    assert hits / (len(queries) * k) >= 0.999


def test_ivf_mask_and_padding(rng):
    n, d = 1000, 16
    corpus = _clustered(rng, n, d)
    idx = IvfIndex(d, DistanceMetric.COSINE, n_clusters=8)
    idx.build(corpus)
    mask = np.zeros(n, bool)
    mask[[5, 17, 400]] = True
    vals, rows = idx.search(corpus[:2], 5, nprobe=8, mask=mask)
    rows = np.asarray(rows)
    live = rows[rows >= 0]
    assert set(live.tolist()) <= {5, 17, 400}
    assert (np.asarray(vals)[rows < 0] == -np.inf).all()


def test_ivf_valid_rows_only(rng):
    n, d = 500, 8
    corpus = _clustered(rng, n, d)
    valid = np.ones(n, bool)
    valid[::2] = False
    idx = IvfIndex(d, DistanceMetric.COSINE, n_clusters=4)
    idx.build(corpus, valid)
    _, rows = idx.search(corpus[:4], 10, nprobe=4)
    rows = np.asarray(rows)
    assert (rows[rows >= 0] % 2 == 1).all()


def test_ivf_save_load(tmp_path, rng):
    n, d = 1000, 16
    corpus = _clustered(rng, n, d)
    idx = IvfIndex(d, DistanceMetric.COSINE, n_clusters=8)
    idx.build(corpus)
    path = str(tmp_path / "ivf.npz")
    idx.save(path, version=3)
    idx2 = IvfIndex(d, DistanceMetric.COSINE)
    assert idx2.load(path, corpus, np.ones(n, bool), version=3)
    v1, r1 = idx.search(corpus[:4], 5, nprobe=8)
    v2, r2 = idx2.search(corpus[:4], 5, nprobe=8)
    assert np.array_equal(np.asarray(r1), np.asarray(r2))
    assert not idx2.load(path, corpus, np.ones(n, bool), version=4)  # stale
