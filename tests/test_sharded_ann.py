"""Sharded ANN tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

from velesdb_tpu.index.params import GraphParams
from velesdb_tpu.ops import DistanceMetric
from velesdb_tpu.ops.chunked import brute_force_topk
from velesdb_tpu.parallel import make_mesh
from velesdb_tpu.parallel.sharded_ann import ShardedGraphIndex


def _clustered(rng, n, d, c=16):
    centers = rng.standard_normal((c, d)).astype(np.float32) * 2
    a = rng.integers(0, c, n)
    return centers[a] + 0.5 * rng.standard_normal((n, d)).astype(np.float32)


@pytest.mark.parametrize("metric", [DistanceMetric.COSINE, DistanceMetric.EUCLIDEAN])
@pytest.mark.parametrize("dp", [1, 2])
def test_sharded_ann_recall(rng, metric, dp):
    mesh = make_mesh(8, dp=dp)
    n, d, k = 4000, 32, 10
    corpus = _clustered(rng, n, d)
    queries = _clustered(rng, 64, d)
    idx = ShardedGraphIndex(mesh, d, metric, params=GraphParams(degree=24, knn_k=12))
    idx.build(corpus)
    vals, rows = idx.search(queries, k, ef=128)
    assert rows.shape == (64, k)
    assert rows.min() >= 0 and rows.max() < n
    _, gt = brute_force_topk(queries, corpus, k, metric)
    hits = sum(
        len(set(rows[i].tolist()) & set(gt[i].tolist())) for i in range(len(queries))
    )
    recall = hits / (len(queries) * k)
    assert recall >= 0.9, f"sharded ANN recall {recall:.3f} too low ({metric}, dp={dp})"
    # scores must be exact for the rows returned
    if metric is DistanceMetric.COSINE:
        qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
        cn = corpus / np.linalg.norm(corpus, axis=1, keepdims=True)
        expect = np.take_along_axis(qn @ cn.T, rows, axis=1)
        np.testing.assert_allclose(vals, expect, rtol=1e-3, atol=1e-3)


def test_sharded_ann_entry_ivf(rng):
    """Per-shard SQ8 entry IVFs (r3c) shard over rows and serve the beam
    entry stage via the XLA SQ8 scan inside shard_map; recall must hold and
    returned scores stay exact."""
    mesh = make_mesh(8)
    n, d, k = 40_000, 32, 10  # 5K rows/shard >= the 4096 entry-IVF gate
    corpus = _clustered(rng, n, d)
    queries = _clustered(rng, 64, d)
    idx = ShardedGraphIndex(
        mesh, d, DistanceMetric.EUCLIDEAN,
        params=GraphParams(degree=24, knn_k=12, entry_probes=8,
                           entry_points=32),
    )
    idx.build(corpus)
    assert idx._entry is not None, "per-shard entry IVFs must assemble"
    vals, rows = idx.search(queries, k, ef=128)
    assert rows.min() >= 0 and rows.max() < n
    _, gt = brute_force_topk(queries, corpus, k, DistanceMetric.EUCLIDEAN)
    recall = np.mean(
        [len(set(rows[i].tolist()) & set(gt[i].tolist())) / k
         for i in range(len(queries))]
    )
    assert recall >= 0.9, f"sharded entry-IVF recall {recall:.3f}"
    # r4 serve parity: the PROBE-KERNEL entry path (interpret mode on CPU)
    # must agree with the XLA scan inside shard_map
    assert idx._entry_kern is not None
    vk, rk = idx.search(queries, k, ef=128, entry_mode="kernel")
    recall_k = np.mean(
        [len(set(rk[i].tolist()) & set(gt[i].tolist())) / k
         for i in range(len(queries))]
    )
    assert recall_k >= 0.9, f"kernel-entry sharded recall {recall_k:.3f}"
    # scores are exact (f32 rescore) on both entry paths: agreement is
    # near-total up to entry-candidate near-ties
    agree = np.mean([
        len(set(rk[i].tolist()) & set(rows[i].tolist())) / k
        for i in range(len(queries))
    ])
    assert agree >= 0.9, f"entry-path agreement {agree:.3f}"


def test_sharded_ann_uneven_rows(rng):
    mesh = make_mesh(8)
    n, d, k = 1003, 16, 5  # not divisible by 8 -> padded shards
    corpus = _clustered(rng, n, d)
    idx = ShardedGraphIndex(
        mesh, d, DistanceMetric.COSINE, params=GraphParams(degree=16, knn_k=8)
    )
    idx.build(corpus)
    vals, rows = idx.search(corpus[:8], k, ef=64)
    assert (rows[:, 0] == np.arange(8)).all()  # self is its own NN
    assert rows.max() < n  # padding rows never surface


def test_sharded_ivf_recall(rng):
    from velesdb_tpu.parallel.sharded_ivf import ShardedIvfIndex

    mesh = make_mesh(8, dp=2)
    n, d, k = 4000, 32, 10
    corpus = _clustered(rng, n, d)
    queries = _clustered(rng, 48, d)
    idx = ShardedIvfIndex(mesh, d, DistanceMetric.COSINE, n_clusters=16)
    idx.build(corpus)
    vals, rows = idx.search(queries, k, nprobe=8)
    assert rows.shape == (48, k) and rows.max() < n and rows.min() >= 0
    _, gt = brute_force_topk(queries, corpus, k, DistanceMetric.COSINE)
    hits = sum(len(set(rows[i].tolist()) & set(gt[i].tolist())) for i in range(48))
    recall = hits / (48 * k)
    assert recall >= 0.9, f"sharded IVF recall {recall:.3f}"
    # full probe per shard -> exact
    _, rows = idx.search(queries, k, nprobe=idx.c_local)
    hits = sum(len(set(rows[i].tolist()) & set(gt[i].tolist())) for i in range(48))
    assert hits / (48 * k) >= 0.999


def test_sharded_ivf_uneven(rng):
    from velesdb_tpu.parallel.sharded_ivf import ShardedIvfIndex

    mesh = make_mesh(8)
    n, d = 999, 16
    corpus = _clustered(rng, n, d)
    idx = ShardedIvfIndex(mesh, d, DistanceMetric.EUCLIDEAN, n_clusters=4)
    idx.build(corpus)
    vals, rows = idx.search(corpus[:8], 5, nprobe=4)
    assert (rows[:, 0] == np.arange(8)).all()
