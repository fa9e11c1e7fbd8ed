"""ANN graph index: recall validation vs brute-force ground truth.

Mirrors the reference's ``tests/recall_validation.rs`` — synthetic clustered
data, exact ground truth, recall@k thresholds per quality profile.
"""

import numpy as np
import pytest

from velesdb_tpu.index.graph_index import GraphIndex, _assemble_adjacency
from velesdb_tpu.index.params import GraphParams, SearchQuality
from velesdb_tpu.ops import DistanceMetric
from velesdb_tpu.ops.chunked import brute_force_topk


def clustered(rng, n, dim, n_clusters=32, spread=0.15, centers=None):
    """Clustered Gaussian data (benchmark_recall.py:27-50 analog)."""
    if centers is None:
        centers = rng.standard_normal((n_clusters, dim)).astype(np.float32)
    assign = rng.integers(0, len(centers), n)
    data = (
        centers[assign] + spread * rng.standard_normal((n, dim)).astype(np.float32)
    ).astype(np.float32)
    return data, centers


def recall_at_k(got_idx, true_idx, k):
    hits = 0
    for g, t in zip(got_idx, true_idx):
        hits += len(set(g[:k].tolist()) & set(t[:k].tolist()))
    return hits / (len(got_idx) * k)


@pytest.fixture(scope="module")
def corpus_and_truth():
    rng = np.random.default_rng(3)
    corpus, centers = clustered(rng, 20_000, 64)
    queries, _ = clustered(rng, 64, 64, centers=centers)
    valid = np.ones(len(corpus), bool)
    truth = {}
    for metric in (DistanceMetric.EUCLIDEAN, DistanceMetric.COSINE):
        _, ti = brute_force_topk(queries, corpus, 10, metric, valid=valid)
        truth[metric] = ti
    return corpus, queries, valid, truth


@pytest.mark.parametrize("metric", [DistanceMetric.EUCLIDEAN, DistanceMetric.COSINE])
def test_recall_balanced(corpus_and_truth, metric):
    corpus, queries, valid, truth = corpus_and_truth
    idx = GraphIndex(64, metric, GraphParams(degree=32, knn_k=16))
    idx.build(corpus, valid)
    _, got = idx.search(queries, 10, quality=SearchQuality.BALANCED)
    r = recall_at_k(np.asarray(got), truth[metric], 10)
    assert r >= 0.90, f"recall@10={r:.3f} below 0.90 (balanced, {metric})"


def test_recall_profiles_ordered(corpus_and_truth):
    corpus, queries, valid, truth = corpus_and_truth
    metric = DistanceMetric.EUCLIDEAN
    idx = GraphIndex(64, metric, GraphParams(degree=32, knn_k=16))
    idx.build(corpus, valid)
    recalls = {}
    for q in (SearchQuality.FAST, SearchQuality.BALANCED, SearchQuality.ACCURATE):
        _, got = idx.search(queries, 10, quality=q)
        recalls[q] = recall_at_k(np.asarray(got), truth[metric], 10)
    assert recalls[SearchQuality.FAST] >= 0.75
    assert recalls[SearchQuality.ACCURATE] >= 0.95
    assert recalls[SearchQuality.ACCURATE] >= recalls[SearchQuality.FAST] - 0.02


def test_tombstones_excluded(corpus_and_truth):
    corpus, queries, valid, _ = corpus_and_truth
    valid2 = valid.copy()
    # tombstone the true nearest neighbors of query 0
    _, ti = brute_force_topk(queries[:1], corpus, 5, DistanceMetric.EUCLIDEAN)
    dead = set(ti[0].tolist())
    for d in dead:
        valid2[d] = False
    idx = GraphIndex(64, DistanceMetric.EUCLIDEAN, GraphParams(degree=32, knn_k=16))
    idx.build(corpus, valid2)
    _, got = idx.search(queries[:1], 10)
    assert not (set(np.asarray(got)[0].tolist()) & dead)


def test_result_filter_mask(corpus_and_truth):
    corpus, queries, valid, _ = corpus_and_truth
    idx = GraphIndex(64, DistanceMetric.EUCLIDEAN, GraphParams(degree=32, knn_k=16))
    idx.build(corpus, valid)
    mask = np.zeros(idx.n_pad, bool)
    mask[: len(corpus) : 2] = True  # only even slots allowed
    _, got = idx.search(queries[:4], 10, ef=256, mask=mask)
    got = np.asarray(got)
    real = got[got >= 0]
    assert len(real) and np.all(real % 2 == 0)


def test_save_load_roundtrip(tmp_path, corpus_and_truth):
    corpus, queries, valid, truth = corpus_and_truth
    idx = GraphIndex(64, DistanceMetric.EUCLIDEAN, GraphParams(degree=32, knn_k=16))
    idx.build(corpus, valid)
    path = str(tmp_path / "ann.npz")
    idx.save(path, version=42)
    _, want = idx.search(queries[:8], 10)

    idx2 = GraphIndex(64, DistanceMetric.EUCLIDEAN)
    assert not idx2.load(path, corpus, valid, version=41)  # stale version
    assert idx2.load(path, corpus, valid, version=42)
    _, got = idx2.search(queries[:8], 10)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_assemble_adjacency_reverse_edges():
    fwd = np.array([[1, 2], [2, -1], [0, -1]], dtype=np.int32)
    adj = _assemble_adjacency(fwd, 3, 4)
    assert adj.shape == (3, 4)
    # forward edges preserved
    assert {1, 2} <= set(adj[0].tolist())
    # reverse edge 0<-2 (because 2->0) present in row 0
    assert 0 in adj[2].tolist() or 2 in adj[0].tolist()
    # all slots filled (random long-range fill) and no self-edges
    assert (adj >= 0).all()
    for i, row in enumerate(adj):
        assert i not in row.tolist()


def test_assemble_adjacency_device_matches_host(rng):
    """The r4 device assembly (_assemble_adjacency_dev) is bit-identical to
    the host path, including hole-y pruned rows and pad rows."""
    import jax.numpy as jnp

    from velesdb_tpu.index.graph_index import _assemble_adjacency_dev

    for n, k, degree, pad in [(500, 16, 32, 0), (701, 32, 64, 323), (2, 4, 8, 0)]:
        fwd = rng.integers(0, n, (n, k)).astype(np.int32)
        fwd[rng.random((n, k)) < 0.2] = -1  # pruned holes
        host = _assemble_adjacency(fwd.copy(), n, degree)
        fwd_p = np.pad(fwd, ((0, pad), (0, 0)), constant_values=-1)
        dev = np.asarray(
            _assemble_adjacency_dev(jnp.asarray(fwd_p), n=n, degree=degree)
        )
        assert dev.shape == (n + pad, degree)
        assert (dev[n:] == -1).all()  # pad rows stay empty
        np.testing.assert_array_equal(dev[:n], host)


def test_device_build_lazy_host_adj(rng):
    """A device-assembled build defers the host adjacency copy; save()
    materializes it and the reloaded index serves identical results."""
    import jax

    n, d = 80_000, 16  # > EXACT_KNN_MAX_ROWS: the device pipeline engages
    corpus = rng.standard_normal((n, d)).astype(np.float32)
    dev = jax.device_put(corpus)
    idx = GraphIndex(d, DistanceMetric.EUCLIDEAN)
    idx.build(corpus, np.ones(n, bool), corpus_dev=dev)
    assert idx._adj_host is None  # deferred until persistence
    adj = idx._host_adj()
    assert adj is not None and adj.shape == (n, idx.params.degree)
    assert idx._adj_host is adj  # cached


def test_unsupported_metric_raises():
    with pytest.raises(ValueError):
        GraphIndex(8, DistanceMetric.HAMMING)


def test_chunked_topk_matches_exact(rng):
    corpus = rng.standard_normal((3000, 32)).astype(np.float32)
    queries = rng.standard_normal((10, 32)).astype(np.float32)
    vals, idx = brute_force_topk(queries, corpus, 7, DistanceMetric.EUCLIDEAN)
    # exact numpy truth
    d = np.linalg.norm(queries[:, None] - corpus[None], axis=-1)
    ti = np.argsort(d, axis=1)[:, :7]
    assert (idx == ti).mean() > 0.99  # ties may reorder
    np.testing.assert_allclose(vals, np.sort(d, axis=1)[:, :7], rtol=1e-3, atol=1e-3)


def test_chunked_exclude_self(rng):
    corpus = rng.standard_normal((500, 16)).astype(np.float32)
    _, idx = brute_force_topk(corpus, corpus, 3, DistanceMetric.EUCLIDEAN, exclude_self=True)
    for i in range(500):
        assert i not in idx[i]


@pytest.mark.parametrize("metric", [DistanceMetric.COSINE, DistanceMetric.EUCLIDEAN])
def test_quantized_traversal_matches_f32(corpus_and_truth, metric):
    """Dual-precision beam (VERDICT r2 #4): SQ8 gathers + f32 final rerank
    must hold the same recall bar as the f32 beam."""
    corpus, queries, valid, truth = corpus_and_truth
    gi = GraphIndex(
        64, metric,
        GraphParams(degree=32, knn_k=16, quantized_traversal=True),
    )
    gi.build(corpus, valid)
    assert gi._sq8trav is not None
    vals, idx = gi.search(queries, 10, quality=SearchQuality.BALANCED)
    r = recall_at_k(np.asarray(idx), truth[metric], 10)
    assert r >= 0.95, f"quantized-traversal recall {r:.3f}"
    # and the returned scores are f32-exact (rerank pass), not quantized:
    # rescore the top hit exactly and compare
    top = np.asarray(idx)[:, 0]
    q = queries
    if metric is DistanceMetric.EUCLIDEAN:
        exact = np.linalg.norm(corpus[top] - q, axis=1)
    else:
        num = np.sum(corpus[top] * q, axis=1)
        den = np.linalg.norm(corpus[top], axis=1) * np.linalg.norm(q, axis=1)
        exact = 1.0 - (1.0 - num / den)  # cosine similarity
    np.testing.assert_allclose(np.asarray(vals)[:, 0], exact, rtol=2e-3, atol=2e-3)


def test_approx_build_with_routed_entries(tmp_path, monkeypatch):
    """The >64K-row build path (IVF-bucketed kNN + routed beam entries),
    exercised with a shrunk threshold: build must produce a router, recall
    must hold, and save/load must round-trip the router."""
    monkeypatch.setattr(GraphIndex, "EXACT_KNN_MAX_ROWS", 2_000)
    rng = np.random.default_rng(7)
    corpus, centers = clustered(rng, 8_000, 32, n_clusters=16)
    queries, _ = clustered(rng, 64, 32, centers=centers)
    valid = np.ones(len(corpus), bool)
    metric = DistanceMetric.EUCLIDEAN
    _, truth = brute_force_topk(queries, corpus, 10, metric, valid=valid)

    gi = GraphIndex(32, metric, GraphParams(degree=32, knn_k=16))
    gi.build(corpus, valid)
    assert gi._route_cents is not None, "approx build must keep its router"
    _, got = gi.search(queries, 10, quality=SearchQuality.BALANCED)
    r = recall_at_k(np.asarray(got), np.asarray(truth), 10)
    assert r >= 0.9, f"routed-entry recall {r:.3f}"

    p = str(tmp_path / "ann.npz")
    gi.save(p, version=1)
    gi2 = GraphIndex(32, metric, GraphParams(degree=32, knn_k=16))
    assert gi2.load(p, corpus, valid, version=1)
    assert gi2._route_cents is not None, "router must survive save/load"
    _, got2 = gi2.search(queries, 10, quality=SearchQuality.BALANCED)
    assert np.array_equal(np.asarray(got), np.asarray(got2))


def test_wide_entry_probes_lift_recall(monkeypatch):
    """entry_probes widens the router scan that seeds the beam (the 1M-scale
    recall limiter, measured r3c: probes 2 -> 32 moved ef=128 recall
    0.9145 -> 0.9500 on the same 1M graph). On a small clustered corpus the
    wide-entry search must stay valid and recall must not regress."""
    monkeypatch.setattr(GraphIndex, "EXACT_KNN_MAX_ROWS", 2_000)
    rng = np.random.default_rng(11)
    corpus, centers = clustered(rng, 8_000, 32, n_clusters=16)
    queries, _ = clustered(rng, 64, 32, centers=centers)
    valid = np.ones(len(corpus), bool)
    metric = DistanceMetric.EUCLIDEAN
    _, truth = brute_force_topk(queries, corpus, 10, metric, valid=valid)

    recalls = {}
    for probes in (2, 8):
        gi = GraphIndex(
            32, metric,
            GraphParams(degree=32, knn_k=16, entry_probes=probes,
                        entry_points=32),
        )
        gi.build(corpus, valid)
        assert gi._route_cents is not None
        vals, got = gi.search(queries, 10, quality=SearchQuality.BALANCED)
        got = np.asarray(got)
        assert (got >= 0).all() and (got < len(corpus)).all()
        recalls[probes] = recall_at_k(got, np.asarray(truth), 10)
    assert recalls[8] >= recalls[2] - 0.01, recalls
    assert recalls[8] >= 0.9, recalls


def test_entry_ivf_survives_save_load(tmp_path, monkeypatch):
    """The entry-IVF kmeans recipe persists next to the graph artifact;
    load re-assembles it without re-clustering and search results match."""
    import os

    monkeypatch.setattr(GraphIndex, "EXACT_KNN_MAX_ROWS", 2_000)
    rng = np.random.default_rng(17)
    corpus, centers = clustered(rng, 8_000, 32, n_clusters=16)
    queries, _ = clustered(rng, 32, 32, centers=centers)
    valid = np.ones(len(corpus), bool)
    params = GraphParams(degree=32, knn_k=16, entry_probes=8, entry_points=32)

    gi = GraphIndex(32, DistanceMetric.EUCLIDEAN, params)
    gi.build(corpus, valid)
    assert gi._entry_ivf is not None
    _, got = gi.search(queries, 10, quality=SearchQuality.BALANCED)

    p = str(tmp_path / "ann.npz")
    gi.save(p, version=1)
    assert os.path.exists(GraphIndex._entry_path(p))

    gi2 = GraphIndex(32, DistanceMetric.EUCLIDEAN, params)
    assert gi2.load(p, corpus, valid, version=1)
    assert gi2._entry_ivf is not None, "entry IVF must re-assemble on load"
    _, got2 = gi2.search(queries, 10, quality=SearchQuality.BALANCED)
    assert np.array_equal(np.asarray(got), np.asarray(got2))


def test_entry_ivf_kernel_matches_xla(monkeypatch):
    """The SQ8 entry-IVF serves the wide entry scan two ways — Pallas probe
    kernel (small batch, TPU) and XLA partition scan. Both must seed the
    beam identically: same graph, same queries, interpret-mode kernel vs
    XLA entry results must agree."""
    import jax.numpy as jnp

    from velesdb_tpu.index import graph_index as gmod

    monkeypatch.setattr(GraphIndex, "EXACT_KNN_MAX_ROWS", 2_000)
    rng = np.random.default_rng(13)
    corpus, centers = clustered(rng, 12_000, 64, n_clusters=16)
    queries, _ = clustered(rng, 16, 64, centers=centers)
    valid = np.ones(len(corpus), bool)
    metric = DistanceMetric.EUCLIDEAN

    gi = GraphIndex(
        64, metric,
        GraphParams(degree=32, knn_k=16, entry_probes=8, entry_points=32),
    )
    gi.build(corpus, valid)
    eiv = gi._entry_ivf
    assert eiv is not None, "entry_probes >= 8 must build the entry IVF"
    assert eiv.storage == "sq8"

    qp = jnp.asarray(queries)
    common = dict(
        k=10, beam=64, expansions=64, degree=gi._adj.shape[1],
        entry_points=32, metric=metric,
        entry_probes=min(8, eiv.c),
    )
    base = (
        qp, gi._corpus, gi._adj, gi._sqnorm, gi._valid, gi._seed_ids,
        None, None, None,
    )
    aux, frows = eiv._kernel_state()
    vk, ik = gmod.beam_search_impl(
        *base,
        (eiv._centroids, eiv._cent_sq, eiv._parts, aux, frows),
        entry_mode="kernel", entry_interpret=True, **common,
    )
    vx, ix = gmod.beam_search_impl(
        *base,
        (eiv._centroids, eiv._cent_sq,
         (eiv._parts, eiv._part_scale, eiv._part_minv),
         eiv._part_rows, eiv._part_sq),
        entry_mode="xla", **common,
    )
    # entry selection is coarse-SQ8 in both; scores then rescore exactly —
    # ids must match row-for-row up to coarse-score near-ties
    agree = np.mean(
        [len(set(np.asarray(ik)[i]) & set(np.asarray(ix)[i])) / 10
         for i in range(len(queries))]
    )
    assert agree >= 0.95, agree
    np.testing.assert_allclose(
        np.sort(np.asarray(vk), axis=1),
        np.sort(np.asarray(vx), axis=1),
        rtol=1e-4, atol=1e-4,
    )


def test_quantized_traversal_capacity_mode(corpus_and_truth):
    """traversal_rerank=False drops the f32 corpus entirely (true 4x graph
    capacity); recall holds a slightly lower bar without the head rerank."""
    corpus, queries, valid, truth = corpus_and_truth
    metric = DistanceMetric.EUCLIDEAN
    gi = GraphIndex(
        64, metric,
        GraphParams(degree=32, knn_k=16, quantized_traversal=True,
                    traversal_rerank=False),
    )
    gi.build(corpus, valid)
    assert gi._corpus is None and gi._sq8trav is not None
    # without the f32 head rerank, raw SQ8 ordering costs real recall —
    # that price is the reason dual-precision reranks; capacity mode trades
    # it for 4x rows and recovers via a host-side oversample+rerank pass
    _, idx = gi.search(queries, 40, quality=SearchQuality.BALANCED)
    idx = np.asarray(idx)
    r_raw = recall_at_k(idx, truth[metric], 10)
    assert r_raw >= 0.7, f"capacity-mode coarse recall {r_raw:.3f}"
    # emulate Collection.search_with_rerank: f32-rescore the 4x pool
    reranked = []
    for qi in range(len(queries)):
        cand = idx[qi][idx[qi] >= 0]
        d = np.linalg.norm(corpus[cand] - queries[qi], axis=1)
        reranked.append(cand[np.argsort(d)][:10])
    r = recall_at_k(np.asarray(reranked), truth[metric], 10)
    assert r >= 0.93, f"capacity-mode reranked recall {r:.3f}"

def test_expand_width_recall_invariant(corpus_and_truth):
    """Wider multi-expansion must not cost recall (measured identical on
    entry-bound graphs, r3d — this guards the fixed-shape plumbing)."""
    corpus, queries, valid, truth = corpus_and_truth
    metric = DistanceMetric.EUCLIDEAN
    idx = GraphIndex(
        64, metric, GraphParams(degree=32, knn_k=16, expand_width=16)
    )
    idx.build(corpus, valid)
    _, got = idx.search(queries, 10, quality=SearchQuality.BALANCED)
    r = recall_at_k(np.asarray(got), truth[metric], 10)
    assert r >= 0.90, f"recall@10={r:.3f} below 0.90 at expand_width=16"


def test_auto_params_expand_width():
    assert GraphParams.auto(128, 1_000_000).expand_width == 16
    assert GraphParams.auto(768, 100_000).expand_width == 16
    assert GraphParams.auto(64, 20_000).expand_width == 4


def test_load_keeps_runtime_expand_width(tmp_path, corpus_and_truth):
    """load() restores GRAPH properties from disk but must keep the
    caller's runtime knobs — r3d: expand_width was silently reset to the
    dataclass default (4), costing reopened collections the ew=16 speed."""
    corpus, _, valid, _ = corpus_and_truth
    metric = DistanceMetric.EUCLIDEAN
    p = GraphParams(degree=32, knn_k=16, expand_width=16)
    idx = GraphIndex(64, metric, p)
    idx.build(corpus, valid)
    path = str(tmp_path / "g.npz")
    idx.save(path)
    idx2 = GraphIndex(64, metric, GraphParams(degree=32, knn_k=16,
                                              expand_width=16))
    assert idx2.load(path, corpus, valid)
    assert idx2.params.expand_width == 16


def test_sq8_knn_build_graph_recall(corpus_and_truth, monkeypatch):
    """The SQ8 bucketed self-kNN build (auto past SQ8_BUILD_MIN_ROWS,
    r3d: the f32 partition copy OOMed one-chip builds at >=8M rows) must
    produce a graph of equivalent recall to the f32 build."""
    import velesdb_tpu.index.graph_index as gmod

    corpus, queries, valid, truth = corpus_and_truth
    metric = DistanceMetric.EUCLIDEAN
    monkeypatch.setattr(gmod.GraphIndex, "EXACT_KNN_MAX_ROWS", 4096)
    import velesdb_tpu.index.ivf as ivfmod

    monkeypatch.setattr(ivfmod, "SQ8_BUILD_MIN_ROWS", 0)
    idx = GraphIndex(64, metric, GraphParams(degree=32, knn_k=16))
    idx.build(corpus, valid)
    _, got = idx.search(queries, 10, quality=SearchQuality.BALANCED)
    r = recall_at_k(np.asarray(got), truth[metric], 10)
    assert r >= 0.90, f"sq8-built graph recall@10={r:.3f}"


def test_entry_kernel_smem_gate(monkeypatch):
    """The [b_pad, probes] entry table is scalar-prefetched into SMEM
    (1MB on v5e, 2x allocation for prefetch buffering); oversized tables
    must reroute to the XLA partition scan instead of failing the Mosaic
    compile — on-chip, b=4096 x probes=64 (1MB of i32) surfaced as a 2MB
    SMEM allocation and was rejected."""
    from velesdb_tpu.index import graph_index as gmod
    from velesdb_tpu.ops import ivf_kernel, pallas_kernels

    # boundary: the proven-on-chip 1024x64 table fits; 4096x64 does not
    assert ivf_kernel.probe_table_fits(1024, 64)
    assert not ivf_kernel.probe_table_fits(4096, 64)

    monkeypatch.setattr(GraphIndex, "EXACT_KNN_MAX_ROWS", 2_000)
    rng = np.random.default_rng(5)
    corpus, centers = clustered(rng, 12_000, 64, n_clusters=16)
    queries, _ = clustered(rng, 24, 64, centers=centers)
    valid = np.ones(len(corpus), bool)
    gi = GraphIndex(
        64, DistanceMetric.EUCLIDEAN,
        GraphParams(degree=32, knn_k=16, entry_probes=8, entry_points=32),
    )
    gi.build(corpus, valid)
    assert gi._entry_ivf is not None

    modes = []
    real = gmod._beam_search

    def spy(*a, **kw):
        modes.append(kw.get("entry_mode"))
        # record the dispatch decision, then run the always-lowerable
        # legacy path — the kernel itself can't lower on the CPU backend
        a = a[:9] + (None,) + a[10:]
        kw["entry_mode"] = "legacy"
        return real(*a, **kw)

    monkeypatch.setattr(gmod, "_beam_search", spy)
    monkeypatch.setattr(pallas_kernels, "use_pallas", lambda: True)
    monkeypatch.setattr(ivf_kernel, "MIN_BLOCK_BYTES", 0)

    gi.search(queries, 5)  # b_pad=32 x probes=8 = 1KB table: fits
    assert modes[-1] == "kernel"

    monkeypatch.setattr(ivf_kernel, "SMEM_PROBE_BYTES", 512)
    gi.search(queries, 5)  # 1KB > 512B budget: reroute to the XLA scan
    assert modes[-1] == "xla"


def test_entry_batch_stitching(monkeypatch):
    """Batches beyond the entry-stage dispatch cap must stitch chunked
    dispatches, each served by a bounded entry mode (r3e on-chip: a
    4096-query legacy gather at probes=64 was a 69.8GB HBM allocation).
    Without the probe kernel the cap is MAX_KERNEL_BATCH, so b=100 splits
    into 64+36 XLA-scan dispatches."""
    from velesdb_tpu.index import graph_index as gmod

    monkeypatch.setattr(GraphIndex, "EXACT_KNN_MAX_ROWS", 2_000)
    rng = np.random.default_rng(9)
    corpus, centers = clustered(rng, 12_000, 64, n_clusters=16)
    queries, _ = clustered(rng, 100, 64, centers=centers)
    valid = np.ones(len(corpus), bool)
    gi = GraphIndex(
        64, DistanceMetric.EUCLIDEAN,
        GraphParams(degree=32, knn_k=16, entry_probes=8, entry_points=32),
    )
    gi.build(corpus, valid)
    assert gi._entry_ivf is not None
    assert gi._dispatch_cap() == 64  # no Pallas on CPU -> XLA-scan cap

    modes, widths = [], []
    real = gmod._beam_search

    def spy(*a, **kw):
        modes.append(kw.get("entry_mode"))
        widths.append(a[0].shape[0])
        return real(*a, **kw)

    monkeypatch.setattr(gmod, "_beam_search", spy)
    vals, ids = gi.search(queries, 10)
    assert np.asarray(ids).shape == (100, 10)
    assert modes == ["xla", "xla"] and widths == [64, 64]  # 64 + pad(36)

    # stitched results must equal the per-chunk searches
    v1, i1 = gi.search(queries[:64], 10)
    v2, i2 = gi.search(queries[64:], 10)
    assert np.array_equal(np.asarray(ids), np.concatenate(
        [np.asarray(i1), np.asarray(i2)]))
    np.testing.assert_allclose(np.asarray(vals), np.concatenate(
        [np.asarray(v1), np.asarray(v2)]), rtol=1e-5, atol=1e-5)
