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


def test_spill_assignment_lifts_recall_per_probe(rng):
    """spill=2 (rows duplicated into their top-2 partitions) must dominate
    spill=1 recall at equal nprobe, with no duplicate rows in results."""
    from velesdb_tpu.index.ivf import IvfIndex
    from velesdb_tpu.ops import DistanceMetric
    from velesdb_tpu.ops.chunked import brute_force_topk

    n, d, k = 20_000, 32, 10
    centers = rng.standard_normal((16, d)).astype(np.float32) * 2.0
    corpus = centers[rng.integers(0, 16, n)] + rng.standard_normal(
        (n, d)
    ).astype(np.float32) * 0.7
    queries = centers[rng.integers(0, 16, 64)] + rng.standard_normal(
        (64, d)
    ).astype(np.float32) * 0.7
    _, gt = brute_force_topk(queries, corpus, k, DistanceMetric.EUCLIDEAN)
    gt = np.asarray(gt)

    def recall(ivf, nprobe):
        _, idx = ivf.search(queries, k, nprobe=nprobe)
        idx = np.asarray(idx)
        # no duplicate ids within a row
        for row in idx:
            live = row[row >= 0]
            assert len(set(live.tolist())) == len(live)
        return np.mean(
            [len(set(idx[i]) & set(gt[i])) / k for i in range(len(gt))]
        )

    i1 = IvfIndex(d, DistanceMetric.EUCLIDEAN)
    i1.build(corpus)
    i2 = IvfIndex(d, DistanceMetric.EUCLIDEAN, spill=2)
    i2.build(corpus)
    r1 = recall(i1, 4)
    r2 = recall(i2, 4)
    assert r2 >= r1, (r1, r2)
    assert r2 >= min(0.9, r1 + 0.02) or r1 > 0.97, (r1, r2)


def test_spill_save_load_roundtrip(tmp_path, rng):
    from velesdb_tpu.index.ivf import IvfIndex
    from velesdb_tpu.ops import DistanceMetric

    n, d = 2000, 16
    corpus = rng.standard_normal((n, d)).astype(np.float32)
    ivf = IvfIndex(d, DistanceMetric.COSINE, spill=2)
    ivf.build(corpus)
    p = str(tmp_path / "ivf.npz")
    ivf.save(p, version=3)
    ivf2 = IvfIndex(d, DistanceMetric.COSINE)
    assert ivf2.load(p, corpus, np.ones(n, bool), version=3)
    assert ivf2.spill == 2
    q = corpus[:4] + 0.001
    _, i1 = ivf.search(q, 5, nprobe=8)
    _, i2 = ivf2.search(q, 5, nprobe=8)
    assert np.array_equal(np.asarray(i1), np.asarray(i2))


def test_nprobe_for_coverage_calibration():
    """nprobe maps ef to ~coverage: balanced (ef=128) ~3.5% of rows at any
    scale (the measured 0.95-recall operating point, r3)."""
    from velesdb_tpu.index.ivf import IvfIndex
    from velesdb_tpu.ops import DistanceMetric

    ivf = IvfIndex(32, DistanceMetric.EUCLIDEAN)
    ivf.n, ivf.part_len, ivf.c = 1_000_000, 520, 5800
    np64 = ivf.nprobe_for(128)
    assert 55 <= np64 <= 75, np64  # ~64 probes = 3.3% coverage
    assert ivf.nprobe_for(256) > np64 > ivf.nprobe_for(64)
    ivf.n, ivf.part_len, ivf.c = 100_000, 512, 586
    np_small = ivf.nprobe_for(128)
    assert 5 <= np_small <= 9, np_small  # ~7 probes = 3.5%
    # spilled builds double part_len AND hold 2x row-copies: at the same
    # coverage the probe count stays ~constant (L/spill unique rows/probe)
    ivf.spill = 2
    ivf.part_len = 1024  # what a spill=2 build of the same corpus produces
    assert abs(ivf.nprobe_for(128) - np_small) <= 2


def test_sq8_storage_ivf(tmp_path, rng):
    """Quantized-storage IVF: partitions stay 1 byte/dim, stored as
    block-packed int32 words (the capacity ANN engine; Mosaic-ready
    layout); recall matches the f32 build on the probed candidates and
    save/load round-trips through the centroid recipe."""
    import jax.numpy as jnp

    from velesdb_tpu.index.ivf import IvfIndex
    from velesdb_tpu.ops import DistanceMetric
    from velesdb_tpu.ops.chunked import brute_force_topk
    from velesdb_tpu.ops.quantization import sq8_quantize

    n, d, k = 20_000, 32, 10
    centers = rng.standard_normal((16, d)).astype(np.float32) * 2.0
    corpus = centers[rng.integers(0, 16, n)] + rng.standard_normal(
        (n, d)
    ).astype(np.float32) * 0.7
    queries = centers[rng.integers(0, 16, 64)] + rng.standard_normal(
        (64, d)
    ).astype(np.float32) * 0.7
    _, gt = brute_force_topk(queries, corpus, k, DistanceMetric.EUCLIDEAN)
    gt = np.asarray(gt)
    sq = sq8_quantize(jnp.asarray(corpus))

    ivf = IvfIndex(d, DistanceMetric.EUCLIDEAN, spill=2)
    ivf.build(sq)
    assert ivf.storage == "sq8"
    assert ivf._parts.dtype == jnp.int32  # block-packed words, D_pad/4
    assert ivf._parts.shape[-1] == (d + 3) // 4

    def recall(ix, nprobe):
        _, idx = ix.search(queries, k, nprobe=nprobe)
        idx = np.asarray(idx)
        for row in idx:  # spill dedup holds in sq8 storage too
            live = row[row >= 0]
            assert len(set(live.tolist())) == len(live)
        return np.mean([len(set(idx[i]) & set(gt[i])) / k
                        for i in range(len(gt))])

    r = recall(ivf, 8)
    assert r >= 0.9, r

    p = str(tmp_path / "ivf_sq8.npz")
    ivf.save(p, version=5)
    ivf2 = IvfIndex(d, DistanceMetric.EUCLIDEAN)
    assert ivf2.load(p, sq, np.ones(n, bool), version=5)
    assert ivf2.storage == "sq8" and ivf2.spill == 2
    q = queries[:4]
    _, i1 = ivf.search(q, 5, nprobe=8)
    _, i2 = ivf2.search(q, 5, nprobe=8)
    assert np.array_equal(np.asarray(i1), np.asarray(i2))
    # a stale f32 artifact must NOT load against an SQ8 corpus
    ivf3 = IvfIndex(d, DistanceMetric.EUCLIDEAN)
    ivf3.build(corpus)
    p2 = str(tmp_path / "ivf_f32.npz")
    ivf3.save(p2, version=5)
    ivf4 = IvfIndex(d, DistanceMetric.EUCLIDEAN)
    assert not ivf4.load(p2, sq, np.ones(n, bool), version=5)


def test_sq8_collection_uses_quantized_ivf(tmp_db_dir, rng):
    """An SQ8 collection's planner-selectable IVF builds from the quantized
    codes (no f32 partitions) and serves through plain search()."""
    from velesdb_tpu import Database

    db = Database(tmp_db_dir)
    c = db.create_collection("q", dim=16, storage_mode="sq8",
                             metric="euclidean")
    base = rng.standard_normal((3000, 16)).astype(np.float32) + 3.0
    c.upsert_bulk(range(3000), base)
    c.refresh_device()
    assert c._ensure_ivf()
    assert c.ivf.storage == "sq8"
    import jax.numpy as jnp

    assert c.ivf._parts.dtype == jnp.int32  # block-packed words
    hits = c.search_batch(base[:4] + 0.001, 5)
    assert [h[0].id for h in hits] == [0, 1, 2, 3]
    db.close()


def test_padded_n_parts_policy():
    """The padded count is shape-deterministic whenever the exact count
    fits the headroom (compile reuse across seeds), capped by the physical
    worst case and by the pad-slot HBM budget (capacity builds keep their
    memory margin)."""
    from velesdb_tpu.index.ivf import (
        _PAD_BYTES_BUDGET,
        _padded_n_parts_capped,
    )

    # two seeds with slightly different split counts -> SAME padded count
    c, n, L = 4000, 1_000_000, 512
    a = _padded_n_parts_capped(4210, c, n, L, row_bytes=512)
    b = _padded_n_parts_capped(4241, c, n, L, row_bytes=512)
    assert a == b == c + c // 8
    # heavy skew past the headroom: bucketed, still >= raw
    heavy = _padded_n_parts_capped(c + c // 2, c, n, L, row_bytes=512)
    assert heavy >= c + c // 2
    # capacity shapes: pad bytes bounded by the budget
    c2, L2, rb = 8192, 2441, 768  # 10M x 768D SQ8
    p = _padded_n_parts_capped(c2 + 100, c2, 10_000_000, L2, row_bytes=rb)
    assert (p - (c2 + 100)) * L2 * rb <= _PAD_BYTES_BUDGET + 16 * L2 * rb
    # tiny index: never past the static worst case
    t = _padded_n_parts_capped(26, 24, 6000, 500, row_bytes=64)
    assert t <= 24 + 6000 // 500 + 1


def test_exact_partition_count(rng):
    """``c_real`` is the exact sum of per-cluster splits, not the static
    worst-case bound c + n//L + 1 (which allocates ~2x the slots at
    capacity — every cluster would have to overflow simultaneously).
    ``c`` pads it by a shape-deterministic headroom (compile reuse across
    kmeans seeds/rebuilds, r4) but never past the worst-case bound."""
    n, d, c = 6000, 16, 24
    corpus = _clustered(rng, n, d, c=8)  # skewed: 8 real modes, 24 clusters
    idx = IvfIndex(d, DistanceMetric.EUCLIDEAN, n_clusters=c)
    idx.build(corpus)
    L = idx.part_len
    worst = c + n // L + 1
    assert idx.c_real < worst, (idx.c_real, worst)
    assert idx.c_real <= idx.c <= worst, (idx.c_real, idx.c, worst)
    # padded partitions: all-dead rows, sentinel routing norm
    pr = np.asarray(idx._part_rows)
    if idx.c > idx.c_real:
        assert (pr[idx.c_real:] == -1).all()
        assert (np.asarray(idx._cent_sq)[idx.c_real:] >= 5e29).all()
    # every live row present exactly once across partitions
    rows = np.asarray(idx._part_rows).reshape(-1)
    live = rows[rows >= 0]
    assert len(live) == n
    assert len(set(live.tolist())) == n
    # full-probe search still exact
    queries = _clustered(rng, 32, d, c=8)
    _, got = idx.search(queries, 10, nprobe=idx.c)
    _, gt = brute_force_topk(queries, corpus, 10, DistanceMetric.EUCLIDEAN)
    got = np.asarray(got)
    hits = sum(len(set(got[i]) & set(gt[i])) for i in range(len(queries)))
    assert hits / (len(queries) * 10) >= 0.999


def test_pack_factor_tightens_slots(rng):
    """pack_factor < 2 shrinks the slot budget (capacity deployments) while
    keeping search exact at full probe."""
    n, d = 4000, 16
    corpus = _clustered(rng, n, d)
    loose = IvfIndex(d, DistanceMetric.EUCLIDEAN, n_clusters=16)
    loose.build(corpus)
    tight = IvfIndex(
        d, DistanceMetric.EUCLIDEAN, n_clusters=16, pack_factor=1.1
    )
    tight.build(corpus)
    assert tight.c * tight.part_len < loose.c * loose.part_len
    queries = _clustered(rng, 16, d)
    _, got = tight.search(queries, 10, nprobe=tight.c)
    _, gt = brute_force_topk(queries, corpus, 10, DistanceMetric.EUCLIDEAN)
    got = np.asarray(got)
    hits = sum(len(set(got[i]) & set(gt[i])) for i in range(len(queries)))
    assert hits / (len(queries) * 10) >= 0.999


@pytest.mark.parametrize("metric", [DistanceMetric.EUCLIDEAN, DistanceMetric.COSINE])
@pytest.mark.parametrize("storage", ["sq8", "f32"])
def test_probe_kernel_matches_xla_path(rng, metric, storage):
    """The Pallas probe kernel (interpret mode on CPU) returns the same
    rows as the XLA probing path for identical probes — both partition
    storages (packed SQ8 words and f32 rows)."""
    import jax.numpy as jnp

    from velesdb_tpu.index.ivf import IvfIndex, _ivf_search
    from velesdb_tpu.ops.ivf_kernel import ivf_probe_topk
    from velesdb_tpu.ops.quantization import sq8_quantize

    n, d, k = 8000, 32, 10
    corpus = _clustered(rng, n, d, c=8)
    queries = _clustered(rng, 8, d, c=8)
    sq = (
        sq8_quantize(np.asarray(corpus))
        if storage == "sq8"
        else np.asarray(corpus)
    )
    ivf = IvfIndex(d, metric, n_clusters=24)
    ivf.build(sq)
    nprobe = 8
    aux, flat_rows = ivf._kernel_state()
    kv, ki = ivf_probe_topk(
        jnp.asarray(queries), ivf._centroids, ivf._cent_sq, ivf._parts,
        aux, flat_rows, k=k, nprobe=nprobe, metric=metric, interpret=True,
    )
    xla_parts = (
        (ivf._parts, ivf._part_scale, ivf._part_minv)
        if storage == "sq8"
        else ivf._parts
    )
    xv, xi = _ivf_search(
        jnp.asarray(queries), ivf._centroids, ivf._cent_sq,
        xla_parts, ivf._part_rows, ivf._part_sq, None,
        k=k, nprobe=nprobe, metric=metric,
    )
    ki, xi = np.asarray(ki), np.asarray(xi)
    kv, xv = np.asarray(kv), np.asarray(xv)
    for i in range(len(queries)):
        overlap = len(set(ki[i].tolist()) & set(xi[i].tolist()))
        assert overlap >= k - 1, (i, ki[i], xi[i])  # near-tie tolerance
    np.testing.assert_allclose(kv, xv, rtol=2e-2, atol=2e-2)


def test_merge_ranked_device_matches_host(rng):
    """r4 build path: the device union-merge (one readback) must reproduce
    merge_ranked's dedup + ranking exactly."""
    import jax.numpy as jnp

    from velesdb_tpu.index.ivf import _merge_ranked_device, merge_ranked

    n, k = 257, 8
    v1 = rng.standard_normal((n, k)).astype(np.float32)
    i1 = rng.integers(0, 50, (n, k)).astype(np.int32)
    # duplicates across lists carry IDENTICAL scores (deterministic per
    # (row, id) pair) — mirror that invariant
    v2 = rng.standard_normal((n, k)).astype(np.float32)
    i2 = rng.integers(0, 50, (n, k)).astype(np.int32)
    for r in range(n):
        for c in range(k):
            m = i1[r] == i2[r, c]
            if m.any():
                v2[r, c] = v1[r][m][0]
    # a few empties
    i1[:, -1] = -1
    v1[:, -1] = -np.inf
    want = merge_ranked([v1, v2], [i1, i2], k)
    got = np.asarray(
        _merge_ranked_device(
            jnp.concatenate([jnp.asarray(v1), jnp.asarray(v2)], axis=1),
            jnp.concatenate([jnp.asarray(i1), jnp.asarray(i2)], axis=1),
            k=k,
        )
    )
    assert np.array_equal(got, want)


def test_scatter_knn_device(rng):
    """Partition-shaped kNN results scatter to row shape with dead-slot
    drops (the one-readback build path)."""
    import jax.numpy as jnp

    from velesdb_tpu.index.ivf import _scatter_knn

    P, L, k_eff, k, n = 4, 8, 3, 5, 25
    rows = np.full((P, L), -1, np.int32)
    live = rng.permutation(n)
    rows.reshape(-1)[: n] = live
    vals = rng.standard_normal((P, L, k_eff)).astype(np.float32)
    nbrs = rng.integers(0, n, (P, L, k_eff)).astype(np.int32)
    sv, si = _scatter_knn(
        jnp.asarray(vals), jnp.asarray(nbrs), jnp.asarray(rows),
        n=n, k=k, k_eff=k_eff,
    )
    sv, si = np.asarray(sv), np.asarray(si)
    flat_rows = rows.reshape(-1)
    for slot, r in enumerate(flat_rows):
        if r < 0:
            continue
        assert np.array_equal(si[r, :k_eff], nbrs.reshape(-1, k_eff)[slot])
        assert np.allclose(sv[r, :k_eff], vals.reshape(-1, k_eff)[slot])
    assert (si[:, k_eff:] == -1).all()


def test_correlated_mask_probe_pruning(rng):
    """Mask-aware probe pruning (r5): a CLUSTER-correlated filter keeps
    whole embedding clusters far from most queries — distance-ordered
    probing alone reads only masked-out partitions and recall collapses
    to ~selectivity (measured on-chip, exp_filtered FILT_MASK=cluster).
    Pruning the routing to partitions that contain masked rows re-aims
    the probes at the kept clusters at the SAME nprobe."""
    n, d, c = 40_000, 24, 16
    centers = rng.standard_normal((c, d)).astype(np.float32) * 3
    assign = rng.integers(0, c, n)
    corpus = centers[assign] + 0.5 * rng.standard_normal((n, d)).astype(
        np.float32
    )
    ivf = IvfIndex(d, DistanceMetric.EUCLIDEAN)
    ivf.build(corpus, np.ones(n, bool))
    mask = assign == 5  # one kept cluster, ~6% selectivity
    queries = (
        centers[rng.integers(0, c, 16)]
        + 0.5 * rng.standard_normal((16, d)).astype(np.float32)
    )
    _, idx = ivf.search(queries, 10, nprobe=8, mask=mask)
    idx = np.asarray(idx)
    assert (mask[idx[idx >= 0]]).all(), "filter violated"
    ids = np.arange(n)[mask]
    sub = corpus[mask]
    hits = 0
    for b in range(16):
        gt = set(ids[np.argsort(np.linalg.norm(sub - queries[b], axis=1))[:10]])
        hits += len(gt & set(idx[b])) / 10
    # without pruning this reads ~selectivity (~0.06)
    assert hits / 16 > 0.8
