"""Multi-device sharding tests on the virtual 8-device CPU mesh.

Counterpart of the reference's concurrency/stress suites (SURVEY.md §4) —
but validating the collective merge path instead of lock interleavings.
"""

import jax
import numpy as np
import pytest

from velesdb_tpu.ops import DistanceMetric, pairwise_scores, top_k
from velesdb_tpu.parallel import (
    ShardedBruteForce,
    make_mesh,
    shard_rows,
    sharded_ingest_search_step,
)


def _reference_topk(q, corpus, k, metric, mask=None):
    s = np.asarray(pairwise_scores(q, corpus, metric))
    if mask is not None:
        s = np.where(mask[None, :], s, -np.inf if metric.higher_is_better else np.inf)
    order = np.argsort(-s if metric.higher_is_better else s, axis=1)[:, :k]
    return np.take_along_axis(s, order, axis=1), order


@pytest.mark.parametrize("metric", [DistanceMetric.COSINE, DistanceMetric.EUCLIDEAN])
@pytest.mark.parametrize("dp", [1, 2])
def test_sharded_matches_single_device(rng, metric, dp):
    mesh = make_mesh(8, dp=dp)
    n, d, b, k = 1000, 64, 8, 10
    corpus = rng.standard_normal((n, d)).astype(np.float32)
    queries = rng.standard_normal((b, d)).astype(np.float32)
    idx = ShardedBruteForce(mesh, d, metric)
    idx.rebuild(corpus)
    vals, gidx = idx.search(queries, k)
    ref_v, ref_i = _reference_topk(queries, corpus, k, metric)
    assert np.array_equal(np.sort(gidx, axis=1), np.sort(ref_i, axis=1)), (
        "sharded merge must equal the single-device exact top-k"
    )
    np.testing.assert_allclose(vals, ref_v, rtol=1e-4, atol=1e-5)


def test_sharded_masked_search(rng):
    mesh = make_mesh(8)
    n, d, k = 512, 32, 5
    corpus = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((2, d)).astype(np.float32)
    mask = rng.random(n) < 0.3
    idx = ShardedBruteForce(mesh, d, DistanceMetric.COSINE)
    idx.rebuild(corpus)
    vals, gidx = idx.search(q, k, mask=mask)
    assert mask[gidx[gidx >= 0]].all(), "masked-out rows must never surface"
    ref_v, ref_i = _reference_topk(q, corpus, k, DistanceMetric.COSINE, mask=mask)
    assert np.array_equal(np.sort(gidx, axis=1), np.sort(ref_i, axis=1))


def test_shard_rows_pads_and_distributes(rng):
    mesh = make_mesh(8)
    arr = rng.standard_normal((13, 4)).astype(np.float32)
    sharded = shard_rows(mesh, arr)
    assert sharded.shape[0] % 8 == 0
    np.testing.assert_array_equal(np.asarray(sharded)[:13], arr)


def test_ingest_search_step(rng):
    mesh = make_mesh(8, dp=2)
    d, n, r, b, k = 16, 64, 8, 4, 5
    metric = DistanceMetric.DOT_PRODUCT
    step = sharded_ingest_search_step(mesh, d, metric)
    from jax.sharding import NamedSharding, PartitionSpec as P

    corpus = jax.device_put(
        np.zeros((n, d), np.float32), NamedSharding(mesh, P("rows", None))
    )
    valid = jax.device_put(np.zeros(n, bool), NamedSharding(mesh, P("rows")))
    rows1 = rng.standard_normal((r, d)).astype(np.float32)
    rows2 = rng.standard_normal((r, d)).astype(np.float32)
    queries = rng.standard_normal((b, d)).astype(np.float32)
    pos0 = np.array([0], np.int32)
    corpus, valid, _, _ = step(corpus, valid, rows1, pos0, queries, k=k)
    # second ingest crosses a shard boundary (n/8 = 8 rows per shard)
    corpus, valid, vals, idx = step(
        corpus, valid, rows2, np.array([r], np.int32), queries, k=k
    )
    host = np.vstack([rows1, rows2])
    ref_v, ref_i = _reference_topk(queries, host, k, metric)
    assert np.asarray(valid)[: 2 * r].all() and not np.asarray(valid)[2 * r :].any()
    assert np.array_equal(np.sort(np.asarray(idx), axis=1), np.sort(ref_i, axis=1))
    np.testing.assert_allclose(np.asarray(vals), ref_v, rtol=1e-4, atol=1e-5)


def test_multihost_helpers_single_host():
    """Tier-3 scaffolding (docs/SCALE_OUT.md): single-host no-op bootstrap,
    unit dcn axis, segment routing."""
    from velesdb_tpu.parallel.multihost import (
        init_distributed,
        make_hybrid_mesh,
        num_slices,
        segment_for_host,
    )

    assert init_distributed() is False  # no env config -> no-op
    assert num_slices() >= 1
    m = make_hybrid_mesh(dp=2)
    assert m.shape["dcn"] == 1 and m.shape["dp"] == 2
    # contiguous, covering, non-overlapping segments
    segs = [segment_for_host(103, h, 4) for h in range(4)]
    assert segs[0][0] == 0 and segs[-1][1] == 103
    for (a, b), (c, d) in zip(segs, segs[1:]):
        assert b == c


def test_sharded_sq8_matches_single_device(rng):
    """VERDICT r2 #2: the SQ8 shard mode must agree with the single-device
    SQ8 engine (same quantization, same scores, same rows)."""
    from velesdb_tpu.ops import StorageMode
    from velesdb_tpu.ops.quantization import SQ8Vectors
    from velesdb_tpu.ops.streamed import sq8_streamed_topk
    from velesdb_tpu.parallel.sharded import _sq8_quantize_host

    mesh = make_mesh(8, dp=2)
    n, d, b, k = 1024, 64, 8, 10
    metric = DistanceMetric.EUCLIDEAN
    corpus = rng.standard_normal((n, d)).astype(np.float32)
    queries = rng.standard_normal((b, d)).astype(np.float32)

    idx = ShardedBruteForce(mesh, d, metric, storage_mode=StorageMode.SQ8)
    idx.rebuild(corpus)
    vals, gidx = idx.search(queries, k)

    import jax.numpy as jnp

    codes, scale, minv = _sq8_quantize_host(corpus)
    deq = codes.astype(np.float32) * scale[:, None] + minv[:, None]
    cnorm = np.sum(deq * deq, axis=1).astype(np.float32)
    sv, si = sq8_streamed_topk(
        queries,
        SQ8Vectors(jnp.asarray(codes), jnp.asarray(scale), jnp.asarray(minv)),
        cnorm=jnp.asarray(cnorm),
        k=k,
        metric=metric,
    )
    assert np.array_equal(
        np.sort(gidx, axis=1), np.sort(np.asarray(si), axis=1)
    ), "sharded SQ8 must equal single-device SQ8"
    np.testing.assert_allclose(
        np.sort(vals, axis=1), np.sort(np.asarray(sv), axis=1),
        rtol=1e-4, atol=1e-4,
    )


def test_sharded_bf16_mode(rng):
    """bf16 shard mode: half the HBM per shard, rows still exact enough to
    match the f32 top-k on well-separated data."""
    from velesdb_tpu.ops import StorageMode

    mesh = make_mesh(8)
    n, d, b, k = 512, 32, 4, 5
    # well-separated clustered rows so bf16 rounding cannot swap ranks
    centers = rng.standard_normal((8, d)).astype(np.float32) * 10.0
    corpus = centers[rng.integers(0, 8, n)] + rng.standard_normal(
        (n, d)
    ).astype(np.float32)
    queries = corpus[rng.integers(0, n, b)] + 0.01 * rng.standard_normal(
        (b, d)
    ).astype(np.float32)
    idx = ShardedBruteForce(mesh, d, DistanceMetric.COSINE,
                            storage_mode=StorageMode.BF16)
    idx.rebuild(corpus)
    _, gidx = idx.search(queries, k)
    ref_v, ref_i = _reference_topk(queries, corpus, k, DistanceMetric.COSINE)
    # top-1 must match; full set may swap near-ties under bf16
    assert np.array_equal(gidx[:, 0], ref_i[:, 0])


def test_sharded_sq8_masked(rng):
    from velesdb_tpu.ops import StorageMode

    mesh = make_mesh(8)
    n, d, k = 512, 32, 5
    corpus = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((2, d)).astype(np.float32)
    mask = rng.random(n) < 0.3
    idx = ShardedBruteForce(mesh, d, DistanceMetric.COSINE,
                            storage_mode=StorageMode.SQ8)
    idx.rebuild(corpus)
    _, gidx = idx.search(q, k, mask=mask)
    assert mask[gidx[gidx >= 0]].all(), "masked-out rows must never surface"


def test_sharded_assist_matches_exact(rng, monkeypatch):
    """int8-assist shard mode (r4 serve-path parity): per-shard coarse int8
    scan + exact f32 rerank inside shard_map must agree with the exact
    oracle on clustered data (the mode is exact-grade single-chip, r3e)."""
    from velesdb_tpu.index import brute as brute_mod
    from velesdb_tpu.ops import StorageMode

    monkeypatch.setattr(brute_mod, "BUCKET_MIN_ROWS", 16_384)
    mesh = make_mesh(8)
    n, d, b, k = 390_000, 64, 16, 10
    centers = rng.standard_normal((32, d)).astype(np.float32) * 2.0
    corpus = centers[rng.integers(0, 32, n)] + rng.standard_normal(
        (n, d)
    ).astype(np.float32) * 0.5
    queries = corpus[rng.integers(0, n, b)] + 1e-3 * rng.standard_normal(
        (b, d)
    ).astype(np.float32)
    idx = ShardedBruteForce(mesh, d, DistanceMetric.EUCLIDEAN,
                            storage_mode=StorageMode.FULL)
    idx.rebuild(corpus)
    assert idx._assist is not None
    assert idx._assist_serves(16, k), "guard must accept this shape"
    vals, rows = idx.search(queries, k)
    assert rows.shape == (b, k) and (rows[:, 0] >= 0).all()
    ref_v, ref_i = _reference_topk(queries, corpus, k, DistanceMetric.EUCLIDEAN)
    overlap = np.mean([
        len(set(rows[i]) & set(ref_i[i])) / k for i in range(b)
    ])
    assert overlap >= 0.9, f"assist shard recall {overlap}"
    # top-1 is the planted near-duplicate, scored exactly
    assert (rows[:, 0] == ref_i[:, 0]).mean() >= 0.9
    # guard honesty: a huge k exceeds the oversample bound -> streamed path
    assert not idx._assist_serves(16, 4096)


def test_sharded_sq8_lowers_at_north_star_scale():
    """Capacity dryrun (VERDICT r2 #2): the SQ8 sharded program must lower
    and compile at >=1M rows PER SHARD (8M x 768D total here; the 50M x 768D
    north star is the same program at more scan steps — capacity math in
    parallel/sharded.py docstring)."""
    import jax
    import jax.numpy as jnp

    from velesdb_tpu.parallel.sharded import _sharded_search_sq8

    mesh = make_mesh(8)
    # 6.25M rows/shard = the 50M/8 north-star shard size (VERDICT r4 #5)
    n, d, b, k = 8 * 6_291_456, 768, 8, 10
    sds = jax.ShapeDtypeStruct
    lowered = _sharded_search_sq8.lower(
        sds((b, d), jnp.float32),
        sds((n, d), jnp.uint8),
        sds((n,), jnp.float32),
        sds((n,), jnp.float32),
        sds((n,), jnp.float32),
        sds((n,), bool),
        None,
        mesh=mesh,
        k=k,
        metric=DistanceMetric.COSINE,
        chunk=65536,
    )
    assert lowered.compile() is not None


def test_sharded_assist_lowers_at_north_star_scale():
    """The assist shard program lowers + compiles at 6.25M rows/shard
    (50M x 128D total — the D < 512 regime assist serves). interpret=True
    is the CPU-lowerable form; the real-kernel form compiles on TPU."""
    import jax
    import jax.numpy as jnp

    from velesdb_tpu.parallel.sharded import _sharded_search_assist

    mesh = make_mesh(8)
    n, d, b, k = 8 * 6_291_456, 128, 8, 10
    sds = jax.ShapeDtypeStruct
    lowered = _sharded_search_assist.lower(
        sds((b, d), jnp.float32),
        sds((n, d), jnp.int8),
        sds((n,), jnp.float32),
        sds((n,), jnp.float32),
        sds((n,), jnp.float32),
        sds((n, d), jnp.float32),
        None,
        mesh=mesh,
        k=k,
        m=16,
        metric=DistanceMetric.EUCLIDEAN,
        chunk=8192,
        interpret=True,
    )
    assert lowered.compile() is not None


def test_sharded_sq8_matches_single_device_100k(rng):
    """Equivalence at a non-toy shard size (12.5K rows/shard): sharded SQ8
    must agree with single-device SQ8 row-for-row."""
    from velesdb_tpu.ops import StorageMode
    from velesdb_tpu.ops.quantization import SQ8Vectors
    from velesdb_tpu.ops.streamed import sq8_streamed_topk
    from velesdb_tpu.parallel.sharded import _sq8_quantize_host

    import jax.numpy as jnp

    mesh = make_mesh(8)
    n, d, b, k = 100_000, 64, 16, 10
    corpus = rng.standard_normal((n, d)).astype(np.float32)
    queries = rng.standard_normal((b, d)).astype(np.float32)
    from velesdb_tpu.ops import StorageMode

    idx = ShardedBruteForce(mesh, d, DistanceMetric.COSINE,
                            storage_mode=StorageMode.SQ8)
    idx.rebuild(corpus)
    vals, rows = idx.search(queries, k, chunk=8192)

    codes, scale, minv = _sq8_quantize_host(corpus)
    deq = codes.astype(np.float32) * scale[:, None] + minv[:, None]
    cn = np.sqrt(np.sum(deq * deq, axis=1)).astype(np.float32)
    sv, si = sq8_streamed_topk(
        queries,
        SQ8Vectors(jnp.asarray(codes), jnp.asarray(scale), jnp.asarray(minv)),
        cnorm=jnp.asarray(cn), k=k, metric=DistanceMetric.COSINE, chunk=8192,
    )
    assert np.array_equal(np.sort(rows, 1), np.sort(np.asarray(si), 1))
