"""Streamed (scan+PartialReduce) and bucket-kernel exact engines vs oracle.

These are the round-2 replacements for the k-pass fused kernel on the TPU hot
path (`ops/streamed.py`, `ops/bucket_kernel.py`). The CPU suite validates
exact correctness (streamed, approx=False), aggregate-selection recall
(approx=True), the bucket kernel in interpret mode, and the dispatch
contract (masks, empty results, k>n, value orientation per metric).
"""

import numpy as np
import pytest

from velesdb_tpu.ops import DistanceMetric
from velesdb_tpu.ops.bucket_kernel import bucket_topk
from velesdb_tpu.ops.chunked import brute_force_topk
from velesdb_tpu.ops.streamed import streamed_topk

METRICS = ["cosine", "euclidean", "dot"]


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(7)
    n, d = 4096, 48
    corpus = rng.standard_normal((n, d)).astype(np.float32)
    queries = rng.standard_normal((13, d)).astype(np.float32)
    valid = rng.random(n) > 0.15
    return corpus, queries, valid


def _recall(a, b):
    return np.mean(
        [len(set(a[i]) & set(b[i])) / a.shape[1] for i in range(a.shape[0])]
    )


@pytest.mark.parametrize("metric", METRICS)
@pytest.mark.parametrize("approx", [False, True])
def test_streamed_matches_oracle(data, metric, approx):
    corpus, queries, valid = data
    m = DistanceMetric.parse(metric)
    gv, gi = brute_force_topk(queries, corpus, 10, m, valid=valid)
    sv, si = streamed_topk(
        queries, corpus, valid=valid, k=10, metric=m, chunk=1024, approx=approx
    )
    sv, si = np.asarray(sv), np.asarray(si)
    if approx:
        assert _recall(si, gi) >= 0.99
    else:
        np.testing.assert_array_equal(si, gi)
        np.testing.assert_allclose(sv, gv, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("metric", METRICS)
def test_bucket_kernel_interpret(data, metric):
    corpus, queries, valid = data
    m = DistanceMetric.parse(metric)
    _, gi = brute_force_topk(queries, corpus, 10, m, valid=valid)
    if m is DistanceMetric.EUCLIDEAN:
        pen = np.where(valid, (corpus**2).sum(1), np.inf).astype(np.float32)
    else:
        pen = np.where(valid, 0.0, np.inf).astype(np.float32)
    bv, bi = bucket_topk(
        queries, corpus, penalty=pen, k=10, metric=m, chunk=512, interpret=True
    )
    bi = np.asarray(bi)
    # one winner per 128-lane bucket: collisions cost a little recall
    assert _recall(bi, gi) >= 0.97
    assert np.all(bi[:, 0] == gi[:, 0])  # top-1 never collides with itself
    if m is DistanceMetric.EUCLIDEAN:
        assert np.all(np.diff(np.asarray(bv), axis=1) >= -1e-5)


@pytest.mark.parametrize("metric", METRICS)
def test_sq8_streamed_matches_dequant_oracle(data, metric):
    import jax.numpy as jnp

    from velesdb_tpu.ops.quantization import sq8_dequantize, sq8_quantize
    from velesdb_tpu.ops.streamed import sq8_streamed_topk

    corpus, queries, valid = data
    m = DistanceMetric.parse(metric)
    sq = sq8_quantize(jnp.asarray(corpus))
    deq = np.asarray(sq8_dequantize(sq))
    _, gi = brute_force_topk(queries, deq, 10, m, valid=valid)
    _, si = sq8_streamed_topk(
        queries, sq, valid=valid, k=10, metric=m, chunk=1024, approx=False
    )
    # bf16 query rounding in the streamed matmul can swap near-ties
    assert _recall(np.asarray(si), gi) >= 0.95


def test_streamed_all_masked(data):
    corpus, queries, _ = data
    sv, si = streamed_topk(
        queries, corpus, valid=np.zeros(corpus.shape[0], bool), k=5,
        metric="cosine",
    )
    assert np.all(np.asarray(si) == -1)
    assert np.all(np.asarray(sv) == -np.inf)


def test_streamed_k_exceeds_n():
    rng = np.random.default_rng(0)
    corpus = rng.standard_normal((7, 16)).astype(np.float32)
    q = rng.standard_normal((2, 16)).astype(np.float32)
    sv, si = streamed_topk(q, corpus, k=20, metric="euclidean")
    assert si.shape == (2, 7)
    assert sorted(np.asarray(si)[0].tolist()) == list(range(7))


def test_streamed_euclidean_values_are_distances(data):
    corpus, queries, valid = data
    sv, si = streamed_topk(
        queries, corpus, valid=valid, k=5, metric="euclidean", approx=False
    )
    sv, si = np.asarray(sv), np.asarray(si)
    d0 = np.linalg.norm(queries[0] - corpus[si[0, 0]])
    assert abs(sv[0, 0] - d0) < 1e-3
    assert np.all(np.diff(sv, axis=1) >= -1e-5)  # ascending distances


def test_streamed_dynamic_mask_changes_results(data):
    corpus, queries, valid = data
    _, si_all = streamed_topk(queries, corpus, valid=valid, k=5, metric="cosine")
    banned = np.asarray(si_all)[:, 0]
    mask = valid.copy()
    mask[banned] = False
    _, si_m = streamed_topk(queries, corpus, valid=mask, k=5, metric="cosine")
    si_m = np.asarray(si_m)
    for i in range(queries.shape[0]):
        assert banned[i] not in si_m[i]


def test_hamming_bucket_kernel_interpret(data):
    import jax.numpy as jnp

    from velesdb_tpu.ops import binary_quantize
    from velesdb_tpu.ops.bucket_kernel import hamming_bucket_topk
    from velesdb_tpu.ops.pallas_kernels import hamming_topk

    corpus, queries, valid = data
    pq = binary_quantize(jnp.asarray(queries))
    pc = binary_quantize(jnp.asarray(corpus))
    dg, ig = hamming_topk(pq, pc, valid=jnp.asarray(valid), k=10, interpret=True)
    pen = jnp.where(jnp.asarray(valid), 0.0, jnp.inf)
    db, ib = hamming_bucket_topk(pq, pc, pen, k=10, chunk=512, interpret=True)
    db, ib = np.asarray(db), np.asarray(ib)
    # integer Hamming distances tie heavily; compare the distance PROFILE
    # (ties swap ids freely) plus exact top-1 distance
    assert np.all(db[:, 0] == np.asarray(dg)[:, 0])
    assert np.mean(np.abs(db - np.asarray(dg))) < 0.6
    assert np.all(np.diff(db, axis=1) >= 0)
    # masked rows never surface
    bad = set(np.flatnonzero(~valid))
    assert not (set(ib.ravel().tolist()) & bad)


def test_hamming_mxu_kernel_interpret(data):
    """Bit-plane MXU Hamming (popcount(q^c) = |q|+|c|-2q.c on 0/1 rows)
    must agree with the packed popcount kernel on the distance profile —
    on-chip agreement is exact (max|d|=0, exp_hamming_mxu.py)."""
    import jax.numpy as jnp

    from velesdb_tpu.ops import binary_quantize
    from velesdb_tpu.ops.bucket_kernel import (
        _HAM_BIG,
        hamming_bits_rows,
        hamming_bucket_topk,
        hamming_mxu_topk,
        hamming_mxu_rerank_topk,
    )

    corpus, queries, valid = data
    d = corpus.shape[1]
    pq = binary_quantize(jnp.asarray(queries))
    pc = binary_quantize(jnp.asarray(corpus))
    pen = jnp.where(jnp.asarray(valid), 0.0, jnp.inf)
    db, ib = hamming_bucket_topk(pq, pc, pen, k=10, chunk=512, interpret=True)
    bits = hamming_bits_rows(jnp.asarray(corpus), d)
    csum = jnp.sum(bits.astype(jnp.int32), axis=1)
    aux = jnp.where(jnp.asarray(valid), csum, csum + _HAM_BIG).astype(
        jnp.int32
    )
    qbits = (jnp.asarray(queries) >= 0.0).astype(jnp.int8)
    qbits = jnp.pad(qbits, ((0, 0), (0, bits.shape[1] - d)))
    dm, im = hamming_mxu_topk(qbits, bits, aux, k=10, chunk=512,
                              interpret=True)
    db, dm, im = np.asarray(db), np.asarray(dm), np.asarray(im)
    # integer Hamming distances tie heavily; ids swap freely inside ties —
    # the distance PROFILE must match exactly
    np.testing.assert_array_equal(np.sort(db, axis=1), np.sort(dm, axis=1))
    bad = set(np.flatnonzero(~valid))
    assert not (set(im.ravel().tolist()) & bad)
    # fused rerank tail: exact f32 rescoring of the coarse pool, -1-safe
    vals, ids = hamming_mxu_rerank_topk(
        jnp.asarray(queries), qbits, bits, aux, jnp.asarray(corpus),
        k=5, m=40, metric=DistanceMetric.EUCLIDEAN, chunk=512,
        interpret=True,
    )
    vals, ids = np.asarray(vals), np.asarray(ids)
    assert np.all(np.diff(vals, axis=1) >= -1e-5)
    assert not (set(ids[ids >= 0].ravel().tolist()) & bad)
    # rerank distances are true f32 euclidean on the surfaced ids
    for b in range(3):
        for j in range(5):
            if ids[b, j] >= 0:
                ref = np.linalg.norm(queries[b] - corpus[ids[b, j]])
                assert abs(ref - vals[b, j]) < 1e-3


@pytest.mark.parametrize("metric", METRICS)
def test_sq8pd_assist_interpret(data, metric):
    """Per-dim enc-select assist (r5 serve default): coarse pool + exact
    f32 rerank must land near the oracle; empties/masks honored; the XLA
    twin must agree with the kernel path from the same shadow."""
    import jax.numpy as jnp

    from velesdb_tpu.ops.bucket_kernel import (
        _pd_invalid_pen,
        sq8pd_build,
        sq8pd_ptile,
        sq8pd_rerank_topk,
        sq8pd_topk,
        sq8pd_xla_rerank_topk,
    )

    corpus, queries, valid = data
    m = DistanceMetric.parse(metric)
    c = corpus.copy()
    if m is DistanceMetric.COSINE:
        c = c / np.linalg.norm(c, axis=1, keepdims=True)
    pd = sq8pd_build(jnp.asarray(c), jnp.asarray(valid), c.shape[1], m)
    assert pd is not None
    rows_pd, pen_int, pen_f32, sdim, mid, qu = pd
    ptile = sq8pd_ptile(pen_int, 512)
    _, gi = brute_force_topk(queries, c, 10, m, valid=valid)
    qj = jnp.asarray(queries)
    vals, ids = sq8pd_rerank_topk(
        qj, rows_pd, ptile, sdim, qu, jnp.asarray(c), k=10, m=40,
        metric=m, chunk=512, dim=c.shape[1], interpret=True,
    )
    ids = np.asarray(ids)
    assert _recall(ids, np.asarray(gi)) >= 0.9
    bad = set(np.flatnonzero(~valid))
    assert not (set(ids[ids >= 0].ravel().tolist()) & bad)
    # rerank values are exact f32 on the surfaced ids
    vals = np.asarray(vals)
    for b in range(3):
        j = 0
        if ids[b, j] >= 0:
            if m is DistanceMetric.EUCLIDEAN:
                ref = np.linalg.norm(queries[b] - c[ids[b, j]])
            elif m is DistanceMetric.COSINE:
                ref = float(
                    queries[b] @ c[ids[b, j]] / np.linalg.norm(queries[b])
                )
            else:
                ref = float(queries[b] @ c[ids[b, j]])
            assert abs(ref - vals[b, j]) < 1e-3
    # XLA twin from the same shadow
    tv, ti = sq8pd_xla_rerank_topk(
        qj, rows_pd, pen_f32, sdim, qu, jnp.asarray(c), k=10, m=40,
        metric=m,
    )
    assert _recall(np.asarray(ti), np.asarray(gi)) >= 0.9
    # coarse-only values are metric-native and masked rows never surface
    cv, ci = sq8pd_topk(
        qj, rows_pd, ptile, sdim, mid, qu, k=10, chunk=512,
        dim=c.shape[1], metric=m, interpret=True,
    )
    ci = np.asarray(ci)
    assert not (set(ci[ci >= 0].ravel().tolist()) & bad)
    # dynamic mask knockout (the per-call filter path)
    banned = ids[:, 0].copy()
    mask = valid.copy()
    mask[banned[banned >= 0]] = False
    ptile_m = jnp.where(
        jnp.asarray(mask), ptile, -64 * _pd_invalid_pen(c.shape[1])
    )
    _, ids_m = sq8pd_rerank_topk(
        qj, rows_pd, ptile_m, sdim, qu, jnp.asarray(c), k=10, m=40,
        metric=m, chunk=512, dim=c.shape[1], interpret=True,
    )
    ids_m = np.asarray(ids_m)
    for i in range(queries.shape[0]):
        if banned[i] >= 0:
            assert banned[i] not in ids_m[i]


@pytest.mark.parametrize("metric", METRICS)
def test_sq8_bucket_kernel_interpret(data, metric):
    """SQ8 bucket kernel (int32-staged unpack): recall vs dequant oracle;
    cosine's 1/|c| folds into scale/minv at pack time."""
    import jax.numpy as jnp

    from velesdb_tpu.ops.bucket_kernel import sq8_bucket_topk, sq8_pack_blocked
    from velesdb_tpu.ops.quantization import sq8_dequantize, sq8_quantize

    corpus, queries, valid = data
    m = DistanceMetric.parse(metric)
    sq = sq8_quantize(jnp.asarray(corpus))
    deq = np.asarray(sq8_dequantize(sq))
    words = sq8_pack_blocked(sq.codes)
    dn = (deq**2).sum(1)
    if m is DistanceMetric.COSINE:
        inv = 1.0 / np.maximum(np.sqrt(dn), 1e-30)
        scale, minv = np.asarray(sq.scale) * inv, np.asarray(sq.minv) * inv
        pen = np.where(valid, 0.0, np.inf).astype(np.float32)
    elif m is DistanceMetric.EUCLIDEAN:
        scale, minv = np.asarray(sq.scale), np.asarray(sq.minv)
        pen = np.where(valid, dn, np.inf).astype(np.float32)
    else:
        scale, minv = np.asarray(sq.scale), np.asarray(sq.minv)
        pen = np.where(valid, 0.0, np.inf).astype(np.float32)
    _, gi = brute_force_topk(queries, deq, 10, m, valid=valid)
    _, si = sq8_bucket_topk(
        jnp.asarray(queries), words, jnp.asarray(scale), jnp.asarray(minv),
        jnp.asarray(pen), k=10, metric=m, chunk=512, interpret=True,
    )
    assert _recall(np.asarray(si), gi) >= 0.97


@pytest.mark.parametrize("metric", METRICS)
def test_sq8_int8_direct_kernel_interpret(data, metric):
    """int8-direct SQ8 kernel (no unpack; int8 MXU dots + symmetric query
    quantization): recall vs the dequant oracle must match the staged
    kernel's envelope despite the extra query-quantization noise."""
    import jax.numpy as jnp

    from velesdb_tpu.ops.bucket_kernel import sq8_int8_rows, sq8i_bucket_topk
    from velesdb_tpu.ops.quantization import sq8_dequantize, sq8_quantize

    corpus, queries, valid = data
    m = DistanceMetric.parse(metric)
    sq = sq8_quantize(jnp.asarray(corpus))
    deq = np.asarray(sq8_dequantize(sq))
    rows8 = sq8_int8_rows(sq.codes)
    dn = (deq**2).sum(1)
    if m is DistanceMetric.COSINE:
        inv = 1.0 / np.maximum(np.sqrt(dn), 1e-30)
        scale, minv = np.asarray(sq.scale) * inv, np.asarray(sq.minv) * inv
        pen = np.where(valid, 0.0, np.inf).astype(np.float32)
    elif m is DistanceMetric.EUCLIDEAN:
        scale, minv = np.asarray(sq.scale), np.asarray(sq.minv)
        pen = np.where(valid, dn, np.inf).astype(np.float32)
    else:
        scale, minv = np.asarray(sq.scale), np.asarray(sq.minv)
        pen = np.where(valid, 0.0, np.inf).astype(np.float32)
    _, gi = brute_force_topk(queries, deq, 10, m, valid=valid)
    sv, si = sq8i_bucket_topk(
        jnp.asarray(queries), rows8, jnp.asarray(scale), jnp.asarray(minv),
        jnp.asarray(pen), k=10, metric=m, chunk=512, interpret=True,
    )
    assert _recall(np.asarray(si), gi) >= 0.97
    if m is DistanceMetric.EUCLIDEAN:
        # restored distances are sorted ascending and non-negative
        sv = np.asarray(sv)
        assert np.all(np.diff(sv, axis=1) >= -1e-4) and np.all(sv >= 0)


def test_sq8_int8_kernel_odd_dim_and_mask():
    """d=100 (pad to 128) + invalid rows masked via +inf penalty."""
    import jax.numpy as jnp

    from velesdb_tpu.ops.bucket_kernel import sq8_int8_rows, sq8i_bucket_topk
    from velesdb_tpu.ops.quantization import sq8_dequantize, sq8_quantize

    rng = np.random.default_rng(5)
    n, d = 1024, 100
    corpus = rng.standard_normal((n, d)).astype(np.float32)
    queries = rng.standard_normal((8, d)).astype(np.float32)
    valid = np.ones(n, bool)
    valid[::7] = False
    m = DistanceMetric.EUCLIDEAN
    sq = sq8_quantize(jnp.asarray(corpus))
    deq = np.asarray(sq8_dequantize(sq))
    rows8 = sq8_int8_rows(sq.codes)
    assert rows8.shape == (n, 128)
    pen = np.where(valid, (deq**2).sum(1), np.inf).astype(np.float32)
    _, gi = brute_force_topk(queries, deq, 10, m, valid=valid)
    _, si = sq8i_bucket_topk(
        jnp.asarray(queries), rows8, sq.scale, sq.minv, jnp.asarray(pen),
        k=10, metric=m, chunk=256, interpret=True,
    )
    si = np.asarray(si)
    assert _recall(si, gi) >= 0.97
    assert not np.isin(si, np.flatnonzero(~valid)).any()  # mask respected


@pytest.mark.parametrize("metric", METRICS)
def test_sq8_int8_assist_rerank_interpret(data, metric):
    """int8-assist entry: coarse int8 scan + in-program f32 gather-rerank
    returns exact-oracle VALUES for its hits and >=0.99-grade recall."""
    import jax
    import jax.numpy as jnp

    from velesdb_tpu.ops.bucket_kernel import sq8_int8_rows, sq8i_rerank_topk
    from velesdb_tpu.ops.quantization import sq8_quantize

    corpus, queries, valid = data
    m = DistanceMetric.parse(metric)
    xs = corpus.copy()
    if m is DistanceMetric.COSINE:
        xs = xs / np.maximum(np.linalg.norm(xs, axis=1, keepdims=True), 1e-30)
    sq = sq8_quantize(jnp.asarray(xs))
    rows8 = sq8_int8_rows(sq.codes)
    deq = sq.codes.astype(jnp.float32) * sq.scale[:, None] + sq.minv[:, None]
    dsq = jnp.sum(deq * deq, axis=-1)
    if m is DistanceMetric.COSINE:
        inv = jnp.where(dsq > 1e-30, jax.lax.rsqrt(jnp.maximum(dsq, 1e-30)), 0.0)
        scale, minv = sq.scale * inv, sq.minv * inv
        base = np.zeros(len(xs), np.float32)
    elif m is DistanceMetric.EUCLIDEAN:
        scale, minv = sq.scale, sq.minv
        base = np.asarray(dsq)
    else:
        scale, minv = sq.scale, sq.minv
        base = np.zeros(len(xs), np.float32)
    pen = jnp.asarray(np.where(valid, base, np.inf).astype(np.float32))
    gv, gi = brute_force_topk(queries, xs, 10, m, valid=valid)
    vals, ids = sq8i_rerank_topk(
        jnp.asarray(queries), rows8, scale, minv, pen, jnp.asarray(xs),
        k=10, m=64, metric=m, chunk=512, interpret=True,
    )
    ids, vals = np.asarray(ids), np.asarray(vals)
    gi, gv = np.asarray(gi), np.asarray(gv)
    assert _recall(ids, gi) >= 0.98
    assert not np.isin(ids, np.flatnonzero(~valid)).any()
    # wherever assist and oracle agree on the id, values match exactly-ish
    agree = ids[:, 0] == gi[:, 0]
    assert agree.mean() >= 0.9
    np.testing.assert_allclose(vals[agree, 0], gv[agree, 0], rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("metric", METRICS)
def test_sq8i_xla_rerank_twin(data, metric):
    """The pure-XLA assist twin matches the Pallas assist contract: exact
    oracle VALUES on agreement, high recall, mask respected — from the SAME
    shadow arrays, no Pallas anywhere (kernel-demotion fallback)."""
    import jax
    import jax.numpy as jnp

    from velesdb_tpu.ops.bucket_kernel import (
        sq8_int8_rows, sq8i_xla_rerank_topk,
    )
    from velesdb_tpu.ops.quantization import sq8_quantize

    corpus, queries, valid = data
    m = DistanceMetric.parse(metric)
    xs = corpus.copy()
    if m is DistanceMetric.COSINE:
        xs = xs / np.maximum(np.linalg.norm(xs, axis=1, keepdims=True), 1e-30)
    sq = sq8_quantize(jnp.asarray(xs))
    rows8 = sq8_int8_rows(sq.codes)
    deq = sq.codes.astype(jnp.float32) * sq.scale[:, None] + sq.minv[:, None]
    dsq = jnp.sum(deq * deq, axis=-1)
    if m is DistanceMetric.COSINE:
        inv = jnp.where(dsq > 1e-30, jax.lax.rsqrt(jnp.maximum(dsq, 1e-30)), 0.0)
        scale, minv = sq.scale * inv, sq.minv * inv
        base = np.zeros(len(xs), np.float32)
    elif m is DistanceMetric.EUCLIDEAN:
        scale, minv = sq.scale, sq.minv
        base = np.asarray(dsq)
    else:
        scale, minv = sq.scale, sq.minv
        base = np.zeros(len(xs), np.float32)
    pen = jnp.asarray(np.where(valid, base, np.inf).astype(np.float32))
    gv, gi = brute_force_topk(queries, xs, 10, m, valid=valid)
    vals, ids = sq8i_xla_rerank_topk(
        jnp.asarray(queries), rows8, scale, minv, pen, jnp.asarray(xs),
        k=10, m=64, metric=m,
    )
    ids, vals = np.asarray(ids), np.asarray(vals)
    gi, gv = np.asarray(gi), np.asarray(gv)
    assert _recall(ids, gi) >= 0.98
    assert not np.isin(ids, np.flatnonzero(~valid)).any()
    agree = ids[:, 0] == gi[:, 0]
    assert agree.mean() >= 0.9
    np.testing.assert_allclose(vals[agree, 0], gv[agree, 0], rtol=2e-4, atol=2e-4)

    # selective filter passing FEWER rows than the coarse pool m: the
    # approx_max_k fill entries carry -inf coarse scores but REAL indices —
    # without the -1 mapping the exact rerank would un-mask filtered-out
    # rows (code-review r4)
    tight = np.zeros(len(xs), bool)
    allowed = np.flatnonzero(valid)[:7]  # 7 valid rows < m=64, < k=10
    tight[allowed] = True
    pen_t = jnp.asarray(np.where(tight, base, np.inf).astype(np.float32))
    vt, it_ = sq8i_xla_rerank_topk(
        jnp.asarray(queries), rows8, scale, minv, pen_t, jnp.asarray(xs),
        k=10, m=64, metric=m,
    )
    it_ = np.asarray(it_)
    assert np.isin(it_[it_ >= 0], allowed).all()
    assert (it_ >= 0).sum(axis=1).max() <= 7  # only real matches surface


@pytest.mark.parametrize("metric", METRICS)
def test_split_bf16_bucket_kernel_interpret(data, metric):
    """split-bf16 (true-f32 emulation) bucket kernel: same contract as the
    f32 bucket kernel, fidelity within ~1e-4 of true f32 scores."""
    import jax.numpy as jnp

    from velesdb_tpu.ops.bucket_kernel import bucket_topk_hl, split_f32_rows

    corpus, queries, valid = data
    m = DistanceMetric.parse(metric)
    xs = corpus.copy()
    if m is DistanceMetric.COSINE:
        xs = xs / np.maximum(np.linalg.norm(xs, axis=1, keepdims=True), 1e-30)
    if m is DistanceMetric.EUCLIDEAN:
        pen = np.where(valid, (xs**2).sum(1), np.inf).astype(np.float32)
    else:
        pen = np.where(valid, 0.0, np.inf).astype(np.float32)
    d_pad = ((xs.shape[1] + 127) // 128) * 128
    padded = jnp.pad(jnp.asarray(xs), ((0, 0), (0, d_pad - xs.shape[1])))
    hi, lo = split_f32_rows(padded)
    gv, gi = brute_force_topk(queries, xs, 10, m, valid=valid)
    bv, bi = bucket_topk_hl(
        jnp.asarray(queries), hi, lo, jnp.asarray(pen), k=10, metric=m,
        chunk=512, interpret=True,
    )
    bi, bv = np.asarray(bi), np.asarray(bv)
    gi, gv = np.asarray(gi), np.asarray(gv)
    assert _recall(bi, gi) >= 0.97  # bucket collisions only
    agree = bi[:, 0] == gi[:, 0]
    assert agree.mean() >= 0.95
    np.testing.assert_allclose(bv[agree, 0], gv[agree, 0], rtol=2e-4, atol=2e-4)


def test_full_mode_builds_int8_assist_shadow(monkeypatch):
    """FULL collections at D<512 past the bucket threshold build the
    per-dim enc-select shadow (r5 serve default) INSTEAD of the split-bf16
    copy; when the pd builder refuses, the per-row int8-assist shadow
    (r3e default) serves exactly as before."""
    import jax.numpy as jnp

    from velesdb_tpu.index import brute as brute_mod
    from velesdb_tpu.index.brute import BruteForceIndex
    from velesdb_tpu.ops import StorageMode

    monkeypatch.setattr(brute_mod, "use_pallas", lambda: True)
    monkeypatch.setattr(brute_mod, "BUCKET_MIN_ROWS", 1024)

    rng = np.random.default_rng(5)
    n, d = 900, 32
    xs = rng.standard_normal((n, d)).astype(np.float32)
    valid = np.ones(n, bool)
    valid[7] = False

    for metric in ("euclidean", "cosine", "dot"):
        idx = BruteForceIndex(d, DistanceMetric.parse(metric), StorageMode.FULL)
        idx.rebuild(xs, valid)
        assert idx._assist_pd is not None, metric
        assert idx._assist is None, metric
        assert idx._full_hl is None, metric
        rows_pd, pen_int, pen_f32, sdim, mid, qu = idx._assist_pd
        assert rows_pd.dtype == jnp.int8
        assert rows_pd.shape == (idx.n_pad, 128)  # dim padded to lanes
        assert isinstance(qu, float) and qu > 0
        # tombstoned + padded rows knocked out in BOTH penalty forms
        from velesdb_tpu.ops.bucket_kernel import _pd_invalid_pen

        pi = np.asarray(pen_int)
        pf = np.asarray(pen_f32)
        assert pi[7] == _pd_invalid_pen(d) and (pi[n:] == _pd_invalid_pen(d)).all()
        assert np.isinf(pf[7]) and np.isinf(pf[n:]).all()
        assert np.isfinite(pf[:n][valid[:n]]).all()
        if metric == "euclidean":
            assert pi[0] > 0  # |x|^2 penalty in the int encoding
        else:
            assert pi[0] == 0

    # pd builder refusal (per-row fallback): a far-offset tiny-spread
    # corpus (huge |x|^2, tiny per-dim quant step -> pen_int above the
    # int32 cap) must land on the per-row assist shadow
    idx = BruteForceIndex(d, DistanceMetric.EUCLIDEAN, StorageMode.FULL)
    idx.rebuild(xs * 0.001 + 1000.0, valid)
    assert idx._assist_pd is None
    assert idx._assist is not None
    rows8, scale, minv, pen = idx._assist
    assert rows8.dtype == jnp.int8

    # below the bucket threshold: no shadow at all
    monkeypatch.setattr(brute_mod, "BUCKET_MIN_ROWS", 1 << 20)
    idx = BruteForceIndex(d, DistanceMetric.EUCLIDEAN, StorageMode.FULL)
    idx.rebuild(xs, valid)
    assert idx._assist is None and idx._assist_pd is None
    assert idx._full_hl is None


def test_serve_engine_observability(monkeypatch):
    """`BruteForceIndex.serve_engine` mirrors the dispatch order and
    surfaces through `Collection.info()['exact_serve']`."""
    from velesdb_tpu.index import brute as brute_mod
    from velesdb_tpu.index.brute import BruteForceIndex
    from velesdb_tpu.ops import StorageMode

    rng = np.random.default_rng(3)
    xs = rng.standard_normal((600, 32)).astype(np.float32)
    valid = np.ones(600, bool)

    idx = BruteForceIndex(32, DistanceMetric.COSINE, StorageMode.FULL)
    idx.rebuild(xs, valid)
    assert idx.serve_engine() == "fused-xla"  # CPU: no Pallas

    import tempfile

    from velesdb_tpu.database import Database

    db = Database(tempfile.mkdtemp(prefix="obs_db_"))
    col = db.create_collection("obs", dim=8)
    col.upsert_bulk([1, 2], np.eye(8, dtype=np.float32)[:2])
    assert col.info()["exact_serve"] == "fused-xla"

    monkeypatch.setattr(brute_mod, "use_pallas", lambda: True)
    monkeypatch.setattr(brute_mod, "BUCKET_MIN_ROWS", 1024)
    # 600 rows pad to 1024 = ONE bucket chunk: the collision guard
    # (`_bucket_safe`) rejects every bucket kernel at k=10, so the honest
    # answer is the streamed fallback — the old serve_engine() reported
    # 'int8-assist' here while search() actually dispatched streamed
    # (ADVICE r3: serve_engine must apply the per-call guards)
    idx = BruteForceIndex(32, DistanceMetric.COSINE, StorageMode.FULL)
    idx.rebuild(xs, valid)
    assert idx._assist_pd is not None
    assert idx.serve_engine() == "streamed-scan"
    # enough buckets for k=10 -> assist serves; large k exceeds the
    # oversample collision bound -> honest fallback name
    big = rng.standard_normal((60_000, 32)).astype(np.float32)
    idxb = BruteForceIndex(32, DistanceMetric.COSINE, StorageMode.FULL)
    idxb.rebuild(big, np.ones(60_000, bool))
    assert idxb.serve_engine() == "int8-assist-pd"
    assert idxb.serve_engine(k=64) == "streamed-scan"
    idx768 = BruteForceIndex(768, DistanceMetric.COSINE, StorageMode.FULL)
    idx768.rebuild(rng.standard_normal((600, 768)).astype(np.float32), valid)
    assert idx768.serve_engine() == "streamed-scan"


def test_kernel_demotion_visibility(monkeypatch):
    """Tripping a sticky Mosaic kill-switch records the exception in the
    demotion registry and surfaces it via `Collection.info()` and the
    Prometheus text (VERDICT r3 weak #8); the assist trip also lazily
    builds the split-bf16 shadow so FULL collections keep true-f32
    fidelity (ADVICE r3 #1)."""
    from velesdb_tpu.index import brute as brute_mod
    from velesdb_tpu.index.brute import BruteForceIndex
    from velesdb_tpu.ops import StorageMode
    from velesdb_tpu.ops import demotions as dem_mod

    saved = (
        brute_mod._SQ8I_OK[0], brute_mod._HL_OK[0], brute_mod._PALLAS_OK[0],
        brute_mod._SQ8I_XLA_OK[0], brute_mod._SQ8PD_OK[0],
        brute_mod._SQ8PD_XLA_OK[0],
        dict(dem_mod.KERNEL_DEMOTIONS),
    )
    try:
        dem_mod.KERNEL_DEMOTIONS.clear()
        monkeypatch.setattr(brute_mod, "use_pallas", lambda: True)
        monkeypatch.setattr(brute_mod, "BUCKET_MIN_ROWS", 1024)
        rng = np.random.default_rng(5)
        xs = rng.standard_normal((60_000, 32)).astype(np.float32)
        valid = np.ones(60_000, bool)
        idx = BruteForceIndex(32, DistanceMetric.COSINE, StorageMode.FULL)
        idx.rebuild(xs, valid)
        assert idx.serve_engine() == "int8-assist-pd"
        # CPU backend: the interpret=False Pallas dispatch raises at trace
        # time, tripping the pd kernel; the pure-XLA pd TWIN serves from
        # the same shadow arrays (fidelity survives the kill-switch) — on
        # CPU it runs fine, so the search answers at exact-rerank grade
        # with only one demotion recorded
        vals, ids = idx.search(xs[:4], k=5)
        assert ids.shape == (4, 5)
        assert np.asarray(ids)[:, 0].tolist() == [0, 1, 2, 3]  # self-hits
        got = dem_mod.demotions()
        assert "int8-assist-pd" in got
        assert idx.serve_engine() == "int8-assist-pd-xla"
        assert idx._full_hl is None  # twin made the hl rebuild unnecessary

        # trip the twin too: the split-bf16 shadow is lazily built on the
        # way down so fidelity still survives a broken XLA twin
        from velesdb_tpu.ops import bucket_kernel as bk_mod

        def boom(*a, **k):
            raise RuntimeError("twin down")

        monkeypatch.setattr(bk_mod, "sq8pd_xla_rerank_topk", boom)
        vals, ids = idx.search(xs[:4], k=5)
        assert ids.shape == (4, 5)
        got = dem_mod.demotions()
        assert "int8-assist-pd-xla" in got
        assert idx._full_hl is not None or "split-bf16" in got

        # surfaces in Collection.info()
        import tempfile

        from velesdb_tpu.database import Database

        db = Database(tempfile.mkdtemp(prefix="dem_db_"))
        col = db.create_collection("dem", dim=8)
        col.upsert_bulk([1, 2], np.eye(8, dtype=np.float32)[:2])
        assert "int8-assist-pd" in col.info()["kernel_demotions"]

        # surfaces as a Prometheus gauge
        from velesdb_tpu.server.app import VelesServer

        app = VelesServer(db)
        app.config.server.enable_metrics = True
        text = app.prometheus()
        assert 'kernel_demoted{kernel="int8-assist-pd"} 1' in text
    finally:
        brute_mod._SQ8I_OK[0] = saved[0]
        brute_mod._HL_OK[0] = saved[1]
        brute_mod._PALLAS_OK[0] = saved[2]
        brute_mod._SQ8I_XLA_OK[0] = saved[3]
        brute_mod._SQ8PD_OK[0] = saved[4]
        brute_mod._SQ8PD_XLA_OK[0] = saved[5]
        dem_mod.KERNEL_DEMOTIONS.clear()
        dem_mod.KERNEL_DEMOTIONS.update(saved[6])


def test_pad_rows_quantized_buckets():
    """r4: above 64K rows pad_rows quantizes to pow2/16 steps (multiples of
    8192), capping pad-row scan waste at ~6% where pure power-of-two padding
    wasted up to 50% of the HBM budget (100K -> 131072 scanned 31% pad)."""
    from velesdb_tpu.index.brute import pad_rows

    assert pad_rows(1000) == 1024
    assert pad_rows(65536) == 65536  # <=64K: pure power of two
    assert pad_rows(65537) == 73728  # step 8192
    assert pad_rows(100_000) == 106496  # was 131072 (31% waste -> 6%)
    assert pad_rows(1_000_000) == 1_048_576  # 1M is 16 x 65536 already
    assert pad_rows(1_228_800) == 1_310_720  # was 2097152 (75% waste -> 6%)
    for n in (65537, 99_000, 123_456, 777_777, 1_228_800):
        p = pad_rows(n)
        assert p >= n and p % 8192 == 0


def test_pick_chunk_divides():
    from velesdb_tpu.ops.streamed import _pick_chunk

    assert _pick_chunk(106496, 65536) == 53248
    assert _pick_chunk(1_048_576, 65536) == 65536
    assert _pick_chunk(73728, 65536) == 36864
    assert _pick_chunk(500, 65536) == 0  # no 1024-multiple divisor
    for n in (106496, 73728, 1_310_720, 909_312):
        c = _pick_chunk(n, 65536)
        assert c and n % c == 0 and c % 1024 == 0


def test_streamed_nonpow2_pad_matches_oracle():
    """End-to-end at a >64K corpus whose padded count is NOT a power of two
    (the new pad_rows regime): streamed scan must pick a dividing chunk and
    stay exact vs the oracle."""
    from velesdb_tpu.index.brute import BruteForceIndex, pad_rows
    from velesdb_tpu.ops import StorageMode

    rng = np.random.default_rng(11)
    n, d = 70_000, 16
    corpus = rng.standard_normal((n, d)).astype(np.float32)
    valid = np.ones(n, bool)
    idx = BruteForceIndex(d, DistanceMetric.EUCLIDEAN, StorageMode.FULL)
    idx.rebuild(corpus, valid)
    assert idx.n_pad == pad_rows(n) == 73728
    queries = corpus[:8] + rng.standard_normal((8, d)).astype(np.float32) * 0.01
    vals, ids = idx.search(queries, k=5)
    ids = np.asarray(ids)
    _, gi = brute_force_topk(queries, corpus, 5, DistanceMetric.EUCLIDEAN,
                             valid=valid)
    assert (np.asarray(ids[:, 0]) == np.asarray(gi)[:, 0]).all()
