"""Headline benchmark: search QPS/chip at recall@10 >= 0.95.

Round 3: the serving path is dimension-split (`index/brute.py`) — the
scan+PartialReduce streamed engine at D>=512, the bucket-max Pallas kernel
below. Two configs are measured, plus the small-batch IVF operating point:

- 100K x 768D cosine (the round-1 headline config; reference bar 9.2K QPS
  at recall 0.988, `docs/BENCHMARKS.md:58`)
- 1M x 128D euclidean (SIFT-1M class — the BASELINE.md north star:
  >=100K QPS at recall@10 >= 0.95)

Recall is validated on device against an INDEPENDENT exact oracle (the
chunked XLA path) — MXU matmul precision can swap near-tied ranks, so recall
lands ~0.99 rather than exactly 1.0.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where value
is the headline-config QPS and the metric string carries the SIFT-1M numbers.
Env knobs: BENCH_N, BENCH_D, BENCH_QUERIES, BENCH_BATCH, BENCH_SKIP_SIFT.
"""

import json
import os
import sys
import time


def _note(msg: str) -> None:
    """Progress to STDERR (the driver consumes exactly one stdout line)."""
    print(f"[bench] {time.strftime('%H:%M:%S')} {msg}", file=sys.stderr, flush=True)

import numpy as np

# persistent compile cache: kernel compiles through the remote tunnel cost
# 30-120s; cache them across bench runs (set before jax initializes)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/velesdb_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

REFERENCE_QPS = 9200.0  # docs/BENCHMARKS.md:58 (10K x 768D, Balanced, k=10)


def make_clustered(rng, n, d, n_clusters=64):
    """Clustered Gaussians — the reference's recall-suite data model
    (`recall_validation.rs`, `benchmarks/benchmark_recall.py:27-50`)."""
    centers = rng.standard_normal((n_clusters, d)).astype(np.float32) * 2.0
    assign = rng.integers(0, n_clusters, n)
    return centers[assign] + rng.standard_normal((n, d)).astype(np.float32) * 0.7


def _hp_oracle_fns():
    """HIGHEST-precision exact oracle + served-id rescore (jitted).

    The r3b metrology: MXU f32 matmuls carry ~3e-4 error that swaps
    near-tied ranks, so identity-recall vs a plain device oracle
    undercounts host-reranking engines ~3% and flatters pure-MXU ones.
    ``precision=HIGHEST`` emulates true f32 on the MXU (the repo's
    host-f32 convention — same basis as `benchmarks/curve.py`'s numpy
    oracle) WITHOUT reading a 512MB device-generated corpus back through
    the tunnel. Returns (oracle, rescore):

    - oracle(q, corpus, valid) -> (dist [B, k], ids [B, k]) true top-k,
      lower-is-better distance (L2 norm / 1-cos / -dot)
    - rescore(q, corpus, ids) -> dist [B, k] true distances of served ids
    """
    import functools

    import jax
    import jax.numpy as jnp

    def _dist_from_dots(q, dots, rr, metric):
        """Lower-is-better distance from HIGHEST-precision dots."""
        if metric.value == "euclidean":
            qq = jnp.sum(q * q, axis=-1, keepdims=True)
            return jnp.sqrt(jnp.maximum(qq + rr - 2.0 * dots, 0.0))
        if metric.value == "cosine":  # corpus pre-normalized in bench
            qn = jnp.sqrt(
                jnp.maximum(jnp.sum(q * q, axis=-1, keepdims=True), 1e-30)
            )
            return 1.0 - dots / qn
        return -dots

    @functools.partial(jax.jit, static_argnames=("k", "metric", "chunk"))
    def oracle(q, corpus, valid, *, k, metric, chunk):
        n = corpus.shape[0]
        corpus_c = corpus.reshape(n // chunk, chunk, corpus.shape[1])
        valid_c = valid.reshape(n // chunk, chunk)

        def body(carry, inp):
            run_d, run_i = carry
            ci, cv, cm = inp
            dots = jnp.einsum(
                "bd,cd->bc", q, cv, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            rr = jnp.sum(cv * cv, axis=-1)[None, :]
            d = _dist_from_dots(q, dots, rr, metric)
            d = jnp.where(cm[None, :], d, jnp.inf)
            vals, idx = jax.lax.top_k(-d, min(k, chunk))
            gidx = idx + ci * chunk
            md, pos = jax.lax.top_k(
                jnp.concatenate([-run_d, vals], axis=1), k
            )
            mi = jnp.take_along_axis(
                jnp.concatenate([run_i, gidx], axis=1), pos, axis=1
            )
            return (-md, mi), None

        init = (
            jnp.full((q.shape[0], k), jnp.inf, jnp.float32),
            jnp.full((q.shape[0], k), -1, jnp.int32),
        )
        (dist, ids), _ = jax.lax.scan(
            body,
            init,
            (jnp.arange(n // chunk, dtype=jnp.int32), corpus_c, valid_c),
        )
        return dist, ids

    @functools.partial(jax.jit, static_argnames=("metric",))
    def rescore(q, corpus, ids, *, metric):
        rows = corpus[jnp.maximum(ids, 0)]  # [B, k, D]
        dots = jnp.einsum(
            "bd,bmd->bm", q, rows, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        rr = jnp.sum(rows * rows, axis=-1)
        d = _dist_from_dots(q, dots, rr, metric)
        return jnp.where(ids >= 0, d, jnp.inf)

    return oracle, rescore



def _scan_chunk(n_pad):
    """Largest 1024-multiple divisor of the padded row count <= 64K: since
    r4 pad_rows() quantizes to pow2/16 steps, 65536 no longer always
    divides n_pad and the scan reshape would fail."""
    from velesdb_tpu.ops.streamed import _pick_chunk

    return _pick_chunk(n_pad, 65536) or min(n_pad, 65536)

def _host_basis_recall(search_fn, engine_arrays, qs, corpus_dev, valid_dev,
                       k, metric, n_pad):
    """(recall_host, recall_eps) vs the HIGHEST-precision true-f32 oracle.

    recall_host = identity overlap with the true top-k; recall_eps =
    fraction of served ids whose TRUE distance is within 0.1% of the true
    k-th (ann-benchmarks convention).
    """
    import jax.numpy as jnp

    oracle, rescore = _hp_oracle_fns()
    chunk = _scan_chunk(n_pad)
    hits_id = hits_eps = total = 0
    for i in range(qs.shape[0]):
        gt_d, gt_i = oracle(
            qs[i], corpus_dev, valid_dev, k=k, metric=metric, chunk=chunk
        )
        _, got = search_fn(qs[i], *engine_arrays)
        got_d = rescore(qs[i], corpus_dev, got, metric=metric)
        gt_i_h, gt_d_h = np.asarray(gt_i), np.asarray(gt_d)
        got_h, got_d_h = np.asarray(got), np.asarray(got_d)
        eq = (got_h[:, :, None] == gt_i_h[:, None, :]) & (
            gt_i_h[:, None, :] >= 0
        )
        hits_id += int(eq.any(axis=2).sum())
        kth = gt_d_h[:, -1]
        if metric.value == "euclidean":
            bound = kth * 1.001 + 1e-9
        else:  # 1-cos / -dot: additive slack scaled to the kth magnitude
            bound = kth + 1e-3 * np.abs(kth) + 1e-9
        hits_eps += int((got_d_h <= bound[:, None]).sum())
        total += got_h.shape[0] * k
    return hits_id / total, hits_eps / total


def _time_entry(search_fn, arrays, queries, batch):
    """Scan-batched device-side timing with the repo measurement protocol:
    UNIQUE inputs per timed sample + forced np.asarray readback. Every
    device operand rides in ``arrays`` as a jit ARGUMENT (closure capture
    embeds arrays in the remote compile payload — CLAUDE.md)."""
    import jax
    import jax.numpy as jnp

    # 64 scanned batches per timed dispatch: the (weather-dependent, up to
    # tens of ms) tunnel round trip amortizes to <10% of the sample. Every
    # scanned batch is UNIQUE (resized queries + per-row noise) so no
    # repeated-input shortcut can fire anywhere in the stack.
    iters = 64
    d = queries.shape[1]
    big = np.resize(queries, (iters * batch, d))
    big = big + np.random.default_rng(1).standard_normal(big.shape).astype(
        np.float32
    ) * 0.01
    qs = jnp.asarray(big.reshape(iters, batch, d))

    @jax.jit
    def run_many(qs, *ops):
        def body(_, q):
            v, i = search_fn(q, *ops)
            return None, (v[0, 0], i[0, 0])  # tiny carry-out defeats DCE

        _, outs = jax.lax.scan(body, None, qs)
        return outs

    jax.block_until_ready(run_many(qs, *arrays))  # compile+warm
    samples = []
    for s in range(4):
        qs_s = jax.block_until_ready(jnp.roll(qs, 1 + 7 * s, axis=0))
        t0 = time.perf_counter()
        outs = run_many(qs_s, *arrays)
        np.asarray(outs[0])  # force D2H completion
        samples.append(time.perf_counter() - t0)
    return iters * batch / float(np.min(samples))


def run_config(n, d, metric_name, batch, n_queries, k=10, device_corpus=False):
    import jax
    import jax.numpy as jnp

    from velesdb_tpu.index.brute import BruteForceIndex
    from velesdb_tpu.ops import DistanceMetric, StorageMode
    from velesdb_tpu.ops.bucket_kernel import (
        bucket_chunk_for,
        bucket_topk_entry,
    )
    from velesdb_tpu.ops.chunked import chunked_topk
    from velesdb_tpu.ops.pallas_kernels import use_pallas
    from velesdb_tpu.ops.streamed import streamed_topk

    metric = DistanceMetric.parse(metric_name)
    _note(f"run_config n={n} d={d} {metric_name} start")
    rng = np.random.default_rng(42)
    build_rate = None

    if device_corpus:
        # large corpora generate ON DEVICE (512MB of H2D through the remote
        # tunnel costs more than the whole benchmark)
        @jax.jit
        def gen(seed):
            k1, k2, k3, k4, k5 = jax.random.split(jax.random.key(seed), 5)
            centers = jax.random.normal(k1, (64, d), jnp.float32) * 2.0
            assign = jax.random.randint(k2, (n,), 0, 64)
            corpus = centers[assign] + jax.random.normal(k3, (n, d)) * 0.7
            # queries MUST share the corpus's centers: mismatched
            # distributions depress ANN (coverage-driven) recall while
            # leaving exact recall unaffected — a silent skew
            qassign = jax.random.randint(k4, (n_queries,), 0, 64)
            qs = centers[qassign] + jax.random.normal(k5, (n_queries, d)) * 0.7
            return corpus, qs

        from velesdb_tpu.index.brute import pad_rows

        n_pad = pad_rows(n)
        corpus_dev, queries_dev = gen(0)
        if metric is DistanceMetric.COSINE:
            sq = jnp.sum(corpus_dev * corpus_dev, axis=1, keepdims=True)
            corpus_dev = corpus_dev * jax.lax.rsqrt(jnp.maximum(sq, 1e-30))
        corpus_dev = jnp.pad(corpus_dev, ((0, n_pad - n), (0, 0)))
        sqn = jnp.sum(corpus_dev * corpus_dev, axis=1)
        base = sqn if metric is DistanceMetric.EUCLIDEAN else jnp.zeros_like(sqn)
        pen_dev = jnp.where(jnp.arange(n_pad) < n, base, jnp.inf)
        valid_dev = jnp.arange(n_pad) < n
        jax.block_until_ready(corpus_dev)
        queries = np.asarray(queries_dev)
    else:
        corpus = make_clustered(rng, n, d)
        queries = make_clustered(rng, n_queries, d)
        # "device refresh", NOT ingest (VERDICT r2 weak #4): this times the
        # padded H2D upload through the weather-prone tunnel. Real ingest
        # (host WAL via the native codec) is measured by bench_ingest().
        t0 = time.perf_counter()
        index = BruteForceIndex(d, metric, StorageMode.FULL)
        index.rebuild(corpus, np.ones(n, bool))
        jax.block_until_ready(index._full)
        build_rate = n / (time.perf_counter() - t0)
        corpus_dev = index._full
        pen_dev = index._bucket_pen
        sqn = index._full_sqnorm
        valid_dev = index._valid
        n_pad = index.n_pad

    interp = not use_pallas()
    chunk = min(bucket_chunk_for(batch, ((d + 127) // 128) * 128), n_pad)

    # the serve-path engine split (index/brute.py:_search_streaming):
    # scan+PartialReduce at high D, bucket-max Pallas kernel at low D.
    # Every device operand is a jit ARGUMENT (no closure capture).
    if d >= 512:
        from velesdb_tpu.ops.streamed import _streamed_entry

        def search_fn(q, corpus_a, valid_a, sqn_a):
            return _streamed_entry(
                q, corpus_a, valid_a, sqn_a, k=k, metric=metric,
                chunk=_scan_chunk(n_pad), approx=True, recall_target=0.95,
            )

        engine_arrays = (corpus_dev, valid_dev, sqn)
    else:
        # serve path at D < 512 since r3e: int8-assist (coarse int8 bucket
        # scan + in-program exact f32 gather-rerank at HIGHEST precision,
        # `ops/bucket_kernel.sq8i_rerank_topk`) — measured better than the
        # r3b split-bf16 kernel on BOTH axes (383K vs 279K QPS @200Kx128D
        # at host recall 0.9973 vs 0.9906, benchmarks/exp_sq8_assist.py).
        from velesdb_tpu.ops.bucket_kernel import (
            sq8_int8_rows, sq8i_rerank_topk,
        )
        from velesdb_tpu.ops.quantization import sq8_quantize

        from velesdb_tpu.index.brute import _deq_sqnorm

        d_pad128 = ((d + 127) // 128) * 128
        sq = sq8_quantize(jnp.pad(corpus_dev, ((0, 0), (0, d_pad128 - d))))
        rows8_dev = sq8_int8_rows(sq.codes)
        # fused jitted reduction — the eager dequantized [N, D] copy
        # doubled peak HBM during setup (ADVICE r3)
        deq_sq = _deq_sqnorm(sq.codes, sq.scale, sq.minv)
        if metric is DistanceMetric.EUCLIDEAN:
            scale_dev, minv_dev = sq.scale, sq.minv
            pen8_dev = jnp.where(valid_dev, deq_sq, jnp.inf)
        else:  # cosine: corpus pre-normalized, fold 1/|deq|
            inv = jnp.where(
                deq_sq > 1e-30, jax.lax.rsqrt(jnp.maximum(deq_sq, 1e-30)), 0.0
            )
            scale_dev, minv_dev = sq.scale * inv, sq.minv * inv
            pen8_dev = jnp.where(valid_dev, 0.0, jnp.inf)
        chunk_i8 = min(bucket_chunk_for(batch, d_pad128, 1), n_pad)

        def search_fn(q, rows8_a, scale_a, minv_a, pen8_a, corpus_a):
            return sq8i_rerank_topk(
                q, rows8_a, scale_a, minv_a, pen8_a, corpus_a, k=k, m=16,
                metric=metric, chunk=chunk_i8, interpret=interp,
            )

        engine_arrays = (rows8_dev, scale_dev, minv_dev, pen8_dev, corpus_dev)

    _note("corpus resident; measuring recall oracle")
    # recall vs the independent chunked-XLA exact oracle, all on device
    nb = min(8, n_queries // batch)
    qs = jnp.asarray(queries[: nb * batch].reshape(nb, batch, d))
    hits = 0
    for i in range(nb):
        _, gt = chunked_topk(
            qs[i], corpus_dev, valid_dev, k, metric,
            chunk=_scan_chunk(n_pad),
        )
        _, got = search_fn(qs[i], *engine_arrays)
        eq = (got[:, :, None] == gt[:, None, :]) & (gt[:, None, :] >= 0)
        hits += int(jnp.sum(jnp.any(eq, axis=1)))
    recall = hits / (nb * batch * k)

    # host-f32-basis recall, MEASURED (VERDICT r3 weak #2: the old bench
    # hardcoded "~0.997 host" as prose) — HIGHEST-precision true-f32
    # oracle, identity + eps(0.1%) variants
    recall_host, recall_eps = _host_basis_recall(
        search_fn, engine_arrays, qs, corpus_dev, valid_dev, k, metric, n_pad
    )

    _note(
        f"recall={recall:.4f} host={recall_host:.4f} eps={recall_eps:.4f}; timing"
    )
    qps = _time_entry(search_fn, engine_arrays, queries, batch)
    _note(f"qps={qps:,.0f}")
    out = {"qps": qps, "recall": recall, "recall_host": recall_host,
           "recall_eps": recall_eps, "build_rate": build_rate}

    if device_corpus and not os.environ.get("BENCH_SKIP_IVF"):
        # small-batch engine evidence (VERDICT r2 #1): IVF at the measured
        # 0.95-recall operating point (~3.5% coverage), batch=16
        import functools

        from velesdb_tpu.index.ivf import IvfIndex, ivf_search_impl

        _note("building IVF for the small-batch point")
        ivf = IvfIndex(d, metric)
        ivf.build(corpus_dev[:n], np.ones(n, bool))
        nprobe = ivf.nprobe_for(128)
        _ivf = functools.partial(
            jax.jit, static_argnames=("k", "nprobe", "metric")
        )(ivf_search_impl)

        def ivf_fn(q, *arrays):
            return _ivf(q, *arrays, None, k=k, nprobe=nprobe, metric=metric)

        arrays = (ivf._centroids, ivf._cent_sq, ivf._parts, ivf._part_rows,
                  ivf._part_sq)
        hits = 0
        for i in range(nb):
            _, gt = chunked_topk(
                qs[i], corpus_dev, valid_dev, k, metric, chunk=_scan_chunk(n_pad)
            )
            _, got = ivf_fn(qs[i], *arrays)
            eq = (got[:, :, None] == gt[:, None, :]) & (gt[:, None, :] >= 0)
            hits += int(jnp.sum(jnp.any(eq, axis=1)))
        iters, b16 = 32, 16
        big = np.resize(queries, (iters * b16, d)) + np.random.default_rng(
            3
        ).standard_normal((iters * b16, d)).astype(np.float32) * 0.01
        qs16 = jnp.asarray(big.reshape(iters, b16, d))

        @jax.jit
        def run_many(qs_, *ops):
            def body(_, q):
                v, i = ivf_fn(q, *ops)
                return None, (v[0, 0], i[0, 0])

            _, outs = jax.lax.scan(body, None, qs_)
            return outs

        jax.block_until_ready(run_many(qs16, *arrays))
        samples = []
        for s in range(3):
            qs_s = jax.block_until_ready(jnp.roll(qs16, 1 + 7 * s, axis=0))
            t0 = time.perf_counter()
            outs = run_many(qs_s, *arrays)
            np.asarray(outs[0])
            samples.append(time.perf_counter() - t0)
        out["ivf_recall"] = hits / (nb * batch * k)
        out["ivf_qps_b16"] = iters * b16 / float(np.min(samples))
        out["ivf_nprobe"] = nprobe
    return out


def bench_ingest(n=1_000_000, d=128):
    """REAL ingest rate: ``VectorStore.store_batch`` through the native WAL
    codec into a tmpdir (host-side, tunnel-immune). vec/s."""
    import shutil
    import tempfile

    from velesdb_tpu.storage.vector_store import VectorStore

    tmp = tempfile.mkdtemp(prefix="bench_ingest_")
    try:
        store = VectorStore(tmp, d, create=True)
        rng = np.random.default_rng(7)
        vecs = rng.standard_normal((n, d)).astype(np.float32)
        ids = np.arange(n, dtype=np.int64)
        t0 = time.perf_counter()
        step = 100_000
        for i in range(0, n, step):
            store.store_batch(ids[i : i + step], vecs[i : i + step])
        t_frame = time.perf_counter() - t0  # WAL framing + page-cache writes
        store.flush()  # msync + id-map checkpoint — the disk-weather part
        rate = n / (time.perf_counter() - t0)
        store.close()
        # (durable_rate, framing_rate): the durable number depends on the
        # box's disk (msync dominates — VERDICT r4 weak #8); the
        # fsync-excluded framing rate isolates the engine cost
        return rate, n / t_frame
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def bench_graph_build_1m(n=1_000_000, d=128):
    """WARM graph build rate at the SIFT-1M class config (the BASELINE
    north-star metric: index build >= 1M vectors/min). Cold pass warms
    the compiles; the timed pass is pure build throughput."""
    import jax
    import jax.numpy as jnp

    from velesdb_tpu.index.graph_index import GraphIndex
    from velesdb_tpu.index.params import GraphParams
    from velesdb_tpu.ops import DistanceMetric

    @jax.jit
    def gen(seed):
        k1, k2, k3 = jax.random.split(jax.random.key(seed), 3)
        centers = jax.random.normal(k1, (64, d), jnp.float32) * 2.0
        assign = jax.random.randint(k2, (n,), 0, 64)
        return centers[assign] + jax.random.normal(k3, (n, d)) * 0.7

    corpus_dev = jax.block_until_ready(gen(0))
    host_stub = np.zeros((n, d), np.float32)  # dev path: shape only
    valid = np.ones(n, bool)
    params = GraphParams.auto(d, n)
    gi = GraphIndex(d, DistanceMetric.EUCLIDEAN, params)
    gi.build(host_stub, valid, corpus_dev=corpus_dev)  # cold (compiles)
    gi2 = GraphIndex(d, DistanceMetric.EUCLIDEAN, params)
    t0 = time.perf_counter()
    gi2.build(host_stub, valid, corpus_dev=corpus_dev)
    return n / (time.perf_counter() - t0)


def bench_index_builds(n=100_000, d=768):
    """Warm graph + IVF build rates (vec/s) on device-resident clustered
    data at the headline config."""
    import jax
    import jax.numpy as jnp

    from velesdb_tpu.index.graph_index import GraphIndex
    from velesdb_tpu.index.ivf import IvfIndex
    from velesdb_tpu.index.params import GraphParams
    from velesdb_tpu.ops import DistanceMetric

    rng = np.random.default_rng(42)
    corpus = make_clustered(rng, n, d)
    corpus_dev = jax.device_put(jnp.asarray(corpus))
    jax.block_until_ready(corpus_dev)
    valid = np.ones(n, bool)

    ivf = IvfIndex(d, DistanceMetric.COSINE)
    ivf.build(corpus_dev, valid)  # warm the compile cache
    jax.block_until_ready(ivf._parts)
    t0 = time.perf_counter()
    ivf2 = IvfIndex(d, DistanceMetric.COSINE)
    ivf2.build(corpus_dev, valid)
    jax.block_until_ready(ivf2._parts)
    ivf_rate = n / (time.perf_counter() - t0)

    gi = GraphIndex(d, DistanceMetric.COSINE, GraphParams.auto(d, n))
    gi.build(corpus, valid, corpus_dev=corpus_dev)  # cold: compile warm-up
    gi2 = GraphIndex(d, DistanceMetric.COSINE, GraphParams.auto(d, n))
    t0 = time.perf_counter()
    gi2.build(corpus, valid, corpus_dev=corpus_dev)
    graph_rate = n / (time.perf_counter() - t0)
    return graph_rate, ivf_rate


class _Timeout(Exception):
    pass


def _with_deadline(seconds, fn, *args, **kw):
    """SIGALRM-bounded call: the shared TPU tunnel has multi-minute D2H
    wedge phases — the driver must still get its ONE JSON line."""
    import signal

    def _raise(signum, frame):
        raise _Timeout()

    old = signal.signal(signal.SIGALRM, _raise)
    signal.alarm(seconds)
    try:
        return fn(*args, **kw)
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


# ---------------------------------------------------------------------------
# Stage runners (run in a FRESH subprocess each — VERDICT r4 #1: a TPU
# backend ABORT kills the in-process JAX client; only process isolation
# lets the next stage/retry start clean). Each stage prints exactly ONE
# JSON line on stdout (progress goes to stderr) and exits 0 even on error
# (the error rides in the JSON's "error" field).
# ---------------------------------------------------------------------------

def _stage_headline():
    n = int(os.environ.get("BENCH_N", 100_000))
    d = int(os.environ.get("BENCH_D", 768))
    n_queries = int(os.environ.get("BENCH_QUERIES", 2048))
    batch = int(os.environ.get("BENCH_BATCH", 256))
    out = run_config(n, d, "cosine", batch, n_queries)
    out.update(n=n, d=d)
    return out


def _stage_sift():
    n_queries = int(os.environ.get("BENCH_QUERIES", 2048))
    batch = int(os.environ.get("BENCH_BATCH", 256))
    return run_config(
        1_000_000, 128, "euclidean", batch, n_queries, device_corpus=True
    )


def _stage_ingest():
    durable, framing = bench_ingest()
    return {"ingest_rate": durable, "ingest_rate_nofsync": framing}


def _stage_builds():
    graph_rate, ivf_rate = bench_index_builds()
    return {"graph_rate": graph_rate, "ivf_rate": ivf_rate}


def _stage_graph1m():
    return {"graph_build_1m_vec_s": bench_graph_build_1m()}


_STAGES = {
    "headline": _stage_headline,
    "sift": _stage_sift,
    "ingest": _stage_ingest,
    "builds": _stage_builds,
    "graph1m": _stage_graph1m,
}


def _run_stage_inproc(name: str) -> int:
    """Entry for ``bench.py --stage NAME``: run one stage, print one JSON
    line, ALWAYS exit 0 with JSON (errors ride inside the payload)."""
    budget = int(os.environ.get("BENCH_STAGE_TIMEOUT_S", 0))
    try:
        if budget > 0:
            out = _with_deadline(budget, _STAGES[name])
        else:
            out = _STAGES[name]()
    except _Timeout:
        out = {"error": "timeout", "error_type": "_Timeout"}
    except BaseException as e:  # noqa: BLE001 — backend ABORTs must not escape
        out = {"error": repr(e)[:500], "error_type": type(e).__name__}
    print(json.dumps(out), flush=True)
    return 0


def _spawn_stage(name: str, timeout_s: int, attempts: int = 1):
    """Run a stage in a fresh subprocess; return (dict|None, fail_reason).

    A fresh process per attempt means a dead JAX client, a segfault, or a
    wedged D2H can't poison later stages — the parent just times it out
    and moves on. The persistent JAX compile cache keeps retries cheap.
    """
    import subprocess

    last = "unknown"
    for attempt in range(attempts):
        if attempt:
            time.sleep(20)  # let a tunnel-weather phase move on
        _note(f"stage {name} attempt {attempt + 1}/{attempts} "
              f"(timeout {timeout_s}s)")
        env = dict(os.environ)
        env["BENCH_STAGE_TIMEOUT_S"] = str(max(timeout_s - 15, 30))
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--stage", name],
                stdout=subprocess.PIPE, stderr=None, timeout=timeout_s,
                env=env, text=True,
            )
        except subprocess.TimeoutExpired:
            last = "subprocess timeout"
            continue
        out = None
        for line in reversed((proc.stdout or "").strip().splitlines()):
            try:
                out = json.loads(line)
                break
            except (json.JSONDecodeError, ValueError):
                continue
        if out is None:
            last = f"no JSON (rc={proc.returncode})"
            continue
        if "error" in out:
            last = f"{out.get('error_type', '?')}: {out['error']}"
            _note(f"stage {name} errored: {last}")
            continue
        _note(f"stage {name} ok")
        return out, None
    return None, last


def main():
    n = int(os.environ.get("BENCH_N", 100_000))
    d = int(os.environ.get("BENCH_D", 768))
    budget = int(os.environ.get("BENCH_TIMEOUT_S", 420))
    skip_sift = bool(os.environ.get("BENCH_SKIP_SIFT"))

    failed = {}

    # wedge phases last minutes and PASS (measured r3: 10-40 min windows
    # between long clear stretches): retry the headline config across up
    # to three fresh-process windows before giving up
    head, why = _spawn_stage("headline", budget, attempts=3)
    if head is None:
        failed["headline"] = why

    ingest, why = _spawn_stage("ingest", 150)
    if ingest is None:
        failed["ingest"] = why
    builds, why = _spawn_stage("builds", 360)
    if builds is None:
        failed["builds"] = why
    graph1m = sift = None
    if not skip_sift:
        graph1m, why = _spawn_stage("graph1m", 660)
        if graph1m is None:
            failed["graph1m"] = why
        sift, why = _spawn_stage("sift", budget, attempts=2)
        if sift is None:
            failed["sift"] = why

    # ---- assemble the ONE JSON line (ALWAYS emitted — VERDICT r4 #1c) ----
    ingest_txt = (
        f"ingest {ingest['ingest_rate']:,.0f} vec/s (host WAL)"
        if ingest else "ingest n/a"
    )
    builds_txt = ""
    if builds:
        builds_txt = (
            f", graph build {builds['graph_rate']:,.0f} vec/s"
            f", ivf build {builds['ivf_rate']:,.0f} vec/s"
        )
    if graph1m:
        builds_txt += (
            f", graph build 1Mx128 "
            f"{graph1m['graph_build_1m_vec_s']:,.0f} vec/s warm"
        )
    sift_txt = ""
    if sift:
        sift_txt = (
            f"; SIFT-1M-class 1Mx128D L2 (int8-assist serve path: "
            f"coarse int8 scan + exact f32 rerank): "
            f"{sift['qps']:,.0f} QPS @ recall@10="
            f"{sift['recall']:.4f} device-basis / "
            f"{sift['recall_host']:.4f} host-f32 identity / "
            f"{sift['recall_eps']:.4f} eps-recall (all measured vs the "
            f"HIGHEST-precision true-f32 oracle)"
        )
        if "ivf_qps_b16" in sift:
            sift_txt += (
                f"; small-batch IVF nprobe={sift['ivf_nprobe']}: "
                f"{sift['ivf_qps_b16']:,.0f} QPS @ batch=16, "
                f"recall {sift['ivf_recall']:.4f}"
            )
    elif not skip_sift:
        sift_txt = f"; SIFT-1M config failed: {failed.get('sift', '?')}"

    if head:
        payload = {
            "metric": (
                f"search QPS/chip at recall@10={head['recall']:.4f} "
                f"device-basis / {head['recall_host']:.4f} host-f32 / "
                f"{head['recall_eps']:.4f} eps "
                f"({n}x{d}D cosine, k=10, serve-path engine; "
                f"{ingest_txt}, device refresh "
                f"{head['build_rate']:,.0f} vec/s{builds_txt}{sift_txt})"
            ),
            "value": round(head["qps"], 1),
            "unit": "qps",
            "vs_baseline": round(head["qps"] / REFERENCE_QPS, 2),
            # machine-readable recall fields (VERDICT r3 weak #2 / next #6)
            "recall": round(head["recall"], 4),
            "recall_host": round(head["recall_host"], 4),
            "recall_eps": round(head["recall_eps"], 4),
        }
    else:
        payload = {
            "metric": (
                f"bench headline failed ({failed.get('headline', '?')}); "
                f"partial stages: {ingest_txt}{builds_txt}{sift_txt}"
            ),
            "value": 0.0,
            "unit": "qps",
            "vs_baseline": 0.0,
        }
    if ingest:
        payload["ingest_vec_s"] = round(ingest["ingest_rate"])
        if "ingest_rate_nofsync" in ingest:
            # engine-only framing rate (msync excluded) — separates WAL
            # codec cost from the box's disk weather (VERDICT r4 weak #8)
            payload["ingest_vec_s_nofsync"] = round(
                ingest["ingest_rate_nofsync"]
            )
    if sift:
        payload["sift_qps"] = round(sift["qps"], 1)
        payload["sift_recall"] = round(sift["recall"], 4)
        payload["sift_recall_host"] = round(sift["recall_host"], 4)
        payload["sift_recall_eps"] = round(sift["recall_eps"], 4)
        if "ivf_qps_b16" in sift:
            payload["ivf_qps_b16"] = round(sift["ivf_qps_b16"], 1)
            payload["ivf_recall"] = round(sift["ivf_recall"], 4)
    if graph1m:
        payload["graph_build_1m_vec_s"] = round(
            graph1m["graph_build_1m_vec_s"]
        )
    if failed:
        payload["failed_stages"] = failed
    print(json.dumps(payload))


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--stage":
        sys.exit(_run_stage_inproc(sys.argv[2]))
    try:
        sys.exit(main())
    except BaseException as e:  # noqa: BLE001 — the driver NEEDS its JSON line
        if isinstance(e, SystemExit):
            raise
        print(json.dumps({
            "metric": f"bench orchestrator crashed: {type(e).__name__}: "
                      f"{str(e)[:300]}",
            "value": 0.0, "unit": "qps", "vs_baseline": 0.0,
        }))
        sys.exit(0)
