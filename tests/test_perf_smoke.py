"""CI perf-regression smoke gate (reference: ``benches/smoke_test.rs`` +
``benchmarks/baseline.json`` ±15% CI gate, ``bench-regression.yml``).

Wall-clock on a shared CI box is weather; the PRIMARY gates here are
DETERMINISTIC invariants that catch the regression classes we've actually
shipped and fixed:

- compile-count invariants — the r4 "recompile per kmeans seed" class: a
  rebuild or a steady-state search at unchanged shapes must trigger ZERO
  fresh XLA compilations;
- readback-count invariants — the r3c "two sequential np.asarray = two
  tunnel RTTs" class: a public search call pays at most ONE device_get;
- a generous (2x) wall bound vs ``tests/perf_baseline.json`` as a
  last-resort catch-all for order-of-magnitude host-path regressions.

The compile counter itself is validated by a meta-test (a planted
two-shape jit MUST count 2) so the gate can never silently go dead.
"""

import json
import logging
import time
from contextlib import contextmanager
from pathlib import Path

import jax
import numpy as np
import pytest

from velesdb_tpu.database import Database
from velesdb_tpu.index.ivf import IvfIndex
from velesdb_tpu.ops import DistanceMetric

BASELINE = json.loads(
    (Path(__file__).parent / "perf_baseline.json").read_text()
)
WALL_SLACK = 2.0  # generous: CI boxes vary, order-of-magnitude catches only


@pytest.fixture
def db(tmp_db_dir):
    return Database.open(tmp_db_dir)


@contextmanager
def compile_log():
    """Capture XLA compilation events (one record per fresh jit compile)."""
    logger = logging.getLogger("jax._src.interpreters.pxla")
    recs: list[str] = []

    class _H(logging.Handler):
        def emit(self, r):
            m = r.getMessage()
            if m.startswith("Compiling "):
                recs.append(m)

    h = _H()
    h.setLevel(logging.WARNING)
    jax.config.update("jax_log_compiles", True)
    logger.addHandler(h)
    try:
        yield recs
    finally:
        logger.removeHandler(h)
        jax.config.update("jax_log_compiles", False)


def _clustered(rng, n, d, c=16):
    centers = rng.standard_normal((c, d)).astype(np.float32) * 3
    a = rng.integers(0, c, n)
    return centers[a] + 0.5 * rng.standard_normal((n, d)).astype(np.float32)


def test_compile_counter_detects_planted_regression():
    """Meta-test: the counter must see a two-shape jit as 2 compiles —
    otherwise every other gate in this file is vacuously green."""

    @jax.jit
    def f(x):
        return x * 2 + 1

    with compile_log() as recs:
        f(np.ones(9, np.float32)).block_until_ready()
        f(np.ones(9, np.float32) * 3).block_until_ready()  # cache hit
        f(np.ones(17, np.float32)).block_until_ready()  # fresh shape
    assert len(recs) == 2, recs


def test_ivf_rebuild_same_shape_zero_recompiles(rng):
    """The r4 regression class: a second IVF build at identical
    (n, d, n_clusters) but different data/kmeans outcome must reuse every
    compiled program (shape-deterministic partition padding)."""
    n, d, c = 4000, 32, 16
    idx1 = IvfIndex(d, DistanceMetric.EUCLIDEAN, n_clusters=c)
    idx1.build(_clustered(rng, n, d))  # warm-up: compiles here are fine
    idx2 = IvfIndex(d, DistanceMetric.EUCLIDEAN, n_clusters=c)
    with compile_log() as recs:
        idx2.build(_clustered(rng, n, d))
    assert recs == [], f"IVF rebuild recompiled {len(recs)}: {recs[:4]}"


def test_search_steady_state_zero_recompiles(db, rng):
    """Steady-state serving: unique query VALUES at a warmed shape class
    must never trace or compile."""
    coll = db.create_collection("steady", 64)
    coll.upsert_bulk(
        range(3000), _clustered(rng, 3000, 64), [{"g": i % 5} for i in range(3000)]
    )
    qs = rng.standard_normal((16, 64)).astype(np.float32)
    coll.search_batch(qs, 10)  # warm-up compile
    coll.search_batch(rng.standard_normal((16, 64)).astype(np.float32), 10)
    with compile_log() as recs:
        for _ in range(5):
            q = rng.standard_normal((16, 64)).astype(np.float32)
            coll.search_batch(q, 10)
    assert recs == [], f"steady-state search recompiled: {recs[:4]}"


def test_filtered_search_steady_state_zero_recompiles(db, rng):
    """Mask pushdown must not change the compiled program per filter VALUE
    (masks are arguments, not constants)."""
    coll = db.create_collection("filt", 32)
    coll.upsert_bulk(
        range(2000), _clustered(rng, 2000, 32), [{"g": i % 7} for i in range(2000)]
    )
    f = {"condition": {"type": "eq", "field": "g", "value": 3}}
    coll.search_batch(rng.standard_normal((16, 32)).astype(np.float32), 10, filter=f)
    with compile_log() as recs:
        for g in (1, 4, 2, 6):
            fg = {"condition": {"type": "eq", "field": "g", "value": g}}
            q = rng.standard_normal((16, 32)).astype(np.float32)
            coll.search_batch(q, 10, filter=fg)
    assert recs == [], f"filter-value change recompiled: {recs[:4]}"


def test_search_single_readback_per_call(db, rng, monkeypatch):
    """The r3c lesson baked into a gate: one public search call performs at
    most ONE device_get readback (two sequential np.asarray calls each pay
    their own tunnel RTT on the real chip)."""
    coll = db.create_collection("rb", 32)
    coll.upsert_bulk(range(2000), _clustered(rng, 2000, 32))
    coll.search_batch(rng.standard_normal((8, 32)).astype(np.float32), 10)

    calls = {"n": 0}
    real = jax.device_get

    def counting(x):
        calls["n"] += 1
        return real(x)

    monkeypatch.setattr(jax, "device_get", counting)
    coll.search_batch(rng.standard_normal((8, 32)).astype(np.float32), 10)
    assert calls["n"] <= 1, f"search paid {calls['n']} device_get readbacks"


def test_hybrid_mono_single_program_per_call(db, rng, monkeypatch):
    """r5 mono hybrid gate: one public hybrid call performs exactly ONE
    jitted-program dispatch class worth of work host-side — at most one
    device_get readback AND one device_put staging batch (the 3-program
    form paid a per-array H2D + per-program dispatch wall; see
    docs/BENCHMARKS.md hybrid stage decomposition)."""
    coll = db.create_collection("hmono", 32)
    coll.upsert_bulk(
        range(2000), _clustered(rng, 2000, 32),
        [{"text": "alpha" if i % 2 else "beta", "p": i % 9}
         for i in range(2000)],
    )
    qs = rng.standard_normal((8, 32)).astype(np.float32)
    coll.hybrid_search_batch(qs, ["alpha"] * 8, 5)  # warm compiles

    calls = {"get": 0, "put": 0}
    real_get, real_put = jax.device_get, jax.device_put

    def counting_get(x):
        calls["get"] += 1
        return real_get(x)

    def counting_put(x, *a, **kw):
        calls["put"] += 1
        return real_put(x, *a, **kw)

    monkeypatch.setattr(jax, "device_get", counting_get)
    monkeypatch.setattr(jax, "device_put", counting_put)
    coll.hybrid_search_batch(
        rng.standard_normal((8, 32)).astype(np.float32), ["beta"] * 8, 5
    )
    assert calls["get"] <= 1, f"hybrid paid {calls['get']} readbacks"
    assert calls["put"] <= 1, f"hybrid paid {calls['put']} device_put batches"


def _timed(fn, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def test_wall_bounds_vs_baseline(db, rng):
    """Generous 2x wall gate vs the checked-in baseline (order-of-magnitude
    host-path regressions only — deterministic gates above do the real
    work). Baselines were measured on the round-5 box (CPU backend,
    8 virtual devices: 2.6ms search / 32ms build) and padded several-fold
    for slower CI hardware."""
    coll = db.create_collection("wall", 64)
    coll.upsert_bulk(range(3000), _clustered(rng, 3000, 64))
    coll.search_batch(rng.standard_normal((16, 64)).astype(np.float32), 10)

    def one_batch():
        coll.search_batch(rng.standard_normal((16, 64)).astype(np.float32), 10)

    wall = _timed(one_batch)
    limit = BASELINE["search_batch16_3000x64_s"] * WALL_SLACK
    assert wall < limit, f"search wall {wall:.3f}s > {limit:.3f}s"

    idx = IvfIndex(64, DistanceMetric.EUCLIDEAN, n_clusters=16)
    idx.build(_clustered(rng, 4000, 64))  # warm compiles

    def build():
        i2 = IvfIndex(64, DistanceMetric.EUCLIDEAN, n_clusters=16)
        i2.build(_clustered(rng, 4000, 64))

    wall = _timed(build, reps=2)
    limit = BASELINE["ivf_build_4000x64_s"] * WALL_SLACK
    assert wall < limit, f"warm IVF build wall {wall:.3f}s > {limit:.3f}s"


def test_hybrid_mono_assist_single_program_per_call(db, rng, monkeypatch):
    """The D<512 assist-core mono hybrid (r5 final) keeps the same RTT
    invariant as the streamed-core one: at most ONE readback and ONE staged
    device_put per public call. Shadows build with the Pallas flags on;
    the pd kernel flag then flips off so the CPU mesh serves the XLA twin
    (identical dispatch ladder, same staging/readback structure)."""
    import velesdb_tpu.index.brute as brute_mod
    import velesdb_tpu.ops.bucket_kernel as bk
    import velesdb_tpu.ops.hybrid_mono as hm

    monkeypatch.setattr(brute_mod, "use_pallas", lambda: True)
    monkeypatch.setattr(brute_mod, "BUCKET_MIN_ROWS", 1024)
    fake_chunk = lambda b, d, itemsize=4, n=0: 256
    monkeypatch.setattr(bk, "bucket_chunk_for", fake_chunk)
    monkeypatch.setattr(brute_mod, "bucket_chunk_for", fake_chunk)

    coll = db.create_collection("hmassist", 32)
    coll.upsert_bulk(
        range(4096), _clustered(rng, 4096, 32),
        [{"text": "alpha" if i % 2 else "beta", "p": i % 9}
         for i in range(4096)],
    )
    coll.refresh_device()
    assert coll._brute._assist_pd is not None

    engaged = []
    orig = hm.hybrid_mono_topk

    def spy(*a, **kw):
        engaged.append(kw.get("vector_core"))
        return orig(*a, **kw)

    monkeypatch.setattr(hm, "hybrid_mono_topk", spy)

    saved = brute_mod._SQ8PD_OK[0]
    brute_mod._SQ8PD_OK[0] = False  # CPU mesh: serve the XLA twin
    try:
        qs = rng.standard_normal((8, 32)).astype(np.float32)
        coll.hybrid_search_batch(qs, ["alpha"] * 8, 5)  # warm compiles
        assert engaged and engaged[-1] == "assist-pd-xla"

        calls = {"get": 0, "put": 0}
        real_get, real_put = jax.device_get, jax.device_put

        def counting_get(x):
            calls["get"] += 1
            return real_get(x)

        def counting_put(x, *a, **kw):
            calls["put"] += 1
            return real_put(x, *a, **kw)

        monkeypatch.setattr(jax, "device_get", counting_get)
        monkeypatch.setattr(jax, "device_put", counting_put)
        coll.hybrid_search_batch(
            rng.standard_normal((8, 32)).astype(np.float32), ["beta"] * 8, 5
        )
        assert calls["get"] <= 1, f"assist hybrid paid {calls['get']} readbacks"
        assert calls["put"] <= 1, f"assist hybrid paid {calls['put']} puts"
    finally:
        brute_mod._SQ8PD_OK[0] = saved
