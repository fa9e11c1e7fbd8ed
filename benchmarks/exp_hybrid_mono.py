"""Hybrid dispatch-count A/B (r5): where do the ~152ms/batch go, and what
does collapsing H2D round trips + program count buy?

The r5 stage profile (exp_hybrid_profile.py) showed the hybrid floor is NOT
host work (mask 0.02ms, BM25 prep 0.34ms) — it is per-stage dispatch+transfer
walls (vector 88ms, bm25 86ms, fuse+readback 33ms alone vs 152ms full). This
experiment decomposes that wall into tunnel ROUND TRIPS and measures the two
candidate fixes on-chip:

    A  baseline     public `hybrid_search_batch` (3 programs, per-array H2D)
    B  put1         ONE `jax.device_put` tuple for every host input, then the
                    same 3 programs + one device_get
    C  mono         ONE jitted program (streamed scan + BM25 scatter-add +
                    RRF composed; corpus/blocks as jit ARGS, never captured)
                    + the same single device_put staging
    D  resident3    inputs pre-staged (excluded from timing), 3 programs
    E  resident1    inputs pre-staged, mono program (the 1-dispatch floor)

Unique inputs per rep everywhere (the block_until_ready early-return trap);
final [B,k] readback forced in every variant. Correctness: C's fused ids are
compared against A's host-visible ids (overlap@k) before timing.

Run: python benchmarks/exp_hybrid_mono.py  (HYBRID_CPU=1 for off-chip smoke)
Knobs: HYBRID_N/D/B (default 100K x 768 x 256).
"""

import functools
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/velesdb_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from benchmarks.exp_hybrid import VOCAB

REPS = 12


def timed(fn, reps=REPS):
    samples = []
    for r in range(reps):
        t0 = time.perf_counter()
        fn(r)
        samples.append((time.perf_counter() - t0) * 1e3)
    return [float(np.min(samples)), float(np.median(samples))]


def main():
    import tempfile

    import jax

    if os.environ.get("HYBRID_CPU"):
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from velesdb_tpu.database import Database
    from velesdb_tpu.ops.fused_rrf import rrf_fuse_topk
    from velesdb_tpu.ops.streamed import streamed_topk
    from velesdb_tpu.text.bm25 import _bm25_score

    n = int(os.environ.get("HYBRID_N", 100_000))
    d = int(os.environ.get("HYBRID_D", 768))
    b = int(os.environ.get("HYBRID_B", 256))
    k = 10
    fetch = 2 * k
    rng = np.random.default_rng(42)
    centers = rng.standard_normal((64, d)).astype(np.float32) * 2.0
    assign = rng.integers(0, 64, n)
    corpus = centers[assign] + 0.7 * rng.standard_normal((n, d)).astype(
        np.float32
    )
    words = np.array(VOCAB)
    topic = words[(assign % len(VOCAB))]
    payloads = []
    for i in range(n):
        extra = " ".join(words[rng.integers(0, len(words), 2)])
        payloads.append(
            {"text": f"{topic[i]} {topic[i]} {extra}",
             "price": float(rng.uniform(1, 100))}
        )

    db = Database(tempfile.mkdtemp(prefix="hybrid_mono_"))
    col = db.create_collection("h", dim=d, metric="cosine")
    step = 50_000
    for s in range(0, n, step):
        col.upsert_bulk(range(s, min(s + step, n)),
                        corpus[s : s + step], payloads[s : s + step])
    col._ensure_text()
    col.refresh_device()

    qa = rng.integers(0, 64, b)
    qvecs = centers[qa] + 0.7 * rng.standard_normal((b, d)).astype(np.float32)
    qtexts = [str(words[a % len(words)]) for a in qa]
    filt = {"type": "lt", "field": "price", "value": 50.0}

    out = {"n": n, "d": d, "b": b, "fetch": fetch,
           "platform": jax.devices()[0].platform}

    # ---- shared host prep (identical to _hybrid_fused_batch) --------------
    raw_mask = np.asarray(col._raw_filter_mask(filt), bool)
    used = max(col.vectors.used_slots, 1)
    n_pad_v = col._brute.n_pad or used
    mask_v = np.pad(raw_mask, (0, n_pad_v - raw_mask.shape[0]))
    ti = col.text_index
    ti.refresh(used)
    n_pad_t = ti.n_pad
    mask_t = (
        np.pad(raw_mask, (0, n_pad_t - raw_mask.shape[0]))
        if raw_mask.shape[0] < n_pad_t else raw_mask[:n_pad_t]
    )

    def bm25_prep(texts):
        # identical to Bm25Index.search_batch_dev's host half
        from collections import Counter

        from velesdb_tpu.text.tokenizer import tokenize

        sentinel = ti._block_docs.shape[0] - 1
        rows, weights = [], []
        for qy in texts:
            blocks, wts = [], []
            for term, qtf in Counter(tokenize(qy)).items():
                tid = ti._vocab.get(term)
                if tid is None:
                    continue
                start, count = ti._term_blocks[tid]
                blocks.extend(range(start, start + count))
                wts.extend([float(qtf)] * count)
            rows.append(blocks)
            weights.append(wts)
        max_l = max(len(r) for r in rows)
        l_pad = 1 << (max_l - 1).bit_length()
        bid = np.full((b, l_pad), sentinel, np.int32)
        wt = np.zeros((b, l_pad), np.float32)
        for i, (r, w) in enumerate(zip(rows, weights)):
            bid[i, : len(r)] = r
            wt[i, : len(w)] = w
        return bid, wt

    bid0, wt0 = bm25_prep(qtexts)
    brute = col._brute
    valid_m = np.asarray(brute._valid, bool) & mask_v
    metric = brute.metric

    # device-resident constants (corpus side — these live on device already)
    corpus_dev = brute._full
    cnorm_dev = brute._full_sqnorm
    bd_dev, bs_dev = ti._block_docs, ti._block_scores
    valid_dev = jax.device_put(jnp.asarray(valid_m))
    mask_t_dev = jax.device_put(jnp.asarray(mask_t))

    # ---- the mono program ---------------------------------------------------
    @functools.partial(
        jax.jit, static_argnames=("k", "fetch", "metric_s", "n_pad")
    )
    def hybrid_mono(q, valid, cnorm, corpus_a, bd, bs, bid, wt, m_t, w_vec,
                    *, k, fetch, metric_s, n_pad):
        v_vals, v_idx = streamed_topk(
            q, corpus_a, valid=valid, k=fetch, metric=metric_s,
            corpus_sqnorm=cnorm,
        )
        t_vals, t_idx = _bm25_score(
            bid, wt, bd, bs, m_t, n_pad=n_pad, k=fetch
        )
        return rrf_fuse_topk(
            v_vals, v_idx, t_vals, t_idx, w_vec, None, None, k=k
        )

    # ---- correctness gate ---------------------------------------------------
    ref = col.hybrid_search_batch(qvecs, qtexts, k, filter=filt)
    fv, fi = hybrid_mono(
        jnp.asarray(qvecs), valid_dev, cnorm_dev, corpus_dev, bd_dev, bs_dev,
        jnp.asarray(bid0), jnp.asarray(wt0), mask_t_dev, jnp.float32(0.5),
        k=k, fetch=fetch, metric_s=metric, n_pad=n_pad_t,
    )
    fvh, fih = jax.device_get((fv, fi))
    slot_ids, _ = col.vectors.occupancy()
    overlaps = []
    for i in range(b):
        mono_ids = {int(slot_ids[s]) for s in fih[i] if s >= 0}
        ref_ids = {r.id for r in ref[i]}
        denom = max(len(ref_ids), 1)
        overlaps.append(len(mono_ids & ref_ids) / denom)
    out["mono_overlap_vs_public"] = float(np.mean(overlaps))

    # ---- A: public path (ships the mono program when eligible) --------------
    def run_a(r):
        col.hybrid_search_batch(
            qvecs + np.float32(1e-4 * (r + 1)), qtexts, k, filter=filt
        )

    out["A_public_ms"] = timed(run_a)

    # ---- A0: public path FORCED onto the 3-program form (pre-r5 baseline) ---
    mono_fn = col._hybrid_mono_dispatch
    col._hybrid_mono_dispatch = lambda *a, **kw: None
    col.hybrid_search_batch(qvecs, qtexts, k, filter=filt)  # warm compiles
    out["A0_public_3prog_ms"] = timed(run_a)
    col._hybrid_mono_dispatch = mono_fn

    # ---- B: one device_put, 3 programs --------------------------------------
    def run_b(r):
        q_dev, bid_dev, wt_dev = jax.device_put(
            (qvecs + np.float32(1e-4 * (r + 1)), bid0, wt0)
        )
        v_vals, v_idx = brute.search(q_dev, fetch, mask=mask_v)
        t_vals, t_idx = _bm25_score(
            bid_dev, wt_dev, bd_dev, bs_dev, mask_t_dev,
            n_pad=n_pad_t, k=fetch,
        )
        fvx, fix = rrf_fuse_topk(
            v_vals, v_idx, t_vals, t_idx, jnp.float32(0.5), None, None, k=k
        )
        jax.device_get((fvx, fix))

    out["B_put1_3prog_ms"] = timed(run_b)

    # ---- C: one device_put, mono program -------------------------------------
    def run_c(r):
        q_dev, bid_dev, wt_dev = jax.device_put(
            (qvecs + np.float32(1e-4 * (r + 1)), bid0, wt0)
        )
        fvx, fix = hybrid_mono(
            q_dev, valid_dev, cnorm_dev, corpus_dev, bd_dev, bs_dev,
            bid_dev, wt_dev, mask_t_dev, jnp.float32(0.5),
            k=k, fetch=fetch, metric_s=metric, n_pad=n_pad_t,
        )
        jax.device_get((fvx, fix))

    out["C_put1_mono_ms"] = timed(run_c)

    # ---- D/E: resident inputs (pre-staged, unique per rep) -------------------
    staged = []
    for r in range(REPS):
        staged.append(
            jax.device_put((qvecs + np.float32(1e-4 * (r + 1)), bid0, wt0))
        )
    jax.block_until_ready(staged)

    def run_d(r):
        q_dev, bid_dev, wt_dev = staged[r]
        v_vals, v_idx = brute.search(q_dev, fetch, mask=mask_v)
        t_vals, t_idx = _bm25_score(
            bid_dev, wt_dev, bd_dev, bs_dev, mask_t_dev,
            n_pad=n_pad_t, k=fetch,
        )
        fvx, fix = rrf_fuse_topk(
            v_vals, v_idx, t_vals, t_idx, jnp.float32(0.5), None, None, k=k
        )
        jax.device_get((fvx, fix))

    out["D_resident_3prog_ms"] = timed(run_d)

    def run_e(r):
        q_dev, bid_dev, wt_dev = staged[r]
        fvx, fix = hybrid_mono(
            q_dev, valid_dev, cnorm_dev, corpus_dev, bd_dev, bs_dev,
            bid_dev, wt_dev, mask_t_dev, jnp.float32(0.5),
            k=k, fetch=fetch, metric_s=metric, n_pad=n_pad_t,
        )
        jax.device_get((fvx, fix))

    out["E_resident_mono_ms"] = timed(run_e)

    # H2D alone: per-array vs one tuple (the round-trip hypothesis)
    def put_each(r):
        x = jax.device_put(qvecs + np.float32(1e-4 * (r + 1)))
        y = jax.device_put(bid0 + np.int32(r))
        z = jax.device_put(wt0 + np.float32(r))
        jax.block_until_ready((x, y, z))

    def put_tuple(r):
        t = jax.device_put(
            (qvecs + np.float32(1e-4 * (r + 1)), bid0 + np.int32(r),
             wt0 + np.float32(r))
        )
        jax.block_until_ready(t)

    out["h2d_each_ms"] = timed(put_each)
    out["h2d_tuple_ms"] = timed(put_tuple)

    for key in ("A_public_ms", "A0_public_3prog_ms", "B_put1_3prog_ms",
                "C_put1_mono_ms", "D_resident_3prog_ms",
                "E_resident_mono_ms"):
        out[key.replace("_ms", "_qps")] = round(b / (out[key][0] / 1e3))
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
