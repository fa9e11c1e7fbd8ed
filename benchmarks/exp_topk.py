"""Experiment harness: race top-k selection strategies on real TPU.

VERDICT.md round-1 #1: at 1M x 128D the fused Pallas kernel spends ~10ms of
its 12.6ms budget in the k-pass max-extraction merge (VPU-bound, k*B*N work).
This script races single-pass alternatives on the live chip:

  pallas      current fused kernel (baseline)
  scan_exact  XLA lax.scan over chunks + lax.top_k per chunk
  scan_approx XLA lax.scan over chunks + lax.approx_max_k (TPU PartialReduce)
  bucket      Pallas kernel emitting per-128-lane bucket max/argmax only
              (selection deferred to one host-program top_k over [B, N/128])
  floor       streaming matmul + running max only (k=1) = speed-of-light probe
  int8        int8 MXU matmul floor (SQ8 candidate path, 4x HBM saving)
  bf16        bf16 corpus via the XLA scan path (Mosaic bf16 was 12-20x slow;
              XLA's native bf16 MXU path may not be)

Measurement protocol (CLAUDE.md): unique query tensors per timed sample,
np.asarray readback inside the timed region, min of samples.

Usage: python benchmarks/exp_topk.py --variants scan_approx,bucket --n 1000000 --d 128
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/velesdb_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# --------------------------------------------------------------------------
# data: generated ON DEVICE (512MB H2D through the tunnel is not free)
# --------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("n", "d"))
def _gen_corpus(seed, *, n, d):
    k1, k2, k3 = jax.random.split(jax.random.key(seed), 3)
    centers = jax.random.normal(k1, (64, d), jnp.float32) * 2.0
    assign = jax.random.randint(k2, (n,), 0, 64)
    return centers[assign] + jax.random.normal(k3, (n, d), jnp.float32) * 0.7


# --------------------------------------------------------------------------
# variants: fn(qbatch [B, D], corpus [N, D], cnorm [N]) -> (vals, idx [B, k])
# all score by -d^2 rank order: s = 2*q.c - |c|^2 (|q|^2 constant per row)
# --------------------------------------------------------------------------


def make_scan(k, chunk, mode, dtype=None):  # mode: exact | approx | floor
    @functools.partial(jax.jit, static_argnames=())
    def fn(q, corpus, cnorm):
        n = corpus.shape[0]
        nc = n // chunk
        corpus_c = corpus.reshape(nc, chunk, corpus.shape[1])
        cn_c = cnorm.reshape(nc, chunk)
        qq = q if dtype is None else q.astype(dtype)

        def body(carry, inp):
            rv, ri = carry
            ci, vecs, cc = inp
            dots = jax.lax.dot_general(
                qq, vecs, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            s = 2.0 * dots - cc[None, :]
            if mode == "floor":
                v = jnp.max(s, axis=1, keepdims=True)
                i = jnp.argmax(s, axis=1)[:, None] + ci * chunk
            elif mode == "approx":
                v, i = jax.lax.approx_max_k(s, k)
                i = i + ci * chunk
            else:
                v, i = jax.lax.top_k(s, k)
                i = i + ci * chunk
            mv, pos = jax.lax.top_k(jnp.concatenate([rv, v], 1), rv.shape[1])
            mi = jnp.take_along_axis(jnp.concatenate([ri, i], 1), pos, 1)
            return (mv, mi), None

        kk = 1 if mode == "floor" else k
        init = (
            jnp.full((q.shape[0], kk), -jnp.inf, jnp.float32),
            jnp.full((q.shape[0], kk), -1, jnp.int32),
        )
        (v, i), _ = jax.lax.scan(
            body, init, (jnp.arange(nc, dtype=jnp.int32), corpus_c, cn_c)
        )
        return v, i

    return fn


def make_lean(k, chunk, dtype=None, pure_dots=False):
    """Minimal-epilogue scan: q pre-doubled outside, s = dots - cc (one VPU
    op; the validity mask rides in cc as +inf), straight into approx_max_k.
    pure_dots drops even the subtract (cosine with a pre-normalized corpus)."""

    @functools.partial(jax.jit, static_argnames=())
    def fn(q, corpus, cnorm):
        n = corpus.shape[0]
        nc = n // chunk
        corpus_c = corpus.reshape(nc, chunk, corpus.shape[1])
        cn_c = cnorm.reshape(nc, chunk)
        q2 = 2.0 * q
        if dtype is not None:
            q2 = q2.astype(dtype)

        def body(carry, inp):
            rv, ri = carry
            ci, vecs, cc = inp
            dots = jax.lax.dot_general(
                q2, vecs, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            s = dots if pure_dots else dots - cc[None, :]
            v, i = jax.lax.approx_max_k(s, k, recall_target=0.95)
            i = i + ci * chunk
            mv, pos = jax.lax.top_k(jnp.concatenate([rv, v], 1), k)
            mi = jnp.take_along_axis(jnp.concatenate([ri, i], 1), pos, 1)
            return (mv, mi), None

        init = (
            jnp.full((q.shape[0], k), -jnp.inf, jnp.float32),
            jnp.full((q.shape[0], k), -1, jnp.int32),
        )
        (v, i), _ = jax.lax.scan(
            body, init, (jnp.arange(nc, dtype=jnp.int32), corpus_c, cn_c)
        )
        return v, i

    return fn


def make_int8(k, chunk):
    """int8 MXU floor: corpus pre-quantized symmetric (global scale)."""

    @jax.jit
    def quantize(corpus):
        scale = jnp.max(jnp.abs(corpus)) / 127.0
        return jnp.round(corpus / scale).astype(jnp.int8), scale

    @functools.partial(jax.jit, static_argnames=())
    def fn(q, corpus_i8, cnorm, scale):
        n = corpus_i8.shape[0]
        nc = n // chunk
        corpus_c = corpus_i8.reshape(nc, chunk, corpus_i8.shape[1])
        cn_c = cnorm.reshape(nc, chunk)
        qscale = jnp.max(jnp.abs(q)) / 127.0
        q8 = jnp.round(q / qscale).astype(jnp.int8)

        def body(carry, inp):
            rv, ri = carry
            ci, vecs, cc = inp
            dots = jax.lax.dot_general(
                q8, vecs, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            s = 2.0 * (qscale * scale) * dots.astype(jnp.float32) - cc[None, :]
            v, i = jax.lax.approx_max_k(s, k)
            i = i + ci * chunk
            mv, pos = jax.lax.top_k(jnp.concatenate([rv, v], 1), k)
            mi = jnp.take_along_axis(jnp.concatenate([ri, i], 1), pos, 1)
            return (mv, mi), None

        init = (
            jnp.full((q.shape[0], k), -jnp.inf, jnp.float32),
            jnp.full((q.shape[0], k), -1, jnp.int32),
        )
        (v, i), _ = jax.lax.scan(
            body, init, (jnp.arange(nc, dtype=jnp.int32), corpus_c, cn_c)
        )
        return v, i

    return fn, quantize


# ---- bucket Pallas kernel -------------------------------------------------


def _bucket_kernel(q_ref, corpus_ref, cnorm_ref, gm_ref, gi_ref, *, chunk, nl):
    # 128 buckets per chunk; bucket j = lanes {i*128 + j for i in range(w)}.
    # Bucket max/argmax run as a STATIC python loop of lane-aligned [B, 128]
    # slices — pure elementwise VPU ops, no reshape, no lane<->sublane
    # relayout, scores never leave VMEM.
    del nl
    w = chunk // 128
    c = pl.program_id(0)
    rows = corpus_ref[:]
    q = q_ref[:].astype(rows.dtype)  # bf16 corpus => true bf16x bf16 MXU pass
    dots = jax.lax.dot_general(
        q, rows, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    cc = cnorm_ref[0, :][None, :]
    s = 2.0 * dots - cc  # [B, C]
    gm = s[:, 0:128]
    for i in range(1, w):
        gm = jnp.maximum(gm, s[:, i * 128 : (i + 1) * 128])
    off = jnp.full_like(gm, w, jnp.int32)
    for i in range(w - 1, -1, -1):
        off = jnp.where(s[:, i * 128 : (i + 1) * 128] == gm, i, off)
    b = s.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (b, 128), 1)
    gm_ref[:] = gm
    gi_ref[:] = c * chunk + off * 128 + lane


def make_bucket(k, chunk, final="exact", nl=128):

    @functools.partial(jax.jit, static_argnames=())
    def fn(q, corpus, cnorm):
        b, d = q.shape
        n = corpus.shape[0]
        grid = (n // chunk,)
        nbuckets = (n // chunk) * 128
        kernel = functools.partial(_bucket_kernel, chunk=chunk, nl=nl)
        cn8 = jnp.broadcast_to(cnorm[None, :], (8, n))
        gm, gi = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((b, d), lambda c: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((chunk, d), lambda c: (c, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((8, chunk), lambda c: (0, c), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((b, 128), lambda c: (0, c), memory_space=pltpu.VMEM),
                pl.BlockSpec((b, 128), lambda c: (0, c), memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((b, nbuckets), jnp.float32),
                jax.ShapeDtypeStruct((b, nbuckets), jnp.int32),
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * b * n * d,
                bytes_accessed=n * d * 4 + b * d * 4,
                transcendentals=0,
            ),
        )(q, corpus, cn8)
        if final == "approx":
            v, pos = jax.lax.approx_max_k(gm, k, recall_target=0.99)
        else:
            v, pos = jax.lax.top_k(gm, k)
        return v, jnp.take_along_axis(gi, pos, axis=1)

    return fn


def make_pallas(k, metric_name="euclidean"):
    from velesdb_tpu.ops import DistanceMetric
    from velesdb_tpu.ops.pallas_kernels import _fused_topk_entry, fit_chunk

    metric = DistanceMetric.parse(metric_name)

    def fn_factory(b, d, n):
        chunk = fit_chunk(b, d, 10, n=n)

        def fn(q, corpus, cnorm):
            return _fused_topk_entry(
                q, corpus, jnp.ones(n, jnp.float32), cnorm,
                k=k, metric=metric, chunk=chunk, interpret=False,
            )

        return jax.jit(fn)

    return fn_factory


# --------------------------------------------------------------------------


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--b", type=int, default=256)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--chunk", type=int, default=65536)
    ap.add_argument("--pchunk", type=int, default=2048)  # pallas bucket chunk
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--samples", type=int, default=3)
    ap.add_argument("--variants", type=str, default="scan_approx,bucket")
    ap.add_argument("--skip-recall", action="store_true")
    args = ap.parse_args()
    n, d, b, k = args.n, args.d, args.b, args.k

    print(f"backend={jax.devices()[0].platform} n={n} d={d} b={b} k={k}")
    # pad to a multiple of every chunk size in play; padded rows get
    # cnorm=+inf so their score 2*dots - cnorm is -inf in every variant
    unit = int(np.lcm(args.chunk, args.pchunk))
    n_pad = ((n + unit - 1) // unit) * unit
    corpus = _gen_corpus(0, n=n, d=d)
    cnorm = jnp.sum(corpus * corpus, axis=1)
    if n_pad != n:
        corpus = jnp.pad(corpus, ((0, n_pad - n), (0, 0)))
        cnorm = jnp.pad(cnorm, (0, n_pad - n), constant_values=jnp.inf)
    jax.block_until_ready(corpus)
    print(f"corpus generated on device (n_pad={n_pad})")

    # ground truth for recall: exact scan over a 256-query probe set
    probe = _gen_corpus(99, n=256, d=d)
    gt_fn = make_scan(k, args.chunk, "exact")
    gt_idx = None
    if not args.skip_recall:
        _, gt_idx = gt_fn(probe, corpus, cnorm)
        gt_idx = np.asarray(gt_idx)
        print("ground truth done")

    variants = {}
    for name in args.variants.split(","):
        if name == "scan_exact":
            variants[name] = make_scan(k, args.chunk, "exact")
        elif name == "scan_approx":
            variants[name] = make_scan(k, args.chunk, "approx")
        elif name == "floor":
            variants[name] = make_scan(k, args.chunk, "floor")
        elif name == "bf16":
            variants[name] = make_scan(k, args.chunk, "bf16")
        elif name == "bucket":
            variants[name] = make_bucket(k, args.pchunk, "exact")
        elif name == "bucket_approx":
            variants[name] = make_bucket(k, args.pchunk, "approx")
        elif name == "bucket_bf16":
            variants[name] = make_bucket(k, args.pchunk, "approx")
        elif name == "bf16_approx":
            variants[name] = make_scan(k, args.chunk, "approx", jnp.bfloat16)
        elif name == "bf16_floor":
            variants[name] = make_scan(k, args.chunk, "floor", jnp.bfloat16)
        elif name == "lean":
            variants[name] = make_lean(k, args.chunk)
        elif name == "lean_bf16":
            variants[name] = make_lean(k, args.chunk, jnp.bfloat16)
        elif name == "lean_dots":
            variants[name] = make_lean(k, args.chunk, pure_dots=True)
        elif name == "lean_dots_bf16":
            variants[name] = make_lean(k, args.chunk, jnp.bfloat16, pure_dots=True)
        elif name == "sq8_streamed":
            from velesdb_tpu.ops import DistanceMetric
            from velesdb_tpu.ops.quantization import sq8_quantize
            from velesdb_tpu.ops.streamed import _sq8_streamed_entry

            sq = sq8_quantize(corpus)
            jax.block_until_ready(sq.codes)
            ones = jnp.ones(corpus.shape[0], bool)

            def _sq8_fn(q, c, cn, _sq=sq, _ones=ones):
                # cn is |c|^2 with +inf on padding -> scores -inf there
                return _sq8_streamed_entry(
                    q, _sq.codes, _sq.scale, _sq.minv, cn, _ones,
                    k=k, metric=DistanceMetric.EUCLIDEAN,
                    chunk=args.chunk, approx=True,
                )

            variants[name] = _sq8_fn
        elif name == "pallas":
            variants[name] = make_pallas(k)(b, d, n)
        elif name == "int8":
            fn, quant = make_int8(k, args.chunk)
            c8, scale = quant(corpus)
            jax.block_until_ready(c8)
            variants[name] = lambda q, c, cn, _fn=fn, _c8=c8, _s=scale: _fn(
                q, _c8, cn, _s
            )
        else:
            raise SystemExit(f"unknown variant {name}")

    results = {}
    for name, fn in variants.items():
        corp = corpus.astype(jnp.bfloat16) if "bf16" in name else corpus
        # recall
        rec = float("nan")
        if gt_idx is not None:
            try:
                _, pidx = fn(probe, corp, cnorm)
                pidx = np.asarray(pidx)
                rec = float(
                    np.mean(
                        [
                            len(set(pidx[i]) & set(gt_idx[i])) / k
                            for i in range(pidx.shape[0])
                        ]
                    )
                )
            except Exception as e:
                print(f"{name}: FAILED {type(e).__name__}: {e}")
                results[name] = {"error": str(e)[:200]}
                continue

        # timing: scan the fn over `iters` unique query batches in ONE program
        @jax.jit
        def run_many(qs, corp, cn):
            def body(_, q):
                v, i = fn(q, corp, cn)
                return None, (v[0, 0], i[0, 0])

            _, outs = jax.lax.scan(body, None, qs)
            return outs

        try:
            samples = []
            for s in range(args.samples):
                qs = _gen_corpus(1000 + s, n=args.iters * b, d=d).reshape(
                    args.iters, b, d
                )
                jax.block_until_ready(qs)
                t0 = time.perf_counter()
                outs = run_many(qs, corp, cnorm)
                np.asarray(outs[0])
                dt = time.perf_counter() - t0
                samples.append(dt)
            best = min(samples) / args.iters
            qps = b / best
            results[name] = {
                "ms_per_batch": round(best * 1e3, 3),
                "qps": round(qps),
                "recall": round(rec, 4),
                "samples_ms": [round(s / args.iters * 1e3, 2) for s in samples],
            }
            print(f"{name}: {results[name]}")
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}")
            results[name] = {"error": str(e)[:200]}

    print(json.dumps({"n": n, "d": d, "b": b, "k": k, "results": results}))


if __name__ == "__main__":
    main()
