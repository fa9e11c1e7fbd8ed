"""Brute-force (exact) device index over a padded slot array.

Replaces the reference's ``search_brute_force`` / ``search_brute_force_gpu``
(``index/hnsw/index/search.rs:189-229``): the corpus lives as a padded
``[N_pad, D]`` device array in HBM, one MXU matmul scores a whole query batch
against every vector, and masked ``lax.top_k`` selects results. Exact search on
TPU is fast enough that it is also the recall ground truth for the ANN suite.

Storage modes (``quantization.rs`` ``StorageMode``):

- ``full``  — f32 (or bf16) slots
- ``sq8``   — uint8 codes + per-vector affine; scores via one matmul +
  rank-1 correction (no dequantized copy is materialized)
- ``binary``— packed uint32 sign bits; Hamming via XOR+popcount
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from velesdb_tpu.ops import (
    DistanceMetric,
    StorageMode,
    binary_quantize,
    pairwise_hamming_packed,
    pairwise_scores,
    sq8_dot_scores,
    sq8_quantize,
    normalize,
    top_k,
)
from velesdb_tpu.ops.bucket_kernel import (
    BUCKET_MIN_ROWS,
    bucket_chunk_for,
    bucket_topk_entry,
    hamming_bucket_topk,
)
from velesdb_tpu.ops.demotions import record_demotion
from velesdb_tpu.ops.pallas_kernels import hamming_topk, use_pallas
from velesdb_tpu.ops.quantization import SQ8Vectors
from velesdb_tpu.ops.streamed import sq8_streamed_topk, streamed_topk

__all__ = ["BruteForceIndex", "pad_rows"]

# Sticky off-switches, scoped PER LOWERING SURFACE: a Mosaic failure in one
# kernel family must not disable the others, and must never disable the
# pure-XLA streamed fallback (which is not Pallas at all).
_PALLAS_OK = [True]  # f32/bf16 bucket kernel
_HL_OK = [True]  # split-bf16 (true-f32 fidelity) bucket kernel
_SQ8_BUCKET_OK = [True]  # SQ8 bucket kernel (int32-staged unpack)
_SQ8I_OK = [True]  # SQ8 int8-direct kernel (int8 MXU dots, no unpack)
_SQ8I_XLA_OK = [True]  # pure-XLA assist twin (int8 dot_general + rerank)
_SQ8PD_OK = [True]  # per-dim enc-select assist kernel (r5 serve default)
_SQ8PD_XLA_OK = [True]  # pure-XLA per-dim assist twin
_BINARY_OK = [True]  # Hamming kernels
_HAM_MXU_OK = [True]  # bit-plane MXU Hamming kernel


def _ham_mxu_max_bytes() -> int:
    """HBM budget for the unpacked 0/1 bit shadow (1B/bit = 8x packed).
    Past it binary serves packed-only — the capacity-mode planner rule
    (VERDICT r4 weak #4). Default 4 GiB on a 16GB v5e."""
    import os

    return int(
        os.environ.get("VELESDB_HAMMING_MXU_MAX_BYTES", 4 << 30)
    )

# int8-direct serves every dim (safety knob, lower to re-enable the staged
# kernel above a cutoff). Measured v5e scan protocol: +59% QPS at 1Mx128D
# (267.8K vs 168.6K) and +24% at 100Kx768D (403.6K vs 325.9K); the 0.01
# coarse-recall gap at 768D (query-quant noise) washes out after the
# default auto-rerank (post-rerank A/B at 150Kx768D: int8 0.964 vs staged
# 0.961 — both sit at the SQ8-noise ceiling of this data).
_SQ8I_MAX_DIM = [1 << 30]


@jax.jit
def _deq_sqnorm(codes, scale, minv):
    """Squared norms of the dequantized rows WITHOUT materializing the
    ``[N, D]`` f32 dequantized copy (eager mode would double peak HBM at
    build time; under jit the cast/affine fuse into the reduction)."""
    deq = codes.astype(jnp.float32) * scale[:, None] + minv[:, None]
    return jnp.sum(deq * deq, axis=1)


def _bucket_safe(n_pad: int, chunk: int, k: int) -> bool:
    """Collision-recall guard shared by every bucket-kernel dispatch: one
    winner per 128-lane bucket loses ~(k-1)/(2*nbuckets) of the true top-k;
    keep that expected loss under ~1%."""
    return n_pad >= BUCKET_MIN_ROWS and (k - 1) <= 0.02 * (n_pad // chunk) * 128


def _pad_to(mask, n_pad: int):
    m = jnp.asarray(mask)
    if m.shape[0] < n_pad:
        m = jnp.pad(m, (0, n_pad - m.shape[0]))
    return m[:n_pad]


def pad_rows(n: int, minimum: int = 1024) -> int:
    """Round row count up to a padded bucket so device array shapes — and
    therefore XLA compilations — stay bounded.

    Up to 64K rows: next power of two (one shape per decade; absolute waste
    is small). Above: power-of-two/16 steps — 16 shape buckets per decade
    still bound compiles while capping pad rows at ~6% of the corpus where
    pure power-of-two padding scanned up to 2x the real rows. Measured
    same-run gains are modest (+5% streamed 100Kx768, +2% assist 200Kx128,
    benchmarks/exp_pad_ab.py — the scans carry large row-count-independent
    per-chunk overheads, see exp_scan_floor.py), but pad HBM/dequant/build
    waste drops 19-37% at off-power-of-two sizes for free. Steps stay
    multiples of 8192 so every kernel chunk (<=8192 power-of-two
    bucket-kernel chunks, divisor-picked streamed chunks) divides the
    padded count exactly — no in-program re-pad copies of the corpus.
    """
    target = max(n, minimum)
    pow2 = 1 << (target - 1).bit_length()
    if pow2 <= 65536:
        return pow2
    step = pow2 // 16  # >= 8192
    return ((target + step - 1) // step) * step


class BruteForceIndex:
    """Exact search over a device-resident padded corpus."""

    def __init__(self, dim: int, metric: DistanceMetric, storage_mode: StorageMode):
        self.dim = dim
        self.metric = DistanceMetric.parse(metric)
        self.storage_mode = StorageMode.parse(storage_mode)
        self.n_pad = 0
        self._valid = None  # [N_pad] bool device
        self._full = None  # [N_pad, D] device (full/bf16 modes)
        self._sq8: SQ8Vectors | None = None
        self._packed = None  # [N_pad, W] uint32 (binary mode)
        self._ham_bits = None  # [N_pad, D_pad] int8 0/1 (MXU Hamming shadow)
        self._ham_aux = None  # [N_pad] int32 |c| + knockout (MXU Hamming)
        self._sq_norm = None  # [N_pad] f32 squared norms (euclidean w/ sq8)
        self._full_sqnorm = None  # [N_pad] f32 norms for the fused kernel
        self._bucket_pen = None  # [N_pad] f32 additive penalty (bucket kernel)
        self._sq8_words = None  # [N_pad, D/4] int32 block-packed codes
        self._sq8_rows8 = None  # [N_pad, D_pad] int8 rows (int8-direct kernel)
        self._full_hl = None  # (hi, lo) bf16 pair (split-bf16 bucket kernel)
        self._assist = None  # (rows8, scale, minv, pen) int8-assist shadow
        self._assist_pd = None  # (rows_pd, pen_int, pen_f32, sdim, mid, qu)
        self._pd_ptile = {}  # chunk -> encoded ptile (corpus-static)
        self._sq8_scale = None  # [N_pad] f32 (cosine: scale/|c| folded)
        self._sq8_minv = None  # [N_pad] f32 (cosine: minv/|c| folded)
        self._sq8_pen = None  # [N_pad] f32 additive penalty

    # -- build -------------------------------------------------------------

    def rebuild(self, slots: np.ndarray, valid: np.ndarray) -> None:
        """Upload the host slot array (``[used, D]``) as padded device state."""
        used = slots.shape[0]
        self.n_pad = pad_rows(used)
        pad = self.n_pad - used
        slots = np.pad(slots, ((0, pad), (0, 0)))
        valid = np.pad(valid, (0, pad))
        self._valid = jax.device_put(jnp.asarray(valid))
        mode = self.storage_mode
        if mode in (StorageMode.FULL, StorageMode.F16, StorageMode.BF16):
            dtype = {
                StorageMode.FULL: jnp.float32,
                StorageMode.F16: jnp.float16,
                StorageMode.BF16: jnp.bfloat16,
            }[mode]
            slots_f32 = jnp.asarray(slots, jnp.float32)
            if self.metric is DistanceMetric.COSINE:
                # cosine scoring is normalization-invariant, so the scored
                # copy is stored PRE-NORMALIZED: search-time scores become
                # raw MXU dots with a zero-op validity mask (penalty vector)
                sq = jnp.sum(slots_f32 * slots_f32, axis=1, keepdims=True)
                slots_f32 = slots_f32 * jnp.where(
                    sq > 1e-30, jax.lax.rsqrt(jnp.maximum(sq, 1e-30)), 0.0
                )
            self._full = jax.device_put(slots_f32.astype(dtype))
            # corpus-static squared norms (post-normalization for cosine)
            self._full_sqnorm = jax.device_put(
                jnp.sum(slots_f32 * slots_f32, axis=1)
            )
            # additive penalty for the bucket kernel: +inf knocks out
            # tombstoned/padded rows inside the matmul epilogue subtract
            base = (
                self._full_sqnorm
                if self.metric is DistanceMetric.EUCLIDEAN
                else jnp.zeros(self.n_pad, jnp.float32)
            )
            self._bucket_pen = jax.device_put(
                jnp.where(self._valid, base, jnp.inf)
            )
            # Serve shadow for the bucket regime (FULL, D < 512). Since
            # r3e the default is the int8-ASSIST shadow: a coarse int8
            # bucket scan (1/4 the f32 HBM bytes, int8 MXU dots) picks
            # top-m, then the SAME program gathers the m winners from the
            # resident f32 corpus and rescores exactly
            # (``sq8i_rerank_topk``). Measured on v5e (64-batch protocol,
            # benchmarks/exp_sq8_assist.py): 383K QPS @200Kx128D at host-
            # oracle recall 0.9973 vs the split-bf16 kernel's 279K @
            # 0.9906 — better on BOTH axes, at 1/4 the shadow bytes
            # (+1B/dim vs hl's +4B/dim). r3b's "94K QPS gather cap" that
            # originally measured this path out was a partition-slice
            # artifact: per-ROW gathers pipeline at the ~9GB/s
            # transaction wall (exp_gather_kernel.py), so the [B, m, D]
            # candidate gather costs ~0.06ms/256-batch, not 1.8ms.
            # The split-bf16 (hi, lo) copy is built only when the int8
            # kernel family is unavailable (reference analog for both:
            # ``dual_precision.rs`` int8 traversal + f32 rerank).
            self._full_hl = None
            self._assist = None
            self._assist_pd = None
            self._pd_ptile = {}
            if (
                mode is StorageMode.FULL
                and use_pallas()
                and self.dim < 512
                and self.n_pad >= BUCKET_MIN_ROWS
            ):
                # r5 serve default: per-DIM quantized enc-select shadow
                # (sq8pd_rerank_topk — the whole affine epilogue folds
                # into the int dot; 301K vs 240K QPS at 1Mx128 b=256 at
                # matched 0.997 host recall, benchmarks/exp_sq8i_v2.py).
                # The builder refuses (returns None) on corpora whose
                # penalty exceeds the int32 encoding budget — the per-row
                # family below then serves exactly as before.
                if _SQ8PD_OK[0] or _SQ8PD_XLA_OK[0]:
                    from velesdb_tpu.ops.bucket_kernel import sq8pd_build

                    pd = sq8pd_build(
                        slots_f32, self._valid, self.dim, self.metric
                    )
                    if pd is not None:
                        self._assist_pd = tuple(
                            jax.device_put(a) if i < 5 else a
                            for i, a in enumerate(pd)
                        )
                if self._assist_pd is None and _SQ8I_OK[0] and self.dim < _SQ8I_MAX_DIM[0]:
                    from velesdb_tpu.ops.bucket_kernel import sq8_int8_rows

                    sq = sq8_quantize(slots_f32)
                    rows8 = jax.device_put(sq8_int8_rows(sq.codes))
                    deq_sq = _deq_sqnorm(sq.codes, sq.scale, sq.minv)
                    if self.metric is DistanceMetric.COSINE:
                        # slots_f32 is pre-normalized, so |deq| ~ 1; the
                        # fold keeps the coarse scores exactly cosine
                        inv = jnp.where(
                            deq_sq > 1e-30,
                            jax.lax.rsqrt(jnp.maximum(deq_sq, 1e-30)),
                            0.0,
                        )
                        scale2, minv2 = sq.scale * inv, sq.minv * inv
                        pen_base = jnp.zeros(self.n_pad, jnp.float32)
                    elif self.metric is DistanceMetric.EUCLIDEAN:
                        scale2, minv2 = sq.scale, sq.minv
                        pen_base = deq_sq
                    else:
                        scale2, minv2 = sq.scale, sq.minv
                        pen_base = jnp.zeros(self.n_pad, jnp.float32)
                    self._assist = (
                        rows8,
                        jax.device_put(scale2.astype(jnp.float32)),
                        jax.device_put(minv2.astype(jnp.float32)),
                        jax.device_put(
                            jnp.where(self._valid, pen_base, jnp.inf)
                        ),
                    )
                elif self._assist_pd is None and _HL_OK[0]:
                    from velesdb_tpu.ops.bucket_kernel import split_f32_rows

                    d_pad = ((self.dim + 127) // 128) * 128
                    padded = jnp.pad(
                        slots_f32, ((0, 0), (0, d_pad - self.dim))
                    )
                    hi, lo = split_f32_rows(padded)
                    self._full_hl = (jax.device_put(hi), jax.device_put(lo))
                    del padded
        elif mode is StorageMode.SQ8:
            sq = sq8_quantize(jnp.asarray(slots))
            self._sq8 = jax.device_put(sq)
            deq_sq = _deq_sqnorm(sq.codes, sq.scale, sq.minv)
            if self.metric is DistanceMetric.EUCLIDEAN:
                self._sq_norm = jax.device_put(deq_sq)
            elif self.metric is DistanceMetric.COSINE:
                self._sq_norm = jax.device_put(jnp.sqrt(deq_sq))
            # bucket-kernel state: block-packed int32 words + per-metric
            # affine (cosine's 1/|c| FOLDS into scale/minv -> raw dots are
            # already cosine scores, zero extra kernel ops)
            from velesdb_tpu.ops.bucket_kernel import (
                sq8_int8_rows, sq8_pack_blocked,
            )

            # ONE device representation for the bucket path: signed int8
            # rows when the int8-direct kernel is live (int8 MXU dots, no
            # unpack VPU work), packed int32 words otherwise. The streamed
            # fallback reads ``self._sq8`` codes either way. int8-direct
            # wins at every measured dim (see ``_SQ8I_MAX_DIM`` for the
            # scan-protocol numbers); the knob exists as a safety valve.
            if _SQ8I_OK[0] and use_pallas() and self.dim < _SQ8I_MAX_DIM[0]:
                self._sq8_rows8 = jax.device_put(sq8_int8_rows(sq.codes))
                self._sq8_words = None
            else:
                self._sq8_rows8 = None
                self._sq8_words = jax.device_put(sq8_pack_blocked(sq.codes))
            if self.metric is DistanceMetric.COSINE:
                inv = jnp.where(
                    deq_sq > 1e-30,
                    jax.lax.rsqrt(jnp.maximum(deq_sq, 1e-30)),
                    0.0,
                )
                scale2, minv2 = sq.scale * inv, sq.minv * inv
                pen_base = jnp.zeros(self.n_pad, jnp.float32)
            elif self.metric is DistanceMetric.EUCLIDEAN:
                scale2, minv2 = sq.scale, sq.minv
                pen_base = deq_sq
            else:
                scale2, minv2 = sq.scale, sq.minv
                pen_base = jnp.zeros(self.n_pad, jnp.float32)
            self._sq8_scale = jax.device_put(scale2.astype(jnp.float32))
            self._sq8_minv = jax.device_put(minv2.astype(jnp.float32))
            self._sq8_pen = jax.device_put(
                jnp.where(self._valid, pen_base, jnp.inf)
            )
        elif mode is StorageMode.BINARY:
            self._packed = jax.device_put(binary_quantize(jnp.asarray(slots)))
            # Bit-plane MXU shadow: unpacked int8 0/1 rows turn the packed
            # VPU xor+popcount loop into one int8 MXU matmul (measured 5.4x,
            # 54K -> 293K QPS at 1.2Mx100D, benchmarks/exp_hamming_mxu.py).
            # It costs 8x the packed bytes (1B/bit — SQ8-sized), so binary's
            # CAPACITY advantage only survives past the shadow budget:
            # above it the packed kernel serves alone (the planner rule —
            # binary-packed is a capacity mode, not a speed mode).
            self._ham_bits = None
            self._ham_aux = None
            d_pad = ((self.dim + 127) // 128) * 128
            if (
                use_pallas()
                and self.n_pad * d_pad <= _ham_mxu_max_bytes()
            ):
                from velesdb_tpu.ops.bucket_kernel import (
                    _HAM_BIG,
                    hamming_bits_rows,
                )

                bits = hamming_bits_rows(jnp.asarray(slots), self.dim)
                csum = jnp.sum(bits.astype(jnp.int32), axis=1)
                self._ham_bits = jax.device_put(bits)
                self._ham_aux = jax.device_put(
                    jnp.where(self._valid, csum, csum + _HAM_BIG).astype(
                        jnp.int32
                    )
                )
        else:
            raise ValueError(f"unsupported storage mode {mode}")

    def serve_engine(self, k: int = 10) -> str:
        """Name of the kernel a ``search(..., k)`` would dispatch to right
        now (observability — surfaced via ``Collection.info()``). Mirrors
        the dispatch order in :meth:`search`/:meth:`_search_streaming`
        INCLUDING the per-call guards (``m >= k`` for the assist path,
        ``_bucket_safe`` collision bounds, the Hamming bucket-vs-topk
        split) so a large-``k`` search never reports a kernel it would not
        actually run (ADVICE r3)."""
        mode = self.storage_mode
        if not use_pallas():
            return "fused-xla"
        b_pad8 = 8  # guard shapes are batch-insensitive beyond padding
        d_pad = ((self.dim + 127) // 128) * 128
        if mode in (StorageMode.FULL, StorageMode.F16, StorageMode.BF16):
            if self.dim >= 512:
                return "streamed-scan"
            if self._assist_pd is not None:
                m = min(max(2 * k - 4, 16), 256)
                chunk_i8 = min(bucket_chunk_for(b_pad8, d_pad, 1, self.n_pad), self.n_pad)
                if m >= k and _bucket_safe(self.n_pad, chunk_i8, m):
                    if _SQ8PD_OK[0]:
                        return "int8-assist-pd"
                    if _SQ8PD_XLA_OK[0]:
                        return "int8-assist-pd-xla"
            if self._assist is not None:
                m = min(max(2 * k - 4, 16), 256)
                chunk_i8 = min(bucket_chunk_for(b_pad8, d_pad, 1, self.n_pad), self.n_pad)
                if m >= k and _bucket_safe(self.n_pad, chunk_i8, m):
                    if _SQ8I_OK[0]:
                        return "int8-assist"
                    if _SQ8I_XLA_OK[0]:
                        return "int8-assist-xla"
            if _HL_OK[0] and self._full_hl is not None:
                chunk_hl = min(bucket_chunk_for(b_pad8, d_pad, 8, self.n_pad), self.n_pad)
                if _bucket_safe(self.n_pad, chunk_hl, k):
                    return "split-bf16"
            itemsize = 4 if self._full is None else self._full.dtype.itemsize
            chunk = min(bucket_chunk_for(b_pad8, d_pad, itemsize, self.n_pad), self.n_pad)
            if _PALLAS_OK[0] and _bucket_safe(self.n_pad, chunk, k):
                return "bucket-f32"
            return "streamed-scan"
        if mode is StorageMode.SQ8:
            if (
                _SQ8I_OK[0]
                and self._sq8_rows8 is not None
                and _bucket_safe(
                    self.n_pad,
                    min(bucket_chunk_for(b_pad8, d_pad, 1, self.n_pad), self.n_pad),
                    k,
                )
            ):
                return "sq8-int8"
            if (
                _SQ8_BUCKET_OK[0]
                and self._sq8_words is not None
                and _bucket_safe(
                    self.n_pad,
                    min(bucket_chunk_for(b_pad8, d_pad, 5, self.n_pad), self.n_pad),
                    k,
                )
            ):
                return "sq8-bucket"
            return "sq8-streamed"
        if mode is StorageMode.BINARY:
            if (
                _HAM_MXU_OK[0]
                and self._ham_bits is not None
                and _bucket_safe(
                    self.n_pad,
                    min(
                        bucket_chunk_for(
                            b_pad8, self._ham_bits.shape[1], 1, self.n_pad
                        ),
                        self.n_pad,
                    ),
                    min(k, self.n_pad),
                )
            ):
                return "hamming-mxu"
            if _BINARY_OK[0]:
                return (
                    "hamming-bucket"
                    if _bucket_safe(self.n_pad, 2048, min(k, self.n_pad))
                    else "hamming-topk"
                )
            return "fused-xla"
        return "fused-xla"

    # -- search ------------------------------------------------------------

    def scores(self, queries: jax.Array) -> jax.Array:
        """``[B, N_pad]`` scores in the metric's native direction."""
        mode = self.storage_mode
        metric = self.metric
        if mode in (StorageMode.FULL, StorageMode.F16, StorageMode.BF16):
            corpus = self._full
            if mode is not StorageMode.FULL:
                corpus = corpus.astype(jnp.float32)
            return pairwise_scores(queries, corpus, metric)
        if mode is StorageMode.SQ8:
            return _sq8_metric_scores(queries, self._sq8, self._sq_norm, metric)
        if mode is StorageMode.BINARY:
            packed_q = binary_quantize(queries)
            d = pairwise_hamming_packed(packed_q, self._packed).astype(jnp.float32)
            if metric.higher_is_better:
                # similarity metrics ride on Hamming similarity in binary mode
                return 1.0 - d / float(self.dim)
            return d
        raise ValueError(f"unsupported storage mode {mode}")

    def search(self, queries, k: int, mask=None):
        """Masked exact top-k. Returns ``(values [B,k], slot_indices [B,k])``.

        One fused jit dispatch per call (scores + mask + top-k) — multiple
        dispatches pay a full host<->device round trip each, which dominates
        latency on remote-attached TPUs. On real TPU hardware the
        full-precision path uses the streaming Pallas kernel (running top-k
        in VMEM, ``[B, N]`` scores never materialized); everything else (and
        any Mosaic failure) falls back to the fused XLA program.
        """
        queries = jnp.atleast_2d(jnp.asarray(queries, jnp.float32))
        k_eff = min(k, self.n_pad)
        mode = self.storage_mode
        if (
            use_pallas()
            and mode in (StorageMode.FULL, StorageMode.F16, StorageMode.BF16)
            and self.metric
            in (
                DistanceMetric.COSINE,
                DistanceMetric.DOT_PRODUCT,
                DistanceMetric.EUCLIDEAN,
            )
        ):
            return self._search_streaming(queries, k_eff, mask)
        if (
            use_pallas()
            and mode is StorageMode.SQ8
            and self.metric
            in (
                DistanceMetric.COSINE,
                DistanceMetric.DOT_PRODUCT,
                DistanceMetric.EUCLIDEAN,
            )
        ):
            # SQ8 at 1/4 the HBM bytes. Kernel ladder: int8-direct bucket
            # kernel (int8 MXU dots, zero unpack) -> int32-staged bucket
            # kernel -> streamed XLA scan fallback
            b_pad8 = ((queries.shape[0] + 7) // 8) * 8
            d_pad128 = ((self.dim + 127) // 128) * 128
            if (
                _SQ8I_OK[0]
                and self._sq8_rows8 is not None
                and _bucket_safe(
                    self.n_pad,
                    min(bucket_chunk_for(b_pad8, d_pad128, 1, self.n_pad), self.n_pad),
                    k_eff,
                )
            ):
                try:
                    from velesdb_tpu.ops.bucket_kernel import sq8i_bucket_topk

                    pen = self._sq8_pen
                    if mask is not None:
                        pen = jnp.where(
                            _pad_to(mask, self.n_pad), pen, jnp.inf
                        )
                    return sq8i_bucket_topk(
                        queries, self._sq8_rows8, self._sq8_scale,
                        self._sq8_minv, pen, k=k_eff, metric=self.metric,
                        chunk=min(
                            bucket_chunk_for(b_pad8, d_pad128, 1, self.n_pad), self.n_pad
                        ),
                        interpret=False,
                    )
                except Exception as e:
                    _SQ8I_OK[0] = False
                    record_demotion("sq8-int8", e)
            chunk = min(
                bucket_chunk_for(
                    b_pad8,
                    d_pad128,
                    5,  # packed words (1B/dim) + in-VMEM unpacked f32 copy
                    self.n_pad,
                ),
                self.n_pad,
            )
            if (
                _SQ8_BUCKET_OK[0]
                and self._sq8_words is not None
                and _bucket_safe(self.n_pad, chunk, k_eff)
            ):
                try:
                    from velesdb_tpu.ops.bucket_kernel import sq8_bucket_topk

                    pen = self._sq8_pen
                    if mask is not None:
                        pen = jnp.where(
                            _pad_to(mask, self.n_pad), pen, jnp.inf
                        )
                    return sq8_bucket_topk(
                        queries, self._sq8_words, self._sq8_scale,
                        self._sq8_minv, pen, k=k_eff, metric=self.metric,
                        chunk=chunk, interpret=False,
                    )
                except Exception as e:
                    _SQ8_BUCKET_OK[0] = False
                    record_demotion("sq8-bucket", e)
            valid = self._valid
            if mask is not None:
                valid = jnp.logical_and(valid, _pad_to(mask, self.n_pad))
            cn = self._sq_norm
            if cn is None:
                cn = jnp.zeros(self.n_pad, jnp.float32)
            return sq8_streamed_topk(
                queries, self._sq8, cnorm=cn, valid=valid, k=k_eff,
                metric=self.metric,
            )
        if mode is StorageMode.BINARY and use_pallas():
            # bit-plane MXU kernel first (5.4x the packed VPU loop when the
            # 1B/bit shadow fits); packed popcount is the capacity fallback
            if (
                _HAM_MXU_OK[0]
                and self._ham_bits is not None
                and _bucket_safe(
                    self.n_pad,
                    min(
                        bucket_chunk_for(
                            ((queries.shape[0] + 7) // 8) * 8,
                            self._ham_bits.shape[1],
                            1,
                            self.n_pad,
                        ),
                        self.n_pad,
                    ),
                    k_eff,
                )
            ):
                try:
                    from velesdb_tpu.ops.bucket_kernel import (
                        _HAM_BIG,
                        hamming_mxu_topk,
                    )

                    aux = self._ham_aux
                    if mask is not None:
                        aux = jnp.where(
                            _pad_to(mask, self.n_pad), aux, aux + _HAM_BIG
                        )
                    qbits = (queries >= 0.0).astype(jnp.int8)
                    d_pad = self._ham_bits.shape[1]
                    if d_pad > qbits.shape[1]:
                        qbits = jnp.pad(
                            qbits, ((0, 0), (0, d_pad - qbits.shape[1]))
                        )
                    chunk = min(
                        bucket_chunk_for(
                            ((queries.shape[0] + 7) // 8) * 8, d_pad, 1,
                            self.n_pad,
                        ),
                        self.n_pad,
                    )
                    dist, idx = hamming_mxu_topk(
                        qbits, self._ham_bits, aux, k=k_eff, chunk=chunk
                    )
                    if self.metric.higher_is_better:
                        vals = jnp.where(
                            idx < 0, -jnp.inf, 1.0 - dist / float(self.dim)
                        )
                        return vals, idx
                    return dist, idx
                except Exception as e:
                    _HAM_MXU_OK[0] = False
                    record_demotion("hamming-mxu", e)
        if _BINARY_OK[0] and use_pallas() and mode is StorageMode.BINARY:
            try:
                valid = self._valid
                if mask is not None:
                    valid = jnp.logical_and(valid, _pad_to(mask, self.n_pad))
                packed_q = binary_quantize(queries)
                if _bucket_safe(self.n_pad, 2048, k_eff):
                    # bucket-selection kernel (the k-pass merge was the
                    # round-1 VPU bottleneck in binary mode too)
                    pen = jnp.where(valid, 0.0, jnp.inf)
                    dist, idx = hamming_bucket_topk(
                        packed_q, self._packed, pen, k=k_eff, chunk=2048,
                        interpret=False,
                    )
                else:
                    dist, idx = hamming_topk(
                        packed_q, self._packed, valid=valid, k=k_eff
                    )
                if self.metric.higher_is_better:
                    vals = jnp.where(
                        idx < 0, -jnp.inf, 1.0 - dist / float(self.dim)
                    )
                    return vals, idx
                return dist, idx
            except Exception as e:
                _BINARY_OK[0] = False
                record_demotion("hamming-bucket", e)
        if mode in (StorageMode.FULL, StorageMode.F16, StorageMode.BF16):
            corpus_args = (self._full,)
        elif mode is StorageMode.SQ8:
            corpus_args = (self._sq8, self._sq_norm)
        else:
            corpus_args = (self._packed,)
        return _fused_search(
            queries,
            corpus_args,
            self._valid,
            mask,
            k_eff,
            self.metric,
            mode,
            self.dim,
        )

    def _search_streaming(self, queries, k: int, mask):
        """TPU streaming dispatch (replaces ``simd_dispatch.rs``): the bucket
        Pallas kernel at large N — measured 110-125K QPS/chip at b=256 on
        both 1M x 128D and 100K x 768D — and the XLA scan+PartialReduce path
        (`ops/streamed.py`, recall 1.0) when the corpus is small or ``k`` is
        large enough that one-winner-per-bucket collisions would cost recall
        (loss ~ (k-1)/(2*nbuckets), kept under ~1%)."""
        b = queries.shape[0]
        b_pad = ((max(b, 8) + 7) // 8) * 8
        d_pad = ((self.dim + 127) // 128) * 128
        chunk = min(
            bucket_chunk_for(b_pad, d_pad, self._full.dtype.itemsize, self.n_pad),
            self.n_pad,
        )
        mask_dev = None if mask is None else _pad_to(mask, self.n_pad)
        # engine split measured r3 (64-batch protocol, v5e): the bucket
        # kernel wins at low D (1Mx128D: 217K vs 190K QPS) where selection
        # dominates; the scan+PartialReduce path wins at high D (100Kx768D:
        # 338K vs 252K) where the MXU matmul dominates and XLA's pipelining
        # beats the hand-tiled kernel
        prefer_streamed = self.dim >= 512
        if not prefer_streamed and self._assist_pd is not None:
            # per-dim enc-select assist (r5 default; see rebuild comment)
            m = min(max(2 * k - 4, 16), 256)
            chunk_i8 = min(bucket_chunk_for(b_pad, d_pad, 1, self.n_pad), self.n_pad)
            if m >= k and _bucket_safe(self.n_pad, chunk_i8, m):
                rows_pd, pen_int, pen_f32, sdim, mid, qu = self._assist_pd
                if _SQ8PD_OK[0]:
                    try:
                        from velesdb_tpu.ops.bucket_kernel import (
                            _pd_invalid_pen,
                            sq8pd_ptile,
                            sq8pd_rerank_topk,
                        )

                        ptile = self._pd_ptile.get(chunk_i8)
                        if ptile is None:
                            ptile = jax.device_put(
                                sq8pd_ptile(pen_int, chunk_i8)
                            )
                            self._pd_ptile[chunk_i8] = ptile
                        if mask_dev is not None:
                            ptile = jnp.where(
                                mask_dev,
                                ptile,
                                -64 * _pd_invalid_pen(self.dim),
                            )
                        return sq8pd_rerank_topk(
                            queries, rows_pd, ptile, sdim, qu, self._full,
                            k=k, m=m, metric=self.metric, chunk=chunk_i8,
                            dim=self.dim, interpret=False,
                        )
                    except Exception as e:
                        _SQ8PD_OK[0] = False
                        record_demotion("int8-assist-pd", e)
                if _SQ8PD_XLA_OK[0]:
                    try:
                        from velesdb_tpu.ops.bucket_kernel import (
                            sq8pd_xla_rerank_topk,
                        )

                        pf = pen_f32
                        if mask_dev is not None:
                            pf = jnp.where(mask_dev, pf, jnp.inf)
                        return sq8pd_xla_rerank_topk(
                            queries, rows_pd, pf, sdim, qu, self._full,
                            k=k, m=m, metric=self.metric,
                        )
                    except Exception as e:
                        _SQ8PD_XLA_OK[0] = False
                        record_demotion("int8-assist-pd-xla", e)
                # both pd paths demoted: fall through to the split-bf16
                # lazy build below so fidelity survives (same ladder the
                # per-row family uses)
                if _HL_OK[0] and self._full_hl is None and self._full is not None:
                    try:
                        from velesdb_tpu.ops.bucket_kernel import (
                            split_f32_rows,
                        )

                        padded = jnp.pad(
                            self._full.astype(jnp.float32),
                            ((0, 0), (0, d_pad - self.dim)),
                        )
                        hi, lo = split_f32_rows(padded)
                        self._full_hl = (
                            jax.device_put(hi), jax.device_put(lo)
                        )
                        del padded
                    except Exception:
                        self._full_hl = None
        if not prefer_streamed and self._assist is not None:
            # int8-assist serve default (see rebuild): coarse top-m int8
            # scan + exact f32 rerank in one program. m = 16 measured best
            # at k=10 (oversample ~1.6x; larger m only pays more gather —
            # recall is already 0.997+ host-basis at m=16); scale with k
            # but keep the coarse pass inside the bucket-collision guard.
            m = min(max(2 * k - 4, 16), 256)
            chunk_i8 = min(bucket_chunk_for(b_pad, d_pad, 1, self.n_pad), self.n_pad)
            if m >= k and _bucket_safe(self.n_pad, chunk_i8, m):
                rows8, sc, mv, pen8 = self._assist
                if mask_dev is not None:
                    pen8 = jnp.where(mask_dev, pen8, jnp.inf)
                if _SQ8I_OK[0]:
                    try:
                        from velesdb_tpu.ops.bucket_kernel import (
                            sq8i_rerank_topk,
                        )

                        return sq8i_rerank_topk(
                            queries, rows8, sc, mv, pen8, self._full,
                            k=k, m=m, metric=self.metric, chunk=chunk_i8,
                            interpret=False,
                        )
                    except Exception as e:
                        _SQ8I_OK[0] = False
                        record_demotion("int8-assist", e)
                if _SQ8I_XLA_OK[0]:
                    # ADVICE r3: rebuild() builds the assist shadow INSTEAD
                    # of the split-bf16 one, so on an assist kill-switch an
                    # existing FULL collection would silently demote all the
                    # way to the plain f32 bucket kernel (~0.953 host recall
                    # at 1M vs 0.99+). The pure-XLA assist twin keeps
                    # exact-rerank fidelity (0.9973 host at 1Mx128,
                    # exp_mono4) from the SAME shadow arrays with no
                    # Mosaic dependency and no +4B/dim hl rebuild.
                    try:
                        from velesdb_tpu.ops.bucket_kernel import (
                            sq8i_xla_rerank_topk,
                        )

                        return sq8i_xla_rerank_topk(
                            queries, rows8, sc, mv, pen8, self._full,
                            k=k, m=m, metric=self.metric,
                        )
                    except Exception as e:
                        _SQ8I_XLA_OK[0] = False
                        record_demotion("int8-assist-xla", e)
                    # last resort before the plain f32 kernel: lazily build
                    # the split-bf16 shadow so fidelity survives even a
                    # broken XLA twin.
                    if _HL_OK[0] and self._full_hl is None and self._full is not None:
                        try:
                            from velesdb_tpu.ops.bucket_kernel import (
                                split_f32_rows,
                            )

                            padded = jnp.pad(
                                self._full.astype(jnp.float32),
                                ((0, 0), (0, d_pad - self.dim)),
                            )
                            hi, lo = split_f32_rows(padded)
                            self._full_hl = (
                                jax.device_put(hi), jax.device_put(lo)
                            )
                            del padded
                        except Exception:
                            self._full_hl = None
        if not prefer_streamed and _HL_OK[0] and self._full_hl is not None:
            # split-bf16 scoring: true-f32 fidelity at f32-kernel speed
            # (host-oracle identity 0.953 -> 0.986 measured at 1M x 128D)
            chunk_hl = min(bucket_chunk_for(b_pad, d_pad, 8, self.n_pad), self.n_pad)
            if _bucket_safe(self.n_pad, chunk_hl, k):
                try:
                    from velesdb_tpu.ops.bucket_kernel import bucket_topk_hl

                    return bucket_topk_hl(
                        queries, self._full_hl[0], self._full_hl[1],
                        self._bucket_pen, mask_dev, k=k, metric=self.metric,
                        chunk=chunk_hl, interpret=False,
                    )
                except Exception as e:
                    _HL_OK[0] = False
                    record_demotion("split-bf16", e)
        if (
            not prefer_streamed
            and _PALLAS_OK[0]
            and _bucket_safe(self.n_pad, chunk, k)
        ):
            try:
                return bucket_topk_entry(
                    queries,
                    self._full,
                    self._bucket_pen,
                    mask_dev,
                    k=k,
                    metric=self.metric,
                    chunk=chunk,
                    interpret=False,
                    prenormalized=True,
                )
            except Exception as e:  # Mosaic failure: disable ONLY this kernel
                _PALLAS_OK[0] = False  # and retry via the pure-XLA streamed path
                record_demotion("bucket-f32", e)
        valid = self._valid
        if mask_dev is not None:
            valid = jnp.logical_and(valid, mask_dev)
        return streamed_topk(
            queries,
            self._full,
            valid=valid,
            k=k,
            metric=self.metric,
            corpus_sqnorm=self._full_sqnorm,
        )


@functools.partial(jax.jit, static_argnames=("k", "metric", "mode", "dim"))
def _fused_search(queries, corpus_args, valid, mask, k, metric, mode, dim):
    """Scores + mask + top-k in one compiled program (single dispatch)."""
    if mode in (StorageMode.FULL, StorageMode.F16, StorageMode.BF16):
        (corpus,) = corpus_args
        if mode is not StorageMode.FULL:
            corpus = corpus.astype(jnp.float32)
        s = pairwise_scores(queries, corpus, metric)
    elif mode is StorageMode.SQ8:
        sq, sq_norm = corpus_args
        s = _sq8_metric_scores(queries, sq, sq_norm, metric)
    else:
        (packed,) = corpus_args
        d = pairwise_hamming_packed(binary_quantize(queries), packed).astype(
            jnp.float32
        )
        s = (1.0 - d / float(dim)) if metric.higher_is_better else d
    if mask is not None:
        valid = jnp.logical_and(valid, mask)
    return top_k(s, k, higher_is_better=metric.higher_is_better, mask=valid[None, :])


@functools.partial(jax.jit, static_argnames=("metric",))
def _sq8_metric_scores(queries, sq: SQ8Vectors, sq_norm, metric: DistanceMetric):
    queries = jnp.asarray(queries, jnp.float32)
    dots = sq8_dot_scores(queries, sq)
    if metric is DistanceMetric.DOT_PRODUCT:
        return dots
    if metric is DistanceMetric.COSINE:
        qn = jnp.sqrt(jnp.sum(queries * queries, axis=-1, keepdims=True))
        denom = jnp.maximum(qn * sq_norm[None, :], 1e-30)
        return jnp.where(denom > 1e-30, dots / denom, 0.0)
    if metric is DistanceMetric.EUCLIDEAN:
        qq = jnp.sum(queries * queries, axis=-1, keepdims=True)
        d2 = qq + sq_norm[None, :] - 2.0 * dots
        return jnp.sqrt(jnp.maximum(d2, 0.0))
    raise ValueError(f"metric {metric} not supported in sq8 mode")
