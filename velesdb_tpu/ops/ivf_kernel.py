"""Pallas scalar-prefetch probe kernel: IVF partition reads at DMA speed.

Why it exists (measured, v5e, benchmarks/exp_ivf_gather.py): at capacity
shapes ([13834, 736, 768] u8 partitions) XLA's batched slice-gather
``parts[pid]`` runs at **2.3GB/s** — a fixed ~228us per slice, unpipelined —
which is 350x below the HBM roofline the streaming engines hit (~900GB/s,
see ``exp_bf16_stream.py``). Unrolled ``dynamic_slice`` reaches 60GB/s.
That gap is THE reason probing lost to brute-force streaming at capacity
(5M x 768D SQ8-IVF measured 666 QPS at b=16 vs ~2.2K for a full scan).

This kernel moves the probe loop into a Pallas pipeline where the partition
block for grid step ``(b, j)`` is chosen by a **scalar-prefetched** probe id
(``pltpu.PrefetchScalarGridSpec``): the pipeline double-buffers one
contiguous HBM->VMEM DMA of ``L*D`` bytes per step against the previous
step's unpack+matmul — partition reads become sequential-burst DMAs instead
of XLA gathers.

Per grid step (b, j):

    DMA:  words[probe[b,j]] block [L, W] i32  -> VMEM   (pipelined)
    VPU:  unpack 4 byte planes -> [L, D_pad] bf16 codes (ints <=255 exact)
    MXU:  dots = q_b [8, D_pad] @ codes.T                (8 = sublane pad)
    VPU:  s = scale * dots + qsum * minv - pen           (affine + mask)
    out:  scores[b, j] [L] f32

Selection happens OUTSIDE over the [B, NPROBE*L] score matrix with
``approx_max_k`` (TPU PartialReduce) — same split as the bucket kernel:
Mosaic has no sort primitive, XLA selects in one pass.

Scoring contract mirrors ``bucket_kernel.sq8_bucket_topk``: "maximize"
orientation, euclidean queries pre-scaled by 2 with ``pen = |c|^2`` (and
distances restored outside), cosine 1/|c| folded into scale/minv by the
caller, dead slots carry ``pen = +inf``.

Reference counterpart: the IVF-probe inner loop of a CPU ANN engine is a
pointer-chase; here it is a DMA schedule — the TPU-native reading of
SURVEY.md §2.2's "index probes candidate buckets".
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from velesdb_tpu.ops.distance import DistanceMetric

__all__ = ["ivf_probe_topk", "ivf_probe_supported"]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# The kernel pays one DMA per (query, probe); it beats the XLA gather when
# blocks are big enough to amortize per-step overhead and the batch is in
# the probing regime. Below these the XLA path stays.
MIN_BLOCK_BYTES = 65536     # L * D below this: per-step overhead dominates
MAX_KERNEL_BATCH = 64       # probing only wins at small batch anyway

# The probe table is scalar-prefetched into SMEM (1MB on v5e); Mosaic
# rejects the compile outright when the prefetched allocation exceeds it —
# measured on-chip: b=4096 x probes=64 (1MB of i32) surfaces as a 2MB SMEM
# allocation (2x for prefetch buffering) vs the 1MB budget. b=1024 x 64
# (256KB) compiles and runs; cap the table there.
SMEM_PROBE_BYTES = 256 * 1024


def probe_table_fits(b: int, nprobe: int) -> bool:
    """True when the scalar-prefetched [b, nprobe] i32 table fits SMEM."""
    return b * nprobe * 4 <= SMEM_PROBE_BYTES


def ivf_probe_supported(b: int, L: int, d: int, itemsize: int = 1) -> bool:
    """``itemsize``: partition bytes per dim (1 = SQ8 codes, 4 = f32)."""
    return b <= MAX_KERNEL_BATCH and L * d * itemsize >= MIN_BLOCK_BYTES


def _probe_kernel(probe_ref, q_ref, w_ref, aux_ref, out_ref, *, d_pad: int,
                  quant: bool):
    # q_ref: [8, D_pad] f32 (8 identical sublane replicas of query b)
    # w_ref: quant -> [1, L, W] i32 block-packed codes of partition
    #        probe[b, j]; else [1, L, D] f32 rows
    # aux_ref: [1, 8, L] f32 — sublane-stacked (mul, add, pen, 0...):
    #   s = mul * dots + add * sum(q) - pen. SQ8: (scale2, minv2, |c|^2
    #   or 0); f32: (1 or 1/|c|, 0, |c|^2 or 0). +inf pen = dead slot.
    #   (Mosaic requires the 2nd-to-last block dim divisible by 8; three
    #   separate [P, L] arrays with (1, L) blocks do not lower)
    # out_ref: [1, 1, 8, L] f32
    q = q_ref[:]  # [8, D_pad]
    if quant:
        w = w_ref[0]  # [L, W]
        planes = []
        for j in range(4):
            pj = jnp.bitwise_and(
                jax.lax.shift_right_logical(w, jnp.int32(8 * j)),
                jnp.int32(0xFF),
            )
            planes.append(pj.astype(jnp.bfloat16))
        rows = jnp.concatenate(planes, axis=1)  # [L, D_pad] codes 0..255
        q = q.astype(jnp.bfloat16)
    else:
        rows = w_ref[0]  # [L, D] f32
    dots = jax.lax.dot_general(
        q, rows, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [8, L]
    qsum = jnp.sum(q_ref[:], axis=1, keepdims=True)  # [8, 1]
    aux = aux_ref[0]  # [8, L]
    s = dots * aux[0:1, :] + qsum * aux[1:2, :]
    out_ref[0, 0] = s - aux[2:3, :]


@functools.partial(
    jax.jit, static_argnames=("k", "nprobe", "metric", "interpret")
)
def ivf_probe_topk(queries, cents, cent_sq, words, aux, flat_rows, *,
                   k, nprobe, metric, interpret=False):
    """Probe-kernel search over packed SQ8 partitions — ONE dispatch:
    routing matmul + Pallas probe pipeline + PartialReduce selection.

    ``queries [B, D] f32`` raw; ``cents [P, D] / cent_sq [P]`` partition
    routing; ``words`` either ``[P, L, W] i32`` packed SQ8 codes or
    ``[P, L, D] f32`` rows (dtype-dispatched); ``aux [P, 8, L] f32``
    sublane-stacked (mul, add, pen, zeros) epilogue operands (see
    ``_probe_kernel``); ``flat_rows [P*L] i32`` original row ids.

    Returns ``(values [B, k], row_ids [B, k])`` in the metric's native
    orientation (distance ascending for euclidean), ``-1`` ids for empty.
    """
    metric = DistanceMetric.parse(metric)
    b, d = queries.shape
    P, L, W = words.shape
    quant = words.dtype == jnp.int32
    d_pad = W * 4 if quant else W

    q = queries
    qq = jnp.sum(q * q, axis=1)
    if metric is DistanceMetric.COSINE:
        sq = jnp.sum(q * q, axis=1, keepdims=True)
        qn = q * jnp.where(sq > 1e-30, jax.lax.rsqrt(jnp.maximum(sq, 1e-30)), 0.0)
    else:
        qn = q
    route = qn @ cents.T
    if metric is DistanceMetric.EUCLIDEAN:
        route = route - 0.5 * cent_sq[None, :]
    # bucket-padded partitions carry the cent_sq sentinel (ivf._group_map);
    # reuse the single masking helper so the threshold can never diverge
    from velesdb_tpu.index.ivf import _route_mask

    route = _route_mask(route, cent_sq)
    _, probe = jax.lax.top_k(route, nprobe)  # [B, NPROBE]

    q = qn
    if metric is DistanceMetric.EUCLIDEAN:
        q = 2.0 * q
    q = jnp.pad(q, ((0, 0), (0, d_pad - d)))
    q8 = jnp.repeat(q, 8, axis=0)  # [B*8, D_pad]: sublane-pad each query

    grid = (b, nprobe)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, d_pad), lambda bi, j, pr: (bi, 0)),
            pl.BlockSpec((1, L, W), lambda bi, j, pr: (pr[bi, j], 0, 0)),
            pl.BlockSpec((1, 8, L), lambda bi, j, pr: (pr[bi, j], 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, 8, L), lambda bi, j, pr: (bi, j, 0, 0)
        ),
    )
    scores8 = pl.pallas_call(
        functools.partial(_probe_kernel, d_pad=d_pad, quant=quant),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, nprobe, 8, L), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * nprobe * 8 * d_pad * L,
            bytes_accessed=b * nprobe * L * (d_pad * (1 if quant else 4) + 32),
            transcendentals=0,
        ),
        interpret=interpret,
    )(probe.astype(jnp.int32), q8, words, aux)
    scores = scores8[:, :, 0, :].reshape(b, nprobe * L)

    k_eff = min(k, nprobe * L)
    if nprobe * L >= 16_384:
        vals, pos = jax.lax.approx_max_k(scores, k_eff)
    else:
        vals, pos = jax.lax.top_k(scores, k_eff)
    pj = pos // L
    lane = pos % L
    pid = jnp.take_along_axis(probe, pj, axis=1)
    rows = flat_rows[pid * L + lane]
    empty = ~jnp.isfinite(vals)
    rows = jnp.where(empty, -1, rows)
    if metric is DistanceMetric.EUCLIDEAN:
        d2 = jnp.maximum(qq[:, None] - vals, 0.0)
        vals = jnp.where(empty, jnp.inf, jnp.sqrt(d2))
    else:
        vals = jnp.where(empty, -jnp.inf, vals)
    return vals, rows
