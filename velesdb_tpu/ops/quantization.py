"""Vector quantization: SQ8 affine, 1-bit binary sign packing, half precision.

TPU-native counterpart of ``velesdb-core/src/quantization.rs`` and
``half_precision.rs``:

- **SQ8** (``QuantizedVector::from_f32``, ``quantization.rs:229``): per-vector
  min/max affine mapping to ``uint8`` (4x memory). Dequantized dot products are
  rewritten as one int8-ish matmul plus rank-1 correction so they run on the
  MXU: ``dot(q, dq(c_n)) = scale_n * (q . codes_n) + min_n * sum(q)``.
- **Binary** (``BinaryQuantizedVector::from_f32``, ``quantization.rs:68``):
  ``v >= 0`` -> bit 1, packed 32 dims per ``uint32`` word (32x memory), scored
  with XOR+popcount Hamming.
- **Half** (``half_precision.rs:36``): bf16/f16 storage casts; bf16 is the
  TPU-native choice (MXU ingests bf16 directly).
"""

from __future__ import annotations

import enum
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "StorageMode",
    "VectorPrecision",
    "SQ8Vectors",
    "sq8_quantize",
    "sq8_dequantize",
    "sq8_dot_scores",
    "binary_quantize",
    "binary_unpack",
    "packed_words",
    "hamming_similarity",
]


class StorageMode(str, enum.Enum):
    """Parity with ``StorageMode`` (``quantization.rs:20``)."""

    FULL = "full"
    SQ8 = "sq8"
    BINARY = "binary"
    F16 = "f16"
    BF16 = "bf16"

    @classmethod
    def parse(cls, v) -> "StorageMode":
        return v if isinstance(v, cls) else cls(str(v).strip().lower())


class VectorPrecision(str, enum.Enum):
    """Parity with ``VectorPrecision`` (``half_precision.rs:36``)."""

    F32 = "f32"
    F16 = "f16"
    BF16 = "bf16"

    @property
    def dtype(self):
        return {
            VectorPrecision.F32: jnp.float32,
            VectorPrecision.F16: jnp.float16,
            VectorPrecision.BF16: jnp.bfloat16,
        }[self]


class SQ8Vectors(NamedTuple):
    """Per-vector affine-quantized batch: ``deq = codes * scale + minv``."""

    codes: jax.Array  # [N, D] uint8
    scale: jax.Array  # [N] f32  (range / 255)
    minv: jax.Array  # [N] f32


@jax.jit
def sq8_quantize(x: jax.Array) -> SQ8Vectors:
    """Per-vector min/max affine quantization (``quantization.rs:229-252``)."""
    x = jnp.asarray(x, jnp.float32)
    minv = jnp.min(x, axis=-1)
    maxv = jnp.max(x, axis=-1)
    rng = maxv - minv
    scale = jnp.where(rng > 0, rng / 255.0, 1.0)
    codes = jnp.clip(
        jnp.round((x - minv[..., None]) / scale[..., None]), 0, 255
    ).astype(jnp.uint8)
    return SQ8Vectors(codes=codes, scale=scale, minv=minv)


@jax.jit
def sq8_dequantize(q: SQ8Vectors) -> jax.Array:
    """``quantization.rs:267-270``: ``f32(code) * scale + min``."""
    return q.codes.astype(jnp.float32) * q.scale[..., None] + q.minv[..., None]


@jax.jit
def sq8_dot_scores(queries: jax.Array, q: SQ8Vectors) -> jax.Array:
    """Asymmetric dot scores ``[B, N]`` of f32 queries against SQ8 corpus.

    One MXU matmul on the raw codes plus a rank-1 correction — no
    materialized dequantization (beats the reference's per-element
    dequantize-then-FMA loop, ``quantization.rs:336-343``).
    """
    queries = jnp.asarray(queries, jnp.float32)
    code_dot = jax.lax.dot_general(
        queries,
        q.codes.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    qsum = jnp.sum(queries, axis=-1, keepdims=True)
    return code_dot * q.scale[None, :] + qsum * q.minv[None, :]


def packed_words(dim: int) -> int:
    """Number of uint32 words for ``dim`` packed bits."""
    return (dim + 31) // 32


@functools.partial(jax.jit, static_argnames=("threshold_half",))
def binary_quantize(x: jax.Array, threshold_half: bool = False) -> jax.Array:
    """Sign-pack ``[N, D] f32`` into ``[N, ceil(D/32)] uint32``.

    ``v >= 0`` -> 1 (``BinaryQuantizedVector::from_f32``, ``quantization.rs:68``);
    with ``threshold_half`` uses the f32-Hamming convention ``v > 0.5``
    (``simd_explicit.rs:252``). Bit ``d`` of word ``w`` is dimension
    ``w * 32 + d`` (LSB-first).
    """
    x = jnp.asarray(x)
    n, d = x.shape
    w = packed_words(d)
    pad = w * 32 - d
    bits = (x > 0.5) if threshold_half else (x >= 0.0)
    bits = jnp.pad(bits, ((0, 0), (0, pad))).astype(jnp.uint32)
    bits = bits.reshape(n, w, 32)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))[None, None, :]
    return jnp.sum(bits * weights, axis=-1).astype(jnp.uint32)


@functools.partial(jax.jit, static_argnames=("dim",))
def binary_unpack(packed: jax.Array, dim: int) -> jax.Array:
    """Unpack ``[N, W] uint32`` back to ``[N, dim]`` {0,1} float32."""
    n, w = packed.shape
    shifts = jnp.arange(32, dtype=jnp.uint32)[None, None, :]
    bits = (packed[..., None] >> shifts) & jnp.uint32(1)
    return bits.reshape(n, w * 32)[:, :dim].astype(jnp.float32)


def hamming_similarity(dist: jax.Array, dim: int) -> jax.Array:
    """``1 - dist/dim`` (``quantization.rs`` ``hamming similarity``)."""
    return 1.0 - dist.astype(jnp.float32) / float(dim)


def numpy_sq8_roundtrip(x: np.ndarray) -> np.ndarray:
    """NumPy reference used by tests to validate the device path."""
    minv = x.min(axis=-1, keepdims=True)
    maxv = x.max(axis=-1, keepdims=True)
    rng = maxv - minv
    scale = np.where(rng > 0, rng / 255.0, 1.0)
    codes = np.clip(np.round((x - minv) / scale), 0, 255).astype(np.uint8)
    return codes.astype(np.float32) * scale + minv
