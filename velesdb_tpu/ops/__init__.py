"""Compute kernels: batched distances, top-k, quantization, Pallas paths.

This package replaces the reference's entire compute layer
(``velesdb-core/src/simd*.rs``, ``quantization.rs``, ``gpu/`` — SURVEY.md §2.1):
runtime SIMD dispatch becomes XLA compilation, and the per-pair scalar kernels
become batched MXU matmuls plus Pallas kernels for the HBM-streaming hot path.
"""

from velesdb_tpu.ops.distance import (
    DistanceMetric,
    normalize,
    pairwise_hamming_packed,
    pairwise_scores,
    score_one,
)
from velesdb_tpu.ops.quantization import (
    SQ8Vectors,
    StorageMode,
    VectorPrecision,
    binary_quantize,
    binary_unpack,
    hamming_similarity,
    packed_words,
    sq8_dequantize,
    sq8_dot_scores,
    sq8_quantize,
)
from velesdb_tpu.ops.topk import mask_scores, merge_top_k, top_k

__all__ = [
    "DistanceMetric",
    "normalize",
    "pairwise_scores",
    "pairwise_hamming_packed",
    "score_one",
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
    "top_k",
    "merge_top_k",
    "mask_scores",
]
