"""velesdb_tpu — a TPU-native vector + graph + columnar database engine.

Built from scratch in JAX/XLA/Pallas with the capabilities of VelesDB
(reference: ``cyberlife-coder/velesdb``, see SURVEY.md): batched MXU distance
kernels, beam-search ANN over padded adjacency, SQ8/binary quantization, BM25 +
trigram text search with fusion, a typed column store with mask pushdown, a
knowledge graph with MATCH traversal, VelesQL, WAL-backed persistence, and
ICI-sharded multi-chip search.
"""

__version__ = "0.1.0"

from velesdb_tpu.ops import DistanceMetric, StorageMode

__all__ = ["DistanceMetric", "StorageMode", "__version__"]


def __getattr__(name):
    # Lazy imports keep `import velesdb_tpu` light (no collection machinery
    # needed for pure-ops users) and avoid import cycles.
    if name in ("Database",):
        from velesdb_tpu.database import Database

        return Database
    if name in ("Collection",):
        from velesdb_tpu.collection import Collection

        return Collection
    raise AttributeError(f"module 'velesdb_tpu' has no attribute {name!r}")
