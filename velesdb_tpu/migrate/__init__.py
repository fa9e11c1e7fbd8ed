"""Migration toolkit (``velesdb-migrate`` counterpart, SURVEY.md §2.6)."""

from velesdb_tpu.migrate.connectors import (
    CONNECTORS,
    ChromaConnector,
    ConnectorError,
    CsvConnector,
    JsonConnector,
    JsonlConnector,
    NumpyConnector,
    PgvectorConnector,
    QdrantConnector,
)
from velesdb_tpu.migrate.pipeline import MigrationPipeline, MigrationReport

__all__ = [
    "CONNECTORS",
    "ConnectorError",
    "JsonlConnector",
    "JsonConnector",
    "CsvConnector",
    "NumpyConnector",
    "QdrantConnector",
    "ChromaConnector",
    "PgvectorConnector",
    "MigrationPipeline",
    "MigrationReport",
]
