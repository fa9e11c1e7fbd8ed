"""Migration connector + pipeline tests, incl. a mock Qdrant/Chroma server.

Counterpart of ``velesdb-migrate`` connector tests (SURVEY.md §2.6): the REST
connectors are driven against a local stdlib mock implementing the real
pagination protocols.
"""

import csv
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np
import pytest

from velesdb_tpu.database import Database
from velesdb_tpu.migrate import (
    ChromaConnector,
    ConnectorError,
    CsvConnector,
    JsonConnector,
    JsonlConnector,
    MigrationPipeline,
    NumpyConnector,
    QdrantConnector,
)


@pytest.fixture
def coll(tmp_db_dir):
    return Database.open(tmp_db_dir).create_collection("dst", dim=4)


def _vecs(rng, n):
    return rng.standard_normal((n, 4)).astype(np.float32)


def test_jsonl_connector_and_pipeline(tmp_path, coll, rng):
    v = _vecs(rng, 10)
    path = tmp_path / "src.jsonl"
    with open(path, "w") as f:
        for i in range(10):
            f.write(
                json.dumps({"id": i, "vector": v[i].tolist(), "payload": {"i": i}})
                + "\n"
            )
    progress = []
    report = MigrationPipeline(
        JsonlConnector(str(path)),
        coll,
        batch_size=4,
        on_progress=progress.append,
    ).run()
    assert report.migrated == 10 and report.failed == 0
    assert coll.count() == 10 and coll.get(7)[1] == {"i": 7}
    assert progress[-1] == 10


def test_jsonl_flat_records(tmp_path, coll, rng):
    path = tmp_path / "flat.jsonl"
    with open(path, "w") as f:
        f.write(json.dumps({"id": 1, "vector": [1, 2, 3, 4], "name": "x"}) + "\n")
    MigrationPipeline(JsonlConnector(str(path)), coll).run()
    assert coll.get(1)[1] == {"name": "x"}


def test_json_array_and_transform_skip(tmp_path, coll, rng):
    v = _vecs(rng, 4)
    path = tmp_path / "src.json"
    path.write_text(
        json.dumps(
            [{"id": i, "vector": v[i].tolist(), "payload": {"keep": i % 2}} for i in range(4)]
        )
    )
    report = MigrationPipeline(
        JsonConnector(str(path)),
        coll,
        transform=lambda r: r if r["payload"]["keep"] else None,
    ).run()
    assert report.migrated == 2 and report.skipped == 2


def test_csv_connector_dim_columns(tmp_path, coll):
    path = tmp_path / "src.csv"
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["id", "v0", "v1", "v2", "v3", "price"])
        w.writerow([5, 0.1, 0.2, 0.3, 0.4, 9])
    MigrationPipeline(CsvConnector(str(path)), coll).run()
    vec, payload = coll.get(5)
    np.testing.assert_allclose(vec, [0.1, 0.2, 0.3, 0.4], rtol=1e-6)
    assert payload == {"price": 9}


def test_csv_connector_json_vector_column(tmp_path, coll):
    path = tmp_path / "src.csv"
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["id", "vector", "tag"])
        w.writerow([1, "[1, 0, 0, 0]", "a"])
    MigrationPipeline(CsvConnector(str(path)), coll).run()
    assert coll.get(1)[1] == {"tag": "a"}


def test_numpy_connector(tmp_path, coll, rng):
    v = _vecs(rng, 6)
    path = tmp_path / "src.npz"
    np.savez(path, vectors=v, ids=np.arange(10, 16))
    MigrationPipeline(NumpyConnector(str(path)), coll).run()
    assert coll.count() == 6 and coll.get(12) is not None


def test_connector_errors(tmp_path, coll):
    bad = tmp_path / "bad.jsonl"
    bad.write_text("{not json}\n")
    with pytest.raises(ConnectorError):
        list(JsonlConnector(str(bad)).records())
    nocol = tmp_path / "no.csv"
    nocol.write_text("id,foo\n1,2\n")
    with pytest.raises(ConnectorError):
        list(CsvConnector(str(nocol)).records())


def test_dim_mismatch_raises(tmp_path, coll):
    path = tmp_path / "src.jsonl"
    path.write_text(json.dumps({"id": 1, "vector": [1, 2]}) + "\n")
    with pytest.raises(ValueError, match="dimension"):
        MigrationPipeline(JsonlConnector(str(path)), coll).run()


# -- mock external services ----------------------------------------------------


@pytest.fixture
def mock_service(rng):
    """One server speaking both Qdrant scroll and Chroma get protocols."""
    vectors = _vecs(rng, 7)
    state = {"vectors": vectors}

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_POST(self):
            body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
            if self.path.endswith("/points/scroll"):
                offset = body.get("offset", 0)
                limit = body["limit"]
                pts = [
                    {
                        "id": i,
                        "vector": vectors[i].tolist(),
                        "payload": {"i": i},
                    }
                    for i in range(offset, min(offset + limit, len(vectors)))
                ]
                nxt = offset + limit if offset + limit < len(vectors) else None
                out = {"result": {"points": pts, "next_page_offset": nxt}}
            elif "/api/v1/collections/" in self.path:
                offset, limit = body["offset"], body["limit"]
                sl = range(offset, min(offset + limit, len(vectors)))
                out = {
                    "ids": [i for i in sl],
                    "embeddings": [vectors[i].tolist() for i in sl],
                    "metadatas": [{"i": i} for i in sl],
                }
            else:
                self.send_response(404)
                self.end_headers()
                return
            data = json.dumps(out).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

    httpd = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}", state
    httpd.shutdown()


def test_qdrant_connector(mock_service, coll):
    base, state = mock_service
    report = MigrationPipeline(
        QdrantConnector(base, "src", batch=3), coll
    ).run()
    assert report.migrated == 7
    np.testing.assert_allclose(coll.get(3)[0], state["vectors"][3], rtol=1e-6)
    assert coll.get(3)[1] == {"i": 3}


def test_chroma_connector(mock_service, coll):
    base, state = mock_service
    report = MigrationPipeline(ChromaConnector(base, "cid", batch=4), coll).run()
    assert report.migrated == 7 and coll.count() == 7


def test_qdrant_connection_refused(coll):
    with pytest.raises(ConnectorError, match="failed"):
        list(QdrantConnector("http://127.0.0.1:9", "x").records())


@pytest.fixture
def mock_es_weaviate_milvus(rng):
    """One server speaking ES scroll, Weaviate objects, and Milvus v2 query."""
    vectors = _vecs(rng, 9)

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def _json(self, out):
            data = json.dumps(out).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_POST(self):
            body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
            if self.path.endswith("/_search"):
                after = (body.get("search_after") or [-1])[0]
                size = body["size"]
                start = after + 1
                hits = [
                    {
                        "_id": str(i),
                        "_source": {"embedding": vectors[i].tolist(), "i": i},
                        "sort": [i],
                    }
                    for i in range(start, min(start + size, len(vectors)))
                ]
                self._json({"hits": {"hits": hits}})
            elif self.path.endswith("/entities/query"):
                off, lim = body["offset"], body["limit"]
                rows = [
                    {"id": i, "vector": vectors[i].tolist(), "i": i}
                    for i in range(off, min(off + lim, len(vectors)))
                ]
                self._json({"data": rows})
            else:
                self.send_response(404); self.end_headers()

        def do_GET(self):
            if self.path.startswith("/v1/objects"):
                from urllib.parse import parse_qs, urlparse
                qs = parse_qs(urlparse(self.path).query)
                lim = int(qs["limit"][0])
                after = qs.get("after", [None])[0]
                start = int(after) + 1 if after else 0
                objs = [
                    {
                        "id": str(i),
                        "vector": vectors[i].tolist(),
                        "properties": {"_veles_id": i, "name": f"w{i}"},
                    }
                    for i in range(start, min(start + lim, len(vectors)))
                ]
                self._json({"objects": objs})
            else:
                self.send_response(404); self.end_headers()

    httpd = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}", vectors
    httpd.shutdown()


def test_elasticsearch_connector(mock_es_weaviate_milvus, coll):
    from velesdb_tpu.migrate import ElasticsearchConnector

    base, vectors = mock_es_weaviate_milvus
    report = MigrationPipeline(
        ElasticsearchConnector(base, "idx", batch=4), coll
    ).run()
    assert report.migrated == 9 and coll.get(5)[1] == {"i": 5}


def test_weaviate_connector(mock_es_weaviate_milvus, coll):
    from velesdb_tpu.migrate import WeaviateConnector

    base, vectors = mock_es_weaviate_milvus
    report = MigrationPipeline(WeaviateConnector(base, "Doc", batch=4), coll).run()
    assert report.migrated == 9 and coll.get(3)[1] == {"name": "w3"}


def test_milvus_connector(mock_es_weaviate_milvus, coll):
    from velesdb_tpu.migrate import MilvusConnector

    base, vectors = mock_es_weaviate_milvus
    report = MigrationPipeline(MilvusConnector(base, "c", batch=4), coll).run()
    assert report.migrated == 9
    np.testing.assert_allclose(coll.get(7)[0], vectors[7], rtol=1e-6)


def test_pinecone_connector(coll, rng):
    from velesdb_tpu.migrate import PineconeConnector

    vectors = _vecs(rng, 6)

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            from urllib.parse import parse_qs, urlparse
            parsed = urlparse(self.path)
            qs = parse_qs(parsed.query)
            if parsed.path == "/vectors/list":
                tok = qs.get("paginationToken", [None])[0]
                start = int(tok) if tok else 0
                lim = int(qs["limit"][0])
                ids = [str(i) for i in range(start, min(start + lim, 6))]
                out = {"vectors": [{"id": i} for i in ids]}
                nxt = start + lim
                if nxt < 6:
                    out["pagination"] = {"next": str(nxt)}
            elif parsed.path == "/vectors/fetch":
                ids = qs["ids"]
                out = {
                    "vectors": {
                        i: {"values": vectors[int(i)].tolist(), "metadata": {"i": int(i)}}
                        for i in ids
                    }
                }
            else:
                self.send_response(404); self.end_headers(); return
            data = json.dumps(out).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

    httpd = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        base = f"http://127.0.0.1:{httpd.server_address[1]}"
        report = MigrationPipeline(PineconeConnector(base, batch=4), coll).run()
        assert report.migrated == 6 and coll.get(4)[1] == {"i": 4}
    finally:
        httpd.shutdown()


def test_driver_gated_connectors_error_clearly(coll):
    from velesdb_tpu.migrate import MongoConnector, RedisConnector

    for conn, pkg in [
        (RedisConnector("redis://x", "idx"), "redis"),
        (MongoConnector("mongodb://x", "db", "c"), "pymongo"),
    ]:
        try:
            list(conn.records())
        except ConnectorError as e:
            assert pkg in str(e)
        except Exception:
            pass  # driver present in env: connection errors are fine too
