"""Spark 4 Python Data Source test: a real local HTTP server serving the
mock-API envelope; executors fetch page ranges in parallel."""

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer
from urllib.parse import parse_qs, urlparse

import pytest

from wms_data_pipeline_spark.sources.rest import HAS_DATASOURCE_API

pytestmark = pytest.mark.skipif(
    not HAS_DATASOURCE_API, reason="pyspark DataSource API not available"
)

ROWS = [
    {
        "id": f"id-{i:04d}",
        "updated_at": f"2026-01-30T10:{i % 60:02d}:{i // 60:02d}+00:00",
        "status": "NEW",
    }
    for i in range(137)
]
ROWS.sort(key=lambda r: (r["updated_at"], r["id"]))


class Handler(BaseHTTPRequestHandler):
    def do_GET(self):
        q = parse_qs(urlparse(self.path).query)
        off = int(q.get("offset", ["0"])[0])
        lim = int(q.get("limit", ["100"])[0])
        rows = ROWS
        after = q.get("updated_after", [None])[0]
        if after:
            rows = [r for r in rows if r["updated_at"] > after]
        body = json.dumps(
            {"data": rows[off : off + lim], "meta": {"count": len(rows)}}
        ).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):  # quiet
        pass


@pytest.fixture(scope="module")
def api_server():
    srv = HTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


def test_datasource_parallel_fetch(spark, api_server):
    from wms_data_pipeline_spark.sources.rest import PaginatedRestDataSource

    spark.dataSource.register(PaginatedRestDataSource)
    df = (
        spark.read.format("paginated_rest")
        .schema("id string, updated_at string, status string")
        .option("base_url", api_server)
        .option("entity", "ib_receipts")
        .option("limit", "25")
        .option("pages_per_task", "2")
        .load()
    )
    # 137 rows / (25*2) per task → 3 partitions; all rows exactly once
    assert df.rdd.getNumPartitions() == 3
    got = sorted(r["id"] for r in df.collect())
    assert got == sorted(r["id"] for r in ROWS)


def test_stream_reader_incremental_microbatches(spark, api_server, tmp_path):
    """Streaming REST source: batch 1 sees the seed rows; rows appended to
    the live store appear in the next micro-batch only (cursor advance)."""
    from wms_data_pipeline_spark.sources.rest import PaginatedRestDataSource

    spark.dataSource.register(PaginatedRestDataSource)
    stream = (
        spark.readStream.format("paginated_rest")
        .schema("id string, updated_at string, status string")
        .option("base_url", api_server)
        .option("entity", "ib_receipts")
        .option("limit", "50")
        .load()
    )
    q = (
        stream.writeStream.format("memory").queryName("rest_stream_t")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        n1 = spark.sql("SELECT count(*) n FROM rest_stream_t").collect()[0]["n"]
        assert n1 == len(ROWS)

        # live mutation: two new rows past the cursor
        ROWS.append({"id": "id-9998", "updated_at": "2026-01-30T12:00:00+00:00",
                     "status": "NEW"})
        ROWS.append({"id": "id-9999", "updated_at": "2026-01-30T12:00:01+00:00",
                     "status": "NEW"})
        q.processAllAvailable()
        got = {r["id"] for r in spark.sql("SELECT id FROM rest_stream_t").collect()}
        assert "id-9998" in got and "id-9999" in got
        n2 = spark.sql("SELECT count(*) n FROM rest_stream_t").collect()[0]["n"]
        assert n2 == n1 + 2  # no re-delivery of old rows (cursor advanced)
    finally:
        q.stop()
        ROWS[:] = [r for r in ROWS if not r["id"].startswith("id-99")]


def test_datasource_pushes_watermark(spark, api_server):
    from wms_data_pipeline_spark.sources.rest import PaginatedRestDataSource

    spark.dataSource.register(PaginatedRestDataSource)
    cutoff = ROWS[100]["updated_at"]
    expected = [r["id"] for r in ROWS if r["updated_at"] > cutoff]
    df = (
        spark.read.format("paginated_rest")
        .schema("id string, updated_at string, status string")
        .option("base_url", api_server)
        .option("entity", "ib_receipts")
        .option("updated_after", cutoff)
        .option("limit", "25")
        .load()
    )
    assert sorted(r["id"] for r in df.collect()) == sorted(expected)


class CappedHandler(Handler):
    """Server that caps page size at 10 rows regardless of requested limit —
    a short page must NOT end the partition's offset range (only an empty
    page does), or rows silently vanish."""

    def do_GET(self):
        q = parse_qs(urlparse(self.path).query)
        off = int(q.get("offset", ["0"])[0])
        lim = min(int(q.get("limit", ["100"])[0]), 10)
        body = json.dumps(
            {"data": ROWS[off : off + lim], "meta": {"count": len(ROWS)}}
        ).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


@pytest.fixture(scope="module")
def capped_server():
    srv = HTTPServer(("127.0.0.1", 0), CappedHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


def test_datasource_survives_server_page_cap(spark, capped_server):
    from wms_data_pipeline_spark.sources.rest import PaginatedRestDataSource

    spark.dataSource.register(PaginatedRestDataSource)
    df = (
        spark.read.format("paginated_rest")
        .schema("id string, updated_at string, status string")
        .option("base_url", capped_server)
        .option("entity", "ib_receipts")
        .option("limit", "25")
        .option("pages_per_task", "2")
        .load()
    )
    got = sorted(r["id"] for r in df.collect())
    assert got == sorted(r["id"] for r in ROWS)
