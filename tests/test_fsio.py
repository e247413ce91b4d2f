"""Cluster-storage contract for the control plane (VERDICT r11 task 1).

Every ``ParquetTable``-backed component must work when the warehouse root
is a SCHEME URI, not a bare driver-local path — proving the pointer I/O
goes through the Hadoop FileSystem (``fsio.TableFS``) and not ``open()``/
``os.replace``. ``file://`` is the scheme this sandbox can actually
exercise; because all I/O flows through ``Path.getFileSystem``, the same
code paths serve ``hdfs://``/``s3a://`` (atomicity caveats documented in
``fsio``)."""

from datetime import datetime, timezone

import pytest

from wms_data_pipeline_spark import fsio
from wms_data_pipeline_spark.operators.merge import (
    CorruptTablePointerError,
    ParquetTable,
)
from wms_data_pipeline_spark.operators.merge_partitioned import PartitionedMergeTable
from wms_data_pipeline_spark.control.runlog import RunLog
from wms_data_pipeline_spark.control.watermark import WatermarkStore


def _uri(p) -> str:
    return "file://" + str(p)


def _rec(spark, rows):
    return spark.createDataFrame(
        rows, "id string, updated_at timestamp, payload string, payload_hash string"
    )


T1 = datetime(2026, 1, 1, 10)
T2 = datetime(2026, 1, 1, 11)


# -- fsio.TableFS primitives on a scheme URI --------------------------------

def test_tablefs_roundtrip_on_file_scheme(spark, tmp_path):
    fs = fsio.TableFS(spark, _uri(tmp_path))
    ptr = fsio.join(_uri(tmp_path), "_VERSION")
    assert fs.read_text(ptr) is None
    assert not fs.exists(ptr)
    fs.write_text_atomic(ptr, "7")
    assert fs.read_text(ptr) == "7"
    # overwrite through the rename path (dest exists)
    fs.write_text_atomic(ptr, "8")
    assert fs.read_text(ptr) == "8"
    # no .tmp litter after a successful flip
    assert not fs.exists(ptr + ".tmp")
    fs.mkdirs(fsio.join(_uri(tmp_path), "v=3"))
    assert fs.is_dir(fsio.join(_uri(tmp_path), "v=3"))
    assert sorted(fs.list_names(_uri(tmp_path))) == ["_VERSION", "v=3"]
    fs.delete(fsio.join(_uri(tmp_path), "v=3"))
    assert not fs.exists(fsio.join(_uri(tmp_path), "v=3"))


def test_fsio_join_preserves_scheme():
    assert fsio.join("file:///w/t/", "_VERSION") == "file:///w/t/_VERSION"
    assert fsio.join("s3a://bucket/t", "v=2") == "s3a://bucket/t/v=2"
    assert fsio.join("/plain/local", "b=1", "v=9") == "/plain/local/b=1/v=9"


# -- ParquetTable lifecycle through file:// ---------------------------------

def test_parquet_table_merge_lifecycle_file_scheme(spark, tmp_path):
    t = ParquetTable(spark, _uri(tmp_path / "latest"))
    assert t.upsert_latest(_rec(spark, [("a", T1, "old", "h1")])) == 1
    assert t.upsert_latest(_rec(spark, [("a", T2, "new", "h2")])) == 1
    assert t.upsert_latest(_rec(spark, [("a", T1, "stale", "h3")])) == 0
    rows = t.read().collect()
    assert len(rows) == 1 and rows[0]["payload"] == "new"

    h = ParquetTable(spark, _uri(tmp_path / "hist"))
    assert h.append_history(_rec(spark, [("a", T1, "p", "h1")])) == 1
    assert h.append_history(_rec(spark, [("a", T1, "p", "h1")])) == 0
    assert h.read().count() == 1


def test_parquet_table_time_travel_file_scheme(spark, tmp_path):
    t = ParquetTable(spark, _uri(tmp_path / "tt"), keep_versions=2)
    t.upsert_latest(_rec(spark, [("a", T1, "v1", "h1")]))
    t.upsert_latest(_rec(spark, [("a", T2, "v2", "h2")]))
    assert t.versions() == [1, 2]
    assert t.read(version=1).collect()[0]["payload"] == "v1"
    assert t.read(version=2).collect()[0]["payload"] == "v2"
    # third publish prunes v=1 (keep_versions=2)
    t.upsert_latest(_rec(spark, [("a", datetime(2026, 1, 2), "v3", "h3")]))
    assert t.versions() == [2, 3]
    with pytest.raises(ValueError, match="pruned"):
        t.read(version=1)


def test_parquet_table_corrupt_pointer_file_scheme(spark, tmp_path):
    root = tmp_path / "bad"
    t = ParquetTable(spark, _uri(root))
    t.upsert_latest(_rec(spark, [("a", T1, "p", "h1")]))
    (root / "_VERSION").write_text("not-a-number")
    with pytest.raises(CorruptTablePointerError):
        t.read()


def test_partitioned_table_file_scheme(spark, tmp_path):
    t = PartitionedMergeTable(spark, _uri(tmp_path / "pt"), n_buckets=4)
    batch = _rec(spark, [("a", T1, "p1", "h1"), ("b", T1, "p2", "h2")])
    assert t.upsert_latest(batch) == 2
    assert t.upsert_latest(_rec(spark, [("a", T2, "p1b", "h3")])) == 1
    out = {r["id"]: r["payload"] for r in t.read_all().collect()}
    assert out == {"a": "p1b", "b": "p2"}
    assert t.delete_keys(spark.createDataFrame([("b",)], "id string")) == 1
    assert [r["id"] for r in t.read_all().collect()] == ["a"]


# -- control plane (WatermarkStore / RunLog) through file:// ----------------

def test_watermark_store_file_scheme(spark, tmp_path):
    ws = WatermarkStore(spark, _uri(tmp_path / "wm"))
    default = ws.get("p", "orders")
    assert default.year == 1970
    wm = datetime(2026, 3, 1, 12, tzinfo=timezone.utc)
    ws.upsert("p", "orders", wm, run_id="r1")
    assert ws.get("p", "orders") == wm
    # monotonic: an older watermark never moves it backwards
    ws.upsert("p", "orders", datetime(2025, 1, 1, tzinfo=timezone.utc), run_id="r2")
    assert ws.get("p", "orders") == wm


def test_runlog_file_scheme(spark, tmp_path):
    rl = RunLog(spark, _uri(tmp_path / "runs"))
    rl.start("r1", "pipe", "orders")
    rl.finish_success("r1", rows_in=10, rows_inserted_history=10, rows_upserted_latest=9)
    rows = rl.table.read().collect()
    assert len(rows) == 1 and rows[0]["status"] == "success"
