"""applyInPandasWithState: newer-wins change-stream dedup across
micro-batches (state persisted in the checkpoint)."""

import glob
import os
import shutil
from datetime import datetime

from pyspark.sql.types import (
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from wms_data_pipeline_spark.streaming.stateful import latest_state_changes

SCHEMA = StructType(
    [
        StructField("id", StringType()),
        StructField("updated_at", TimestampType()),
        StructField("status", StringType()),
    ]
)


def _land(spark, src, rows, name):
    scratch = os.path.join(src, "..", f"_s_{name}")
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("overwrite").parquet(scratch)
    part = glob.glob(os.path.join(scratch, "part-*.parquet"))[0]
    shutil.move(part, os.path.join(src, f"{name}.parquet"))
    shutil.rmtree(scratch, ignore_errors=True)


def test_latest_state_changes_suppresses_stale(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    t1, t2, t3 = (datetime(2026, 1, 1, h) for h in (10, 11, 12))

    # one continuous query; memory sink accumulates emitted change rows
    _land(spark, src, [("a", t1, "NEW"), ("b", t2, "NEW")], "b1")
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    changes = latest_state_changes(stream, key="id", ts_col="updated_at",
                                   tiebreak_col="status")
    q = (
        changes.writeStream.format("memory").queryName("changes_t")
        .outputMode("update").option("checkpointLocation", ckpt).start()
    )
    try:
        q.processAllAvailable()
        got1 = {(r["id"], r["status"]) for r in spark.sql("SELECT * FROM changes_t").collect()}
        assert got1 == {("a", "NEW"), ("b", "NEW")}

        # batch 2: newer update for a; STALE update for b (t1 < t2);
        # redelivery of a@t1 — both must be suppressed by the state store
        _land(spark, src, [("a", t3, "DONE"), ("b", t1, "STALE"), ("a", t1, "NEW")], "b2")
        q.processAllAvailable()
        rows = [(r["id"], r["status"]) for r in spark.sql("SELECT * FROM changes_t").collect()]
        assert len(rows) == 3  # exactly one new emission
        assert set(rows) - got1 == {("a", "DONE")}
    finally:
        q.stop()


def test_latest_state_changes_tws_suppresses_stale(spark, tmp_path):
    """transformWithStateInPandas twin: same newer-wins semantics on the
    Spark 4 successor API (typed ValueState handle)."""
    import pytest

    from wms_data_pipeline_spark.streaming.stateful import latest_state_changes_tws

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    t1, t2, t3 = (datetime(2026, 1, 1, h) for h in (10, 11, 12))

    _land(spark, src, [("a", t1, "NEW"), ("b", t2, "NEW")], "b1")
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    try:
        changes = latest_state_changes_tws(stream, key="id", ts_col="updated_at")
    except ImportError as e:
        pytest.skip(f"transformWithStateInPandas unavailable: {e}")
    q = (
        changes.writeStream.format("memory").queryName("changes_tws_t")
        .outputMode("update").option("checkpointLocation", ckpt).start()
    )
    try:
        q.processAllAvailable()
        got1 = {(r["id"], r["status"])
                for r in spark.sql("SELECT * FROM changes_tws_t").collect()}
        assert got1 == {("a", "NEW"), ("b", "NEW")}

        _land(spark, src, [("a", t3, "DONE"), ("b", t1, "STALE"), ("a", t1, "NEW")], "b2")
        q.processAllAvailable()
        rows = [(r["id"], r["status"])
                for r in spark.sql("SELECT * FROM changes_tws_t").collect()]
        assert len(rows) == 3
        assert set(rows) - got1 == {("a", "DONE")}
    finally:
        q.stop()
