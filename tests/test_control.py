"""Control-plane tests — watermark monotonicity + run-log lifecycle
(reference test_watermark_repo.py invariants)."""

from datetime import datetime, timezone

import pytest

from wms_data_pipeline_spark.control.runlog import ERROR_TEXT_CAP, RunLog
from wms_data_pipeline_spark.control.watermark import (
    WatermarkStore,
    compute_new_watermark,
)

T_OLD = datetime(2026, 1, 1, tzinfo=timezone.utc)
T_NEW = datetime(2026, 1, 2, tzinfo=timezone.utc)


def test_default_when_empty(spark, tmp_path):
    ws = WatermarkStore(spark, str(tmp_path / "wm"))
    assert ws.get("p", "e") == datetime(1970, 1, 1, tzinfo=timezone.utc)


def test_first_insert_and_readback(spark, tmp_path):
    ws = WatermarkStore(spark, str(tmp_path / "wm"))
    ws.upsert("p", "e", T_NEW, "run-1")
    assert ws.get("p", "e") == T_NEW


def test_monotonic_time_but_runid_overwritten(spark, tmp_path):
    # pinned by reference test_watermark_repo.py:48-65: a stale run never
    # moves the time backwards but DOES take over last_success_run_id
    ws = WatermarkStore(spark, str(tmp_path / "wm"))
    ws.upsert("p", "e", T_NEW, "run-new")
    ws.upsert("p", "e", T_OLD, "run-stale")
    assert ws.get("p", "e") == T_NEW
    row = ws.table.read().collect()[0]
    assert row["last_success_run_id"] == "run-stale"


def test_other_keys_untouched(spark, tmp_path):
    ws = WatermarkStore(spark, str(tmp_path / "wm"))
    ws.upsert("p", "e1", T_OLD, "r1")
    ws.upsert("p", "e2", T_NEW, "r2")
    assert ws.get("p", "e1") == T_OLD
    assert ws.get("p", "e2") == T_NEW


def test_carry_forward_on_empty_batch():
    assert compute_new_watermark(None, T_OLD) == T_OLD
    assert compute_new_watermark(T_NEW, T_OLD) == T_NEW
    assert compute_new_watermark(T_OLD, T_NEW) == T_NEW  # max guards races


def test_runlog_lifecycle(spark, tmp_path):
    rl = RunLog(spark, str(tmp_path / "runlog"))
    rl.start("r1", "pipe", "ent")
    rl.start("r1", "pipe", "ent")  # ON CONFLICT DO NOTHING
    rl.finish_success("r1", rows_in=10, rows_inserted_history=8, rows_upserted_latest=5)
    rows = rl.table.read().collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["status"] == "success" and r["rows_in"] == 10
    assert r["rows_inserted_history"] == 8 and r["rows_upserted_latest"] == 5


def test_runlog_failure_truncates_error(spark, tmp_path):
    rl = RunLog(spark, str(tmp_path / "runlog"))
    rl.start("r2", "pipe", "ent")
    rl.finish_failed("r2", "x" * 5000)
    r = rl.table.read().collect()[0]
    assert r["status"] == "failed" and len(r["error"]) == ERROR_TEXT_CAP


def test_runlog_finish_unknown_run_raises(spark, tmp_path):
    rl = RunLog(spark, str(tmp_path / "runlog"))
    with pytest.raises(ValueError):
        rl.finish_success("ghost", 0, 0, 0)
