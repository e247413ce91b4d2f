"""Load-boundary contract for the events table's timestamp column.

The driver testdata's ``events.ts`` physical encoding has changed across
rounds (TIMESTAMP(NANOS) → TIMESTAMP(isAdjustedToUTC=false) micros).
``load_table`` is the single normalization boundary: whatever parquet
encoding arrives, callers must see a session-UTC ``timestamp`` column with
the same microsecond values (the Spark twin of the reference's
UTC-normalize-at-every-layer discipline — reference:
services/common/normalize.py:6-9)."""

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from wms_data_pipeline_spark.schemas import load_table

# 2024-01-15T12:34:56.789012 UTC, in microseconds since epoch.
MICROS = [1705322096789012, 1705322096789013, 1705408496000000]


def _base_table(ts_array: pa.Array) -> pa.Table:
    n = len(ts_array)
    return pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": ts_array,
            "user_id": pa.array([7] * n, pa.int64()),
            "event_type": pa.array(["click"] * n, pa.string()),
            "value": pa.array([1.5] * n, pa.float64()),
            "props": pa.array(["{}"] * n, pa.string()),
        }
    )


def _read_micros(spark, d: str) -> list[int]:
    df = load_table(spark, d, "events")
    assert dict(df.dtypes)["ts"] == "timestamp", dict(df.dtypes)
    rows = df.selectExpr("unix_micros(ts) AS us").orderBy("us").collect()
    return [r.us for r in rows]


def test_ntz_micros_round_trip(spark, tmp_path):
    """pandas/arrow default: TIMESTAMP(isAdjustedToUTC=false) micros →
    Spark reads timestamp_ntz → load_table casts to UTC timestamp,
    value-preserving under the pinned UTC session tz."""
    ts = pa.array(MICROS, pa.timestamp("us"))  # no tz → isAdjustedToUTC=false
    pq.write_table(_base_table(ts), os.path.join(tmp_path, "events.parquet"))
    meta = pq.read_metadata(os.path.join(tmp_path, "events.parquet"))
    assert "isAdjustedToUTC=false" in str(meta.schema.column(1))
    assert _read_micros(spark, str(tmp_path)) == sorted(MICROS)


def test_legacy_nanos_round_trip(spark, tmp_path):
    """TIMESTAMP(NANOS): unreadable by the vanilla Spark parquet reader;
    load_table's nanosAsLong branch truncates nanos→micros (matching
    DuckDB's own nanos read)."""
    ts = pa.array([m * 1000 + 999 for m in MICROS], pa.timestamp("ns"))
    pq.write_table(
        _base_table(ts),
        os.path.join(tmp_path, "events.parquet"),
        coerce_timestamps=None,
        version="2.6",
    )
    meta = pq.read_metadata(os.path.join(tmp_path, "events.parquet"))
    assert "timeUnit=nanoseconds" in str(meta.schema.column(1))
    assert _read_micros(spark, str(tmp_path)) == sorted(MICROS)


def test_utc_adjusted_micros_round_trip(spark, tmp_path):
    """Third possible encoding: isAdjustedToUTC=true micros reads directly
    as a tz-aware timestamp; load_table must pass it through unchanged."""
    ts = pa.array(
        [dt.datetime.fromtimestamp(m / 1e6, dt.timezone.utc) for m in MICROS],
        pa.timestamp("us", tz="UTC"),
    )
    pq.write_table(_base_table(ts), os.path.join(tmp_path, "events.parquet"))
    assert _read_micros(spark, str(tmp_path)) == sorted(MICROS)
