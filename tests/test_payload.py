"""Canonical payload + hash contract (reference test_payload.py + SURVEY
§7.3 hard part 1 — golden-pinned)."""

import hashlib
import json
from datetime import datetime, timezone

from pyspark.sql import functions as F

from wms_data_pipeline_spark.operators.payload import (
    canonical_json,
    payload_columns,
    with_payload_and_hash,
)


def test_meta_excluded_and_hash_matches(spark):
    df = spark.createDataFrame(
        [("a", 5, "r1")], "id string, qty long, _run_id string"
    )
    out = with_payload_and_hash(df).collect()[0]
    payload = json.loads(out["payload"])
    assert set(payload) == {"id", "qty"}  # _run_id excluded
    assert out["payload_hash"] == hashlib.sha256(out["payload"].encode()).hexdigest()


def test_canonical_golden():
    # pure-python golden of the contract: sorted keys, compact, nulls kept
    expected = '{"alpha":"x","beta":null,"gamma":2}'
    assert json.dumps(
        {"gamma": 2, "alpha": "x", "beta": None},
        sort_keys=True, separators=(",", ":"), ensure_ascii=False,
    ) == expected


def test_canonical_json_spark_side(spark):
    df = spark.createDataFrame([(2, "x", None)], "gamma long, alpha string, beta string")
    got = df.select(canonical_json(df).alias("p")).collect()[0]["p"]
    assert got == '{"alpha":"x","beta":null,"gamma":2}'


def test_non_ascii_passthrough(spark):
    df = spark.createDataFrame([("héllo — wörld",)], "note string")
    got = df.select(canonical_json(df).alias("p")).collect()[0]["p"]
    assert got == '{"note":"héllo — wörld"}'  # ensure_ascii=False equivalent


def test_timestamp_rendering(spark):
    df = spark.createDataFrame(
        [(datetime(2026, 1, 30, 10, 0, 0, 123456),)], "updated_at timestamp"
    )
    got = df.select(canonical_json(df).alias("p")).collect()[0]["p"]
    assert got == '{"updated_at":"2026-01-30T10:00:00.123456+00:00"}'


def test_same_content_same_hash_different_content_differs(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 1), ("a", 2)], "id string, v long"
    )
    hashes = [r["payload_hash"] for r in with_payload_and_hash(df).collect()]
    assert hashes[0] == hashes[1] != hashes[2]
