"""Relational-helper tests: as-of join (incl. tolerance), sessionize, top-k."""

from datetime import datetime

from pyspark.sql import functions as F

from wms_data_pipeline_spark.operators.relational import asof_join, sessionize, top_k


def test_asof_join_basic(spark):
    left = spark.createDataFrame(
        [(1, datetime(2026, 1, 1, 12)), (2, datetime(2026, 1, 1, 12))],
        "key long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (1, datetime(2026, 1, 1, 10), "early"),
            (1, datetime(2026, 1, 1, 11), "latest-before"),
            (1, datetime(2026, 1, 1, 13), "after"),
        ],
        "key long, ts timestamp, tag string",
    )
    out = asof_join(left, right, "key", "key", "ts", "ts", right_cols=["tag"])
    got = {r["key"]: (r["tag"], r["asof_ts"]) for r in out.collect()}
    assert got[1] == ("latest-before", datetime(2026, 1, 1, 11))
    assert got[2] == (None, None)  # unmatched key kept (left outer)


def test_asof_join_tolerance(spark):
    left = spark.createDataFrame([(1, datetime(2026, 1, 1, 12))], "key long, ts timestamp")
    right = spark.createDataFrame(
        [(1, datetime(2026, 1, 1, 8), "too-old")], "key long, ts timestamp, tag string"
    )
    out = asof_join(
        left, right, "key", "key", "ts", "ts", right_cols=["tag"], tolerance="2 hours"
    ).collect()
    assert out[0]["tag"] is None  # match outside the band is dropped


def test_sessionize(spark):
    rows = [
        (1, datetime(2026, 1, 1, 10, 0)),
        (1, datetime(2026, 1, 1, 10, 20)),
        (1, datetime(2026, 1, 1, 11, 30)),
        (2, datetime(2026, 1, 1, 10, 0)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = sessionize(df, gap="30 minutes").collect()
    got = {(r["user_id"], r["ts"]): r["session_id"] for r in out}
    assert got[(1, datetime(2026, 1, 1, 10, 0))] == 0
    assert got[(1, datetime(2026, 1, 1, 10, 20))] == 0
    assert got[(1, datetime(2026, 1, 1, 11, 30))] == 1
    assert got[(2, datetime(2026, 1, 1, 10, 0))] == 0


def test_top_k_plans_take_ordered(spark):
    df = spark.createDataFrame([(i, i % 3) for i in range(100)], "id long, g long")
    out = top_k(df, 5, [F.col("id").desc()])
    assert [r["id"] for r in out.collect()] == [99, 98, 97, 96, 95]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
