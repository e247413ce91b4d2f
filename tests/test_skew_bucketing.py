"""Skew salting + bucketed co-located join tests, with plan evidence."""

import os

import pytest
from pyspark.sql import functions as F

from wms_data_pipeline_spark.operators.skew import (
    salted_agg,
    salted_broadcast_join,
    write_bucketed,
)


def test_salted_agg_matches_plain(spark):
    df = spark.createDataFrame(
        [(i % 3, float(i)) for i in range(1000)], "k long, v double"
    )
    plain = {
        (r["k"]): (r["s"], r["n"], r["mn"], r["mx"])
        for r in df.groupBy("k")
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"),
             F.min("v").alias("mn"), F.max("v").alias("mx"))
        .collect()
    }
    salted = {
        (r["k"]): (r["s"], r["n"], r["mn"], r["mx"])
        for r in salted_agg(
            df, ["k"], {"s": "sum(v)", "n": "count(1)", "mn": "min(v)", "mx": "max(v)"}
        ).collect()
    }
    assert plain == salted


def test_salted_agg_rejects_non_algebraic(spark):
    df = spark.createDataFrame([(1, 1.0)], "k long, v double")
    with pytest.raises(ValueError, match="non-algebraic"):
        salted_agg(df, ["k"], {"a": "avg(v)"})


def test_salted_broadcast_join_matches_plain(spark):
    # hot key: 90% of probe rows share key 0
    probe = spark.createDataFrame(
        [((0 if i % 10 else i % 7), i) for i in range(1000)], "k long, v long"
    )
    build = spark.createDataFrame([(i, f"dim-{i}") for i in range(7)], "k long, name string")
    plain = sorted(
        (r["k"], r["v"], r["name"]) for r in probe.join(build, "k").collect()
    )
    salted = sorted(
        (r["k"], r["v"], r["name"])
        for r in salted_broadcast_join(probe, build, "k").collect()
    )
    assert plain == salted


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    # co-located join: both sides bucketed on the key -> zero shuffle
    spark.sql("DROP TABLE IF EXISTS bt_orders")
    spark.sql("DROP TABLE IF EXISTS bt_lines")
    orders = spark.createDataFrame(
        [(i, f"o-{i}") for i in range(500)], "okey long, o string"
    )
    lines = spark.createDataFrame(
        [(i % 500, j, float(i)) for i in range(500) for j in range(2)],
        "okey long, ln long, amt double",
    )
    write_bucketed(orders, "bt_orders", "okey", 8)
    write_bucketed(lines, "bt_lines", "okey", 8)
    # force a non-broadcast join so the bucket co-location is what's tested
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("bt_orders").join(spark.table("bt_lines"), "okey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Exchange" not in plan  # buckets align: no shuffle on either side
        assert joined.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bt_orders")
        spark.sql("DROP TABLE IF EXISTS bt_lines")


def test_sql_api_parity(spark):
    from wms_data_pipeline_spark.catalog import register_testdata_views

    sf = "/root/testdata/sf0.001"
    if not os.path.exists(sf):
        pytest.skip("testdata missing")
    register_testdata_views(spark, sf)
    via_sql = spark.sql(
        "SELECT l_returnflag, round(sum(l_quantity), 2) AS s FROM lineitem "
        "GROUP BY l_returnflag"
    ).collect()
    via_df = (
        spark.table("lineitem")
        .groupBy("l_returnflag")
        .agg(F.round(F.sum("l_quantity"), 2).alias("s"))
        .collect()
    )
    assert sorted(map(tuple, via_sql)) == sorted(map(tuple, via_df))

def test_salted_latest_matches_window_latest(spark):
    """salted_latest must pick the identical winner per key as the window
    form (latest_merge) — including equal-timestamp rows resolved by the
    tiebreak — while spreading a hot key across salt buckets."""
    from wms_data_pipeline_spark.operators.merge import latest_merge
    from wms_data_pipeline_spark.operators.skew import salted_latest

    rows = []
    # hot key 0: 500 rows, several sharing the max ts (tiebreak decides)
    for i in range(500):
        rows.append((0, 1000 + min(i, 490), i, f"p{i}"))
    # uniform tail
    for k in range(1, 50):
        for i in range(3):
            rows.append((k, 1000 + i, k * 10 + i, f"q{k}:{i}"))
    df = spark.createDataFrame(
        rows, "user_id long, ts long, event_id long, payload string"
    ).withColumn("ts", F.timestamp_micros(F.col("ts")))

    via_window = latest_merge(
        None, df, key="user_id", ts_col="ts", tiebreak_col="event_id"
    )
    via_salted = salted_latest(df, "user_id", "ts", "event_id", buckets=8)
    a = sorted(map(tuple, via_window.select("user_id", "ts", "event_id", "payload").collect()))
    b = sorted(map(tuple, via_salted.select("user_id", "ts", "event_id", "payload").collect()))
    assert a == b
    assert len(a) == 50


def test_salted_latest_handles_map_payload(spark):
    """max_by compares only the ordering struct, so non-orderable payload
    types (map) must work — the packed max(struct(order+payload)) form
    raised AnalysisException here (round-4 advice)."""
    from wms_data_pipeline_spark.operators.merge import latest_merge
    from wms_data_pipeline_spark.operators.skew import salted_latest

    df = spark.createDataFrame(
        [(k, ts, {"v": f"{k}-{ts}"}) for k in range(5) for ts in range(4)],
        "user_id long, ts long, attrs map<string,string>",
    )
    got = sorted(
        (r["user_id"], r["ts"], dict(r["attrs"]))
        for r in salted_latest(df, "user_id", "ts", buckets=4).collect()
    )
    want = sorted(
        (r["user_id"], r["ts"], dict(r["attrs"]))
        for r in latest_merge(None, df, key="user_id", ts_col="ts",
                              tiebreak_col=None).collect()
    )
    assert got == want and len(got) == 5


def test_latest_state_auto_dispatch(spark):
    """latest_state(skew='auto') picks the salted path on a hot key and the
    window path on uniform keys, returning identical winners either way."""
    from wms_data_pipeline_spark.operators.skew import latest_state

    rows = [(0, 1000 + i, i, f"p{i}") for i in range(900)]  # 90% on key 0
    rows += [(k, 1000, 10_000 + k, "q") for k in range(1, 101)]
    df = spark.createDataFrame(
        rows, "user_id long, ts long, event_id long, payload string"
    ).withColumn("ts", F.timestamp_micros(F.col("ts")))

    outs = {
        mode: sorted(
            map(
                tuple,
                latest_state(
                    df, "user_id", "ts", "event_id", skew=mode,
                    sample_fraction=1.0,
                ).select("user_id", "ts", "event_id", "payload").collect(),
            )
        )
        for mode in ("auto", "window", "salted")
    }
    assert outs["auto"] == outs["window"] == outs["salted"]
    assert len(outs["auto"]) == 101
    # uniform keys → the probe must NOT trip the salted path (plan check:
    # window form contains a Window node, salted form does not)
    uniform = spark.createDataFrame(
        [(k, 1000 + t, k * 10 + t, "u") for k in range(200) for t in range(3)],
        "user_id long, ts long, event_id long, payload string",
    )
    plan_auto = latest_state(
        uniform, "user_id", "ts", "event_id", skew="auto", sample_fraction=1.0
    )._jdf.queryExecution().optimizedPlan().toString()
    assert "Window" in plan_auto
    hot_plan = latest_state(
        df, "user_id", "ts", "event_id", skew="auto", sample_fraction=1.0
    )._jdf.queryExecution().optimizedPlan().toString()
    assert "Window" not in hot_plan
