"""Incremental rollup: merged-across-batches == aggregate-of-everything."""

import pytest
from pyspark.sql import functions as F

from wms_data_pipeline_spark.operators.rollup import (
    RollupTable,
    batch_rollup,
    incremental_rollup,
)

AGGS = {"n": "count(1)", "sv": "sum(v)", "mn": "min(v)", "mx": "max(v)"}


def _b(spark, rows):
    return spark.createDataFrame(rows, "k string, v long")


def test_incremental_equals_full(spark):
    b1 = _b(spark, [("a", 1), ("a", 2), ("b", 10)])
    b2 = _b(spark, [("a", 5), ("c", 7)])
    state = incremental_rollup(None, b1, ["k"], AGGS)
    state = incremental_rollup(state, b2, ["k"], AGGS)
    full = batch_rollup(b1.unionByName(b2), ["k"], AGGS)
    as_map = lambda df: {r["k"]: (r["n"], r["sv"], r["mn"], r["mx"]) for r in df.collect()}
    assert as_map(state) == as_map(full)
    assert as_map(state)["a"] == (3, 8, 1, 5)


def test_rollup_table_persists(spark, tmp_path):
    t = RollupTable(spark, str(tmp_path / "rollup"), ["k"], AGGS)
    t.apply_batch(_b(spark, [("a", 1)]))
    t.apply_batch(_b(spark, [("a", 4), ("b", 2)]))
    got = {r["k"]: (r["n"], r["sv"]) for r in t.read().collect()}
    assert got == {"a": (2, 5), "b": (1, 2)}


def test_non_algebraic_rejected(spark):
    with pytest.raises(ValueError, match="non-algebraic"):
        batch_rollup(_b(spark, [("a", 1)]), ["k"], {"bad": "avg(v)"})


def test_avg_derivable_from_bases(spark):
    t = incremental_rollup(None, _b(spark, [("a", 1), ("a", 3)]), ["k"], AGGS)
    out = t.withColumn("avg_v", F.col("sv") / F.col("n")).collect()[0]
    assert out["avg_v"] == 2.0
