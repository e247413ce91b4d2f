"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``wms_data_pipeline_spark``; this module only adapts
the registry (wms_data_pipeline_spark/plans/queries.py) to the contract.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from wms_data_pipeline_spark.plans.queries import REGISTRY

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY §7.1 step 2): events → incremental watermark
    filter → keyed keep-last dedup → newer-wins latest state per user — the
    reference's semantic heart as one Spark plan."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return REGISTRY["wm_latest_state"].fn(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; keys without an oracle (genuinely
    non-SQL-expressible ops, e.g. LSH candidate generation) are omitted and
    get the driver's weaker rows-only check."""
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}
