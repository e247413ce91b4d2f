"""SQL-API surface: register the testdata star schema as temp views so every
engine capability is reachable via ``spark.sql`` as well as the DataFrame
API (SURVEY §7.0: "spark.sql parity for every op")."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from wms_data_pipeline_spark.schemas import TESTDATA_TABLES, load_table


def register_testdata_views(spark: SparkSession, sf_dir: str) -> None:
    for name in TESTDATA_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def sql(spark: SparkSession, query: str) -> DataFrame:
    """Thin passthrough — the SQL planner is Catalyst, same as the
    DataFrame path; this exists so callers can treat the engine as a SQL
    endpoint."""
    return spark.sql(query)
