"""wms_data_pipeline_spark — a PySpark-native incremental-ELT + analytics engine.

Brand-new engine with the query/data-processing capabilities of the reference
WMS incremental ELT pipeline (see SURVEY.md), re-expressed Spark-first:

- ``session``     — SparkSession factory (UTC, AQE, sane shuffle sizing)
- ``schemas``     — explicit StructType contracts for entities + testdata
- ``operators``   — normalize / dedup / payload-hash / merge semantics /
                    relational helpers / LLM-data ops (dedup, similarity, text)
- ``sources``     — paginated REST source, landing-zone reader/writer
- ``control``     — watermark + run-log control plane (parquet-backed)
- ``streaming``   — Structured Streaming pipeline + CDC test generator
- ``plans``       — named query registry consumed by __spark_entry__.py

Everything is DataFrame-API-first; Catalyst plans the physical execution.
"""

__version__ = "0.1.0"

from wms_data_pipeline_spark.session import get_spark  # noqa: F401
