"""Run-log lifecycle (SURVEY §2.1 op 24).

Reference: services/staging/app/pipeline_run_logs_repo.py:7-71 —
``pipeline_run_log(run_id PK, pipeline_name, entity, started_at, ended_at,
status running|success|failed, rows_in, rows_inserted_history,
rows_upserted_latest, error)``; start is INSERT ON CONFLICT DO NOTHING;
error text truncated to 4000 chars. The reference's double-finish quirk on
empty batches (staging run.py:54-86 falls through after the early success)
is intentionally NOT reproduced — one terminal state per run.
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import Row, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType, TimestampType

from wms_data_pipeline_spark.operators.merge import ParquetTable

ERROR_TEXT_CAP = 4000  # reference pipeline_run_logs_repo.py:70

RUNLOG_SCHEMA = StructType(
    [
        StructField("run_id", StringType(), False),
        StructField("pipeline_name", StringType(), False),
        StructField("entity", StringType(), False),
        StructField("started_at", TimestampType(), False),
        StructField("ended_at", TimestampType()),
        StructField("status", StringType(), False),
        StructField("rows_in", LongType()),
        StructField("rows_inserted_history", LongType()),
        StructField("rows_upserted_latest", LongType()),
        StructField("error", StringType()),
    ]
)


def _now() -> datetime:
    return datetime.now(timezone.utc)


class RunLog:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.table = ParquetTable(spark, root)

    def _row(self, **kw) -> Row:
        base = dict(
            run_id=None, pipeline_name=None, entity=None, started_at=None,
            ended_at=None, status=None, rows_in=None, rows_inserted_history=None,
            rows_upserted_latest=None, error=None,
        )
        base.update(kw)
        return Row(**base)

    def start(self, run_id: str, pipeline_name: str, entity: str) -> None:
        """INSERT … ON CONFLICT DO NOTHING — a restarted run keeps its
        original start row (reference pipeline_run_logs_repo.py:7-24)."""
        existing = self.table.read()
        if existing is not None and existing.filter(F.col("run_id") == run_id).limit(1).count():
            return
        row = self.spark.createDataFrame(
            [self._row(run_id=run_id, pipeline_name=pipeline_name, entity=entity,
                       started_at=_now(), status="running")],
            RUNLOG_SCHEMA,
        )
        self.table._publish(row if existing is None else existing.unionByName(row))

    def _finish(self, run_id: str, **updates) -> None:
        existing = self.table.read()
        if existing is None:
            raise ValueError(f"run {run_id} was never started")
        target = existing.filter(F.col("run_id") == run_id)
        others = existing.filter(F.col("run_id") != run_id)
        for c, v in updates.items():
            target = target.withColumn(c, F.lit(v).cast(RUNLOG_SCHEMA[c].dataType))
        self.table._publish(others.unionByName(target))

    def finish_success(
        self, run_id: str, rows_in: int, rows_inserted_history: int, rows_upserted_latest: int
    ) -> None:
        self._finish(
            run_id, status="success", ended_at=_now(), rows_in=rows_in,
            rows_inserted_history=rows_inserted_history,
            rows_upserted_latest=rows_upserted_latest,
        )

    def finish_failed(self, run_id: str, error: str) -> None:
        self._finish(run_id, status="failed", ended_at=_now(), error=(error or "")[:ERROR_TEXT_CAP])
