"""Delta Lake merge sink — the lakehouse leg of ops 19-20 (SURVEY §7.0).

Same ``append_history`` / ``upsert_latest`` contract as ``ParquetTable``
(operators/merge.py) and ``JdbcMergeSink`` (sources/jdbc.py), expressed as
``DeltaTable.merge``:

- history append w/ global dedup (reference staging_repo.py:25-58) →
  ``whenNotMatchedInsertAll`` on the 3-col conflict key;
- newer-wins latest upsert (:62-99) → ``whenMatchedUpdateAll(condition=
  "s.updated_at > t.updated_at")`` + ``whenNotMatchedInsertAll``.

At 100 TB this is the real answer: Delta's MERGE prunes to the files whose
key ranges intersect the batch, gives optimistic-concurrency multi-writer
safety, and commits atomically — the properties ``ParquetTable`` /
``PartitionedMergeTable`` approximate with versioned directories.

The module is import-guarded: ``delta-spark`` is OPTIONAL. When absent,
``HAS_DELTA`` is False and constructing ``DeltaMergeTable`` raises — the
engine stays dependency-free and the interface test skips this leg cleanly.

STATUS: **experimental** in this build environment — delta-spark is not
installable here (no package index), so this leg has never executed its
conformance test in CI. ``tests/test_jdbc_sink.py::
test_delta_leg_status_is_visible`` records that skip loudly per run and
flips to a hard reminder the day the dependency appears. Treat the parquet
(``ParquetTable`` / ``PartitionedMergeTable``) and JDBC sinks as the
verified paths; review this one before first production use.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession

from wms_data_pipeline_spark.operators.merge import (
    HISTORY_KEY,
    LATEST_KEY,
    latest_merge,
)

try:  # optional dependency — engine must run without it
    from delta.tables import DeltaTable  # type: ignore

    HAS_DELTA = True
except ImportError:  # pragma: no cover - exercised when delta is absent
    DeltaTable = None  # type: ignore
    HAS_DELTA = False


class DeltaMergeTable:
    """Delta-backed merge sink (requires the optional ``delta-spark``
    package and a session built with ``configure_spark_with_delta_pip``)."""

    def __init__(self, spark: SparkSession, path: str):
        if not HAS_DELTA:
            raise ImportError(
                "delta-spark is not installed; use ParquetTable / "
                "PartitionedMergeTable (plain parquet) or JdbcMergeSink "
                "(warehouse) instead"
            )
        self.spark = spark
        self.path = path

    def _exists(self) -> bool:
        return DeltaTable.isDeltaTable(self.spark, self.path)

    def read(self) -> DataFrame | None:
        if not self._exists():
            return None
        return self.spark.read.format("delta").load(self.path)

    def _last_metrics(self) -> dict:
        row = (
            DeltaTable.forPath(self.spark, self.path)
            .history(1)
            .select("operationMetrics")
            .collect()[0][0]
        )
        return dict(row or {})

    def append_history(self, batch: DataFrame, key: Sequence[str] = HISTORY_KEY) -> int:
        """Op 19: whenNotMatchedInsertAll on the conflict key; returns the
        inserted count from Delta's commit metrics."""
        deduped = batch.dropDuplicates(list(key))
        if not self._exists():
            deduped.write.format("delta").save(self.path)
            return deduped.count()
        cond = " AND ".join(f"t.`{k}` = s.`{k}`" for k in key)
        (
            DeltaTable.forPath(self.spark, self.path)
            .alias("t")
            .merge(deduped.alias("s"), cond)
            .whenNotMatchedInsertAll()
            .execute()
        )
        return int(self._last_metrics().get("numTargetRowsInserted", 0))

    def delete_keys(self, batch_keys: DataFrame, key: str = LATEST_KEY) -> int:
        """Targeted deletion (dataset redaction): MERGE with
        whenMatchedDelete — Delta prunes to files whose key ranges
        intersect the deletion set; returns the deleted count."""
        if not self._exists():
            return 0
        kcol = batch_keys.columns[0]
        kdf = batch_keys.select(batch_keys[kcol].alias(key)).distinct()
        (
            DeltaTable.forPath(self.spark, self.path)
            .alias("t")
            .merge(kdf.alias("s"), f"t.`{key}` = s.`{key}`")
            .whenMatchedDelete()
            .execute()
        )
        return int(self._last_metrics().get("numTargetRowsDeleted", 0))

    def upsert_latest(
        self,
        batch: DataFrame,
        key: str = LATEST_KEY,
        ts_col: str = "updated_at",
    ) -> int:
        """Op 20: strict newer-wins upsert; batch collapses to one winner
        per key first (MERGE rejects duplicate source matches). Returns
        inserts + strictly-newer updates, like the other sinks."""
        winners = latest_merge(None, batch, key, ts_col)
        if not self._exists():
            winners.write.format("delta").save(self.path)
            return winners.count()
        (
            DeltaTable.forPath(self.spark, self.path)
            .alias("t")
            .merge(winners.alias("s"), f"t.`{key}` = s.`{key}`")
            .whenMatchedUpdateAll(condition=f"s.`{ts_col}` > t.`{ts_col}`")
            .whenNotMatchedInsertAll()
            .execute()
        )
        m = self._last_metrics()
        return int(m.get("numTargetRowsInserted", 0)) + int(
            m.get("numTargetRowsUpdated", 0)
        )
