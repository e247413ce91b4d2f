"""Per-batch quality-audit control table (verdict r10 task 6).

The reference records run-level ROW counts per pipeline run
(services/staging/app/pipeline_run_logs_repo.py:7-71: rows_in,
rows_inserted_history, rows_upserted_latest). This generalizes that
control-plane idea to QUALITY metrics: each micro-batch appends long-form
audit rows — expectation violation counts (``expectations_report``) and
distribution-drift statistics against a persisted reference
(``psi_drift_probe``) — to a merge-deduped parquet control table, so a
monitoring system reads one table for "did batch 17 look healthy".

Idempotence: rows key on (batch_id, kind, key, metric) and land through
``ParquetTable.append_history`` — a foreachBatch RETRY of the same batch
re-derives the same keys and collapses, exactly like the reference's
lookback re-read collapsing in the PK sinks. The wall-clock ``audited_at``
column is informational only (first write wins; retries keep it stable).

At 100 TB the audit costs what its parts cost: expectations are one
conditional aggregate over the batch (never a second scan), the PSI probe
is one pass over the batch against a broadcast-sized frozen histogram
(SCALE_NOTES r11) — the reference population is never rescanned inside a
streaming trigger.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from wms_data_pipeline_spark.operators.merge import ParquetTable
from wms_data_pipeline_spark.operators.quality import (
    chi2_drift_probe,
    embedding_drift_probe,
    expectations_report,
    psi_drift_probe,
)

#: One audit fact per row. ``kind`` names the audit family, ``key`` the
#: rule or group within it, ``metric`` the measure; ``n_rows`` carries the
#: population the value was computed over (batch rows for expectations,
#: current-population rows for drift).
AUDIT_SCHEMA = StructType(
    [
        StructField("batch_id", LongType(), False),
        StructField("entity", StringType(), False),
        StructField("kind", StringType(), False),
        StructField("key", StringType(), False),
        StructField("metric", StringType(), False),
        StructField("value", DoubleType()),
        StructField("n_rows", LongType()),
        StructField("audited_at", TimestampType()),
    ]
)

#: Identity of an audit fact — the append_history dedup key that makes
#: retried foreachBatch invocations exactly-once in the control table.
AUDIT_KEY = ("batch_id", "kind", "key", "metric")


class QualityAuditLog:
    """Append-only (merge-deduped) audit control table."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.table = ParquetTable(spark, root)

    def append(self, rows: DataFrame) -> int:
        return self.table.append_history(rows, key=AUDIT_KEY)

    def read(self) -> DataFrame | None:
        return self.table.read()


def audit_batch(
    batch: DataFrame,
    batch_id: int,
    entity: str,
    expectations: "dict[str, Column] | None" = None,
    drift: "tuple[str, str, str] | None" = None,
    drift_cat: "tuple[str, str] | None" = None,
    drift_emb: "tuple[str, str] | None" = None,
) -> DataFrame:
    """Long-form audit rows for one micro-batch: expectation results,
    a PSI drift probe, a categorical chi-square drift probe and/or an
    embedding-centroid drift probe, unioned into ``AUDIT_SCHEMA``.
    ``drift`` is (group_col, value_col, reference_histogram_path) from
    ``psi_reference_write``; ``drift_cat`` is (cat_col,
    reference_counts_path) from ``chi2_reference_write`` — the chi2
    statistic lands as kind='chi2_drift', key=cat_col, with 'chi2' and
    'n_categories' metric rows; ``drift_emb`` is (vec_col,
    reference_means_path) from ``embedding_reference_write`` — three
    kind='embedding_drift' metric rows (centroid_cosine, mean_gap_l2,
    max_dim_gap)."""
    if (
        expectations is None
        and drift is None
        and drift_cat is None
        and drift_emb is None
    ):
        raise ValueError("audit_batch: nothing to audit (no expectations, no drift)")
    tag = [
        F.lit(batch_id).cast("long").alias("batch_id"),
        F.lit(entity).alias("entity"),
    ]
    parts = []
    if expectations:
        rep = expectations_report(batch, expectations)
        parts.append(
            rep.select(
                *tag,
                F.lit("expectation").alias("kind"),
                F.col("rule").alias("key"),
                F.lit("n_violations").alias("metric"),
                F.col("n_violations").cast("double").alias("value"),
                F.col("n_rows").cast("long").alias("n_rows"),
            )
        )
    if drift:
        group_col, value_col, ref_path = drift
        psi = psi_drift_probe(batch, group_col, value_col, ref_path)
        parts.append(
            psi.select(
                *tag,
                F.lit("psi_drift").alias("kind"),
                F.col(group_col).cast("string").alias("key"),
                F.lit("psi").alias("metric"),
                F.col("psi").cast("double").alias("value"),
                F.col("n_cur").cast("long").alias("n_rows"),
            )
        )
    if drift_cat:
        cat_col, ref_path = drift_cat
        chi2 = chi2_drift_probe(batch, cat_col, ref_path)
        for metric in ("chi2", "n_categories"):
            parts.append(
                chi2.select(
                    *tag,
                    F.lit("chi2_drift").alias("kind"),
                    F.lit(cat_col).alias("key"),
                    F.lit(metric).alias("metric"),
                    F.col(metric).cast("double").alias("value"),
                    F.col("n_cur").cast("long").alias("n_rows"),
                )
            )
    if drift_emb:
        vec_col, ref_path = drift_emb
        emb = embedding_drift_probe(batch, vec_col, ref_path)
        for metric in ("centroid_cosine", "mean_gap_l2", "max_dim_gap"):
            parts.append(
                emb.select(
                    *tag,
                    F.lit("embedding_drift").alias("kind"),
                    F.lit(vec_col).alias("key"),
                    F.lit(metric).alias("metric"),
                    F.col(metric).cast("double").alias("value"),
                    F.col("n_cur").cast("long").alias("n_rows"),
                )
            )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.withColumn("audited_at", F.current_timestamp())
