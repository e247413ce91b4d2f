"""End-to-end pipeline entry points (SURVEY §3).

Entry point A — extractor run (reference services/extractor/app/run.py:15-93):
    fetch (REST) → normalize → landing write → watermark advance.
Entry point B — staging run (reference services/staging/app/run.py:28-99):
    read landing → payload/hash → history merge → latest merge → run log.

All boundaries are Spark I/O; failure ordering preserved from the reference:
landing is written strictly before the watermark advances (rerun-safe: sinks
are idempotent, watermark only moves on success), and the staging run log
records failure with the error text on any exception.
"""

from __future__ import annotations

import uuid
from dataclasses import dataclass, field
from datetime import datetime, timezone
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from wms_data_pipeline_spark.control.runlog import RunLog
from wms_data_pipeline_spark.control.watermark import (
    WatermarkStore,
    compute_new_watermark,
)
from wms_data_pipeline_spark.operators.incremental import (
    DEFAULT_LOOKBACK_SECONDS,
    effective_watermark,
)
from wms_data_pipeline_spark.operators.merge import ParquetTable
from wms_data_pipeline_spark.operators.normalize import normalize
from wms_data_pipeline_spark.operators.payload import with_payload_and_hash
from wms_data_pipeline_spark.schemas import ENTITY_RAW_SCHEMAS
from wms_data_pipeline_spark.sources.landing import read_landing, write_landing
from wms_data_pipeline_spark.sources.rest import fetch_all


@dataclass
class ExtractResult:
    entity: str
    run_id: str
    rows: int
    landing_path: str | None
    new_watermark: datetime


def extractor_run(
    spark: SparkSession,
    base_url: str,
    entities: list[str],
    landing_root: str,
    control_root: str,
    pipeline_name: str = "wms_extract",
    lookback_seconds: int = DEFAULT_LOOKBACK_SECONDS,
    limit: int = 500,
    getter: Callable[..., Any] | None = None,
    output_format: str = "parquet",
) -> list[ExtractResult]:
    """Entry point A. One run_id + extracted_at for the whole run
    (reference run.py:20-21); per entity: watermark − lookback → fetch →
    normalize → landing → watermark GREATEST-merge."""
    run_id = uuid.uuid4().hex
    extracted_at = datetime.now(timezone.utc)
    wm_store = WatermarkStore(spark, f"{control_root}/etl_watermark")
    results: list[ExtractResult] = []
    for entity in entities:
        saved = wm_store.get(pipeline_name, entity)
        wm_eff = effective_watermark(saved, lookback_seconds)
        kwargs = {"getter": getter} if getter is not None else {}
        rows = fetch_all(
            base_url, entity, updated_after=wm_eff.isoformat(), limit=limit, **kwargs
        )
        schema = ENTITY_RAW_SCHEMAS.get(entity)
        if schema is not None:
            # fetch_all threads _arrival_seq (page × row order) through every
            # row — extend the declared schema rather than mutating it.
            full_schema = StructType(
                schema.fields + [StructField("_arrival_seq", LongType())]
            )
            raw = spark.createDataFrame(rows, full_schema)
        elif rows:
            raw = spark.createDataFrame(rows)
        else:
            # no rows and no declared schema: nothing to land; carry forward
            wm_store.upsert(pipeline_name, entity, saved, run_id)
            results.append(ExtractResult(entity, run_id, 0, None, saved))
            continue
        batch = normalize(raw, run_id, extracted_at, wm_eff)
        path = write_landing(batch, landing_root, entity, run_id, output_format)
        max_ts = batch.agg(F.max("updated_at")).collect()[0][0]
        new_wm = compute_new_watermark(max_ts, saved)
        wm_store.upsert(pipeline_name, entity, new_wm, run_id)
        results.append(ExtractResult(entity, run_id, batch.count(), path, new_wm))
    return results


@dataclass
class StagingResult:
    entity: str
    run_id: str
    rows_in: int
    inserted_history: int
    upserted_latest: int
    status: str
    error: str | None = None


def staging_run(
    spark: SparkSession,
    landing_root: str,
    warehouse_root: str,
    entity: str,
    run_id: str,
    pipeline_name: str = "wms_staging",
    partitioned: bool = False,
    n_buckets: int = 64,
) -> StagingResult:
    """Entry point B. Counts come from the merge sinks (the reference's
    executemany rowcounts, staging run.py:68-86); one terminal run-log state
    (the reference's empty-batch double-finish quirk is not reproduced).

    ``partitioned=True`` switches both sinks to the bucket-pruned
    PartitionedMergeTable — the layout for histories that dwarf each batch
    (SCALE_NOTES.md)."""
    runlog = RunLog(spark, f"{warehouse_root}/pipeline_run_log")
    runlog.start(run_id, pipeline_name, entity)
    try:
        df = read_landing(spark, landing_root, entity, run_id)
        rows_in = df.count()
        if rows_in == 0:
            runlog.finish_success(run_id, 0, 0, 0)
            return StagingResult(entity, run_id, 0, 0, 0, "success")
        staged = with_payload_and_hash(df)
        if partitioned:
            from wms_data_pipeline_spark.operators.merge_partitioned import (
                PartitionedMergeTable,
            )

            history = PartitionedMergeTable(
                spark, f"{warehouse_root}/stg_{entity}_history", n_buckets=n_buckets
            )
            latest = PartitionedMergeTable(
                spark, f"{warehouse_root}/stg_{entity}", n_buckets=n_buckets
            )
        else:
            history = ParquetTable(spark, f"{warehouse_root}/stg_{entity}_history")
            latest = ParquetTable(spark, f"{warehouse_root}/stg_{entity}")
        n_hist = history.append_history(staged)
        n_latest = latest.upsert_latest(staged)
        runlog.finish_success(run_id, rows_in, n_hist, n_latest)
        return StagingResult(entity, run_id, rows_in, n_hist, n_latest, "success")
    except Exception as e:  # noqa: BLE001 - reference catches everything too
        runlog.finish_failed(run_id, f"{type(e).__name__}: {e}")
        return StagingResult(entity, run_id, 0, 0, 0, "failed", error=str(e))


def orchestrated_run(
    spark: SparkSession,
    base_url: str,
    landing_root: str,
    control_root: str,
    warehouse_root: str,
    entities: list[str] | None = None,
    partitioned: bool = False,
    **extract_kwargs: Any,
) -> list[tuple[ExtractResult, StagingResult | None]]:
    """The DAG analogue (reference: Airflow in docker-compose.yaml:94-116):
    one extractor run over all entities, then a staging run PER ENTITY with
    the extractor's run_id forwarded — the reference's orchestration
    contract, where the scheduler passes the extract task's run_id to each
    staging task (staging run.py:20-25 requires it on the CLI).

    Per-entity isolation mirrors independent DAG branches: one entity's
    staging failure is recorded in its run log and returned as a failed
    StagingResult without aborting the other entities. A zero-row extract
    for a declared entity still lands an empty batch and stages it (run log
    records success/0 — same as the reference's empty staging run); only an
    entity with NO landing dir for the run (undeclared schema, no rows)
    skips staging and reports ``None``.

    Rerun-safe end-to-end: landing writes are idempotent per (entity,
    run_id), the watermark only advances on success, and both merge sinks
    are conflict-deduped, so re-invoking after a crash (same or new run_id)
    never duplicates warehouse rows.
    """
    if entities is None:
        entities = sorted(ENTITY_RAW_SCHEMAS)
    extracts = extractor_run(
        spark, base_url, entities, landing_root, control_root, **extract_kwargs
    )
    out: list[tuple[ExtractResult, StagingResult | None]] = []
    for ex in extracts:
        if ex.landing_path is None:
            out.append((ex, None))
            continue
        st = staging_run(
            spark,
            landing_root,
            warehouse_root,
            ex.entity,
            ex.run_id,
            partitioned=partitioned,
        )
        out.append((ex, st))
    return out
