"""Incremental-scan predicates (SURVEY §2.1 ops 3-4; §2.2 lookback).

Reference: the mock API evaluates ``updated_at > updated_after`` server-side
(main.py:227-228, 246-247) and the extractor subtracts a lookback window from
the saved watermark before querying (run.py:26-27, 120 s default
config.py:39). In Spark the same predicate is a plain filter that Catalyst
pushes into the parquet/JDBC/REST scan — at 100 TB this is THE difference
between reading a day and reading the lake.
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_LOOKBACK_SECONDS = 120  # reference config.py:39


def effective_watermark(saved: datetime, lookback_seconds: int = DEFAULT_LOOKBACK_SECONDS) -> datetime:
    """Late/out-of-order tolerance: re-read a deliberate overlap
    (reference run.py:26-27). Overlap rows collapse downstream in the
    idempotent sinks (operators/merge.py)."""
    if saved.tzinfo is None:
        saved = saved.replace(tzinfo=timezone.utc)
    return saved - timedelta(seconds=lookback_seconds)


def incremental_filter(
    df: DataFrame, watermark: datetime | str, ts_col: str = "updated_at"
) -> DataFrame:
    """Op 3: strict ``ts > watermark`` (strictness pinned by the reference's
    server filter main.py:227-228). Expressed declaratively so Catalyst
    pushes it to the source (verify via ``.explain``: PushedFilters on the
    parquet scan)."""
    return df.filter(F.col(ts_col) > F.lit(watermark).cast("timestamp"))


def stable_order(df: DataFrame, ts_col: str = "updated_at", key_col: str = "id") -> DataFrame:
    """Op 4: the reference's deterministic paging order (main.py:224). Only
    needed when reproducing API output; in-engine consumers rely on set
    semantics instead."""
    return df.orderBy(ts_col, key_col)
