"""Incremental rollup — continuously-maintained aggregate tables.

The warehouse pattern the reference's latest-state table implies but never
builds: keep per-key aggregates (counts, sums, min/max event time) current
as batches arrive, WITHOUT rescanning history. Each batch is aggregated
alone (map-side partial agg), then merged into the stored rollup by
re-aggregation — the same algebraic-aggregate decomposition Spark uses
internally for partial/final aggregation, applied across time instead of
across partitions.

``incremental_rollup`` is the pure merge; ``RollupTable`` persists it via
ParquetTable. Streaming twin: call it from ``foreachBatch``. Cost per batch
scales with batch keys, not table size (the merge joins on the key — use
PartitionedMergeTable-style bucketing when the rollup itself is huge).
Avg/variance re-aggregate from (sum, count) / (sum, sum², count) — declare
those base aggregates and derive the ratios at read time.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wms_data_pipeline_spark.operators.merge import ParquetTable

#: output column → (aggregate fn over the batch, re-aggregate fn for merge)
ALGEBRAIC = {
    "sum": ("sum", "sum"),
    "count": ("count", "sum"),
    "min": ("min", "min"),
    "max": ("max", "max"),
}


def batch_rollup(batch: DataFrame, keys: Sequence[str], aggs: dict[str, str]) -> DataFrame:
    """Aggregate one batch: ``aggs`` maps output column → ``"fn(input)"``
    with fn ∈ sum|count|min|max."""
    exprs = []
    for out, spec in aggs.items():
        fn, _, arg = spec.partition("(")
        fn = fn.strip().lower()
        arg = arg.rstrip(")")
        if fn not in ALGEBRAIC:
            raise ValueError(f"non-algebraic aggregate: {spec}")
        exprs.append(F.expr(f"{fn}({arg})").alias(out))
    return batch.groupBy(*keys).agg(*exprs)


def incremental_rollup(
    existing: DataFrame | None,
    batch: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, str],
) -> DataFrame:
    """Merge a batch into the stored rollup by re-aggregation."""
    delta = batch_rollup(batch, keys, aggs)
    if existing is None:
        return delta
    merged = existing.unionByName(delta)
    exprs = []
    for out, spec in aggs.items():
        fn = spec.partition("(")[0].strip().lower()
        refn = ALGEBRAIC[fn][1]
        exprs.append(F.expr(f"{refn}({out})").alias(out))
    return merged.groupBy(*keys).agg(*exprs)


class RollupTable:
    """Persisted continuously-maintained aggregate (parquet-backed)."""

    def __init__(self, spark, root: str, keys: Sequence[str], aggs: dict[str, str]):
        self.table = ParquetTable(spark, root)
        self.keys = list(keys)
        self.aggs = dict(aggs)

    def apply_batch(self, batch: DataFrame) -> DataFrame:
        merged = incremental_rollup(self.table.read(), batch, self.keys, self.aggs)
        merged = merged.localCheckpoint()
        self.table._publish(merged)
        return merged

    def read(self) -> DataFrame | None:
        return self.table.read()
