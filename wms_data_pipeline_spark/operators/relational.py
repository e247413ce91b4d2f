"""Relational surface helpers (SURVEY §2.3).

Nearly everything in §2.3 IS the DataFrame API (join/groupBy/window/set ops)
— the engine deliberately adds no wrappers around what Catalyst already
plans. This module holds only the compositions Spark lacks as built-ins:
as-of join, deterministic top-k, and batch sessionization.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    tolerance: str | None = None,
    left_unique: list[str] | None = None,
) -> DataFrame:
    """As-of join: for each left row, the single most-recent right row with
    ``right_ts <= left_ts`` within the same key (left-outer: unmatched keep
    nulls). DuckDB/kdb ``ASOF JOIN`` equivalent.

    Implementation: equi-join on key + range predicate, then keep the max-ts
    right row per left row via one window pass. The equi-join shuffles both
    sides on the key, so skew on hot keys is handled by AQE skew-join. With a
    ``tolerance`` (e.g. ``"7 days"``) the range predicate becomes a band,
    which bounds the join fan-out — at 100 TB ALWAYS set a tolerance; an
    unbounded as-of against a long history multiplies every left row by its
    full key history before the window collapses it.
    """
    right_cols = right_cols or [c for c in right.columns if c not in (right_on,)]
    r = right.select(
        F.col(right_on).alias("__rkey"),
        F.col(right_ts).alias("__rts"),
        *[F.col(c) for c in right_cols if c != right_ts],
    )
    cond = (F.col(left_on) == F.col("__rkey")) & (F.col("__rts") <= F.col(left_ts))
    if tolerance is not None:
        cond = cond & (F.col("__rts") >= F.col(left_ts) - F.expr(f"INTERVAL {tolerance}"))
    joined = left.join(r, on=cond, how="left")
    # one survivor per left row: partition by the caller's unique key when
    # given (cheaper window state), else by the full left column set
    part = left_unique if left_unique else list(left.columns)
    w = Window.partitionBy(*[F.col(c) for c in part]).orderBy(
        F.col("__rts").desc_nulls_last()
    )
    out = joined.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1)
    return out.drop("__rn", "__rkey").withColumnRenamed("__rts", f"asof_{right_ts}")


def top_k(df: DataFrame, k: int, order: list[Column]) -> DataFrame:
    """Deterministic top-k — callers must include a unique tiebreaker in
    ``order``. Spark plans this as TakeOrderedAndProject (per-partition heap
    + single reduce), never a global sort."""
    return df.orderBy(*order).limit(k)


def sessionize(
    df: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
) -> DataFrame:
    """Batch sessionization: a new session starts when the gap from the
    previous event (same key) exceeds ``gap``. Returns the input plus a
    ``session_id`` (0-based per key). Streaming twin: ``session_window``
    (streaming/pipeline.py). One shuffle on ``key``."""
    w = Window.partitionBy(key).orderBy(ts_col)
    gap_expr = F.expr(f"INTERVAL {gap}")
    new_session = (
        F.col(ts_col).cast("timestamp") - F.lag(F.col(ts_col)).over(w) > gap_expr
    ).cast("long")
    return df.withColumn(
        "session_id",
        F.coalesce(F.sum(F.coalesce(new_session, F.lit(0))).over(w), F.lit(0)),
    )


def zorder_key(cols: list, bits: int = 16) -> Column:
    """Morton (Z-order) interleave of ``len(cols)`` non-negative integer
    columns, ``bits`` bits each, as one BIGINT sort key — the
    multi-dimensional clustering technique behind Delta/Iceberg's
    OPTIMIZE ZORDER (public method): sorting by the interleaved key
    places rows close in EVERY keyed dimension into the same file/row
    group, so min/max data skipping prunes scans filtered on ANY subset
    of the dimensions (a lexicographic sort only prunes the leading
    one).

    Values are masked to ``bits`` low bits (callers range-normalize
    first — e.g. bucketize or rank — when the domain exceeds 2^bits).
    The key is a pure JVM expression (shift/or chain inside whole-stage
    codegen, identical arithmetic in any SQL engine); bits*len(cols)
    must fit a BIGINT (<= 62)."""
    k = len(cols)
    if k < 1:
        raise ValueError("zorder_key needs at least one column")
    if bits * k > 62:
        raise ValueError(f"{k} cols x {bits} bits exceeds BIGINT range")
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    mask = (1 << bits) - 1
    key = F.lit(0).cast("long")
    for j, c in enumerate(cs):
        masked = c.cast("long").bitwiseAND(F.lit(mask))
        for b in range(bits):
            key = key.bitwiseOR(
                F.shiftleft(
                    F.shiftright(masked, b).bitwiseAND(F.lit(1)), b * k + j
                )
            )
    return key.cast("long")


def zorder_layout(df: DataFrame, cols: list, bits: int = 16) -> DataFrame:
    """Rewrite ``df`` into Z-order: range-partition then sort by the
    Morton key of ``cols`` so each output file covers a tight
    hyper-rectangle of the keyed dimensions. Use before a partitioned/
    bucketed write; pair with parquet min/max stats for data skipping.
    ``repartitionByRange`` samples the key distribution, so output
    files are balanced even when the key space is occupied unevenly."""
    keyed = df.withColumn("__zkey", zorder_key(cols, bits))
    n = max(df.sparkSession.sparkContext.defaultParallelism, 1)
    return (
        keyed.repartitionByRange(n, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
    )
