"""Skew mitigation & co-location primitives (SURVEY §2.3 / BASELINE
north-star: "partitioning & shuffle … salting for skew, bucketing for
co-located joins").

AQE's skew-join split (on in session.py) handles most runtime skew; these
are the explicit tools for the cases AQE can't fix:

- ``salted_agg`` — two-phase aggregation for hot grouping keys: partial agg
  on (key, salt) spreads one hot key over N reducers, final agg merges.
  Works for any algebraic aggregate (sum/count/min/max expressed as
  re-aggregable pairs).
- ``salted_broadcast_join`` — replicate the (small) build side N× and salt
  the probe side, so one hot probe key fans across N tasks while staying a
  broadcast join (no shuffle at all).
- ``write_bucketed`` / ``read_bucketed`` — persist a table bucketed on its
  join key; two tables bucketed the same way join with ZERO exchange (the
  co-located join). At 100 TB this is how the fact-to-fact join avoids
  re-shuffling the lake every query. Verified by plan inspection in
  tests/test_skew_bucketing.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_SALT = 16


def with_salt(df: DataFrame, buckets: int = DEFAULT_SALT, col: str = "__salt") -> DataFrame:
    """Uniform random-ish salt derived from a cheap per-row hash (spark
    partition id + monotonic id would also do; rand() is fine because the
    salt never needs to be reproducible)."""
    return df.withColumn(col, (F.rand(seed=7) * buckets).cast("int"))


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, str],
    buckets: int = DEFAULT_SALT,
) -> DataFrame:
    """Two-phase skew-safe aggregation. ``aggs`` maps output column →
    ``"fn(input)"`` where fn ∈ {sum, count, min, max}.

    Phase 1 groups by (keys, salt) — map-side combine already shrinks each
    partition, and the salt splits a hot key across ``buckets`` reducers.
    Phase 2 re-aggregates the partials (count re-aggregates as sum).
    """
    partial_exprs = []
    final_exprs = []
    for out, spec in aggs.items():
        fn, _, arg = spec.partition("(")
        arg = arg.rstrip(")")
        fn = fn.strip().lower()
        if fn not in ("sum", "count", "min", "max"):
            raise ValueError(f"non-algebraic aggregate not supported: {spec}")
        partial_exprs.append(F.expr(f"{fn}({arg})").alias(f"__p_{out}"))
        refn = "sum" if fn == "count" else fn
        final_exprs.append(F.expr(f"{refn}(__p_{out})").alias(out))
    salted = with_salt(df, buckets)
    partial = salted.groupBy(*keys, "__salt").agg(*partial_exprs)
    return partial.groupBy(*keys).agg(*final_exprs)


def salted_broadcast_join(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    buckets: int = DEFAULT_SALT,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof join: salt the probe side, explode the build side ×
    ``buckets``, broadcast it, join on (key, salt). Build side must be
    broadcast-small (× buckets)."""
    salted_probe = with_salt(probe, buckets)
    replicated = build.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    ).withColumn("__salt", F.col("__salt").cast("int"))
    out = salted_probe.join(F.broadcast(replicated), on=[on, "__salt"], how=how)
    return out.drop("__salt")


def salted_latest(
    df: DataFrame,
    key: str,
    ts_col: str,
    tiebreak_col: str | None = None,
    buckets: int = DEFAULT_SALT,
) -> DataFrame:
    """Skew-safe newer-wins latest state: the algebraic twin of
    ``merge.latest_merge`` for hot keys.

    The window form (``row_number over partitionBy(key) orderBy(ts
    desc)``) sends EVERY row of a key to one task — a 50%-hot key at 50M
    rows means one 25M-row sort while 31 cores idle, and windows have no
    map-side partial step for AQE to split. This form re-expresses
    "newest row per key" as ``max(struct(ts, tiebreak, rest…))``, which
    IS algebraic: phase 1 reduces each (key, salt) group map-side, so the
    hot key arrives at the final aggregation as ``buckets`` one-row
    partials. Same winner as the window (struct comparison is
    lexicographic = orderBy ts desc, tiebreak desc; on a full tie across
    ts+tiebreak the struct max picks the lexicographically largest
    remaining payload, deterministically — the window's tie there is
    partition-order-dependent, so callers already pass a discriminating
    tiebreak).
    """
    order_cols = [ts_col] + ([tiebreak_col] if tiebreak_col else [])
    rest = [c for c in df.columns if c != key and c not in order_cols]
    packed = F.struct(*[F.col(c) for c in order_cols + rest])
    salted = with_salt(df, buckets)
    partial = salted.groupBy(key, "__salt").agg(F.max(packed).alias("__m"))
    final = partial.groupBy(key).agg(F.max("__m").alias("__m"))
    return final.select(key, *[F.col(f"__m.{c}").alias(c) for c in order_cols + rest])


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort_col: str | None = None,
) -> None:
    """Persist as a bucketed managed table (co-located join layout)."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
