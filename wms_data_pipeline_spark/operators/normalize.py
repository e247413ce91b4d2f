"""Normalization transform chain (SURVEY §2.1 ops 6-12).

Reference behavior: services/extractor/app/normalize.py:29-67 —
JSON rows → typed frame with suffix-convention time parsing, required-column
validation, nested flatten, id cast, lineage columns, and keyed keep-last
dedup. Re-expressed as composable DataFrame transforms; ``normalize`` chains
them exactly like the reference's ``normalize_rows``.

Scale notes:
- All steps are narrow (per-row projections/filters) except the keyed dedup,
  which shuffles once on the dedup key — no global sort, unlike the
  reference's full stable mergesort (normalize.py:64).
- Validation uses ``limit(5)`` so a poisoned 100 TB batch fails after
  sampling, not after a full scan.
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Columns every normalized batch must carry, non-null
#: (reference normalize.py:46-55; reader re-check reader_landing.py:17-20).
REQUIRED_COLS = ("id", "updated_at")

#: Lineage metadata prefix — excluded from payload (reference payload.py:14).
META_PREFIX = "_"


def parse_time_suffixed(df: DataFrame) -> DataFrame:
    """Op 7: convention-based typing — ``*_at`` → UTC timestamp, ``*_date``
    → date. Unparseable values coerce to null, not error (reference
    normalize.py:11-18 uses pandas ``errors="coerce"``; Spark's
    ``to_timestamp``/``to_date`` null out bad input under the default
    non-ANSI mode, which this engine relies on)."""
    out = df
    for name, dtype in df.dtypes:
        if name.endswith("_at") and dtype == "string":
            # try_to_timestamp, not to_timestamp: Spark 4 runs ANSI mode by
            # default, where malformed input errors instead of nulling.
            out = out.withColumn(name, F.try_to_timestamp(F.col(name)))
        elif name.endswith("_date") and dtype == "string":
            out = out.withColumn(name, F.col(name).try_cast("date"))
    return out


def validate_required(df: DataFrame, cols: tuple[str, ...] = REQUIRED_COLS) -> DataFrame:
    """Op 8: raise if a required column is missing, or if any row has a null
    in one (error carries a sample of ≤5 offending rows, like reference
    normalize.py:46-55)."""
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"required columns missing: {missing}")
    predicate = None
    for c in cols:
        cond = F.col(c).isNull()
        predicate = cond if predicate is None else (predicate | cond)
    bad = df.filter(predicate).limit(5).collect()
    if bad:
        raise ValueError(f"null values in required columns {list(cols)}; sample: {bad}")
    return df


def flatten_nested(df: DataFrame, col: str = "lines", keep_typed: bool = False) -> DataFrame:
    """Op 9: nested ``lines`` array → ``lines_json`` string (reference
    normalize.py:20-27 stringifies because pandas/Postgres handle nested
    poorly). With ``keep_typed=True`` the typed ArrayType column is retained
    alongside — the Spark-native design, enabling ``explode`` to line grain."""
    if col not in df.columns:
        return df
    out = df.withColumn(f"{col}_json", F.to_json(F.col(col)))
    return out if keep_typed else out.drop(col)


def explode_lines(df: DataFrame, col: str = "lines", header_cols: list[str] | None = None) -> DataFrame:
    """Line-grain view: one row per line item, header key columns carried.
    The Spark-first alternative to the reference's lines_json stringification."""
    header_cols = header_cols or [c for c in df.columns if c != col]
    return df.select(*header_cols, F.explode_outer(col).alias("line")).select(
        *header_cols, "line.*"
    )


def cast_id_string(df: DataFrame, col: str = "id") -> DataFrame:
    """Op 10 (reference normalize.py:58)."""
    return df.withColumn(col, F.col(col).cast("string"))


def with_lineage(
    df: DataFrame,
    run_id: str,
    extracted_at: datetime,
    watermark_effective: datetime | None,
) -> DataFrame:
    """Op 11: constant lineage metadata columns (reference normalize.py:60-62).
    Naive datetimes are interpreted as UTC (reference _to_utc normalize.py:6-9)."""

    def _utc(ts: datetime | None) -> datetime | None:
        if ts is None:
            return None
        return ts.replace(tzinfo=timezone.utc) if ts.tzinfo is None else ts.astimezone(timezone.utc)

    return (
        df.withColumn("_run_id", F.lit(run_id))
        .withColumn("_extracted_at", F.lit(_utc(extracted_at)).cast("timestamp"))
        .withColumn("_watermark_effective", F.lit(_utc(watermark_effective)).cast("timestamp"))
    )


def with_arrival_seq(df: DataFrame, col: str = "_arrival_seq") -> DataFrame:
    """Spark has no implicit arrival order, so "keep last fetched" needs an
    explicit tiebreaker (SURVEY §7.3 hard part 2). At the REST source the
    page offset is the real sequence (sources/rest.py threads it, and we
    keep it); for already-materialized input this monotonic id preserves
    file/row order."""
    if col in df.columns:
        return df
    return df.withColumn(col, F.monotonically_increasing_id())


def dedup_keep_last(
    df: DataFrame,
    keys: tuple[str, ...] = ("id", "updated_at"),
    arrival_col: str | None = "_arrival_seq",
    tiebreak_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Op 12: keyed dedup, keep-last-arrival (reference normalize.py:64-65 —
    stable sort + ``drop_duplicates(keep="last")``).

    Shuffles once on ``keys`` (window partition), no global sort. The
    later-arrived row (max ``arrival_col``) wins among byte-different rows
    sharing the key; extra ``tiebreak_cols`` make the result deterministic
    when no arrival sequence exists."""
    order = []
    if arrival_col and arrival_col in df.columns:
        order.append(F.col(arrival_col).desc())
    for c in tiebreak_cols:
        order.append(F.col(c).desc())
    if not order:  # non-deterministic fallback, documented divergence
        return df.dropDuplicates(list(keys))
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")
    )


def assert_nondecreasing(
    df: DataFrame, order_cols: tuple[str, ...] = ("updated_at", "id")
) -> DataFrame:
    """Op 5 as a DQ check: verify the batch is globally orderable without
    violations — i.e. count rows where the previous row under the declared
    order compares greater. Always 0 by construction on a set-semantics
    engine; kept for parity with the reference's page-order assertion
    (extract.py:17-27)."""
    w = Window.orderBy(*[F.col(c) for c in order_cols])
    violations = (
        df.withColumn("__prev", F.lag(F.struct(*order_cols)).over(w))
        .filter(F.col("__prev") > F.struct(*order_cols))
        .count()
    )
    if violations:
        raise AssertionError(f"{violations} stable-order violations on {order_cols}")
    return df


def normalize(
    df: DataFrame,
    run_id: str,
    extracted_at: datetime,
    watermark_effective: datetime | None = None,
    required: tuple[str, ...] = REQUIRED_COLS,
    keep_typed_lines: bool = False,
) -> DataFrame:
    """Op 6: the composite transform (reference normalize_rows,
    normalize.py:29-67). Empty input stays an empty DataFrame with the full
    normalized schema."""
    out = with_arrival_seq(df)
    out = parse_time_suffixed(out)
    out = validate_required(out, required)
    out = flatten_nested(out, keep_typed=keep_typed_lines)
    out = cast_id_string(out)
    out = with_lineage(out, run_id, extracted_at, watermark_effective)
    out = dedup_keep_last(out)
    return out.drop("_arrival_seq")


#: Safe widening casts (no precision or range loss) — the only automatic
#: type changes conform_schema performs. Mirrors Spark's ANSI up-cast
#: matrix for the types the pipeline uses: long→double and int→float are
#: deliberately ABSENT (both lose precision past 2^53 / 2^24).
_WIDENINGS = {
    ("tinyint", "smallint"), ("tinyint", "int"), ("tinyint", "bigint"),
    ("tinyint", "float"), ("tinyint", "double"),
    ("smallint", "int"), ("smallint", "bigint"),
    ("smallint", "float"), ("smallint", "double"),
    ("int", "bigint"), ("int", "double"),
    ("float", "double"),
}


def conform_schema(
    df: DataFrame, target_ddl: str, on_extra: str = "drop"
) -> DataFrame:
    """Schema-evolution adapter: conform an upstream batch to a target
    schema the way a long-lived pipeline absorbs source drift.

    - columns MISSING from the batch are added as typed nulls (a source
      that stopped sending a field must not break history appends);
    - columns whose type safely WIDENS (int→bigint, float→double, …,
      per ``_WIDENINGS``) are cast — lossless by construction;
    - any NARROWING or incompatible type change raises with the full
      list (silent truncation is how bad data outlives its bug);
    - EXTRA columns are dropped (``on_extra="drop"``, the
      forward-compatible default) or rejected (``on_extra="error"``);
    - output column order follows the target, so downstream
      positional writers (CSV, JDBC batch inserts) stay stable.

    Complements ``sources.landing.check_contract`` (which VERIFIES a
    frame against a contract and refuses): conform ADAPTS the frame
    where adaptation is lossless, and refuses everywhere else. All
    adaptations are narrow per-row projections — no shuffle, no scan."""
    from pyspark.sql.types import StructType

    target = StructType.fromDDL(target_ddl)
    have = dict(df.dtypes)
    incompatible: list[str] = []
    extras = [c for c in df.columns if c not in {f.name for f in target.fields}]
    if extras and on_extra == "error":
        raise ValueError(f"unexpected columns not in target schema: {extras}")
    if on_extra not in ("drop", "error"):
        raise ValueError(f"on_extra must be 'drop' or 'error', got {on_extra!r}")
    cols = []
    for field in target.fields:
        want = field.dataType.simpleString()
        if field.name not in have:
            cols.append(F.lit(None).cast(field.dataType).alias(field.name))
            continue
        got = have[field.name]
        if got == want:
            cols.append(F.col(field.name))
        elif (got, want) in _WIDENINGS:
            cols.append(F.col(field.name).cast(field.dataType).alias(field.name))
        else:
            incompatible.append(f"{field.name}: {got} -> {want}")
    if incompatible:
        raise ValueError(
            "incompatible schema changes (narrowing or type rewrite): "
            + "; ".join(incompatible)
        )
    return df.select(*cols)
