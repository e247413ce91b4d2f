"""Data-quality expectations (generalizing SURVEY op 8).

The reference hand-codes one check (id/updated_at non-null with a 5-row
sample, normalize.py:46-55). This operator generalizes it: declare named
boolean expectations, evaluate them ALL in one pass (a single aggregate of
conditional counts — no per-check scans), then either raise with per-check
violation counts + a bounded row sample, or return the metrics.

At 100 TB the one-pass property is the whole point: N expectations cost one
scan, and the sample is `limit(k)` — never a full materialization.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


@dataclass
class ExpectationResult:
    total_rows: int
    violations: dict[str, int]

    @property
    def passed(self) -> bool:
        return all(v == 0 for v in self.violations.values())


def check_expectations(
    df: DataFrame,
    expectations: dict[str, Column],
    raise_on_failure: bool = True,
    sample_rows: int = 5,
) -> ExpectationResult:
    """``expectations`` maps name → boolean Column that must hold per row.
    Nulls count as violations (SQL three-valued logic is coerced)."""
    agg_exprs = [F.count(F.lit(1)).alias("__total")] + [
        F.sum(
            F.when(F.coalesce(cond.cast("boolean"), F.lit(False)), 0).otherwise(1)
        ).alias(f"__v_{name}")
        for name, cond in expectations.items()
    ]
    row = df.agg(*agg_exprs).collect()[0]
    result = ExpectationResult(
        total_rows=row["__total"] or 0,
        violations={name: int(row[f"__v_{name}"] or 0) for name in expectations},
    )
    if raise_on_failure and not result.passed:
        failed = {n: c for n, c in result.violations.items() if c}
        worst = next(iter(failed))
        sample = (
            df.filter(
                ~F.coalesce(expectations[worst].cast("boolean"), F.lit(False))
            )
            .limit(sample_rows)
            .collect()
        )
        raise ValueError(
            f"data-quality expectations failed: {failed} "
            f"(of {result.total_rows} rows); sample[{worst}]: {sample}"
        )
    return result


def not_null(*cols: str) -> dict[str, Column]:
    """The reference's contract (op 8) as expectations."""
    return {f"{c}_not_null": F.col(c).isNotNull() for c in cols}


def accepted_values(col: str, values) -> dict[str, Column]:
    """dbt-style accepted_values test: the column must be one of
    ``values`` (null = violation, per check_expectations coercion)."""
    return {f"{col}_domain": F.col(col).isin(list(values))}


def in_range(col: str, lo, hi) -> dict[str, Column]:
    """Closed-interval range test (null = violation)."""
    return {f"{col}_range": F.col(col).between(lo, hi)}


def expectations_report(
    df: DataFrame, expectations: dict[str, Column]
) -> DataFrame:
    """``check_expectations`` as a LAZY long-form DataFrame — (rule,
    n_rows, n_violations), one row per expectation — for pipelines that
    persist audit metrics instead of raising. Same one-scan property:
    a single conditional aggregate, unpivoted with ``stack`` (rows =
    len(expectations), never data-sized); no driver collect. On an
    empty input every rule reports 0 violations over 0 rows (``sum``
    over zero rows is NULL — coalesced here so persisted audit tables
    never carry NULL counts)."""
    if not expectations:
        raise ValueError("expectations_report: no expectations given")
    agg = df.agg(
        F.count(F.lit(1)).alias("__n"),
        *[
            F.coalesce(
                F.sum(
                    F.when(
                        F.coalesce(cond.cast("boolean"), F.lit(False)), 0
                    ).otherwise(1)
                ),
                F.lit(0),
            )
            .cast("long")
            .alias(name)
            for name, cond in expectations.items()
        ],
    )
    pairs = ", ".join(f"'{n}', `{n}`" for n in expectations)
    return agg.select(
        F.expr(
            f"stack({len(expectations)}, {pairs}) AS (rule, n_violations)"
        ),
        F.coalesce(F.col("__n"), F.lit(0)).cast("long").alias("n_rows"),
    ).select("rule", "n_rows", "n_violations")


def iqr_outliers(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """Exact distributed IQR (Tukey-fence) outlier screen per group over
    an INTEGER value column: (group, n, q1, q3, n_outliers) where
    q1/q3 are the exact lower discrete quartiles (the smallest value
    whose cumulative count reaches 1/4 resp. 3/4 of the group — the
    ``weighted_median`` rank rule at the quarter points, integer
    comparisons only) and an outlier is a value outside
    [q1 - 1.5*IQR, q3 + 1.5*IQR]. The half-steps never materialize:
    the fences are compared as ``2*v < 5*q1 - 3*q3`` /
    ``2*v > 5*q3 - 3*q1`` — pure BIGINT, no FP anywhere, bit-identical
    on any engine/partitioning (what approx_percentile-based screens
    cannot promise). Complements the MAD screen
    (evt_robust_anomaly_mad) with the boxplot-standard fence.

    Cost: one (group, value) count aggregate, then ONE partition-by-group
    exchange carries everything else — the running-count window, the
    fence computation (``min(CASE …) OVER (PARTITION BY g)`` on the same
    partitioning — no join, no second subtree), and the final per-group
    reduce, which reuses the partitioning with no further exchange. Two
    exchanges total, both over DISTINCT values per group, never raw
    rows. NULL values are excluded (they are a completeness defect, not
    an outlier — ``null_profile`` counts them)."""
    v = df.filter(F.col(value_col).isNotNull()).select(
        F.col(group_col).alias("_g"), F.col(value_col).cast("long").alias("_v")
    )
    c = v.groupBy("_g", "_v").agg(F.count(F.lit(1)).alias("_c"))
    w_cum = (
        Window.partitionBy("_g")
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("_g").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = c.withColumn("_cum", F.sum("_c").over(w_cum)).withColumn(
        "_n", F.sum("_c").over(w_all)
    )
    fenced = ranked.withColumn(
        "_q1",
        F.min(
            F.when(F.col("_cum") * 4 >= F.col("_n"), F.col("_v"))
        ).over(w_all),
    ).withColumn(
        "_q3",
        F.min(
            F.when(F.col("_cum") * 4 >= F.col("_n") * 3, F.col("_v"))
        ).over(w_all),
    )
    outside = (F.col("_v") * 2 < F.col("_q1") * 5 - F.col("_q3") * 3) | (
        F.col("_v") * 2 > F.col("_q3") * 5 - F.col("_q1") * 3
    )
    return fenced.groupBy("_g").agg(
        F.max("_n").cast("long").alias("n"),
        F.max("_q1").cast("long").alias("q1"),
        F.max("_q3").cast("long").alias("q3"),
        F.coalesce(
            F.sum(F.when(outside, F.col("_c")).otherwise(F.lit(0))), F.lit(0)
        )
        .cast("long")
        .alias("n_outliers"),
    ).withColumnRenamed("_g", group_col)


def psi_drift(
    df: DataFrame,
    group_col: str,
    value_col: str,
    is_current_col: str,
    n_buckets: int = 10,
) -> DataFrame:
    """Population Stability Index per group — the standard
    distribution-drift audit of model monitoring (public method):
    values bucket into ``n_buckets`` equal-width bins over the GROUP's
    own [min, max] range (a global or [0, max] range degenerates for
    groups living on different scales), rows split into a reference
    and a current population
    by the boolean ``is_current_col``, and
    ``PSI = sum_b (q_b - p_b) * ln(q_b / p_b)`` with add-one (Laplace)
    smoothing so empty bins stay finite. PSI < 0.1 is the conventional
    "stable" band, > 0.25 "shifted" — the audit that catches a feed
    silently changing its value distribution while row counts and null
    rates (``dq_daily_volume_anomaly``, ``null_profile``) look fine.

    Plan shape: one per-group (min, max) aggregate broadcast back
    (bucket edges — dimension-table-sized), one (group, bucket) count
    aggregate carrying both populations as conditional sums, a
    broadcast bucket-grid left join so EMPTY bins still contribute
    their smoothed term, and a per-group reduce — everything after the
    first aggregate is bounded by |groups| x n_buckets. Returns
    (group, n_ref, n_cur, psi) with psi rounded to 6 (the ln is the
    only FP; bucket assignment uses the same float64 arithmetic on
    both engines)."""
    if n_buckets < 2:
        raise ValueError(f"psi_drift: n_buckets must be >= 2, got {n_buckets}")
    v = df.filter(F.col(value_col).isNotNull()).select(
        F.col(group_col).alias("_g"),
        F.col(value_col).cast("double").alias("_v"),
        F.col(is_current_col).cast("boolean").alias("_cur"),
    )
    # constant-valued groups land wholly in bin 0 (defined, psi ~ 0)
    edges = v.groupBy("_g").agg(
        F.max("_v").alias("_mx"), F.min("_v").alias("_mn")
    )
    bucket = F.when(F.col("_mx") == F.col("_mn"), F.lit(0)).otherwise(
        F.least(
            F.lit(n_buckets - 1),
            F.greatest(
                F.lit(0),
                F.floor(
                    (F.col("_v") - F.col("_mn"))
                    * n_buckets
                    / (F.col("_mx") - F.col("_mn"))
                ).cast("int"),
            ),
        )
    )
    counts = (
        v.join(F.broadcast(edges), "_g")
        .select("_g", "_cur", bucket.alias("_b"))
        .groupBy("_g", "_b")
        .agg(
            F.sum(F.when(~F.col("_cur"), 1).otherwise(0)).alias("_ref"),
            F.sum(F.when(F.col("_cur"), 1).otherwise(0)).alias("_curn"),
        )
    )
    grid = (
        v.select("_g")
        .distinct()
        .crossJoin(
            F.broadcast(
                df.sparkSession.range(n_buckets).select(
                    F.col("id").cast("int").alias("_b")
                )
            )
        )
    )
    filled = grid.join(counts, ["_g", "_b"], "left").select(
        "_g",
        "_b",
        F.coalesce(F.col("_ref"), F.lit(0)).alias("_ref"),
        F.coalesce(F.col("_curn"), F.lit(0)).alias("_curn"),
    )
    w_g = Window.partitionBy("_g").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    p = (F.col("_ref") + 1) / (F.sum("_ref").over(w_g) + n_buckets)
    q = (F.col("_curn") + 1) / (F.sum("_curn").over(w_g) + n_buckets)
    return (
        filled.withColumn("_term", (q - p) * F.log(q / p))
        .withColumn("_nref", F.sum("_ref").over(w_g))
        .withColumn("_ncur", F.sum("_curn").over(w_g))
        .groupBy("_g")
        .agg(
            F.max("_nref").cast("long").alias("n_ref"),
            F.max("_ncur").cast("long").alias("n_cur"),
            F.round(F.sum("_term"), 6).alias("psi"),
        )
        .withColumnRenamed("_g", group_col)
    )


def ks_drift(
    df: DataFrame,
    group_col: str,
    value_col: str,
    is_current_col: str,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift statistic per group — the
    binning-free companion to ``psi_drift`` (public method): the max
    absolute gap between the reference and current empirical CDFs,
    computed ENTIRELY in scaled integers (each ECDF in millionths via
    staged ``div``, so the result is bit-identical on any engine and
    partitioning — no FP, unlike a textbook float implementation whose
    max is summation-order-hostage). KS reacts to ANY distributional
    difference (location, spread, shape) without choosing bucket edges;
    PSI gives the interpretable per-bin decomposition — run both.

    Plan shape: one (group, value) count aggregate carrying both
    populations as conditional sums, then ONE partition-by-group
    exchange for the cumulative window and the final max-reduce on the
    same partitioning — two exchanges, over distinct values per group,
    never raw rows (the ``iqr_outliers`` shape). Returns (group, n_ref,
    n_cur, ks_x1e6), NULL ks when either population is empty."""
    v = df.filter(F.col(value_col).isNotNull()).select(
        F.col(group_col).alias("_g"),
        F.col(value_col).alias("_v"),
        F.col(is_current_col).cast("boolean").alias("_cur"),
    )
    c = v.groupBy("_g", "_v").agg(
        F.sum(F.when(~F.col("_cur"), 1).otherwise(0)).alias("_r"),
        F.sum(F.when(F.col("_cur"), 1).otherwise(0)).alias("_c"),
    )
    w_cum = (
        Window.partitionBy("_g")
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("_g").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    stepped = (
        c.withColumn("_cr", F.sum("_r").over(w_cum))
        .withColumn("_cc", F.sum("_c").over(w_cum))
        .withColumn("_nr", F.sum("_r").over(w_all))
        .withColumn("_nc", F.sum("_c").over(w_all))
    )
    gap = F.abs(
        F.expr("(_cr * 1000000) div _nr") - F.expr("(_cc * 1000000) div _nc")
    )
    return stepped.groupBy("_g").agg(
        F.max("_nr").cast("long").alias("n_ref"),
        F.max("_nc").cast("long").alias("n_cur"),
        F.max(
            F.when((F.col("_nr") > 0) & (F.col("_nc") > 0), gap)
        )
        .cast("long")
        .alias("ks_x1e6"),
    ).withColumnRenamed("_g", group_col)


def chi2_drift(
    df: DataFrame,
    cat_col: str,
    is_current_col: str,
) -> DataFrame:
    """Two-sample chi-square homogeneity statistic over a CATEGORICAL
    column — the third leg of the drift family (``psi_drift`` = binned
    continuous, ``ks_drift`` = binning-free continuous, this =
    categorical; public method): expected counts come from the pooled
    category proportions, ``chi2 = sum (o - e)^2 / e`` over both
    populations and every category. Returns ONE row (n_ref, n_cur,
    n_categories, dof, chi2) — compare chi2 against the chi-square
    critical value at dof = categories - 1 (a monitoring system stores
    the statistic; the threshold is policy). NULL categories count as
    their own category (a feed silently going null-heavy IS drift).

    Plan: one category-count aggregate (conditional sums for both
    populations), population totals attached by a window over the
    already-aggregated frame (bounded by |categories|), one final
    reduce. The only FP is the final (o-e)^2/e on exact integer counts,
    rounded to 6."""
    v = df.select(
        F.coalesce(F.col(cat_col).cast("string"), F.lit("__null__")).alias(
            "_c"
        ),
        F.col(is_current_col).cast("boolean").alias("_cur"),
    )
    counts = v.groupBy("_c").agg(
        F.sum(F.when(~F.col("_cur"), 1).otherwise(0)).alias("_r"),
        F.sum(F.when(F.col("_cur"), 1).otherwise(0)).alias("_q"),
    )
    w_all = Window.partitionBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    # totals get distinct names: Spark column resolution is
    # case-INSENSITIVE by default, so "_R" would silently REPLACE "_r"
    t = (
        counts.withColumn("_tr", F.sum("_r").over(w_all))
        .withColumn("_tq", F.sum("_q").over(w_all))
        .withColumn("_n", F.col("_r") + F.col("_q"))
        .withColumn("_tn", F.col("_tr") + F.col("_tq"))
    )
    er = F.col("_tr") * F.col("_n") / F.col("_tn")
    eq = F.col("_tq") * F.col("_n") / F.col("_tn")
    # an empty population makes the statistic undefined (e = 0): NULL out
    term = F.when(
        (F.col("_tr") > 0) & (F.col("_tq") > 0),
        (F.col("_r") - er) * (F.col("_r") - er) / er
        + (F.col("_q") - eq) * (F.col("_q") - eq) / eq,
    )
    return t.agg(
        F.max("_tr").cast("long").alias("n_ref"),
        F.max("_tq").cast("long").alias("n_cur"),
        F.count(F.lit(1)).cast("long").alias("n_categories"),
        (F.count(F.lit(1)) - 1).cast("long").alias("dof"),
        F.round(F.sum(term), 6).alias("chi2"),
    )
