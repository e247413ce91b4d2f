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
    counts = (
        v.join(F.broadcast(edges), "_g")
        .select("_g", "_cur", _psi_bucket(n_buckets).alias("_b"))
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
    return _psi_from_filled(filled, group_col, n_buckets)


def _psi_from_filled(
    filled: DataFrame,
    group_col: str,
    n_buckets: int,
    extra_keys: "tuple[tuple[str, str], ...]" = (),
) -> DataFrame:
    """Shared PSI tail over a grid-complete (_g[, extra...], _b, _ref,
    _curn) frame (every key combination carries all ``n_buckets`` bins,
    zeros included) — identical arithmetic for the batch recompute
    (``psi_drift``), the persisted-reference probe (``psi_drift_probe``)
    and the windowed time series (``psi_drift_windows``), so all are
    bit-identical whenever their bucket geometries agree. ``extra_keys``
    is ((internal_name, output_name), ...) for additional partition keys
    beyond the group (e.g. the time window)."""
    keys = ["_g"] + [k for k, _ in extra_keys]
    w_g = Window.partitionBy(*keys).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    p = (F.col("_ref") + 1) / (F.sum("_ref").over(w_g) + n_buckets)
    q = (F.col("_curn") + 1) / (F.sum("_curn").over(w_g) + n_buckets)
    out = (
        filled.withColumn("_term", (q - p) * F.log(q / p))
        .withColumn("_nref", F.sum("_ref").over(w_g))
        .withColumn("_ncur", F.sum("_curn").over(w_g))
        .groupBy(*keys)
        .agg(
            F.max("_nref").cast("long").alias("n_ref"),
            F.max("_ncur").cast("long").alias("n_cur"),
            F.round(F.sum("_term"), 6).alias("psi"),
        )
        .withColumnRenamed("_g", group_col)
    )
    for internal, output in extra_keys:
        out = out.withColumnRenamed(internal, output)
    return out


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
    return _ks_from_counts(c, group_col)


def _ks_from_counts(
    c: DataFrame,
    group_col: str,
    extra_keys: "tuple[tuple[str, str], ...]" = (),
) -> DataFrame:
    """Shared KS tail over per-(group[, extra...], value) population
    counts (_g, …, _v, _r, _c) — the minimal sufficient statistic for the
    two-sample KS, so the batch recompute (``ks_drift``), the
    persisted-reference probe (``ks_drift_probe``) and the windowed time
    series (``ks_drift_windows``) are bit-identical by construction (KS
    has no bucket geometry to freeze). ``extra_keys`` as in
    ``_psi_from_filled``."""
    keys = ["_g"] + [k for k, _ in extra_keys]
    w_cum = (
        Window.partitionBy(*keys)
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*keys).rowsBetween(
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
    out = stepped.groupBy(*keys).agg(
        F.max("_nr").cast("long").alias("n_ref"),
        F.max("_nc").cast("long").alias("n_cur"),
        F.max(
            F.when((F.col("_nr") > 0) & (F.col("_nc") > 0), gap)
        )
        .cast("long")
        .alias("ks_x1e6"),
    ).withColumnRenamed("_g", group_col)
    for internal, output in extra_keys:
        out = out.withColumnRenamed(internal, output)
    return out


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
    return _chi2_from_counts(counts)


def _chi2_from_counts(
    counts: DataFrame,
    extra_keys: "tuple[tuple[str, str], ...]" = (),
) -> DataFrame:
    """Shared chi-square tail over per-category population counts
    (_c, _r, _q[, extra...]) — exact integer counts are the sufficient
    statistic, so ``chi2_drift``, ``chi2_drift_probe`` and the windowed
    ``chi2_drift_windows`` are bit-identical by construction.
    ``extra_keys`` as in ``_psi_from_filled`` (one statistic row per
    extra-key combination instead of one global row)."""
    keys = [k for k, _ in extra_keys]
    w_all = Window.partitionBy(*(keys or [F.lit(1)])).rowsBetween(
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
    aggs = [
        F.max("_tr").cast("long").alias("n_ref"),
        F.max("_tq").cast("long").alias("n_cur"),
        F.count(F.lit(1)).cast("long").alias("n_categories"),
        (F.count(F.lit(1)) - 1).cast("long").alias("dof"),
        F.round(F.sum(term), 6).alias("chi2"),
    ]
    if not keys:
        return t.agg(*aggs)
    out = t.groupBy(*keys).agg(*aggs)
    for internal, output in extra_keys:
        out = out.withColumnRenamed(internal, output)
    return out


# ---------------------------------------------------------------------------
# Incremental drift: persisted reference statistics, probe-only audits.
#
# The batch drift trio rescans the reference population every run — at
# 100 TB the reference side dominates the audit even though it never
# changes between model retrains. These writers persist the MINIMAL
# SUFFICIENT STATISTIC of the reference once (the engine's established
# persisted-index pattern: dedup.neardup_index_write's band index,
# similarity's frozen IVF geometry), and the probes cost O(current
# batch) + a dimension-sized store read:
#
#   PSI:  grid-complete per-(group, bucket) counts + frozen [mn, mx]
#         bucket edges + per-group totals — |groups| x n_buckets rows.
#         Geometry is FROZEN at build time (the sim_* "frozen-geometry
#         append" contract): current values outside the reference range
#         clamp into the edge bins, exactly what a monitoring system
#         wants (out-of-range mass IS edge-bin drift). Bit-identical to
#         the batch recompute whenever the reference attains each
#         group's combined [min, max] (pinned in tests); groups never
#         seen in the reference are not audited (no geometry exists).
#   KS:   per-(group, value) counts — exact, geometry-free; probe is
#         bit-identical to the batch recompute on reference groups by
#         construction. Store is bounded by distinct values per group
#         (the same bound the batch audit's first aggregate enforces).
#   chi2: per-category counts — exact; probe bit-identical to batch,
#         including categories that first appear in the current batch
#         (they enter with reference count 0).
# ---------------------------------------------------------------------------


def psi_reference_write(
    ref_df: DataFrame,
    group_col: str,
    value_col: str,
    path: str,
    n_buckets: int = 10,
    edges: str = "width",
    accuracy: int = 10000,
) -> None:
    """Persist the PSI reference histogram: a grid-complete
    (group, bucket, ref_count, mn, mx, n_ref, n_buckets) parquet,
    |groups| x n_buckets rows. One pass over the reference population,
    once per retrain — every subsequent ``psi_drift_probe`` pays only
    the current batch.

    ``edges`` (r13): ``"width"`` is the original equal-width grid over
    the group's frozen [mn, mx]. ``"quantile"`` /
    ``"quantile_exact"`` freeze the bin edges at the REFERENCE's own
    quantiles instead — classical DECILE PSI, the form model-monitoring
    practice actually standardizes on, and the same heavy-tail argument
    as the quantized KS store (equal-width concentrates all reference
    mass in a few bins on skewed metrics, making the smoothed terms
    insensitive): reference mass ≈ 1/n_buckets per bin BY CONSTRUCTION,
    so every bucket's (q-p)ln(q/p) term carries signal.
    ``"quantile"`` = one percentile_approx aggregate (the scale path);
    ``"quantile_exact"`` = rank-based order statistics
    (``exact_quantile_edges`` — engine-reproducible, the oracle-paired
    path). The grid stays COMPLETE (zero bins included) and carries the
    frozen edge array ``_e`` on every row (n_buckets is dimension-sized
    for PSI, so the duplication is bytes); probes detect the grid kind
    from the store itself."""
    if n_buckets < 2:
        raise ValueError(
            f"psi_reference_write: n_buckets must be >= 2, got {n_buckets}"
        )
    if edges not in ("width", "quantile", "quantile_exact"):
        raise ValueError(
            "psi_reference_write: edges must be 'width', 'quantile' or "
            f"'quantile_exact', got {edges!r}"
        )
    v = ref_df.filter(F.col(value_col).isNotNull()).select(
        F.col(group_col).alias("_g"),
        F.col(value_col).cast("double").alias("_v"),
    )
    if edges == "width":
        geom = v.groupBy("_g").agg(
            F.max("_v").alias("_mx"), F.min("_v").alias("_mn")
        )
        bucket = _psi_bucket(n_buckets)
    else:
        mnmx = v.groupBy("_g").agg(
            F.min("_v").alias("_mn"), F.max("_v").alias("_mx")
        )
        if edges == "quantile":
            fracs = [i / n_buckets for i in range(1, n_buckets)]
            eg = v.groupBy("_g").agg(
                F.percentile_approx("_v", fracs, accuracy).alias("_e")
            )
        else:
            eg = exact_quantile_edges(v, "_g", "_v", n_buckets)
        geom = eg.join(mnmx, "_g")
        bucket = _edge_bucket()
    counts = (
        v.join(F.broadcast(geom), "_g")
        .select("_g", bucket.alias("_b"))
        .groupBy("_g", "_b")
        .agg(F.count(F.lit(1)).alias("_ref"))
    )
    grid = geom.crossJoin(
        F.broadcast(
            ref_df.sparkSession.range(n_buckets).select(
                F.col("id").cast("int").alias("_b")
            )
        )
    )
    w_g = Window.partitionBy("_g").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    (
        grid.join(counts, ["_g", "_b"], "left")
        .select(
            "_g",
            "_b",
            F.coalesce(F.col("_ref"), F.lit(0)).alias("_ref"),
            "_mn",
            "_mx",
            *(["_e"] if edges != "width" else []),
        )
        .withColumn("_nref", F.sum("_ref").over(w_g))
        .withColumn("_nb", F.lit(n_buckets))
        .write.mode("overwrite")
        .parquet(path)
    )


def _store_n_bins(store: DataFrame, path: str) -> int:
    """Grid size of a persisted quantized store, with a loud failure
    mode: a store built from an all-NULL value column has zero rows, so
    ``max(_nb)`` is NULL and the former bare ``int(...)`` crashed with
    an opaque TypeError deep in the probe (ADVICE r12)."""
    nb = store.agg(F.max("_nb")).collect()[0][0]
    if nb is None:
        raise ValueError(
            f"quantized drift store at {path!r} is empty (the reference "
            "had no non-null values) — rebuild the reference before probing"
        )
    return int(nb)


def _psi_store_grid(store: DataFrame, n_buckets: int):
    """Resolve a PSI store's frozen geometry: ``(geom, bucket)`` — the
    broadcast per-group frame to join batch rows against and the bucket
    expression valid after that join. A quantile store carries its edge
    array ``_e`` on every grid row (the PSI grid is complete, so bin 0
    always exists to read it from); a width store resolves to the
    frozen [mn, mx]."""
    if "_e" in store.columns:
        return (
            F.broadcast(store.filter(F.col("_b") == 0).select("_g", "_e")),
            _edge_bucket(),
        )
    return (
        F.broadcast(
            store.groupBy("_g").agg(
                F.max("_mn").alias("_mn"), F.max("_mx").alias("_mx")
            )
        ),
        _psi_bucket(n_buckets),
    )


def _psi_bucket(n_buckets: int) -> Column:
    """Equal-width bucket id over frozen per-group edges (_mn, _mx) —
    the ONE expression shared by ``psi_drift``, ``psi_reference_write``
    and ``psi_drift_probe`` so all three geometries agree bit-for-bit.
    Out-of-range values clamp into the edge bins; constant groups land
    wholly in bin 0."""
    return F.when(F.col("_mx") == F.col("_mn"), F.lit(0)).otherwise(
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


def _edge_bucket() -> Column:
    """Equi-depth bucket id over frozen per-group interior edges ``_e``
    (sorted array<double>, length n_bins - 1): the count of edges the
    value ``_v`` has reached (``>=`` — a value equal to an edge belongs
    to the bin ABOVE it). Results lie in [0, n_bins - 1] by construction,
    so out-of-range clamping is implicit; repeated edges (heavy point
    masses) simply leave the bins between them empty. One expression
    shared by the quantile writer and every quantile probe, the same
    bit-agreement contract as ``_psi_bucket``. Cost is O(n_bins) JVM
    comparisons per row (no binary-search builtin) — the reason the
    quantile grid defaults to fewer bins than the width grid: 256
    equi-depth bins already pin the one-sided KS error bound at
    max-bin-mass ≈ 1/256 REGARDLESS of skew, where the width grid's
    bound degrades to the heaviest bin's mass."""
    return F.aggregate(
        F.col("_e"),
        F.lit(0),
        lambda acc, e: acc + F.when(F.col("_v") >= e, 1).otherwise(0),
    ).cast("int")


def exact_quantile_edges(
    df: DataFrame,
    group_col: str,
    value_col: str,
    n_bins: int,
) -> DataFrame:
    """Per-group EXACT rank-based interior quantile edges — (group,
    _e array<double>) where ``_e[i-1]`` is the value at rank
    ``ceil(i * N / n_bins)`` (1-based, order statistics only, no
    interpolation). Pure selection arithmetic, so any engine sorting the
    same values produces bit-identical edges — what makes the equi-depth
    store ORACLE-REPRODUCIBLE, unlike ``percentile_approx`` whose sketch
    is merge-order dependent. Cost: one sort shuffle of the reference per
    group (a ``row_number`` window) — the auditable path; at 100 TB use
    ``edges="quantile"`` (one ``percentile_approx`` aggregate, no sort)
    and let the frozen store carry whatever edges the sketch produced.
    Groups with fewer rows than ``n_bins`` repeat edges (the rank formula
    assigns one rank to several quantile indices), which downstream
    probes handle as empty bins."""
    v = df.filter(F.col(value_col).isNotNull()).select(
        F.col(group_col).alias("_g"),
        F.col(value_col).cast("double").alias("_v"),
    )
    w = Window.partitionBy("_g").orderBy("_v")
    wa = Window.partitionBy("_g")
    # rank r carries edge index i iff ceil(i*N/n) == r; the number of such
    # i is f(r) - f(r-1) with f(r) = min(n-1, floor(r*n/N)) — all BIGINT
    d = (
        v.withColumn("_rn", F.row_number().over(w).cast("long"))
        .withColumn("_nn", F.count(F.lit(1)).over(wa).cast("long"))
        .withColumn(
            "_k",
            (
                F.least(
                    F.lit(n_bins - 1),
                    F.expr(f"(_rn * {n_bins}) div _nn"),
                )
                - F.least(
                    F.lit(n_bins - 1),
                    F.expr(f"((_rn - 1) * {n_bins}) div _nn"),
                )
            ).cast("int"),
        )
        .filter(F.col("_k") > 0)
    )
    return d.groupBy("_g").agg(
        F.array_sort(
            F.flatten(F.collect_list(F.array_repeat(F.col("_v"), F.col("_k"))))
        ).alias("_e")
    )


def psi_drift_probe(
    cur_df: DataFrame,
    group_col: str,
    value_col: str,
    path: str,
) -> DataFrame:
    """PSI of the CURRENT batch against a persisted reference histogram
    (``psi_reference_write``) — same (group, n_ref, n_cur, psi) schema
    and arithmetic as ``psi_drift``, but the reference population is
    never rescanned: the store is |groups| x n_buckets rows (broadcast-
    sized), so the probe costs one pass over the current batch plus a
    bounded grid join. Groups absent from the store are not audited.
    Detects the store's grid kind itself (equal-width [mn, mx] vs
    frozen quantile edges — decile PSI), so callers never re-declare
    it."""
    spark = cur_df.sparkSession
    store = spark.read.parquet(path)
    n_buckets = _store_n_bins(store, path)
    geom, bucket = _psi_store_grid(store, n_buckets)
    cur_counts = (
        cur_df.filter(F.col(value_col).isNotNull())
        .select(
            F.col(group_col).alias("_g"),
            F.col(value_col).cast("double").alias("_v"),
        )
        .join(geom, "_g")
        .select("_g", bucket.alias("_b"))
        .groupBy("_g", "_b")
        .agg(F.count(F.lit(1)).alias("_curn"))
    )
    filled = (
        store.join(cur_counts, ["_g", "_b"], "left")
        .select(
            "_g",
            "_b",
            "_ref",
            F.coalesce(F.col("_curn"), F.lit(0)).alias("_curn"),
        )
    )
    return _psi_from_filled(filled, group_col, n_buckets)


def ks_reference_write(
    ref_df: DataFrame, group_col: str, value_col: str, path: str
) -> None:
    """Persist the KS reference statistic: per-(group, value) counts —
    exact and geometry-free, so probes reproduce the batch audit
    bit-for-bit on reference groups."""
    (
        ref_df.filter(F.col(value_col).isNotNull())
        .select(
            F.col(group_col).alias("_g"), F.col(value_col).alias("_v")
        )
        .groupBy("_g", "_v")
        .agg(F.count(F.lit(1)).alias("_r"))
        .write.mode("overwrite")
        .parquet(path)
    )


def ks_drift_probe(
    cur_df: DataFrame, group_col: str, value_col: str, path: str
) -> DataFrame:
    """Two-sample KS of the current batch against a persisted reference
    (``ks_reference_write``): aggregate the batch to (group, value)
    counts, merge with the stored reference counts (union + re-aggregate
    — an exact merge of sufficient statistics, no raw reference rows),
    and run the shared integer-ECDF tail. Same (group, n_ref, n_cur,
    ks_x1e6) schema as ``ks_drift``; groups absent from the store get
    NULL ks (empty reference population), mirroring the batch contract.

    Store-size caveat (measured, SCALE_NOTES r11): the KS sufficient
    statistic is per-(group, value) counts, so on a near-continuous
    DOUBLE metric the store is nearly as large as the reference itself
    and the probe only saves the raw-row aggregation (~1.7x). For the
    unbounded win PSI gets, quantize continuous metrics at ingest
    (e.g. ``F.round(col, 3)`` or fixed-point cast) so distinct values
    per group stay far below row counts."""
    spark = cur_df.sparkSession
    store = spark.read.parquet(path)
    # raw batch rows union straight into the merge aggregate: its
    # map-side partial combine collapses them before the exchange, so a
    # separate pre-aggregation would only add an exchange (r11 planlint
    # sweep, 5 -> 4)
    cur_rows = cur_df.filter(F.col(value_col).isNotNull()).select(
        F.col(group_col).alias("_g"),
        F.col(value_col).alias("_v"),
        F.lit(0).cast("long").alias("_r"),
        F.lit(1).cast("long").alias("_c"),
    )
    merged = (
        store.select("_g", "_v", "_r", F.lit(0).cast("long").alias("_c"))
        .unionByName(cur_rows)
        .groupBy("_g", "_v")
        .agg(F.sum("_r").alias("_r"), F.sum("_c").alias("_c"))
    )
    # audit only groups the store knows: a group with no reference rows
    # has an undefined KS — same rule as the PSI probe's frozen geometry.
    # Enforced by the n_ref filter on the tail output, NOT a semi join
    # against distinct store groups: the distinct cost an exchange over
    # the store, while unknown-group batch rows already collapse in the
    # merge aggregate's map-side combine and surface as n_ref = 0 rows
    # (r12 planlint sweep, 4 -> 3).
    return _ks_from_counts(merged, group_col).filter(F.col("n_ref") > 0)


def ks_reference_write_quantized(
    ref_df: DataFrame,
    group_col: str,
    value_col: str,
    path: str,
    n_bins: "int | None" = None,
    edges: str = "width",
    accuracy: int = 10000,
) -> None:
    """Persist a QUANTIZED KS reference statistic: per-(group, bin)
    counts on a fixed-width integer grid with frozen per-group edges
    — O(|groups| x n_bins) rows however continuous the metric.

    Why (VERDICT r11 #2): the exact store (``ks_reference_write``) is
    per-(group, value) counts, which on a near-continuous DOUBLE metric
    is ~66% the size of the reference itself (measured, SCALE_NOTES r11)
    — the probe's structural win evaporates exactly where drift
    monitoring is most common (latency/price metrics). This writer makes
    the engine do the quantization the exact store's docstring asked the
    caller for, reusing ``psi_reference_write``'s frozen-edge contract:
    per-group [mn, mx] is captured at build time and every probe maps
    values through the SAME ``_psi_bucket`` expression (out-of-range
    current values clamp into the edge bins — out-of-range mass IS edge
    drift).

    ERROR BOUND (epsilon-KS): quantization is monotone and maps all
    mass in a bin to one grid point, so the quantized ECDFs EQUAL the
    exact ECDFs at every bin boundary. Hence
    ``KS_quantized <= KS_exact <= KS_quantized + max-bin-mass``
    (one-sided): the probe never overstates drift, and understates by at
    most the largest single-bin probability mass of either population —
    ~1/n_bins on smooth distributions (~0.001 = 1000 ks_x1e6 units at
    the default 1024 bins). EXACT (bit-identical to the exact-store
    probe) whenever the quantizer is injective on the observed values —
    e.g. any integer metric whose per-group range < n_bins — pinned in
    test_round12_ops.

    EQUI-DEPTH GRIDS (r13, VERDICT r12 #2): the equal-width bound is
    max-bin-mass, which degrades exactly on heavy-tailed metrics
    (latency, price) — most mass lands in a few bins. ``edges=
    "quantile"`` freezes per-group interior edges at the reference's own
    quantiles instead (one ``percentile_approx`` aggregate, ``accuracy``
    passed through), pinning every bin's reference mass at ≈ 1/n_bins BY
    CONSTRUCTION — the one-sided bound becomes distribution-free.
    ``edges="quantile_exact"`` derives the same edges from exact order
    statistics (``exact_quantile_edges`` — one sort shuffle, but
    bit-reproducible on any engine, the oracle-paired path). Both store
    an extra per-group GEOMETRY ROW (``_b = -1``, ``_e`` = the edge
    array) that probes broadcast back; probe/daily forms detect the
    grid kind from the store itself, so callers never re-declare it.
    Equi-depth quantization costs O(n_bins) comparisons per probed row
    (``_edge_bucket``) vs the width grid's O(1), so the quantile default
    is coarser: ``n_bins=None`` resolves to 1024 on the width grid but
    256 on the quantile grids, and an explicit quantile n_bins past 512
    warns (ADVICE r13 — measured ~2.5x probe cost at 1024 equi-depth
    bins, SCALE_NOTES r13, for a bound the distribution-free grid never
    needs). Pick n_bins for the bound you need (256 ⇒ ≤ ~0.4% KS error
    regardless of skew)."""
    if n_bins is None:
        n_bins = 1024 if edges == "width" else 256
    elif edges != "width" and n_bins > 512:
        import warnings

        warnings.warn(
            f"ks_reference_write_quantized: edges={edges!r} probes scan "
            f"O(n_bins) edges per row; n_bins={n_bins} costs ~2.5x the "
            "probe time of the 256-bin grid for error the "
            "distribution-free ~1/n_bins bound does not need "
            "(SCALE_NOTES r13)",
            stacklevel=2,
        )
    if n_bins < 2:
        raise ValueError(
            f"ks_reference_write_quantized: n_bins must be >= 2, got {n_bins}"
        )
    if edges not in ("width", "quantile", "quantile_exact"):
        raise ValueError(
            "ks_reference_write_quantized: edges must be 'width', "
            f"'quantile' or 'quantile_exact', got {edges!r}"
        )
    v = ref_df.filter(F.col(value_col).isNotNull()).select(
        F.col(group_col).alias("_g"),
        F.col(value_col).cast("double").alias("_v"),
    )
    if edges == "width":
        geom = v.groupBy("_g").agg(
            F.max("_v").alias("_mx"), F.min("_v").alias("_mn")
        )
        (
            v.join(F.broadcast(geom), "_g")
            .select("_g", "_mn", "_mx", _psi_bucket(n_bins).alias("_b"))
            .groupBy("_g", "_b")
            .agg(
                F.count(F.lit(1)).alias("_r"),
                F.max("_mn").alias("_mn"),
                F.max("_mx").alias("_mx"),
            )
            .withColumn("_nb", F.lit(n_bins))
            .write.mode("overwrite")
            .parquet(path)
        )
        return
    if edges == "quantile":
        fracs = [i / n_bins for i in range(1, n_bins)]
        geom = v.groupBy("_g").agg(
            F.percentile_approx("_v", fracs, accuracy).alias("_e"),
            F.min("_v").alias("_mn"),
            F.max("_v").alias("_mx"),
        )
    else:  # quantile_exact
        mnmx = v.groupBy("_g").agg(
            F.min("_v").alias("_mn"), F.max("_v").alias("_mx")
        )
        geom = exact_quantile_edges(v, "_g", "_v", n_bins).join(mnmx, "_g")
    counts = (
        v.join(F.broadcast(geom.select("_g", "_e")), "_g")
        .select("_g", _edge_bucket().alias("_b"))
        .groupBy("_g", "_b")
        .agg(F.count(F.lit(1)).alias("_r"))
        .select(
            "_g",
            "_b",
            "_r",
            F.lit(None).cast("double").alias("_mn"),
            F.lit(None).cast("double").alias("_mx"),
            F.lit(None).cast("array<double>").alias("_e"),
        )
    )
    geometry_rows = geom.select(
        "_g",
        F.lit(-1).alias("_b"),
        F.lit(0).cast("long").alias("_r"),
        "_mn",
        "_mx",
        "_e",
    )
    (
        counts.unionByName(geometry_rows)
        .withColumn("_nb", F.lit(n_bins))
        .write.mode("overwrite")
        .parquet(path)
    )


def ks_drift_probe_quantized(
    cur_df: DataFrame, group_col: str, value_col: str, path: str
) -> DataFrame:
    """Two-sample KS of the current batch against a persisted QUANTIZED
    reference (``ks_reference_write_quantized``): quantize the batch onto
    the store's frozen per-group grid (same ``_psi_bucket`` expression,
    out-of-range clamps to edge bins), merge bin counts with the stored
    reference bins, run the shared integer-ECDF tail over BIN IDS (the
    quantizer is monotone, so bin order is value order). Same
    (group, n_ref, n_cur, ks_x1e6) schema as ``ks_drift``; groups absent
    from the store are not audited (no frozen geometry exists — the PSI
    probe's rule). Probe cost: one batch pass + a store read bounded by
    |groups| x n_bins, restoring the unbounded reference-size win on
    continuous metrics (see writer docstring for the error bound).
    Detects the store's grid kind itself: an equi-depth store (``_e``
    geometry rows) quantizes the batch through the SAME frozen edge
    array (``_edge_bucket``); callers never re-declare the grid."""
    spark = cur_df.sparkSession
    store = spark.read.parquet(path)
    n_bins = _store_n_bins(store, path)
    geom, bucket, counts = _store_grid(store, n_bins)
    # the inner geometry join doubles as the reference-groups-only filter;
    # raw quantized rows union straight into the merge aggregate (its
    # map-side partial combine collapses them before the exchange — the
    # r11 planlint lesson on ks_drift_probe)
    cur_rows = (
        cur_df.filter(F.col(value_col).isNotNull())
        .select(
            F.col(group_col).alias("_g"),
            F.col(value_col).cast("double").alias("_v"),
        )
        .join(geom, "_g")
        .select(
            "_g",
            bucket.alias("_b"),
            F.lit(0).cast("long").alias("_r"),
            F.lit(1).cast("long").alias("_c"),
        )
    )
    merged = (
        counts.select("_g", "_b", "_r", F.lit(0).cast("long").alias("_c"))
        .unionByName(cur_rows)
        .groupBy("_g", "_b")
        .agg(F.sum("_r").alias("_r"), F.sum("_c").alias("_c"))
        .withColumnRenamed("_b", "_v")
    )
    return _ks_from_counts(merged, group_col)


def _store_grid(store: DataFrame, n_bins: int):
    """Resolve a quantized store's frozen geometry: returns ``(geom,
    bucket, counts)`` — the broadcast per-group geometry frame to join
    batch rows against, the bucket expression valid after that join, and
    the store's COUNT rows (geometry rows excluded). Width stores carry
    (_mn, _mx) on every row; equi-depth stores carry one ``_b = -1``
    geometry row per group holding the frozen edge array ``_e`` (plus
    _mn for the W1 position of bin 0)."""
    if "_e" in store.columns:
        geom = F.broadcast(
            store.filter(F.col("_b") == -1).select("_g", "_e", "_mn")
        )
        return geom, _edge_bucket(), store.filter(F.col("_b") >= 0)
    geom = F.broadcast(
        store.groupBy("_g").agg(
            F.max("_mn").alias("_mn"), F.max("_mx").alias("_mx")
        )
    )
    return geom, _psi_bucket(n_bins), store


def w1_drift_probe_quantized(
    cur_df: DataFrame, group_col: str, value_col: str, path: str
) -> DataFrame:
    """Wasserstein-1 (earth-mover) drift of the current batch against a
    persisted QUANTIZED reference (``ks_reference_write_quantized`` —
    the SAME store as the quantized KS probe): where KS is the sup-norm
    of the ECDF gap (one spike decides it), W1 is its L1 integral —
    magnitude-aware, in the metric's own units ("the distributions are
    ~4.2 ms apart"), the other norm a drift dashboard wants. On the
    frozen grid: ``W1 = Σ_bins |F_ref(b) - F_cur(b)| × bin_width`` —
    the gap is piecewise constant between OBSERVED bins, so each
    merged-count row contributes ``gap × (next_bin - bin)`` grid steps
    (zero-count bins never need materializing) and the final scale is
    one double multiply by ``(mx - mn) / n_bins`` per group. The gap
    sums are the shared scaled-integer ECDF arithmetic (bit-stable on
    any partitioning); quantization error is bounded by one bin width
    of mass transport, the same epsilon argument as the quantized KS.
    Returns (group, n_ref, n_cur, w1) — NULL w1 for a group with an
    empty population; groups absent from the store are not audited.

    On an EQUI-DEPTH store the piecewise-constant gap integrates over
    the frozen edge spacings instead of a uniform bin width: each bin's
    position is its left edge (bin 0 → the reference min), the span to
    the next observed bin is an edge DIFFERENCE in the metric's own
    units, and no final width rescale applies — W1 stays magnitude-true
    on exactly the skewed metrics the quantile grid exists for."""
    spark = cur_df.sparkSession
    store = spark.read.parquet(path)
    n_bins = _store_n_bins(store, path)
    if "_e" in store.columns:
        geom, bucket, counts = _store_grid(store, n_bins)
        cur_rows = (
            cur_df.filter(F.col(value_col).isNotNull())
            .select(
                F.col(group_col).alias("_g"),
                F.col(value_col).cast("double").alias("_v"),
            )
            .join(geom, "_g")
            .select(
                "_g",
                bucket.alias("_b"),
                F.lit(0).cast("long").alias("_r"),
                F.lit(1).cast("long").alias("_c"),
            )
        )
        merged = (
            counts.select(
                "_g", "_b", "_r", F.lit(0).cast("long").alias("_c")
            )
            .unionByName(cur_rows)
            .groupBy("_g", "_b")
            .agg(F.sum("_r").alias("_r"), F.sum("_c").alias("_c"))
        )
        return _w1_from_bins(
            _attach_positions(merged, geom), n_bins, group_col,
            positions=True,
        )
    edges = F.broadcast(
        store.groupBy("_g").agg(
            F.max("_mn").alias("_mn"), F.max("_mx").alias("_mx")
        )
    )
    cur_rows = (
        cur_df.filter(F.col(value_col).isNotNull())
        .select(
            F.col(group_col).alias("_g"),
            F.col(value_col).cast("double").alias("_v"),
        )
        .join(edges, "_g")
        .select(
            "_g",
            _psi_bucket(n_bins).alias("_b"),
            F.lit(0).cast("long").alias("_r"),
            F.lit(1).cast("long").alias("_c"),
            F.lit(None).cast("double").alias("_mn"),
            F.lit(None).cast("double").alias("_mx"),
        )
    )
    merged = (
        store.select(
            "_g", "_b", "_r", F.lit(0).cast("long").alias("_c"),
            "_mn", "_mx",
        )
        .unionByName(cur_rows)
        .groupBy("_g", "_b")
        .agg(
            F.sum("_r").alias("_r"),
            F.sum("_c").alias("_c"),
            F.max("_mn").alias("_mn"),
            F.max("_mx").alias("_mx"),
        )
    )
    return _w1_from_bins(merged, n_bins, group_col)


def _attach_positions(merged: DataFrame, geom) -> DataFrame:
    """Left-edge VALUE position of each merged equi-depth bin row: bin 0
    starts at the reference min, bin b >= 1 at frozen edge ``_e[b]``
    (1-based ``element_at``). The broadcast geometry join is |groups|
    rows — control-plane sized."""
    return merged.join(geom, "_g").withColumn(
        "_pos",
        F.when(F.col("_b") == 0, F.col("_mn")).otherwise(
            F.element_at("_e", F.col("_b"))
        ),
    )


def _w1_from_bins(
    merged: DataFrame,
    n_bins: int,
    group_col: str,
    extra_keys: "tuple[tuple[str, str], ...]" = (),
    positions: bool = False,
) -> DataFrame:
    """Shared W1 tail over merged per-(group[, extra...], bin) population
    counts (_g, …, _b, _r, _c, _mn, _mx) — the frozen edges RIDE THE
    STORE ROWS through the merge aggregate (every audited key has at
    least one reference row, so max(_mn)/max(_mx) recover them; cur-only
    rows carry NULLs and are dropped by the n_ref filter anyway), which
    saves the separate edges re-join the first cut of this tail paid.
    Same scaled-integer ECDF arithmetic as ``_ks_from_counts`` with
    sum-of-gap×span instead of max, so the probe and the windowed series
    are per-window bit-identical by construction.

    ``positions=True`` (equi-depth grids): ``merged`` carries a ``_pos``
    double column (each bin's left-edge VALUE, ``_attach_positions``)
    instead of ``_mn``/``_mx``; the span becomes a position difference —
    already in the metric's units — and the uniform ``(mx-mn)/n_bins``
    rescale drops away."""
    keys = ["_g"] + [k for k, _ in extra_keys]
    w_cum = (
        Window.partitionBy(*keys)
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*keys).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_next = Window.partitionBy(*keys).orderBy("_b")
    span_src = "_pos" if positions else "_b"
    stepped = (
        merged.withColumn("_cr", F.sum("_r").over(w_cum))
        .withColumn("_cc", F.sum("_c").over(w_cum))
        .withColumn("_nr", F.sum("_r").over(w_all))
        .withColumn("_nc", F.sum("_c").over(w_all))
        # span to the next observed bin; the last row's gap is 0 (both
        # ECDFs at 1) so its span never matters — default 0
        .withColumn(
            "_span",
            F.coalesce(
                F.lead(span_src, 1).over(w_next) - F.col(span_src),
                F.lit(0.0 if positions else 0),
            ),
        )
    )
    gap = F.abs(
        F.expr("(_cr * 1000000) div _nr") - F.expr("(_cc * 1000000) div _nc")
    )
    sums = stepped.groupBy(*keys).agg(
        F.max("_nr").cast("long").alias("n_ref"),
        F.max("_nc").cast("long").alias("n_cur"),
        *(
            ()
            if positions
            else (F.max("_mn").alias("_mn"), F.max("_mx").alias("_mx"))
        ),
        F.sum(
            F.when(
                (F.col("_nr") > 0) & (F.col("_nc") > 0), gap * F.col("_span")
            )
        ).alias("_s"),
    )
    w1 = (
        F.round(F.col("_s").cast("double") / 1000000, 6)
        if positions
        else F.round(
            F.col("_s").cast("double")
            * (F.col("_mx") - F.col("_mn"))
            / n_bins
            / 1000000,
            6,
        )
    )
    out = (
        sums.select(*keys, "n_ref", "n_cur", w1.alias("w1"))
        .filter(F.col("n_ref") > 0)
        .withColumnRenamed("_g", group_col)
    )
    for internal, output in extra_keys:
        out = out.withColumnRenamed(internal, output)
    return out


def w1_drift_windows_quantized(
    cur_df: DataFrame,
    group_col: str,
    value_col: str,
    window_col: str,
    path: str,
) -> DataFrame:
    """Wasserstein-1 drift TIME SERIES against the persisted quantized
    store — the L1 companion to ``ks_drift_windows_quantized`` on the
    same dashboard, with the same grid-bounded replication cost
    (|groups| × n_bins × |windows|, never reference cardinality). Per
    window bit-identical to ``w1_drift_probe_quantized`` on that
    window's rows alone (shared ``_w1_from_bins`` tail, pinned in
    test_round12_ops)."""
    spark = cur_df.sparkSession
    store = spark.read.parquet(path)
    n_bins = _store_n_bins(store, path)
    cur = cur_df.filter(F.col(value_col).isNotNull()).select(
        F.col(group_col).alias("_g"),
        F.col(window_col).alias("_w"),
        F.col(value_col).cast("double").alias("_v"),
    )
    # r14: same cur-aggregate-first restructure as
    # ks_drift_windows_quantized (one batch scan, windows derived from
    # the tiny aggregate, merge + downstream share one (group, window)
    # repartition). Inner geometry joins drop non-store groups in both
    # shapes identically.
    if "_e" in store.columns:
        geom, bucket, counts = _store_grid(store, n_bins)
        cur_agg = (
            cur.join(geom, "_g")
            .select("_g", "_w", bucket.alias("_b"))
            .groupBy("_g", "_w", "_b")
            .agg(F.count(F.lit(1)).cast("long").alias("_c"))
            .localCheckpoint(eager=False)  # feeds windows + the merge
        )
        windows = cur_agg.select("_g", "_w").distinct()
        ref_rows = counts.join(F.broadcast(windows), "_g").select(
            "_g", "_w", "_b", "_r", F.lit(0).cast("long").alias("_c")
        )
        cur_rows = cur_agg.select(
            "_g", "_w", "_b", F.lit(0).cast("long").alias("_r"), "_c"
        )
        merged = (
            ref_rows.unionByName(cur_rows)
            .repartition("_g", "_w")
            .groupBy("_g", "_w", "_b")
            .agg(F.sum("_r").alias("_r"), F.sum("_c").alias("_c"))
        )
        return _w1_from_bins(
            _attach_positions(merged, geom), n_bins, group_col,
            extra_keys=(("_w", window_col),), positions=True,
        )
    edges = F.broadcast(
        store.groupBy("_g").agg(
            F.max("_mn").alias("_mn"), F.max("_mx").alias("_mx")
        )
    )
    cur_agg = (
        cur.join(edges, "_g")
        .select("_g", "_w", _psi_bucket(n_bins).alias("_b"))
        .groupBy("_g", "_w", "_b")
        .agg(F.count(F.lit(1)).cast("long").alias("_c"))
        .localCheckpoint(eager=False)  # feeds windows + the merge
    )
    windows = cur_agg.select("_g", "_w").distinct()
    ref_rows = store.join(F.broadcast(windows), "_g").select(
        "_g", "_w", "_b", "_r", F.lit(0).cast("long").alias("_c"),
        "_mn", "_mx",
    )
    cur_rows = cur_agg.select(
        "_g", "_w", "_b",
        F.lit(0).cast("long").alias("_r"),
        "_c",
        F.lit(None).cast("double").alias("_mn"),
        F.lit(None).cast("double").alias("_mx"),
    )
    merged = (
        ref_rows.unionByName(cur_rows)
        .repartition("_g", "_w")
        .groupBy("_g", "_w", "_b")
        .agg(
            F.sum("_r").alias("_r"),
            F.sum("_c").alias("_c"),
            F.max("_mn").alias("_mn"),
            F.max("_mx").alias("_mx"),
        )
    )
    return _w1_from_bins(
        merged, n_bins, group_col, extra_keys=(("_w", window_col),)
    )


def chi2_reference_write(ref_df: DataFrame, cat_col: str, path: str) -> None:
    """Persist the chi-square reference statistic: per-category counts
    (NULL folded to its own category, same as ``chi2_drift``)."""
    (
        ref_df.select(
            F.coalesce(
                F.col(cat_col).cast("string"), F.lit("__null__")
            ).alias("_c")
        )
        .groupBy("_c")
        .agg(F.count(F.lit(1)).alias("_r"))
        .write.mode("overwrite")
        .parquet(path)
    )


def chi2_drift_probe(cur_df: DataFrame, cat_col: str, path: str) -> DataFrame:
    """Chi-square homogeneity of the current batch against a persisted
    reference (``chi2_reference_write``) — bit-identical to the batch
    ``chi2_drift`` by construction, INCLUDING categories first seen in
    the current batch (they merge in with reference count 0, exactly as
    the batch's pooled aggregate would count them)."""
    spark = cur_df.sparkSession
    store = spark.read.parquet(path)
    cur_counts = (
        cur_df.select(
            F.coalesce(
                F.col(cat_col).cast("string"), F.lit("__null__")
            ).alias("_c")
        )
        .groupBy("_c")
        .agg(F.count(F.lit(1)).alias("_q"))
    )
    merged = (
        store.select("_c", "_r", F.lit(0).cast("long").alias("_q"))
        .unionByName(
            cur_counts.select("_c", F.lit(0).cast("long").alias("_r"), "_q")
        )
        .groupBy("_c")
        .agg(F.sum("_r").alias("_r"), F.sum("_q").alias("_q"))
    )
    return _chi2_from_counts(merged)


def embedding_drift(
    df: DataFrame,
    vec_col: str,
    is_current_col: str,
) -> DataFrame:
    """Embedding-distribution drift audit — the drift family extended to
    the ``array<float>`` column an LLM-data pipeline carries (public
    method: centroid/mean-embedding monitoring): splits rows into
    reference/current populations, computes the per-dimension mean
    vector of each, and returns ONE row
    (n_ref, n_cur, centroid_cosine, mean_gap_l2, max_dim_gap) —
    cosine between the two centroids (1.0 = no directional shift),
    the L2 norm of the mean-vector gap, and the largest per-dimension
    absolute gap (which dimension family moved most). Catches an
    embedding-model swap, an upstream preprocessing change, or a topic
    shift that per-scalar audits cannot see.

    Plan shape: one posexplode + (dimension, population) conditional
    mean — the ONLY data-sized pass — then every downstream step is
    bounded by the embedding dimension (64-4096 rows): a single-row
    reduce computes the cosine/gaps. FP contract: means accumulate in
    DOUBLE and results round to 6 (the sim_label_cohesion precedent —
    reordering error ~1e-13, far under the rounding grain). NULL
    vectors are excluded; an empty population NULLs the metrics."""
    v = df.filter(F.col(vec_col).isNotNull()).select(
        F.col(is_current_col).cast("boolean").alias("_cur"),
        F.posexplode(F.col(vec_col)).alias("_i", "_x"),
    )
    m = v.groupBy("_i").agg(
        F.avg(F.when(~F.col("_cur"), F.col("_x").cast("double"))).alias("_mr"),
        F.avg(F.when(F.col("_cur"), F.col("_x").cast("double"))).alias("_mc"),
    )
    counts = df.filter(F.col(vec_col).isNotNull()).agg(
        F.sum(
            F.when(~F.col(is_current_col).cast("boolean"), 1).otherwise(0)
        ).cast("long").alias("n_ref"),
        F.sum(
            F.when(F.col(is_current_col).cast("boolean"), 1).otherwise(0)
        ).cast("long").alias("n_cur"),
    )
    return _embedding_drift_from_means(m, counts)


def _embedding_drift_from_means(m: DataFrame, counts: DataFrame) -> DataFrame:
    """Shared single-row reduce over per-dimension population means
    (_i, _mr, _mc) + population counts — identical arithmetic for the
    batch audit and the persisted-reference probe."""
    gap = F.col("_mr") - F.col("_mc")
    agg = m.agg(
        F.sum(F.col("_mr") * F.col("_mc")).alias("_dot"),
        F.sum(F.col("_mr") * F.col("_mr")).alias("_nr2"),
        F.sum(F.col("_mc") * F.col("_mc")).alias("_nc2"),
        F.sum(gap * gap).alias("_g2"),
        F.max(F.abs(gap)).alias("_gmax"),
    )
    return counts.crossJoin(F.broadcast(agg)).select(
        "n_ref",
        "n_cur",
        F.round(
            F.col("_dot") / (F.sqrt("_nr2") * F.sqrt("_nc2")), 6
        ).alias("centroid_cosine"),
        F.round(F.sqrt("_g2"), 6).alias("mean_gap_l2"),
        F.round(F.col("_gmax"), 6).alias("max_dim_gap"),
    )


def embedding_reference_write(
    ref_df: DataFrame, vec_col: str, path: str
) -> None:
    """Persist the embedding-drift reference statistic: the per-dimension
    mean vector + vector count — DIMENSION-sized (64-4096 rows) however
    large the reference corpus, the extreme case of the r11 persisted-
    reference pattern (the 100 TB reference embedding corpus reduces to
    one parquet of a few KB)."""
    v = ref_df.filter(F.col(vec_col).isNotNull())
    n_ref = v.count()
    (
        v.select(F.posexplode(F.col(vec_col)).alias("_i", "_x"))
        .groupBy("_i")
        .agg(F.avg(F.col("_x").cast("double")).alias("_mr"))
        .withColumn("_nref", F.lit(n_ref).cast("long"))
        .write.mode("overwrite")
        .parquet(path)
    )


def embedding_drift_probe(
    cur_df: DataFrame, vec_col: str, path: str
) -> DataFrame:
    """Embedding drift of the current batch against a persisted
    per-dimension reference mean (``embedding_reference_write``): one
    pass over the batch, a broadcast-sized store read, the shared
    single-row reduce. Same output schema as ``embedding_drift``; equals
    the batch recompute up to the FP-rounding grain (the stored means ARE
    the build-time batch means; the probe-side means recompute over the
    same current rows)."""
    spark = cur_df.sparkSession
    store = spark.read.parquet(path)
    cur = cur_df.filter(F.col(vec_col).isNotNull())
    mc = (
        cur.select(F.posexplode(F.col(vec_col)).alias("_i", "_x"))
        .groupBy("_i")
        .agg(F.avg(F.col("_x").cast("double")).alias("_mc"))
    )
    m = store.join(mc, "_i", "left").select(
        "_i", "_mr", "_mc"
    )
    counts = cur.agg(F.count(F.lit(1)).cast("long").alias("n_cur")).crossJoin(
        F.broadcast(store.agg(F.max("_nref").cast("long").alias("n_ref")))
    ).select("n_ref", "n_cur")
    return _embedding_drift_from_means(m, counts)


def psi_drift_windows(
    cur_df: DataFrame,
    group_col: str,
    value_col: str,
    window_col: str,
    path: str,
) -> DataFrame:
    """PSI drift TIME SERIES: the persisted-reference probe
    (``psi_drift_probe``) evaluated per (group, window) — one PSI row per
    group per time bucket (day/hour — any expression the caller puts in
    ``window_col``), the dashboard shape of production model monitoring
    (a single-number audit says "drifted"; the series says WHEN and
    whether it is trending or a one-batch spike).

    Plan: one pass buckets the current rows against the frozen reference
    edges and counts per (group, window, bucket); the reference grid
    broadcast-joins onto the distinct windows, so everything after the
    first aggregate is bounded by |groups| x |windows| x n_buckets.
    Same smoothing/bucket arithmetic as the probe — a window holding the
    whole current population reproduces ``psi_drift_probe`` exactly
    (pinned in tests). Windows with no rows for a stored group emit
    nothing (an absent window is "no data", not "no drift" — the caller
    left-joins a calendar if it wants explicit gaps)."""
    spark = cur_df.sparkSession
    store = spark.read.parquet(path)
    n_buckets = _store_n_bins(store, path)
    geom, bucket = _psi_store_grid(store, n_buckets)
    cur = cur_df.filter(F.col(value_col).isNotNull()).select(
        F.col(group_col).alias("_g"),
        F.col(window_col).alias("_w"),
        F.col(value_col).cast("double").alias("_v"),
    )
    cur_counts = (
        cur.join(geom, "_g")
        .select("_g", "_w", bucket.alias("_b"))
        .groupBy("_g", "_w", "_b")
        .agg(F.count(F.lit(1)).alias("_curn"))
        .localCheckpoint(eager=False)  # feeds windows + the fill join
    )
    # r14: derive the audited-window set from the aggregate instead of a
    # second batch scan — groups absent from the store vanish in either
    # shape (store ⋈ windows is inner on _g), so the output is identical.
    windows = cur_counts.select("_g", "_w").distinct()
    filled = (
        store.join(windows, "_g")
        .join(cur_counts, ["_g", "_w", "_b"], "left")
        .select(
            "_g",
            "_w",
            "_b",
            "_ref",
            F.coalesce(F.col("_curn"), F.lit(0)).alias("_curn"),
        )
    )
    return _psi_from_filled(
        filled, group_col, n_buckets, extra_keys=(("_w", window_col),)
    )


def ks_drift_windows(
    cur_df: DataFrame,
    group_col: str,
    value_col: str,
    window_col: str,
    path: str,
) -> DataFrame:
    """KS drift TIME SERIES against a persisted reference
    (``ks_reference_write``): the exact integer-ECDF gap per (group,
    window) — the binning-free companion to ``psi_drift_windows`` on the
    same monitoring dashboard. The stored per-(group, value) counts
    replicate onto each window the group actually has current rows for
    (a window-count-bounded join, no raw reference rescans), merge with
    the batch's per-(group, window, value) counts, and run the shared
    integer-ECDF tail keyed by (group, window).

    Cost note: the merge frame is |store| x |windows per group| + batch
    distinct values — linear in the audit windows, which is what a
    time-series audit inherently pays (each window's ECDF needs the full
    reference CDF); on near-continuous metrics quantize at ingest (see
    ``ks_drift_probe``). Bit-identical per window to running
    ``ks_drift_probe`` on that window's rows alone (pinned in tests)."""
    spark = cur_df.sparkSession
    store = spark.read.parquet(path)
    cur = cur_df.filter(F.col(value_col).isNotNull()).select(
        F.col(group_col).alias("_g"),
        F.col(window_col).alias("_w"),
        F.col(value_col).alias("_v"),
    )
    # windows is |groups| x |windows| — dimension-sized however large the
    # store; broadcast it so the replication join never shuffles the
    # store. No semi join against distinct store groups anywhere: the
    # inner replication join below already restricts ref_rows to store
    # groups, unknown-group batch rows collapse in the merge aggregate's
    # map-side combine and surface as n_ref = 0, and the tail filter
    # drops them — saving the store-distinct exchange + broadcast the
    # semi joins cost (r12 planlint sweep, 5 -> 4).
    # r14 (guide §2.3/§2.4, same restructure as the quantized sibling):
    # aggregate the batch per (group, window, value) FIRST — one scan,
    # map-side partials — and derive the audited-window set from that
    # aggregate instead of re-scanning the batch. Unknown-group rows
    # survive the pre-aggregation unchanged (no geometry join here), so
    # the window set and the n_ref = 0 collapse are identical. The
    # merge repartitions by (group, window) once; the merge aggregate,
    # ECDF window and statistic aggregate all reuse that clustering.
    cur_agg = (
        cur.groupBy("_g", "_w", "_v")
        .agg(F.count(F.lit(1)).cast("long").alias("_c"))
        .localCheckpoint(eager=False)  # feeds windows + the merge
    )
    windows = cur_agg.select("_g", "_w").distinct()
    ref_rows = store.join(F.broadcast(windows), "_g").select(
        "_g", "_w", "_v", "_r", F.lit(0).cast("long").alias("_c")
    )
    cur_rows = cur_agg.select(
        "_g", "_w", "_v", F.lit(0).cast("long").alias("_r"), "_c"
    )
    merged = (
        ref_rows.unionByName(cur_rows)
        .repartition("_g", "_w")
        .groupBy("_g", "_w", "_v")
        .agg(F.sum("_r").alias("_r"), F.sum("_c").alias("_c"))
    )
    return _ks_from_counts(
        merged, group_col, extra_keys=(("_w", window_col),)
    ).filter(F.col("n_ref") > 0)


def ks_drift_windows_quantized(
    cur_df: DataFrame,
    group_col: str,
    value_col: str,
    window_col: str,
    path: str,
) -> DataFrame:
    """KS drift TIME SERIES against a persisted QUANTIZED reference
    (``ks_reference_write_quantized``) — the windowed audit was the
    place the exact store hurt most: ``ks_drift_windows`` replicates
    the per-(group, value) reference counts onto EVERY audited window,
    so a near-continuous metric pays ~|reference| × |windows| merge
    rows. Here the replicated rows are the frozen grid — |groups| ×
    n_bins × |windows|, bounded forever — and the batch quantizes onto
    the same grid (same ``_psi_bucket``, out-of-range clamps to edge
    bins). Per window this is bit-identical to
    ``ks_drift_probe_quantized`` on that window's rows alone (pinned in
    test_round12_ops) and carries the quantized probe's one-sided
    epsilon bound vs the exact series. Groups absent from the store are
    not audited (the n_ref tail filter, never a store-distinct semi
    join — the r12 planlint lesson)."""
    spark = cur_df.sparkSession
    store = spark.read.parquet(path)
    n_bins = _store_n_bins(store, path)
    geom, bucket, counts = _store_grid(store, n_bins)
    cur = cur_df.filter(F.col(value_col).isNotNull()).select(
        F.col(group_col).alias("_g"),
        F.col(window_col).alias("_w"),
        F.col(value_col).cast("double").alias("_v"),
    )
    # r14 (guide §2.3/§2.4): quantize + aggregate the batch per
    # (group, window, bin) FIRST — one scan with map-side partial
    # aggregation — and derive the audited-window set from that tiny
    # aggregate instead of a second scan of the batch. The grid merge
    # then repartitions by (group, window) once; the final merge
    # aggregate, the ECDF window and the statistic aggregate all reuse
    # that partitioning (subset-key clustering), so the former separate
    # merge-agg and window exchanges collapse into one tiny post-agg
    # exchange. Groups absent from the store vanish identically in both
    # shapes (the geom/counts joins are inner). Per-window results
    # unchanged — oracle-verified.
    cur_agg = (
        cur.join(geom, "_g")
        .select("_g", "_w", bucket.alias("_v"))
        .groupBy("_g", "_w", "_v")
        .agg(F.count(F.lit(1)).cast("long").alias("_c"))
        .localCheckpoint(eager=False)  # feeds windows + the merge
    )
    windows = cur_agg.select("_g", "_w").distinct()
    ref_rows = counts.join(F.broadcast(windows), "_g").select(
        "_g", "_w", F.col("_b").alias("_v"), "_r",
        F.lit(0).cast("long").alias("_c"),
    )
    cur_rows = cur_agg.select(
        "_g", "_w", "_v", F.lit(0).cast("long").alias("_r"), "_c"
    )
    merged = (
        ref_rows.unionByName(cur_rows)
        .repartition("_g", "_w")
        .groupBy("_g", "_w", "_v")
        .agg(F.sum("_r").alias("_r"), F.sum("_c").alias("_c"))
    )
    return _ks_from_counts(
        merged, group_col, extra_keys=(("_w", window_col),)
    ).filter(F.col("n_ref") > 0)


def chi2_drift_windows(
    cur_df: DataFrame,
    cat_col: str,
    window_col: str,
    path: str,
) -> DataFrame:
    """Chi-square drift TIME SERIES against persisted reference category
    counts (``chi2_reference_write``): one homogeneity statistic per
    window — the categorical leg of the windowed drift dashboard
    (``psi_drift_windows``/``ks_drift_windows`` cover continuous). The
    stored counts replicate onto each window with current rows, merge
    with the batch's per-(window, category) counts (categories first
    seen in a window enter with reference count 0), and run the shared
    tail keyed by window. Bit-identical per window to probing that
    window's rows alone (pinned in tests); the merge frame is bounded by
    |windows| x |categories|."""
    spark = cur_df.sparkSession
    store = spark.read.parquet(path)
    cur = cur_df.select(
        F.col(window_col).alias("_w"),
        F.coalesce(F.col(cat_col).cast("string"), F.lit("__null__")).alias(
            "_c"
        ),
    )
    # r14: same cur-aggregate-first restructure as the continuous
    # windowed probes — one batch scan, windows derived from the tiny
    # aggregate, merge keyed once by window.
    cur_agg = (
        cur.groupBy("_w", "_c")
        .agg(F.count(F.lit(1)).cast("long").alias("_q"))
        .localCheckpoint(eager=False)  # feeds windows + the merge
    )
    windows = cur_agg.select("_w").distinct()
    ref_rows = store.join(F.broadcast(windows)).select(
        "_w", "_c", "_r", F.lit(0).cast("long").alias("_q")
    )
    cur_rows = cur_agg.select(
        "_w", "_c", F.lit(0).cast("long").alias("_r"), "_q"
    )
    merged = (
        ref_rows.unionByName(cur_rows)
        .repartition("_w")
        .groupBy("_w", "_c")
        .agg(F.sum("_r").alias("_r"), F.sum("_q").alias("_q"))
    )
    return _chi2_from_counts(merged, extra_keys=(("_w", window_col),))
