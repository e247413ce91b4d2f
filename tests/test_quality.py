from datetime import datetime

import pytest
from pyspark.sql import functions as F

from wms_data_pipeline_spark.operators.quality import check_expectations, not_null


def test_all_pass(spark):
    df = spark.createDataFrame([("a", 1), ("b", 2)], "id string, v long")
    res = check_expectations(
        df, {**not_null("id"), "v_positive": F.col("v") > 0}
    )
    assert res.passed and res.total_rows == 2


def test_violations_counted_and_raise_with_sample(spark):
    df = spark.createDataFrame(
        [("a", 1), (None, -5), (None, 3)], "id string, v long"
    )
    with pytest.raises(ValueError, match="id_not_null.*2|2.*id_not_null"):
        check_expectations(df, {**not_null("id"), "v_positive": F.col("v") > 0})
    res = check_expectations(
        df, {**not_null("id"), "v_positive": F.col("v") > 0}, raise_on_failure=False
    )
    assert res.violations == {"id_not_null": 2, "v_positive": 1}


def test_null_condition_is_violation(spark):
    df = spark.createDataFrame([(None,)], "v string")
    res = check_expectations(
        df, {"v_like": F.col("v").like("x%")}, raise_on_failure=False
    )
    assert res.violations == {"v_like": 1}  # null predicate coerced to fail


def test_single_pass(spark):
    # N expectations → exactly one aggregate job; smoke-checked by plan shape
    df = spark.createDataFrame([(1,)], "v long")
    exp = {f"e{i}": F.col("v") >= i for i in range(10)}
    res = check_expectations(df, exp, raise_on_failure=False)
    assert sum(res.violations.values()) == 8  # v=1 fails e2..e9


def test_iqr_outliers_exact_quartiles_and_fences(spark):
    from wms_data_pipeline_spark.operators.quality import iqr_outliers

    # group a: values 1..8 plus a far outlier 100.
    # n=9; q1 = min v with 4*cum >= 9  -> cum>=2.25 -> v=3
    #      q3 = min v with 4*cum >= 27 -> cum>=6.75 -> v=7
    # IQR=4, fences [3-6, 7+6] = [-3, 13] -> only 100 is out
    rows = [("a", v) for v in [1, 2, 3, 4, 5, 6, 7, 8, 100]]
    # group b: constant values -> IQR 0, fences collapse to the point;
    # nothing is an outlier
    rows += [("b", 5)] * 4
    # nulls are excluded entirely
    rows += [("a", None)]
    df = spark.createDataFrame(rows, "g string, v long")
    got = {r["g"]: r for r in iqr_outliers(df, "g", "v").collect()}
    assert got["a"]["n"] == 9
    assert got["a"]["q1"] == 3 and got["a"]["q3"] == 7
    assert got["a"]["n_outliers"] == 1
    assert got["b"]["n"] == 4
    assert got["b"]["q1"] == 5 and got["b"]["q3"] == 5
    assert got["b"]["n_outliers"] == 0


def test_psi_drift_detects_shift_and_smooths_empty_bins(spark):
    from wms_data_pipeline_spark.operators.quality import psi_drift

    # group "stable": identical ref/cur distributions -> psi ~ 0
    rows = [("stable", float(v), c) for v in range(10) for c in (False, True)]
    # group "shifted": ref mass low, cur mass high -> psi large
    rows += [("shifted", 1.0, False)] * 20 + [("shifted", 9.0, True)] * 20
    rows += [("stable", None, True)]  # nulls excluded
    df = spark.createDataFrame(rows, "g string, v double, cur boolean")
    got = {r["g"]: r for r in psi_drift(df, "g", "v", "cur").collect()}
    assert got["stable"]["n_ref"] == 10 and got["stable"]["n_cur"] == 10
    assert abs(got["stable"]["psi"]) < 1e-9
    assert got["shifted"]["psi"] > 0.25  # the conventional "shifted" fence
    with pytest.raises(ValueError, match="n_buckets"):
        psi_drift(df, "g", "v", "cur", n_buckets=1)


def test_ks_drift_exact_gap_and_empty_population(spark):
    from wms_data_pipeline_spark.operators.quality import ks_drift

    # disjoint supports: ref all below, cur all above -> D = 1.0
    rows = [("dis", float(v), False) for v in range(5)]
    rows += [("dis", float(v + 100), True) for v in range(5)]
    # identical: D = 0
    rows += [("same", float(v), c) for v in range(5) for c in (False, True)]
    # one population empty -> NULL statistic
    rows += [("onlyref", 1.0, False)]
    df = spark.createDataFrame(rows, "g string, v double, cur boolean")
    got = {r["g"]: r for r in ks_drift(df, "g", "v", "cur").collect()}
    assert got["dis"]["ks_x1e6"] == 1_000_000
    assert got["same"]["ks_x1e6"] == 0
    assert got["onlyref"]["ks_x1e6"] is None
    # hand case: ref {1,2,3,4}, cur {3,4,5,6} -> max gap at v=2: 1/2 - 0
    rows = [("h", float(v), False) for v in (1, 2, 3, 4)]
    rows += [("h", float(v), True) for v in (3, 4, 5, 6)]
    df = spark.createDataFrame(rows, "g string, v double, cur boolean")
    got = ks_drift(df, "g", "v", "cur").collect()[0]
    assert got["ks_x1e6"] == 500_000


def test_psi_drift_minmax_binning_handles_offset_and_constant(spark):
    from wms_data_pipeline_spark.operators.quality import psi_drift

    # offset data (all values >> 0): [min,max] binning must still spread
    # mass; a [0,max] form would collapse everything into the top bucket
    # and report ~0 for an obvious shift
    rows = [("off", 1000.0 + v, False) for v in range(10)]
    rows += [("off", 1009.0, True)] * 10
    # constant-valued group: defined (all bin 0), psi ~ 0
    rows += [("const", 5.0, c) for c in (False, True) for _ in range(5)]
    df = spark.createDataFrame(rows, "g string, v double, cur boolean")
    got = {r["g"]: r for r in psi_drift(df, "g", "v", "cur").collect()}
    assert got["off"]["psi"] > 0.25
    assert abs(got["const"]["psi"]) < 1e-9


def test_chi2_drift_shift_null_category_and_empty_population(spark):
    from wms_data_pipeline_spark.operators.quality import chi2_drift

    # identical mixes -> chi2 = 0
    rows = [("a", c) for c in (False, True) for _ in range(10)]
    rows += [("b", c) for c in (False, True) for _ in range(10)]
    df = spark.createDataFrame(rows, "cat string, cur boolean")
    got = chi2_drift(df, "cat", "cur").collect()[0]
    assert got["chi2"] == 0.0 and got["n_categories"] == 2 and got["dof"] == 1

    # total swap: ref all 'a', cur all 'b' -> chi2 = N (the 2x2 maximum)
    rows = [("a", False)] * 10 + [("b", True)] * 10
    got = chi2_drift(
        spark.createDataFrame(rows, "cat string, cur boolean"), "cat", "cur"
    ).collect()[0]
    assert got["chi2"] == 20.0

    # NULL categories are their own category (null-heavy feed IS drift)
    rows = [("a", False)] * 10 + [(None, True)] * 10
    got = chi2_drift(
        spark.createDataFrame(rows, "cat string, cur boolean"), "cat", "cur"
    ).collect()[0]
    assert got["n_categories"] == 2 and got["chi2"] == 20.0

    # empty current population -> NULL statistic
    rows = [("a", False), ("b", False)]
    got = chi2_drift(
        spark.createDataFrame(rows, "cat string, cur boolean"), "cat", "cur"
    ).collect()[0]
    assert got["chi2"] is None
