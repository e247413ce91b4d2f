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
