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

from pyspark.sql import Column, DataFrame
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
