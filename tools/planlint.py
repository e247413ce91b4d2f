"""Physical-plan lint over the FULL query registry.

tests/test_plans.py pins named plan properties for a handful of flagship
queries; this tool is the complement — a blanket anti-pattern gate that
builds the physical plan of every registry query at sf0.01 and fails on
the two constructs that are never acceptable in this engine at 100 TB:

- ``CartesianProduct``: an un-broadcast cross join — O(n*m) row pairs
  shuffled through one task set. Every intentional scalar inline in this
  repo is ``crossJoin(F.broadcast(<1-row agg>))`` which compiles to
  BroadcastNestedLoopJoin; a CartesianProduct can only appear by accident.
- ``BatchEvalPython``: a row-at-a-time (pickled) Python UDF in the plan.
  All sanctioned Python escape hatches here are Arrow-batched and show as
  ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas(WithState).

It also REPORTS (without failing) per-query shuffle-exchange counts so a
round-over-round diff surfaces a query that silently grew an Exchange.

Usage: python tools/planlint.py [sf_dir]
Exit status 1 if any violation. Appends nothing; prints one line per
violation and a summary.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FORBIDDEN = ("CartesianProduct", "BatchEvalPython")


def plan_string(df, mode: str = "simple") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode
    )


def lint_registry(spark, sf_dir: str):
    """Returns (violations, exchange_counts): violations is a list of
    (query_name, forbidden_node) pairs; exchange_counts maps query name →
    number of shuffle Exchange nodes in the simple-mode plan (broadcast
    exchanges excluded — BroadcastExchange prints as its own node name)."""
    from wms_data_pipeline_spark.plans.queries import REGISTRY

    violations: list[tuple[str, str]] = []
    exchanges: dict[str, int] = {}
    errors: dict[str, str] = {}
    for name, spec in REGISTRY.items():
        try:
            plan = plan_string(spec.fn(spark, sf_dir))
        except Exception as e:  # plan construction itself failed
            errors[name] = f"{type(e).__name__}: {e}"
            continue
        for node in FORBIDDEN:
            if node in plan:
                violations.append((name, node))
        # "Exchange " with a leading tree-branch glyph is a shuffle;
        # broadcast exchanges print as "BroadcastExchange".
        exchanges[name] = sum(
            plan.count(f"{glyph} Exchange ") for glyph in ("+-", ":-")
        )
    return violations, exchanges, errors


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from wms_data_pipeline_spark.session import get_spark

    spark = get_spark("planlint")
    spark.sparkContext.setLogLevel("ERROR")
    violations, exchanges, errors = lint_registry(spark, sf_dir)
    for name, node in violations:
        print(f"VIOLATION {name}: {node}")
    for name, err in errors.items():
        print(f"ERROR {name}: {err}")
    worst = sorted(exchanges.items(), key=lambda kv: -kv[1])[:10]
    print("top shuffle-exchange counts: " + ", ".join(f"{n}={c}" for n, c in worst))
    print(
        f"planlint: {len(exchanges)} plans built, "
        f"{len(violations)} violations, {len(errors)} errors"
    )
    # Persist per-query exchange counts so `git diff PLANLINT_LAST.json`
    # surfaces any query whose plan silently grew a shuffle.
    import json

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "PLANLINT_LAST.json"), "w") as f:
        json.dump(
            {
                "sf_dir": sf_dir,
                "violations": [list(v) for v in violations],
                "errors": errors,
                "exchanges": dict(sorted(exchanges.items())),
            },
            f,
            indent=1,
        )
    spark.stop()
    sys.exit(1 if (violations or errors) else 0)


if __name__ == "__main__":
    main()
