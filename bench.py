"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric", "value", "unit", "queries", "sf"}.

Each query is forced end-to-end with the noop sink (full evaluation, no
driver collect, no column-pruned count shortcut). Session reuse across
queries mirrors a warm engine; JVM/session startup is excluded from timings.

Two headline numbers:
- ``value`` / per-query ``queries``: serial best-of-2 per query, summed —
  comparable round-over-round with BENCH_r01..r03.
- ``concurrent_wall_sec``: all 17 queries submitted simultaneously from
  threads into per-query FAIR pools (benchlib.concurrent_wall) — the
  busy-cluster regime where Spark's ~0.3-0.5 s per-query scheduling floor
  amortizes instead of being paid 17 times serially.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from wms_data_pipeline_spark.benchlib import concurrent_wall
from wms_data_pipeline_spark.plans.queries import REGISTRY, headline_queries
from wms_data_pipeline_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None
    spark = get_spark("wms-bench", extra_conf={"spark.scheduler.mode": "FAIR"})
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM (codegen, shuffle service, parquet footer caches) on a
    # neutral workload so per-query timings measure the queries, not startup.
    spark.range(0, 10_000_000, 1, 32).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(1000).count()

    timings: dict[str, float] = {}
    for name, spec in headline_queries().items():
        # best-of-2: the first run pays janino codegen compile for the
        # query's expression tree and absorbs transient machine noise;
        # the recorded number is the steady-state the engine sustains.
        # fn() is INSIDE the timer: iterative operators (connected
        # components) and scalar-subquery queries do real work while
        # building their plan.
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)

    # Concurrent pass: codegen is warm from the serial pass, so this times
    # pure overlapped execution — the throughput a busy cluster sustains.
    jobs = [
        (name, lambda spec=spec: spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save())
        for name, spec in headline_queries().items()
    ]
    conc = round(concurrent_wall(spark, jobs, runs=2), 3)

    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "concurrent_wall_sec": conc,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
