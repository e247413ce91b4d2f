"""Measured sf0.1 -> sf1 scaling factors for the headline query set
(VERDICT r12 #1): one decade of real scale-up instead of plan-shape
arguments alone.

Protocol: ONE warm session; for each headline query the sf0.1 and sf1
timings run BACK TO BACK (warmup rep + 3 timed reps, median, the bench.py
protocol) before moving to the next query — this host drifts 1.2-1.8x
between time windows, so cross-scale ratios are only meaningful taken
adjacently. Output: one JSON line with per-query times at both scales,
the ratio, and serial totals.

Reading the ratios: the data grows 10x. A scan-bound query should come in
NEAR 10x (minus whatever Spark's ~0.3-0.5 s scheduling floor hid at
sf0.1); a floor-dominated sub-second query will show well UNDER 10x
(the floor amortizes, not the work); anything far ABOVE 10x is
super-linear and gets investigated by name.

Run: python tools/bench_scale.py [sf01_dir] [sf1_dir]
"""

import gc
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wms_data_pipeline_spark.plans.queries import headline_queries
from wms_data_pipeline_spark.session import get_spark

REPS = 3


def main() -> None:
    sf01 = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    sf1 = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scratch/sf1"
    spark = get_spark("wms-bench-scale")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(0, 10_000_000, 1, 32).selectExpr("sum(id)").collect()
    for d in (sf01, sf1):
        spark.read.parquet(f"{d}/lineitem.parquet").limit(1000).count()

    def timed(fn, sf_dir):
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        times = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times.append(time.perf_counter() - t0)
        # same GC hygiene as bench.py r14: release orphaned DataFrames so
        # their localCheckpoint blocks are freed before the next timing
        # (30 queries x 8 executions otherwise accumulate dead blocks and
        # late queries read 2-3x their fresh-session cost)
        gc.collect()
        return round(statistics.median(times), 3)

    out = {}
    for name, spec in headline_queries().items():
        t01 = timed(spec.fn, sf01)
        t1 = timed(spec.fn, sf1)
        out[name] = {
            "sf0.1_sec": t01,
            "sf1_sec": t1,
            "ratio": round(t1 / t01, 2) if t01 > 0 else None,
        }
        print(f"# {name}: {t01} -> {t1} ({out[name]['ratio']}x)", flush=True)
    tot01 = round(sum(v["sf0.1_sec"] for v in out.values()), 3)
    tot1 = round(sum(v["sf1_sec"] for v in out.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_scale_factors",
                "sf0.1_total_sec": tot01,
                "sf1_total_sec": tot1,
                "total_ratio": round(tot1 / tot01, 2),
                "data_ratio": 10.0,
                "queries": out,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
