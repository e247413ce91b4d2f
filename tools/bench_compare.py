"""Head-to-head: every oracle-paired headline query timed on this engine
(Spark, warm, best-of-2) AND on DuckDB running the oracle SQL over the same
parquet. DuckDB is a much stronger single-node bar than the reference
(pandas + Postgres executemany); matching it on local[32] while carrying a
distributed execution model is the round target's spirit.

Usage: python tools/bench_compare.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from wms_data_pipeline_spark.plans.queries import headline_queries
from wms_data_pipeline_spark.schemas import TESTDATA_TABLES
from wms_data_pipeline_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("bench-compare")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(0, 10_000_000, 1, 32).selectExpr("sum(id)").collect()

    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    for t in TESTDATA_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    out = {}
    for name, spec in headline_queries().items():
        best_s = float("inf")
        for _ in range(2):
            # fn() INSIDE the timer (same as bench.py): iterative operators
            # (connected components) do their real work while building the
            # plan — timing only the final write would under-report them
            t0 = time.perf_counter()
            spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best_s = min(best_s, time.perf_counter() - t0)
        best_d = None
        if spec.oracle:
            best_d = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                con.sql(spec.oracle).fetchall()
                best_d = min(best_d, time.perf_counter() - t0)
        out[name] = {
            "spark_sec": round(best_s, 3),
            "duckdb_sec": round(best_d, 3) if best_d is not None else None,
        }
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
