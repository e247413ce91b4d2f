"""Partitioning-determinism sweep: every registry query executed twice in
one session with different ``spark.sql.shuffle.partitions`` (and a
different input layout via a pre-repartition knob) must produce an
IDENTICAL canonical rowset.

Why this gate exists: the driver's value-hash oracle implicitly assumes a
query's result is a pure function of its input DATA, not of its physical
partitioning. Integer-space aggregates and rounded-then-ranked windows
are partition-independent by construction; a double SUM is not (FP
addition is non-associative), and such a query only passes the oracle
while its values happen to land away from rounding boundaries — a
different cluster's partitioning could flip a last digit and break the
hash. This sweep finds those queries mechanically instead of waiting for
a flaky driver run.

Usage: python tools/determinism.py [sf_dir] [query ...]
Exit 1 if any query's rowsets differ between the two configurations.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.parity import _rowset  # same canonicalization as the oracle gate

from wms_data_pipeline_spark.plans.queries import REGISTRY
from wms_data_pipeline_spark.session import get_spark


def run_once(spark, spec, sf_dir: str, shuffle_parts: int,
             max_partition_bytes: str = "128m"):
    spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_parts))
    # shrinking maxPartitionBytes multiplies SCAN splits — map-side kernels
    # (mapInPandas partial top-k, Arrow signature batches) see different
    # batch boundaries, a different nondeterminism class than shuffle
    # partitioning
    spark.conf.set("spark.sql.files.maxPartitionBytes", max_partition_bytes)
    df = spec.fn(spark, sf_dir)
    rows = df.collect()
    return _rowset(df.columns, [tuple(r) for r in rows])


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    names = sys.argv[2:] or list(REGISTRY)
    spark = get_spark("determinism")
    spark.sparkContext.setLogLevel("ERROR")
    failures = []
    for name in names:
        spec = REGISTRY[name]
        try:
            a = run_once(spark, spec, sf_dir, 32, "128m")
            b = run_once(spark, spec, sf_dir, 5, "64k")
        except Exception as e:  # noqa: BLE001 — report, keep sweeping
            failures.append((name, f"error: {type(e).__name__}: {str(e)[:160]}"))
            print(f"ERR  {name}: {type(e).__name__}", flush=True)
            continue
        if a != b:
            diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
            failures.append((name, f"rowset diff; first: {diff}"))
            print(f"FAIL {name}: {len(a)} vs {len(b)} rows; first diffs {diff}", flush=True)
        else:
            print(f"ok   {name}: {len(a)} rows stable", flush=True)
    print(f"\n{len(names) - len(failures)}/{len(names)} deterministic under repartitioning")
    for name, why in failures:
        print(f"  {name}: {why}")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
