"""A/B: equal-width vs equi-depth frozen grids for the quantized KS store
on a HEAVY-TAILED metric (VERDICT r12 #2 'Done' evidence).

Method: events.value is mapped through exp(value / k) per event_type —
a deterministic monotone transform that manufactures the latency/price
shape (most mass in a narrow head, a long multiplicative tail) from real
data. For each grid we record the measured |KS_exact - KS_quantized| per
group and the grid's own one-sided bound (max single-bin reference mass):
the claim under test is that the equal-width bound degrades with skew
(mass concentrates in few bins) while the equi-depth bound stays pinned
at ~1/n_bins by construction.

Run: python tools/ab_equidepth.py [sf_dir] (default /root/testdata/sf0.1)
"""

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from wms_data_pipeline_spark.schemas import load_table
from wms_data_pipeline_spark.session import get_spark
from wms_data_pipeline_spark.operators.quality import (
    ks_drift,
    ks_drift_probe_quantized,
    ks_reference_write_quantized,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("ab-equidepth")
    spark.sparkContext.setLogLevel("ERROR")
    ev = load_table(spark, sf_dir, "events")
    cut = F.lit("2024-01-16 00:00:00").cast("timestamp")
    # heavy tail: exp stretch; k chosen so the tail spans ~4 decades
    skewed = ev.filter(F.col("value").isNotNull()).select(
        F.col("event_type").alias("g"),
        F.exp(F.col("value") / F.lit(8.0)).alias("v"),
        (F.col("ts") >= cut).alias("cur"),
    ).cache()
    skewed.count()

    exact = {
        r["g"]: r["ks_x1e6"]
        for r in ks_drift(skewed, "g", "v", "cur").collect()
    }
    ref = skewed.filter("NOT cur")
    cur = skewed.filter("cur")

    out = {"sf_dir": sf_dir, "grids": {}}
    for label, kwargs in (
        ("width_1024", dict(n_bins=1024, edges="width")),
        ("width_256", dict(n_bins=256, edges="width")),
        ("equidepth_256", dict(n_bins=256, edges="quantile")),
        ("equidepth_exact_256", dict(n_bins=256, edges="quantile_exact")),
    ):
        path = tempfile.mkdtemp(prefix=f"abeq_{label}_")
        ks_reference_write_quantized(ref, "g", "v", path, **kwargs)
        store = spark.read.parquet(path)
        counts = store.filter(F.col("_b") >= 0) if "_e" in store.columns else store
        # one-sided bound: max single-bin reference mass per group, worst group
        bound = (
            counts.groupBy("_g")
            .agg((F.max("_r") / F.sum("_r")).alias("m"))
            .agg(F.max("m"))
            .collect()[0][0]
        )
        got = {
            r["g"]: r["ks_x1e6"]
            for r in ks_drift_probe_quantized(cur, "g", "v", path).collect()
        }
        errs = {g: exact[g] - got[g] for g in exact}
        assert all(e >= 0 for e in errs.values()), (
            f"{label}: quantized KS exceeded exact — one-sided bound violated"
        )
        out["grids"][label] = {
            "bound_max_bin_mass_x1e6": round(bound * 1_000_000),
            "max_err_x1e6": max(errs.values()),
            "mean_err_x1e6": round(sum(errs.values()) / len(errs)),
        }
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
