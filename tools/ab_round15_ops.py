"""A/B the r15 dedup-join rewrites against their r14 shapes, adjacent in
one session (host windows drift 1.2-1.8x; SCALE_NOTES):

- containment_join: r15 broadcast-probe mapInPandas dispatch vs the r14
  prefix-filter join path (still present as the large-probe fallback —
  forced here via the MAX_BROADCAST_PROBE_DOCS gate).
- prefix_jaccard_join: r15 positional+length-filtered candidates vs the
  r14 bare-prefix dropDuplicates form (reconstructed inline).

Usage: python tools/ab_round15_ops.py [sf_dir] [reps]
Asserts identical results per pair before timing.
"""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from wms_data_pipeline_spark.operators import dedup as dd  # noqa: E402
from wms_data_pipeline_spark.operators.text import tokens_of  # noqa: E402
from wms_data_pipeline_spark.session import get_spark  # noqa: E402


def old_prefix_jaccard_join(df, threshold=0.9):
    """The r14 shape: bare prefix candidates + dropDuplicates (no length
    or positional filter). Copied from the r14 tree; verify identical."""
    num = int(round(threshold * 1_000_000))
    den = 1_000_000
    base = df.select(
        F.col("doc_id").alias("__id"), F.array_distinct(tokens_of("text")).alias("__tk")
    ).filter(F.size("__tk") > 0)
    tok = base.select("__id", F.explode("__tk").alias("__t"))
    freq = tok.groupBy("__t").agg(F.count(F.lit(1)).alias("__f")).localCheckpoint(
        eager=False
    )
    nrow = freq.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct(F.xxhash64("__t")).alias("h"),
    ).collect()[0]
    hash_exact = nrow.n == nrow.h
    ordered = (
        tok.join(freq, "__t")
        .groupBy("__id")
        .agg(F.array_sort(F.collect_list(F.struct("__f", "__t"))).alias("__o"))
        .select("__id", F.transform("__o", lambda s: s["__t"]).alias("__arr"))
    )
    if hash_exact:
        ordered = ordered.select(
            "__id", F.transform("__arr", lambda t: F.xxhash64(t)).alias("__arr")
        )
    ordered = ordered.localCheckpoint(eager=False)
    sz = F.size("__arr")
    plen = sz - F.expr(f"({num}L * size(__arr) + {den - 1}) div {den}") + F.lit(1)
    pref = ordered.select("__id", F.explode(F.slice("__arr", 1, plen)).alias("__p"))
    a = pref.select(F.col("__id").alias("id_a"), "__p")
    b = pref.select(F.col("__id").alias("id_b"), "__p")
    cand = (
        a.join(b, "__p")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    fetch = cand.join(
        ordered.select(F.col("__id").alias("id_a"), F.col("__arr").alias("__arr_a")),
        "id_a",
    ).join(
        ordered.select(F.col("__id").alias("id_b"), F.col("__arr").alias("__arr_b")),
        "id_b",
    )
    inter = F.size(F.array_intersect("__arr_a", "__arr_b")).cast("double")
    union = (F.size("__arr_a") + F.size("__arr_b")).cast("double") - inter
    j = F.when(union > 0, inter / union).otherwise(F.lit(0.0))
    return (
        fetch.withColumn("jaccard_sim", F.round(j, 6))
        .filter(j >= F.lit(threshold))
        .select("id_a", "id_b", "jaccard_sim")
    )


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("ab-round15")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    probe = docs.filter(F.col("doc_id") < 200)

    import gc

    def containment_new():
        return dd.containment_join(probe, docs, threshold=0.8)

    def containment_old():
        saved = dd.MAX_BROADCAST_PROBE_DOCS
        dd.MAX_BROADCAST_PROBE_DOCS = -1
        try:
            return dd.containment_join(probe, docs, threshold=0.8)
        finally:
            dd.MAX_BROADCAST_PROBE_DOCS = saved

    jdocs = docs.filter(F.col("doc_id") < 1200)  # the registry query's subset

    def jaccard_new():
        return dd.prefix_jaccard_join(jdocs, threshold=0.9)

    def jaccard_old():
        return old_prefix_jaccard_join(jdocs, threshold=0.9)

    pairs = [
        ("containment", containment_old, containment_new),
        ("prefix_jaccard", jaccard_old, jaccard_new),
    ]
    for name, old_fn, new_fn in pairs:
        o = sorted(map(tuple, old_fn().collect()))
        n = sorted(map(tuple, new_fn().collect()))
        assert o == n, f"{name}: value mismatch old={len(o)} new={len(n)}"
        print(f"{name}: parity OK ({len(o)} pairs)")
        gc.collect()
        noop(old_fn())
        noop(new_fn())  # codegen warm for both shapes
        gc.collect()
        olds, news = [], []
        for _ in range(reps):  # interleaved: same window for both shapes
            t0 = time.perf_counter()
            noop(old_fn())
            olds.append(time.perf_counter() - t0)
            gc.collect()
            t0 = time.perf_counter()
            noop(new_fn())
            news.append(time.perf_counter() - t0)
            gc.collect()
        print(
            f"{name}: old median {statistics.median(olds):.3f}s "
            f"{[round(x, 3) for x in olds]} | new median "
            f"{statistics.median(news):.3f}s {[round(x, 3) for x in news]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
