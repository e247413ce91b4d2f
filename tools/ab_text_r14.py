"""A/B the r14 text/dedup rewrites against their r13 shapes, adjacent in
one session (host windows drift 1.2-1.8x; SCALE_NOTES):

- minhash signature: r13 double-localCheckpoint fence vs r14 single
  (the inner fence predated the Arrow signature kernel).
- decontam confirm (curation pipeline + bloom decontaminate): r13
  inner-join + countDistinct vs r14 semi-join + count (test side raw).

Usage: python tools/ab_text_r14.py [sf_dir] [reps]
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
from wms_data_pipeline_spark.operators import text as txt  # noqa: E402
from wms_data_pipeline_spark.session import get_spark  # noqa: E402


def old_sig_pairs(docs, threshold=0.5):
    """minhash_neardup_pairs with the r13 double-checkpoint signature."""
    sig = dd.with_minhash_signature(
        docs.select("doc_id", "text"), "text", 16, 3,
        keep_shingles=True, drop_source=True,
    ).localCheckpoint(eager=False).localCheckpoint(eager=False)
    bucketed = dd._band_rows(sig, "doc_id", 16, 4)
    a = bucketed.select(F.col("doc_id").alias("id_a"), "band", "bhash")
    b = bucketed.select(F.col("doc_id").alias("id_b"), "band", "bhash")
    pairs = (
        a.join(b, on=["band", "bhash"]).filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b").dropDuplicates(["id_a", "id_b"])
    )
    shing = sig.select("doc_id", "__shingles")
    v = (
        pairs.join(shing.select(F.col("doc_id").alias("id_a"),
                                F.col("__shingles").alias("__sh_a")), "id_a")
        .join(shing.select(F.col("doc_id").alias("id_b"),
                           F.col("__shingles").alias("__sh_b")), "id_b")
    )
    return (
        v.withColumn("jaccard_sim",
                     F.round(dd.jaccard(F.col("__sh_a"), F.col("__sh_b")), 6))
        .filter(F.col("jaccard_sim") >= threshold)
        .select("id_a", "id_b", "jaccard_sim")
    )


def old_bloom_decontaminate(docs):
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("bigint") % 10
    )
    sh = docs.withColumn("b", bucket).select(
        "doc_id", "b", F.explode(dd.shingles_of("text", 4)).alias("g")
    )
    eval_g = sh.filter(F.col("b") == 0).select("g").distinct().localCheckpoint()
    train_sh = sh.filter(F.col("b") != 0)
    maybe = txt.bloom_semi_prefilter(train_sh, "g", eval_g, "g")
    return (
        maybe.join(eval_g, "g")
        .groupBy("doc_id")
        .agg(F.countDistinct("g").alias("n_overlap"))
        .filter(F.col("n_overlap") >= 3)
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("ab-text-r14")
    spark.sparkContext.setLogLevel("ERROR")
    from wms_data_pipeline_spark.plans.queries import REGISTRY, _t, table_rows_hint

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang", "source", "text")
    rows = table_rows_hint(sf_dir, "documents")
    if rows is None or rows > 8_000:
        docs = docs.repartition(spark.sparkContext.defaultParallelism)
    rdocs = docs.select("doc_id", "text")

    variants = {
        "minhash_old": lambda: old_sig_pairs(rdocs),
        "minhash_new": lambda: dd.minhash_neardup_pairs(rdocs, threshold=0.5),
        "bloomdec_old": lambda: old_bloom_decontaminate(rdocs),
        "bloomdec_new": lambda: REGISTRY["txt_bloom_decontaminate"].fn(spark, sf_dir),
        "curation_new": lambda: txt.curation_pipeline_full(
            docs, quality_cutoff=0.5, neardup_threshold=0.5, token_budget=10000
        ),
    }
    for old, new in [("minhash_old", "minhash_new"), ("bloomdec_old", "bloomdec_new")]:
        a = sorted(tuple(r) for r in variants[old]().collect())
        b = sorted(tuple(r) for r in variants[new]().collect())
        assert a == b, f"{old} vs {new} diverged: {len(a)} vs {len(b)} rows"
        print(f"parity OK: {new} ({len(a)} rows)")

    times: dict[str, list[float]] = {k: [] for k in variants}
    for k, fn in variants.items():
        fn().write.format("noop").mode("overwrite").save()
    for _ in range(reps):
        for k, fn in variants.items():
            spark.sparkContext.setJobDescription(f"ab_text {k}")
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            times[k].append(time.perf_counter() - t0)
    for k, ts in times.items():
        print(f"{k:14s} median={statistics.median(ts):6.3f}  reps={[round(t, 3) for t in ts]}")
    spark.stop()


if __name__ == "__main__":
    main()
