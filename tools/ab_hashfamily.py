"""A/B the minhash base-hash family (VERDICT r4 ask #4): md5 (the
cross-engine oracle anchor — DuckDB reproduces signatures bit-for-bit) vs
xxhash64 (Spark's native codegen intrinsic, the production profile whose
~3× signature-stage claim was asserted but never measured).

Two legs, one warm session each:
- signature stage only (the part the family actually touches): noop-write
  of with_minhash_signature over the tiled corpus, alternating families;
- end-to-end pair detection: minhash_neardup_pairs count per family plus
  the overlap between the two families' verified pair sets (the Jaccard
  verification bounds how far the candidate-recall margin can drift).

Usage: python tools/ab_hashfamily.py [doc_copies]   # default 128 → 640k docs
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from wms_data_pipeline_spark.operators.dedup import (
    minhash_neardup_pairs,
    with_minhash_signature,
)
from wms_data_pipeline_spark.session import get_spark

FAMILIES = ("md5", "xxhash64")


def main(doc_copies: int = 128) -> None:
    spark = get_spark("ab-hashfamily")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select(
        "doc_id", "text"
    )
    n_docs = docs.count()
    copies = spark.range(doc_copies).select(F.col("id").alias("copy"))
    # same disjoint-copy tiling as tools/stress.py: every token rewritten
    # per copy so cross-copy Jaccard ~ 0 and the banded plan is what's
    # measured, not pair materialization
    tiled = (
        docs.crossJoin(copies)
        .select(
            (F.col("doc_id") + F.col("copy") * n_docs).alias("doc_id"),
            F.array_join(
                F.transform(
                    F.split(F.col("text"), " "),
                    lambda t: F.concat(t, F.lit("_"), F.col("copy").cast("string")),
                ),
                " ",
            ).alias("text"),
        )
        .repartition(256)
        .localCheckpoint()  # both families read identical input partitions
    )
    total = n_docs * doc_copies

    # -- signature stage ----------------------------------------------------
    for fam in FAMILIES:  # warm
        with_minhash_signature(
            tiled, drop_source=True, hash_family=fam
        ).write.format("noop").mode("overwrite").save()
    sig_t = {}
    for fam in FAMILIES:
        t0 = time.perf_counter()
        with_minhash_signature(
            tiled, drop_source=True, hash_family=fam
        ).write.format("noop").mode("overwrite").save()
        sig_t[fam] = time.perf_counter() - t0
        print(f"signature stage  {fam:9s}: {sig_t[fam]:6.1f}s  "
              f"({total / sig_t[fam] / 1e3:.0f}k docs/s)", flush=True)
    print(f"signature-stage ratio md5/xxhash64: "
          f"{sig_t['md5'] / sig_t['xxhash64']:.2f}x", flush=True)

    # -- end-to-end pairs ---------------------------------------------------
    pair_sets = {}
    for fam in FAMILIES:
        t0 = time.perf_counter()
        pairs = {
            (r["id_a"], r["id_b"])
            for r in minhash_neardup_pairs(tiled, hash_family=fam)
            .select("id_a", "id_b")
            .collect()
        }
        dt = time.perf_counter() - t0
        pair_sets[fam] = pairs
        print(f"neardup pairs    {fam:9s}: {dt:6.1f}s  ({len(pairs)} pairs)",
              flush=True)
    a, b = pair_sets["md5"], pair_sets["xxhash64"]
    union = len(a | b)
    jac = len(a & b) / union if union else 1.0
    print(f"pair-set overlap (Jaccard): {jac:.4f}  "
          f"(md5-only {len(a - b)}, xxhash64-only {len(b - a)})", flush=True)
    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 128)
