"""Prove the incremental near-dup path's cost scales with the DELTA, not
the corpus (VERDICT r5 #6): index a large tiled corpus once, then probe
deltas of increasing size and compare each probe against a full
minhash_neardup_pairs recompute over corpus ∪ delta — the cost a daily
pipeline pays WITHOUT the index.

Tiling gives disjoint copies (cross-copy Jaccard ~ 0), and each delta is
a fresh tile whose docs duplicate a slice of the corpus tile (token-level
near-identical), so probes find real cross-corpus pairs, not only
delta-internal ones.

Usage: python tools/ab_neardup_incremental.py [corpus_copies] [delta_sizes]
       defaults: 32 copies (160k docs), deltas 1000,4000,16000
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from wms_data_pipeline_spark.operators.dedup import (
    minhash_neardup_pairs,
    neardup_incremental,
    neardup_index_write,
)
from wms_data_pipeline_spark.session import get_spark


def tile(docs, n_docs: int, copies: int, copy_offset: int):
    cdf = (
        docs.sparkSession.range(copies)
        .select((F.col("id") + copy_offset).alias("copy"))
    )
    return (
        docs.crossJoin(cdf)
        .select(
            (F.col("doc_id") + F.col("copy") * n_docs).alias("doc_id"),
            F.array_join(
                F.transform(
                    F.split(F.col("text"), " "),
                    lambda t: F.concat(t, F.lit("_"), (F.col("copy") % 32).cast("string")),
                ),
                " ",
            ).alias("text"),
        )
        .repartition(64)
        .localCheckpoint()
    )


def main(corpus_copies: int = 32, delta_sizes=(1000, 4000, 16000)) -> None:
    spark = get_spark("ab-neardup-incremental")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select(
        "doc_id", "text"
    )
    n_docs = docs.count()
    corpus = tile(docs, n_docs, corpus_copies, 0)
    corpus_n = corpus.count()
    work = tempfile.mkdtemp(prefix="ab_nd_idx_")
    try:
        t0 = time.perf_counter()
        neardup_index_write(corpus, work)
        build = time.perf_counter() - t0
        print(f"index build over {corpus_n} docs: {build:.1f}s (paid once)", flush=True)

        # delta tiles reuse copy indices mod 32 → token suffixes collide with
        # corpus copies → real cross-corpus near-dup pairs exist
        for ds in delta_sizes:
            copies_needed = max(1, (ds + n_docs - 1) // n_docs)
            delta = tile(docs, n_docs, copies_needed, corpus_copies).filter(
                F.col("doc_id") < corpus_copies * n_docs + ds
            ).localCheckpoint()
            dn = delta.count()

            t0 = time.perf_counter()
            inc_pairs = neardup_incremental(spark, delta, work, threshold=0.5).count()
            inc = time.perf_counter() - t0

            t0 = time.perf_counter()
            full = minhash_neardup_pairs(
                corpus.unionByName(delta), threshold=0.5
            )
            d_ids = delta.select(F.col("doc_id"))
            full_pairs = (
                full.join(d_ids.withColumnRenamed("doc_id", "id_a"), "id_a", "left_semi")
                .unionByName(
                    full.join(
                        d_ids.withColumnRenamed("doc_id", "id_b"), "id_b", "left_semi"
                    )
                )
                .dropDuplicates(["id_a", "id_b"]).count()
            )
            recompute = time.perf_counter() - t0
            print(
                f"delta {dn:6d} docs: incremental {inc:6.1f}s ({inc_pairs} pairs) "
                f"vs full recompute {recompute:6.1f}s ({full_pairs} delta-touching pairs) "
                f"= {recompute / inc:.1f}x",
                flush=True,
            )
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    sizes = (
        tuple(int(x) for x in sys.argv[2].split(","))
        if len(sys.argv) > 2
        else (1000, 4000, 16000)
    )
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 32, sizes)
