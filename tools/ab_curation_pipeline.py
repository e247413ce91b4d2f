"""Scale measurement of the COMPOSED curation pipeline (VERDICT r6 #6's
operator, `text.curation_pipeline_full`): the sf0.1 documents table tiled
``copies`` times with per-copy id offsets and a deterministic text
perturbation (a copy-tagged token appended, so exact dedup does not simply
collapse the tiling and near-dup still finds the planted cross-copy
near-duplicates), run end-to-end through all six stages as one plan.

Prints per-leg wall time, output rows, and the stage survival ledger
(quality → exact dedup → near-dup → decontam → budget) so a corpus-size
sweep shows which stage's cost grows and which stage's selectivity holds.

Usage: python tools/ab_curation_pipeline.py [copies ...]
       (default sweep: 16 64 128 -> 80k / 320k / 640k docs)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from wms_data_pipeline_spark.operators import text as txt
from wms_data_pipeline_spark.schemas import load_table
from wms_data_pipeline_spark.session import get_spark


def tiled_docs(spark, copies: int):
    """Tile with REALISTIC duplicate structure: every 16th copy keeps the
    base text (a light tile tag appended) so near-dup clusters have
    bounded size ~copies/16, while the other copies replace every 3rd
    word with a copy-specific token — enough shingle churn to fall below
    the 0.5 Jaccard threshold, so they are DISTINCT docs. A naive
    all-copies-near-dup tiling makes the verified pair count grow as
    copies² x base (every doc near-dups all its tiles) — a dup-cluster
    blowup no real corpus has, which swamped the sweep's 640k leg and
    measured the generator, not the pipeline."""
    base = load_table(spark, "/root/testdata/sf0.1", "documents").select(
        "doc_id", "lang", "source", "text"
    )
    n = base.count()
    cdf = spark.range(copies).select(F.col("id").alias("copy"))
    toks = F.split(F.col("text"), r"\s+")
    mutated = F.array_join(
        F.transform(
            toks,
            lambda t, i: F.when(
                i % 3 == 0,
                F.concat(
                    F.lit("w"),
                    (F.col("copy") % 16).cast("string"),
                    F.lit("_"),
                    i.cast("string"),
                ),
            ).otherwise(t),
        ),
        " ",
    )
    tiled_text = F.when(
        F.col("copy") % 16 == 0,
        F.concat_ws(" ", F.col("text"), F.concat(F.lit("tile"), F.col("copy"))),
    ).otherwise(mutated)
    return (
        base.crossJoin(cdf)
        .select(
            (F.col("doc_id") + F.col("copy") * n).alias("doc_id"),
            "lang",
            "source",
            tiled_text.alias("text"),
        )
        .repartition(64)
    ), n * copies


def main() -> None:
    sweeps = [int(a) for a in sys.argv[1:]] or [16, 64, 128]
    spark = get_spark("ab-curation-pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    for copies in sweeps:
        docs, total = tiled_docs(spark, copies)
        docs = docs.localCheckpoint()  # isolate generation cost from the run
        t0 = time.perf_counter()
        out = txt.curation_pipeline_full(docs, token_budget=10_000 * copies)
        kept = out.count()
        wall = round(time.perf_counter() - t0, 1)
        splits = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
        print(
            json.dumps(
                {
                    "docs": total,
                    "copies": copies,
                    "wall_sec": wall,
                    "kept_rows": kept,
                    "splits": splits,
                    "docs_per_sec": round(total / wall),
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
