"""A/B: closure-dict vs explode+join classifier inference at a 2M-row
vocabulary (VERDICT r12 #3 'Done' evidence).

Vocabulary = every real token of the sf documents corpus (hex64-derived
integer milliweights, the engine's reproducible convention) padded with
synthetic never-matching tokens to MAX_CLASSIFIER_VOCAB — so the join
probes a realistically sparse table and the closure dict carries the
full advertised size. The corpus is tiled 16x so per-doc work dominates
the scheduling floor. Correctness: both paths' (doc, wsum) sums must be
identical before timings count.

Run: python tools/ab_classifier_join.py [sf_dir]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from wms_data_pipeline_spark.session import get_spark
from wms_data_pipeline_spark.operators import text as txt


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("ab-classifier-join")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    tiled = (
        docs.crossJoin(spark.range(16).select(F.col("id").alias("rep")))
        .select(
            (F.col("doc_id") * 16 + F.col("rep")).alias("doc_id"), "text"
        )
        .repartition(32)
        .cache()
    )
    n_docs = tiled.count()

    real = (
        docs.select(F.explode(txt.tokens_of("text")).alias("tok"))
        .distinct()
        .select(
            "tok",
            (txt.hex64(F.col("tok")) % 1001 - 500).cast("long").alias("w"),
        )
    )
    n_real = real.count()
    pad = spark.range(txt.MAX_CLASSIFIER_VOCAB - n_real).select(
        F.concat(F.lit("zzznever"), F.col("id")).alias("tok"),
        (F.col("id") % 1001 - 500).cast("long").alias("w"),
    )
    vocab = real.unionByName(pad).cache()
    n_vocab = vocab.count()

    def run(strategy):
        out = txt.classifier_score(
            tiled, weights=vocab, id_col="doc_id", strategy=strategy
        )
        out.write.format("noop").mode("overwrite").save()  # warm codegen
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            txt.classifier_score(
                tiled, weights=vocab, id_col="doc_id", strategy=strategy
            ).write.format("noop").mode("overwrite").save()
            times.append(round(time.perf_counter() - t0, 3))
        chk = (
            txt.classifier_score(
                tiled, weights=vocab, id_col="doc_id", strategy=strategy
            )
            .agg(F.sum("wsum"), F.sum("n_tokens"))
            .collect()[0]
        )
        return sorted(times)[1], times, (int(chk[0]), int(chk[1]))

    join_med, join_times, join_chk = run("join")
    closure_med, closure_times, closure_chk = run("closure")
    assert join_chk == closure_chk, (join_chk, closure_chk)
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "n_docs": n_docs,
                "n_vocab": n_vocab,
                "checksum": join_chk,
                "closure_sec": closure_med,
                "closure_reps": closure_times,
                "join_sec": join_med,
                "join_reps": join_times,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
