"""Scale-up stress: run the engine's hottest operators at 100-1000× the
bench scale on synthetic data, printing rows/sec. This is the "would the
plan survive a 100× scale-up" check — same plan shapes as the sf0.1 bench,
only the volume changes.

Usage: python tools/stress.py [n_events_millions] [doc_copies]
  default: 50M events; documents table (sf0.1, 5k docs) tiled 128× → 640k
  docs for the MinHash+LSH pair stage.

       python tools/stress.py --embeddings [copies]
  tiles sf0.1 embeddings with per-vector decorrelating noise and runs the
  sketch-banded near-dup at scale (500 copies → 1M vectors) with the
  widened 60-bit/10-bit-band sketch (band_bits ≈ log2(n) − 7; exactness
  needs bands ≥ hamming_max + 1). Run with SPARK_GRAFT_DRIVER_MEM=64g.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from wms_data_pipeline_spark.operators.dedup import minhash_neardup_pairs
from wms_data_pipeline_spark.operators.merge import latest_merge
from wms_data_pipeline_spark.session import get_spark


def embeddings_stress(copies: int = 500) -> None:
    from wms_data_pipeline_spark.operators.similarity import sketch_banded_neardup

    spark = get_spark("stress-embeddings")
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    n = emb.count()
    cdf = spark.range(copies).select(F.col("id").alias("copy"))
    tiled = (
        emb.crossJoin(cdf)
        .select(
            (F.col("vec_id") + F.col("copy") * n).alias("vec_id"),
            F.expr(
                "transform(embedding, (x, i) -> x + cast(pmod("
                f"xxhash64((vec_id + copy * {n}) * 64 + i), 1000) as double)"
                " / 500.0 - 1.0)"
            ).alias("embedding"),
        )
        .repartition(256)
    )
    total = n * copies
    # Auto-sizing is the operator default; corpus_count passed explicitly so
    # the geometry choice costs no extra count job. At 1M vectors this
    # derives the stress-proven 60-bit / 6x10-bit config.
    from wms_data_pipeline_spark.operators.similarity import auto_band_config

    cfg = auto_band_config(total, hamming_max=5)
    t0 = time.perf_counter()
    cnt = sketch_banded_neardup(
        tiled, hamming_max=5, corpus_count=total
    ).count()
    dt = time.perf_counter() - t0
    print(
        f"sketch_banded_neardup over {total} vectors "
        f"(auto config n_planes/bands/band_bits={cfg}): {dt:.1f}s "
        f"({cnt} pairs; all-pairs would be {total * (total - 1) // 2:.1e})",
        flush=True,
    )
    spark.stop()


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--embeddings":
        embeddings_stress(int(sys.argv[2]) if len(sys.argv) > 2 else 500)
        return
    n_events = int(float(sys.argv[1]) * 1e6) if len(sys.argv) > 1 else 50_000_000
    doc_copies = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    spark = get_spark("stress")
    spark.sparkContext.setLogLevel("ERROR")

    # -- synthetic out-of-order event stream: 1M keys, shuffled times ------
    ev = (
        spark.range(0, n_events, 1, 256)
        .select(
            F.col("id").alias("event_id"),
            (F.col("id") % 1_000_000).alias("user_id"),
            F.timestamp_micros(
                F.lit(1_700_000_000_000_000)
                + (F.xxhash64(F.col("id")) % 86_400_000_000)
            ).alias("ts"),
            (F.xxhash64(F.col("id"), F.lit(1)) % 97).cast("double").alias("value"),
        )
    )

    def run(label, df):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        print(f"{label}: {dt:.1f}s  {n_events / dt / 1e6:.2f}M rows/s", flush=True)

    latest = latest_merge(
        None, ev, key="user_id", ts_col="ts", tiebreak_col="event_id"
    )
    run("latest_state (1-pass window keep-newest)", latest)

    dedup = ev.dropDuplicates(["user_id", "ts"])
    run("exact keyed dedup", dedup)

    tumbling = ev.groupBy(F.window("ts", "10 minutes"), "user_id").agg(
        F.count(F.lit(1)).alias("n"), F.sum("value").alias("v")
    )
    run("tumbling-window agg", tumbling)

    # -- MinHash+LSH pairs at doc_copies × the sf0.1 corpus ----------------
    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select(
        "doc_id", "text"
    )
    n_docs = docs.count()
    copies = spark.range(doc_copies).select(F.col("id").alias("copy"))
    tiled = (
        docs.crossJoin(copies)
        .select(
            (F.col("doc_id") + F.col("copy") * n_docs).alias("doc_id"),
            # perturb per copy so tiles aren't trivial exact duplicates
            F.concat_ws(" ", F.col("text"), F.col("copy").cast("string")).alias("text"),
        )
        .repartition(256)
    )
    total_docs = n_docs * doc_copies
    t0 = time.perf_counter()
    n_pairs = minhash_neardup_pairs(tiled).count()
    dt = time.perf_counter() - t0
    print(
        f"minhash_neardup_pairs over {total_docs} docs: {dt:.1f}s  "
        f"{total_docs / dt / 1e3:.0f}k docs/s  ({n_pairs} pairs)",
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
