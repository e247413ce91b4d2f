"""Fixed-batch / growing-corpus scale study for the persisted-index
operators — the claim under test: steady-state probe cost is O(batch),
~FLAT in corpus/index size (the headline sf0.1 -> sf1 run grows batch
AND corpus together; this isolates the corpus axis).

For each operator: build the index over the sf0.1 corpus and over the
10x sf1 corpus, then probe both with the SAME fixed batch (warmup +
median-of-3, probes adjacent in time). A flat pair proves the
incremental-index story at one decade of corpus growth; a probe that
grows with the corpus is the design claim failing.

Operators: near-dup band-index probe (neardup_incremental),
cross-source contamination probe (source_overlap_probe), quantized-KS
store probe (reference 10x), IVF-PQ persisted-index top-k (corpus 10x).

Run: python tools/bench_scale_incremental.py [sf01_dir] [sf1_dir]
"""

import json
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from wms_data_pipeline_spark.session import get_spark
from wms_data_pipeline_spark.operators import dedup as dd
from wms_data_pipeline_spark.operators import quality as q
from wms_data_pipeline_spark.operators import similarity as sim
from wms_data_pipeline_spark.schemas import load_table


def _timed(mk, reps=3):
    mk().write.format("noop").mode("overwrite").save()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        mk().write.format("noop").mode("overwrite").save()
        ts.append(time.perf_counter() - t0)
    return round(statistics.median(ts), 3)


def main() -> None:
    sf01 = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    sf1 = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scratch/sf1"
    spark = get_spark("bench-scale-incr")
    spark.sparkContext.setLogLevel("ERROR")
    out = {}

    # fixed probe batches, NOT part of either corpus
    docs01 = spark.read.parquet(f"{sf01}/documents.parquet")
    batch = (
        docs01.filter("doc_id < 200")
        .select((F.col("doc_id") + 777_000_000).alias("doc_id"), "text",
                "lang", "source", "n_chars")
        .cache()
    )
    batch.count()

    # --- near-dup band index: corpus 5k vs 50k docs, same 200-doc probe
    times = {}
    for label, sf in (("corpus_sf0.1", sf01), ("corpus_sf1", sf1)):
        corpus = spark.read.parquet(f"{sf}/documents.parquet")
        path = tempfile.mkdtemp(prefix=f"ndidx_{label}_")
        dd.neardup_index_write(corpus, path)
        times[label] = _timed(
            lambda: dd.neardup_incremental(spark, batch, path)
        )
    out["neardup_probe"] = times

    # --- source-overlap contamination probe
    times = {}
    for label, sf in (("corpus_sf0.1", sf01), ("corpus_sf1", sf1)):
        corpus = spark.read.parquet(f"{sf}/documents.parquet")
        path = tempfile.mkdtemp(prefix=f"ovidx_{label}_")
        dd.source_overlap_index_write(corpus, path)
        times[label] = _timed(
            lambda: dd.source_overlap_probe(spark, batch, path)
        )
    out["source_overlap_probe"] = times

    # --- quantized KS store: reference 100k vs 1M events, same batch
    ev01 = load_table(spark, sf01, "events")
    cut = F.lit("2024-01-16 00:00:00").cast("timestamp")
    probe_batch = ev01.filter(F.col("ts") >= cut).cache()
    probe_batch.count()
    times = {}
    for label, sf in (("ref_sf0.1", sf01), ("ref_sf1", sf1)):
        ref = load_table(spark, sf, "events").filter(F.col("ts") < cut)
        path = tempfile.mkdtemp(prefix=f"ksq_{label}_")
        q.ks_reference_write_quantized(ref, "event_type", "value", path)
        times[label] = _timed(
            lambda: q.ks_drift_probe_quantized(
                probe_batch, "event_type", "value", path
            )
        )
    out["ks_quantized_probe"] = times

    # --- IVF-PQ persisted index: corpus 2k vs 20k vectors, same queries
    emb01 = spark.read.parquet(f"{sf01}/embeddings.parquet")
    queries = emb01.filter("vec_id < 20").select(
        F.col("vec_id").alias("query_id"), "embedding"
    ).cache()
    queries.count()
    times = {}
    for label, sf in (("corpus_sf0.1", sf01), ("corpus_sf1", sf1)):
        corpus = spark.read.parquet(f"{sf}/embeddings.parquet")
        path = tempfile.mkdtemp(prefix=f"ivfpq_{label}_")
        sim.ivfpq_index_write(corpus, path)
        times[label] = _timed(
            lambda: sim.ivfpq_index_topk(spark, path, queries, k=10)
        )
    out["ivfpq_index_topk"] = times

    print(json.dumps({"fixed_batch_corpus_scale": out}))
    spark.stop()


if __name__ == "__main__":
    main()
