"""A/B the two pair-dedup strategies inside sketch_banded_neardup
(VERDICT r3 ask #4): band-responsibility bit-filter (no Exchange; commit
c6a4afe) vs candidate dropDuplicates (one Exchange sized by the candidate
set).  Both produce identical pairs; the question is constant factors at
sf0.1 vs scaling behavior at the 1M-vector stress size.

Usage:
  python tools/ab_neardup.py            # sf0.1, registry-pinned 24/6/4
  python tools/ab_neardup.py --stress [copies]   # tiled 1M-vector leg
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from wms_data_pipeline_spark.operators.similarity import sketch_banded_neardup
from wms_data_pipeline_spark.session import get_spark

STRATS = ("band_responsibility", "distinct")


def _time(fn, runs=3):
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def sf_leg(sf_dir: str = "/root/testdata/sf0.1") -> None:
    spark = get_spark("ab-neardup")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(0, 10_000_000, 1, 32).selectExpr("sum(id)").collect()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    counts = {}
    for strat in STRATS:
        df = sketch_banded_neardup(
            emb, n_planes=24, bands=6, band_bits=4, pair_dedup=strat
        )
        counts[strat] = df.count()  # warm + sanity
        t = _time(
            lambda s=strat: sketch_banded_neardup(
                emb, n_planes=24, bands=6, band_bits=4, pair_dedup=s
            ).write.format("noop").mode("overwrite").save()
        )
        print(f"sf0.1  {strat:20s}: {t:.3f}s  ({counts[strat]} pairs)", flush=True)
    assert counts[STRATS[0]] == counts[STRATS[1]], counts
    spark.stop()


def stress_leg(copies: int = 500) -> None:
    spark = get_spark("ab-neardup-stress")
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
        .localCheckpoint()  # materialize once so both strategies read the same input
    )
    total = n * copies
    for strat in STRATS:
        t0 = time.perf_counter()
        cnt = sketch_banded_neardup(
            tiled, hamming_max=5, corpus_count=total, pair_dedup=strat
        ).count()
        dt = time.perf_counter() - t0
        print(
            f"stress {total} vecs  {strat:20s}: {dt:.1f}s  ({cnt} pairs)",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--stress":
        stress_leg(int(sys.argv[2]) if len(sys.argv) > 2 else 500)
    else:
        sf_leg(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1")
