"""A/B scale measurements for the round-8 operators.

Legs (pick with argv[1], default all):

- ``skyline``  : two-stage skyline_2d vs the single-window SQL form at
  5M correlated points + survivor counts on an anti-correlated corpus.
- ``pagerank`` : iterations scaling on a 100k-node / 2M-edge synthetic
  graph, with and without lineage checkpointing.
- ``bloom``    : decontamination prefilter — shuffle-row reduction and
  wall vs the exact-join form at sf0.1.
- ``jpeg``     : codec throughput (encode + decode, images/s single
  core) at the test-corpus image sizes.
- ``zorder``   : parquet row-group pruning for a 2-D box predicate,
  natural vs Z-ordered layout at sf0.1.

Deterministic inputs throughout (hash-derived, no RNG state).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F


def _spark():
    return (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )


def leg_skyline(spark):
    from wms_data_pipeline_spark.operators import graph as gr

    n = 5_000_000
    # correlated cloud (realistic: price and date correlate): x = h1,
    # y = h1/4 + noise(h2) — front is small
    pts = spark.range(n).select(
        (F.abs(F.xxhash64("id")) % 1_000_000).alias("x"),
        (
            (F.abs(F.xxhash64("id")) % 1_000_000) / 4
            + F.abs(F.xxhash64("id", F.lit(1))) % 250_000
        ).cast("long").alias("y"),
    ).localCheckpoint()
    t0 = time.time()
    k = gr.skyline_2d(pts, "x", "y").count()
    t_two = time.time() - t0
    t0 = time.time()
    k2 = spark.sql(
        """
        WITH w AS (SELECT *,
          min(y) OVER (ORDER BY x RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS m1,
          min(y) OVER (PARTITION BY x ORDER BY y ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS m2
        FROM {pts})
        SELECT count(*) FROM w
        WHERE (m1 IS NULL OR m1 > y) AND (m2 IS NULL OR m2 >= y)
        """,
        pts=pts,
    ).collect()[0][0]
    t_win = time.time() - t0
    assert k == k2, (k, k2)
    print(
        f"skyline 5M correlated: front={k}; two-stage {t_two:.2f}s vs "
        f"single-window {t_win:.2f}s"
    )
    # survivor volume on the adversarial shape (why the guard exists)
    diag = spark.range(200_000).selectExpr("id AS x", "199999 - id AS y")
    surv = gr.skyline_2d(diag.repartition(32), "x", "y").count()
    print(f"skyline 200k anti-correlated: every point survives ({surv})")


def leg_pagerank(spark):
    from wms_data_pipeline_spark.operators import graph as gr

    n_nodes, n_edges = 100_000, 2_000_000
    edges = spark.range(n_edges).select(
        (F.abs(F.xxhash64("id")) % n_nodes).alias("src"),
        (F.abs(F.xxhash64("id", F.lit(1))) % n_nodes).alias("dst"),
        (F.abs(F.xxhash64("id", F.lit(2))) % 10 + 1).alias("weight"),
    ).localCheckpoint()
    for iters, ck in ((5, 4), (10, 4), (10, 10_000)):
        t0 = time.time()
        out = gr.pagerank(edges, iterations=iters, checkpoint_every=ck)
        total = out.agg(F.sum("rank_scaled")).collect()[0][0]
        dt = time.time() - t0
        label = "ckpt/4" if ck == 4 else "no-ckpt"
        print(
            f"pagerank 100k nodes / 2M edges, {iters} iters ({label}): "
            f"{dt:.2f}s, mass {total / gr.PR_SCALE:.6f}"
        )


def leg_bloom(spark, sf_dir="/root/testdata/sf0.1"):
    from wms_data_pipeline_spark.operators import dedup as dd
    from wms_data_pipeline_spark.operators import text as txt
    from wms_data_pipeline_spark.schemas import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    docs = docs.repartition(32)
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("bigint")
        % 10
    )
    sh = docs.withColumn("b", bucket).select(
        "doc_id", "b", F.explode(dd.shingles_of("text", 4)).alias("g")
    ).localCheckpoint()
    eval_g = sh.filter(F.col("b") == 0).select("g").distinct().localCheckpoint()
    train = sh.filter(F.col("b") != 0)
    n_train = train.count()
    t0 = time.time()
    exact = (
        train.join(eval_g, "g").groupBy("doc_id")
        .agg(F.countDistinct("g").alias("n")).filter("n >= 3").count()
    )
    t_exact = time.time() - t0
    t0 = time.time()
    maybe = txt.bloom_semi_prefilter(train, "g", eval_g, "g").localCheckpoint()
    n_maybe = maybe.count()
    blm = (
        maybe.join(eval_g, "g").groupBy("doc_id")
        .agg(F.countDistinct("g").alias("n")).filter("n >= 3").count()
    )
    t_bloom = time.time() - t0
    assert exact == blm, (exact, blm)
    print(
        f"bloom decontam {sf_dir}: train shingles {n_train}, "
        f"maybe-set {n_maybe} ({100 * n_maybe / n_train:.2f}% reach the "
        f"shuffle), flagged {exact}; exact {t_exact:.2f}s vs "
        f"bloom+confirm {t_bloom:.2f}s"
    )


def leg_jpeg():
    import numpy as np

    from wms_data_pipeline_spark.operators import multimodal as mm

    rng = np.random.default_rng(7)
    sizes = [(24, 16), (64, 64), (256, 256)]
    for w, h in sizes:
        gray = rng.integers(0, 256, w * h, dtype=np.uint8).tobytes()
        t0 = time.time()
        n_enc = 0
        while time.time() - t0 < 2.0:
            blob = mm.encode_jpeg(w, h, gray)
            n_enc += 1
        enc_rate = n_enc / (time.time() - t0)
        t0 = time.time()
        n_dec = 0
        while time.time() - t0 < 2.0:
            mm._decode_jpeg(blob)
            n_dec += 1
        dec_rate = n_dec / (time.time() - t0)
        print(
            f"jpeg {w}x{h}: encode {enc_rate:.1f}/s, decode {dec_rate:.1f}/s "
            f"single-core ({len(blob)} B)"
        )




def leg_zorder(spark, sf_dir="/root/testdata/sf0.1"):
    """Data-skipping economics: lineitem written naturally vs Z-ordered
    on (l_partkey, l_suppkey), then a 2-D box predicate scanned on each.
    Reports parquet row-groups whose min/max CANNOT be pruned (pyarrow
    footer walk) and the measured scan wall."""
    import glob
    import shutil
    import tempfile

    import pyarrow.parquet as pq

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from wms_data_pipeline_spark.operators import relational as rel
    from wms_data_pipeline_spark.schemas import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity"
    )
    work = tempfile.mkdtemp(prefix="wms_zorder_ab_")
    nat, zo = os.path.join(work, "nat"), os.path.join(work, "zo")
    li.repartition(32).write.parquet(nat)
    rel.zorder_layout(li, ["l_partkey", "l_suppkey"], bits=16).write.parquet(zo)

    # 2-D box: a 1/8 slice of each dimension
    pk_max = li.agg(F.max("l_partkey")).collect()[0][0]
    sk_max = li.agg(F.max("l_suppkey")).collect()[0][0]
    pk_lo, pk_hi = pk_max // 2, pk_max // 2 + pk_max // 8
    sk_lo, sk_hi = sk_max // 2, sk_max // 2 + sk_max // 8

    def rg_stats(path):
        total = live = 0
        for f in glob.glob(os.path.join(path, "*.parquet")):
            meta = pq.ParquetFile(f).metadata
            for rg in range(meta.num_row_groups):
                g = meta.row_group(rg)
                cols = {
                    g.column(i).path_in_schema: g.column(i).statistics
                    for i in range(g.num_columns)
                }
                total += 1
                pk, sk = cols["l_partkey"], cols["l_suppkey"]
                if (
                    pk.min <= pk_hi and pk.max >= pk_lo
                    and sk.min <= sk_hi and sk.max >= sk_lo
                ):
                    live += 1
        return total, live

    def scan(path):
        t0 = time.time()
        n = (
            spark.read.parquet(path)
            .filter(
                (F.col("l_partkey").between(pk_lo, pk_hi))
                & (F.col("l_suppkey").between(sk_lo, sk_hi))
            )
            .count()
        )
        return n, time.time() - t0

    for label, path in (("natural", nat), ("zorder", zo)):
        total, live = rg_stats(path)
        n, dt = scan(path)
        print(
            f"zorder A/B {label}: {live}/{total} row-groups survive the "
            f"2-D box min/max prune, scan {dt:.2f}s, {n} rows"
        )
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("jpeg", "all"):
        leg_jpeg()
    if which in ("skyline", "pagerank", "bloom", "zorder", "all"):
        spark = _spark()
        if which in ("skyline", "all"):
            leg_skyline(spark)
        if which in ("pagerank", "all"):
            leg_pagerank(spark)
        if which in ("bloom", "all"):
            leg_bloom(spark)
        if which in ("zorder", "all"):
            leg_zorder(spark)
