"""Round-10 A/B measurements (VERDICT r9 #4):

- ``wedges``  : the triangle census' wedge generation as the self-JOIN on
  the oriented src key (current plan, 2 exchanges at the join) vs the
  node-iterator formulation (Suri & Vassilvitskii's "node iterator++",
  public method): ONE shuffle aggregates each lo's out-neighbors into a
  (dhi, hi)-sorted array, then wedges are generated MAP-SIDE by a double
  posexplode (i < j). Candidate count is identical (C(outdeg, 2) per lo,
  outdeg bounded O(sqrt m) by the orientation); the difference is one
  exchange of the oriented edge list and the join machinery.
  (The repartition("lo")-before-localCheckpoint trick elides both wedge
  exchanges with AQE off, but AQE — the engine default — replans from the
  logical plan and does not trust LogicalRDD partitioning, so it buys
  nothing in practice; measured, see SCALE_NOTES r10.)
- ``scaling`` : census wall at 1x/2x/4x the sf0.1 co-purchase edge count
  on a synthetic graph with matched degree shape — confirms the wedge
  stage grows as sum(outdeg^2), not worse.

Usage: python tools/ab_round10_ops.py [wedges|scaling|classifier|interval|edges|all]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def _spark():
    return (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )


def _copurchase_edges(spark, sf_dir="/root/testdata/sf0.1"):
    from wms_data_pipeline_spark.schemas import load_table

    li = load_table(spark, sf_dir, "lineitem")
    bi = li.select(
        F.col("l_orderkey").alias("bk"), F.col("l_partkey").alias("it")
    ).distinct()
    rhs = bi.select(F.col("bk"), F.col("it").alias("it2"))
    return (
        bi.join(rhs, "bk")
        .filter(F.col("it") < F.col("it2"))
        .select(F.col("it").alias("src"), F.col("it2").alias("dst"))
        .distinct()
    )


def _census_with_wedges(oriented, wedge_fn):
    wedge = wedge_fn(oriented).select("y", "z")
    closure = oriented.select(F.col("lo").alias("y"), F.col("hi").alias("z"))
    return (
        wedge.join(closure, ["y", "z"], "left_semi")
        .agg(F.count(F.lit(1)))
        .collect()[0][0]
    )


def _wedges_join(oriented):
    """The pre-round-10 wedge plan: self-join of the oriented edge list
    on lo, ordered by the (dhi, hi) comparison — kept inline here as the
    A/B baseline after graph.py adopted the explode formulation."""
    o2 = oriented.select(
        F.col("lo").alias("lo"),
        F.col("hi").alias("hi2"),
        F.col("dhi").alias("dhi2"),
    )
    return (
        oriented.join(o2, "lo")
        .filter(
            (F.col("dhi") < F.col("dhi2"))
            | ((F.col("dhi") == F.col("dhi2")) & (F.col("hi") < F.col("hi2")))
        )
        .select("lo", F.col("hi").alias("y"), F.col("hi2").alias("z"))
    )


def _wedges_explode(oriented):
    from wms_data_pipeline_spark.operators.graph import _ordered_wedges

    return _ordered_wedges(oriented)


def leg_wedges(spark):
    from wms_data_pipeline_spark.operators.graph import _orient_edges

    edges = _copurchase_edges(spark)
    _und, _deg, oriented, _nn, _ne = _orient_edges(edges, "src", "dst")
    n_or = oriented.count()
    results = {}
    for label, fn in (("join", _wedges_join), ("explode", _wedges_explode)):
        # warmup then median-ish best-of-3 on the wedge+closure stage only
        walls = []
        tri = None
        for _ in range(3):
            t0 = time.time()
            tri = _census_with_wedges(oriented, fn)
            walls.append(time.time() - t0)
        results[label] = (sorted(walls)[1], tri)
        print(
            f"AB wedges[{label}]: census {tri:,} triangles, "
            f"wedge+closure stage median {sorted(walls)[1]:.2f}s "
            f"(reps {[f'{w:.2f}' for w in walls]})"
        )
    (tj, nj), (te, ne) = results["join"], results["explode"]
    assert nj == ne, f"variant mismatch: {nj} vs {ne}"
    print(
        f"AB wedges: oriented edges {n_or:,}; join {tj:.2f}s vs "
        f"explode {te:.2f}s -> explode is {tj / te:.2f}x"
    )


def leg_scaling(spark):
    """Synthetic graphs with the co-purchase DEGREE SHAPE held fixed
    (item space scales with basket count), sized 1x/2x/4x the sf0.1
    co-purchase graph's ~1.2M edges: with the shape fixed, sum(outdeg^2)
    grows ~linearly, so census wall growing ~linearly CONFIRMS the wedge
    stage is sum(outdeg^2)-bound — super-linear wall growth would mean a
    hidden worse-than-candidate-count cost."""
    from wms_data_pipeline_spark.operators import graph as gr

    for mult in (1, 2, 4):
        n_baskets = 60_000 * mult
        bi = spark.range(n_baskets * 7).select(
            (F.col("id") % n_baskets).alias("bk"),
            (F.abs(F.xxhash64("id")) % (30_000 * mult)).alias("it"),
        ).distinct()
        rhs = bi.select("bk", F.col("it").alias("it2"))
        edges = (
            bi.join(rhs, "bk")
            .filter(F.col("it") < F.col("it2"))
            .select(F.col("it").alias("src"), F.col("it2").alias("dst"))
            .distinct()
            .localCheckpoint()
        )
        m = edges.count()
        _und, _deg, oriented, _nn, _ne = gr._orient_edges(edges, "src", "dst")
        wedge_work = (
            oriented.groupBy("lo")
            .agg(F.count(F.lit(1)).alias("od"))
            .agg(F.sum(F.expr("od * od")))
            .collect()[0][0]
        )
        t0 = time.time()
        row = gr.triangle_stats(edges).collect()[0]
        dt = time.time() - t0
        print(
            f"AB scaling x{mult}: edges {m:,}, sum(outdeg^2) "
            f"{wedge_work:,}, census {row['n_triangles']:,} triangles "
            f"in {dt:.2f}s"
        )




def leg_classifier(spark):
    """Classifier inference: the aggregate-HOF codegen fold
    (operators/text.py classifier_score) vs the SAME arithmetic as an
    Arrow-batched pandas UDF — quantifies what keeping model inference
    JVM-side is worth. Both legs compute identical (wsum, n_tokens,
    score) over the sf0.1 documents tiled 8x (~40k docs is too small to
    separate the legs from session noise; tiling the text column keeps
    token distribution realistic)."""
    import time

    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    from wms_data_pipeline_spark.operators import text as txt
    from wms_data_pipeline_spark.schemas import load_table

    docs = load_table(spark, "/root/testdata/sf0.1", "documents").select(
        "doc_id", "text"
    )
    tiles = spark.range(8).select(F.col("id").alias("tile"))
    big = (
        docs.crossJoin(F.broadcast(tiles))
        .select((F.col("doc_id") * 8 + F.col("tile")).alias("doc_id"), "text")
        .localCheckpoint()
    )
    n = big.count()

    def _wsum_series(texts):
        import hashlib

        def one(t):
            s = 0
            for tok in (t or "").split():
                h = int(hashlib.md5(tok.encode()).hexdigest()[:15], 16)
                s += h % 1001 - 500
            return s

        return texts.map(one)

    # explicit Series->Series eval type: the module-level
    # `from __future__ import annotations` stringifies type hints, which
    # Spark's hint-based inference rejects
    wsum_udf = pandas_udf(_wsum_series, "long", PandasUDFType.SCALAR)

    def codegen():
        return txt.classifier_score(big).agg(
            F.sum("wsum"), F.sum("quality_score")
        ).collect()

    def arrow_udf():
        toks = F.split(F.trim(F.col("text")), r"\s+")
        nt = F.when(F.trim(F.col("text")) == "", 0).otherwise(F.size(toks))
        wsum = wsum_udf(F.col("text"))
        score = F.round(
            F.lit(1.0)
            / (
                F.lit(1.0)
                + F.exp(
                    -F.when(nt > 0, wsum / (nt * F.lit(250.0))).otherwise(
                        F.lit(0.0)
                    )
                )
            ),
            6,
        )
        return big.select(wsum.alias("wsum"), score.alias("q")).agg(
            F.sum("wsum"), F.sum("q")
        ).collect()

    # --- vocabulary-weight legs: the DEPLOYED shape (a trained model's
    # weight table) — weights live in a 10k-token vocab; unseen tokens
    # weigh 0. Compared as (c) explode + broadcast-join + re-agg (the
    # all-JVM distributed form) vs (d) Arrow UDF with a driver dict.
    toks_col = F.split(F.trim(F.col("text")), r"\s+")
    vocab = (
        big.select(F.explode(toks_col).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "tok")
        .limit(10_000)
        .select("tok", (txt.hex64(F.col("tok")) % 1001 - 500).alias("w"))
        .localCheckpoint()
    )
    wmap = {r["tok"]: r["w"] for r in vocab.collect()}

    def vocab_join():
        per_tok = big.select(
            "doc_id", F.explode(toks_col).alias("tok"), F.size(toks_col).alias("nt")
        )
        scored = (
            per_tok.join(F.broadcast(vocab), "tok", "left")
            .groupBy("doc_id", "nt")
            .agg(F.sum(F.coalesce(F.col("w"), F.lit(0))).alias("wsum"))
            .select(
                "wsum",
                F.round(
                    F.lit(1.0)
                    / (F.lit(1.0) + F.exp(-(F.col("wsum") / (F.col("nt") * F.lit(250.0))))),
                    6,
                ).alias("q"),
            )
        )
        return scored.agg(F.sum("wsum"), F.sum("q")).collect()

    def _wsum_dict_series(texts):
        def one(t):
            s = 0
            for tok in (t or "").split():
                s += wmap.get(tok, 0)
            return s

        return texts.map(one)

    wsum_dict_udf = pandas_udf(_wsum_dict_series, "long", PandasUDFType.SCALAR)

    def vocab_udf():
        nt = F.when(F.trim(F.col("text")) == "", 0).otherwise(F.size(toks_col))
        wsum = wsum_dict_udf(F.col("text"))
        score = F.round(
            F.lit(1.0)
            / (F.lit(1.0) + F.exp(-F.when(nt > 0, wsum / (nt * F.lit(250.0))).otherwise(F.lit(0.0)))),
            6,
        )
        return big.select(wsum.alias("wsum"), score.alias("q")).agg(
            F.sum("wsum"), F.sum("q")
        ).collect()

    for label, fn in (("codegen-fold", codegen), ("pandas-udf", arrow_udf),
                      ("vocab-bcast-join", vocab_join), ("vocab-udf-dict", vocab_udf)):
        fn()  # warmup
        walls = []
        for _ in range(3):
            t0 = time.time()
            out = fn()
            walls.append(time.time() - t0)
        walls.sort()
        print(
            f"classifier {label}: {n} docs, median {walls[1]:.2f}s "
            f"({n/walls[1]/1000:.0f}k docs/s), reps={[round(w,2) for w in walls]}, "
            f"checksum={tuple(out[0])}"
        )




def leg_interval(spark):
    """interval_overlap_join: binned-equi-join plan vs broadcast NLJ theta
    join across right-side cardinalities — locates the auto-dispatch
    crossover the operator's strategy="auto" threshold encodes. Left side
    fixed at 500k session-shaped intervals (~35 min long, 30-day span);
    right side campaign-shaped 12h windows. Pair counts asserted equal."""
    import time

    from pyspark.sql import functions as F

    from wms_data_pipeline_spark.operators import relational as rel

    def intervals(n, dur_min, label):
        # deterministic spread over 30 days starting 2024-01-01
        return (
            spark.range(n)
            .select(
                F.col("id").alias(f"{label}_id"),
                F.timestamp_micros(
                    F.lit(1704067200000000)
                    + (F.col("id") * 7919) % (30 * 86400) * 1000000
                ).alias("start_ts"),
            )
            .withColumn(
                "end_ts",
                F.timestamp_micros(
                    F.unix_micros("start_ts") + dur_min * 60 * 1000000
                ),
            )
            .localCheckpoint()
        )

    left = intervals(500_000, 35, "s")
    for m in (1_000, 5_000, 20_000):
        right = intervals(m, 12 * 60, "c")
        walls = {}
        counts = {}
        for strategy in ("bin", "nlj"):
            fn = lambda: rel.interval_overlap_join(
                left, right, strategy=strategy
            ).count()
            counts[strategy] = fn()  # warmup + count check
            ts = []
            for _ in range(3):
                t0 = time.time()
                fn()
                ts.append(time.time() - t0)
            ts.sort()
            walls[strategy] = ts[1]
        assert counts["bin"] == counts["nlj"], (m, counts)
        print(
            f"interval 500k x {m}: pairs={counts['bin']:,} "
            f"bin={walls['bin']:.2f}s nlj={walls['nlj']:.2f}s "
            f"ratio nlj/bin={walls['nlj']/walls['bin']:.2f}"
        )




def leg_edges(spark):
    """Co-purchase EDGE GENERATION: the historical basket self-join
    (distinct(bi) -> join on bk -> it<it2 -> distinct, 4 exchanges) vs
    the node-iterator form applied one level earlier (groupBy bk
    collect_set directly on the scan -> sorted array -> double
    posexplode i<j -> distinct, 2 exchanges). Same trick that won the
    wedge stage (SCALE_NOTES r10); edge sets asserted identical."""
    import time

    from pyspark.sql import functions as F

    from wms_data_pipeline_spark.schemas import load_table

    li = load_table(spark, "/root/testdata/sf0.1", "lineitem").select(
        F.col("l_orderkey").alias("bk"), F.col("l_partkey").alias("it")
    ).localCheckpoint()

    def joinform():
        bi = li.distinct()
        rhs = bi.select(F.col("bk"), F.col("it").alias("it2"))
        return (
            bi.join(rhs, "bk")
            .filter(F.col("it") < F.col("it2"))
            .select(F.col("it").alias("src"), F.col("it2").alias("dst"))
            .distinct()
        )

    def explodeform():
        baskets = li.groupBy("bk").agg(
            F.array_sort(F.collect_set("it")).alias("its")
        )
        return (
            baskets.select("its", F.posexplode("its").alias("i", "src"))
            .select("src", "i", F.posexplode("its").alias("j", "dst"))
            .filter(F.col("j") > F.col("i"))
            .select("src", "dst")
            .distinct()
        )

    n1, n2 = joinform().count(), explodeform().count()
    assert n1 == n2, (n1, n2)
    for label, fn in (("self-join", joinform), ("collect-explode", explodeform)):
        ts = []
        for _ in range(3):
            t0 = time.time()
            fn().count()
            ts.append(time.time() - t0)
        ts.sort()
        print(f"edges {label}: {n1:,} edges, median {ts[1]:.2f}s reps={[round(t,2) for t in ts]}")


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    spark = _spark()
    spark.sparkContext.setLogLevel("ERROR")
    if which in ("wedges", "all"):
        leg_wedges(spark)
    if which in ("scaling", "all"):
        leg_scaling(spark)
    if which in ("classifier", "all"):
        leg_classifier(spark)
    if which in ("interval", "all"):
        leg_interval(spark)
    if which in ("edges", "all"):
        leg_edges(spark)


if __name__ == "__main__":
    main()
