"""A/B scale measurements for the round-9 operators.

Legs (pick with argv[1], default all):

- ``triangles`` : degree-ordered orientation vs the naive wedge join on
  a hub-skewed graph — candidate-wedge counts and wall time.
- ``grid``      : grid_distance_join vs the naive broadcast theta join
  at 200k x 2k points — wall + result equality.
- ``pagerank``  : 10 iterations at 100k nodes / 2M edges after the
  per-iteration persist fix (compare SCALE_NOTES round-8: 51.8 s).

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


def leg_triangles(spark):
    """Hub-skewed graph: 100k background edges + one node adjacent to
    20k others. Naive wedge candidates = sum d*(d-1)/2 (the hub alone
    contributes ~2e8); oriented = sum outdeg*(outdeg-1)/2 with hubs
    receiving, not emitting."""
    from wms_data_pipeline_spark.operators import graph as gr

    n_nodes = 50_000
    bg = spark.range(100_000).select(
        (F.xxhash64("id") % n_nodes).alias("src"),
        (F.xxhash64("id", F.lit(1)) % n_nodes).alias("dst"),
    ).select(F.abs("src").alias("src"), F.abs("dst").alias("dst"))
    hub = spark.range(20_000).select(
        F.lit(0).cast("long").alias("src"), (F.col("id") + 1).alias("dst")
    )
    edges = bg.unionByName(hub).filter(F.col("src") != F.col("dst"))
    und = edges.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).distinct().localCheckpoint()
    deg = (
        und.select(F.col("a").alias("n"))
        .unionByName(und.select(F.col("b").alias("n")))
        .groupBy("n").agg(F.count(F.lit(1)).alias("d"))
    )
    naive_wedges = deg.agg(
        F.sum(F.expr("(d * (d - 1)) div 2"))
    ).collect()[0][0]
    # oriented out-degrees: rebuild the orientation the operator uses
    da = deg.select(F.col("n").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("n").alias("b"), F.col("d").alias("db"))
    lo_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    odeg = (
        und.join(da, "a").join(db, "b")
        .select(F.when(lo_first, F.col("a")).otherwise(F.col("b")).alias("lo"))
        .groupBy("lo").agg(F.count(F.lit(1)).alias("od"))
    )
    oriented_wedges = odeg.agg(
        F.sum(F.expr("(od * (od - 1)) div 2"))
    ).collect()[0][0]
    max_deg = deg.agg(F.max("d")).collect()[0][0]
    max_od = odeg.agg(F.max("od")).collect()[0][0]
    t0 = time.time()
    row = gr.triangle_stats(edges).collect()[0]
    dt = time.time() - t0
    print(
        f"AB triangles: naive wedge candidates {naive_wedges:,} "
        f"(max degree {max_deg:,}) vs oriented {oriented_wedges:,} "
        f"(max out-degree {max_od:,}) = "
        f"{naive_wedges / max(oriented_wedges, 1):.0f}x fewer; "
        f"census {row['n_triangles']:,} triangles in {dt:.2f}s"
    )


def leg_grid(spark):
    """Three sizes to locate the crossover: the broadcast nested-loop
    theta join costs |L| x |R| residual evaluations; the grid join
    costs candidates + a 9x explode + one shuffle. Small broadcastable
    right sides favor the NLJ; the product grows quadratically and the
    grid stays output-bound."""
    from wms_data_pipeline_spark.operators import relational as rel

    r = 5_000
    for nl, nr in [(200_000, 2_000), (1_000_000, 20_000),
                   (2_000_000, 50_000)]:
        left = spark.range(nl).select(
            F.col("id").alias("lid"),
            F.abs(F.xxhash64("id") % 1_000_000).alias("x"),
            F.abs(F.xxhash64("id", F.lit(7)) % 1_000_000).alias("y"),
        ).localCheckpoint()
        right = spark.range(nr).select(
            F.col("id").alias("rid"),
            F.abs(F.xxhash64("id", F.lit(13)) % 1_000_000).alias("x"),
            F.abs(F.xxhash64("id", F.lit(21)) % 1_000_000).alias("y"),
        ).localCheckpoint()
        t0 = time.time()
        n_grid = rel.grid_distance_join(left, right, radius=r).count()
        t_grid = time.time() - t0
        lt = left.select(
            F.col("lid"), F.col("x").alias("lx"), F.col("y").alias("ly")
        )
        rt = right.select(
            F.col("rid"), F.col("x").alias("rx"), F.col("y").alias("ry")
        )
        t0 = time.time()
        n_theta = (
            lt.join(
                F.broadcast(rt),
                (F.col("lx") - F.col("rx")) * (F.col("lx") - F.col("rx"))
                + (F.col("ly") - F.col("ry")) * (F.col("ly") - F.col("ry"))
                <= r * r,
            ).count()
        )
        t_theta = time.time() - t0
        assert n_grid == n_theta, (n_grid, n_theta)
        print(
            f"AB grid {nl // 1000}k x {nr // 1000}k: {n_grid:,} pairs "
            f"(r={r}); grid-blocked {t_grid:.2f}s vs broadcast theta "
            f"{t_theta:.2f}s ({t_theta / t_grid:.1f}x)"
        )


def leg_pagerank(spark):
    from wms_data_pipeline_spark.operators import graph as gr

    edges = spark.range(2_000_000).select(
        F.abs(F.xxhash64("id") % 100_000).alias("src"),
        F.abs(F.xxhash64("id", F.lit(3)) % 100_000).alias("dst"),
        (F.abs(F.xxhash64("id", F.lit(5))) % 9 + 1).alias("weight"),
    ).localCheckpoint()
    t0 = time.time()
    gr.pagerank(
        edges, iterations=10, strategy="distributed", checkpoint_every=4
    ).count()
    dt = time.time() - t0
    print(
        f"AB pagerank: 10 iters, 100k nodes / 2M edges, "
        f"persist-per-iteration: {dt:.1f}s (round-8 pre-fix: 51.8s)"
    )


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    spark = _spark()
    spark.sparkContext.setLogLevel("ERROR")
    if which in ("triangles", "all"):
        leg_triangles(spark)
    if which in ("grid", "all"):
        leg_grid(spark)
    if which in ("pagerank", "all"):
        leg_pagerank(spark)
