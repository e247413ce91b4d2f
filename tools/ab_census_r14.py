"""A/B the r14 census rewrites (graph.py) against the r13 shapes, adjacent
in ONE session so host-window drift cancels (the r13→r14 baseline window
moved 1.3x on identical code; SCALE_NOTES).

Old shape (reconstructed inline, byte-faithful to r13 graph.py):
  - canonicalize+distinct the already-canonical co-purchase edges
  - no deg checkpoint (deg recomputed per consumer)
  - double-posexplode wedge generator with j > i filter, struct carry
  - triangle_stats: separate count pass over und for n_edges

New shape (operators/graph.py at HEAD): assume_canonical=True skips the
re-canonicalization exchange, deg localCheckpointed, wedge pairs via
posexplode + tail-slice explode over a dhi-stripped bigint array,
n_edges = sum(d) div 2 off the degree table.

Usage: python tools/ab_census_r14.py [sf_dir] [reps]
Prints per-variant medians and asserts both variants return identical rows.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from wms_data_pipeline_spark.operators import graph as gr  # noqa: E402
from wms_data_pipeline_spark.session import get_spark  # noqa: E402


def _old_orient(edges, src="src", dst="dst"):
    a, b = F.least(F.col(src), F.col(dst)), F.greatest(F.col(src), F.col(dst))
    und = (
        edges.filter(F.col(src) != F.col(dst))
        .select(a.alias("a"), b.alias("b"))
        .distinct()
        .localCheckpoint()
    )
    deg = (
        und.select(F.col("a").alias("n"))
        .unionByName(und.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    da = deg.select(F.col("n").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("n").alias("b"), F.col("d").alias("db"))
    lo_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = (
        und.join(da, "a")
        .join(db, "b")
        .select(
            F.when(lo_first, F.col("a")).otherwise(F.col("b")).alias("lo"),
            F.when(lo_first, F.col("b")).otherwise(F.col("a")).alias("hi"),
            F.when(lo_first, F.col("db")).otherwise(F.col("da")).alias("dhi"),
        )
        .localCheckpoint()
    )
    return und, deg, oriented


def _old_wedges(oriented):
    nbrs = oriented.groupBy("lo").agg(
        F.array_sort(F.collect_list(F.struct("dhi", "hi"))).alias("ns")
    )
    return (
        nbrs.select("lo", "ns", F.posexplode("ns").alias("i", "s1"))
        .select("lo", "ns", "i", F.col("s1.hi").alias("y"))
        .select("lo", "i", "y", F.posexplode("ns").alias("j", "s2"))
        .filter(F.col("j") > F.col("i"))
        .select("lo", "y", F.col("s2.hi").alias("z"))
    )


def old_triangle_stats(edges):
    und, deg, oriented = _old_orient(edges)
    wedge = _old_wedges(oriented).select("y", "z")
    closure = gr._closure_side(oriented)
    tri = wedge.join(closure, ["y", "z"], "left_semi").agg(
        F.count(F.lit(1)).alias("n_triangles")
    )
    counts = und.agg(F.count(F.lit(1)).alias("n_edges"))
    nodes_wedges = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.coalesce(F.sum(F.expr("(d * (d - 1)) div 2")), F.lit(0))
        .cast("long")
        .alias("n_wedges"),
    )
    return (
        nodes_wedges.crossJoin(F.broadcast(counts))
        .crossJoin(F.broadcast(tri))
        .select(
            "n_nodes",
            "n_edges",
            "n_wedges",
            F.col("n_triangles").cast("long").alias("n_triangles"),
            F.when(
                F.col("n_wedges") > 0,
                F.expr("(3 * n_triangles * 1000000) div n_wedges"),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("clustering_x1e6"),
        )
    )


def old_node_clustering(edges):
    und, deg, oriented = _old_orient(edges)
    closure = gr._closure_side(oriented)
    closed = _old_wedges(oriented).join(closure, ["y", "z"])
    tri = (
        closed.select(
            F.explode(F.array(F.col("lo"), F.col("y"), F.col("z"))).alias("n")
        )
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("t"))
    )
    return deg.join(tri, "n", "left").select(
        F.col("n").alias("node"),
        F.col("d").cast("long").alias("degree"),
        F.coalesce(F.col("t"), F.lit(0)).cast("long").alias("n_tri"),
        F.when(
            F.col("d") >= 2,
            F.expr("(coalesce(t, 0) * 1000000) div ((d * (d - 1)) div 2)"),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("clustering_x1e6"),
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("ab-census-r14")
    spark.sparkContext.setLogLevel("ERROR")
    from wms_data_pipeline_spark.plans.queries import _copurchase_edges

    def edges():
        return _copurchase_edges(spark, sf_dir)

    variants = {
        "triangles_old": lambda: old_triangle_stats(edges()),
        "triangles_new": lambda: gr.triangle_stats(
            edges(), assume_canonical=True
        ),
        "clustering_old": lambda: old_node_clustering(edges()),
        "clustering_new": lambda: gr.node_clustering(
            edges(), assume_canonical=True
        ),
    }

    # value parity first (census row + full per-node set)
    t_old = variants["triangles_old"]().collect()
    t_new = variants["triangles_new"]().collect()
    assert t_old == t_new, f"census diverged: {t_old} vs {t_new}"
    c_old = sorted(tuple(r) for r in variants["clustering_old"]().collect())
    c_new = sorted(tuple(r) for r in variants["clustering_new"]().collect())
    assert c_old == c_new, "node_clustering diverged"
    print(f"parity OK: {t_new[0]}; {len(c_new)} clustering rows identical")

    # warmup then interleaved timing (old, new, old, new, ...)
    times: dict[str, list[float]] = {k: [] for k in variants}
    for k, fn in variants.items():
        fn().write.format("noop").mode("overwrite").save()
    for _ in range(reps):
        for k, fn in variants.items():
            spark.sparkContext.setJobDescription(f"ab_census {k}")
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            times[k].append(time.perf_counter() - t0)
    for k, ts in times.items():
        print(f"{k:16s} median={statistics.median(ts):6.3f}  reps={[round(t,3) for t in ts]}")
    spark.stop()


if __name__ == "__main__":
    main()
