"""Round-9 regression tests for the ADVICE.md (round-8 advisor) fixes:
compact_dataset crash-safe swap, cms_heavy_keys distinct-based sizing,
pagerank weight validation, expectations_report empty-input zeros."""
import os

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------- landing

def _write_ds(spark, path, n=100, parts=8):
    spark.range(n).withColumn("v", F.col("id") * 2).repartition(
        parts
    ).write.parquet(str(path))


def test_compact_dataset_restores_original_when_swap_in_fails(
    spark, tmp_path, monkeypatch
):
    from wms_data_pipeline_spark.sources import landing

    path = str(tmp_path / "ds")
    _write_ds(spark, path)
    real_rename = os.rename

    def flaky_rename(src, dst):
        # fail exactly the tmp -> path swap-in; allow everything else
        if src.endswith(".__compact_tmp"):
            raise OSError("simulated crash during swap-in")
        return real_rename(src, dst)

    monkeypatch.setattr(os, "rename", flaky_rename)
    with pytest.raises(OSError, match="simulated crash"):
        landing.compact_dataset(spark, path, target_file_mb=1)
    monkeypatch.undo()
    # dataset path must still exist with the original rows
    assert spark.read.parquet(path).count() == 100


def test_compact_dataset_keeps_trash_until_postswap_verify(
    spark, tmp_path, monkeypatch
):
    from wms_data_pipeline_spark.sources import landing

    path = str(tmp_path / "ds2")
    _write_ds(spark, path)
    seen = {}
    real_rmtree_mod = landing.compact_dataset.__globals__  # module ns

    import shutil

    real_rmtree = shutil.rmtree

    def spy_rmtree(p, *a, **k):
        if str(p).endswith(".__compact_trash") and os.path.exists(p):
            # trash must only be deleted after path re-verifies
            seen["trash_deleted_after_verify"] = os.path.exists(path)
        return real_rmtree(p, *a, **k)

    monkeypatch.setattr(shutil, "rmtree", spy_rmtree)
    stats = landing.compact_dataset(spark, path, target_file_mb=1024)
    assert stats["rows"] == 100
    assert seen.get("trash_deleted_after_verify") is True
    assert not os.path.exists(path + ".__compact_trash")
    assert spark.read.parquet(path).count() == 100
    assert real_rmtree_mod  # silence lint for the ns probe


# ---------------------------------------------------------------- cms

def test_cms_autowidth_sized_from_distinct_not_rows(spark):
    import wms_data_pipeline_spark.operators.text as txt

    # 200k rows but only 50 distinct keys: row-count sizing would pick
    # 2^18; distinct sizing stays at the 2^12 floor
    df = spark.range(200_000).select(
        (F.col("id") % 50).cast("string").alias("k")
    )
    out = txt.cms_heavy_keys(df, "k", threshold=1000)
    assert out.count() == 50
    rows = {r["k"]: r["n"] for r in out.collect()}
    assert rows["0"] == 4000


def test_cms_autowidth_cap_raises(spark, monkeypatch):
    import wms_data_pipeline_spark.operators.text as txt

    monkeypatch.setattr(txt, "MAX_AUTO_WIDTH", 1 << 12)
    df = spark.range(100_000).select(F.col("id").cast("string").alias("k"))
    with pytest.raises(ValueError, match="MAX_AUTO_WIDTH"):
        txt.cms_heavy_keys(df, "k", threshold=2)


def test_cms_shuffle_join_path_matches_broadcast_path(spark, monkeypatch):
    import wms_data_pipeline_spark.operators.text as txt

    df = spark.range(20_000).select(
        (F.col("id") % 997).cast("string").alias("k")
    )
    expected = sorted(
        (r["k"], r["n"])
        for r in txt.cms_heavy_keys(df, "k", threshold=20).collect()
    )
    # force the non-broadcast join path and compare exactly
    monkeypatch.setattr(txt, "BROADCAST_MAX_WIDTH", 1)
    got = sorted(
        (r["k"], r["n"])
        for r in txt.cms_heavy_keys(df, "k", threshold=20).collect()
    )
    assert got == expected and len(got) == 997


# ---------------------------------------------------------------- graph

@pytest.mark.parametrize("strategy", ["local", "distributed"])
def test_pagerank_rejects_null_and_zero_weights(spark, strategy):
    from wms_data_pipeline_spark.operators import graph as gr

    edges = spark.createDataFrame(
        [("a", "b", 1), ("b", "c", 0), ("c", "a", 2)],
        "src string, dst string, weight long",
    )
    with pytest.raises(ValueError, match="weights >= 1"):
        gr.pagerank(edges, iterations=2, strategy=strategy)
    edges_null = spark.createDataFrame(
        [("a", "b", 1), ("b", "a", None)],
        "src string, dst string, weight long",
    )
    with pytest.raises(ValueError, match="weights >= 1"):
        gr.pagerank(edges_null, iterations=2, strategy=strategy)


def test_pagerank_distributed_still_bitwise_after_persist_fix(spark):
    from wms_data_pipeline_spark.operators import graph as gr

    edges = spark.createDataFrame(
        [("a", "b", 2), ("b", "c", 1), ("c", "a", 3), ("a", "c", 1),
         ("d", "a", 1)],  # d dangles into a; c->a keeps cycle
        "src string, dst string, weight long",
    )
    dist = {
        r["node"]: r["rank_scaled"]
        for r in gr.pagerank(
            edges, iterations=7, strategy="distributed", checkpoint_every=3
        ).collect()
    }
    loc = {
        r["node"]: r["rank_scaled"]
        for r in gr.pagerank(edges, iterations=7, strategy="local").collect()
    }
    assert dist == loc


# ---------------------------------------------------------------- quality

def test_expectations_report_empty_input_reports_zeroes(spark):
    from wms_data_pipeline_spark.operators import quality as q

    df = spark.createDataFrame([], "id string, qty long")
    rep = q.expectations_report(
        df, {**q.not_null("id"), **q.in_range("qty", 0, 10)}
    ).collect()
    assert len(rep) == 2
    for r in rep:
        assert r["n_rows"] == 0
        assert r["n_violations"] == 0


# ------------------------------------------------------------- round-9 ops

def test_triangle_stats_matches_bruteforce(spark):
    import itertools
    import random

    from wms_data_pipeline_spark.operators import graph as gr

    rng = random.Random(9)
    nodes = list(range(30))
    edges = sorted(
        {
            (min(a, b), max(a, b))
            for _ in range(120)
            for a, b in [(rng.choice(nodes), rng.choice(nodes))]
            if a != b
        }
    )
    adj = {n: set() for n in nodes}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    tri = sum(
        1
        for x, y, z in itertools.combinations(nodes, 3)
        if y in adj[x] and z in adj[x] and z in adj[y]
    )
    wedges = sum(len(adj[n]) * (len(adj[n]) - 1) // 2 for n in nodes)
    # feed edges in random duplicated directions — canonicalization's job
    rows = [(b, a) if rng.random() < 0.5 else (a, b) for a, b in edges]
    rows += rows[:20]
    df = spark.createDataFrame(rows, "src int, dst int")
    got = gr.triangle_stats(df).collect()[0]
    assert got["n_edges"] == len(edges)
    assert got["n_wedges"] == wedges
    assert got["n_triangles"] == tri
    assert got["clustering_x1e6"] == (
        (3 * tri * 1_000_000) // wedges if wedges else 0
    )


def test_shortest_paths_local_matches_distributed_bitwise(spark):
    import random

    from wms_data_pipeline_spark.operators import graph as gr

    rng = random.Random(17)
    edges = [
        (f"n{rng.randrange(12)}", f"n{rng.randrange(12)}", rng.randrange(1, 9))
        for _ in range(60)
    ]
    e = spark.createDataFrame(edges, "src string, dst string, cost long")
    src = spark.createDataFrame([("n0",), ("n5",)], "node string")
    loc = {
        r["node"]: r["dist_cost"]
        for r in gr.shortest_paths(e, src, max_hops=5, strategy="local").collect()
    }
    dist = {
        r["node"]: r["dist_cost"]
        for r in gr.shortest_paths(
            e, src, max_hops=5, strategy="distributed", checkpoint_every=2
        ).collect()
    }
    assert loc == dist and loc["n0"] == 0 and loc["n5"] == 0


def test_shortest_paths_rejects_negative_cost(spark):
    from wms_data_pipeline_spark.operators import graph as gr

    e = spark.createDataFrame(
        [("a", "b", 1), ("b", "c", -1)], "src string, dst string, cost long"
    )
    src = spark.createDataFrame([("a",)], "node string")
    with pytest.raises(ValueError, match="costs >= 0"):
        gr.shortest_paths(e, src, strategy="distributed")


def test_weighted_median_exact_and_tie_stable(spark):
    from wms_data_pipeline_spark.operators import relational as rel

    # group g: values 10(w3), 20(w1), 20(w1), 30(w1) -> total 6, median
    # reaches half (cum 3) at value 10 -> lower weighted median = 10
    rows = [("g", 10, 3), ("g", 20, 1), ("g", 20, 1), ("g", 30, 1),
            ("h", 5, 1), ("h", 7, 9)]
    df = spark.createDataFrame(rows, "grp string, v long, w long")
    got = {
        r["grp"]: r["w_median"]
        for r in rel.weighted_median(df, "grp", "v", "w").collect()
    }
    assert got == {"g": 10, "h": 7}


def test_grid_distance_join_matches_bruteforce(spark):
    import random

    from wms_data_pipeline_spark.operators import relational as rel

    rng = random.Random(3)
    left = [(i, rng.randrange(1000), rng.randrange(1000)) for i in range(80)]
    right = [(j, rng.randrange(1000), rng.randrange(1000)) for j in range(40)]
    r = 120
    expect = sorted(
        (li, rj, (lx - rx) ** 2 + (ly - ry) ** 2)
        for li, lx, ly in left
        for rj, rx, ry in right
        if (lx - rx) ** 2 + (ly - ry) ** 2 <= r * r
    )
    ldf = spark.createDataFrame(left, "lid long, x long, y long")
    rdf = spark.createDataFrame(right, "rid long, x long, y long")
    got = sorted(
        (row["l_lid"], row["r_rid"], row["dist2"])
        for row in rel.grid_distance_join(ldf, rdf, radius=r).collect()
    )
    assert got == expect and len(got) > 0


def test_market_basket_scores_exact(spark):
    from wms_data_pipeline_spark.operators import relational as rel

    # 4 baskets; pair (a,b) in 2, a in 3, b in 2
    rows = [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a"), (4, "c"),
            (2, "a")]  # duplicate (2,a) must not double-count
    df = spark.createDataFrame(rows, "bk long, it string")
    got = rel.market_basket_pairs(df, "bk", "it", min_pair_count=2).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["item_a"], r["item_b"], r["n_pairs"]) == ("a", "b", 2)
    assert r["supp_x1e6"] == 2 * 1_000_000 // 4
    assert r["conf_a_b_x1e6"] == 2 * 1_000_000 // 3
    assert r["lift_x1e6"] == ((2 * 1_000_000 // 3) * 4) // 2
