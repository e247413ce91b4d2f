"""Round-14 optimization pins: every test here ties a physical rewrite
to the unchanged result it must preserve."""

import pytest

pytestmark = pytest.mark.usefixtures("spark")


def test_personalized_pagerank_local_matches_distributed_bitwise(spark):
    import random

    from wms_data_pipeline_spark.operators import graph as gr

    rng = random.Random(14)
    edges = spark.createDataFrame(
        [
            (f"n{rng.randrange(30)}", f"n{rng.randrange(30)}", rng.randrange(1, 9))
            for _ in range(200)
        ],
        "src string, dst string, weight long",
    )
    # seeds: two in-graph nodes plus one absent from the edge list
    seeds = spark.createDataFrame(
        [("n1",), ("n7",), ("offgraph",)], "node string"
    )
    loc = {
        r.node: r.rank_scaled
        for r in gr.personalized_pagerank(
            edges, seeds, iterations=5, strategy="local"
        ).collect()
    }
    dist = {
        r.node: r.rank_scaled
        for r in gr.personalized_pagerank(
            edges, seeds, iterations=5, strategy="distributed"
        ).collect()
    }
    assert loc == dist  # one integer formula, two execution plans

    with pytest.raises(ValueError, match="strategy"):
        gr.personalized_pagerank(edges, seeds, strategy="bogus")
    with pytest.raises(ValueError, match="empty seed set"):
        gr.personalized_pagerank(
            edges, seeds.filter("node = 'nope'"), iterations=2,
            strategy="local",
        )


def test_census_assume_canonical_matches_general_path(spark):
    """assume_canonical must be a pure plan change: same census and same
    per-node clustering as the canonicalizing path on edges that already
    satisfy the contract (distinct, self-loop-free, src < dst)."""
    import random

    from wms_data_pipeline_spark.operators import graph as gr

    rng = random.Random(41)
    raw = {(a, b) for a, b in
           ((rng.randrange(40), rng.randrange(40)) for _ in range(300))
           if a != b}
    canon = sorted({(min(a, b), max(a, b)) for a, b in raw})
    edges = spark.createDataFrame(canon, "src long, dst long")
    t_gen = gr.triangle_stats(edges).collect()
    t_can = gr.triangle_stats(edges, assume_canonical=True).collect()
    assert t_gen == t_can
    c_gen = sorted(map(tuple, gr.node_clustering(edges).collect()))
    c_can = sorted(
        map(tuple, gr.node_clustering(edges, assume_canonical=True).collect())
    )
    assert c_gen == c_can


def test_prefix_jaccard_hashed_verify_matches_semantics(spark):
    """The hashed verify path must reproduce the exact pair set and sims
    of the definitionally-exact brute force on a corpus with overlapping
    token sets (exercises prefix filter + hashed intersect + arithmetic
    union)."""
    from pyspark.sql import functions as F

    from wms_data_pipeline_spark.operators import dedup as dd

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon zeta"),  # dup of 1
            (3, "alpha beta gamma delta epsilon eta"),   # 5/7 with 1
            (4, "one two three four five six seven"),
            (5, "one two three four five six eight"),    # 6/8
            (6, "totally different words here now"),
        ],
        "doc_id long, text string",
    )
    got = sorted(
        map(tuple, dd.prefix_jaccard_join(docs, threshold=0.7).collect())
    )
    # brute force over token sets
    import itertools

    rows = docs.select(
        "doc_id", F.array_distinct(F.split("text", r"\s+")).alias("tk")
    ).collect()
    want = []
    for a, b in itertools.combinations(sorted(rows, key=lambda r: r.doc_id), 2):
        sa, sb = set(a.tk), set(b.tk)
        j = len(sa & sb) / len(sa | sb)
        if j >= 0.7:
            want.append((a.doc_id, b.doc_id, round(j, 6)))
    assert got == sorted(want)


def test_containment_length_filter_loses_no_pairs(spark):
    """The r14 PPJoin length bound (|b| >= ceil(t*|a|)) must be a pure
    candidate prune: results equal the all-pairs brute force, including
    short-b pairs right at the boundary."""
    import itertools

    from pyspark.sql import functions as F

    from wms_data_pipeline_spark.operators import dedup as dd

    docs = spark.createDataFrame(
        [
            (1, "a b c d e"),          # |a|=5, t=0.8 -> need |b| >= 4
            (2, "a b c d"),            # |b|=4: candidate only via bound edge
            (3, "a b c d e f g h"),    # superset of 1
            (4, "a b c"),              # |b|=3: must be pruned for probe 1
            (5, "x y z w v"),
        ],
        "doc_id long, text string",
    )
    probe = docs.filter(F.col("doc_id").isin(1, 4))
    got = sorted(
        map(tuple, dd.containment_join(probe, docs, threshold=0.8).collect())
    )
    prows = {r.doc_id: set(r.tk) for r in probe.select(
        "doc_id", F.array_distinct(F.split("text", r"\s+")).alias("tk")).collect()}
    crows = {r.doc_id: set(r.tk) for r in docs.select(
        "doc_id", F.array_distinct(F.split("text", r"\s+")).alias("tk")).collect()}
    want = []
    for ia, sa in prows.items():
        for ib, sb in crows.items():
            if ia == ib:
                continue
            cont = len(sa & sb) / len(sa)
            if cont >= 0.8:
                want.append((ia, ib, round(cont, 6)))
    assert got == sorted(want)
