"""Round-15 optimization pins: every change here is a pure physical-plan
change — these tests assert the optimized dispatch produces bit-identical
results to the reference dispatch on the same input."""

import random

import pytest  # noqa: F401 (parametrize/remnant symmetry with siblings)


def test_census_shuffle_fallback_matches_broadcast_path(spark, monkeypatch):
    """The r15 shuffled-hash fallback of _edge_intersections (and the
    single-action gate counts feeding it) must be a pure plan change:
    forcing every gate to the shuffle/no-broadcast branch yields the
    same census row and the same per-node clustering rows as the
    broadcast dispatch."""
    from wms_data_pipeline_spark.operators import graph as gr

    rng = random.Random(43)
    canon = sorted(
        {
            (min(a, b), max(a, b))
            for a, b in (
                (rng.randrange(60), rng.randrange(60)) for _ in range(500)
            )
            if a != b
        }
    )
    edges = spark.createDataFrame(canon, "src long, dst long")
    t_b = gr.triangle_stats(edges, assume_canonical=True).collect()
    c_b = sorted(
        map(tuple, gr.node_clustering(edges, assume_canonical=True).collect())
    )
    monkeypatch.setattr(gr, "BROADCAST_CLOSURE_MAX_EDGES", 0)
    monkeypatch.setattr(gr, "BROADCAST_DEG_MAX_NODES", 0)
    t_s = gr.triangle_stats(edges, assume_canonical=True).collect()
    c_s = sorted(
        map(tuple, gr.node_clustering(edges, assume_canonical=True).collect())
    )
    assert t_b == t_s
    assert c_b == c_s
    # sanity: the graph actually has triangles, so the pin is not vacuous
    assert t_b[0]["n_triangles"] > 0
