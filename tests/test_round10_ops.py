"""Round-10 regression tests for the ADVICE.md (round-9 advisor) fixes and
the VERDICT r9 work items: grid_distance_join long-cast residual /
radius guard / NLJ auto-dispatch, market_basket_pairs null-key and
mega-basket guards, null-safe local-strategy sorts, distributed
fixed-point early-exit, and per-node clustering coefficient."""
import pytest
from pyspark.sql import functions as F

from wms_data_pipeline_spark.operators import graph as gr
from wms_data_pipeline_spark.operators import relational as rel


# ---------------------------------------------------- grid_distance_join

def _points(spark, rows, cols=("k", "x", "y")):
    return spark.createDataFrame(rows, list(cols))


def test_grid_join_long_cast_survives_int32_square(spark):
    # |delta| = 100_000 > 46340: the int32 square would wrap (ADVICE r9
    # medium). With IntegerType inputs the pair must still be found with
    # the exact BIGINT dist2.
    l = _points(spark, [(1, 0, 0)]).select(
        "k", F.col("x").cast("int").alias("x"), F.col("y").cast("int").alias("y")
    )
    r = _points(spark, [(2, 100_000, 0)]).select(
        "k", F.col("x").cast("int").alias("x"), F.col("y").cast("int").alias("y")
    )
    got = rel.grid_distance_join(l, r, radius=100_000, strategy="grid").collect()
    assert len(got) == 1
    assert got[0]["dist2"] == 100_000 * 100_000
    got_nlj = rel.grid_distance_join(l, r, radius=100_000, strategy="nlj").collect()
    assert got_nlj[0]["dist2"] == 100_000 * 100_000


def test_grid_join_rejects_nonpositive_radius_and_bad_strategy(spark):
    l = _points(spark, [(1, 0, 0)])
    with pytest.raises(ValueError, match="radius"):
        rel.grid_distance_join(l, l, radius=0)
    with pytest.raises(ValueError, match="radius"):
        rel.grid_distance_join(l, l, radius=-5)
    with pytest.raises(ValueError, match="strategy"):
        rel.grid_distance_join(l, l, radius=10, strategy="nope")


def test_grid_join_nlj_and_grid_pair_identical(spark):
    import random

    rng = random.Random(10)
    lrows = [(i, rng.randrange(0, 1000), rng.randrange(0, 1000)) for i in range(300)]
    rrows = [(i, rng.randrange(0, 1000), rng.randrange(0, 1000)) for i in range(80)]
    l, r = _points(spark, lrows), _points(spark, rrows)
    want = {
        (a, ax, ay, b, bx, by, (ax - bx) ** 2 + (ay - by) ** 2)
        for a, ax, ay in lrows
        for b, bx, by in rrows
        if (ax - bx) ** 2 + (ay - by) ** 2 <= 150 * 150
    }
    for strategy in ("grid", "nlj", "auto"):
        got = {
            tuple(row)
            for row in rel.grid_distance_join(l, r, radius=150, strategy=strategy).collect()
        }
        assert got == want, strategy


def test_grid_join_auto_dispatch_picks_by_right_size(spark):
    l = _points(spark, [(1, 0, 0)])
    r = _points(spark, [(2, 3, 4)])
    # small right side -> auto must take the broadcast NLJ plan (no 9x
    # explode: the plan contains BroadcastNestedLoopJoin, no Generate)
    plan = rel.grid_distance_join(l, r, radius=10, strategy="auto")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan
    # forced grid keeps the equi-join shape
    plan_g = rel.grid_distance_join(l, r, radius=10, strategy="grid")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan_g


# --------------------------------------------------- market_basket_pairs

def test_market_basket_ignores_null_basket_and_item(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (None, "a"), (None, "b"), (1, None)],
        "bk int, it string",
    )
    got = rel.market_basket_pairs(df, "bk", "it", min_pair_count=2).collect()
    assert len(got) == 1
    row = got[0]
    # n_baskets = 2 (the NULL basket must not count): supp = 2/2 = 1e6
    assert (row["item_a"], row["item_b"], row["n_pairs"]) == ("a", "b", 2)
    assert row["supp_x1e6"] == 1_000_000
    # margins exclude the NULL-basket rows: nx = ny = 2 -> conf = 1e6,
    # lift = (1e6 * 2) // 2 = 1e6
    assert row["conf_a_b_x1e6"] == 1_000_000
    assert row["lift_x1e6"] == 1_000_000


def test_market_basket_mega_basket_raises(spark):
    big = spark.range(50).select(
        F.lit(1).alias("bk"), F.col("id").alias("it")
    )
    with pytest.raises(ValueError, match="max_basket_size"):
        rel.market_basket_pairs(big, "bk", "it", max_basket_size=10)
    # same data passes with the cap raised
    ok = rel.market_basket_pairs(
        big, "bk", "it", min_pair_count=1, max_basket_size=50
    )
    assert ok.count() == 50 * 49 // 2


# ------------------------------------------- null-safe local strategies

def test_bfs_local_and_distributed_agree_on_null_dst(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", None), ("b", "c")], "src string, dst string"
    )
    src = spark.createDataFrame([("a",)], "node string")
    loc = {
        r.node: r.hops
        for r in gr.bfs_hops(edges, src, max_hops=3, strategy="local").collect()
    }
    dist = {
        r.node: r.hops
        for r in gr.bfs_hops(edges, src, max_hops=3, strategy="distributed").collect()
    }
    assert loc == dist == {"a": 0, "b": 1, None: 2, "c": 2}


def test_shortest_paths_local_sort_null_safe(spark):
    edges = spark.createDataFrame(
        [("a", "b", 2), ("b", None, 3)], "src string, dst string, cost int"
    )
    src = spark.createDataFrame([("a",)], "node string")
    loc = {
        r.node: r.dist_cost
        for r in gr.shortest_paths(edges, src, max_hops=3, strategy="local").collect()
    }
    dist = {
        r.node: r.dist_cost
        for r in gr.shortest_paths(
            edges, src, max_hops=3, strategy="distributed"
        ).collect()
    }
    assert loc == dist == {"a": 0, "b": 2, None: 5}


# ------------------------------------------- distributed early-exit

def test_bfs_distributed_early_exits_on_shallow_graph(spark):
    # diameter-2 graph, hop budget 8: the signature check (count, sum)
    # must stop the relaxation loop long before 8 rounds
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c")], "src string, dst string"
    )
    src = spark.createDataFrame([("a",)], "node string")
    out = gr.bfs_hops(
        edges, src, max_hops=8, strategy="distributed", checkpoint_every=1
    )
    got = {r.node: r.hops for r in out.collect()}
    assert got == {"a": 0, "b": 1, "c": 1}
    assert gr.graph_rounds(out) <= 3


def test_shortest_paths_distributed_early_exits(spark):
    edges = spark.createDataFrame(
        [("a", "b", 1), ("b", "c", 1)], "src string, dst string, cost int"
    )
    src = spark.createDataFrame([("a",)], "node string")
    out = gr.shortest_paths(
        edges, src, max_hops=8, strategy="distributed", checkpoint_every=1
    )
    got = {r.node: r.dist_cost for r in out.collect()}
    assert got == {"a": 0, "b": 1, "c": 2}
    assert gr.graph_rounds(out) <= 4


def test_bfs_early_exit_does_not_fire_prematurely(spark):
    # a 5-chain with budget 5 and cadence 1: every round changes state,
    # so the loop must run all 5 rounds and still be exact
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(5)], "src int, dst int"
    )
    src = spark.createDataFrame([(0,)], "node int")
    out = gr.bfs_hops(
        edges, src, max_hops=5, strategy="distributed", checkpoint_every=1
    )
    got = {r.node: r.hops for r in out.collect()}
    assert got == {i: i for i in range(6)}
    assert gr.graph_rounds(out) == 5


# ------------------------------------------------- node_clustering

def test_node_clustering_hand_computed(spark):
    # triangle a-b-c plus pendant d off c: clustering(a)=clustering(b)=1,
    # clustering(c)= 1/C(3,2) = 1/3, clustering(d)=0 (degree 1)
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")],
        "src string, dst string",
    )
    got = {r.node: r for r in gr.node_clustering(edges).collect()}
    assert got["a"].degree == 2 and got["a"].n_tri == 1
    assert got["a"].clustering_x1e6 == 1_000_000
    assert got["b"].clustering_x1e6 == 1_000_000
    assert got["c"].degree == 3 and got["c"].n_tri == 1
    assert got["c"].clustering_x1e6 == 333_333
    assert got["d"].degree == 1 and got["d"].n_tri == 0
    assert got["d"].clustering_x1e6 == 0


def test_node_clustering_consistent_with_global_census(spark):
    # sum of per-node triangle counts == 3 * global triangle count, and
    # every node of the undirected graph appears exactly once
    import random

    rng = random.Random(7)
    edges = spark.createDataFrame(
        [(rng.randrange(0, 30), rng.randrange(0, 30)) for _ in range(200)],
        "src int, dst int",
    )
    per_node = gr.node_clustering(edges).collect()
    census = gr.triangle_stats(edges).collect()[0]
    assert sum(r.n_tri for r in per_node) == 3 * census.n_triangles
    assert len(per_node) == census.n_nodes
    assert len({r.node for r in per_node}) == census.n_nodes


# ------------------------------------------------- interval_overlap_join

def _intervals(spark, rows):
    return spark.createDataFrame(
        [(k, f"2024-01-01 {h1:02d}:00:00.000001", f"2024-01-01 {h2:02d}:30:00") for k, h1, h2 in rows],
        ["k", "s", "e"],
    ).select(
        "k",
        F.col("s").cast("timestamp").alias("start_ts"),
        F.col("e").cast("timestamp").alias("end_ts"),
    )


def test_interval_overlap_strategies_pair_identical(spark):
    import random

    rng = random.Random(11)
    lrows = [(i, *sorted((rng.randrange(0, 20), rng.randrange(0, 20)))) for i in range(60)]
    rrows = [(100 + i, *sorted((rng.randrange(0, 20), rng.randrange(0, 20)))) for i in range(25)]
    l, r = _intervals(spark, lrows), _intervals(spark, rrows)
    got = {}
    for strategy in ("bin", "nlj", "auto"):
        rows = rel.interval_overlap_join(l, r, strategy=strategy).collect()
        got[strategy] = sorted(
            (x["l_k"], x["r_k"], x["overlap_us"]) for x in rows
        )
    assert got["bin"] == got["nlj"] == got["auto"]
    # spot-check against the naive predicate driver-side
    lmap = {k: (s, e) for k, s, e in lrows}
    rmap = {k: (s, e) for k, s, e in rrows}
    want = sorted(
        (lk, rk)
        for lk, (ls, le) in lmap.items()
        for rk, (rs, re_) in rmap.items()
        # closed intervals built by _intervals: [h1:00:00.000001, h2:30:00]
        if ls <= re_ and rs <= le
    )
    assert [(a, b) for a, b, _ in got["bin"]] == want
    # overlap_us is exact micros: least(ends) - greatest(starts)
    for lk, rk, ov in got["bin"]:
        ls, le = lmap[lk]
        rs, re_ = rmap[rk]
        start_us = max(ls * 3_600_000_000 + 1, rs * 3_600_000_000 + 1)
        end_us = min(le * 3_600_000_000 + 1_800_000_000, re_ * 3_600_000_000 + 1_800_000_000)
        assert ov == end_us - start_us


def test_interval_overlap_drops_null_and_inverted(spark):
    l = spark.createDataFrame(
        [(1, "2024-01-01 05:00:00", "2024-01-01 01:00:00"),  # inverted
         (2, None, "2024-01-01 01:00:00"),                   # null start
         (3, "2024-01-01 01:00:00", None)],                  # null end
        ["k", "s", "e"],
    ).select("k", F.col("s").cast("timestamp").alias("start_ts"),
             F.col("e").cast("timestamp").alias("end_ts"))
    r = _intervals(spark, [(9, 0, 23)])
    for strategy in ("bin", "nlj"):
        assert rel.interval_overlap_join(l, r, strategy=strategy).count() == 0


def test_interval_overlap_validation_and_span_guard(spark):
    l = _intervals(spark, [(1, 0, 1)])
    with pytest.raises(ValueError, match="bin_width_sec"):
        rel.interval_overlap_join(l, l, bin_width_sec=0)
    with pytest.raises(ValueError, match="strategy"):
        rel.interval_overlap_join(l, l, strategy="nope")
    # a 23.5-hour interval at 1-second bins spans ~84600 bins > the cap;
    # the in-plan guard must fail loudly, not explode 84k rows silently
    wide = _intervals(spark, [(1, 0, 23)])
    with pytest.raises(Exception, match="interval_overlap_join"):
        rel.interval_overlap_join(wide, wide, bin_width_sec=1, strategy="bin").count()


# ------------------------------------------------------ classifier_score

def test_classifier_score_neutral_on_empty_and_keep_consistent(spark):
    from wms_data_pipeline_spark.operators import text as txt

    docs = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "alpha beta gamma"), (4, "alpha beta gamma")],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in txt.classifier_score(docs).collect()}
    for d in (1, 2):
        assert rows[d]["n_tokens"] == 0
        assert rows[d]["wsum"] == 0
        assert rows[d]["quality_score"] == 0.5
        assert not rows[d]["keep"]
    # identical text -> identical score (deterministic), keep == score>=thr
    assert rows[3]["quality_score"] == rows[4]["quality_score"]
    for d in (3, 4):
        assert rows[d]["keep"] == (rows[d]["quality_score"] >= 0.55)
        assert rows[d]["n_tokens"] == 3


# ------------------------------------------------ PNG variants, color JPEG

def test_png_grayscale_and_palette_roundtrip():
    import random

    from wms_data_pipeline_spark.operators import multimodal as mm

    rng = random.Random(7)
    w, h = 9, 7
    gray = bytes(rng.randrange(256) for _ in range(w * h))
    d = mm.decode_image_real(mm.encode_png(w, h, gray, colortype=0))
    assert d["raster"] == gray and d["channels"] == 1

    pal = bytes(rng.randrange(256) for _ in range(3 * 16))
    idx = bytes(rng.randrange(16) for _ in range(w * h))
    d = mm.decode_image_real(mm.encode_png(w, h, idx, colortype=3, palette=pal))
    assert d["channels"] == 3
    assert d["raster"] == b"".join(pal[3 * i : 3 * i + 3] for i in idx)

    # encoder guards: bad palette length, out-of-range index, palette
    # passed for a non-palette colortype
    with pytest.raises(ValueError, match="palette"):
        mm.encode_png(w, h, idx, colortype=3, palette=pal[:5])
    with pytest.raises(ValueError, match="out of palette range"):
        mm.encode_png(w, h, bytes([20]) * w * h, colortype=3, palette=pal)
    with pytest.raises(ValueError, match="palette only valid"):
        mm.encode_png(w, h, gray, colortype=0, palette=pal)


def test_jpeg_color_gray_content_bit_exact_all_samplings():
    import numpy as np

    from wms_data_pipeline_spark.operators import multimodal as mm

    for sub in ((1, 1), (2, 1), (1, 2), (2, 2)):
        for w, h in ((16, 16), (9, 7)):
            v = (w * 31 + h * 7 + sub[0] * 3 + sub[1]) % 256
            rgb = bytes([v]) * (3 * w * h)
            d = mm.decode_image_real(
                mm.encode_jpeg_color(w, h, rgb, subsampling=sub)
            )
            assert d["channels"] == 3 and (d["width"], d["height"]) == (w, h)
            got = np.frombuffer(d["raster"], np.uint8)
            assert (got == v).all(), (sub, w, h)


def test_jpeg_color_lossy_bounded_and_guards():
    import numpy as np

    from wms_data_pipeline_spark.operators import multimodal as mm

    w = h = 16
    rgb = bytearray()
    for y in range(h):
        for x in range(w):
            rgb += bytes(((x // 8) * 200 + 20, (y // 8) * 180 + 30, 120))
    for sub in ((1, 1), (2, 2)):
        d = mm.decode_image_real(
            mm.encode_jpeg_color(w, h, bytes(rgb), subsampling=sub)
        )
        got = np.frombuffer(d["raster"], np.uint8).astype(int)
        err = np.abs(got - np.frombuffer(bytes(rgb), np.uint8).astype(int)).max()
        # blocky content aligned to the 8x8/chroma grid: conversion
        # rounding only
        assert err <= 2, (sub, err)
    with pytest.raises(ValueError, match="subsampling"):
        mm.encode_jpeg_color(w, h, bytes(rgb), subsampling=(3, 1))
    with pytest.raises(ValueError, match="RGB bytes"):
        mm.encode_jpeg_color(w, h, bytes(rgb)[:-1])


def test_gif_interlace_roundtrip_all_heights():
    import random

    from wms_data_pipeline_spark.operators import multimodal as mm

    rng = random.Random(9)
    w = 13
    pal = bytes(rng.randrange(256) for _ in range(768))
    for h in (1, 2, 3, 4, 7, 8, 11, 16):
        idx = bytes(rng.randrange(256) for _ in range(w * h))
        plain = mm.decode_image_real(mm.encode_gif(w, h, idx, pal))
        inter = mm.decode_image_real(
            mm.encode_gif(w, h, idx, pal, interlace=True)
        )
        assert plain["indices"] == idx
        assert inter["indices"] == idx, f"deinterlace mismatch at h={h}"
    # interlacing actually changes the stored stream (not a no-op flag)
    idx = bytes(range(256)) * ((w * 16) // 256 + 1)
    idx = idx[: w * 16]
    assert mm.encode_gif(w, 16, idx, pal) != mm.encode_gif(
        w, 16, idx, pal, interlace=True
    )


def test_png_alpha_variants_strip_alpha():
    import random

    from wms_data_pipeline_spark.operators import multimodal as mm

    rng = random.Random(2)
    w, h = 9, 7
    rgba = bytes(rng.randrange(256) for _ in range(4 * w * h))
    d = mm.decode_image_real(mm.encode_png(w, h, rgba, colortype=6))
    assert d["channels"] == 3
    assert d["raster"] == bytes(
        b for i in range(0, len(rgba), 4) for b in rgba[i : i + 3]
    )
    ga = bytes(rng.randrange(256) for _ in range(2 * w * h))
    d = mm.decode_image_real(mm.encode_png(w, h, ga, colortype=4))
    assert d["channels"] == 1 and d["raster"] == ga[0::2]


def test_jpeg_restart_intervals_roundtrip_and_guards():
    import numpy as np

    from wms_data_pipeline_spark.operators import multimodal as mm

    w, h = 32, 16
    bw = w // 8
    rgb = bytes(
        c
        for y in range(h)
        for x in range(w)
        for c in [((3 + 17 * ((y // 8) * bw + x // 8)) * 53) % 256] * 3
    )
    for ri in (1, 2, 3):
        d = mm.decode_image_real(
            mm.encode_jpeg_color(w, h, rgb, subsampling=(2, 2), restart_interval=ri)
        )
        assert d["raster"] == rgb, f"restart_interval={ri} not exact"
    # restart markers must be transparent: same decode with and without
    import random

    rng = random.Random(3)
    noise = bytes(rng.randrange(256) for _ in range(3 * 32 * 32))
    a = mm.decode_image_real(mm.encode_jpeg_color(32, 32, noise))["raster"]
    b = mm.decode_image_real(
        mm.encode_jpeg_color(32, 32, noise, restart_interval=2)
    )["raster"]
    assert a == b
    # an RST marker with the DRI segment stripped is corruption
    blob = mm.encode_jpeg_color(32, 32, noise, restart_interval=2)
    i = blob.index(b"\xff\xdd")
    with pytest.raises(ValueError, match="RST marker without"):
        mm.decode_image_real(blob[:i] + blob[i + 6 :])


def test_wav_mulaw_and_8bit_pcm():
    import numpy as np

    from wms_data_pipeline_spark.operators import multimodal as mm

    rng = np.random.default_rng(1)
    s = rng.integers(-32124, 32124, 5000).astype(np.int16)
    # G.711 mu-law: lossy 2:1 companding; quantization error bounded by
    # half the top segment step, and companding is idempotent on the
    # expanded lattice
    mu = mm.mulaw_encode(s)
    arr, meta = mm.wav_samples(mm.encode_wav(8000, mu, bits=8, audio_format=7))
    assert meta["audio_format"] == 7 and meta["n_samples"] == 5000
    assert np.abs(arr.astype(int) - s.astype(int)).max() <= 1024
    assert mm.mulaw_encode(arr) == mu
    # 8-bit unsigned PCM widens to int16
    b8 = bytes(((s[:100].astype(int) >> 8) + 128).astype(np.uint8))
    arr, meta = mm.wav_samples(mm.encode_wav(8000, b8, bits=8))
    assert meta["bits"] == 8
    assert np.abs(arr.astype(int) - s[:100].astype(int)).max() < 256
    # stereo 16-bit interleave: n_samples counts frames, array is flat
    inter = s[:200].astype("<i2").tobytes()
    arr, meta = mm.wav_samples(
        mm.encode_wav(16000, inter, bits=16, channels=2)
    )
    assert meta["channels"] == 2 and meta["n_samples"] == 100 and len(arr) == 200
    with pytest.raises(ValueError, match="unsupported WAV encoding"):
        mm.decode_audio_real(mm.encode_wav(8000, b"\0" * 8, bits=24))


# --------------------------------------------------- progressive JPEG

def _qt_example():
    return [16,11,10,16,24,40,51,61,12,12,14,19,26,58,60,55,
            14,13,16,24,40,57,69,56,14,17,22,29,51,87,80,62,
            18,22,37,56,68,109,103,77,24,35,55,64,81,104,113,92,
            49,64,78,87,103,121,120,101,72,92,95,98,112,100,103,99]


def test_progressive_jpeg_equals_baseline_decode():
    """Progressive re-encoding of the SAME quantized coefficients must
    decode bit-identically to the baseline file — pins the entire
    spectral-selection + successive-approximation entropy layer (DC
    diffs at Al=1, DC raw-bit refinement, AC first scans with EOBn
    runs, AC refinement with correction bits inside ZRL spans and
    riding pending EOB runs)."""
    import random

    from wms_data_pipeline_spark.operators import multimodal as mm

    rng = random.Random(13)
    for w, h in ((8, 8), (9, 7), (24, 17)):
        gray = bytes(rng.randrange(256) for _ in range(w * h))
        base = mm.decode_image_real(mm.encode_jpeg(w, h, gray))["raster"]
        prog = mm.decode_image_real(
            mm.encode_jpeg_progressive(w, h, gray, channels=1)
        )["raster"]
        assert prog == base, f"gray {w}x{h}"
    for sub in ((1, 1), (2, 2), (2, 1), (1, 2)):
        rgb = bytes(rng.randrange(256) for _ in range(3 * 16 * 16))
        base = mm.decode_image_real(
            mm.encode_jpeg_color(16, 16, rgb, subsampling=sub)
        )["raster"]
        prog = mm.decode_image_real(
            mm.encode_jpeg_progressive(16, 16, rgb, subsampling=sub)
        )["raster"]
        assert prog == base, f"color {sub}"


def test_progressive_jpeg_lossy_tables_and_splits():
    import random

    import numpy as np

    from wms_data_pipeline_spark.operators import multimodal as mm

    rng = random.Random(14)
    qt = _qt_example()
    # realistic tables -> dense EOB runs, incl. cross-block runs on
    # smooth content
    img = np.add.outer(np.arange(32) * 2, np.arange(32) * 3).astype(np.uint8)
    rgb = np.stack([img] * 3, -1).tobytes()
    base = mm.decode_image_real(
        mm.encode_jpeg_color(32, 32, rgb, qtable_y=qt, qtable_c=qt,
                             subsampling=(2, 2))
    )["raster"]
    prog = mm.decode_image_real(
        mm.encode_jpeg_progressive(32, 32, rgb, qtable_y=qt, qtable_c=qt,
                                   subsampling=(2, 2))
    )["raster"]
    assert prog == base
    # spectral split boundary cases
    for split in (1, 20, 63):
        gray = bytes(rng.randrange(256) for _ in range(16 * 16))
        base = mm.decode_image_real(mm.encode_jpeg(16, 16, gray))["raster"]
        prog = mm.decode_image_real(
            mm.encode_jpeg_progressive(16, 16, gray, channels=1, split=split)
        )["raster"]
        assert prog == base, split


def test_progressive_jpeg_guards():
    from wms_data_pipeline_spark.operators import multimodal as mm

    with pytest.raises(ValueError, match="channels"):
        mm.encode_jpeg_progressive(8, 8, bytes(64), channels=2)
    with pytest.raises(ValueError, match="split"):
        mm.encode_jpeg_progressive(8, 8, bytes(192), split=0)
    with pytest.raises(ValueError, match="subsampled"):
        mm.encode_jpeg_progressive(8, 8, bytes(64), channels=1,
                                   subsampling=(2, 2))
