"""Round-8 tests: the four ADVICE r7 hardening fixes, then new operators."""
import os
import time

import pytest
from pyspark.sql import functions as F

import wms_data_pipeline_spark.operators.multimodal as mm


# ------------------------------------------------ LZW deferred-clear cap


def _pack_codes_lsb(codes, min_code_size):
    """Bit-pack LZW codes LSB-first, mirroring the decoder's width
    schedule (widen when ITS table hits 2^width, cap 12) WITHOUT ever
    emitting CLEAR — a foreign 'deferred clear' stream."""
    clear = 1 << min_code_size
    eoi = clear + 1
    table_len = clear + 2
    width = min_code_size + 1
    out = bytearray()
    acc = nbits = 0

    def emit(c, w):
        nonlocal acc, nbits
        acc |= c << nbits
        nbits += w
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    for i, c in enumerate(codes):
        emit(c, width)
        if i > 0 and table_len < 4096:
            table_len += 1
        if table_len == (1 << width) and width < 12:
            width += 1
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def test_lzw_deferred_clear_caps_table_at_4096():
    """A stream that never CLEARs must decode with the table frozen at
    4096 entries (12-bit ceiling), not grow unboundedly (ADVICE r7)."""
    n = 9000  # enough repeats of code 0 to blow past 4096 table adds
    data = _pack_codes_lsb([0] * n, 2)
    out = mm._lzw_decompress_gif(data, 2)
    assert out == b"\x00" * n


def test_lzw_selfencoded_roundtrip_still_exact():
    big = bytes((i * 7 + (i >> 3)) % 256 for i in range(20000))
    comp = mm._lzw_compress_gif(big, 8)
    assert mm._lzw_decompress_gif(comp, 8) == big


# ------------------------------------- process index cache fingerprinting


def test_process_cached_index_invalidates_on_data_change(tmp_path):
    from wms_data_pipeline_spark.plans import queries as Q

    sf = tmp_path / "sf"
    sf.mkdir()
    pq = sf / "documents.parquet"
    pq.write_bytes(b"x")
    builds = []
    p1 = Q._process_cached_index("t8", str(sf), lambda p: builds.append(p))
    p2 = Q._process_cached_index("t8", str(sf), lambda p: builds.append(p))
    assert p1 == p2 and len(builds) == 1
    # regenerate the dataset -> newer mtime -> cache must rebuild
    time.sleep(0.02)
    pq.write_bytes(b"y")
    os.utime(pq)
    p3 = Q._process_cached_index("t8", str(sf), lambda p: builds.append(p))
    assert len(builds) == 2 and p3 != p1
    # cleanup hook removes every cached dir
    Q._cleanup_process_idx_cache()
    assert not os.path.exists(p1) and not os.path.exists(p3)
    assert not Q._PROCESS_IDX_CACHE


# --------------------------------------- ingest-stream index precondition


def test_ingest_streams_require_index_up_front(spark, tmp_path):
    from wms_data_pipeline_spark.streaming.pipeline import (
        curation_ingest_stream,
        neardup_ingest_stream,
    )

    stream = spark.readStream.format("rate").load()
    missing = str(tmp_path / "no_such_index")
    with pytest.raises(ValueError, match="neardup_index_write"):
        neardup_ingest_stream(
            stream, missing, str(tmp_path / "p"), str(tmp_path / "c1")
        )
    with pytest.raises(ValueError, match="neardup_index_write"):
        curation_ingest_stream(
            stream, missing, str(tmp_path / "a"), str(tmp_path / "c2")
        )


# ---------------------------------------------------------- graph: pagerank


def test_pagerank_sums_to_scale_and_is_partition_invariant(spark):
    from wms_data_pipeline_spark.operators import graph as gr

    edges = spark.createDataFrame(
        [("a", "b", 2), ("b", "c", 1), ("c", "a", 1), ("a", "c", 1), ("d", "a", 3)],
        "src string, dst string, weight long",
    )
    r1 = {r.node: r.rank_scaled for r in gr.pagerank(edges, iterations=5).collect()}
    r2 = {
        r.node: r.rank_scaled
        for r in gr.pagerank(edges.repartition(7), iterations=5).collect()
    }
    assert r1 == r2  # bit-identical under repartitioning (integer arithmetic)
    assert set(r1) == {"a", "b", "c", "d"}
    # total mass stays ~SCALE (trunc division loses at most a few ulp-units
    # per node per iteration)
    assert abs(sum(r1.values()) - gr.PR_SCALE) < 100 * len(r1)
    # d has no in-edges -> only teleport + dangling share; a is most linked
    assert r1["a"] == max(r1.values()) and r1["d"] == min(r1.values())


def test_pagerank_local_matches_distributed_bitwise(spark):
    import random

    from wms_data_pipeline_spark.operators import graph as gr

    rng = random.Random(8)
    edges = spark.createDataFrame(
        [
            (f"n{rng.randrange(30)}", f"n{rng.randrange(30)}", rng.randrange(1, 9))
            for _ in range(200)
        ],
        "src string, dst string, weight long",
    )
    loc = {
        r.node: r.rank_scaled
        for r in gr.pagerank(edges, iterations=5, strategy="local").collect()
    }
    dist = {
        r.node: r.rank_scaled
        for r in gr.pagerank(edges, iterations=5, strategy="distributed").collect()
    }
    assert loc == dist  # one integer formula, two execution plans

    with pytest.raises(ValueError, match="strategy"):
        gr.pagerank(edges, strategy="bogus")


def test_pagerank_dangling_mass_redistributed(spark):
    from wms_data_pipeline_spark.operators import graph as gr

    # b is a sink: its rank must flow back via the dangling term, not vanish
    edges = spark.createDataFrame(
        [("a", "b", 1)], "src string, dst string, weight long"
    )
    r = {x.node: x.rank_scaled for x in gr.pagerank(edges, iterations=10).collect()}
    assert r["b"] > r["a"] > 0
    assert abs(sum(r.values()) - gr.PR_SCALE) < 1000


# ---------------------------------------------------------- graph: skyline


def _brute_skyline(points):
    out = []
    for i, (x, y) in enumerate(points):
        dominated = any(
            (px <= x and py <= y and (px < x or py < y)) for px, py in points
        )
        if not dominated:
            out.append((x, y))
    return sorted(out)


def test_skyline_matches_bruteforce_with_ties_and_dups(spark):
    from wms_data_pipeline_spark.operators import graph as gr

    import random

    rng = random.Random(8)
    pts = [(rng.randint(0, 20), rng.randint(0, 20)) for _ in range(300)]
    pts += [(0, 5), (0, 5), (5, 0), (3, 3), (3, 3)]  # dup + tie cases
    df = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(pts)], "id long, x long, y long"
    )
    got = sorted((r.x, r.y) for r in gr.skyline_2d(df.repartition(9), "x", "y").collect())
    expect = _brute_skyline(pts)
    # operator keeps duplicate pareto points; brute set is deduped
    assert sorted(set(got)) == expect
    # every kept row is genuinely non-dominated and dups of pareto points stay
    assert all(p in expect for p in got)


def test_skyline_candidate_guard(spark, monkeypatch):
    from wms_data_pipeline_spark.operators import graph as gr

    # anti-correlated diagonal: every point is on the front
    df = spark.range(500).selectExpr("id AS x", "499 - id AS y")
    monkeypatch.setattr(gr, "MAX_SKYLINE_CANDIDATES", 100)
    with pytest.raises(ValueError, match="anti-correlated"):
        gr.skyline_2d(df, "x", "y")


# ------------------------------------------------------------ bloom filter


def test_bloom_prefilter_superset_and_fp_rate(spark):
    import wms_data_pipeline_spark.operators.text as txt

    members = spark.range(1000).selectExpr("CAST(id AS STRING) AS g")
    probe = spark.range(20000).selectExpr("CAST(id AS STRING) AS g")
    out = {r.g for r in txt.bloom_semi_prefilter(probe, "g", members, "g").collect()}
    truth = {str(i) for i in range(1000)}
    assert truth <= out  # no false negatives, ever
    fp = len(out - truth) / 19000
    assert fp < 0.01  # ~0.1% expected at 16 bits/key k=4


def test_bloom_prefilter_member_cap(spark):
    import wms_data_pipeline_spark.operators.text as txt

    members = spark.range(100).selectExpr("CAST(id AS STRING) AS g")
    with pytest.raises(ValueError, match="exact semi-join"):
        txt.bloom_semi_prefilter(members, "g", members, "g", max_keys=10)


# -------------------------------------------------------------- JPEG codec


def test_jpeg_constant_blocks_roundtrip_exact():
    """DC-only spectra reconstruct bit-exactly under the all-ones quant
    table — the property the mm_jpeg_features oracle relies on."""
    for i in (0, 7, 123, 9999):
        w, h = (i % 3 + 1) * 8, (i % 2 + 1) * 8
        bw = w // 8
        gray = bytes(
            ((i + 13 * ((y // 8) * bw + x // 8)) * 37) % 256
            for y in range(h)
            for x in range(w)
        )
        meta = mm.decode_image_real(mm.encode_jpeg(w, h, gray))
        assert meta["raster"] == gray
        assert (meta["width"], meta["height"], meta["channels"]) == (w, h, 1)
        assert meta["format"] == "image/jpeg"


def test_jpeg_lossy_roundtrip_bounded_and_odd_sizes():
    import numpy as np

    rng = np.random.default_rng(42)
    for w, h in [(8, 8), (16, 24), (13, 9), (1, 1), (10, 3)]:
        gray = rng.integers(0, 256, w * h, dtype=np.uint8).tobytes()
        out = np.frombuffer(
            mm.decode_image_real(mm.encode_jpeg(w, h, gray))["raster"], np.uint8
        )
        err = np.abs(
            out.astype(int) - np.frombuffer(gray, np.uint8).astype(int)
        ).max()
        assert err <= 4, (w, h, err)  # q=1: only DCT/round noise survives


def test_jpeg_actually_compresses_smooth_content():
    import numpy as np

    qt = np.array(
        [16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
         14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
         18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
         49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99]
    ).reshape(8, 8)
    xx, yy = np.meshgrid(np.arange(64), np.arange(64))
    smooth = ((xx + yy) & 0xFF).astype(np.uint8).tobytes()
    blob = mm.encode_jpeg(64, 64, smooth, qtable=qt)
    assert len(blob) < 4096 // 4  # DCT concentrates a gradient hard
    out = mm.decode_image_real(blob)  # and it still decodes
    assert len(out["raster"]) == 4096


def test_jpeg_error_paths():
    gray = bytes(64)
    blob = mm.encode_jpeg(8, 8, gray)
    with pytest.raises(ValueError, match="SOI"):
        mm._decode_jpeg(b"\xff\xd9" + blob[2:])
    with pytest.raises(ValueError, match="truncated"):
        mm.decode_image_real(blob[: len(blob) // 2])
    # progressive (SOF2) is SUPPORTED since round 10 — but a BASELINE
    # stream with its SOF flipped to SOF2 is corrupt: the baseline SOS
    # declares Ss=0/Se=63, which is an illegal progressive DC scan
    prog = bytearray(blob)
    prog[blob.index(b"\xff\xc0") + 1] = 0xC2
    with pytest.raises(ValueError, match="Se != 0"):
        mm.decode_image_real(bytes(prog))
    with pytest.raises(ValueError, match="gray bytes"):
        mm.encode_jpeg(8, 8, bytes(63))
    with pytest.raises(ValueError, match="quant table"):
        mm.encode_jpeg(8, 8, gray, qtable=[0] * 64)


def test_jpeg_huffman_tables_are_consistent():
    """Every (run,size) symbol the encoder can emit must be encodable,
    and the canonical codes must be prefix-free."""
    ac = mm._jpeg_huff_codes(mm._JPEG_AC_BITS, mm._JPEG_AC_VALS)
    dc = mm._jpeg_huff_codes(mm._JPEG_DC_BITS, mm._JPEG_DC_VALS)
    assert set(dc) == set(range(12))
    assert 0x00 in ac and 0xF0 in ac  # EOB + ZRL
    for run in range(16):
        for size in range(1, 11):
            assert (run << 4) | size in ac
    codes = sorted((ln, code) for ln, code in ac.values())
    as_bits = [format(code, f"0{ln}b") for ln, code in codes]
    for i, a in enumerate(as_bits):
        for b in as_bits[i + 1 :]:
            assert not b.startswith(a), (a, b)


# ----------------------------------------------------------------- MaxSim


def test_maxsim_matches_numpy_and_guards_queries(spark, monkeypatch):
    import numpy as np
    import wms_data_pipeline_spark.operators.similarity as sim

    rng = np.random.default_rng(3)
    n_docs, tpd, dim = 12, 3, 8
    X = rng.normal(size=(n_docs * tpd, dim))
    rows = [
        (int(i // tpd), [float(x) for x in X[i]]) for i in range(len(X))
    ]
    toks = spark.createDataFrame(rows, "doc_id long, embedding array<double>")
    q = toks.filter(F.col("doc_id") < 2).withColumnRenamed("doc_id", "query_doc")
    got = {}
    for r in sim.maxsim_topk(toks.repartition(7), q, k=4).collect():
        got.setdefault(r.query_doc, []).append((r.maxsim_x1m, r.doc_id))
    # numpy reference: per query token, max cosine within each doc, to
    # integer micros, summed
    U = X / np.linalg.norm(X, axis=1, keepdims=True)
    sims = U @ U.T
    for qd in range(2):
        scores = {}
        for d in range(n_docs):
            s = 0
            for qt in range(qd * tpd, qd * tpd + tpd):
                m = sims[d * tpd : d * tpd + tpd, qt].max()
                s += int(np.floor(m * 1_000_000 + 0.5))
            scores[d] = s
        expect = sorted(((v, d) for d, v in scores.items()), key=lambda t: (-t[0], t[1]))[:4]
        assert sorted(got[qd], key=lambda t: (-t[0], t[1])) == expect
    monkeypatch.setattr(sim, "MAX_CLOSURE_QUERIES", 3)
    with pytest.raises(ValueError, match="maxsim_topk"):
        sim.maxsim_topk(toks, q)


def test_maxsim_empty_queries_short_circuits(spark):
    import wms_data_pipeline_spark.operators.similarity as sim

    toks = spark.createDataFrame(
        [(0, [1.0, 0.0])], "doc_id long, embedding array<double>"
    )
    q = toks.filter("doc_id < 0").withColumnRenamed("doc_id", "query_doc")
    out = sim.maxsim_topk(toks, q)
    assert out.count() == 0
    assert out.columns == ["query_doc", "doc_id", "maxsim_x1m"]


# -------------------------------------------------------------- graph: BFS


def test_bfs_hops_matches_reference_and_is_partition_invariant(spark):
    from wms_data_pipeline_spark.operators import graph as gr

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("a", "c"), ("x", "a")],
        "src string, dst string",
    )
    src = spark.createDataFrame([("a",)], "node string")
    got = {r.node: r.hops for r in gr.bfs_hops(edges, src, max_hops=4).collect()}
    # a=0, b=1, c=1 (direct a->c beats a->b->c), d=2, e=3; x unreachable
    assert got == {"a": 0, "b": 1, "c": 1, "d": 2, "e": 3}
    got7 = {
        r.node: r.hops
        for r in gr.bfs_hops(edges.repartition(7), src, max_hops=4).collect()
    }
    assert got7 == got
    # multi-source takes the nearest source
    src2 = spark.createDataFrame([("a",), ("d",)], "node string")
    got2 = {r.node: r.hops for r in gr.bfs_hops(edges, src2, max_hops=4).collect()}
    assert got2["e"] == 1 and got2["d"] == 0
    # hop cap truncates reach
    got1 = {r.node: r.hops for r in gr.bfs_hops(edges, src, max_hops=1).collect()}
    assert "d" not in got1 and got1 == {"a": 0, "b": 1, "c": 1}


def test_bfs_hops_local_matches_distributed(spark):
    import random

    from wms_data_pipeline_spark.operators import graph as gr

    rng = random.Random(11)
    edges = spark.createDataFrame(
        [
            (f"n{rng.randrange(40)}", f"n{rng.randrange(40)}")
            for _ in range(120)
        ],
        "src string, dst string",
    )
    src = spark.createDataFrame([("n0",), ("n7",)], "node string")
    loc = {
        r.node: r.hops
        for r in gr.bfs_hops(edges, src, max_hops=5, strategy="local").collect()
    }
    dist = {
        r.node: r.hops
        for r in gr.bfs_hops(
            edges, src, max_hops=5, strategy="distributed"
        ).collect()
    }
    assert loc == dist
    with pytest.raises(ValueError, match="strategy"):
        gr.bfs_hops(edges, src, strategy="nope")


def test_skyline_nd_matches_bruteforce(spark):
    from wms_data_pipeline_spark.operators import graph as gr

    import random

    rng = random.Random(88)
    pts = [
        (rng.randint(0, 12), rng.randint(0, 12), rng.randint(0, 12))
        for _ in range(400)
    ]
    pts += [(0, 1, 2), (0, 1, 2), (1, 1, 1)]
    df = spark.createDataFrame(
        [(i, *p) for i, p in enumerate(pts)], "id long, a long, b long, c long"
    )
    got = sorted(
        (r.a, r.b, r.c)
        for r in gr.skyline_nd(df.repartition(11), ["a", "b", "c"]).collect()
    )
    brute = sorted(
        p
        for p in set(pts)
        if not any(
            all(q[i] <= p[i] for i in range(3)) and q != p for q in pts
        )
    )
    assert sorted(set(got)) == brute
    assert all(p in brute for p in got)  # dups of pareto points only
    with pytest.raises(ValueError, match="at least 2"):
        gr.skyline_nd(df, ["a"])


def test_skyline_stage2_pools_across_arrow_batches(spark, monkeypatch):
    """>10k stage-2 candidates span multiple Arrow batches (default
    maxRecordsPerBatch=10000); the global pass must pool them or it
    emits per-batch skylines — dominated points whose dominator sits in
    another batch would survive (code-review r8)."""
    from wms_data_pipeline_spark.operators import graph as gr

    n = 15_000
    diag = spark.range(n).selectExpr("id AS x", f"{n} - id AS y")
    # 500 dominated points: (i+1, n+1-i) is beaten by diagonal (i+1, n-i-1)
    dominated = spark.range(500).selectExpr("id + 1 AS x", f"{n} + 1 - id AS y")
    pts = diag.unionByName(dominated).repartition(16)
    out = gr.skyline_2d(pts, "x", "y")
    assert out.count() == n
    df3 = pts.withColumn("z", F.lit(0))
    assert gr.skyline_nd(df3, ["x", "y", "z"]).count() == n


# ----------------------------------------------- trend slope / changepoint


def test_trend_slope_sign_matches_construction(spark):
    from wms_data_pipeline_spark.plans.queries import REGISTRY

    rows = REGISTRY["evt_trend_slope"].fn(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 5
    for r in rows:
        assert r.slope_den > 0  # day numbers are never all-equal
        # slope magnitude sanity: |num/den| bounded by max daily count
        assert abs(r.slope_num) <= r.slope_den * 10_000


def test_cusum_changepoint_locates_injected_shift(spark):
    from wms_data_pipeline_spark.operators import graph  # noqa: F401  (import path sanity)
    import wms_data_pipeline_spark.plans.queries as Q

    # synthetic series: 20 days at level 10, then 20 days at level 50 --
    # the scaled CUSUM |sum(nd*x - S)| must peak exactly at the shift
    import duckdb

    con = duckdb.connect()
    rows = con.sql(
        """
        WITH d AS (
          SELECT 'a' AS event_type, range AS day_no,
                 CASE WHEN range < 20 THEN 10 ELSE 50 END AS n
          FROM range(0, 40)),
        t AS (SELECT event_type, count(*) AS nd, sum(n) AS s FROM d GROUP BY 1),
        c AS (SELECT d.event_type, d.day_no,
              sum(t.nd * d.n - t.s) OVER (PARTITION BY d.event_type
              ORDER BY d.day_no ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cusum
              FROM d JOIN t USING (event_type))
        SELECT day_no FROM (SELECT *, row_number() OVER (PARTITION BY event_type
        ORDER BY abs(cusum) DESC, day_no) rn FROM c) WHERE rn = 1
        """
    ).fetchall()
    assert rows[0][0] == 19  # last day of the low regime


# ----------------------------------------------- zorder + compaction


def test_zorder_key_interleaves_and_guards(spark):
    from wms_data_pipeline_spark.operators import relational as rel

    df = spark.createDataFrame([(0b101, 0b011)], "a long, b long")
    key = df.select(rel.zorder_key(["a", "b"], bits=3).alias("k")).collect()[0].k
    # interleave a=101, b=011 -> bits (b2 a2 b1 a1 b0 a0) = 0 1 1 0 1 1
    assert key == 0b011011
    with pytest.raises(ValueError, match="BIGINT"):
        rel.zorder_key(["a", "b"], bits=32)
    # locality: sorting by zkey bounds BOTH dims within contiguous runs
    import itertools

    pts = list(itertools.product(range(16), range(16)))
    big = spark.createDataFrame(pts, "a long, b long")
    rows = (
        big.withColumn("k", rel.zorder_key(["a", "b"], bits=4))
        .orderBy("k")
        .collect()
    )
    quarter = rows[:64]  # first quarter of z-order = one 8x8 quadrant
    assert max(r.a for r in quarter) < 8 and max(r.b for r in quarter) < 8


def test_compact_dataset_merges_small_files(spark, tmp_path):
    from wms_data_pipeline_spark.sources.landing import compact_dataset

    path = str(tmp_path / "zone")
    spark.range(10000).repartition(40).write.parquet(path)
    import os

    n0 = sum(1 for f in os.listdir(path) if f.endswith(".parquet"))
    assert n0 == 40
    stats = compact_dataset(spark, path, target_file_mb=128)
    assert stats["files_before"] == 40 and stats["files_after"] == 1
    assert stats["rows"] == 10000
    got = spark.read.parquet(path)
    assert got.count() == 10000
    assert got.agg(F.sum("id")).collect()[0][0] == sum(range(10000))
    assert not os.path.exists(path + ".__compact_tmp")
    assert not os.path.exists(path + ".__compact_trash")


# -------------------------------------------------------------- BPE trainer


def test_bpe_train_matches_textbook_sequence(spark):
    """The Sennrich et al. example corpus must produce the canonical
    merge order; ties break count-desc then lexicographic."""
    import wms_data_pipeline_spark.operators.text as txt

    text = " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)
    docs = spark.createDataFrame([(text,)], "text string")
    merges, vocab = txt.bpe_train(docs, num_merges=6)
    got = [(r.left, r.right, r.pair_count) for r in merges.orderBy("rank").collect()]
    assert got == [
        ("e", "s", 9),
        ("es", "t", 9),
        ("est", "</w>", 9),
        ("l", "o", 7),
        ("lo", "w", 7),
        ("e", "w", 6),
    ]
    # vocab state after the merges: 'newest' is [n, ew, est</w>]
    v = {tuple(r.syms): r.c for r in vocab.collect()}
    assert v[("n", "ew", "est</w>")] == 6
    assert v[("low", "</w>")] == 5


def test_bpe_train_is_partition_invariant_and_stops_on_singletons(spark):
    import wms_data_pipeline_spark.operators.text as txt

    text = "aaab aaab abab cdcd cdcd"
    d1 = spark.createDataFrame([(text,)], "text string")
    d2 = spark.createDataFrame([(w,) for w in text.split()], "text string").repartition(5)
    m1 = [(r.left, r.right) for r in txt.bpe_train(d1, num_merges=4)[0].orderBy("rank").collect()]
    m2 = [(r.left, r.right) for r in txt.bpe_train(d2, num_merges=4)[0].orderBy("rank").collect()]
    assert m1 == m2
    # a corpus with no repeating pair (all count<2) learns nothing
    empty = spark.createDataFrame([("xy",)], "text string")
    m0, _ = txt.bpe_train(empty, num_merges=3)
    assert m0.count() == 0


# ------------------------------------------- CDC apply_changes (tombstones)


def test_apply_changes_tombstone_and_compose_equals_replay(spark):
    from wms_data_pipeline_spark.operators.merge import apply_changes

    rows = [
        # (key, seq, val, op)
        ("a", 1, "a1", "U"),
        ("a", 2, "a2", "U"),
        ("b", 1, "b1", "U"),
        ("b", 2, None, "D"),   # b deleted
        ("c", 1, None, "D"),   # c never existed -> still absent
        ("c", 2, "c2", "U"),   # ...but revived later
        ("d", 1, "d1", "U"),
        ("d", 3, None, "D"),   # d's delete wins over the later-arriving d@2
        ("d", 2, "d2", "U"),
    ]
    ch = spark.createDataFrame(rows, "k string, seq int, v string, op string")
    replay = {
        (r.k, r.seq, r.v)
        for r in apply_changes(None, ch, "k", ["seq"]).collect()
    }
    assert replay == {("a", 2, "a2"), ("c", 2, "c2")}

    # compose: snapshot at seq<=1 then delta seq>1 == full replay
    snap = apply_changes(None, ch.filter("seq <= 1"), "k", ["seq"])
    composed = {
        (r.k, r.seq, r.v)
        for r in apply_changes(snap, ch.filter("seq > 1"), "k", ["seq"]).collect()
    }
    assert composed == replay

    with pytest.raises(ValueError, match="op column"):
        apply_changes(None, ch.drop("op"), "k", ["seq"])
    with pytest.raises(ValueError, match="compacted"):
        apply_changes(ch, ch, "k", ["seq"])


# --------------------------------------------------- CMS heavy hitters


def test_cms_heavy_keys_exact_vs_brute(spark):
    import random

    from wms_data_pipeline_spark.operators import text as txt

    rng = random.Random(5)
    vals = [f"k{rng.randrange(400)}" for _ in range(3000)] + ["hot"] * 50
    df = spark.createDataFrame([(v,) for v in vals], "g string")
    got = {(r.g, r.n) for r in txt.cms_heavy_keys(df, "g", 12).collect()}
    from collections import Counter

    want = {(k, n) for k, n in Counter(vals).items() if n >= 12}
    assert got == want and ("hot", 50) in got

    # narrow fixed width on a uniform corpus must fail loudly, not
    # silently degrade to a full shuffle
    with pytest.raises(ValueError, match="widen the sketch"):
        txt.cms_heavy_keys(df, "g", 2, width=64)


# ------------------------------------------------ expectations_report


def test_expectations_report_long_form(spark):
    from wms_data_pipeline_spark.operators.quality import (
        accepted_values,
        expectations_report,
        in_range,
    )

    df = spark.createDataFrame(
        [("A", 5), ("B", 200), (None, 7), ("A", None)],
        "flag string, qty int",
    )
    rules = {**accepted_values("flag", "AB"), **in_range("qty", 0, 100)}
    got = {r.rule: (r.n_rows, r.n_violations) for r in
           expectations_report(df, rules).collect()}
    # null flag and null qty both count as violations
    assert got == {"flag_domain": (4, 1), "qty_range": (4, 2)}
    with pytest.raises(ValueError, match="no expectations"):
        expectations_report(df, {})
