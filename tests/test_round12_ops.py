"""Round-12 operator tests: the quantized KS reference store (VERDICT
r11 #2) and the round's new operators as they land."""
import random

import pytest
from pyspark.sql import functions as F

from wms_data_pipeline_spark.operators.quality import (
    ks_drift,
    ks_drift_probe,
    ks_drift_probe_quantized,
    ks_reference_write,
    ks_reference_write_quantized,
)


def _pop(spark, ref_vals, cur_vals, group="g1"):
    rows = [(group, float(v), False) for v in ref_vals] + [
        (group, float(v), True) for v in cur_vals
    ]
    return spark.createDataFrame(rows, "g string, v double, cur boolean")


def _ks_rows(df):
    return {r["g"]: (r["n_ref"], r["n_cur"], r["ks_x1e6"]) for r in df.collect()}


# ------------------------------------------------ quantized KS: exactness

def test_ks_quantized_bit_exact_on_small_range_integers(spark, tmp_path):
    """Integer metric with per-group range < n_bins: the quantizer is
    injective on observed values, so the quantized probe must be
    BIT-IDENTICAL to the exact-store probe AND the batch recompute."""
    rng = random.Random(12)
    ref = [rng.randint(0, 500) for _ in range(400)]
    # current drawn shifted but inside the reference range (no clamping,
    # keeps the quantizer injective on the union)
    cur = [rng.randint(100, 500) for _ in range(300)]
    df = _pop(spark, ref, cur)

    exact_p = str(tmp_path / "exact")
    quant_p = str(tmp_path / "quant")
    ref_df = df.filter(~F.col("cur"))
    cur_df = df.filter(F.col("cur"))
    ks_reference_write(ref_df, "g", "v", exact_p)
    ks_reference_write_quantized(ref_df, "g", "v", quant_p, n_bins=1024)

    batch = _ks_rows(ks_drift(df, "g", "v", "cur"))
    exact = _ks_rows(ks_drift_probe(cur_df, "g", "v", exact_p))
    quant = _ks_rows(ks_drift_probe_quantized(cur_df, "g", "v", quant_p))
    assert batch == exact == quant
    assert quant["g1"][2] is not None and quant["g1"][2] > 0


def test_ks_quantized_bounded_error_on_continuous_doubles(spark, tmp_path):
    """Near-continuous doubles: one-sided epsilon-KS —
    KS_q <= KS_exact <= KS_q + max-bin-mass(either population)."""
    rng = random.Random(34)
    ref = [rng.uniform(0.0, 100.0) for _ in range(2000)]
    cur = [rng.uniform(20.0, 100.0) for _ in range(1500)]  # location drift
    df = _pop(spark, ref, cur)
    n_bins = 256

    quant_p = str(tmp_path / "quant")
    ref_df = df.filter(~F.col("cur"))
    ks_reference_write_quantized(ref_df, "g", "v", quant_p, n_bins=n_bins)

    exact_ks = _ks_rows(ks_drift(df, "g", "v", "cur"))["g1"][2]
    quant_ks = _ks_rows(
        ks_drift_probe_quantized(df.filter(F.col("cur")), "g", "v", quant_p)
    )["g1"][2]

    # max single-bin probability mass of either population, in 1e6 units
    # (the analytical error bound from the writer docstring)
    spark_store = spark.read.parquet(quant_p)
    max_ref_mass = (
        spark_store.agg(
            (F.max("_r") * 1000000 / F.sum("_r")).alias("m")
        ).collect()[0]["m"]
    )
    edges = spark_store.agg(F.max("_mn"), F.max("_mx")).collect()[0]
    mn, mx = edges[0], edges[1]
    import collections

    cur_bins = collections.Counter(
        min(n_bins - 1, max(0, int((v - mn) * n_bins // (mx - mn))))
        for v in cur
    )
    max_cur_mass = max(cur_bins.values()) * 1000000 / len(cur)
    bound = max(max_ref_mass, max_cur_mass) + 2  # +2: integer-div grain

    assert quant_ks <= exact_ks, (quant_ks, exact_ks)
    assert exact_ks - quant_ks <= bound, (exact_ks, quant_ks, bound)
    # and the drift is actually detected (true KS here is 0.2)
    assert quant_ks > 140000


def test_ks_quantized_store_is_bounded_by_grid(spark, tmp_path):
    """THE point of the quantized store: rows <= groups x n_bins even
    when every reference value is distinct (the exact store would be
    one row per distinct value ~= per reference row)."""
    rng = random.Random(56)
    ref = [rng.uniform(0, 1) for _ in range(5000)]  # all distinct
    df = _pop(spark, ref, [0.5])
    exact_p, quant_p = str(tmp_path / "e"), str(tmp_path / "q")
    ref_df = df.filter(~F.col("cur"))
    ks_reference_write(ref_df, "g", "v", exact_p)
    ks_reference_write_quantized(ref_df, "g", "v", quant_p, n_bins=128)
    n_exact = spark.read.parquet(exact_p).count()
    n_quant = spark.read.parquet(quant_p).count()
    assert n_exact == 5000  # the pathology: store ~= reference
    assert n_quant <= 128  # the fix: grid-bounded


def test_ks_quantized_out_of_range_current_clamps_to_edge_bins(spark, tmp_path):
    """Current values outside the frozen reference range clamp into the
    edge bins (out-of-range mass IS edge drift) — a wholly-shifted batch
    must max out the statistic, not error or vanish."""
    ref = [float(v) for v in range(100)]
    cur = [1000.0 + v for v in range(50)]  # entirely above the ref range
    df = _pop(spark, ref, cur)
    quant_p = str(tmp_path / "q")
    ks_reference_write_quantized(
        df.filter(~F.col("cur")), "g", "v", quant_p, n_bins=64
    )
    out = _ks_rows(
        ks_drift_probe_quantized(df.filter(F.col("cur")), "g", "v", quant_p)
    )
    n_ref, n_cur, ks = out["g1"]
    assert (n_ref, n_cur) == (100, 50)
    # all current mass in the top bin: KS gap peaks just below it
    assert ks >= 980000


def test_ks_quantized_unknown_group_not_audited(spark, tmp_path):
    """Groups never seen in the reference have no frozen geometry — the
    probe must not audit them (the PSI-probe rule)."""
    df = _pop(spark, [1.0, 2.0, 3.0], [2.0])
    quant_p = str(tmp_path / "q")
    ks_reference_write_quantized(
        df.filter(~F.col("cur")), "g", "v", quant_p
    )
    cur = spark.createDataFrame(
        [("g1", 2.5, True), ("g_new", 9.9, True)],
        "g string, v double, cur boolean",
    )
    out = _ks_rows(ks_drift_probe_quantized(cur, "g", "v", quant_p))
    assert set(out) == {"g1"}


def test_ks_quantized_rejects_degenerate_grid(spark):
    df = _pop(spark, [1.0], [1.0])
    with pytest.raises(ValueError, match="n_bins"):
        ks_reference_write_quantized(df, "g", "v", "/tmp/never", n_bins=1)


# --------------------------------------- incremental source-overlap matrix

def _docs(spark, rows):
    """rows: (doc_id, source, text)"""
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def _matrix(df):
    return sorted(map(tuple, df.collect()))


def test_source_overlap_probe_matches_batch_on_real_split(spark):
    """THE parity pin (VERDICT r11 #4): index(corpus) + probe(delta) must
    reproduce the batch matrix over corpus ∪ delta bit-for-bit on the
    real documents table."""
    from wms_data_pipeline_spark.plans.queries import REGISTRY

    sf = "/root/testdata/sf0.001"
    batch = _matrix(REGISTRY["dd_source_overlap_matrix"].fn(spark, sf))
    incr = _matrix(REGISTRY["dd_source_overlap_incremental"].fn(spark, sf))
    assert len(batch) > 0
    assert incr == batch


def test_source_overlap_probe_additions(spark, tmp_path):
    """A delta source joining existing shingles adds old×new + C(new,2)
    pairs and bumps totals; containment recomputes from merged counts."""
    from wms_data_pipeline_spark.operators.dedup import (
        source_overlap_index_write,
        source_overlap_probe,
    )

    corpus = _docs(
        spark,
        [(1, "s1", "alpha beta"), (2, "s2", "alpha gamma")],
    )
    delta = _docs(spark, [(3, "s3", "alpha beta delta")])
    p = str(tmp_path / "idx")
    source_overlap_index_write(corpus, p, shingle_n=1, max_sources=8)
    out = {
        (r["source_a"], r["source_b"]): (
            r["n_shared"], r["n_shingles_a"], r["n_shingles_b"], r["containment"]
        )
        for r in source_overlap_probe(spark, delta, p).collect()
    }
    # shingles: alpha{s1,s2,s3} beta{s1,s3} gamma{s2} delta{s3}
    assert out == {
        ("s1", "s2"): (1, 2, 2, 0.5),
        ("s1", "s3"): (2, 2, 3, 1.0),
        ("s2", "s3"): (1, 2, 3, 0.5),
    }


def test_source_overlap_probe_dfcut_crossing_retracts(spark, tmp_path):
    """A delta pushing a shingle over the df-cut must RETRACT that
    shingle's old pairs and totals — exactly what the batch recompute
    over corpus ∪ delta does (it drops the shingle wholesale)."""
    from wms_data_pipeline_spark.operators.dedup import (
        source_overlap_index_write,
        source_overlap_probe,
    )

    corpus = _docs(
        spark,
        [(1, "s1", "alpha beta"), (2, "s2", "alpha beta")],
    )
    delta = _docs(spark, [(3, "s3", "alpha gamma")])
    p = str(tmp_path / "idx")
    source_overlap_index_write(corpus, p, shingle_n=1, max_sources=2)
    probe = _matrix(source_overlap_probe(spark, delta, p))
    # alpha crosses the cut (3 sources > 2): only beta still links s1-s2
    full = str(tmp_path / "full")
    source_overlap_index_write(
        corpus.unionByName(delta), full, shingle_n=1, max_sources=2
    )
    batch = _matrix(
        source_overlap_probe(
            spark, _docs(spark, []).limit(0), full
        )
    )
    assert probe == batch
    assert probe == [("s1", "s2", 1, 1, 1, 1.0)]


def test_source_overlap_probe_empty_delta_returns_stored_matrix(spark, tmp_path):
    from wms_data_pipeline_spark.operators.dedup import (
        source_overlap_index_write,
        source_overlap_probe,
    )

    corpus = _docs(spark, [(1, "s1", "x y"), (2, "s2", "x z")])
    p = str(tmp_path / "idx")
    source_overlap_index_write(corpus, p, shingle_n=1)
    out = _matrix(source_overlap_probe(spark, _docs(spark, []), p))
    assert out == [("s1", "s2", 1, 2, 2, 0.5)]


# ------------------------------------------ prefix-dim rerank top-k

def test_prefix_rerank_recall_and_validation(spark):
    from wms_data_pipeline_spark.operators import similarity as sim
    from wms_data_pipeline_spark.schemas import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = sim.cosine_topk(emb, queries, k=10)
    pre = sim.prefix_rerank_topk(
        emb, queries, k=10, prefix_dims=16, shortlist=100
    )
    ex = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    pr_rows = pre.collect()
    pr = {(r["query_id"], r["vec_id"]) for r in pr_rows}
    # per-query row count is exactly k
    assert len(pr_rows) == 30
    # the re-rank scores are EXACT cosines: any overlap with the exact
    # top-k must carry identical scores
    ex_scores = {(r["query_id"], r["vec_id"]): r["cosine_sim"] for r in exact.collect()}
    for r in pr_rows:
        key = (r["query_id"], r["vec_id"])
        if key in ex_scores:
            assert r["cosine_sim"] == ex_scores[key]
    # recall on this generic (non-MRL) corpus with a 100-wide shortlist
    recall = len(ex & pr) / len(ex)
    assert recall >= 0.5, recall

    with pytest.raises(ValueError, match="shortlist"):
        sim.prefix_rerank_topk(emb, queries, k=10, shortlist=5)
    with pytest.raises(ValueError, match="prefix_dims"):
        sim.prefix_rerank_topk(emb, queries, k=10, prefix_dims=0)


# --------------------------------------- source-overlap index UPDATE

def _empty_docs(spark):
    return spark.createDataFrame([], "doc_id long, source string, text string")


def test_source_overlap_update_then_probe_matches_batch(spark, tmp_path):
    """The ingest loop: build(corpus) -> update(d1) -> probe(d2) must
    equal the batch matrix over corpus ∪ d1 ∪ d2 — including a d1 that
    pushes a shingle over the df-cut (the stored NULL set must stay
    dropped when d2 touches it again)."""
    from wms_data_pipeline_spark.operators.dedup import (
        source_overlap_index_update,
        source_overlap_index_write,
        source_overlap_probe,
    )

    corpus = _docs(spark, [(1, "s1", "alpha beta"), (2, "s2", "alpha gamma")])
    d1 = _docs(spark, [(3, "s3", "alpha beta epsilon")])
    d2 = _docs(spark, [(4, "s4", "alpha gamma epsilon zeta")])
    p = str(tmp_path / "idx")
    # max_sources=2: d1 pushes "alpha" over the cut (s1,s2,s3)
    source_overlap_index_write(corpus, p, shingle_n=1, max_sources=2)
    source_overlap_index_update(spark, d1, p)
    got = _matrix(source_overlap_probe(spark, d2, p))

    full = str(tmp_path / "full")
    source_overlap_index_write(
        corpus.unionByName(d1).unionByName(d2), full,
        shingle_n=1, max_sources=2,
    )
    want = _matrix(source_overlap_probe(spark, _empty_docs(spark), full))
    assert got == want
    assert len(got) > 0


def test_source_overlap_update_is_idempotent(spark, tmp_path):
    """Re-applying the same delta must be a no-op (crashed-and-retried
    ingest converges) — including deltas that created new shingles and
    deltas that crossed the df-cut."""
    from wms_data_pipeline_spark.operators.dedup import (
        source_overlap_index_update,
        source_overlap_index_write,
        source_overlap_probe,
    )

    corpus = _docs(spark, [(1, "s1", "alpha beta"), (2, "s2", "alpha")])
    d1 = _docs(spark, [(3, "s3", "alpha newword")])
    p = str(tmp_path / "idx")
    source_overlap_index_write(corpus, p, shingle_n=1, max_sources=2)
    source_overlap_index_update(spark, d1, p)
    once = _matrix(source_overlap_probe(spark, _empty_docs(spark), p))
    source_overlap_index_update(spark, d1, p)
    twice = _matrix(source_overlap_probe(spark, _empty_docs(spark), p))
    assert once == twice


def test_source_overlap_update_rewrites_only_touched_buckets(spark, tmp_path):
    """Dynamic partition overwrite: buckets none of the delta's shingles
    hash into keep their original files byte-for-byte."""
    import os

    from wms_data_pipeline_spark.operators.dedup import (
        source_overlap_index_update,
        source_overlap_index_write,
    )

    corpus = _docs(
        spark,
        [(i, f"s{i}", f"word{i} shared") for i in range(8)],
    )
    p = str(tmp_path / "idx")
    source_overlap_index_write(corpus, p, shingle_n=1)
    sets_dir = p + "/shingle_sets"
    before = {}
    for gb in os.listdir(sets_dir):
        if gb.startswith("gb="):
            d = os.path.join(sets_dir, gb)
            before[gb] = sorted(
                (f, os.path.getmtime(os.path.join(d, f)))
                for f in os.listdir(d) if f.endswith(".parquet")
            )
    delta = _docs(spark, [(100, "s9", "word0")])  # touches few buckets
    source_overlap_index_update(spark, delta, p)
    untouched_same = 0
    for gb, files in before.items():
        d = os.path.join(sets_dir, gb)
        now = sorted(
            (f, os.path.getmtime(os.path.join(d, f)))
            for f in os.listdir(d) if f.endswith(".parquet")
        )
        if now == files:
            untouched_same += 1
    # the delta has 1 shingle -> at most 1 bucket rewritten
    assert untouched_same >= len(before) - 1 > 0


# ----------------------------------- streaming contamination monitor

def test_overlap_monitor_stream_snapshots_and_updates(spark, tmp_path):
    """Two micro-batches: batch 2's snapshot must include batch 1's
    shingles (the index update is visible), and the final snapshot must
    equal the batch matrix over corpus ∪ batch1 ∪ batch2."""
    from wms_data_pipeline_spark.operators.dedup import (
        source_overlap_index_write,
        source_overlap_probe,
    )
    from wms_data_pipeline_spark.streaming.pipeline import (
        overlap_monitor_stream,
    )

    corpus = _docs(spark, [(1, "s1", "alpha beta"), (2, "s2", "alpha gamma")])
    index = "file://" + str(tmp_path / "ovidx")
    source_overlap_index_write(corpus, index, shingle_n=1)

    src = str(tmp_path / "incoming")
    b1 = [(3, "s3", "beta gamma")]
    b2 = [(4, "s4", "beta delta")]
    schema = "doc_id long, source string, text string"
    spark.createDataFrame(b1, schema).coalesce(1).write.mode("append").parquet(src)
    matrix_out = str(tmp_path / "matrix")
    ckpt = str(tmp_path / "ckpt")

    def run():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        overlap_monitor_stream(
            stream, index, matrix_out, ckpt
        ).awaitTermination(120)

    run()
    spark.createDataFrame(b2, schema).coalesce(1).write.mode("append").parquet(src)
    run()

    snaps = spark.read.parquet(matrix_out)
    assert {r.batch_id for r in snaps.select("batch_id").distinct().collect()} == {0, 1}
    last = sorted(
        map(tuple, snaps.filter(F.col("batch_id") == 1).drop("batch_id").collect())
    )
    full = "file://" + str(tmp_path / "full")
    source_overlap_index_write(
        corpus.unionByName(_docs(spark, b1)).unionByName(_docs(spark, b2)),
        full, shingle_n=1,
    )
    want = sorted(map(tuple, source_overlap_probe(
        spark, _empty_docs(spark), full
    ).collect()))
    assert last == want
    # batch-2 snapshot sees the s3-s4 shared "beta" — proof the update
    # from batch 1 was visible when batch 2 probed
    assert any(r[0] == "s3" and r[1] == "s4" for r in last)


def test_overlap_monitor_stream_requires_bootstrapped_index(spark, tmp_path):
    from wms_data_pipeline_spark.streaming.pipeline import (
        overlap_monitor_stream,
    )

    (tmp_path / "in").mkdir()
    stream = spark.readStream.schema(
        "doc_id long, source string, text string"
    ).parquet(str(tmp_path / "in"))
    with pytest.raises(ValueError, match="no source-overlap index"):
        overlap_monitor_stream(
            stream, str(tmp_path / "missing"), str(tmp_path / "m"),
            str(tmp_path / "c"),
        )


# ----------------------------------------------- W1 drift (same store)

def test_w1_quantized_hand_computed_shift(spark, tmp_path):
    """ref = {0, 10} (50/50), cur = all 10: the ECDF gap is 0.5 across
    the whole [0, 10] range, so true W1 = 5.0; on the 1024-bin grid the
    gap spans 1023 steps of width 10/1024 -> exactly 0.5 * 1023 *
    10/1024 = 4.995117 (one half-bin of quantization transport)."""
    from wms_data_pipeline_spark.operators.quality import (
        ks_reference_write_quantized,
        w1_drift_probe_quantized,
    )

    df = _pop(spark, [0.0, 10.0], [10.0, 10.0, 10.0])
    p = str(tmp_path / "q")
    ks_reference_write_quantized(df.filter(~F.col("cur")), "g", "v", p)
    rows = w1_drift_probe_quantized(
        df.filter(F.col("cur")), "g", "v", p
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["n_ref"], r["n_cur"]) == (2, 3)
    assert r["w1"] == round(0.5 * 1023 * 10 / 1024, 6)  # 4.995117
    assert abs(r["w1"] - 5.0) <= 10 / 1024


def test_w1_quantized_identical_populations_near_zero(spark, tmp_path):
    from wms_data_pipeline_spark.operators.quality import (
        ks_reference_write_quantized,
        w1_drift_probe_quantized,
    )

    vals = [float(v) for v in range(100)]
    df = _pop(spark, vals, vals)
    p = str(tmp_path / "q")
    ks_reference_write_quantized(df.filter(~F.col("cur")), "g", "v", p)
    r = w1_drift_probe_quantized(
        df.filter(F.col("cur")), "g", "v", p
    ).collect()[0]
    assert r["w1"] == 0.0  # same values -> same bins -> zero transport


def test_w1_quantized_group_without_current_rows_is_null(spark, tmp_path):
    from wms_data_pipeline_spark.operators.quality import (
        ks_reference_write_quantized,
        w1_drift_probe_quantized,
    )

    ref = spark.createDataFrame(
        [("g1", 1.0), ("g1", 2.0), ("g2", 5.0), ("g2", 9.0)],
        "g string, v double",
    )
    p = str(tmp_path / "q")
    ks_reference_write_quantized(ref, "g", "v", p)
    cur = spark.createDataFrame([("g1", 2.0)], "g string, v double")
    out = {r["g"]: (r["n_cur"], r["w1"]) for r in
           w1_drift_probe_quantized(cur, "g", "v", p).collect()}
    assert out["g1"][0] == 1 and out["g1"][1] is not None
    assert out["g2"] == (0, None)


def test_w1_windows_quantized_single_window_reproduces_probe(spark, tmp_path):
    from wms_data_pipeline_spark.operators.quality import (
        ks_reference_write_quantized,
        w1_drift_probe_quantized,
        w1_drift_windows_quantized,
    )

    rng = random.Random(90)
    ref = [rng.uniform(0, 50) for _ in range(700)]
    cur = [rng.uniform(15, 65) for _ in range(500)]
    df = _pop(spark, ref, cur)
    p = str(tmp_path / "q")
    ks_reference_write_quantized(df.filter(~F.col("cur")), "g", "v", p)
    cur_df = df.filter(F.col("cur")).withColumn("w", F.lit("all"))
    probe = {
        r["g"]: (r["n_ref"], r["n_cur"], r["w1"])
        for r in w1_drift_probe_quantized(cur_df, "g", "v", p).collect()
    }
    winr = {
        r["g"]: (r["n_ref"], r["n_cur"], r["w1"])
        for r in w1_drift_windows_quantized(cur_df, "g", "v", "w", p).collect()
    }
    assert probe == winr and probe["g1"][2] > 0


def test_ks_windows_quantized_single_window_reproduces_probe(spark, tmp_path):
    """A window holding the whole batch must reproduce the quantized
    probe bit-for-bit (the same pin the exact windowed series carries)."""
    from wms_data_pipeline_spark.operators.quality import (
        ks_drift_probe_quantized,
        ks_drift_windows_quantized,
        ks_reference_write_quantized,
    )

    rng = random.Random(78)
    ref = [rng.uniform(0, 50) for _ in range(800)]
    cur = [rng.uniform(10, 60) for _ in range(600)]
    df = _pop(spark, ref, cur)
    p = str(tmp_path / "q")
    ks_reference_write_quantized(df.filter(~F.col("cur")), "g", "v", p)
    cur_df = df.filter(F.col("cur")).withColumn("w", F.lit("all"))
    probe = _ks_rows(ks_drift_probe_quantized(cur_df, "g", "v", p))
    winr = {
        r["g"]: (r["n_ref"], r["n_cur"], r["ks_x1e6"])
        for r in ks_drift_windows_quantized(cur_df, "g", "v", "w", p).collect()
    }
    assert probe == winr
    # and a split into two windows audits each independently
    cur2 = df.filter(F.col("cur")).withColumn(
        "w", F.when(F.col("v") < 35, "lo").otherwise("hi")
    )
    out = ks_drift_windows_quantized(cur2, "g", "v", "w", p)
    rows = out.collect()
    assert {r["w"] for r in rows} == {"lo", "hi"}
    assert all(r["n_ref"] == 800 for r in rows)


# -------------------------------------------- graph rounds via metadata

def test_graph_rounds_in_result_metadata(spark):
    """VERDICT r11 #6: executed round counts travel WITH the result
    (column metadata, read via graph_rounds) instead of module state —
    both strategies, both operators; metadata survives downstream
    selects that keep the column."""
    from wms_data_pipeline_spark.operators import graph as gr

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c")], "src string, dst string"
    )
    srcs = spark.createDataFrame([("a",)], "node string")
    for strategy in ("local", "distributed"):
        bfs = gr.bfs_hops(
            edges, srcs, max_hops=8, strategy=strategy, checkpoint_every=1
        )
        r = gr.graph_rounds(bfs)
        assert r is not None and 1 <= r <= 3, (strategy, r)
        # survives a projection that keeps the column
        assert gr.graph_rounds(bfs.select("node", "hops")) == r

    wedges = spark.createDataFrame(
        [("a", "b", 1), ("b", "c", 1)], "src string, dst string, cost int"
    )
    for strategy in ("local", "distributed"):
        sp = gr.shortest_paths(
            wedges, srcs, max_hops=8, strategy=strategy, checkpoint_every=1
        )
        r = gr.graph_rounds(sp, col="dist_cost")
        assert r is not None and 1 <= r <= 4, (strategy, r)
    # no metadata -> None, never a crash
    assert gr.graph_rounds(edges) is None


# ------------------------------------------------- GIF frame composition

def test_gif_composed_canvas_semantics():
    """Hand-computed 3x2 animation: disposal-1 persistence, transparent
    passthrough onto the intact canvas, then disposal-2 black holes."""
    from wms_data_pipeline_spark.operators.multimodal import (
        encode_gif_animation_frames,
        gif_frames,
    )

    palette = bytes(b for i in range(256) for b in (i, (2 * i) % 256, (3 * i) % 256))
    specs = [
        # full-screen base: indices 10..15, keep in place
        {"indices": bytes(range(10, 16)), "disposal": 1},
        # 1x1 rect at (1, 0): transparent pixel -> base must show through;
        # disposal 2 clears the rect afterwards
        {"left": 1, "top": 0, "width": 1, "height": 1, "disposal": 2,
         "transparent": 99, "indices": bytes([99])},
        # same rect, opaque 42 — draws over the now-black hole
        {"left": 1, "top": 0, "width": 1, "height": 1, "disposal": 2,
         "transparent": 99, "indices": bytes([42])},
        # same rect, transparent again — after frame 2's disposal the
        # hole is black and must STAY black
        {"left": 1, "top": 0, "width": 1, "height": 1, "disposal": 2,
         "transparent": 99, "indices": bytes([99])},
    ]
    blob = encode_gif_animation_frames(3, 2, specs, palette)

    def reds(fr):
        return [fr["rgb"][3 * p] for p in range(6)]

    frames = gif_frames(blob, composed=True)
    assert len(frames) == 4
    assert all(f["width"] == 3 and f["height"] == 2 for f in frames)
    assert reds(frames[0]) == [10, 11, 12, 13, 14, 15]
    assert reds(frames[1]) == [10, 11, 12, 13, 14, 15]  # passthrough
    assert reds(frames[2]) == [10, 42, 12, 13, 14, 15]  # opaque over hole
    assert reds(frames[3]) == [10, 0, 12, 13, 14, 15]   # hole stays black

    # the non-composed path still returns stored rasters untouched
    stored = gif_frames(blob)
    assert [f["width"] for f in stored] == [3, 1, 1, 1]
    assert stored[1]["indices"] == bytes([99])


def test_gif_composed_disposal3_restores_previous_canvas():
    """Restore-to-previous: a disposal-3 frame's pixels are visible in
    ITS OWN emitted canvas only — the next frame composites onto the
    pre-frame state, even when that state itself came from disposal-2
    holes."""
    from wms_data_pipeline_spark.operators.multimodal import (
        encode_gif_animation_frames,
        gif_frames,
    )

    palette = bytes(b for i in range(256) for b in (i, (2 * i) % 256, (3 * i) % 256))
    specs = [
        {"indices": bytes(range(10, 13)), "disposal": 1},  # base 10,11,12
        # disposal-2 hole at (1,0): emits 50 there, then clears to black
        {"left": 1, "top": 0, "width": 1, "height": 1, "disposal": 2,
         "indices": bytes([50])},
        # disposal-3 frame draws 99 over the BLACK hole — must vanish after
        {"left": 1, "top": 0, "width": 1, "height": 1, "disposal": 3,
         "indices": bytes([99])},
        # transparent frame: shows whatever the canvas holds — the
        # restored BLACK, not 99
        {"left": 1, "top": 0, "width": 1, "height": 1, "disposal": 1,
         "transparent": 7, "indices": bytes([7])},
    ]
    blob = encode_gif_animation_frames(3, 1, specs, palette)
    frames = gif_frames(blob, composed=True)
    reds = [[f["rgb"][3 * p] for p in range(3)] for f in frames]
    assert reds[0] == [10, 11, 12]
    assert reds[1] == [10, 50, 12]
    assert reds[2] == [10, 99, 12]  # disposal-3 frame itself shows 99
    assert reds[3] == [10, 0, 12]   # ...but the canvas was restored

    # reserved disposal values still raise loudly
    bad = encode_gif_animation_frames(
        2, 1, [{"indices": bytes([1, 2]), "disposal": 3}], bytes(768)
    )
    # patch the GCE packed byte to the reserved disposal 5 (offset of the
    # packed field inside the first GCE after the NETSCAPE block)
    ba = bytearray(bad)
    gce = ba.index(b"\x21\xf9\x04")
    ba[gce + 3] = 5 << 2
    with pytest.raises(ValueError, match="disposal method 5"):
        gif_frames(bytes(ba), composed=True)
    # non-composed decode of the same blob is fine (GCE not applied)
    assert len(gif_frames(bytes(ba))) == 1


def test_gif_composed_rect_outside_screen_raises():
    from wms_data_pipeline_spark.operators.multimodal import (
        encode_gif_animation_frames,
    )

    with pytest.raises(ValueError, match="exceeds"):
        encode_gif_animation_frames(
            2, 2,
            [{"left": 1, "top": 1, "width": 2, "height": 2,
              "indices": bytes(4)}],
            bytes(768),
        )


def test_gif_composed_vs_stored_means_differ(spark):
    """The point of the operator: rendered-animation statistics are NOT
    per-stored-frame statistics on partial-rect fixtures."""
    from wms_data_pipeline_spark.operators import multimodal as mm

    docs = spark.createDataFrame([(7,), (11,)], "doc_id long")
    blobs = mm.with_gif_composed_content(docs)
    composed = mm.gif_frame_features(blobs, every_n=1, composed=True)
    stored = mm.gif_frame_features(blobs, every_n=1, composed=False)
    c = {(r["doc_id"], r["frame_idx"]): r["mean_r"] for r in composed.collect()}
    s = {(r["doc_id"], r["frame_idx"]): r["mean_r"] for r in stored.collect()}
    assert set(c) == set(s)
    # frame 0 is full-screen: identical either way
    assert c[(7, 0)] == s[(7, 0)]
    # later frames are partial rects: stored stats see only the rect,
    # composed stats see the whole canvas
    assert any(c[k] != s[k] for k in c if k[1] > 0)


def test_source_overlap_already_overcut_shingle_stays_dropped(spark, tmp_path):
    """A shingle stored over the cut (srcs = NULL) contributes nothing
    when the delta touches it again — and must not crash on the NULL
    array."""
    from wms_data_pipeline_spark.operators.dedup import (
        source_overlap_index_write,
        source_overlap_probe,
    )

    corpus = _docs(
        spark,
        [(1, "s1", "hot common"), (2, "s2", "hot common"), (3, "s3", "hot")],
    )
    delta = _docs(spark, [(4, "s4", "hot")])
    p = str(tmp_path / "idx")
    source_overlap_index_write(corpus, p, shingle_n=1, max_sources=2)
    # "hot" is over-cut in the corpus (3 sources); "common" links s1-s2
    out = _matrix(source_overlap_probe(spark, delta, p))
    assert out == [("s1", "s2", 1, 1, 1, 1.0)]
