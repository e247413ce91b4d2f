"""Round-13 hardening tests: the concurrent-writer commit-marker protocol
(VERDICT r12 #7), the preserved-.old pointer-flip fallback (ADVICE r12),
the quantized-store empty-reference guard (ADVICE r12), and graph_rounds
disambiguation (ADVICE r12 — pinned in test_round11_ops)."""

import threading
from datetime import datetime

import pytest

from wms_data_pipeline_spark import fsio
from wms_data_pipeline_spark.operators.merge import (
    ConcurrentPublishError,
    CorruptTablePointerError,
    ParquetTable,
)


def _rec(spark, rows):
    return spark.createDataFrame(
        rows,
        "id string, updated_at timestamp, payload string, payload_hash string",
    )


T1 = datetime(2026, 1, 1, 10)
T2 = datetime(2026, 1, 1, 11)
T3 = datetime(2026, 1, 1, 12)


# ------------------------------------------ create_exclusive primitive
def test_create_exclusive_local_one_winner(spark, tmp_path):
    fs = fsio.TableFS(spark, str(tmp_path))
    target = fsio.join(str(tmp_path), "_commits", "1")
    results = []
    barrier = threading.Barrier(8)

    def claim(i):
        barrier.wait()
        results.append((i, fs.create_exclusive(target, f"writer-{i}")))

    threads = [threading.Thread(target=claim, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    winners = [i for i, won in results if won]
    assert len(winners) == 1
    # the surviving content is the winner's, not a torn interleaving
    assert fs.read_text(target) == f"writer-{winners[0]}"


def test_create_exclusive_file_uri(spark, tmp_path):
    fs = fsio.TableFS(spark, f"file://{tmp_path}")
    target = f"file://{tmp_path}/_commits/7"
    assert fs.create_exclusive(target, "v=7-aaaa") is True
    assert fs.create_exclusive(target, "v=7-bbbb") is False
    assert fs.read_text(target) == "v=7-aaaa"


# ------------------------------------------ concurrent-writer publishes
def test_concurrent_publish_one_wins_no_corruption(spark, tmp_path):
    root = str(tmp_path / "cc")
    # both writers see the same base version, race the same target version
    t_a = ParquetTable(spark, root, concurrent_writers=True)
    t_b = ParquetTable(spark, root, concurrent_writers=True)
    t_a.upsert_latest(_rec(spark, [("a", T1, "base", "h0")]))

    outcomes = {}
    barrier = threading.Barrier(2)

    def publish(name, table, payload):
        batch = _rec(spark, [("a", T3, payload, f"h-{name}")])
        barrier.wait()
        try:
            table.upsert_latest(batch)
            outcomes[name] = "won"
        except ConcurrentPublishError:
            outcomes[name] = "lost"

    threads = [
        threading.Thread(target=publish, args=("A", t_a, "from-A")),
        threading.Thread(target=publish, args=("B", t_b, "from-B")),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert sorted(outcomes.values()) == ["lost", "won"]
    winner = next(k for k, v in outcomes.items() if v == "won")
    # exactly one committed version 2, its content is the winner's, intact
    rows = t_a.read().collect()
    assert len(rows) == 1 and rows[0]["payload"] == f"from-{winner}"
    assert t_a.current_version() == 2


def test_concurrent_loser_leaves_no_state(spark, tmp_path):
    root = str(tmp_path / "cc2")
    t = ParquetTable(spark, root, concurrent_writers=True)
    t.upsert_latest(_rec(spark, [("a", T1, "v1", "h1")]))
    # steal version 2 inside the read→claim window (the race the barrier
    # test wins/loses nondeterministically, forced here): the publish must
    # lose its claim, clean up its unique dir, and expose nothing
    fs = fsio.TableFS(spark, root)
    _rec(spark, [("z", T1, "stolen", "hz")]).write.parquet(
        fsio.join(root, "v=2-stolen")
    )
    fs.create_exclusive(fsio.join(root, "_commits", "2"), "v=2-stolen")
    with pytest.raises(ConcurrentPublishError):
        t._publish_concurrent(_rec(spark, [("a", T2, "loser", "h2")]), 2)
    leftover = [
        n
        for n in fs.list_names(root)
        if n.startswith("v=2-") and n != "v=2-stolen"
    ]
    assert leftover == []  # loser's dir cleaned up
    # the winner's committed content is what readers see
    got = {r["id"]: r["payload"] for r in t.read().collect()}
    assert got["z"] == "stolen"


def test_concurrent_retry_after_loss_succeeds(spark, tmp_path):
    root = str(tmp_path / "cc3")
    t = ParquetTable(spark, root, concurrent_writers=True)
    t.upsert_latest(_rec(spark, [("a", T1, "v1", "h1")]))
    other = ParquetTable(spark, root, concurrent_writers=True)
    other.upsert_latest(_rec(spark, [("b", T1, "other", "h2")]))
    # ConcurrentPublishError contract: re-read and retry lands on top
    t.upsert_latest(_rec(spark, [("a", T2, "mine", "h3")]))
    got = {r["id"]: r["payload"] for r in t.read().collect()}
    assert got == {"a": "mine", "b": "other"}
    assert t.current_version() == 3


def test_concurrent_time_travel_and_retention(spark, tmp_path):
    root = str(tmp_path / "cc4")
    t = ParquetTable(spark, root, concurrent_writers=True, keep_versions=2)
    for i, p in enumerate(["p1", "p2", "p3"], start=1):
        t.upsert_latest(_rec(spark, [("a", datetime(2026, 1, i), p, f"h{i}")]))
    assert t.versions() == [2, 3]
    assert t.read(version=2).collect()[0]["payload"] == "p2"
    with pytest.raises(ValueError, match="pruned"):
        t.read(version=1)
    # markers below the retention cutoff are swept with their dirs
    fs = fsio.TableFS(spark, root)
    assert sorted(fs.list_names(fsio.join(root, "_commits"))) == ["2", "3"]


def test_legacy_table_upgrades_and_mixing_refused(spark, tmp_path):
    root = str(tmp_path / "up")
    legacy = ParquetTable(spark, root, keep_versions=5)
    legacy.upsert_latest(_rec(spark, [("a", T1, "old", "h1")]))
    # same root opened concurrent: reads see the legacy version, the next
    # publish commits via marker ON TOP of it
    cc = ParquetTable(spark, root, concurrent_writers=True, keep_versions=5)
    assert cc.current_version() == 1
    cc.upsert_latest(_rec(spark, [("a", T2, "new", "h2")]))
    assert cc.current_version() == 2
    assert cc.read().collect()[0]["payload"] == "new"
    # legacy snapshot still time-travel readable across the upgrade
    assert cc.read(version=1).collect()[0]["payload"] == "old"
    # a single-writer publish on the upgraded table would be invisible to
    # marker-aware readers — refused loudly
    with pytest.raises(ValueError, match="concurrent_writers=True"):
        legacy.upsert_latest(_rec(spark, [("a", T3, "split", "h3")]))


def test_empty_marker_serves_previous_version(spark, tmp_path):
    """r14 revision of this pin (ADVICE r13 medium): an empty top marker —
    a publish crashed (or still in flight past the retry budget) between
    the exclusive create and the content write — must NOT fail reads of a
    table whose previous version is intact; current_version falls back.
    The loud CorruptTablePointerError remains for EXPLICIT reads of the
    damaged version (test_round14_ops pins both sides)."""
    root = str(tmp_path / "cm")
    t = ParquetTable(spark, root, concurrent_writers=True)
    t.upsert_latest(_rec(spark, [("a", T1, "v1", "h1")]))
    # simulate a crash between the exclusive create and the content write
    (tmp_path / "cm" / "_commits" / "2").write_text("")
    assert t.current_version() == 1
    assert t.read().collect()[0]["payload"] == "v1"


# ------------------------------------------ .old pointer-flip fallback
def test_read_text_committed_falls_back_to_old(spark, tmp_path):
    fs = fsio.TableFS(spark, str(tmp_path))
    ptr = str(tmp_path / "_VERSION")
    (tmp_path / "_VERSION.old").write_text("3")
    # pointer missing mid-flip: the preserved previous pointer is served
    assert fs.read_text_committed(ptr) == "3"
    # a committed pointer always wins over the backup
    (tmp_path / "_VERSION").write_text("4")
    assert fs.read_text_committed(ptr) == "4"


def test_parquet_table_survives_crashed_flip_window(spark, tmp_path):
    """The ADVICE r12 scenario end-to-end: pointer deleted mid-flip but
    .old preserved — the table serves the previous committed version
    instead of raising, and the next publish self-heals."""
    root = tmp_path / "flip"
    t = ParquetTable(spark, str(root), keep_versions=2)
    t.upsert_latest(_rec(spark, [("a", T1, "v1", "h1")]))
    t.upsert_latest(_rec(spark, [("a", T2, "v2", "h2")]))
    # simulate the crash: flip to v3 got as far as preserving the old
    # pointer and deleting the live one (v=3 dir written, never committed)
    _rec(spark, [("a", T3, "uncommitted", "h3")]).write.parquet(
        str(root / "v=3")
    )
    (root / "_VERSION").rename(root / "_VERSION.old")
    assert t.current_version() == 2
    assert t.read().collect()[0]["payload"] == "v2"
    # the retried publish reclaims the garbage v=3 dir and commits
    t.upsert_latest(_rec(spark, [("a", T3, "v3", "h3")]))
    assert t.current_version() == 3
    assert t.read().collect()[0]["payload"] == "v3"


# ------------------------------------------ quantized-store empty guard
def test_quantized_probe_empty_store_raises_clearly(spark, tmp_path):
    from wms_data_pipeline_spark.operators import quality as q

    ref = spark.createDataFrame(
        [("a", None), ("b", None)], "g string, v double"
    )
    path = str(tmp_path / "ksq")
    q.ks_reference_write_quantized(ref, "g", "v", path)
    cur = spark.createDataFrame([("a", 1.0)], "g string, v double")
    for probe in (q.ks_drift_probe_quantized, q.w1_drift_probe_quantized):
        with pytest.raises(ValueError, match="empty"):
            probe(cur, "g", "v", path)


# ------------------------------------------ equi-depth quantized grids
def test_exact_quantile_edges_hand_computed(spark):
    from wms_data_pipeline_spark.operators import quality as q

    df = spark.createDataFrame(
        [("a", float(v)) for v in [0, 10, 20, 30]]
        + [("b", float(v)) for v in range(1, 11)],
        "g string, v double",
    )
    got = {r["_g"]: r["_e"] for r in q.exact_quantile_edges(df, "g", "v", 4).collect()}
    # group a: N=4, n=4 -> edges at ranks 1,2,3 = values 0,10,20
    assert got["a"] == [0.0, 10.0, 20.0]
    # group b: N=10, n=4 -> ranks ceil(10/4)=3, ceil(20/4)=5, ceil(30/4)=8
    assert got["b"] == [3.0, 5.0, 8.0]
    # fewer rows than bins: edges repeat (N=4, n=8 -> ranks 1,1,2,2,3,3,4)
    a8 = {
        r["_g"]: r["_e"]
        for r in q.exact_quantile_edges(
            df.filter("g = 'a'"), "g", "v", 8
        ).collect()
    }
    assert a8["a"] == [0.0, 0.0, 10.0, 10.0, 20.0, 20.0, 30.0]


def test_equidepth_ks_bitwise_exact_when_injective(spark, tmp_path):
    """With one distinct bin per distinct value (injective quantizer) the
    equi-depth probe must equal the exact two-sample KS bit-for-bit."""
    from wms_data_pipeline_spark.operators import quality as q

    rows = [("a", float(v), False) for v in [0, 10, 20, 30] * 5] + [
        ("a", float(v), True) for v in [10, 30] * 3
    ]
    df = spark.createDataFrame(rows, "g string, v double, cur boolean")
    path = str(tmp_path / "eq")
    # n_bins = 8 > 4 distinct values -> injective on group a's support
    q.ks_reference_write_quantized(
        df.filter("NOT cur"), "g", "v", path, n_bins=8, edges="quantile_exact"
    )
    probe = q.ks_drift_probe_quantized(
        df.filter("cur"), "g", "v", path
    ).collect()
    exact = q.ks_drift(df, "g", "v", "cur").collect()
    assert probe == exact


def test_equidepth_w1_hand_computed(spark, tmp_path):
    from wms_data_pipeline_spark.operators import quality as q

    df = spark.createDataFrame(
        [("a", float(v), False) for v in [0, 10, 20, 30]]
        + [("a", float(v), True) for v in [10, 30]],
        "g string, v double, cur boolean",
    )
    path = str(tmp_path / "w1eq")
    q.ks_reference_write_quantized(
        df.filter("NOT cur"), "g", "v", path, n_bins=4, edges="quantile_exact"
    )
    row = q.w1_drift_probe_quantized(df.filter("cur"), "g", "v", path).collect()[0]
    # edges [0,10,20]; ref bins {1:1, 2:1, 3:2}; cur bins {2:1, 3:1};
    # only the [0,10) segment gaps (1/4 vs 0) -> W1 = 0.25 * 10 = 2.5
    assert row["n_ref"] == 4 and row["n_cur"] == 2
    assert row["w1"] == pytest.approx(2.5)


def test_equidepth_daily_bitwise_matches_probe_per_window(spark, tmp_path):
    from wms_data_pipeline_spark.operators import quality as q
    from pyspark.sql import functions as F

    rows = []
    for day in (1, 2, 3):
        for i in range(40):
            rows.append(("a", float((i * 7 + day * 3) % 50), day, True))
            rows.append(("b", float((i * 11 + day) % 90), day, True))
    ref = [("a", float(v % 50), 0, False) for v in range(120)] + [
        ("b", float(v % 90), 0, False) for v in range(120)
    ]
    df = spark.createDataFrame(
        rows + ref, "g string, v double, day int, cur boolean"
    )
    path = str(tmp_path / "dq")
    q.ks_reference_write_quantized(
        df.filter("NOT cur"), "g", "v", path, n_bins=16, edges="quantile_exact"
    )
    cur = df.filter("cur")
    daily_ks = q.ks_drift_windows_quantized(cur, "g", "v", "day", path)
    daily_w1 = q.w1_drift_windows_quantized(cur, "g", "v", "day", path)
    for day in (1, 2, 3):
        batch = cur.filter(F.col("day") == day)
        pk = sorted(
            map(tuple, q.ks_drift_probe_quantized(batch, "g", "v", path).collect())
        )
        dk = sorted(
            tuple(r[k] for k in ("g", "n_ref", "n_cur", "ks_x1e6"))
            for r in daily_ks.filter(F.col("day") == day).collect()
        )
        assert pk == dk, f"ks day {day}"
        pw = sorted(
            map(tuple, q.w1_drift_probe_quantized(batch, "g", "v", path).collect())
        )
        dw = sorted(
            tuple(r[k] for k in ("g", "n_ref", "n_cur", "w1"))
            for r in daily_w1.filter(F.col("day") == day).collect()
        )
        assert pw == dw, f"w1 day {day}"


def test_quantile_approx_store_probes_and_bounds(spark, tmp_path):
    """percentile_approx edges (the 100 TB path): probes run, groups match,
    and the equi-depth KS is within max-bin-mass of the exact KS."""
    from wms_data_pipeline_spark.operators import quality as q

    import math

    # heavy-tailed metric: v = exp-ish spread, most mass tiny
    rows = [("a", float(math.exp(i / 40.0)), False) for i in range(400)] + [
        ("a", float(math.exp(i / 40.0) * 1.15), True) for i in range(150)
    ]
    df = spark.createDataFrame(rows, "g string, v double, cur boolean")
    path = str(tmp_path / "qa")
    q.ks_reference_write_quantized(
        df.filter("NOT cur"), "g", "v", path, n_bins=64, edges="quantile"
    )
    got = q.ks_drift_probe_quantized(df.filter("cur"), "g", "v", path).collect()
    exact = q.ks_drift(df, "g", "v", "cur").collect()[0]
    assert len(got) == 1 and got[0]["n_ref"] == 400 and got[0]["n_cur"] == 150
    # one-sided epsilon: KS_q <= KS_exact, understating by <= max bin mass
    # (~1/64 of either population on these smooth values)
    assert got[0]["ks_x1e6"] <= exact["ks_x1e6"]
    assert exact["ks_x1e6"] - got[0]["ks_x1e6"] <= 2 * 1_000_000 // 64
    assert q.w1_drift_probe_quantized(
        df.filter("cur"), "g", "v", path
    ).collect()[0]["w1"] > 0


# ------------------------------------------ classifier join scorer
def test_classifier_join_matches_closure_bitwise(spark):
    """The explode+join scorer must reproduce the closure scorer
    bit-for-bit on every input class (VERDICT r12 #3)."""
    from pyspark.sql import functions as F

    from wms_data_pipeline_spark.operators import text as txt

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox the"),
            (2, ""),
            (3, None),
            (4, "   "),
            (5, "all unseen tokens here"),
            (6, "x " * 200),
        ],
        "doc_id bigint, text string",
    )
    vocab = spark.createDataFrame(
        [("the", 100), ("quick", -40), ("fox", 7), ("x", 3)],
        "tok string, w long",
    )
    closure = (
        txt.classifier_score(docs, weights=vocab, strategy="closure")
        .orderBy("doc_id")
        .collect()
    )
    joined = (
        txt.classifier_score(
            docs, weights=vocab, id_col="doc_id", strategy="join"
        )
        .orderBy("doc_id")
        .collect()
    )
    assert joined == closure
    # and both agree with hand arithmetic on the plain case
    assert closure[0]["wsum"] == 2 * 100 - 40 + 7 + 0  # 'brown' unseen
    assert closure[2]["wsum"] is None  # NULL text stays NULL
    assert closure[1]["wsum"] == 0 and closure[3]["wsum"] == 0


def test_classifier_auto_dispatches_above_cap(spark, monkeypatch):
    from wms_data_pipeline_spark.operators import text as txt

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, None)], "doc_id bigint, text string"
    )
    vocab = spark.createDataFrame(
        [("a", 1), ("b", 2), ("c", 4), ("d", 8)], "tok string, w long"
    )
    monkeypatch.setattr(txt, "MAX_CLASSIFIER_VOCAB", 3)
    # DataFrame vocab above the cap: no longer an error — the join scorer
    # takes over, provided the caller names the join-back key
    with pytest.raises(ValueError, match="id_col"):
        txt.classifier_score(docs, weights=vocab)
    got = (
        txt.classifier_score(docs, weights=vocab, id_col="doc_id")
        .orderBy("doc_id")
        .collect()
    )
    assert got[0]["wsum"] == 7 and got[1]["wsum"] is None
    # a DICT above the cap still fails loudly (it already sits in driver
    # memory; the fix is upstream) and names the DataFrame path
    with pytest.raises(ValueError, match="DataFrame"):
        txt.classifier_score(docs, weights={"a": 1, "b": 2, "c": 3, "d": 4})


def test_classifier_join_float_weights_double(spark):
    from wms_data_pipeline_spark.operators import text as txt

    docs = spark.createDataFrame([(1, "a a b")], "doc_id bigint, text string")
    vocab = spark.createDataFrame(
        [("a", 0.25), ("b", -0.5)], "tok string, w double"
    )
    out = txt.classifier_score(
        docs, weights=vocab, id_col="doc_id", strategy="join"
    )
    assert dict(out.dtypes)["wsum"] == "double"
    assert out.collect()[0]["wsum"] == pytest.approx(0.0)


# ------------------------------------------ PCA rotation for prefix-rerank
@pytest.fixture()
def aniso_vectors(spark):
    """Deterministic anisotropic cloud whose energy is NOT axis-aligned:
    3 strong latent signals + tiny noise, mixed through a Hadamard
    rotation so every raw coordinate carries an equal share — the
    'generic embedding' worst case prefix truncation measured poorly on
    (SCALE_NOTES r12), and exactly what pca_fit should undo."""
    import math

    h = [
        [1, 1, 1, 1, 1, 1, 1, 1],
        [1, -1, 1, -1, 1, -1, 1, -1],
        [1, 1, -1, -1, 1, 1, -1, -1],
        [1, -1, -1, 1, 1, -1, -1, 1],
        [1, 1, 1, 1, -1, -1, -1, -1],
        [1, -1, 1, -1, -1, 1, -1, 1],
        [1, 1, -1, -1, -1, -1, 1, 1],
        [1, -1, -1, 1, -1, 1, 1, -1],
    ]
    rows = []
    for i in range(200):
        s = [
            math.sin(i * 0.7) * 5.0,
            math.cos(i * 1.3) * 2.0,
            math.sin(i * 2.9) * 0.5,
            0.05 * math.sin(i * 3.7),
            0.05 * math.cos(i * 4.1),
            0.02 * math.sin(i * 5.3),
            0.02 * math.cos(i * 6.1),
            0.02 * math.sin(i * 7.9),
        ]
        v = [sum(h[r][c] * s[c] for c in range(8)) / 8**0.5 for r in range(8)]
        rows.append((i, v))
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


def test_pca_fit_orthonormal_and_front_loaded(spark, aniso_vectors):
    import numpy as np

    from wms_data_pipeline_spark.operators import similarity as sim

    model = sim.pca_fit(aniso_vectors)
    r = np.asarray(model["rotation"])
    assert np.allclose(r @ r.T, np.eye(r.shape[0]), atol=1e-9)
    vals = model["eigenvalues"]
    assert vals == sorted(vals, reverse=True)
    # energy is front-loaded: top-2 components carry most of it
    assert sum(model["explained"][:2]) > 0.8
    # deterministic sign: each component's largest-|entry| is positive
    for row in r:
        assert row[int(np.argmax(np.abs(row)))] > 0


def test_pca_rotate_roundtrip_and_nulls(spark, aniso_vectors):
    import numpy as np

    from pyspark.sql import functions as F

    from wms_data_pipeline_spark.operators import similarity as sim

    withnull = aniso_vectors.withColumn(
        "embedding",
        F.when(F.col("vec_id") == 7, F.lit(None)).otherwise(
            F.col("embedding")
        ),
    )
    model = sim.pca_fit(withnull)
    back = sim.pca_rotate(
        sim.pca_rotate(withnull, model), model, inverse=True
    ).orderBy("vec_id").collect()
    orig = withnull.orderBy("vec_id").collect()
    for o, b in zip(orig, back):
        if o["embedding"] is None:
            assert b["embedding"] is None
        else:
            assert np.allclose(o["embedding"], b["embedding"], atol=1e-4)


def test_pca_rotation_preserves_exact_topk(spark, aniso_vectors):
    """center=False is a pure orthogonal map: full-dim cosine top-k on the
    rotated corpus must return the same ids in the same order."""
    from pyspark.sql import functions as F

    from wms_data_pipeline_spark.operators import similarity as sim

    queries = aniso_vectors.filter("vec_id < 5").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    model = sim.pca_fit(aniso_vectors)
    rc = sim.pca_rotate(aniso_vectors, model)
    rq = sim.pca_rotate(queries, model)
    base = [
        (r["query_id"], r["vec_id"])
        for r in sim.cosine_topk(aniso_vectors, queries, k=10)
        .orderBy("query_id", "vec_id").collect()
    ]
    rot = [
        (r["query_id"], r["vec_id"])
        for r in sim.cosine_topk(rc, rq, k=10)
        .orderBy("query_id", "vec_id").collect()
    ]
    assert base == rot


def test_pca_prefix_rerank_recall_lift(spark, aniso_vectors):
    """The operator's reason to exist: on anisotropic vectors, rotating
    before prefix_rerank_topk lifts small-prefix recall."""
    from pyspark.sql import functions as F

    from wms_data_pipeline_spark.operators import similarity as sim

    queries = aniso_vectors.filter("vec_id % 20 = 0").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {
        (r["query_id"], r["vec_id"])
        for r in sim.cosine_topk(aniso_vectors, queries, k=5).collect()
    }

    def recall(corpus, qs):
        got = {
            (r["query_id"], r["vec_id"])
            for r in sim.prefix_rerank_topk(
                corpus, qs, k=5, prefix_dims=2, shortlist=15
            ).collect()
        }
        return len(got & exact) / len(exact)

    model = sim.pca_fit(aniso_vectors)
    plain = recall(aniso_vectors, queries)
    rotated = recall(
        sim.pca_rotate(aniso_vectors, model), sim.pca_rotate(queries, model)
    )
    # rotated full-dim re-rank scores equal the originals (orthogonal
    # invariance), so recall compares apples to apples
    assert rotated >= plain
    assert rotated >= 0.9


# ------------------------------------------ overlap monitor replay safety
def test_overlap_monitor_replay_replaces_snapshot(spark, tmp_path):
    """At-least-once replay must REPLACE a batch's matrix snapshot, not
    append a duplicate (ADVICE r12): matrix_out is partitioned by
    batch_id and written with dynamic partition overwrite, so replaying
    the whole source against a fresh checkpoint leaves exactly one
    snapshot per batch_id and downstream sums never double-count."""
    from pyspark.sql import functions as F

    from wms_data_pipeline_spark.operators.dedup import (
        source_overlap_index_write,
    )
    from wms_data_pipeline_spark.streaming.pipeline import (
        overlap_monitor_stream,
    )

    corpus = spark.createDataFrame(
        [(1, "s1", "alpha beta gamma"), (2, "s2", "alpha beta delta")],
        "doc_id long, source string, text string",
    )
    index = "file://" + str(tmp_path / "ovidx")
    source_overlap_index_write(corpus, index, shingle_n=1)
    src = str(tmp_path / "incoming")
    schema = "doc_id long, source string, text string"
    spark.createDataFrame(
        [(3, "s3", "beta gamma epsilon")], schema
    ).coalesce(1).write.mode("append").parquet(src)
    matrix_out = str(tmp_path / "matrix")

    def run(ckpt):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        overlap_monitor_stream(
            stream, index, matrix_out, str(tmp_path / ckpt)
        ).awaitTermination(120)

    run("ckpt1")
    first = spark.read.parquet(matrix_out)
    n_first = first.count()
    assert n_first > 0
    # fresh checkpoint = full replay of batch 0 (the at-least-once case)
    run("ckpt2")
    again = spark.read.parquet(matrix_out)
    assert again.count() == n_first  # replaced, not duplicated
    assert {r["batch_id"] for r in again.select("batch_id").distinct().collect()} == {0}


# ------------------------------------------ keep-canonical broadcast gate
def test_broadcast_drop_list_gate(monkeypatch):
    from wms_data_pipeline_spark.operators import dedup as dd

    assert dd.broadcast_drop_list_ok(1000)
    assert dd.broadcast_drop_list_ok(
        int(dd.MAX_BROADCAST_DROP_IDS / dd.EXPECTED_DUP_FRACTION)
    )
    assert not dd.broadcast_drop_list_ok(
        int(dd.MAX_BROADCAST_DROP_IDS / dd.EXPECTED_DUP_FRACTION) + 1
    )


def test_keep_canonical_unhinted_same_answer(spark, monkeypatch):
    """Above the gate the hint drops; the answer must not change."""
    from wms_data_pipeline_spark.operators import dedup as dd
    from wms_data_pipeline_spark.plans.queries import REGISTRY

    fn = REGISTRY["dd_dedup_keep_canonical"].fn
    base = sorted(map(tuple, fn(spark, "/root/testdata/sf0.001").collect()))
    monkeypatch.setattr(dd, "MAX_BROADCAST_DROP_IDS", 0)
    gated = sorted(map(tuple, fn(spark, "/root/testdata/sf0.001").collect()))
    assert gated == base


# ------------------------------------------ decile PSI
def test_psi_decile_store_equidepth_and_probe(spark, tmp_path):
    from pyspark.sql import functions as F

    from wms_data_pipeline_spark.operators import quality as q

    rows = [("a", float(i), False) for i in range(200)] + [
        ("a", float(i * 2), True) for i in range(60)
    ]
    df = spark.createDataFrame(rows, "g string, v double, cur boolean")
    path = str(tmp_path / "psidec")
    q.psi_reference_write(
        df.filter("NOT cur"), "g", "v", path,
        n_buckets=10, edges="quantile_exact",
    )
    store = spark.read.parquet(path)
    # equi-depth property: every decile bin holds exactly N/10 reference
    # rows on this tie-free metric, and the grid is COMPLETE
    counts = {r["_b"]: r["_ref"] for r in store.collect()}
    assert sorted(counts) == list(range(10))
    # equi-depth within the >=-edge convention's off-by-one: each edge
    # value itself belongs to the bin ABOVE it, so bins hold N/10 ± 1
    assert sum(counts.values()) == 200
    assert all(19 <= c <= 21 for c in counts.values())
    probe = q.psi_drift_probe(df.filter("cur"), "g", "v", path).collect()[0]
    assert probe["n_ref"] == 200 and probe["n_cur"] == 60
    assert probe["psi"] > 0.1  # the doubled scale IS a shift
    # identical population drifts ~nothing
    same = q.psi_drift_probe(
        df.filter("NOT cur"), "g", "v", path
    ).collect()[0]
    assert abs(same["psi"]) < 0.01


def test_psi_decile_windows_bitwise_matches_probe(spark, tmp_path):
    from pyspark.sql import functions as F

    from wms_data_pipeline_spark.operators import quality as q

    rows = [("a", float((i * 13) % 97), 0, False) for i in range(300)] + [
        ("a", float((i * 7 + d) % 97), d, True)
        for d in (1, 2)
        for i in range(50)
    ]
    df = spark.createDataFrame(rows, "g string, v double, day int, cur boolean")
    path = str(tmp_path / "psidecw")
    q.psi_reference_write(
        df.filter("NOT cur"), "g", "v", path,
        n_buckets=10, edges="quantile_exact",
    )
    cur = df.filter("cur")
    daily = q.psi_drift_windows(cur, "g", "v", "day", path)
    for d in (1, 2):
        pw = sorted(
            map(tuple, q.psi_drift_probe(
                cur.filter(F.col("day") == d), "g", "v", path
            ).collect())
        )
        dw = sorted(
            tuple(r[k] for k in ("g", "n_ref", "n_cur", "psi"))
            for r in daily.filter(F.col("day") == d).collect()
        )
        assert pw == dw, f"day {d}"


def test_psi_width_store_unchanged(spark, tmp_path):
    """The default width grid must be byte-compatible with r12 stores:
    probe a width store written by the current writer and one written
    without the new kwargs — identical schema, identical results."""
    from wms_data_pipeline_spark.operators import quality as q

    rows = [("a", float(i % 37), False) for i in range(150)] + [
        ("a", float(i % 23), True) for i in range(50)
    ]
    df = spark.createDataFrame(rows, "g string, v double, cur boolean")
    p1 = str(tmp_path / "w1")
    q.psi_reference_write(df.filter("NOT cur"), "g", "v", p1)
    store = spark.read.parquet(p1)
    assert "_e" not in store.columns
    probe = q.psi_drift_probe(df.filter("cur"), "g", "v", p1).collect()
    batch = q.psi_drift(df, "g", "v", "cur").collect()
    # frozen geometry == attained [mn, mx] here, so probe == batch
    assert probe == batch


def test_audit_batch_works_with_decile_store(spark, tmp_path):
    """The streaming per-batch audit's PSI leg must transparently accept a
    decile (quantile-edged) reference store — the probe detects the grid
    kind from the store, so the foreachBatch wiring needs no change."""
    from wms_data_pipeline_spark.control.audit import audit_batch
    from wms_data_pipeline_spark.operators import quality as q

    ref = spark.createDataFrame(
        [("a", float(i % 50)) for i in range(300)], "g string, v double"
    )
    path = str(tmp_path / "decref")
    q.psi_reference_write(
        ref, "g", "v", path, n_buckets=10, edges="quantile_exact"
    )
    batch = spark.createDataFrame(
        [("a", float((i * 3) % 80)) for i in range(100)],
        "g string, v double",
    )
    rows = audit_batch(
        batch, batch_id=7, entity="events", drift=("g", "v", path)
    ).collect()
    psi_rows = [r for r in rows if r["kind"] == "psi_drift"]
    assert psi_rows, rows
    # the out-of-range tail ([50, 80)) clamps into the top decile — a
    # real shift the decile probe must flag with a finite positive PSI
    psi = {r["metric"]: r["value"] for r in psi_rows}
    assert psi["psi"] > 0.0


def test_prefix_rerank_rotate_param(spark, aniso_vectors):
    """rotate= applies the model to BOTH sides (the half-rotated footgun
    cannot happen) and equals hand-rotating; centered models refused."""
    from pyspark.sql import functions as F

    from wms_data_pipeline_spark.operators import similarity as sim

    queries = aniso_vectors.filter("vec_id % 40 = 0").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    model = sim.pca_fit(aniso_vectors)
    via_param = sorted(
        map(tuple, sim.prefix_rerank_topk(
            aniso_vectors, queries, k=5, prefix_dims=2, shortlist=15,
            rotate=model,
        ).collect())
    )
    by_hand = sorted(
        map(tuple, sim.prefix_rerank_topk(
            sim.pca_rotate(aniso_vectors, model),
            sim.pca_rotate(queries, model),
            k=5, prefix_dims=2, shortlist=15,
        ).collect())
    )
    assert via_param == by_hand
    centered = sim.pca_fit(aniso_vectors, center=True)
    with pytest.raises(ValueError, match="UNCENTERED"):
        sim.prefix_rerank_topk(
            aniso_vectors, queries, k=5, prefix_dims=2, shortlist=15,
            rotate=centered,
        )


def test_concurrent_writers_retry_loop_liveness(spark, tmp_path):
    """Four writers race repeatedly, each retrying on ConcurrentPublishError
    until its merge lands: every writer eventually succeeds (liveness),
    the final state holds all four keys (no lost update), and the version
    count equals the number of successful publishes (linearized)."""
    root = str(tmp_path / "mw")
    ParquetTable(spark, root, concurrent_writers=True).upsert_latest(
        _rec(spark, [("seed", T1, "base", "h0")])
    )
    errors = []
    attempts = {}
    barrier = threading.Barrier(4)

    def writer(i):
        t = ParquetTable(spark, root, concurrent_writers=True)
        batch = _rec(spark, [(f"w{i}", T2, f"payload-{i}", f"h{i}")])
        barrier.wait()
        tries = 0
        while True:
            tries += 1
            try:
                t.upsert_latest(batch)
                attempts[i] = tries
                return
            except ConcurrentPublishError:
                if tries > 20:
                    errors.append(i)
                    return

    threads = [threading.Thread(target=writer, args=(i,)) for i in range(4)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors
    t = ParquetTable(spark, root, concurrent_writers=True)
    got = {r["id"]: r["payload"] for r in t.read().collect()}
    assert got == {
        "seed": "base",
        **{f"w{i}": f"payload-{i}" for i in range(4)},
    }
    # one version per successful publish on top of the seed
    assert t.current_version() == 5


def test_pca_fit_all_null_raises(spark):
    from wms_data_pipeline_spark.operators import similarity as sim

    df = spark.createDataFrame(
        [(1, None), (2, None)], "vec_id bigint, embedding array<float>"
    )
    with pytest.raises(ValueError, match="no non-null vectors"):
        sim.pca_fit(df)
