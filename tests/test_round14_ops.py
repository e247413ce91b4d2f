"""Round-14 hardening tests — the five ADVICE r13 findings:

1. (high) ``create_exclusive`` dispatches on the RESOLVED filesystem's
   scheme, not ``urlparse`` of the raw path — a schemeless root on a
   non-local defaultFS must take the Hadoop leg.
2. (medium) the commit-marker protocol's reader-visible empty-content
   window: a crashed/in-flight top marker must not fail reads of a table
   whose previous version is intact; publish recovery must claim PAST the
   dead marker.
3. (low) classifier weights with duplicated ``tok`` keys are rejected on
   BOTH scorer paths (they would otherwise silently disagree).
4. (low) ``overlap_monitor_stream`` refuses a pre-r13 flat-layout
   ``matrix_out``; ``read_overlap_matrix`` pins ``batch_id`` to LONG.
5. (low) quantile-edge quantized stores default to 256 bins and warn past
   512 (O(n_bins)-per-row probe cost).
"""

import threading
from datetime import datetime

import pytest
from pyspark.sql import functions as F

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


# ---------------------------------- 1. resolved-scheme dispatch (high)
def test_create_exclusive_dispatches_on_resolved_fs(spark, tmp_path):
    """The local fast path is taken only when the ROOT resolves to the
    local filesystem; the Hadoop leg must be a correct fallback on any
    resolved FS (exercised here on file:// — one winner, losers see
    False, content is the winner's)."""
    fs = fsio.TableFS(spark, str(tmp_path))
    assert fs._fs.getUri().getScheme() == "file"
    target = fsio.join(str(tmp_path), "_commits", "3")
    assert fs._create_exclusive_hadoop(target, "v=3-aaaa") is True
    assert fs._create_exclusive_hadoop(target, "v=3-bbbb") is False
    assert fs._create_exclusive_local(target, "v=3-cccc") is False
    assert fs.read_text(target) == "v=3-aaaa"


def test_create_exclusive_local_still_kernel_atomic(spark, tmp_path):
    fs = fsio.TableFS(spark, str(tmp_path))
    target = fsio.join(str(tmp_path), "_commits", "9")
    results = []
    barrier = threading.Barrier(6)

    def claim(i):
        barrier.wait()
        results.append(fs.create_exclusive(target, f"w{i}"))

    threads = [threading.Thread(target=claim, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert sum(results) == 1


# ---------------------------------- 2. marker empty-content window (medium)
def test_reader_survives_crashed_top_marker(spark, tmp_path):
    """A content-less marker (publish crashed between exclusive create and
    content write) must not fail reads: current_version falls back to the
    previous committed version, versions() drops the crashed one, and an
    EXPLICIT read of the crashed version raises."""
    root = str(tmp_path / "t")
    t = ParquetTable(spark, root, concurrent_writers=True, keep_versions=5)
    t.upsert_latest(_rec(spark, [("a", T1, "one", "h1")]))
    t.upsert_latest(_rec(spark, [("a", T2, "two", "h2")]))
    # simulate the crash: marker 3 exists but is empty
    (tmp_path / "t" / "_commits" / "3").write_text("")
    t2 = ParquetTable(spark, root, concurrent_writers=True, keep_versions=5)
    assert t2.current_version() == 2
    assert t2.versions() == [1, 2]
    assert [r["payload"] for r in t2.read().collect()] == ["two"]
    # the crashed claim never committed, so explicitly asking for it says so
    with pytest.raises(ValueError, match="not committed"):
        t2.read(version=3)


def test_mid_history_corrupt_marker_still_loud(spark, tmp_path):
    """current_version serves the valid TOP marker; only an explicit read
    of the damaged mid-history version raises CorruptTablePointerError."""
    root = str(tmp_path / "t")
    t = ParquetTable(spark, root, concurrent_writers=True, keep_versions=5)
    t.upsert_latest(_rec(spark, [("a", T1, "one", "h1")]))
    t.upsert_latest(_rec(spark, [("a", T2, "two", "h2")]))
    t.upsert_latest(_rec(spark, [("a", T3, "three", "h3")]))
    (tmp_path / "t" / "_commits" / "2").write_text("garbage")
    t2 = ParquetTable(spark, root, concurrent_writers=True, keep_versions=5)
    assert t2.current_version() == 3
    assert [r["payload"] for r in t2.read().collect()] == ["three"]
    with pytest.raises(CorruptTablePointerError):
        t2.read(version=2)


def test_publish_claims_past_crashed_marker(spark, tmp_path):
    """Recovery: the next publish must not collide forever with a dead
    claim — it claims strictly above every existing marker number."""
    root = str(tmp_path / "t")
    t = ParquetTable(spark, root, concurrent_writers=True, keep_versions=5)
    t.upsert_latest(_rec(spark, [("a", T1, "one", "h1")]))
    (tmp_path / "t" / "_commits" / "2").write_text("")
    v = t.upsert_latest(_rec(spark, [("a", T2, "two", "h2")]))
    t3 = ParquetTable(spark, root, concurrent_writers=True, keep_versions=5)
    assert t3.current_version() == 3
    assert [r["payload"] for r in t3.read().collect()] == ["two"]


def test_marker_read_retries_transient_empty(spark, tmp_path, monkeypatch):
    """A reader racing a HEALTHY publish sees the empty marker only
    transiently: the retry loop must pick up the content once the writer
    finishes, without raising and without falling back a version."""
    root = str(tmp_path / "t")
    t = ParquetTable(spark, root, concurrent_writers=True, keep_versions=5)
    t.upsert_latest(_rec(spark, [("a", T1, "one", "h1")]))
    marker = tmp_path / "t" / "_commits" / "2"
    marker.parent.mkdir(exist_ok=True)
    marker.write_text("")
    # the "writer" completes its content write during the reader's retries
    reads = {"n": 0}
    real_read = fsio.TableFS.read_text

    def racing_read(self, path):
        got = real_read(self, path)
        if path.endswith("_commits/2") and got == "":
            reads["n"] += 1
            if reads["n"] >= 2:
                marker.write_text("v=2-feed")
        return got

    monkeypatch.setattr(fsio.TableFS, "read_text", racing_read)
    # give version 2 a data dir so the resolved read works
    _rec(spark, [("a", T2, "two", "h2")]).write.parquet(
        str(tmp_path / "t" / "v=2-feed")
    )
    t2 = ParquetTable(spark, root, concurrent_writers=True, keep_versions=5)
    assert t2.current_version() == 2
    assert reads["n"] >= 2


# ---------------------------------- 3. duplicated classifier vocab (low)
def test_classifier_rejects_duplicate_toks_both_paths(spark):
    from wms_data_pipeline_spark.operators.text import classifier_score

    docs = spark.createDataFrame(
        [(1, "aa bb"), (2, "bb cc")], "doc_id long, text string"
    )
    dup = spark.createDataFrame(
        [("aa", 100), ("bb", 50), ("bb", -50)], "tok string, w long"
    )
    with pytest.raises(ValueError, match="duplicated tok"):
        classifier_score(
            docs, weights=dup, id_col="doc_id", strategy="join"
        ).collect()
    with pytest.raises(ValueError, match="duplicated tok"):
        classifier_score(docs, weights=dup, strategy="closure").collect()
    # unique vocab still agrees bit-identically across strategies
    uniq = spark.createDataFrame(
        [("aa", 100), ("bb", 50), ("cc", -70)], "tok string, w long"
    )
    a = classifier_score(docs, weights=uniq, strategy="closure")
    b = classifier_score(docs, weights=uniq, id_col="doc_id", strategy="join")
    cols = ["doc_id", "n_tokens", "wsum", "quality_score", "keep"]
    assert sorted(map(tuple, a.select(cols).collect())) == sorted(
        map(tuple, b.select(cols).collect())
    )


# ---------------------------------- 4. matrix_out layout guard (low)
def test_overlap_monitor_refuses_flat_layout(spark, tmp_path):
    from wms_data_pipeline_spark.operators.dedup import (
        source_overlap_index_write,
    )
    from wms_data_pipeline_spark.streaming.pipeline import (
        overlap_monitor_stream,
    )

    corpus = spark.createDataFrame(
        [("s1", "alpha beta gamma delta epsilon zeta"),
         ("s2", "alpha beta gamma delta epsilon eta")],
        "source string, text string",
    )
    idx = str(tmp_path / "idx")
    source_overlap_index_write(corpus, idx)
    # pre-r13 layout: flat snapshot files at the root
    mdir = tmp_path / "matrix"
    corpus.withColumn("batch_id", F.lit(0)).write.parquet(str(mdir))
    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
        .withColumn("source", F.lit("s3"))
        .withColumn("text", F.lit("alpha beta gamma"))
    )
    with pytest.raises(ValueError, match="flat snapshot"):
        overlap_monitor_stream(
            stream, idx, str(mdir), str(tmp_path / "ckpt")
        )


def test_read_overlap_matrix_pins_batch_id_long(spark, tmp_path):
    from wms_data_pipeline_spark.streaming.pipeline import read_overlap_matrix

    out = tmp_path / "m"
    df = spark.createDataFrame([("s1", 0.5)], "source string, c double")
    df.withColumn("batch_id", F.lit(0)).write.partitionBy("batch_id").parquet(
        str(out)
    )
    got = read_overlap_matrix(spark, str(out))
    assert dict(got.dtypes)["batch_id"] == "bigint"
    assert got.count() == 1


# ---------------------------------- hadamard basis + persisted PCA model
def test_hadamard_model_orthonormal_and_exact_entries():
    import numpy as np

    from wms_data_pipeline_spark.operators import similarity as sim

    m = sim.hadamard_model(64)
    r = np.asarray(m["rotation"])
    assert np.array_equal(r @ r.T, np.eye(64))  # exact, not allclose:
    # entries are +-0.125 (a power of two), so products and the +-1 sums
    # are all exact in float64
    assert set(np.unique(np.abs(r))) == {0.125}
    with pytest.raises(ValueError, match="power of two"):
        sim.hadamard_model(48)


def test_hadamard_rotation_preserves_cosine_topk(spark):
    """Orthogonal invariance on THE kernel: full-dim top-k on
    hadamard-rotated vectors == unrotated top-k (ties the new
    hash-paired query's re-rank back to cosine_topk semantics)."""
    import random

    from wms_data_pipeline_spark.operators import similarity as sim

    rng = random.Random(5)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(60)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    base = sim.cosine_topk(emb, q, k=5)
    model = sim.hadamard_model(16)
    rot_emb = sim.pca_rotate(emb, model)
    rot_q = sim.pca_rotate(q, model)
    rotated = sim.cosine_topk(rot_emb, rot_q, k=5)
    key = lambda df: sorted(
        (r["query_id"], r["vec_id"]) for r in df.collect()
    )
    assert key(base) == key(rotated)


def test_pca_model_roundtrip_bit_identical(spark, tmp_path):
    """VERDICT r13 #4: write -> read -> bit-identical rotation, and the
    frozen model rotates a (drifted) probe batch exactly as the live
    dict does."""
    import numpy as np

    from wms_data_pipeline_spark.operators import similarity as sim

    import random

    rng = random.Random(11)
    rows = [
        (i, [rng.gauss(0, s + 1) for s in range(8)]) for i in range(50)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    model = sim.pca_fit(emb)
    path = str(tmp_path / "pca_model")
    sim.pca_model_write(spark, model, path)
    loaded = sim.pca_model_read(spark, path)
    assert np.array_equal(
        np.asarray(loaded["rotation"]), np.asarray(model["rotation"])
    )
    assert np.array_equal(np.asarray(loaded["mean"]), np.asarray(model["mean"]))
    assert loaded["center"] == model["center"]
    assert loaded["n"] == model["n"]
    # drifted probe batch rotated under the FROZEN geometry == live model
    drifted = spark.createDataFrame(
        [(i, [rng.gauss(3, 1) for _ in range(8)]) for i in range(20)],
        "vec_id long, embedding array<float>",
    )
    a = sim.pca_rotate(drifted, model).collect()
    b = sim.pca_rotate(drifted, loaded).collect()
    assert [r["embedding"] for r in a] == [r["embedding"] for r in b]


def test_pca_model_read_rejects_multirow(spark, tmp_path):
    from wms_data_pipeline_spark.operators import similarity as sim

    p = str(tmp_path / "bad")
    spark.createDataFrame([(1,), (2,)], "x long").write.parquet(p)
    with pytest.raises(Exception):
        sim.pca_model_read(spark, p)


# ---------------------------------- 5. equi-depth bin-count default (low)
def test_quantile_store_defaults_256_and_warns_past_512(spark, tmp_path):
    import warnings

    from wms_data_pipeline_spark.operators import quality as q

    ref = spark.createDataFrame(
        [("g", float(i)) for i in range(400)], "g string, v double"
    )
    p = str(tmp_path / "eq")
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        q.ks_reference_write_quantized(ref, "g", "v", p, edges="quantile")
    store = spark.read.parquet(p)
    assert store.agg(F.max("_nb")).collect()[0][0] == 256
    with pytest.warns(UserWarning, match="O\\(n_bins\\)"):
        q.ks_reference_write_quantized(
            ref, "g", "v", str(tmp_path / "eq2"), n_bins=1024, edges="quantile"
        )
    # the width grid's default stays 1024 (bit-compat with every store
    # written before this round)
    q.ks_reference_write_quantized(ref, "g", "v", str(tmp_path / "w"))
    wstore = spark.read.parquet(str(tmp_path / "w"))
    assert wstore.agg(F.max("_nb")).collect()[0][0] == 1024


# ---------------------------------- s3a conditional-create gate (r13 #5)
def test_s3_family_refused_without_conditional_create(spark, tmp_path):
    """An s3-family resolved filesystem with no conditional-create signal
    must REFUSE create_exclusive loudly (check-then-put would let two
    publishers claim the same marker)."""
    fs = fsio.TableFS(spark, str(tmp_path))
    fs._scheme = "s3a"  # emulate the resolved store (local FS underneath)
    fs._cond_create = None
    with pytest.raises(IOError, match="SINGLE-WRITER-ONLY"):
        fs.create_exclusive(fsio.join(str(tmp_path), "_commits", "1"), "v=1-x")


def test_s3_conditional_create_conf_assertion(spark, tmp_path):
    """With the operator's conf assertion the Hadoop create-exclusive leg
    runs: first claim wins, an existing marker reads as a lost race.
    (True concurrent atomicity is the STORE's conditional-PUT contract —
    the emulating local FS cannot exhibit it; the close-time-loss tests
    below pin how the engine reads the store's verdict.)"""
    conf = spark._jsc.hadoopConfiguration()
    conf.set(fsio.S3A_CONDITIONAL_CREATE_CONF, "true")
    try:
        fs = fsio.TableFS(spark, str(tmp_path))
        fs._scheme = "s3a"
        fs._cond_create = None
        target = fsio.join(str(tmp_path), "_commits", "5")
        assert fs.create_exclusive(target, "v=5-w0") is True
        assert fs.create_exclusive(target, "v=5-w1") is False
        assert fs.read_text(target) == "v=5-w0"
        ok, how = fs._conditional_create_support(target)
        assert ok and fsio.S3A_CONDITIONAL_CREATE_CONF in how
    finally:
        conf.unset(fsio.S3A_CONDITIONAL_CREATE_CONF)


def test_s3_conditional_create_capability_probe(spark, tmp_path):
    """hasPathCapability announcing conditional-create unlocks the leg
    without any conf; an un-announcing store stays refused."""
    fs = fsio.TableFS(spark, str(tmp_path))
    fs._scheme = "s3a"

    class CapFS:
        def __init__(self, inner, caps):
            self._inner = inner
            self._caps = caps

        def hasPathCapability(self, p, cap):
            return cap in self._caps

        def __getattr__(self, name):
            return getattr(self._inner, name)

    real = fs._fs
    fs._fs = CapFS(real, set(fsio.CONDITIONAL_CREATE_CAPS))
    fs._cond_create = None
    ok, how = fs._conditional_create_support(str(tmp_path))
    assert ok and "path capability" in how
    assert fs.create_exclusive(
        fsio.join(str(tmp_path), "_commits", "8"), "v=8-a"
    ) is True
    fs._fs = CapFS(real, set())
    fs._cond_create = None
    ok, how = fs._conditional_create_support(str(tmp_path))
    assert not ok and "no conditional-create" in how


def test_close_time_race_loss_returns_false(spark, tmp_path):
    """Object stores upload at close(): a conditional-PUT loss surfacing
    at close on an already-existing path reads as losing the race, not as
    an I/O error."""
    fs = fsio.TableFS(spark, str(tmp_path))

    class LoserStream:
        def write(self, b):
            pass

        def close(self):
            raise RuntimeError("RemoteFileChangedException: precondition failed")

    class LoserFS:
        def create(self, p, overwrite):
            return LoserStream()

        def exists(self, p):
            return True  # the winner's object is there

    fs._fs = LoserFS()
    assert fs._create_exclusive_hadoop(str(tmp_path / "m"), "v=1-x") is False


def test_close_time_real_failure_still_raises(spark, tmp_path):
    fs = fsio.TableFS(spark, str(tmp_path))

    class BadStream:
        def write(self, b):
            pass

        def close(self):
            raise RuntimeError("socket reset")

    class BadFS:
        def create(self, p, overwrite):
            return BadStream()

        def exists(self, p):
            return False  # nothing landed: a genuine failure

    fs._fs = BadFS()
    with pytest.raises(RuntimeError, match="socket reset"):
        fs._create_exclusive_hadoop(str(tmp_path / "m"), "v=1-x")
