"""Round-6 fixes and features: scalar PQ-code packing (the round-5 driver
canonicalization failure), the ivf_index_topk closure guard, the ivfpq
dim%m divisibility check, id-type derivation in the encode schemas
(ADVICE r5 items), k-means PQ codebooks, and the incremental near-dup
index."""

import pytest
from pyspark.sql import functions as F

from wms_data_pipeline_spark.operators import dedup as dd
from wms_data_pipeline_spark.operators import similarity as sim


def _corpus(spark, n=40, dim=8, id_type="long"):
    import random

    random.seed(6)
    rows = [(i, [random.uniform(-1, 1) for _ in range(dim)]) for i in range(n)]
    return spark.createDataFrame(
        rows, f"vec_id {id_type}, embedding array<float>"
    )


# ------------------------------------------------------------ pack_codes


def test_pack_codes_roundtrips_the_array(spark):
    """packed = Σ code_s << 4s must reconstruct exactly from the array
    output — same rows, and unpacking each nibble recovers every code."""
    corpus = _corpus(spark)
    enc = sim.pq_encode(corpus, m=4, k=8)
    out = enc.select(
        "vec_id",
        "codes",
        sim.pack_codes(F.col("codes"), m=4, bits=4).alias("packed"),
    ).collect()
    assert len(out) == 40
    for r in out:
        assert r.packed == sum(c << (4 * s) for s, c in enumerate(r.codes))
        assert [(r.packed >> (4 * s)) & 0xF for s in range(4)] == list(r.codes)


def test_pack_codes_overflow_guard():
    with pytest.raises(ValueError, match="overflow"):
        sim.pack_codes(F.col("codes"), m=16, bits=4)


# ----------------------------------------------------- ivf_index_topk guard


def test_ivf_index_topk_refuses_oversized_query_set(spark, tmp_path, monkeypatch):
    """The persisted-index search collects queries driver-side to resolve
    probed cells; it must enforce the same MAX_CLOSURE_QUERIES contract as
    cosine_topk/pq_adc_topk/ivfpq_topk (VERDICT r5 wrong #2)."""
    corpus = _corpus(spark, n=50)
    path = "file://" + str(tmp_path / "ivf")
    sim.ivf_index_write(corpus, path, nlist=4)
    queries = corpus.select(F.col("vec_id").alias("query_id"), "embedding")
    monkeypatch.setattr(sim, "MAX_CLOSURE_QUERIES", 10)
    with pytest.raises(ValueError, match="ivf_index_topk"):
        sim.ivf_index_topk(spark, path, queries, k=3, nprobe=2)
    # at the real cap the same call works
    monkeypatch.setattr(sim, "MAX_CLOSURE_QUERIES", 4096)
    assert sim.ivf_index_topk(spark, path, queries.limit(2), k=3, nprobe=2).count() > 0


# --------------------------------------------------------- dim % m checks


def test_ivfpq_raises_on_indivisible_subspaces(spark):
    """dim=8 with m=3 must raise instead of silently dropping the trailing
    dims from codes and LUT (ADVICE r5)."""
    corpus = _corpus(spark, n=20)
    with pytest.raises(ValueError, match="not divisible"):
        sim.ivfpq_encode(corpus, nlist=4, m=3, kcode=4)
    q = corpus.limit(1).select(F.col("vec_id").alias("query_id"), "embedding")
    with pytest.raises(ValueError, match="not divisible"):
        sim.ivfpq_topk(corpus, q, k=3, nlist=4, m=3, kcode=4)


# ------------------------------------------------- k-means PQ codebooks


def test_kmeans_codebook_lowers_reconstruction_mse(spark):
    """The per-subspace Lloyd refinement starts FROM the medoid init, so
    corpus-wide mean reconstruction MSE must come out at or below the
    medoid codebook's (VERDICT r5 #4) — and deterministically: two builds
    give bit-identical codebooks."""
    import numpy as np

    corpus = _corpus(spark, n=300, dim=16)
    b1 = sim.pq_codebook(corpus, m=4, k=8, method="kmeans")
    b2 = sim.pq_codebook(corpus, m=4, k=8, method="kmeans")
    assert np.array_equal(b1, b2)
    med = sim.pq_codebook(corpus, m=4, k=8, method="medoid")
    assert b1.shape == med.shape == (8, 16)
    assert not np.array_equal(b1, med)

    def mean_mse(cb):
        rows = sim.pq_encode(corpus, m=4, k=8, codebook=cb).agg(
            F.avg("mse")
        ).collect()
        return rows[0][0]

    mse_med, mse_km = mean_mse("medoid"), mean_mse("kmeans")
    assert mse_km <= mse_med, (mse_km, mse_med)


def test_pq_adc_kmeans_codebook_recall_not_worse(spark):
    """ADC search with the kmeans codebook must beat-or-match the medoid
    codebook's recall@10 vs exact euclidean on the same corpus (lower
    quantization error → better distance estimates)."""
    import numpy as np

    corpus = _corpus(spark, n=400, dim=16)
    q = corpus.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    rows = corpus.collect()
    X = np.array([[float(x) for x in r.embedding] for r in rows])
    ids = np.array([r.vec_id for r in rows])

    def recall(cb):
        got = {}
        for r in sim.pq_adc_topk(corpus, q, k=10, m=4, kcode=8, codebook=cb).collect():
            got.setdefault(r.query_id, set()).add(r.vec_id)
        rec = []
        for qid, found in got.items():
            d = ((X - X[ids == qid][0]) ** 2).sum(axis=1)
            exact = set(ids[np.argsort(d, kind="stable")[:10]].tolist())
            rec.append(len(found & exact) / 10)
        return sum(rec) / len(rec)

    r_med, r_km = recall("medoid"), recall("kmeans")
    assert r_km >= r_med - 0.05, (r_km, r_med)


def test_pq_codebook_rejects_unknown_method(spark):
    corpus = _corpus(spark, n=10)
    with pytest.raises(ValueError, match="unknown codebook"):
        sim.pq_codebook(corpus, m=4, k=4, method="faiss")


def test_kmeans_codebook_corpus_smaller_than_k(spark):
    """k > corpus rows must degrade like the medoid path (fewer centers),
    not crash on a mismatched bincount mask (round-6 review finding)."""
    corpus = _corpus(spark, n=5, dim=8)
    book = sim.pq_codebook(corpus, m=4, k=16, method="kmeans")
    assert book.shape == (5, 8)
    enc = sim.pq_encode(corpus, m=4, k=16, codebook="kmeans")
    assert enc.count() == 5


# -------------------------------------------------- incremental near-dup


def _doc_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_neardup_incremental_matches_full_run(spark, tmp_path):
    """neardup_incremental(delta, index(corpus)) must return EXACTLY the
    delta-touching subset of minhash_neardup_pairs(corpus ∪ delta): the
    band scheme is shared (_band_rows), so candidate recall is identical
    by construction — this pins it."""
    base = "the quick brown fox jumps over the lazy dog again and again today"
    corpus_rows = [
        (100 + i, f"{base} corpus variant {i} with extra tokens {i * 7}")
        for i in range(12)
    ]
    # two delta docs near-duplicate corpus docs, one is novel, one pair
    # is delta-internal
    delta_rows = [
        (1, f"{base} corpus variant 3 with extra tokens 21"),  # dup of 103
        (2, f"{base} corpus variant 5 with extra tokens 35 x"),  # near 105
        (3, "completely different text about warehouse inventory systems"),
        (4, f"{base} corpus variant 3 with extra tokens 21"),  # dup of 1 & 103
    ]
    corpus, delta = _doc_df(spark, corpus_rows), _doc_df(spark, delta_rows)
    path = "file://" + str(tmp_path / "nd")
    dd.neardup_index_write(corpus, path)
    inc = {
        (r.id_a, r.id_b, r.jaccard_sim)
        for r in dd.neardup_incremental(spark, delta, path, threshold=0.5).collect()
    }
    full = dd.minhash_neardup_pairs(corpus.unionByName(delta), threshold=0.5)
    delta_ids = {1, 2, 3, 4}
    expect = {
        (r.id_a, r.id_b, r.jaccard_sim)
        for r in full.collect()
        if r.id_a in delta_ids or r.id_b in delta_ids
    }
    assert inc == expect
    assert any(a in delta_ids and b not in delta_ids or b in delta_ids and a not in delta_ids
               for a, b, _ in inc), "no cross corpus-delta pair found"
    assert (1, 4) in {(a, b) for a, b, _ in inc}, "delta-internal pair missed"


def test_neardup_incremental_prunes_index_partitions(spark, tmp_path):
    """The index probe must carry the delta's (band, bp) values as
    PARTITION filters — the corpus band table is pruned at plan time,
    which is the whole cost-scales-with-delta claim. (The bands scan runs
    inside the operator's control-plane stage, so assert on the probe
    read the operator constructs — _probe_partition_pred over the real
    partitioned layout — not the post-checkpoint final plan; the final
    plan's shingle reads carry their own sb PartitionFilters, asserted
    below too.)"""
    rows = [(i, f"shared text body number {i} with tokens {i % 3}") for i in range(30)]
    corpus = _doc_df(spark, rows)
    path = "file://" + str(tmp_path / "nd")
    dd.neardup_index_write(corpus, path)

    class Probe:
        def __init__(self, band, bp):
            self.band, self.bp = band, bp

    probes = [Probe(0, "ab"), Probe(0, "cd"), Probe(2, "0f")]
    scan = spark.read.parquet(path + "/bands").filter(
        dd._probe_partition_pred(probes)
    )
    plan = scan._sc._jvm.PythonSQLUtils.explainString(
        scan._jdf.queryExecution(), "formatted"
    )
    pf = plan.split("PartitionFilters: ")[1].split("\n")[0]
    assert "band" in pf and "bp" in pf, pf
    # empty probe set → scan nothing (constant-false partition filter)
    assert spark.read.parquet(path + "/bands").filter(
        dd._probe_partition_pred([])
    ).count() == 0

    # and the final verify plan prunes the shingle read by id-bucket
    delta = _doc_df(spark, [(1000, "shared text body number 7 with tokens 1")])
    out = dd.neardup_incremental(spark, delta, path, threshold=0.3)
    vplan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert any(
        "sb" in seg.split("\n")[0] for seg in vplan.split("PartitionFilters: ")[1:]
    ), vplan


def test_neardup_incremental_empty_delta(spark, tmp_path):
    corpus = _doc_df(spark, [(1, "some corpus text here"), (2, "other text")])
    path = "file://" + str(tmp_path / "nd")
    dd.neardup_index_write(corpus, path)
    delta = _doc_df(spark, []).filter(F.lit(False))
    assert dd.neardup_incremental(spark, delta, path).count() == 0


# ------------------------------------------------- substring span dedup


def test_substring_dup_spans_planted(spark):
    """Planted verbatim boilerplate across docs must show up as duplicated
    windows; a unique doc must not; sub-window docs get 0 windows."""
    boiler = "B" * 45  # spans the full 40-char window at offsets 0..
    rows = [
        (1, boiler + " unique tail one that is long enough to matter ok"),
        (2, boiler + " other tail entirely different from the first doc"),
        (3, "x" * 80),  # self-repeating: every window identical
        (4, "totally unique text " + "".join(chr(97 + i % 26) for i in range(60))),
        (5, "short"),  # < window: 0 windows
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in dd.substring_dup_spans(df, window=40, stride=10).collect()}
    assert set(out) == {1, 2, 3, 4, 5}
    assert out[5].n_windows == 0 and out[5].dup_ratio == 0.0
    # docs 1 and 2 share the window at offset 0 (all Bs)
    assert out[1].n_dup_windows >= 1 and out[2].n_dup_windows >= 1
    # doc 3: 5 windows, all "x"*40 → every one duplicated
    assert out[3].n_windows == 5 and out[3].n_dup_windows == 5
    assert out[3].dup_ratio == 1.0
    assert out[4].n_dup_windows == 0


def test_substring_dup_spans_hash_windows_equivalent(spark):
    """The 8-byte-key production knob must produce identical results on a
    collision-free corpus."""
    rows = [(i, f"document body {i} " + "common license text " * 4) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(map(tuple, dd.substring_dup_spans(df).collect()))
    b = sorted(map(tuple, dd.substring_dup_spans(df, hash_windows=True).collect()))
    assert a == b


# ------------------------------------------------- random projection


def test_random_projection_shape_and_malformed(spark):
    import numpy as np

    rows = [
        (1, [float(i) for i in range(8)]),
        (2, None),
        (3, [1.0, 2.0]),  # wrong length
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r.vec_id: r for r in sim.random_projection(df, out_dim=4, dim=8, table=7).collect()}
    assert set(out[1].asDict()) == {"vec_id", "proj_0", "proj_1", "proj_2", "proj_3"}
    # malformed rows project to zeros, present in output
    assert all(out[2][f"proj_{p}"] == 0.0 for p in range(4))
    assert all(out[3][f"proj_{p}"] == 0.0 for p in range(4))
    # hand-check one projection: dim-sequential dot with the md5 planes
    W = np.array([sim._hyperplane(7, p, 8) for p in range(4)])
    x = np.arange(8, dtype=np.float64)
    for p in range(4):
        assert abs(out[1][f"proj_{p}"] - round(float((x * W[p]).sum()), 6)) < 1e-9


# ------------------------------------------------------ id-type derivation


def test_encode_schemas_follow_id_column_type(spark):
    """pq_encode / ivfpq_encode must carry the corpus id column's actual
    type through the mapInPandas schema instead of hardcoding long
    (ADVICE r5): an int id stays int."""
    corpus = _corpus(spark, n=20, id_type="int")
    enc = sim.pq_encode(corpus, m=4, k=4)
    assert enc.schema["vec_id"].dataType.simpleString() == "int"
    assert enc.count() == 20
    enc2 = sim.ivfpq_encode(corpus, nlist=4, m=4, kcode=4)
    assert enc2.schema["vec_id"].dataType.simpleString() == "int"
    assert enc2.count() == 20


# ------------------------------------------------------------ ivf_index_append


def test_ivf_index_append_matches_frozen_center_assignment(spark, tmp_path):
    """After appending a delta, searching the index must equal an
    _ivf_search over the UNION corpus assigned against the ORIGINAL
    (frozen) centers — append changes what is indexed, never the cell
    geometry."""
    corpus = _corpus(spark, n=60)
    delta = _corpus(spark, n=80).filter(F.col("vec_id") >= 60)
    path = "file://" + str(tmp_path / "ivf")
    sim.ivf_index_write(corpus, path, nlist=4)
    sim.ivf_index_append(delta, path)

    queries = corpus.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = sorted(
        (r["query_id"], r["vec_id"], r["cosine_sim"])
        for r in sim.ivf_index_topk(spark, path, queries, k=5, nprobe=2).collect()
    )

    centers = sorted(
        (int(r["cell"]), list(r["center"]))
        for r in spark.read.parquet(path + "/centers").collect()
    )
    union = corpus.unionByName(delta)
    union_cells = union.withColumn(
        "cell",
        F.element_at(sim._nearest_cells_udf(centers, 1)(F.col("embedding")), 1),
    )
    want = sorted(
        (r["query_id"], r["vec_id"], r["cosine_sim"])
        for r in sim._ivf_search(
            union_cells, queries, centers, 5, 2, "vec_id", "embedding", "query_id"
        ).collect()
    )
    assert got == want
    # the index now physically contains the delta rows:
    assert spark.read.parquet(path + "/data").filter(F.col("vec_id") >= 60).count() == 20


def test_ivf_index_append_touches_only_delta_cells(spark, tmp_path):
    """A one-vector delta must add files to exactly ONE cell directory;
    every other cell directory keeps its original file set."""
    import glob as _glob

    corpus = _corpus(spark, n=60)
    path_local = str(tmp_path / "ivf")
    sim.ivf_index_write(corpus, "file://" + path_local, nlist=4)

    def files_per_cell():
        out = {}
        for d in _glob.glob(path_local + "/data/cell=*"):
            out[d.rsplit("/", 1)[-1]] = sorted(_glob.glob(d + "/*.parquet"))
        return out

    before = files_per_cell()
    one = _corpus(spark, n=61).filter(F.col("vec_id") == 60)
    sim.ivf_index_append(one, "file://" + path_local)
    after = files_per_cell()
    changed = [c for c in after if after[c] != before.get(c, [])]
    assert len(changed) == 1, changed
    for c in before:
        assert set(before[c]) <= set(after.get(c, [])), f"{c} lost files"


# ----------------------------------------------------------------- BMP decode


def test_bmp_roundtrip_and_layout_undo():
    """encode_bmp stores bottom-up/BGR/padded; netpbm_array must recover
    the exact logical RGB top-down raster (any layout mistake shifts
    bytes)."""
    from wms_data_pipeline_spark.operators import multimodal as mm

    w, h = 5, 3  # stride 16 != 3*w — padding in play
    logical = bytes((j * 37) % 256 for j in range(3 * w * h))
    blob = mm.encode_bmp(w, h, logical)
    meta = mm.decode_image_real(blob)
    assert (meta["format"], meta["width"], meta["height"]) == ("image/bmp", w, h)
    assert meta["stride"] == 16 and meta["bottom_up"]
    arr, _ = mm.netpbm_array(blob)
    assert bytes(arr.reshape(-1)) == logical


def test_bmp_decoder_rejects_unsupported_and_truncated():
    import struct

    import pytest

    from wms_data_pipeline_spark.operators import multimodal as mm

    blob = bytearray(mm.encode_bmp(2, 2, bytes(range(12))))
    eight_bit = bytearray(blob)
    struct.pack_into("<H", eight_bit, 28, 8)
    with pytest.raises(NotImplementedError, match="24-bit"):
        mm.decode_image_real(bytes(eight_bit))
    compressed = bytearray(blob)
    struct.pack_into("<I", compressed, 30, 1)  # BI_RLE8
    with pytest.raises(NotImplementedError, match="compression"):
        mm.decode_image_real(bytes(compressed))
    with pytest.raises(ValueError, match="truncated BMP raster"):
        mm.decode_image_real(bytes(blob[:-5]))
    with pytest.raises(ValueError, match="truncated BMP header"):
        mm.decode_image_real(b"BM" + b"\x00" * 10)


def test_bmp_top_down_negative_height():
    """A negative biHeight means top-down storage: the decoder must NOT
    flip rows, and the recovered raster must still match."""
    import struct

    from wms_data_pipeline_spark.operators import multimodal as mm

    w, h = 3, 2
    logical = bytes((j * 11) % 256 for j in range(3 * w * h))
    blob = bytearray(mm.encode_bmp(w, h, logical))
    # rewrite as top-down: negate height and reorder raster rows
    struct.pack_into("<i", blob, 22, -h)
    stride = (3 * w + 3) // 4 * 4
    off = 54
    rows = [bytes(blob[off + y * stride : off + (y + 1) * stride]) for y in range(h)]
    blob[off:] = b"".join(reversed(rows))
    meta = mm.decode_image_real(bytes(blob))
    assert not meta["bottom_up"]
    arr, _ = mm.netpbm_array(bytes(blob))
    assert bytes(arr.reshape(-1)) == logical


# ------------------------------------------------------- persisted IVF-PQ


def test_ivfpq_index_matches_inmemory_search(spark, tmp_path):
    """Searching the persisted IVF-PQ index must return EXACTLY the
    in-memory ivfpq_topk result (same cells, codebook, LUT, tie rules) —
    the bit-identity that lets the registry query share its oracle."""
    corpus = _corpus(spark, n=120, dim=16)
    path = "file://" + str(tmp_path / "ivfpq")
    sim.ivfpq_index_write(corpus, path, nlist=8, m=4, kcode=8)
    queries = corpus.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = sorted(
        (r["query_id"], r["vec_id"], r["adc_dist"])
        for r in sim.ivfpq_index_topk(spark, path, queries, k=5, nprobe=3).collect()
    )
    want = sorted(
        (r["query_id"], r["vec_id"], r["adc_dist"])
        for r in sim.ivfpq_topk(
            corpus, queries, k=5, nlist=8, nprobe=3, m=4, kcode=8
        ).collect()
    )
    assert got == want and len(got) > 0


def test_ivfpq_index_prunes_partitions_and_guards_queries(spark, tmp_path, monkeypatch):
    """The data read must carry the probed cells as a partition filter,
    and an oversized query set must refuse like every sibling path."""
    corpus = _corpus(spark, n=80, dim=16)
    path = "file://" + str(tmp_path / "ivfpq")
    sim.ivfpq_index_write(corpus, path, nlist=8, m=4, kcode=8)
    queries = corpus.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    df = sim.ivfpq_index_topk(spark, path, queries, k=3, nprobe=2)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters" in plan and "cell" in plan
    monkeypatch.setattr(sim, "MAX_CLOSURE_QUERIES", 1)
    import pytest as _p

    with _p.raises(ValueError, match="ivfpq_index_topk"):
        sim.ivfpq_index_topk(spark, path, queries, k=3, nprobe=2)


def test_ivfpq_index_append_frozen_geometry(spark, tmp_path):
    """After appending a delta, the persisted search must equal an
    in-memory search over the UNION corpus — possible only because the
    delta was encoded against the SAME frozen cells and codebook."""
    corpus = _corpus(spark, n=100, dim=16)
    delta = _corpus(spark, n=130, dim=16).filter(F.col("vec_id") >= 100)
    path = "file://" + str(tmp_path / "ivfpq")
    sim.ivfpq_index_write(corpus, path, nlist=8, m=4, kcode=8)
    sim.ivfpq_index_append(delta, path)
    queries = corpus.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = sorted(
        (r["query_id"], r["vec_id"], r["adc_dist"])
        for r in sim.ivfpq_index_topk(spark, path, queries, k=5, nprobe=3).collect()
    )
    # reference: write a fresh index over the union USING THE CORPUS-ONLY
    # geometry is exactly what append promises; emulate via encode of the
    # union against the stored sidecars
    import numpy as np

    cells = np.array([r["center"] for r in sorted(
        spark.read.parquet(path + "/cells").collect(), key=lambda r: r["cell"])])
    book = np.array([r["vec"] for r in sorted(
        spark.read.parquet(path + "/codebook").collect(), key=lambda r: r["code"])])
    union = corpus.unionByName(delta)
    # verify the stored rows equal a from-scratch union encode
    enc = sim.ivfpq_encode(union, 8, 4, 8, _codebook_arr=book, _cell_arr=cells)
    want_rows = {
        (r["vec_id"], r["cell"], tuple(r["codes"])) for r in enc.collect()
    }
    stored = spark.read.parquet(path + "/data").collect()
    bits = spark.read.parquet(path + "/meta").collect()[0].bits  # 3 for kcode=8
    got_rows = {
        (r["vec_id"], r["cell"],
         tuple((r["codes_packed"] >> (bits * s)) & ((1 << bits) - 1) for s in range(4)))
        for r in stored
    }
    assert got_rows == want_rows
    assert len(got) > 0
    assert spark.read.parquet(path + "/data").count() == 130
