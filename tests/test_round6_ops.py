"""Round-6 fixes: scalar PQ-code packing (the round-5 driver
canonicalization failure), the ivf_index_topk closure guard, the
ivfpq dim%m divisibility check, and id-type derivation in the encode
schemas (ADVICE r5 items)."""

import pytest
from pyspark.sql import functions as F

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
