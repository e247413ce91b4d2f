"""Property-based equivalence of the Arrow-batched numpy kernels against
their expression twins / pure-Python reference models (hypothesis).

Round 4 moved the hot dense kernels (LSH sketch, minhash permutations,
simhash bit-majority) out of interpreted HOF expressions into numpy.
Their correctness claim is strong — BIT-identical results via the same
IEEE-754 operation sequence — and these tests hold it over arbitrary
inputs, not just the driver testdata.
"""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from wms_data_pipeline_spark.operators import dedup as dd
from wms_data_pipeline_spark.operators import similarity as sim

DIM = 8
PLANES = 8

f32 = st.floats(
    width=32, allow_nan=False, allow_infinity=False, min_value=-1e6, max_value=1e6
)
vec = st.lists(f32, min_size=DIM, max_size=DIM)


def _lsh_reference(v: list[float]) -> int:
    """Pure-Python model of the sketch: md5 hyperplanes, float32→float64
    element cast, LEFT-TO-RIGHT float64 accumulation, strict > 0 sign."""
    import numpy as np

    acc = 0
    for p in range(PLANES):
        w = sim._hyperplane(0, p, DIM)
        proj = 0.0
        for j in range(DIM):
            proj = proj + float(np.float32(v[j])) * w[j]
        if proj > 0:
            acc += 2**p
    return acc


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(vecs=st.lists(vec, min_size=1, max_size=6))
def test_lsh_bucket_matches_python_reference(spark, vecs):
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], f"vec_id long, embedding array<float>"
    )
    got = {
        r["vec_id"]: r["b"]
        for r in df.select(
            "vec_id",
            sim.lsh_bucket(F.col("embedding"), n_planes=PLANES, dim=DIM).alias("b"),
        ).collect()
    }
    assert got == {i: _lsh_reference(v) for i, v in enumerate(vecs)}


token = st.text(alphabet="abcdefgh", min_size=1, max_size=4)
doc = st.lists(token, min_size=1, max_size=12).map(" ".join)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(docs=st.lists(doc, min_size=1, max_size=5))
def test_simhash_kernel_matches_expression_twin(spark, docs):
    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id long, text string"
    )
    via_kernel = {
        r["doc_id"]: r["simhash"]
        for r in dd.with_simhash(df, "text", bits=8).select("doc_id", "simhash").collect()
    }
    via_expr = {
        r["doc_id"]: r["s"]
        for r in df.select("doc_id", dd.simhash_col("text", bits=8).alias("s")).collect()
    }
    assert via_kernel == via_expr


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(docs=st.lists(doc, min_size=1, max_size=5))
def test_minhash_kernel_matches_expression_twin(spark, docs):
    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id long, text string"
    )
    via_kernel = dd.with_minhash_signature(df, "text", num_perm=4, shingle_n=2)
    shingles = dd.shingles_of("text", 2)
    via_expr = df.withColumn("__h", dd.shingle_hash_col(shingles)).select(
        "doc_id",
        *[
            F.array_min(
                F.transform(
                    F.col("__h"),
                    (lambda a, b: lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(dd.MERSENNE31))(
                        *dd.perm_coeffs(4)[p]
                    ),
                )
            ).alias(f"mh_{p}")
            for p in range(4)
        ],
    )
    cols = ["doc_id"] + [f"mh_{p}" for p in range(4)]
    a = sorted(map(tuple, via_kernel.select(*cols).collect()))
    b = sorted(map(tuple, via_expr.select(*cols).collect()))
    assert a == b
