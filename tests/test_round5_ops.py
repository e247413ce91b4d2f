"""Round-5 operators: bigram LM scoring, deterministic source mixing,
last-touch attribution, prefix-filtered Jaccard join. Hand-computed
expectations on tiny inputs; the sf0.01 oracle parity for the same
operators runs in tools/parity.py."""

import datetime
import hashlib
import math

import pyspark.sql.functions as F
import pytest

from wms_data_pipeline_spark.operators import text as txt


def _hex64(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


# ---------------------------------------------------------------- bigram LM


def test_doc_bigrams_short_docs_drop(spark):
    df = spark.createDataFrame(
        [(1, "solo"), (2, ""), (3, "two tokens")], ["doc_id", "text"]
    )
    rows = txt.doc_bigrams(df).collect()
    assert [(r.doc_id, r.head, r.word) for r in rows] == [(3, "two", "tokens")]


def test_bigram_lm_score_hand_case(spark):
    # corpus: d1 = "a b a b", d2 = "a b c"
    # cab: (a,b)=3 (b,a)=1 (b,c)=1; ca: a=3 b=2; V = |{a,b,c}| = 3
    df = spark.createDataFrame([(1, "a b a b"), (2, "a b c")], ["doc_id", "text"])
    out = {r.doc_id: r for r in txt.bigram_lm_score(df).collect()}
    p_ab = math.log(3.5 / 4.5)
    p_ba = math.log(1.5 / 3.5)
    p_bc = math.log(1.5 / 3.5)
    assert out[1].n_bigrams == 3
    assert out[2].n_bigrams == 2
    assert out[1].lm_score == pytest.approx(round((2 * p_ab + p_ba) / 3, 6), abs=1e-6)
    assert out[2].lm_score == pytest.approx(round((p_ab + p_bc) / 2, 6), abs=1e-6)


def test_bigram_lm_repetitive_beats_garbled(spark):
    """The filter's point: common-transition text scores above text whose
    transitions are unique in the corpus."""
    common = " ".join(["the cat sat"] * 5)
    rows = [(i, common) for i in range(10)] + [(99, "zq xv qj wk vv zz")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r.lm_score for r in txt.bigram_lm_score(df).collect()}
    assert out[0] > out[99]


# ---------------------------------------------------------------- mixing


def test_mix_sources_matches_driver_side_recompute(spark):
    from wms_data_pipeline_spark.plans.queries import MIX_RATES_BP, txt_mix_sources

    out = {r.source: r for r in txt_mix_sources(spark, "/root/testdata/sf0.01").collect()}
    import duckdb

    docs = duckdb.sql(
        "SELECT doc_id, source, n_chars FROM '/root/testdata/sf0.01/documents.parquet'"
    ).fetchall()
    expected: dict[str, list[int]] = {}
    for doc_id, source, n_chars in docs:
        keep = _hex64(f"{doc_id}:mix") % 10_000 < MIX_RATES_BP.get(source, 0)
        tot, kept, chars = expected.setdefault(source, [0, 0, 0])
        expected[source] = [tot + 1, kept + keep, chars + (n_chars if keep else 0)]
    assert set(out) == set(expected)
    for s, (tot, kept, chars) in expected.items():
        assert (out[s].total_docs, out[s].kept_docs, out[s].kept_chars) == (
            tot,
            kept,
            chars,
        ), s


def test_mix_rates_are_roughly_respected(spark):
    from wms_data_pipeline_spark.plans.queries import txt_mix_sources

    out = {r.source: r for r in txt_mix_sources(spark, "/root/testdata/sf0.1").collect()}
    # src0-4 keep-all is exact; the hash is uniform so 10% sources keep
    # far fewer than half-rate sources at 250 docs/source.
    assert all(out[f"src{i}"].kept_docs == out[f"src{i}"].total_docs for i in range(5))
    low = sum(out[f"src{i}"].kept_docs for i in range(15, 20))
    half = sum(out[f"src{i}"].kept_docs for i in range(5, 10))
    assert low < half


# ---------------------------------------------------------------- attribution


def _ts(h, m=0):
    return datetime.datetime(2024, 3, 1, h, m)


def test_last_touch_attribution_hand_case(spark):
    from wms_data_pipeline_spark.operators import relational as rel

    ev = spark.createDataFrame(
        [
            (1, _ts(10, 0), 1, "click", 0.0),
            (2, _ts(10, 30), 1, "click", 0.0),
            (3, _ts(11, 0), 1, "purchase", 9.5),
            (4, _ts(18, 0), 1, "purchase", 3.0),  # last click 7.5h ago: no credit
            (5, _ts(9, 0), 2, "click", 0.0),
            (6, _ts(9, 0), 2, "click", 0.0),  # same ts: max event_id wins
            (7, _ts(9, 30), 2, "purchase", 1.0),
        ],
        ["event_id", "ts", "user_id", "event_type", "value"],
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_event_id"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "ts", "user_id", "value"
    )
    out = {
        r.event_id: r
        for r in rel.asof_join(
            purchases,
            clicks,
            left_on="user_id",
            right_on="user_id",
            left_ts="ts",
            right_ts="ts",
            right_cols=["click_event_id"],
            tolerance="6 HOUR",
            left_unique=["event_id"],
        ).collect()
    }
    assert out[3].click_event_id == 2 and out[3].asof_ts == _ts(10, 30)
    assert out[4].click_event_id is None
    assert out[7].click_event_id == 6


# ------------------------------------------------------- prefix Jaccard join


def test_prefix_jaccard_join_equals_brute_force(spark):
    """Prefix filtering is EXACT: result identical to all-pairs Jaccard,
    including near-threshold pairs and docs with no qualifying partner."""
    from itertools import combinations

    from wms_data_pipeline_spark.operators.dedup import prefix_jaccard_join

    texts = [
        "a b c d e",          # 0
        "a b c d f",          # 1: J(0,1) = 4/6 = 0.667
        "a b c d e x",        # 2: J(0,2) = 5/6 = 0.833
        "p q r s t",          # 3: island
        "a b c d e",          # 4: J(0,4) = 1.0
        "w",                  # 5: singleton token
    ]
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    t = 0.66
    got = {
        (r.id_a, r.id_b): r.jaccard_sim
        for r in prefix_jaccard_join(df, threshold=t).collect()
    }
    sets = [set(x.split()) for x in texts]
    expected = {}
    for i, j in combinations(range(len(texts)), 2):
        jac = len(sets[i] & sets[j]) / len(sets[i] | sets[j])
        if jac >= t:
            expected[(i, j)] = round(jac, 6)
    assert got == expected
    assert (0, 2) in got and (0, 4) in got and (0, 1) in got


def test_prefix_jaccard_integer_ceil_edge(spark):
    """The float-ceil trap: t=0.55 over a 20-token doc has ceil(t*n)=11
    exactly, but double(0.55)*20 = 11.000000000000002 rounds the prefix
    one token short. The integer-rational prefix length must keep the
    boundary pair (J exactly 0.55 = 11/20)."""
    from wms_data_pipeline_spark.operators.dedup import prefix_jaccard_join

    toks = [f"t{i}" for i in range(20)]
    # |A| = |B| = 20, inter = 15 → J = 15/25 = 0.6 ≥ 0.55: qualifies, and
    # both docs sit exactly at the n=20 prefix-length boundary the float
    # ceil would get wrong.
    a = " ".join(toks[:20])
    b = " ".join(toks[:15] + [f"b{i}" for i in range(5)])
    df = spark.createDataFrame([(0, a), (1, b)], "doc_id long, text string")
    got = prefix_jaccard_join(df, threshold=0.55).collect()
    assert [(r.id_a, r.id_b) for r in got] == [(0, 1)]
    assert got[0].jaccard_sim == 0.6


# ------------------------------------------------------------- PQ encoding


def test_pq_encode_medoids_reconstruct_exactly(spark):
    """Every hash-chosen medoid vector must encode with MSE exactly 0 (its
    own subvectors are codewords), all codes must be in [0, k), and every
    corpus vector gets exactly one code row."""
    from wms_data_pipeline_spark.operators.similarity import medoid_centers, pq_encode
    from wms_data_pipeline_spark.schemas import load_table

    sf = "/root/testdata/sf0.001"
    e = load_table(spark, sf, "embeddings")
    out = {r.vec_id: r for r in pq_encode(e, m=8, k=16).collect()}
    assert len(out) == e.count()
    assert all(0 <= c < 16 for r in out.values() for c in r.codes)
    assert all(len(r.codes) == 8 for r in out.values())
    med_rows = (
        e.selectExpr("vec_id", "md5(concat_ws(':', cast(vec_id as string), '7')) h")
        .orderBy("h")
        .limit(16)
        .collect()
    )
    for r in med_rows:
        assert out[r.vec_id].mse == 0.0, r.vec_id


def test_pq_adc_recall_vs_exact(spark):
    """ADC is approximate; pin two things against exact euclidean top-10:
    (1) the coarse 16-codeword codebook clears a floor well above random
    (10/500 = 0.02) — zero overlap would mean broken LUT/code plumbing —
    and (2) recall IMPROVES with a finer codebook (the knob a deployment
    turns), measured 0.26 → 0.38 at 16 → 128 codewords on this corpus.
    The near-uniform synthetic embeddings are vector quantization's worst
    case; clustered real embeddings sit far higher at the same bits."""
    import numpy as np

    from wms_data_pipeline_spark.operators.similarity import pq_adc_topk
    from wms_data_pipeline_spark.schemas import load_table

    sf = "/root/testdata/sf0.001"
    e = load_table(spark, sf, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    rows = e.collect()
    X = np.array([[float(x) for x in r.embedding] for r in rows])
    ids = np.array([r.vec_id for r in rows])

    def mean_recall(kcode):
        adc = {}
        for r in pq_adc_topk(e, q, k=10, kcode=kcode).collect():
            adc.setdefault(r.query_id, set()).add(r.vec_id)
        recalls = []
        for qid in adc:
            qv = X[ids == qid][0]
            d = ((X - qv) ** 2).sum(axis=1)
            exact = set(ids[np.argsort(d, kind="stable")[:10]].tolist())
            recalls.append(len(adc[qid] & exact) / 10)
        return sum(recalls) / len(recalls)

    coarse, fine = mean_recall(16), mean_recall(128)
    assert coarse >= 0.2, coarse
    assert fine > coarse, (coarse, fine)


def test_ivfpq_results_come_only_from_probed_cells(spark):
    """Structural invariant: every returned vector's coarse cell must be
    one of the query's nprobe nearest cells (recomputed independently in
    numpy), and the search is deterministic across runs."""
    import numpy as np

    from wms_data_pipeline_spark.operators.similarity import (
        ivfpq_encode,
        ivfpq_topk,
        medoid_centers,
    )
    from wms_data_pipeline_spark.schemas import load_table

    sf = "/root/testdata/sf0.001"
    e = load_table(spark, sf, "embeddings")
    q = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out1 = sorted(
        (r.query_id, r.vec_id, r.adc_dist) for r in ivfpq_topk(e, q, k=5).collect()
    )
    out2 = sorted(
        (r.query_id, r.vec_id, r.adc_dist) for r in ivfpq_topk(e, q, k=5).collect()
    )
    assert out1 == out2 and len(out1) == 15
    cells = {r.vec_id: r.cell for r in ivfpq_encode(e).collect()}
    meds = np.array(
        [v for _, v in medoid_centers(e, 16, seed=11, normalize=False)]
    )
    qv = {r.query_id: np.array([float(x) for x in r.embedding]) for r in q.collect()}
    for qid, vid, _ in out1:
        d = ((meds - qv[qid]) ** 2).sum(axis=1)
        probed = set(np.lexsort((np.arange(16), d))[:4].tolist())
        assert cells[vid] in probed, (qid, vid)
