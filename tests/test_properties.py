"""Property-based tests (hypothesis): the merge sinks and watermark control
plane against independent Python reference models, under arbitrary
out-of-order / duplicated update streams.

These generalize the reference's hand-picked integration cases
(test_staging_repo.py / test_watermark_repo.py) to the whole input space —
the suite the MERGE semantics actually need at 100 TB where every
pathological ordering eventually occurs.
"""

from datetime import datetime, timedelta, timezone

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from wms_data_pipeline_spark.control.watermark import compute_new_watermark
from wms_data_pipeline_spark.operators.merge import history_merge, latest_merge

BASE = datetime(2026, 1, 1)

# an update: (key 0-3, ts offset hours 0-5, payload version 0-3)
update = st.tuples(
    st.integers(0, 3), st.integers(0, 5), st.integers(0, 3)
)
stream = st.lists(update, min_size=1, max_size=12)


def _df(spark, rows):
    return spark.createDataFrame(
        [
            (f"k{k}", BASE + timedelta(hours=h), f"p{k}-{h}-{v}", f"h{k}-{h}-{v}")
            for (k, h, v) in rows
        ],
        "id string, updated_at timestamp, payload string, payload_hash string",
    )


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(batch1=stream, batch2=stream)
def test_latest_merge_equals_reference_model(spark, batch1, batch2):
    """Applying two batches through latest_merge == per-key max over the
    union, with the newer-wins tie rule: rows from batch1 (already stored)
    beat equal-timestamp rows from batch2; within a batch the tiebreak
    column decides."""
    state = latest_merge(None, _df(spark, batch1), key="id", ts_col="updated_at")
    state = latest_merge(state, _df(spark, batch2), key="id", ts_col="updated_at")
    got = {r["id"]: (r["updated_at"], r["payload"]) for r in state.collect()}

    # reference model
    model: dict[str, tuple] = {}
    def apply_batch(rows):
        # intra-batch winner per key: max (ts, payload_hash)
        best: dict[str, tuple] = {}
        for (k, h, v) in rows:
            kk, ts = f"k{k}", BASE + timedelta(hours=h)
            cand = (ts, f"h{k}-{h}-{v}", f"p{k}-{h}-{v}")
            if kk not in best or (cand[0], cand[1]) > (best[kk][0], best[kk][1]):
                best[kk] = cand
        for kk, (ts, hh, pp) in best.items():
            if kk not in model or ts > model[kk][0]:  # strict >: stored wins ties
                model[kk] = (ts, hh, pp)
    apply_batch(batch1)
    apply_batch(batch2)
    want = {kk: (ts, pp) for kk, (ts, hh, pp) in model.items()}
    assert got == want


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(batch1=stream, batch2=stream)
def test_history_merge_is_set_union_on_key(spark, batch1, batch2):
    """History after two appends == set of distinct (id, ts, hash) triples;
    re-appending batch1 is always a no-op."""
    inserted1, hist = history_merge(None, _df(spark, batch1))
    inserted2, hist = history_merge(hist, _df(spark, batch2))
    keys = {
        (r["id"], r["updated_at"], r["payload_hash"]) for r in hist.collect()
    }
    want = {
        (f"k{k}", BASE + timedelta(hours=h), f"h{k}-{h}-{v}")
        for (k, h, v) in batch1 + batch2
    }
    assert keys == want
    # idempotence: replay batch1
    replay_inserted, hist2 = history_merge(hist, _df(spark, batch1))
    assert replay_inserted.count() == 0
    assert hist2.count() == hist.count()


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(0, 10**6), min_size=1, max_size=20))
def test_watermark_monotonic_under_any_sequence(offsets):
    wm = datetime(1970, 1, 1, tzinfo=timezone.utc)
    seen_max = wm
    for off in offsets:
        ts = datetime(2026, 1, 1, tzinfo=timezone.utc) + timedelta(seconds=off)
        wm = compute_new_watermark(ts, wm)
        seen_max = max(seen_max, ts)
        assert wm == seen_max  # never backwards, always the running max
    assert compute_new_watermark(None, wm) == wm  # empty batch carries forward


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(old=stream, new=stream)
def test_latest_merge_single_pass_equals_collapsed(spark, old, new):
    """The round-2 wm_latest_state rewrite's invariant: merging the
    UN-COLLAPSED existing side in one pass gives the identical winner as
    collapsing it to a snapshot first — latest_merge's order is total, so
    per-key max is associative. Holds for every interleaving hypothesis
    finds, including equal-timestamp ties on both sides."""
    o, n = _df(spark, old), _df(spark, new)
    collapsed = latest_merge(
        latest_merge(None, o, key="id", ts_col="updated_at", tiebreak_col="payload_hash"),
        n, key="id", ts_col="updated_at", tiebreak_col="payload_hash",
    )
    single = latest_merge(
        o, n, key="id", ts_col="updated_at", tiebreak_col="payload_hash"
    )
    as_set = lambda df: {tuple(r) for r in df.collect()}  # noqa: E731
    assert as_set(single) == as_set(collapsed)


# --------------------------------------------------------------- bigram LM

_word = st.sampled_from(["a", "b", "c", "dd"])
_doc = st.lists(_word, min_size=0, max_size=6).map(" ".join)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(docs=st.lists(_doc, min_size=1, max_size=6))
def test_bigram_lm_score_equals_python_model(spark, docs):
    """bigram_lm_score against a dict-based Python reference LM over
    arbitrary tiny corpora: identical n_bigrams, lm_score equal to the
    reference mean-log-probability within the 6-dp rounding contract, and
    <2-token docs absent from the output."""
    import math

    from wms_data_pipeline_spark.operators.text import bigram_lm_score

    df = spark.createDataFrame(list(enumerate(docs)), "doc_id long, text string")
    got = {r.doc_id: (r.n_bigrams, r.lm_score) for r in bigram_lm_score(df).collect()}

    cab: dict[tuple, int] = {}
    ca: dict[str, int] = {}
    vocab = set()
    per_doc: dict[int, list] = {}
    for i, doc in enumerate(docs):
        toks = doc.split()
        bgs = list(zip(toks, toks[1:]))
        per_doc[i] = bgs
        for h, w in bgs:
            cab[(h, w)] = cab.get((h, w), 0) + 1
            ca[h] = ca.get(h, 0) + 1
            vocab.add(w)
    v = len(vocab)
    for i, bgs in per_doc.items():
        if not bgs:
            assert i not in got
            continue
        logps = [
            math.log((cab[(h, w)] + 0.5) / (ca[h] + 0.5 * v)) for h, w in bgs
        ]
        n, score = got[i]
        assert n == len(bgs)
        assert abs(score - sum(logps) / len(logps)) <= 1e-6


@settings(max_examples=40, deadline=None)
@given(
    st.binary(min_size=0, max_size=3000),
    st.integers(min_value=2, max_value=8),
)
def test_lzw_roundtrip_property(data, min_code_size):
    """GIF-variant LZW must round-trip ANY byte stream whose symbols fit
    min_code_size bits — including empty streams, runs (KwKwK), and
    streams long enough to grow code width."""
    from wms_data_pipeline_spark.operators import multimodal as mm

    clear = 1 << min_code_size
    clamped = bytes(b % clear for b in data)
    comp = mm._lzw_compress_gif(clamped, min_code_size)
    assert mm._lzw_decompress_gif(comp, min_code_size) == clamped


# --------------------------------------------- weighted classifier (r11)

_wtok = st.sampled_from(["the", "qu", "x1", "zz"])
_wdoc = st.lists(_wtok, min_size=0, max_size=8).map(" ".join)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    docs=st.lists(_wdoc, min_size=1, max_size=6),
    weights=st.fixed_dictionaries(
        {},
        optional={
            "the": st.integers(-500, 500),
            "qu": st.integers(-500, 500),
            "x1": st.integers(-500, 500),
        },
    ),
)
def test_classifier_weighted_equals_python_model(spark, docs, weights):
    """classifier_score(weights=...) against a pure-Python scorer over
    arbitrary tiny corpora and weight tables: identical integer wsum and
    token counts, sigmoid equal within the 6-dp rounding contract;
    unseen tokens weigh 0."""
    import math

    from wms_data_pipeline_spark.operators.text import classifier_score

    df = spark.createDataFrame(
        list(enumerate(docs)), "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_tokens, r.wsum, r.quality_score)
        for r in classifier_score(df, weights=dict(weights)).collect()
    }
    for i, doc in enumerate(docs):
        toks = doc.split()
        wsum = sum(weights.get(t, 0) for t in toks)
        logit = wsum / (250.0 * len(toks)) if toks else 0.0
        score = round(1.0 / (1.0 + math.exp(-logit)), 6)
        assert got[i] == (len(toks), wsum, score), (i, doc)


# ----------------------------------------------- psi probe model (r11)

_grp = st.sampled_from(["g1", "g2"])
_val = st.integers(0, 20)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    rows=st.lists(
        st.tuples(_grp, _val, st.booleans()), min_size=4, max_size=30
    ).filter(
        # every group that appears must have at least one reference row
        # (frozen geometry needs reference edges)
        lambda rs: all(
            any(g2 == g and not c for g2, _, c in rs)
            for g, _, c in rs
        )
    ),
)
def test_psi_probe_equals_python_model(spark, tmp_path_factory, rows):
    """psi_drift_probe against a pure-Python PSI over arbitrary tiny
    populations whose geometry is frozen on the REFERENCE rows —
    bucket assignment, add-one smoothing, and clamping all mirrored."""
    import math

    from wms_data_pipeline_spark.operators.quality import (
        psi_drift_probe,
        psi_reference_write,
    )

    df = spark.createDataFrame(rows, "g string, v long, cur boolean")
    path = str(tmp_path_factory.mktemp("psi") / "store")
    psi_reference_write(df.filter("NOT cur"), "g", "v", path)
    got = {
        r["g"]: (r["n_ref"], r["n_cur"], r["psi"])
        for r in psi_drift_probe(df.filter("cur"), "g", "v", path).collect()
    }

    ref = [(g, v) for g, v, c in rows if not c]
    cur = [(g, v) for g, v, c in rows if c]
    groups = {g for g, _ in ref}
    assert set(got) == groups
    for g in groups:
        rv = [v for gg, v in ref if gg == g]
        cv = [v for gg, v in cur if gg == g]
        mn, mx = min(rv), max(rv)

        def bucket(v):
            if mx == mn:
                return 0
            return min(9, max(0, math.floor((v - mn) * 10 / (mx - mn))))

        rb = [0] * 10
        cb = [0] * 10
        for v in rv:
            rb[bucket(v)] += 1
        for v in cv:
            cb[bucket(v)] += 1
        psi = 0.0
        for b in range(10):
            p = (rb[b] + 1) / (len(rv) + 10)
            q = (cb[b] + 1) / (len(cv) + 10)
            psi += (q - p) * math.log(q / p)
        assert got[g][0] == len(rv) and got[g][1] == len(cv)
        assert abs(got[g][2] - psi) < 2e-6, (g, got[g][2], psi)


# --------------------------------------------------------------------------
# r13: the equi-depth drift grid against an independent Python model
# --------------------------------------------------------------------------

values = st.lists(
    st.integers(-50, 50).map(float), min_size=1, max_size=40
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(ref=values, n_bins=st.integers(2, 12))
def test_exact_quantile_edges_matches_rank_model(spark, ref, n_bins):
    """exact_quantile_edges == the plain-Python order-statistics model:
    edge i (1-based) is the value at rank ceil(i*N/n_bins) of the sorted
    reference — sorted output, values drawn from the data, length
    n_bins - 1 with repeats when N < n_bins."""
    from wms_data_pipeline_spark.operators.quality import exact_quantile_edges

    df = spark.createDataFrame([("g", v) for v in ref], "g string, v double")
    got = exact_quantile_edges(df, "g", "v", n_bins).collect()[0]["_e"]
    s = sorted(ref)
    n = len(s)
    want = [
        s[min((i * n + n_bins - 1) // n_bins, n) - 1]
        for i in range(1, n_bins)
    ]
    assert got == want


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(ref=values, cur=values)
def test_equidepth_ks_one_sided_bound(spark, ref, cur, tmp_path_factory):
    """The quantized KS is ONE-SIDED under any inputs: it never exceeds
    the exact two-sample KS, and understates by at most the heaviest
    single-bin mass of either population (the store's own bound)."""
    from wms_data_pipeline_spark.operators import quality as q

    path = str(tmp_path_factory.mktemp("eqks") / "store")
    rows = [("g", v, False) for v in ref] + [("g", v, True) for v in cur]
    df = spark.createDataFrame(rows, "g string, v double, cur boolean")
    q.ks_reference_write_quantized(
        df.filter("NOT cur"), "g", "v", path, n_bins=8,
        edges="quantile_exact",
    )
    got = q.ks_drift_probe_quantized(
        df.filter("cur"), "g", "v", path
    ).collect()[0]["ks_x1e6"]
    exact = q.ks_drift(df, "g", "v", "cur").collect()[0]["ks_x1e6"]
    assert got <= exact
    # bound: heaviest bin mass of either population on the frozen grid
    import collections

    s = sorted(ref)
    n = len(s)
    edges = [s[min((i * n + 7) // 8, n) - 1] for i in range(1, 8)]

    def bucket(v):
        return sum(1 for e in edges if v >= e)

    worst = 0.0
    for pop in (ref, cur):
        c = collections.Counter(bucket(v) for v in pop)
        worst = max(worst, max(c.values()) / len(pop))
    assert exact - got <= worst * 1_000_000 + 1  # +1 for the div floor
