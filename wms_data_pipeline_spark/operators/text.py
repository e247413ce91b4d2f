"""Text-analysis operators for LLM training-data pipelines.

All pure JVM expressions (regexp/array functions inside whole-stage codegen)
— no Python UDFs in any hot path; these run map-side with zero shuffle, so
they scale linearly to 100 TB of documents.

Cross-engine-hashable convention: where an operator needs a hash that the
DuckDB oracle must reproduce, it uses ``hex64(md5(x))`` = first 15 hex chars
of md5 as a bigint (60 bits, always positive) — identical in Spark
(``conv(substring(md5(x),1,15),16,10)``) and DuckDB
(``('0x'||substr(md5(x),1,15))::BIGINT``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

TOKEN_PATTERN = r"\\S+"

#: ``cms_heavy_keys``: widest sketch whose per-depth (bucket, count)
#: slice still broadcasts (2^21 cells ~ 32 MB serialized); above this
#: the candidate-scoring joins switch to shuffle hash joins.
BROADCAST_MAX_WIDTH = 1 << 21

#: ``cms_heavy_keys``: auto-sizing cap (2^27 cells ~ 1 GB/depth as a
#: join table). A distinct-key estimate demanding more than this means
#: the caller must size the sketch from a heavy-mass estimate instead.
MAX_AUTO_WIDTH = 1 << 27

#: Tiny per-language stopword lists for the n-gram/stopword language-ID
#: heuristic. Deterministic and SQL-expressible; a production lang-ID model
#: would ride the same mapInPandas plumbing as operators/multimodal.py.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is"),
    "es": ("el", "la", "de", "que", "y", "en", "un"),
    "de": ("der", "die", "das", "und", "ist", "von", "ein"),
    "fr": ("le", "la", "de", "et", "un", "une", "est"),
    "zh": ("的", "了", "是", "我", "不", "在", "人"),
}


def hex64(col: Column | str) -> Column:
    """Cross-engine 60-bit hash (see module docstring)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def tokens_of(colname: str = "text") -> Column:
    """Whitespace tokenization as an array column (map-side, no shuffle)."""
    return F.regexp_extract_all(F.col(colname), F.lit(r"\S+"), F.lit(0))


def token_count(colname: str = "text") -> Column:
    """Whitespace token count; a BPE-ish proxy (``bpe_token_estimate``)
    approximates subword counts as ceil(chars/4) the way LLM cost
    estimators do. ``regexp_count`` of the token pattern — same count as
    ``size(tokens_of(...))`` without materializing the array."""
    return F.regexp_count(F.col(colname), F.lit(r"\S+"))


def bpe_token_estimate(colname: str = "text") -> Column:
    return F.ceil(F.length(F.col(colname)) / F.lit(4.0)).cast("long")


def stopword_count(colname: str, stopwords: tuple[str, ...]) -> Column:
    """Count of tokens exactly equal to one of ``stopwords``.

    One ``regexp_count`` scan over space-padded text: every token is
    preceded by its own whitespace char in the padded string (consumed by
    the match) and the trailing boundary is a non-consuming lookahead, so
    consecutive stopword tokens all count; a token merely CONTAINING a
    stopword ("a,") fails the lookahead exactly like token equality.
    Counts are identical to the former higher-order
    ``filter(tokens, t -> array_contains(...))`` form, which evaluated its
    lambda interpretively per token outside codegen (the HOF lesson from
    the minhash/LSH kernels — A/B'd in tools/ab_curation.py)."""
    alt = "|".join(stopwords)
    return F.regexp_count(
        F.concat(F.lit(" "), F.col(colname), F.lit(" ")),
        F.lit(rf"\s({alt})(?=\s)"),
    )


def quality_features(df: DataFrame, colname: str = "text") -> DataFrame:
    """Quality scoring features: length, token stats, punctuation/digit/
    stopword ratios, and a composite ``quality_score`` in [0,1]. Formula is
    fixed (documented here) so the oracle can reproduce it:

    score = 0.3*min(n_tokens/100,1) + 0.3*(1-punct_ratio) +
            0.2*min(stop_ratio*5,1) + 0.2*(1-digit_ratio), rounded to 6dp.

    Every feature is a single counting regex scan (``regexp_count``) —
    no intermediate replaced strings, token arrays, or interpreted HOF
    lambdas. Counts (and therefore score bits) are identical to the
    tokenize/replace formulation the DuckDB oracle uses; the fused form
    measured 0.72→0.60 s on the curation headliner (tools/ab_curation.py).
    """
    n_chars = F.length(F.col(colname))
    n_tok = F.regexp_count(F.col(colname), F.lit(r"\S+"))
    punct = F.regexp_count(F.col(colname), F.lit("[.,;:!?'\"()\\[\\]{}-]"))
    digits = F.regexp_count(F.col(colname), F.lit("[0-9]"))
    stop = stopword_count(colname, LANG_STOPWORDS["en"])
    safe_chars = F.greatest(n_chars, F.lit(1))
    safe_tok = F.greatest(n_tok, F.lit(1))
    punct_ratio = punct / safe_chars
    digit_ratio = digits / safe_chars
    stop_ratio = stop / safe_tok
    score = (
        F.lit(0.3) * F.least(n_tok / F.lit(100.0), F.lit(1.0))
        + F.lit(0.3) * (F.lit(1.0) - punct_ratio)
        + F.lit(0.2) * F.least(stop_ratio * 5, F.lit(1.0))
        + F.lit(0.2) * (F.lit(1.0) - digit_ratio)
    )
    return (
        df.withColumn("n_tokens", n_tok.cast("long"))
        .withColumn("punct_ratio", F.round(punct_ratio, 6))
        .withColumn("digit_ratio", F.round(digit_ratio, 6))
        .withColumn("stopword_ratio", F.round(stop_ratio, 6))
        .withColumn("quality_score", F.round(score, 6))
    )


def lang_id(df: DataFrame, colname: str = "text", out_col: str = "lang_pred") -> DataFrame:
    """Stopword-hit language ID: argmax over per-language stopword counts,
    ties broken by fixed language order (en, es, de, fr, zh); zero hits →
    'und'. Deterministic, JVM-only, SQL-reproducible."""
    langs = list(LANG_STOPWORDS)
    counts = [stopword_count(colname, LANG_STOPWORDS[l]).alias(f"__c_{l}") for l in langs]
    tmp = df.select("*", *counts)
    best = F.greatest(*[F.col(f"__c_{l}") for l in langs])
    pred = F.lit("und")
    for l in reversed(langs):  # earlier langs win ties: apply last
        pred = F.when((F.col(f"__c_{l}") == best) & (best > 0), F.lit(l)).otherwise(pred)
    return tmp.withColumn(out_col, pred).drop(*[f"__c_{l}" for l in langs])


def fingerprint(df: DataFrame, colname: str = "text", out_col: str = "fingerprint") -> DataFrame:
    """Document fingerprint: SHA-256 over whitespace-normalized lowercase
    text (collapse runs, trim). Stable under reflow — the exact-dedup key
    for noisy corpora."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(colname)), r"\s+", " "))
    return df.withColumn(out_col, F.sha2(norm, 256))


def doc_bigrams(df: DataFrame, colname: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Explode each document into its whitespace-token bigrams:
    (id, head, word) — one row per adjacent token pair, map-side.

    The bigram array is built with one ``zip_with`` pass over two slices of
    the token array (a single interpreted-lambda traversal per row — cheap,
    unlike the 60-projection HOF pattern the Arrow kernels replaced; see
    SCALE_NOTES). Documents with fewer than two tokens produce no rows
    (``greatest(size-1, 0)`` guards the slice length against empty text).
    """
    toks = tokens_of(colname)
    pairs = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("head"), b.alias("word")),
    )
    return df.select(
        F.col(id_col), F.explode(pairs).alias("__bg")
    ).select(id_col, F.col("__bg.head").alias("head"), F.col("__bg.word").alias("word"))


def bigram_lm_score(
    df: DataFrame,
    colname: str = "text",
    id_col: str = "doc_id",
    k: float = 0.5,
) -> DataFrame:
    """Statistical LM quality score (CCNet-style filter, public method):
    train add-k-smoothed bigram counts on the corpus itself, then score
    each document by its mean log bigram probability —
    ``P(w|h) = (c(h,w)+k) / (c(h)+k*V)`` with V = distinct second-words.
    Low scores flag boilerplate/garbled text whose token transitions are
    rare in the corpus; high scores flag repetitive high-frequency text.

    Returns (id, n_bigrams, lm_score) — documents with <2 tokens drop out.

    Plan shape (rebuilt round 11 — `ab_round11_ops.py bigram`, 1.54x at
    sf0.1, static exchanges 6 -> 3 (+1 in the materialization job)): the
    aggregated bigram table ``c(h,w)`` is materialized ONCE via
    ``localCheckpoint`` — the "bigram relation persists once instead of
    being recomputed by each consumer" story this docstring always told,
    now actually executed (a 100 TB run writes it to a landing table
    instead) — and everything derives from it: V = countDistinct(word)
    over the aggregated table (a separate small action embedded as a
    literal, the ``txt_tfidf`` n_docs precedent); the head totals
    ``c(h)`` as ONE window sum over the SAME head partitioning that the
    old groupBy-then-join-back paid two exchanges for (sum of longs —
    exact in any order); and the scoring join co-partitions on the head
    SUBSET of its (h, w) key, so the window's partitioning is reused
    as-is and the raw bigram stream shuffles once on head. NOTE the
    eager edge: calling this function runs the materialization job
    immediately. Head keys are Zipfian — the head-only co-partitioning
    is skew-prone by construction, which AQE skew-join handles for the
    sort-merge case (same contract as before, where the (h, w) join
    carried the same Zipf mass).

    k=0.5 is exact in binary, so the smoothed ratio is bit-identical
    across engines; the mean-of-logs is rounded to 6 dp (the established
    cross-engine FP contract, same as tf-idf/cosine).
    """
    # r14: the raw bigram stream feeds BOTH the count aggregate and the
    # scoring join — checkpointing it stops the tokenize+explode chain
    # running twice (measured 1.10 → 0.94 s at sf0.1, bit-identical).
    # The materialization is batch-sized, the same class as the curation
    # pipeline's stage barriers; a 100 TB run lands this projection as a
    # table between the two jobs anyway.
    bg = doc_bigrams(df, colname, id_col).localCheckpoint(eager=False)
    cab = (
        bg.groupBy("head", "word")
        .agg(F.count(F.lit(1)).alias("__cab"))
        .localCheckpoint()
    )
    v = cab.agg(F.countDistinct("word")).collect()[0][0]
    w_head = Window.partitionBy("head").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    p = (
        cab.withColumn("__ca", F.sum("__cab").over(w_head))
        .withColumn(
            "__logp",
            F.log(
                (F.col("__cab") + F.lit(k))
                / (F.col("__ca") + F.lit(k) * F.lit(float(v)))
            ),
        )
        .select("head", "word", "__logp")
    )
    return (
        bg.repartition("head")
        .join(p, ["head", "word"])
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg("__logp"), 6).alias("lm_score"),
        )
    )


def curation_pipeline_full(
    docs: DataFrame,
    quality_cutoff: float = 0.5,
    neardup_threshold: float = 0.5,
    token_budget: int = 10000,
    decontam_overlap: int = 3,
) -> DataFrame:
    """The end-to-end curation dataflow as ONE composed plan — the
    nightly job a 100 TB training-data run executes (registry twin:
    ``txt_curation_pipeline_full``; scale measurement:
    ``tools/ab_curation_pipeline.py``). Stages, in order: quality filter
    (absolute cutoff) → exact dedup (keep-min-id per sha256) → MinHash
    near-dup keep (drop id_b per verified pair) → train/test
    decontamination (b=0 hash bucket held out; drop train docs sharing
    ≥ ``decontam_overlap`` word 4-grams with it) → per-source token
    budget (content-stable hash order) → 80/10/10 split assignment.
    Input: (doc_id, lang, source, text). Output: (doc_id, source, lang,
    n_tokens, cum_tokens, split). Six keyed exchanges total; every small
    side broadcast or distinct; nothing quadratic.

    The two ``localCheckpoint`` barriers pin the stages that feed TWO
    consumers each (post-exact-dedup feeds the minhash kernel and the
    keep-join; post-near-dup feeds the shingle explode and the final
    anti-join) — without them Spark re-executes quality+dedup+minhash
    per consumer (measured −30% wall at sf0.1; a 100 TB nightly would
    write these stage boundaries to storage anyway). The exploded
    shingle set is deliberately NOT checkpointed: materializing it costs
    more than recomputing the explode (measured +20%)."""
    from wms_data_pipeline_spark.operators import dedup as dd

    s1 = (
        quality_features(docs)
        .filter(F.col("quality_score") >= quality_cutoff)
        .select("doc_id", "lang", "source", "text")
    )
    s2 = dd.exact_dedup(s1, id_col="doc_id", colname="text").localCheckpoint()
    pairs = dd.minhash_neardup_pairs(
        s2.select("doc_id", "text"), threshold=neardup_threshold
    )
    drop = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    s3 = s2.join(drop, "doc_id", "left_anti")
    bucket10 = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("bigint")
        % 10
    )
    s3b = s3.withColumn("b", bucket10).localCheckpoint()
    sh = s3b.select("doc_id", "b", F.explode(dd.shingles_of("text", 4)).alias("g"))
    # r14: the txt_decontaminate_train r11 rebuild applied here too — the
    # overlap probe is a SEMI join against the raw holdout shingle stream
    # (semi never duplicates, so the test side needs no distinct
    # aggregate), and shingles_of is per-doc distinct, so count(*) ==
    # countDistinct(g) and the distinct-aggregate expand machinery drops
    # out. Same rows by construction; oracle-verified.
    test_g = sh.filter(F.col("b") == 0).select("g")
    bad = (
        sh.filter(F.col("b") != 0)
        .join(test_g, "g", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
        .filter(F.col("n_overlap") >= decontam_overlap)
        .select("doc_id")
    )
    s4 = s3b.filter(F.col("b") != 0).join(bad, "doc_id", "left_anti")
    t = s4.select(
        "doc_id", "source", "lang",
        F.regexp_count("text", F.lit(r"\S+")).cast("long").alias("n_tokens"),
        hex64(F.col("doc_id").cast("string")).alias("h"),
    )
    from pyspark.sql import Window as _W

    w = (
        _W.partitionBy("source")
        .orderBy("h", "doc_id")
        .rowsBetween(_W.unboundedPreceding, _W.currentRow)
    )
    s5 = t.withColumn("cum_tokens", F.sum("n_tokens").over(w)).filter(
        F.col("cum_tokens") <= token_budget
    )
    bucket100 = hex64(F.col("doc_id").cast("string")) % 100
    split = (
        F.when(bucket100 < 80, "train").when(bucket100 < 90, "valid").otherwise("test")
    )
    return s5.select(
        "doc_id", "source", "lang", "n_tokens", "cum_tokens", split.alias("split")
    )


#: Bloom-prefilter member cap: the member side must be collectable to the
#: driver (benchmark/eval sets are small by construction); beyond this the
#: right design is a partitioned exact semi-join, not a bigger bloom.
MAX_BLOOM_KEYS = 5_000_000


def _splitmix64_np(x):
    """Vectorized splitmix64 finalizer over a uint64 numpy array — the
    second hash of the Kirsch-Mitzenmacher double-hashing scheme."""
    import numpy as np

    x = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def bloom_semi_prefilter(
    df: DataFrame,
    colname: str,
    members: DataFrame,
    member_col: str,
    bits_per_key: int = 16,
    n_hashes: int = 4,
    max_keys: int = MAX_BLOOM_KEYS,
) -> DataFrame:
    """Approximate semi-join PREFILTER: returns the rows of ``df`` whose
    ``colname`` value MIGHT be in ``members[member_col]`` — a guaranteed
    superset of the exact semi-join (a Bloom filter has no false
    negatives), typically ~0.1% false positives at 16 bits/key, k=4.

    The 100 TB decontamination shape: the benchmark/eval shingle set is
    small (thousands of docs), the train side is the 100 TB corpus. An
    exact semi-join shuffles every train shingle on the join key; the
    bloom drops ~all non-matching shingles MAP-SIDE for the cost of a
    broadcast bitset (n*2 bytes), so only the tiny maybe-set reaches the
    shuffle. Callers MUST still confirm survivors with the exact join —
    compose prefilter -> exact semi-join for exact results at prefilter
    cost (this is what Spark's own runtime bloom-filter join does
    JVM-side; here it is explicit, sized by the caller, and reusable
    across jobs).

    Mechanics: keys are xxhash64 of the column (computed JVM-side on both
    sides), bit positions are h1 + i*h2 mod m with h2 = splitmix64(h1)|1
    (Kirsch-Mitzenmacher double hashing), the bitset is a broadcast
    uint64 word array probed in one vectorized Arrow batch per hash."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # one job: collect (capped) distinct hashes and guard on the row
    # count, the same limit+collect pattern as maxsim_topk — a separate
    # distinct().count() guard would run the member aggregation twice
    # (code-review r8)
    rows = (
        members.select(F.xxhash64(member_col).alias("h"))
        .distinct()
        .limit(max_keys + 1)
        .collect()
    )
    n = len(rows)
    if n > max_keys:
        raise ValueError(
            f"bloom_semi_prefilter: over {max_keys} distinct member keys "
            "(max_keys); the member side is no longer broadcast-sized — "
            "use an exact semi-join instead"
        )
    m_bits = 1 << max(10, int(n * bits_per_key - 1).bit_length())
    h1 = np.array([r.h for r in rows], dtype=np.int64).view(np.uint64)
    h2 = _splitmix64_np(h1) | np.uint64(1)
    words = np.zeros(m_bits // 64, dtype=np.uint64)
    for i in range(n_hashes):
        pos = (h1 + np.uint64(i) * h2) % np.uint64(m_bits)
        np.bitwise_or.at(words, (pos >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (pos & np.uint64(63)))
    bc = df.sparkSession.sparkContext.broadcast(words)
    mb = np.uint64(m_bits)
    k = n_hashes

    # annotations attached explicitly: this module uses
    # `from __future__ import annotations`, which stringifies inline hints
    # and breaks pandas_udf's signature introspection
    def _probe(h):
        w = bc.value
        hv = h.to_numpy().astype(np.int64).view(np.uint64)
        g2 = _splitmix64_np(hv) | np.uint64(1)
        ok = np.ones(len(hv), dtype=bool)
        for i in range(k):
            pos = (hv + np.uint64(i) * g2) % mb
            ok &= ((w[(pos >> np.uint64(6)).astype(np.int64)]
                    >> (pos & np.uint64(63))) & np.uint64(1)).astype(bool)
        return pd.Series(ok)

    _probe.__annotations__ = {"h": pd.Series, "return": pd.Series}
    _maybe_member = pandas_udf(_probe, "boolean")

    return (
        df.withColumn("_bloom_h", F.xxhash64(colname))
        .filter(_maybe_member(F.col("_bloom_h")))
        .drop("_bloom_h")
    )


def cms_heavy_keys(
    df: DataFrame,
    colname: str,
    threshold: int,
    width: int | None = None,
    depth: int = 4,
    max_cell_fill: float = 0.5,
) -> DataFrame:
    """Exact heavy hitters at prefilter cost: every ``colname`` value with
    EXACT multiplicity >= ``threshold``, found via a count-min sketch
    (Cormode & Muthukrishnan 2005, public method) PREFILTER + exact
    confirm — the same no-false-negative composition as
    ``bloom_semi_prefilter``: CMS only ever OVER-estimates, so filtering
    candidates at the sketch estimate loses no true heavy key, and the
    exact count over just the candidates removes collisions' false
    positives. Returns (colname, n), n = exact count.

    The 100 TB shape: a naive exact heavy-hitter pass shuffles EVERY
    distinct key (trillions of shingles); here the full-data aggregation
    is over (depth × width) sketch cells — map-side partials collapse to
    a width-bounded table regardless of input size — and the second pass
    scores each raw row via ``depth`` hash joins against that sketch
    (broadcast while it fits; see below), so only rows whose sketch row-min clears
    the threshold (a mass bounded by heavy keys + collision noise) ever
    reach the key shuffle of the exact confirm aggregation. All hashing
    is JVM-side (``xxhash64(depth_i, key)``). A saturation guard fails
    loudly when ≥ ``max_cell_fill`` of any depth's cells clear the
    threshold — there the prefilter passes ~everything and the sketch
    is too narrow for the corpus (raise ``width``).

    ``width=None`` auto-sizes to the next power of two above the
    DISTINCT-key estimate (one ``approx_count_distinct`` aggregate —
    NOT the row count, which over-sizes by the mean multiplicity),
    keeping MEAN distinct-keys-per-cell <= 1 — the regime where a cell
    clears threshold >= 2 only via a genuinely-heavy key or a
    Poisson-tail collision (~1.9% of cells at threshold 3, ~0.02^depth
    FP per key). A fixed width saturates as the corpus grows past
    width*threshold total occurrences; pass an explicit width only with
    a corpus-size estimate in hand (skewed corpora can shrink width by
    the heavy-mass ratio; the saturation guard makes a mis-sized
    sketch a loud error).

    Sketch transport: each depth's join slice is ``width`` (bucket,
    count) rows — broadcast only while width <= BROADCAST_MAX_WIDTH
    (2^21 cells ~ 32 MB serialized); wider sketches switch to shuffle
    hash joins automatically (4 extra data shuffles, still no
    distinct-key-sized state on any single node). Auto-sizing refuses
    to exceed MAX_AUTO_WIDTH (2^27 cells ~ 1 GB/depth as a join table;
    a billion DISTINCT keys would need a 2^30-cell slice = 8 GB/depth,
    32 GB at depth 4 — never a broadcast): above that, pass ``width``
    explicitly sized from your heavy-mass estimate."""
    # Three consumers read this stream (the width-sizing aggregate, the
    # sketch build, the scoring pass) — without the checkpoint each one
    # re-ran the caller's tokenize/shingle chain from the scan (r14,
    # measured 3.1 → 2.3 s on txt_cms_heavy_shingles at sf0.1). At
    # cluster scale this is the persisted stage boundary the nightly job
    # writes anyway; single-node localCheckpoint is its equivalent.
    ex = df.select(F.col(colname).alias("_k")).localCheckpoint(eager=False)
    if width is None:
        n_distinct = ex.agg(
            F.approx_count_distinct("_k").alias("d")
        ).collect()[0]["d"]
        width = 1 << max(12, int(n_distinct).bit_length())
        if width > MAX_AUTO_WIDTH:
            raise ValueError(
                f"cms_heavy_keys: auto width {width} (from ~{n_distinct} "
                f"distinct keys) exceeds MAX_AUTO_WIDTH={MAX_AUTO_WIDTH}; "
                "pass an explicit width sized from the heavy-mass ratio "
                "(heavy corpora need far fewer cells than distinct keys)"
            )
    buckets = [
        F.pmod(F.xxhash64(F.lit(d), F.col("_k")), F.lit(width)).alias(f"_b{d}")
        for d in range(depth)
    ]
    # one pass builds all depth rows: posexplode(array(bucket_d...)) then
    # count per (depth, bucket) — partial aggregation makes the shuffle
    # depth*width rows however large df is
    sketch = (
        ex.select(F.posexplode(F.array(*buckets)).alias("_d", "_b"))
        .groupBy("_d", "_b")
        .agg(F.count(F.lit(1)).alias("_c"))
        .localCheckpoint()
    )
    fill = (
        sketch.filter(F.col("_c") >= threshold)
        .groupBy("_d")
        .agg(F.count(F.lit(1)).alias("h"))
        .agg(F.min("h").alias("h"))
        .collect()[0]["h"]
    )
    if fill is not None and fill / width > max_cell_fill:
        raise ValueError(
            f"cms_heavy_keys: {fill}/{width} cells at the best depth meet "
            f"threshold={threshold} (> {max_cell_fill:.0%} saturation) — the "
            "prefilter would pass ~all keys; widen the sketch"
        )
    scored = ex.select("_k", *buckets)
    for d in range(depth):
        s_d = sketch.filter(F.col("_d") == d).select(
            F.col("_b").alias(f"_b{d}"), F.col("_c").alias(f"_c{d}")
        )
        if width <= BROADCAST_MAX_WIDTH:
            s_d = F.broadcast(s_d)
        scored = scored.join(s_d, f"_b{d}")
    est = F.least(*[F.col(f"_c{d}") for d in range(depth)])
    return (
        scored.filter(est >= threshold)
        .groupBy("_k")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= threshold)
        .select(F.col("_k").alias(colname), F.col("n").cast("long").alias("n"))
    )


def bpe_train(
    docs: DataFrame,
    colname: str = "text",
    num_merges: int = 10,
    checkpoint_every: int = 3,
):
    """Distributed BPE tokenizer training (Sennrich et al. 2016, public
    method) — learn ``num_merges`` byte-pair merges from a corpus.
    Returns (merges_df, vocab_df): merges = (rank, left, right, merged,
    pair_count) in learned order — THE artifact a tokenizer ships;
    vocab = the final (word, symbols, count) state.

    Distributed shape (how BPE actually trains at corpus scale): the
    corpus collapses ONCE to (distinct word, count) — merges operate on
    word TYPES weighted by frequency, so iteration cost scales with
    vocabulary (~1e6 types for 100 TB of text), not corpus size. Each
    round: one adjacent-pair explode + weighted count (shuffle on the
    pair key), a 1-row argmax collect (bounded control-plane, ties
    broken count-desc then lexicographic so training is deterministic),
    and one Arrow pass merging the winning pair leftmost-first,
    non-overlapping inside each word. State localCheckpoints every
    ``checkpoint_every`` rounds (same lineage rule as graph.pagerank).
    Words are lowercased [a-z]+ tokens with the </w> end marker."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    spark = docs.sparkSession
    words = (
        docs.select(F.explode(tokens_of(colname)).alias("w"))
        .select(F.lower("w").alias("w"))
        .filter(F.col("w").rlike("^[a-z]+$"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .select(
            F.concat(F.split("w", ""), F.array(F.lit("</w>"))).alias("syms"),
            "c",
        )
        .localCheckpoint()
    )
    merges = []
    for rank in range(num_merges):
        pairs = words.select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(syms) - 1), "
                    "i -> struct(syms[i-1] AS a, syms[i] AS b))"
                )
            ).alias("p"),
            "c",
        ).groupBy("p.a", "p.b").agg(F.sum("c").alias("n"))
        top = pairs.orderBy(F.col("n").desc(), "a", "b").limit(1).collect()
        if not top or top[0].n < 2:
            break
        a, b, n = top[0].a, top[0].b, int(top[0].n)
        merges.append((rank, a, b, a + b, n))

        def _merge_pair(batches, a=a, b=b):
            for pdf in batches:
                out = []
                for syms in pdf["syms"]:
                    s = list(syms)
                    j, m = 0, []
                    while j < len(s):
                        if j + 1 < len(s) and s[j] == a and s[j + 1] == b:
                            m.append(a + b)
                            j += 2
                        else:
                            m.append(s[j])
                            j += 1
                    out.append(m)
                pdf = pdf.copy()
                pdf["syms"] = out
                yield pdf

        words = words.mapInPandas(_merge_pair, schema="syms array<string>, c long")
        if (rank + 1) % checkpoint_every == 0:
            words = words.localCheckpoint()
    merges_df = spark.createDataFrame(
        merges, "rank long, left string, right string, merged string, pair_count long"
    )
    return merges_df, words


#: ``classifier_score(weights=...)`` holds the trained weight table in
#: every task's closure (the measured-fastest inference shape). At or
#: below this many vocabulary entries that is a dimension-table-sized
#: dict (~50 B/entry -> ~100 MB at the cap, the same size class Spark
#: broadcasts); above it a DataFrame-shaped vocabulary AUTO-DISPATCHES
#: to the explode + join scorer (``strategy="join"`` — needs ``id_col``),
#: which never materializes the table anywhere whole. Only a DICT larger
#: than the cap still fails loudly: it already lives in driver memory,
#: so the fix is upstream (keep the model as a DataFrame).
MAX_CLASSIFIER_VOCAB = 2_000_000

#: Measured closure-vs-join crossover for DataFrame vocabularies
#: (tools/ab_classifier_join.py, sf0.1 docs tiled 16x / 80k docs,
#: SCALE_NOTES r13): the join's cost is nearly FLAT in vocabulary size
#: (~1.5 s at 50k -> ~2.4 s at 2M — AQE broadcasts or shuffles a JVM
#: table) while the closure's grows linearly with the dict it collects,
#: pickles and ships per task (0.7 s at 50k -> 13 s at 2M); they cross
#: near 300k entries. Above this, ``strategy="auto"`` prefers the join
#: scorer whenever the caller supplied the ``id_col`` it needs.
CLASSIFIER_JOIN_DISPATCH = 250_000


def _check_weights_df(weights: DataFrame) -> None:
    cols = set(weights.columns)
    if not {"tok", "w"} <= cols:
        raise ValueError(
            f"weights DataFrame needs tok/w columns, has {sorted(cols)}"
        )


def _check_weights_unique(weights: DataFrame) -> None:
    """Reject duplicated ``tok`` keys LOUDLY (ADVICE r13): the closure
    scorer builds a dict (collect-order last-wins — nondeterministic) while
    the join scorer SUMS all rows per token, so a duplicated vocabulary
    silently changes ``wsum`` when ``strategy='auto'`` flips paths at the
    size thresholds. The bit-identical contract between the two scorers
    only holds for unique keys, so enforce it where the join path starts
    (one limit-1 aggregate probe — inference-setup cost, not per-row)."""
    dup = (
        weights.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("__cs_n"))
        .filter(F.col("__cs_n") > 1)
        .limit(1)
        .collect()
    )
    if dup:
        raise ValueError(
            "classifier weights DataFrame has duplicated tok keys (e.g. "
            f"{dup[0]['tok']!r} x{dup[0]['__cs_n']}); the closure and join "
            "scorers would disagree on it — pre-aggregate the vocabulary "
            "to one row per token"
        )


def _join_weight_sum(
    df: DataFrame, colname: str, weights: DataFrame, id_col: str
) -> DataFrame:
    """Per-document weight sums via explode + join — the UNBOUNDED-vocab
    inference shape (VERDICT r12 #3): tokenize, explode to one row per
    (doc, token), join the weight table on the token key, re-aggregate
    per document. Everything stays JVM-side and nothing ever holds the
    model whole — Spark plans the join by size (AQE broadcasts a small
    table, shuffles both sides by token for a multi-GB one), which is
    the point: the closure scorer's ceiling IS the model fitting every
    task, this path's ceiling is a shuffle. Measured (SCALE_NOTES r13):
    cost nearly FLAT in vocabulary size (~1.5 s at 50k -> ~2.4 s at 2M on
    the tiled sf0.1 corpus) where the closure grows linearly with the
    dict it ships per task — 2x slower at 50k, 5.4x FASTER at 2M, with
    the crossover near CLASSIFIER_JOIN_DISPATCH.

    Semantics are the closure scorer's exactly (bit-identical on integer
    weights, pinned in test_round13_ops): unseen tokens weigh 0, an
    empty/whitespace document sums to 0, a NULL document stays NULL.
    ``explode_outer`` keeps empty/NULL docs as a single NULL-token row;
    the text's own nullness (carried through the explode) tells the two
    apart. Requires ``id_col`` to be unique per row — the join-back key
    (a deterministic key beats a synthetic monotonically_increasing_id,
    whose stability across the self-join's two scans Spark does not
    promise after a shuffle).

    Returns ``df`` plus ``wsum`` (BIGINT for an integer weight column,
    DOUBLE otherwise)."""
    _check_weights_unique(weights)
    wtype = dict(weights.dtypes)["w"]
    integral = wtype in ("tinyint", "smallint", "int", "bigint")
    wtab = weights.select(
        F.col("tok").alias("__cs_tok"),
        F.col("w").cast("long" if integral else "double").alias("__cs_w"),
    )
    exploded = df.select(
        F.col(id_col).alias("__cs_id"),
        F.col(colname).isNull().alias("__cs_null"),
        F.explode_outer(tokens_of(colname)).alias("__cs_tok"),
    )
    sums = (
        exploded.join(wtab, "__cs_tok", "left")
        .groupBy("__cs_id")
        .agg(
            F.max("__cs_null").alias("__cs_null"),
            F.sum(
                F.coalesce(
                    F.col("__cs_w"),
                    F.lit(0).cast("long" if integral else "double"),
                )
            ).alias("__cs_sum"),
        )
        .select(
            "__cs_id",
            F.when(F.col("__cs_null"), F.lit(None))
            .otherwise(F.coalesce(F.col("__cs_sum"), F.lit(0)))
            .cast("long" if integral else "double")
            .alias("wsum"),
        )
    )
    return df.join(sums, df[id_col] == sums["__cs_id"], "left").drop("__cs_id")


def _closure_weight_sum(colname: str, weights: dict | DataFrame) -> Column:
    """Per-document weight-sum column for a trained vocabulary: an
    Arrow-batched pandas UDF whose task closure holds the ``{token:
    weight}`` dict (the measured-fastest inference shape — see
    ``classifier_score``). Tokenization matches ``tokens_of`` exactly:
    Java's ``\\S`` is ASCII-non-whitespace, so the Python side uses the
    explicit ASCII class rather than ``str.split()`` (which also splits
    on unicode whitespace). NULL text stays NULL — same as the fold's
    ``aggregate`` over a NULL array — so both paths are bit-identical
    on every input class."""
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    if isinstance(weights, DataFrame):
        _check_weights_df(weights)
        rows = weights.select("tok", "w").collect()
        wmap = {r["tok"]: r["w"] for r in rows}
        if len(wmap) != len(rows):
            # Free after the collect; mirrors _check_weights_unique so the
            # closure and join scorers agree (both raise) on duplicated
            # vocabularies instead of silently diverging (ADVICE r13).
            raise ValueError(
                f"classifier weights DataFrame has duplicated tok keys "
                f"({len(rows)} rows, {len(wmap)} distinct); pre-aggregate "
                "the vocabulary to one row per token"
            )
    elif isinstance(weights, dict):
        if len(weights) > MAX_CLASSIFIER_VOCAB:
            raise ValueError(
                f"classifier vocabulary {len(weights)} entries exceeds "
                f"MAX_CLASSIFIER_VOCAB={MAX_CLASSIFIER_VOCAB}; pass the "
                "model as a tok/w DataFrame so classifier_score can "
                "dispatch to the explode + join scorer"
            )
        wmap = dict(weights)
    else:
        raise TypeError(
            f"weights must be a dict or a DataFrame, got {type(weights)!r}"
        )
    integral = all(
        isinstance(v, int) and not isinstance(v, bool) for v in wmap.values()
    )

    def _wsum_series(texts):
        import re

        pat = re.compile(r"[^ \t\n\x0b\f\r]+")
        get = wmap.get

        def one(t):
            if t is None:
                return None
            s = 0
            for tok in pat.findall(t):
                s += get(tok, 0)
            return s

        return texts.map(one)

    # explicit Series->Series eval type: this module's
    # `from __future__ import annotations` stringifies type hints,
    # which Spark's hint-based inference rejects
    udf = pandas_udf(
        _wsum_series, "long" if integral else "double", PandasUDFType.SCALAR
    )
    return udf(F.col(colname))


def classifier_score(
    df: DataFrame,
    colname: str = "text",
    scale: float = 4.0,
    keep_threshold: float = 0.55,
    weights: dict | DataFrame | None = None,
    id_col: "str | None" = None,
    strategy: str = "auto",
) -> DataFrame:
    """Hashed linear text-classifier INFERENCE as a map-side fold — the
    fasttext-style quality filter shape (hash each token into a weight
    table, average the weights, squash through a sigmoid) that public
    LLM-corpus curation uses as its learned quality gate (a
    linear-model classifier over bag-of-words features; public method).

    The engine contribution is the execution shape, not the weights:
    per-token weight lookup + mean + sigmoid run entirely inside ONE
    whole-stage-codegen projection (``aggregate`` HOF over the token
    array — zero shuffles, zero Python). Weights here are derived
    from the cross-engine ``hex64`` hash (``w(t) = (hex64(t) % 1001 -
    500) / 1000`` — deterministic, oracle-reproducible).

    ``weights`` switches to the DEPLOYED shape: a trained weight table
    (``{token: weight}`` dict, or a DataFrame with ``tok``/``w``
    columns — collected driver-side under the loud
    ``MAX_CLASSIFIER_VOCAB`` cap) evaluated as an Arrow pandas UDF
    holding the table in the task closure. Measured fastest by 3.3x
    over this fold and 20x over explode + broadcast-join + re-agg
    (`ab_round10_ops.py classifier`, SCALE_NOTES r10): zero shuffles,
    C-speed dict lookups, ~46k docs/s on 32 local cores; the join form
    materializes a per-token row stream and pays a shuffle, and the
    md5 fold is crypto-hash-bound rather than transfer-bound. Unseen
    tokens weigh 0; weights use the same milliweight convention as the
    fold (integer values in roughly [-500, 500]; the logit is
    ``wsum * scale / (1000 * n_tokens)``), so deriving the weight for
    every token via ``hex64`` reproduces the fold bit-for-bit (pinned
    by test_round11_ops). All-integer weights keep ``wsum`` BIGINT
    and exact; float weights switch it to DOUBLE. Keep the
    hash-derived fold where weights must be engine-reproducible.

    Exactness: the fold accumulates the INTEGER weight sum (order-
    independent, exact in any engine), divides once into the logit
    ``wsum / (250 * n_tokens)`` (= mean weight in [-0.5, 0.5] times
    ``scale``=4), then rounds the sigmoid to 6 decimals — the only FP
    steps are the final division/exp, on bit-identical integer inputs.

    VOCABULARY DISPATCH (r13, VERDICT r12 #3): a DataFrame-shaped
    vocabulary above ``MAX_CLASSIFIER_VOCAB`` rows automatically takes
    the explode + join scorer (``_join_weight_sum`` — nothing holds the
    model whole; needs ``id_col``, unique per row, as the join-back
    key). ``strategy`` forces a path: ``"closure"`` / ``"join"`` /
    ``"auto"`` (size-based). Both scorers are bit-identical on integer
    weights (pinned in test_round13_ops).

    Returns the input plus ``n_tokens`` (INT), ``wsum`` (BIGINT),
    ``quality_score`` (sigmoid, rounded to 6), and ``keep``
    (score >= keep_threshold). Empty/whitespace-only documents score a
    neutral 0.5 (zero logit)."""
    if strategy not in ("auto", "closure", "join"):
        raise ValueError(f"classifier_score: unknown strategy {strategy!r}")
    toks = tokens_of(colname)
    n = F.size(toks)
    use_join = False
    if isinstance(weights, DataFrame):
        _check_weights_df(weights)
        if strategy == "join":
            use_join = True
        elif strategy == "auto":
            n_vocab = weights.count()
            # above the hard cap the closure is not an option; between the
            # measured crossover and the cap, prefer the join whenever the
            # caller gave it the key it needs (CLASSIFIER_JOIN_DISPATCH)
            use_join = n_vocab > MAX_CLASSIFIER_VOCAB or (
                n_vocab > CLASSIFIER_JOIN_DISPATCH and id_col is not None
            )
    elif strategy == "join":
        raise ValueError(
            "classifier_score: strategy='join' needs a tok/w DataFrame "
            f"vocabulary, got {type(weights)!r}"
        )
    if use_join:
        if id_col is None:
            raise ValueError(
                "classifier_score: the explode + join scorer needs "
                "id_col= (a column unique per row) to re-attach "
                "per-document weight sums"
            )
        base = _join_weight_sum(df, colname, weights, id_col)
    elif weights is not None:
        base = df.withColumn("wsum", _closure_weight_sum(colname, weights))
    else:
        base = df.withColumn(
            "wsum",
            F.aggregate(
                toks,
                F.lit(0).cast("long"),
                lambda acc, t: acc + (hex64(t) % 1001 - 500),
            ),
        )
    denom = 1000.0 / scale  # 250 at the default scale
    logit = F.when(n > 0, F.col("wsum") / (n * F.lit(denom))).otherwise(
        F.lit(0.0)
    )
    score = F.round(
        F.lit(1.0) / (F.lit(1.0) + F.exp(-logit)), 6
    )
    return (
        base.withColumn("n_tokens", n)
        .withColumn("quality_score", score)
        .withColumn("keep", F.col("quality_score") >= F.lit(keep_threshold))
        .select(*df.columns, "n_tokens", "wsum", "quality_score", "keep")
    )


#: ``bpe_encode`` holds the learned merge list in every task's closure
#: (the classifier_score(weights=) shape). Real tokenizers ship <=50k
#: merges (~1 MB as tuples); above this something is wrong upstream —
#: fail loudly rather than ship a giant closure.
MAX_BPE_MERGES = 100_000


def bpe_encode(
    df: DataFrame,
    merges,
    colname: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply learned BPE merges to a corpus — the other half of the
    tokenizer loop (``bpe_train`` learns the merges; this ENCODES with
    them, the operation every token-budget/packing/cost step of a
    training-data pipeline actually runs). ``merges`` is the trainer's
    merges DataFrame (rank, left, right[, merged, pair_count]) or an
    equivalent list of (left, right) pairs in rank order.

    Per whitespace token (lowercased — the trainer's normalization, so
    its merges apply): symbols = characters + '</w>', then each merge
    in RANK ORDER rewrites every adjacent (left, right) pair — the
    standard greedy BPE application (Sennrich et al. 2016, public
    method). Returns the input plus ``n_bpe_tokens`` (BIGINT): the
    total symbol count, the number a token-budget sampler or packer
    feeds on. Runs as one Arrow-batched pandas UDF with the merge list
    in the task closure (zero shuffles, capped by MAX_BPE_MERGES);
    cost is O(doc_len x applicable merges) — the scoring pass of a
    nightly pipeline, not a per-query hot path. Pinned against a pure-
    Python reference encoder in tests; ``bpe_token_estimate`` stays the
    cheap chars/4 proxy for when no trained merges exist."""
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    if isinstance(merges, DataFrame):
        cols = set(merges.columns)
        if not {"rank", "left", "right"} <= cols:
            raise ValueError(
                f"merges DataFrame needs rank/left/right columns, has {sorted(cols)}"
            )
        pairs = [
            (r["left"], r["right"])
            for r in merges.orderBy("rank").collect()
        ]
    else:
        pairs = [(left, right) for left, right in merges]
    if len(pairs) > MAX_BPE_MERGES:
        raise ValueError(
            f"bpe_encode: {len(pairs)} merges exceeds "
            f"MAX_BPE_MERGES={MAX_BPE_MERGES}"
        )

    def _count_series(texts):
        import re

        pat = re.compile(r"[^ \t\n\x0b\f\r]+")

        def encode_word(word):
            syms = list(word) + ["</w>"]
            for left, right in pairs:
                if len(syms) < 2:
                    break
                j, out = 0, []
                merged = left + right
                while j < len(syms):
                    if (
                        j + 1 < len(syms)
                        and syms[j] == left
                        and syms[j + 1] == right
                    ):
                        out.append(merged)
                        j += 2
                    else:
                        out.append(syms[j])
                        j += 1
                syms = out
            return len(syms)

        def one(t):
            if t is None:
                return None
            return sum(encode_word(w.lower()) for w in pat.findall(t))

        return texts.map(one)

    udf = pandas_udf(_count_series, "long", PandasUDFType.SCALAR)
    return df.withColumn("n_bpe_tokens", udf(F.col(colname)))
