"""A/B the txt_corpus_curation feature stage (VERDICT r4 ask #1): the
current quality_features (2× regexp_extract_all tokenization + interpreted
higher-order ``filter`` for stopwords + 2× regexp_replace string builds) vs
a fused ``regexp_count`` form (4 counting scans, no intermediate strings or
arrays, no HOF).  Counts are integers, so a fused form that matches the
HOF counts exactly yields bit-identical scores and an unchanged oracle.

Also prints a stage decomposition of the full headliner (features-only →
+filter → +fingerprint-window → +agg) so a floor, if any, is attributable.

Usage: python tools/ab_curation.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from wms_data_pipeline_spark.operators import text as txt
from wms_data_pipeline_spark.session import get_spark


def quality_features_hof(df, colname: str = "text"):
    """The pre-round-5 form, kept here as the A/B baseline: tokenizing
    twice with regexp_extract_all, counting punct/digits by deleting the
    complement class and measuring the leftover string, and counting
    stopwords with an interpreted higher-order ``filter`` lambda."""
    tokens = F.regexp_extract_all(F.col(colname), F.lit(r"\S+"), F.lit(0))
    arr = F.array(*[F.lit(s) for s in txt.LANG_STOPWORDS["en"]])
    n_chars = F.length(F.col(colname))
    n_tok = F.size(tokens)
    punct = F.length(F.regexp_replace(F.col(colname), r"[^.,;:!?'\"()\[\]{}-]", ""))
    digits = F.length(F.regexp_replace(F.col(colname), r"[^0-9]", ""))
    stop = F.size(F.filter(tokens, lambda t: F.array_contains(arr, t)))
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


def quality_features_counted(df, colname: str = "text"):
    """Fused candidate: every feature as one regexp_count scan.

    Equivalences to the HOF form (same integer counts → same score bits):
    - n_tokens: count of ``\\S+`` matches == size(regexp_extract_all).
    - punct/digits: count chars in the class == length after deleting the
      complement class.
    - stopwords: pad with spaces and count ``\\s(word)(?=\\s)`` — every
      token is preceded by its own whitespace char in the padded string and
      the lookahead doesn't consume, so consecutive stopword tokens all
      match; a token merely containing a stopword ("a,") fails the
      lookahead exactly like the array-equality test.
    """
    stop_alt = "|".join(txt.LANG_STOPWORDS["en"])
    n_chars = F.length(F.col(colname))
    n_tok = F.regexp_count(F.col(colname), F.lit(r"\S+"))
    punct = F.regexp_count(F.col(colname), F.lit("[.,;:!?'\"()\\[\\]{}-]"))
    digits = F.regexp_count(F.col(colname), F.lit("[0-9]"))
    stop = F.regexp_count(
        F.concat(F.lit(" "), F.col(colname), F.lit(" ")),
        F.lit(rf"\s({stop_alt})(?=\s)"),
    )
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


def curation(docs, features, dedup="window"):
    scored = features(docs).filter(F.col("quality_score") >= 0.5)
    fp = txt.fingerprint(scored)
    if dedup == "window":
        w = Window.partitionBy("fingerprint").orderBy("doc_id")
        curated = fp.withColumn("__rn", F.row_number().over(w)).filter(
            F.col("__rn") == 1
        )
    else:
        # algebraic twin: keep-min-doc_id per fingerprint as a struct-min
        # aggregate — partial-aggregates map-side (the window form ships
        # every row to its fingerprint's reducer and sorts there)
        curated = fp.groupBy("fingerprint").agg(
            F.min(F.struct("doc_id", "lang", "n_tokens")).alias("__w")
        ).select("__w.lang", "__w.n_tokens")
    return curated.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
    )


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def _time(fn, runs=5):
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main(sf_dir: str = "/root/testdata/sf0.1") -> None:
    spark = get_spark("ab-curation")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(0, 10_000_000, 1, 32).selectExpr("sum(id)").collect()  # warm JVM
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "lang", "text")
        .repartition(spark.sparkContext.defaultParallelism)
        .localCheckpoint()  # both variants read identical input partitions
    )

    # exactness gate first: the fused counts must reproduce the HOF features
    hof = quality_features_hof(docs).select(
        "doc_id", "n_tokens", "punct_ratio", "digit_ratio",
        "stopword_ratio", "quality_score",
    )
    fused = quality_features_counted(docs).select(
        "doc_id", "n_tokens", "punct_ratio", "digit_ratio",
        "stopword_ratio", "quality_score",
    )
    n_diff = hof.exceptAll(fused).count() + fused.exceptAll(hof).count()
    print(f"feature equivalence: {n_diff} differing rows (must be 0)", flush=True)
    assert n_diff == 0

    # A/B, alternating in one warm session
    variants = {
        "hof  +window (pre-r5)": (quality_features_hof, "window"),
        "fused+window": (quality_features_counted, "window"),
        "hof  +structmin": (quality_features_hof, "agg"),
        "fused+structmin (prod)": (txt.quality_features, "agg"),
    }
    base = None
    for name, (fn, dd) in variants.items():  # warm + result equivalence
        rows = sorted(map(tuple, curation(docs, fn, dd).collect()))
        if base is None:
            base = rows
        assert rows == base, f"{name} result differs"
    for name, (fn, dd) in variants.items():
        t_feat = _time(lambda f=fn: _noop(f(docs)))
        t_full = _time(lambda f=fn, d=dd: _noop(curation(docs, f, d)))
        print(f"{name:24s}: features {t_feat:.3f}s   full query {t_full:.3f}s",
              flush=True)

    # stage decomposition of the full headliner (production form)
    feats = txt.quality_features(docs)
    scored = feats.filter(F.col("quality_score") >= 0.5)
    fp = txt.fingerprint(scored)
    w = Window.partitionBy("fingerprint").orderBy("doc_id")
    curated = fp.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1)
    stages = {
        "scan only": docs,
        "+features": feats,
        "+filter+fingerprint": fp,
        "+dedup window": curated,
        "+group agg": curated.groupBy("lang").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
        ),
    }
    for name, df in stages.items():
        t = _time(lambda d=df: _noop(d), runs=3)
        print(f"stage {name:20s}: {t:.3f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1")
