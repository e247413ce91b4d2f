"""Tests for the widened query batch: SimHash near-dup banding exactness,
PII redaction completeness, embedding centroids, and grouping-sets shape."""

import math

import pytest
from pyspark.sql import functions as F

from wms_data_pipeline_spark.operators import dedup as dd
from wms_data_pipeline_spark.plans.queries import _EMAIL_RE, _PHONE_RE


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_simhash_band_blocking_is_exact(spark):
    """4x4-bit banding over a 16-bit simhash must recover EVERY pair at
    hamming <= 3 (pigeonhole: <=3 flipped bits leave >=1 band intact)."""
    texts = [" ".join(f"w{(i * 7 + j) % 23}" for j in range(12)) for i in range(40)]
    sh = (
        _docs(spark, texts)
        .select("doc_id", dd.simhash_col("text", 16).alias("simhash"))
        .collect()
    )
    sigs = {r["doc_id"]: r["simhash"] for r in sh}
    brute = set()
    for a in sigs:
        for b in sigs:
            if a < b and bin(sigs[a] ^ sigs[b]).count("1") <= 3:
                brute.add((a, b))

    def bands(s):
        return {(j, (s >> (4 * j)) & 15) for j in range(4)}

    banded = {
        (a, b)
        for (a, b) in brute
        if bands(sigs[a]) & bands(sigs[b])
    }
    # every brute-force pair is reachable through at least one shared band
    assert banded == brute


def test_pii_redaction_removes_all_matches(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at alice.smith+x@corp.example.org today"),
            (2, "call +1-555-0199 or write bob@ex.io"),
            (3, "no pii here"),
        ],
        "doc_id long, t string",
    )
    red = df.select(
        "doc_id",
        F.regexp_replace(
            F.regexp_replace(F.col("t"), _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
        ).alias("redacted"),
    )
    got = {r["doc_id"]: r["redacted"] for r in red.collect()}
    assert got[1] == "mail me at <EMAIL> today"
    assert got[2] == "call <PHONE> or write <EMAIL>"
    assert got[3] == "no pii here"
    assert "@" not in got[1] and "@" not in got[2]


def test_label_centroid_matches_manual_mean(spark):
    rows = [
        (1, [1.0, 2.0], 7),
        (2, [3.0, 4.0], 7),
        (3, [10.0, 20.0], 8),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = (
        df.select("label", F.posexplode("embedding").alias("pos", "val"))
        .groupBy("label", "pos")
        .agg(F.avg("val").alias("centroid"))
        .collect()
    )
    got = {(r["label"], r["pos"]): r["centroid"] for r in out}
    assert math.isclose(got[(7, 0)], 2.0)
    assert math.isclose(got[(7, 1)], 3.0)
    assert math.isclose(got[(8, 0)], 10.0)


def test_grouping_sets_superaggregate_rows(spark):
    df = spark.createDataFrame(
        [("A", "x", 1.0), ("A", "y", 2.0), ("B", "x", 3.0)], "s string, p string, v double"
    )
    df.createOrReplaceTempView("__t_gs")
    rows = spark.sql(
        "SELECT s, p, CAST(grouping_id() AS BIGINT) AS gid, count(*) AS n "
        "FROM __t_gs GROUP BY GROUPING SETS ((s), (p), ())"
    ).collect()
    by_gid = {}
    for r in rows:
        by_gid.setdefault(r["gid"], []).append(r)
    # (s) sets aggregate away p -> gid 1; (p) -> gid 2; grand total -> gid 3
    assert {r["s"] for r in by_gid[1]} == {"A", "B"}
    assert {r["p"] for r in by_gid[2]} == {"x", "y"}
    assert by_gid[3][0]["n"] == 3
