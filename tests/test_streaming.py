"""Structured Streaming tests: file-source micro-batches → foreachBatch
merge sinks; tumbling/session windows with watermark."""

import json
import os
from datetime import datetime

from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from wms_data_pipeline_spark.operators.merge import ParquetTable
from wms_data_pipeline_spark.streaming.pipeline import (
    incremental_merge_stream,
    session_counts,
    tumbling_counts,
)

UPDATES_SCHEMA = StructType(
    [
        StructField("id", StringType()),
        StructField("updated_at", TimestampType()),
        StructField("status", StringType()),
    ]
)

EVENTS_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("ts", TimestampType()),
    ]
)


def _write_batch(spark, src_dir, rows, schema, name):
    """The file stream source monitors a flat directory — land each
    micro-batch as one parquet FILE (write to a scratch dir, move the part
    file in), not a nested directory."""
    import glob
    import shutil

    scratch = os.path.join(src_dir, "..", f"_scratch_{name}")
    df = spark.createDataFrame(rows, schema)
    df.coalesce(1).write.mode("overwrite").parquet(scratch)
    part = glob.glob(os.path.join(scratch, "part-*.parquet"))[0]
    shutil.move(part, os.path.join(src_dir, f"{name}.parquet"))
    shutil.rmtree(scratch, ignore_errors=True)


def test_incremental_merge_stream_newer_wins(spark, tmp_path):
    src = str(tmp_path / "src")
    wh = str(tmp_path / "wh")
    os.makedirs(src)
    t1, t2 = datetime(2026, 1, 1, 10), datetime(2026, 1, 1, 11)

    # micro-batch 1: two entities
    _write_batch(spark, src, [("a", t1, "NEW"), ("b", t1, "NEW")], UPDATES_SCHEMA, "b1")
    stream = spark.readStream.schema(UPDATES_SCHEMA).parquet(src)
    q = incremental_merge_stream(stream, wh, "orders", str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    # micro-batch 2: newer update for a, stale (older) update for b, redelivery of a@t1
    _write_batch(
        spark, src,
        [("a", t2, "PROCESSING"), ("b", datetime(2026, 1, 1, 9), "STALE"), ("a", t1, "NEW")],
        UPDATES_SCHEMA, "b2",
    )
    stream = spark.readStream.schema(UPDATES_SCHEMA).parquet(src)
    q = incremental_merge_stream(stream, wh, "orders", str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    latest = {r["id"]: r["status"] for r in ParquetTable(spark, f"{wh}/stg_orders").read().collect()}
    assert latest == {"a": "PROCESSING", "b": "NEW"}  # newer wins, stale rejected
    hist = ParquetTable(spark, f"{wh}/stg_orders_history").read()
    assert hist.count() == 4  # a@t1, b@t1, a@t2, b@t9stale — redelivered a@t1 collapsed


def test_stream_static_enrichment(spark, tmp_path):
    """Stream-static join: each micro-batch enriched against a dimension
    table (broadcast per batch, no stream state)."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    dim = spark.createDataFrame(
        [("a", "warehouse-east"), ("b", "warehouse-west")], "id string, site string"
    )
    _write_batch(
        spark, src,
        [("a", datetime(2026, 1, 1, 10), "NEW"), ("c", datetime(2026, 1, 1, 11), "NEW")],
        UPDATES_SCHEMA, "b1",
    )
    stream = spark.readStream.schema(UPDATES_SCHEMA).parquet(src)
    enriched = stream.join(dim, "id", "left_outer").select("id", "status", "site")
    q = (
        enriched.writeStream.format("memory").queryName("enrich_t")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {r["id"]: r["site"] for r in spark.sql("SELECT * FROM enrich_t").collect()}
    assert got == {"a": "warehouse-east", "c": None}


def test_tumbling_counts(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    rows = [
        (1, datetime(2026, 1, 1, 10, 1)),
        (1, datetime(2026, 1, 1, 10, 5)),
        (2, datetime(2026, 1, 1, 10, 12)),
    ]
    _write_batch(spark, src, rows, EVENTS_SCHEMA, "b1")
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(src)
    agg = tumbling_counts(stream, window="10 minutes", keys=["user_id"])
    q = (
        agg.writeStream.format("memory").queryName("tumbling_t")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"], r["user_id"]): r["n"]
        for r in spark.sql("SELECT * FROM tumbling_t").collect()
    }
    assert got == {
        (datetime(2026, 1, 1, 10, 0), 1): 2,
        (datetime(2026, 1, 1, 10, 10), 2): 1,
    }


def test_dedup_stream_drops_cross_batch_redelivery(spark, tmp_path):
    from wms_data_pipeline_spark.streaming.pipeline import dedup_stream

    src = str(tmp_path / "src")
    os.makedirs(src)
    t1, t2 = datetime(2026, 1, 1, 10), datetime(2026, 1, 1, 10, 1)
    _write_batch(spark, src, [("a", t1, "NEW")], UPDATES_SCHEMA, "b1")
    stream = spark.readStream.schema(UPDATES_SCHEMA).parquet(src)
    deduped = dedup_stream(stream, keys=["id", "updated_at"], ts_col="updated_at")
    q = (
        deduped.writeStream.format("memory").queryName("dedup_t")
        .outputMode("append").option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: redelivery of a@t1 (dropped by state) + fresh b@t2
        _write_batch(spark, src, [("a", t1, "NEW"), ("b", t2, "NEW")],
                     UPDATES_SCHEMA, "b2")
        q.processAllAvailable()
        got = sorted((r["id"],) for r in spark.sql("SELECT id FROM dedup_t").collect())
        assert got == [("a",), ("b",)]  # exactly once each
    finally:
        q.stop()


def test_dedup_within_watermark_collapses_jittered_redelivery(spark, tmp_path):
    """dropDuplicatesWithinWatermark: a redelivered key whose timestamp
    JITTERED between deliveries still collapses (dropDuplicates on
    [id, ts] would emit both copies)."""
    from wms_data_pipeline_spark.streaming.pipeline import (
        dedup_stream_within_watermark,
    )

    src = str(tmp_path / "src")
    os.makedirs(src)
    t1 = datetime(2026, 1, 1, 10)
    t1_jitter = datetime(2026, 1, 1, 10, 0, 30)  # retry re-stamped +30 s
    t2 = datetime(2026, 1, 1, 10, 1)
    _write_batch(spark, src, [("a", t1, "NEW")], UPDATES_SCHEMA, "b1")
    stream = spark.readStream.schema(UPDATES_SCHEMA).parquet(src)
    deduped = dedup_stream_within_watermark(
        stream, keys=["id"], ts_col="updated_at", delay="10 minutes"
    )
    q = (
        deduped.writeStream.format("memory").queryName("dedup_wm_t")
        .outputMode("append").option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
        _write_batch(spark, src, [("a", t1_jitter, "NEW"), ("b", t2, "NEW")],
                     UPDATES_SCHEMA, "b2")
        q.processAllAvailable()
        got = sorted(
            (r["id"], r["updated_at"])
            for r in spark.sql("SELECT id, updated_at FROM dedup_wm_t").collect()
        )
        # first arrival of 'a' wins; the jittered redelivery is dropped
        assert got == [("a", t1), ("b", t2)]
    finally:
        q.stop()


def test_incremental_merge_stream_into_jdbc_warehouse(spark, tmp_path):
    """Streaming CDC landing straight in the JDBC warehouse: foreachBatch
    drives the same JdbcMergeSink merges — newer-wins across micro-batches,
    history dedup on redelivery."""
    from wms_data_pipeline_spark.sources.jdbc import JdbcMergeSink

    src = str(tmp_path / "src")
    os.makedirs(src)
    url = f"jdbc:derby:{tmp_path}/wh_db;create=true"
    history = JdbcMergeSink(spark, url, "s_hist", batchsize=100)
    latest = JdbcMergeSink(spark, url, "s_latest", batchsize=100)
    t1, t2 = datetime(2026, 1, 1, 10), datetime(2026, 1, 1, 11)
    _write_batch(spark, src, [("a", t1, "NEW"), ("b", t1, "NEW")],
                 UPDATES_SCHEMA, "b1")
    stream = spark.readStream.schema(UPDATES_SCHEMA).parquet(src)
    q = incremental_merge_stream(
        stream, str(tmp_path / "unused"), "s", str(tmp_path / "ck"),
        history=history, latest=latest,
    )
    q.awaitTermination()
    # batch 2: redelivery of a@t1 + newer a@t2 (availableNow → restart)
    _write_batch(spark, src, [("a", t1, "NEW"), ("a", t2, "DONE")],
                 UPDATES_SCHEMA, "b2")
    q2 = incremental_merge_stream(
        stream, str(tmp_path / "unused"), "s", str(tmp_path / "ck"),
        history=history, latest=latest,
    )
    q2.awaitTermination()
    lat = {r["id"]: r["status"] for r in latest.read().collect()}
    assert lat == {"a": "DONE", "b": "NEW"}
    # history: a@t1, b@t1, a@t2 — the redelivered a@t1 collapsed
    assert history.read().count() == 3


def test_streaming_runlog_metrics(spark, tmp_path):
    from wms_data_pipeline_spark.streaming.metrics import (
        RunLogListener,
        with_runlog_metrics,
    )

    src = str(tmp_path / "src")
    os.makedirs(src)
    t1, t2 = datetime(2026, 1, 1, 10), datetime(2026, 1, 1, 11)
    _write_batch(spark, src, [("a", t1, "NEW"), ("b", t2, "NEW")], UPDATES_SCHEMA, "b1")
    listener = RunLogListener()
    spark.streams.addListener(listener)
    try:
        stream = spark.readStream.schema(UPDATES_SCHEMA).parquet(src)
        observed = with_runlog_metrics(stream, ts_col="updated_at")
        q = (
            observed.writeStream.format("noop")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .start()
        )
        q.processAllAvailable()
        # listener events arrive on a background thread — poll briefly
        import time as _time

        deadline = _time.time() + 30
        while _time.time() < deadline and not listener.records:
            _time.sleep(0.25)
        q.stop()
        assert any(
            r.get("rows_in") == 2 and r.get("max_event_time") == t2
            for r in listener.records
        ), listener.records
    finally:
        spark.streams.removeListener(listener)


def test_sliding_counts_stream(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    rows = [(1, datetime(2026, 1, 1, 10, 7))]  # lands in 10:00 and 10:05 windows
    _write_batch(spark, src, rows, EVENTS_SCHEMA, "b1")
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(src)
    agg = (
        stream.withWatermark("ts", "1 minute")
        .groupBy(F.window("ts", "10 minutes", "5 minutes"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("window.start").alias("ws"), "n")
    )
    q = (
        agg.writeStream.format("memory").queryName("sliding_t")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = sorted((r["ws"], r["n"]) for r in spark.sql("SELECT * FROM sliding_t").collect())
    assert got == [
        (datetime(2026, 1, 1, 10, 0), 1),
        (datetime(2026, 1, 1, 10, 5), 1),
    ]


def test_stream_stream_join(spark, tmp_path):
    from wms_data_pipeline_spark.streaming.pipeline import stream_stream_join

    lsrc, rsrc = str(tmp_path / "l"), str(tmp_path / "r")
    os.makedirs(lsrc), os.makedirs(rsrc)
    L = StructType([StructField("user_id", LongType()), StructField("l_ts", TimestampType())])
    R = StructType(
        [StructField("user_id", LongType()), StructField("r_ts", TimestampType()),
         StructField("tag", StringType())]
    )
    _write_batch(spark, lsrc, [(1, datetime(2026, 1, 1, 10, 0))], L, "b1")
    _write_batch(
        spark, rsrc,
        [
            (1, datetime(2026, 1, 1, 10, 5), "in-window"),
            (1, datetime(2026, 1, 1, 10, 30), "too-late"),
            (2, datetime(2026, 1, 1, 10, 2), "wrong-key"),
        ],
        R, "b1",
    )
    joined = stream_stream_join(
        spark.readStream.schema(L).parquet(lsrc),
        spark.readStream.schema(R).parquet(rsrc),
        key="user_id", left_ts="l_ts", right_ts="r_ts", within="10 minutes",
    )
    q = (
        joined.writeStream.format("memory").queryName("ssj_t")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM ssj_t").collect()
    assert [(r["user_id"], r["tag"]) for r in rows] == [(1, "in-window")]


def test_session_counts(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    rows = [
        (1, datetime(2026, 1, 1, 10, 0)),
        (1, datetime(2026, 1, 1, 10, 10)),  # same session (gap < 30m)
        (1, datetime(2026, 1, 1, 12, 0)),   # new session
    ]
    _write_batch(spark, src, rows, EVENTS_SCHEMA, "b1")
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(src)
    agg = session_counts(stream, gap="30 minutes")
    q = (
        agg.writeStream.format("memory").queryName("session_t")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r["session_start"], r["n_events"])
        for r in spark.sql("SELECT * FROM session_t").collect()
    )
    assert got == [
        (datetime(2026, 1, 1, 10, 0), 2),
        (datetime(2026, 1, 1, 12, 0), 1),
    ]


def test_neardup_ingest_stream_dedups_across_batches(spark, tmp_path):
    """Dedup-on-ingest: batch 1 is probed against the corpus index; batch 2
    must ALSO be probed against batch 1 (the foreachBatch appends each
    batch's signatures), so a batch-2 doc duplicating a batch-1 doc is
    flagged even though neither is in the original corpus."""
    from wms_data_pipeline_spark.operators import dedup as dd
    from wms_data_pipeline_spark.streaming.pipeline import neardup_ingest_stream

    base = "the quick brown fox jumps over the lazy dog again and again today"
    corpus = spark.createDataFrame(
        [(100 + i, f"{base} corpus variant {i} with extra tokens {i * 7}")
         for i in range(10)],
        "doc_id long, text string",
    )
    index = "file://" + str(tmp_path / "ndidx")
    dd.neardup_index_write(corpus, index)

    src = str(tmp_path / "incoming")
    batch1 = [(1, f"{base} corpus variant 3 with extra tokens 21"),  # dup of 103
              (2, "novel text about warehouse inventory tracking systems")]
    batch2 = [(3, f"{base} corpus variant 3 with extra tokens 21"),  # dup of 103 AND 1
              (4, "novel text about warehouse inventory tracking systems")]  # dup of 2
    spark.createDataFrame(batch1, "doc_id long, text string").coalesce(1) \
        .write.mode("append").parquet(src)
    stream = spark.readStream.schema("doc_id long, text string") \
        .option("maxFilesPerTrigger", "1").parquet(src)
    pairs_out = str(tmp_path / "pairs")
    ckpt = str(tmp_path / "ckpt")
    q = neardup_ingest_stream(stream, index, pairs_out, ckpt)
    q.awaitTermination(120)

    spark.createDataFrame(batch2, "doc_id long, text string").coalesce(1) \
        .write.mode("append").parquet(src)
    stream = spark.readStream.schema("doc_id long, text string") \
        .option("maxFilesPerTrigger", "1").parquet(src)
    q = neardup_ingest_stream(stream, index, pairs_out, ckpt)
    q.awaitTermination(120)

    got = {(r.id_a, r.id_b) for r in spark.read.parquet(pairs_out).collect()}
    assert (1, 103) in got, "batch-1 vs corpus pair missed"
    assert (1, 3) in got, "batch-2 vs batch-1 pair missed (append not visible)"
    assert (3, 103) in got, "batch-2 vs corpus pair missed"
    assert (2, 4) in got, "batch-2 vs batch-1 novel-doc dup missed"
    # batch attribution recorded for replay audits:
    bids = {r.batch_id for r in spark.read.parquet(pairs_out).collect()}
    assert bids == {0, 1}


def test_neardup_ingest_replay_emits_no_self_pairs(spark, tmp_path):
    """At-least-once replay: if a batch crashes AFTER its index append
    but before the checkpoint commits, the replayed probe sees the
    batch's own ids in the index — it must not emit (x, x) self-pairs,
    and the legitimate pairs must be re-emitted identically (idempotent
    downstream by key)."""
    from wms_data_pipeline_spark.operators import dedup as dd

    base = "the quick brown fox jumps over the lazy dog again and again today"
    corpus = spark.createDataFrame(
        [(100 + i, f"{base} corpus variant {i} with extra tokens {i * 7}")
         for i in range(8)],
        "doc_id long, text string",
    )
    index = "file://" + str(tmp_path / "ndidx")
    dd.neardup_index_write(corpus, index)
    batch = spark.createDataFrame(
        [(1, f"{base} corpus variant 2 with extra tokens 14")],  # dup of 102
        "doc_id long, text string",
    )
    first = {(r.id_a, r.id_b) for r in
             dd.neardup_incremental(spark, batch, index).collect()}
    assert (1, 102) in first
    # simulate the crash-after-append: the index now contains the batch
    dd.neardup_index_append(batch, index)
    replay = {(r.id_a, r.id_b) for r in
              dd.neardup_incremental(spark, batch, index).collect()}
    assert all(a != b for a, b in replay), f"self-pairs leaked: {replay}"
    assert first <= replay  # original pairs re-emitted (keyed-idempotent)


TYPED_EVENTS_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("ts", TimestampType()),
    ]
)


def test_trending_stream_ranks_closed_windows(spark, tmp_path):
    """trending_stream must emit the top-k per CLOSED window only: a
    first pass whose watermark has passed window A emits A's ranked
    top-3; the still-open window B emits nothing until later data (or
    stream end under availableNow) closes it."""
    from wms_data_pipeline_spark.streaming.pipeline import trending_stream

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    os.makedirs(src)
    h10 = datetime(2026, 1, 1, 10)
    rows = (
        [("view", datetime(2026, 1, 1, 10, m)) for m in (1, 2, 3, 4)]
        + [("click", datetime(2026, 1, 1, 10, 5)), ("click", datetime(2026, 1, 1, 10, 6))]
        + [("purchase", datetime(2026, 1, 1, 10, 7))]
        + [("refund", datetime(2026, 1, 1, 10, 8))]
        # closes the 10:00 window (watermark = 11:30 - 2 min > 11:00)
        + [("view", datetime(2026, 1, 1, 11, 30))]
    )
    _write_batch(spark, src, rows, TYPED_EVENTS_SCHEMA, "b1")
    stream = spark.readStream.schema(TYPED_EVENTS_SCHEMA).parquet(src)
    q = trending_stream(
        stream, out, str(tmp_path / "ck"), ts_col="ts", key="event_type",
        window="1 hour", delay="2 minutes", k=3,
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"], r["rank"]): (r["event_type"], r["n"])
        for r in spark.read.parquet(out).collect()
    }
    # 10:00 window closed: view(4) > click(2) > purchase(1)=refund(1),
    # tie broken alphabetically -> purchase
    assert got[(h10, 1)] == ("view", 4)
    assert got[(h10, 2)] == ("click", 2)
    assert got[(h10, 3)] == ("purchase", 1)
    # the 11:00 window stayed open through the first trigger; under
    # availableNow the final trigger may or may not flush it depending on
    # engine version — only the CLOSED window's ranks are contractual
    assert all(ws == h10 for ws, _ in got), got


DOCS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
    ]
)


def test_curation_ingest_stream_accepts_only_novel_quality_docs(spark, tmp_path):
    """curation_ingest_stream: quality rejects land nowhere, duplicates of
    the corpus or of earlier batches are dropped, and only novel quality
    survivors are accepted AND appended to the index — so a later batch
    dedups against an earlier one."""
    from wms_data_pipeline_spark.operators import dedup as dd
    from wms_data_pipeline_spark.streaming.pipeline import curation_ingest_stream

    base = ("the quick brown fox jumps over the lazy dog and then naps in "
            "the warm afternoon sun while birds sing of spring")
    corpus = spark.createDataFrame(
        [(1000 + i, f"{base} corpus variant {i} extra tokens {i * 3}")
         for i in range(6)],
        DOCS_SCHEMA,
    )
    idx = "file://" + str(tmp_path / "ndidx")
    dd.neardup_index_write(corpus, idx)

    src = str(tmp_path / "src")
    out = str(tmp_path / "accepted")
    os.makedirs(src)
    rows_b1 = [
        (1, f"{base} a genuinely new document about warehouse robotics"),
        (2, f"{base} corpus variant 2 extra tokens 6"),   # dup of corpus 1002
        (3, "!!! ??? ... ,,, ;;; :::"),                   # quality reject
    ]
    _write_batch(spark, src, rows_b1, DOCS_SCHEMA, "b1")
    stream = spark.readStream.schema(DOCS_SCHEMA).parquet(src)
    q = curation_ingest_stream(stream, idx, out, str(tmp_path / "ck1"))
    q.awaitTermination(120)

    accepted = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert accepted == {1}, accepted

    # batch 2 repeats batch 1's accepted doc → must be dropped against
    # the index batch 1 just appended to
    rows_b2 = [
        (10, f"{base} a genuinely new document about warehouse robotics"),
        (11, f"{base} another fresh doc on conveyor maintenance schedules"),
    ]
    _write_batch(spark, src, rows_b2, DOCS_SCHEMA, "b2")
    stream2 = spark.readStream.schema(DOCS_SCHEMA).parquet(src)
    q2 = curation_ingest_stream(stream2, idx, out, str(tmp_path / "ck1"))
    q2.awaitTermination(120)

    accepted = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert accepted == {1, 11}, accepted


def test_curation_ingest_stream_replay_converges(spark, tmp_path):
    """Code-review r7: a replayed batch's docs match only their own
    filtered self-pairs in the index, so without the index-membership
    guard they would be re-accepted and re-appended. A fresh checkpoint
    over the same source (the replay in the limit) must accept nothing
    new."""
    from wms_data_pipeline_spark.operators import dedup as dd
    from wms_data_pipeline_spark.streaming.pipeline import curation_ingest_stream

    base = ("the quick brown fox jumps over the lazy dog and then naps in "
            "the warm afternoon sun while birds sing of spring")
    corpus = spark.createDataFrame(
        [(1000 + i, f"{base} corpus variant {i} extra tokens {i * 3}")
         for i in range(6)],
        DOCS_SCHEMA,
    )
    idx = "file://" + str(tmp_path / "ndidx")
    dd.neardup_index_write(corpus, idx)
    src = str(tmp_path / "src")
    out = str(tmp_path / "accepted")
    os.makedirs(src)
    # genuinely novel: shares NO shingles with the corpus (a base-prefixed
    # text would be a true near-dup at jaccard ~0.6 and rightly rejected)
    novel_text = (
        "the forklift battery rotation schedule is posted in the charging "
        "room and every operator signs the log before swapping a unit onto "
        "the rack for its weekly maintenance check"
    )
    _write_batch(spark, src, [(50, novel_text)], DOCS_SCHEMA, "b1")
    s1 = spark.readStream.schema(DOCS_SCHEMA).parquet(src)
    curation_ingest_stream(s1, idx, out, str(tmp_path / "ck1")).awaitTermination(120)
    first = [(r.doc_id, r.batch_id) for r in spark.read.parquet(out).collect()]
    assert {d for d, _ in first} == {50}

    # replay: new checkpoint, same files — everything is redelivered
    s2 = spark.readStream.schema(DOCS_SCHEMA).parquet(src)
    curation_ingest_stream(s2, idx, out, str(tmp_path / "ck2")).awaitTermination(120)
    after = [(r.doc_id, r.batch_id) for r in spark.read.parquet(out).collect()]
    assert after == first, f"replay double-landed rows: {after}"


def test_streaming_quality_audit_rows(spark, tmp_path):
    """Verdict r10 task 6: the foreachBatch merge leg also appends
    per-batch quality-audit rows (expectations + PSI drift probe against
    a persisted reference histogram) to a control table — pinned across
    two incremental CDC batches, with retry idempotence."""
    from pyspark.sql.types import DoubleType

    from wms_data_pipeline_spark.control.audit import (
        QualityAuditLog,
        audit_batch,
    )
    from wms_data_pipeline_spark.operators.quality import psi_reference_write

    schema = StructType(
        [
            StructField("id", StringType()),
            StructField("updated_at", TimestampType()),
            StructField("status", StringType()),
            StructField("value", DoubleType()),
        ]
    )
    src = str(tmp_path / "src")
    wh = str(tmp_path / "wh")
    ref_path = str(tmp_path / "psi_ref")
    os.makedirs(src)
    # frozen reference: status NEW values 0..19, PROCESSING values 100..119
    ref = spark.createDataFrame(
        [("NEW", float(v)) for v in range(20)]
        + [("PROCESSING", float(100 + v)) for v in range(20)],
        "status string, value double",
    )
    psi_reference_write(ref, "status", "value", ref_path)
    expectations = {"id_not_null": F.col("id").isNotNull()}
    drift = ("status", "value", ref_path)

    t1, t2 = datetime(2026, 1, 1, 10), datetime(2026, 1, 1, 11)
    # batch 0: one NULL id (1 violation), NEW values inside the range
    _write_batch(
        spark, src,
        [("a", t1, "NEW", 5.0), (None, t1, "NEW", 7.0)],
        schema, "b1",
    )
    stream = spark.readStream.schema(schema).parquet(src)
    q = incremental_merge_stream(
        stream, wh, "orders", str(tmp_path / "ckpt"),
        expectations=expectations, drift=drift,
    )
    q.awaitTermination(120)

    # batch 1: clean ids, values far above the frozen range (edge-bin
    # mass; 4 rows so the add-one smoothing doesn't cap PSI below the
    # conventional 0.25 "shifted" band)
    batch1_rows = [
        ("c", t2, "NEW", 900.0),
        ("d", t2, "NEW", 950.0),
        ("e", t2, "NEW", 910.0),
        ("f", t2, "NEW", 960.0),
    ]
    _write_batch(spark, src, batch1_rows, schema, "b2")
    stream = spark.readStream.schema(schema).parquet(src)
    q = incremental_merge_stream(
        stream, wh, "orders", str(tmp_path / "ckpt"),
        expectations=expectations, drift=drift,
    )
    q.awaitTermination(120)

    log = QualityAuditLog(spark, f"{wh}/quality_audit")
    rows = {
        (r["batch_id"], r["kind"], r["key"], r["metric"]): r
        for r in log.read().collect()
    }
    # expectations: batch 0 delivered one NULL id, batch 1 was clean
    v0 = rows[(0, "expectation", "id_not_null", "n_violations")]
    assert v0["value"] == 1.0 and v0["n_rows"] == 2
    v1 = rows[(1, "expectation", "id_not_null", "n_violations")]
    assert v1["value"] == 0.0 and v1["n_rows"] == 4
    # drift: both batches audited every store group (NEW and PROCESSING);
    # batch 1's out-of-range mass clamps into the edge bin -> high PSI
    p0 = rows[(0, "psi_drift", "NEW", "psi")]
    p1 = rows[(1, "psi_drift", "NEW", "psi")]
    assert p0["n_rows"] == 2 and p1["n_rows"] == 4
    assert p1["value"] > p0["value"] and p1["value"] > 0.25
    assert (0, "psi_drift", "PROCESSING", "psi") in rows  # zero-batch group
    assert rows[(0, "psi_drift", "PROCESSING", "psi")]["n_rows"] == 0
    # retry idempotence: re-appending batch 1's audit rows collapses
    batch1 = spark.createDataFrame(batch1_rows, schema)
    n_before = log.read().count()
    inserted = log.append(audit_batch(batch1, 1, "orders", expectations, drift))
    assert inserted == 0 and log.read().count() == n_before
