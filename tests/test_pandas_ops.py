from datetime import datetime

import pytest

from wms_data_pipeline_spark.operators import pandas_ops as po


@pytest.mark.skipif(not po.HAS_UDTF, reason="no UDTF support")
def test_udtf_split_sentences(spark):
    df = spark.createDataFrame(
        [(0, "First one. Second! Third?"), (1, "Only sentence"), (2, None)],
        "doc_id long, text string",
    )
    out = po.split_sentences(df).collect()
    got = {(r["doc_id"], r["sentence_idx"]): r["sentence"] for r in out}
    assert got == {
        (0, 0): "First one.",
        (0, 1): "Second!",
        (0, 2): "Third?",
        (1, 0): "Only sentence",
    }  # null text expands to zero rows


def test_per_key_stats_grouped_pandas(spark):
    rows = [
        (1, datetime(2026, 1, 1, 10, 0), "signup"),
        (1, datetime(2026, 1, 1, 10, 1), "click"),
        (1, datetime(2026, 1, 1, 10, 4), "purchase"),
        (2, datetime(2026, 1, 1, 9, 0), "click"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    out = {r["user_id"]: r for r in po.per_key_stats(df).collect()}
    assert out[1]["n_events"] == 3
    assert out[1]["mean_gap_s"] == 120.0  # gaps 60s, 180s
    assert out[1]["max_gap_s"] == 180.0
    assert out[1]["first_type"] == "signup"
    assert out[2]["n_events"] == 1 and out[2]["mean_gap_s"] is None
