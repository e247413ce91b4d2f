"""Arrow-batched Python escape hatches (UDTF / grouped applyInPandas).

Engine policy: built-in JVM expressions for everything expressible (see
operators/text.py — zero Python in those paths); these are the sanctioned
escape hatches for logic Spark genuinely can't express, with Arrow batching
so cost is per-batch, not per-row:

- ``split_sentences`` — a Python UDTF (table function): one document row →
  N sentence rows. The lateral-join shape for text segmentation,
  tokenizer-in-Python, or any 1→N expansion with Python logic.
- ``per_key_stats`` — grouped ``applyInPandas``: whole-group pandas
  computation (inter-arrival gaps here; sessionization variants, per-user
  sequence models, sklearn-per-group all ride this shape). One shuffle on
  the key; each group processed as a single pandas frame.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

try:  # pyspark 3.5+/4.x
    from pyspark.sql.functions import udtf

    HAS_UDTF = True
except ImportError:  # pragma: no cover
    HAS_UDTF = False


if HAS_UDTF:

    @udtf(returnType="doc_id: bigint, sentence_idx: int, sentence: string")
    class SplitSentences:
        """UDTF: naive sentence segmentation (splits on .!? followed by
        whitespace); swap the body for a real segmenter without touching
        the query shape."""

        def eval(self, doc_id: int, text: str):
            import re

            if text is None:
                return
            parts = [s.strip() for s in re.split(r"(?<=[.!?])\s+", text) if s.strip()]
            for i, s in enumerate(parts):
                yield doc_id, i, s


def split_sentences(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Apply the UDTF laterally to every row of ``df`` (SQL LATERAL —
    the table-function join shape)."""
    if not HAS_UDTF:  # pragma: no cover
        raise NotImplementedError("pyspark UDTF support not available")
    spark = df.sparkSession
    spark.udtf.register("split_sentences_udtf", SplitSentences)
    df.createOrReplaceTempView("__split_sentences_in")
    return spark.sql(
        f"SELECT s.doc_id, s.sentence_idx, s.sentence "
        f"FROM __split_sentences_in, "
        f"LATERAL split_sentences_udtf({id_col}, {text_col}) s"
    )


PER_KEY_STATS_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("mean_gap_s", DoubleType()),
        StructField("max_gap_s", DoubleType()),
        StructField("first_type", StringType()),
    ]
)


def per_key_stats(df: DataFrame, key: str = "user_id", ts_col: str = "ts") -> DataFrame:
    """Grouped applyInPandas: per-key inter-arrival statistics."""

    def _stats(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col)
        gaps = pdf[ts_col].diff().dt.total_seconds().dropna()
        return pd.DataFrame(
            [
                {
                    "user_id": pdf[key].iloc[0],
                    "n_events": len(pdf),
                    "mean_gap_s": float(gaps.mean()) if len(gaps) else None,
                    "max_gap_s": float(gaps.max()) if len(gaps) else None,
                    "first_type": pdf.sort_values(ts_col)["event_type"].iloc[0]
                    if "event_type" in pdf
                    else None,
                }
            ]
        )

    return df.groupBy(key).applyInPandas(_stats, PER_KEY_STATS_SCHEMA)
