"""Canonical payload + row hash (SURVEY §2.1 ops 15-18).

Reference contract (services/staging/app/payload.py:14-26): payload = all
columns NOT starting with ``_``, serialized as canonical JSON (sorted keys,
compact separators, non-ASCII preserved), hashed with SHA-256 hex.

Canonical-JSON contract of THIS engine (SURVEY §7.3 hard part 1):
- keys sorted alphabetically (struct built with sorted field names — Spark's
  ``to_json`` preserves struct field order, so sorting the fields IS the
  sort_keys);
- compact separators (Spark default emits no spaces);
- nulls KEPT as JSON null (``ignoreNullFields=false``) — the reference's
  evident intent; note the reference's ``_normalize_for_json`` has a missing
  fall-through ``return v`` (payload.py:5-11) that nulls every scalar — a
  defect we implement around, not reproduce;
- timestamps rendered ISO-8601 UTC with microseconds and ``+00:00`` offset
  (``yyyy-MM-dd'T'HH:mm:ss.SSSSSSxxx``), dates as ``yyyy-MM-dd``;
- non-ASCII passes through unescaped (Spark default, matches
  ``ensure_ascii=False``).

Everything stays inside whole-stage codegen (``to_json`` + ``sha2`` are JVM
expressions) — this replaces the reference's row-at-a-time pandas
``df.apply`` (payload.py:19), its single hottest loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from wms_data_pipeline_spark.operators.normalize import META_PREFIX

TIMESTAMP_JSON_FORMAT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSxxx"
DATE_JSON_FORMAT = "yyyy-MM-dd"

JSON_OPTIONS = {
    "timestampFormat": TIMESTAMP_JSON_FORMAT,
    "dateFormat": DATE_JSON_FORMAT,
    "ignoreNullFields": "false",
}


def payload_columns(df: DataFrame, meta_prefix: str = META_PREFIX) -> list[str]:
    """Op 15: the payload projection — every column not metadata-prefixed
    (reference payload.py:14)."""
    return [c for c in df.columns if not c.startswith(meta_prefix)]


def canonical_json(df: DataFrame, cols: list[str] | None = None) -> Column:
    """Op 17: canonical JSON serialization of the payload projection."""
    cols = sorted(cols if cols is not None else payload_columns(df))
    return F.to_json(F.struct(*[F.col(c) for c in cols]), JSON_OPTIONS)


def with_payload_and_hash(
    df: DataFrame,
    payload_col: str = "payload",
    hash_col: str = "payload_hash",
) -> DataFrame:
    """Ops 16-18: append ``payload`` (canonical JSON string) and
    ``payload_hash`` (SHA-256 hex of the UTF-8 payload, same recipe as
    reference payload.py:23-26 — ``sha2(col, 256)`` yields identical hex)."""
    return df.withColumn(payload_col, canonical_json(df)).withColumn(
        hash_col, F.sha2(F.col(payload_col), 256)
    )
