"""Explicit schema contracts.

The reference infers schemas from JSON and applies convention-based typing
(reference: services/extractor/app/normalize.py:11-18, 43). The new engine
declares explicit StructTypes for the typed path (derived from the mock API's
pydantic models, reference: services/mock_wms_api/app/main.py:49-114) and
keeps the suffix-convention normalizer (operators/normalize.py) for
schema-drift tolerance.

Also declares the driver testdata schemas (FIXTURES.md §7) and a loader.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DateType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# --------------------------------------------------------------------------
# Entity schemas (API rows, pre-normalize: every time field is an ISO string;
# reference main.py:49-78 for IB, main.py:81-114 for OB).
# --------------------------------------------------------------------------

IB_LINE = StructType(
    [
        StructField("line_id", StringType()),
        StructField("product_id", LongType()),
        StructField("sku", StringType()),
        StructField("qty_unit_id", LongType()),
        StructField("expected_qty", LongType()),
        StructField("actual_qty", LongType()),
    ]
)

IB_RECEIPTS_RAW = StructType(
    [
        StructField("id", StringType(), nullable=False),
        StructField("po_code", StringType()),
        StructField("po_date", StringType()),
        StructField("status", StringType()),
        StructField("note", StringType()),
        StructField("processed_by", StringType()),
        StructField("contact_name", StringType()),
        StructField("contact_phone", StringType()),
        StructField("client_id", LongType()),
        StructField("warehouse_id", LongType()),
        StructField("created_by", StringType()),
        StructField("created_at", StringType()),
        StructField("updated_by", StringType()),
        StructField("updated_at", StringType(), nullable=False),
        StructField("finished_at", StringType()),
        StructField("lines", ArrayType(IB_LINE)),
    ]
)

OB_LINE = StructType(
    [
        StructField("line_id", StringType()),
        StructField("product_id", LongType()),
        StructField("sku", StringType()),
        StructField("qty", LongType()),
    ]
)

OB_ORDERS_RAW = StructType(
    [
        StructField("id", StringType(), nullable=False),
        StructField("so_code", StringType()),
        StructField("expected_delivery_date", StringType()),
        StructField("actual_delivery_date", StringType()),
        StructField("customer_id", LongType()),
        StructField("shipping_address_id", LongType()),
        StructField("total_amount", DoubleType()),
        StructField("actual_amount", DoubleType()),
        StructField("note", StringType()),
        StructField("client_id", LongType()),
        StructField("warehouse_id", LongType()),
        StructField("status", StringType()),
        StructField("total_cod_amount", DoubleType()),
        StructField("total_weight", DoubleType()),
        StructField("total_volume", DoubleType()),
        StructField("created_by", StringType()),
        StructField("created_at", StringType()),
        StructField("updated_by", StringType()),
        StructField("updated_at", StringType(), nullable=False),
        StructField("lines", ArrayType(OB_LINE)),
    ]
)

ENTITY_RAW_SCHEMAS: dict[str, StructType] = {
    "ib_receipts": IB_RECEIPTS_RAW,
    "ob_orders": OB_ORDERS_RAW,
}

# Status machines (reference main.py:185-207) — useful for the CDC generator.
IB_STATUS_FLOW = ["NEW", "PROCESSING", "FINISHED"]
OB_STATUS_FLOW = ["NEW", "READYTOPICK", "PICKING", "PICKED", "PACKING", "PACKED"]
TERMINAL_CANCELLED = "CANCELLED"

# --------------------------------------------------------------------------
# Driver testdata tables (FIXTURES.md §7) — TPC-H-ish star schema.
# --------------------------------------------------------------------------

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

TESTDATA_SCHEMAS: dict[str, StructType] = {
    "region": StructType(
        [StructField("r_regionkey", IntegerType()), StructField("r_name", StringType())]
    ),
    "nation": StructType(
        [
            StructField("n_nationkey", IntegerType()),
            StructField("n_name", StringType()),
            StructField("n_regionkey", IntegerType()),
        ]
    ),
    "customer": StructType(
        [
            StructField("c_custkey", LongType()),
            StructField("c_name", StringType()),
            StructField("c_nationkey", IntegerType()),
            StructField("c_acctbal", DoubleType()),
            StructField("c_mktsegment", StringType()),
        ]
    ),
    "supplier": StructType(
        [
            StructField("s_suppkey", LongType()),
            StructField("s_name", StringType()),
            StructField("s_nationkey", IntegerType()),
            StructField("s_acctbal", DoubleType()),
        ]
    ),
    "part": StructType(
        [
            StructField("p_partkey", LongType()),
            StructField("p_name", StringType()),
            StructField("p_brand", StringType()),
            StructField("p_type", StringType()),
            StructField("p_size", IntegerType()),
            StructField("p_retailprice", DoubleType()),
        ]
    ),
    "orders": StructType(
        [
            StructField("o_orderkey", LongType()),
            StructField("o_custkey", LongType()),
            StructField("o_orderstatus", StringType()),
            StructField("o_totalprice", DoubleType()),
            StructField("o_orderdate", TimestampType()),
            StructField("o_orderpriority", StringType()),
        ]
    ),
    "lineitem": StructType(
        [
            StructField("l_orderkey", LongType()),
            StructField("l_partkey", LongType()),
            StructField("l_suppkey", LongType()),
            StructField("l_linenumber", IntegerType()),
            StructField("l_quantity", DoubleType()),
            StructField("l_extendedprice", DoubleType()),
            StructField("l_discount", DoubleType()),
            StructField("l_tax", DoubleType()),
            StructField("l_returnflag", StringType()),
            StructField("l_linestatus", StringType()),
            StructField("l_shipdate", TimestampType()),
        ]
    ),
    "events": StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("props", StringType()),
        ]
    ),
    "documents": StructType(
        [
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
            StructField("lang", StringType()),
            StructField("source", StringType()),
            StructField("n_chars", LongType()),
        ]
    ),
    "embeddings": StructType(
        [
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(FloatType())),
            StructField("label", IntegerType()),
        ]
    ),
}


def table_rows_hint(sf_dir: str, name: str) -> int | None:
    """Driver-side parquet footer row count — no Spark job, no data read.

    Used by CPU-bound map stages to decide whether fanning a small scan out
    across cores is worth a dedicated exchange: under AQE every
    ``repartition`` materializes as its own query stage, a measured
    ~0.45 s of pure scheduling floor on local[32] (SCALE_NOTES, round 5),
    so below a few thousand rows the serialized map work is CHEAPER than
    the stage it would take to parallelize it.

    Local filesystem paths only (single file or a directory of part
    files). Returns None for anything it can't probe — remote URIs,
    missing files — and callers must treat None as "unknown: take the
    conservative branch" (i.e. repartition; correct at scale, where the
    probe being impossible usually means the input is big anyway).
    """
    import glob
    import os

    path = os.path.join(sf_dir, f"{name}.parquet")
    try:
        import pyarrow.parquet as pq

        if os.path.isdir(path):
            parts = glob.glob(os.path.join(path, "*.parquet"))
            if not parts:
                return None
            return sum(pq.ParquetFile(p).metadata.num_rows for p in parts)
        return pq.ParquetFile(path).metadata.num_rows
    except Exception:
        return None


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver testdata table. Plain parquet scan — Catalyst handles
    column pruning / predicate pushdown from whatever the caller selects.

    events.parquet has shipped with several timestamp physical encodings
    across testdata generations; normalize them all to a session-UTC
    ``timestamp`` at this single boundary (the Spark twin of the reference's
    UTC-normalize-at-every-layer discipline, SURVEY §7.3 item 5):

    - TIMESTAMP(NANOS): the Spark parquet reader rejects it outright; the
      legacy nanosAsLong conf surfaces it as a long we truncate to
      microseconds (matching DuckDB's own nanos→micros read).
    - TIMESTAMP(isAdjustedToUTC=false) (the pandas/arrow default): read as
      ``timestamp_ntz``; under the engine's pinned UTC session timezone a
      plain cast is value-preserving (same micros, now tz-aware), so every
      downstream ``unix_micros`` keeps working.
    """
    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # integer div, not /: double division rounds the 19-digit nanos
            # value and lands one microsecond off.
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(path)
