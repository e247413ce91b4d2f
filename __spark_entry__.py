"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``wms_data_pipeline_spark``; this module only adapts
the registry (wms_data_pipeline_spark/plans/queries.py) to the contract.
"""

from __future__ import annotations

import glob
import json
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from wms_data_pipeline_spark.plans.queries import REGISTRY

SF0001 = "/root/testdata/sf0.001"


def _driver_verified() -> set[str]:
    """Names that already have a green row in a prior CORRECTNESS_r{N}.json.

    The driver verifies only the first 50 entries of ``queries()`` per round,
    so we rotate: queries without a hard driver-verified pass are listed
    first, pushing already-green ones behind the 50-entry window.  A query
    counts as verified only on a full hash match (or a rows-only pass for
    the no-oracle approximate ops).

    Two staleness guards (round-3 lesson: "verified once" is not "verified
    forever" — the testdata encoding can change under a green query):

    - CORRECTNESS rounds are applied in order; a later round's error row
      OVERRIDES an earlier green, so a driver-observed re-break re-enters
      the window.
    - Names whose most recent local full-parity run (tools/parity.py →
      PARITY_LAST.json) FAILED are dropped from the verified set even if
      some past round was green — parity is re-run per round against the
      current testdata, so it sees breaks the driver's window rotation hides.
    """
    verified: set[str] = set()
    here = os.path.dirname(os.path.abspath(__file__))
    try:
        for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
            with open(path) as f:
                rows = json.load(f)
            for name, r in rows.items():
                if not isinstance(r, dict):
                    continue
                if r.get("hash_match") is True:
                    verified.add(name)
                elif r.get("err") == "no_oracle" and r.get("spark_rows") is not None:
                    # A rows-only check is the best possible outcome only for
                    # queries that (still) have no oracle; if the query has
                    # since gained an oracle, let it re-enter the window.
                    spec = REGISTRY.get(name)
                    if spec is not None and spec.oracle is None:
                        verified.add(name)
                else:
                    # Checked this round and NOT green: a stale pass from an
                    # earlier round must not keep it behind the window.
                    verified.discard(name)
        parity_path = os.path.join(here, "PARITY_LAST.json")
        if os.path.exists(parity_path):
            with open(parity_path) as f:
                parity = json.load(f).get("results", {})
            verified -= {n for n, status in parity.items() if status != "pass"}
    except Exception:
        return set()
    return verified


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY §7.1 step 2): events → incremental watermark
    filter → keyed keep-last dedup → newer-wins latest state per user — the
    reference's semantic heart as one Spark plan."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return REGISTRY["wm_latest_state"].fn(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Ordered so driver-unverified queries come first (the driver's
    CORRECTNESS window covers the first 50 entries only).
    """
    verified = _driver_verified()
    unverified = {n: s.fn for n, s in REGISTRY.items() if n not in verified}
    rest = {n: s.fn for n, s in REGISTRY.items() if n in verified}
    return {**unverified, **rest}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; keys without an oracle (genuinely
    non-SQL-expressible ops, e.g. LSH candidate generation) are omitted and
    get the driver's weaker rows-only check."""
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}
