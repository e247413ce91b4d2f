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


def _driver_verified(here: str | None = None) -> set[str]:
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
    - Names that FAILED a local full-parity run (tools/parity.py →
      PARITY_LAST.json) while driver round N was the latest are dropped
      unless a round NEWER than N has a green row for them — a local
      re-fix passing parity is necessary but NOT sufficient; the driver
      must re-certify a query that is known to have broken after its last
      driver green. This is what rotates silently-re-broken-then-fixed
      names back into the driver's 50-entry window.
    """
    verified: set[str] = set()
    green_round: dict[str, int] = {}
    if here is None:
        here = os.path.dirname(os.path.abspath(__file__))
    try:
        import re

        # sort by PARSED round number, not path string: lexicographic order
        # breaks later-round-overrides-earlier the day a round number is
        # unpadded or reaches 3 digits (r100 sorts before r02)
        paths = [
            (int(m.group(1)) if (m := re.search(r"CORRECTNESS_r(\d+)", p)) else 0, p)
            for p in glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))
        ]
        for rnd, path in sorted(paths):
            with open(path) as f:
                rows = json.load(f)
            for name, r in rows.items():
                if not isinstance(r, dict):
                    continue
                if r.get("hash_match") is True:
                    verified.add(name)
                    green_round[name] = max(rnd, green_round.get(name, 0))
                elif r.get("err") == "no_oracle" and r.get("spark_rows") is not None:
                    # A rows-only check is the best possible outcome only for
                    # queries that (still) have no oracle; if the query has
                    # since gained an oracle, let it re-enter the window.
                    spec = REGISTRY.get(name)
                    if spec is not None and spec.oracle is None:
                        verified.add(name)
                        green_round[name] = max(rnd, green_round.get(name, 0))
                else:
                    # Checked this round and NOT green: a stale pass from an
                    # earlier round must not keep it behind the window.
                    verified.discard(name)
        parity_path = os.path.join(here, "PARITY_LAST.json")
        if os.path.exists(parity_path):
            with open(parity_path) as f:
                parity = json.load(f)
            verified -= {
                n for n, status in parity.get("results", {}).items() if status != "pass"
            }
            verified -= {
                n
                for n, fail_rnd in parity.get("last_fail_round", {}).items()
                if fail_rnd >= green_round.get(n, 0)
            }
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
