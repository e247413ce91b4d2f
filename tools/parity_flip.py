"""Force every size-dispatch down its OTHER path and re-run the DuckDB
oracle gate (VERDICT r13 #1, second half): at sf0.1 the engine's
size-adaptive operators all naturally pick their small-side strategy
(local union-find, local graph iteration, broadcast drop list, closure
classifier), so the ordinary parity run never oracle-checks the scale
path. This tool flips each dispatch via its module constant (or wraps the
call to supply what the alternate path needs) and re-compares the affected
registry queries value-for-value against the SAME oracles — the oracle is
dispatch-blind, so both paths must hash-match it.

Flips:
- graph auto -> DISTRIBUTED: MAX_LOCAL_GRAPH_EDGES = 0
  (pagerank / personalized / bfs_hops / shortest_paths iterate as
  DataFrame joins instead of the driver-local numpy loop)
- neardup components -> DISTRIBUTED min-label: driver_threshold = -1
- exact-dedup drop list -> NO broadcast hint: MAX_BROADCAST_DROP_IDS = 0
  (AQE picks the join strategy from runtime sizes)
- weighted classifier -> explode+JOIN scorer: CLASSIFIER_JOIN_DISPATCH = 0
  with id_col supplied (the registry call uses the closure path)

Usage: python tools/parity_flip.py [sf_dir]   (writes PARITY_FLIP.json)
"""

from __future__ import annotations

import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from parity import check_query, make_duck  # noqa: E402

from wms_data_pipeline_spark.operators import dedup as dd  # noqa: E402
from wms_data_pipeline_spark.operators import graph as gr  # noqa: E402
from wms_data_pipeline_spark.operators import text as txt  # noqa: E402
from wms_data_pipeline_spark.session import get_spark  # noqa: E402


def _flip_graph():
    old = gr.MAX_LOCAL_GRAPH_EDGES
    gr.MAX_LOCAL_GRAPH_EDGES = 0
    return lambda: setattr(gr, "MAX_LOCAL_GRAPH_EDGES", old)


def _flip_components():
    old = dd.neardup_components

    @functools.wraps(old)
    def forced(pairs, *a, **kw):
        kw["driver_threshold"] = -1
        return old(pairs, *a, **kw)

    dd.neardup_components = forced
    return lambda: setattr(dd, "neardup_components", old)


def _flip_droplist():
    old = dd.MAX_BROADCAST_DROP_IDS
    dd.MAX_BROADCAST_DROP_IDS = 0
    return lambda: setattr(dd, "MAX_BROADCAST_DROP_IDS", old)


def _flip_classifier():
    old_fn = txt.classifier_score
    old_dispatch = txt.CLASSIFIER_JOIN_DISPATCH
    txt.CLASSIFIER_JOIN_DISPATCH = 0

    @functools.wraps(old_fn)
    def forced(df, *a, **kw):
        if kw.get("weights") is not None and kw.get("id_col") is None:
            kw["id_col"] = "doc_id"
        return old_fn(df, *a, **kw)

    txt.classifier_score = forced

    def undo():
        txt.classifier_score = old_fn
        txt.CLASSIFIER_JOIN_DISPATCH = old_dispatch

    return undo


CASES = [
    (
        "graph_distributed",
        _flip_graph,
        [
            "evt_pagerank",
            "evt_personalized_pagerank",
            "evt_bfs_hops",
            "evt_shortest_path_weighted",
        ],
    ),
    (
        "components_distributed",
        _flip_components,
        ["dd_neardup_components", "dd_cluster_size_audit"],
    ),
    ("droplist_no_broadcast", _flip_droplist, ["dd_dedup_keep_canonical"]),
    ("classifier_join", _flip_classifier, ["txt_quality_classifier_weighted"]),
]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("parity-flip")
    spark.sparkContext.setLogLevel("ERROR")
    con = make_duck(sf_dir)
    results = {}
    failures = []
    for case, flip, names in CASES:
        undo = flip()
        try:
            for name in names:
                err = check_query(spark, con, name, sf_dir)
                key = f"{case}:{name}"
                results[key] = "pass" if err is None else f"FAIL {err}"
                print(("ok   " if err is None else "FAIL ") + key +
                      ("" if err is None else f": {err}"))
                if err is not None:
                    failures.append(key)
        finally:
            undo()
    print(f"\n{len(results) - len(failures)}/{len(results)} flipped-path pass")
    out = os.environ.get("PARITY_FLIP_OUT", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "PARITY_FLIP.json",
    ))
    with open(out, "w") as f:
        json.dump(
            {"sf_dir": sf_dir, "results": results, "fail": failures},
            f, indent=1, sort_keys=True,
        )
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
