"""Physical-plan regression guards: the SCALE_NOTES claims as executable
assertions. Each test pins a plan property that the 100 TB design depends
on — if a refactor reintroduces a scan without pushdown, un-broadcasts a
dim, or adds an Exchange before a map-side stage, these fail before any
benchmark notices."""

import os

import pytest

from wms_data_pipeline_spark.plans.queries import REGISTRY

SF = "/root/testdata/sf0.01"

needs_testdata = pytest.mark.skipif(
    not os.path.exists(SF), reason="driver testdata not present"
)


def _plan(spark, name, mode="formatted"):
    df = REGISTRY[name].fn(spark, SF)
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode
    )


@needs_testdata
def test_watermark_predicate_pushes_into_scan(spark):
    """Op 3 at 100 TB = scan a day, not the lake: the raw-nanos range must
    reach the parquet scan as a pushed filter."""
    plan = _plan(spark, "wm_incremental_filter")
    assert "PushedFilters: [" in plan
    # Exact comparator varies with the testdata's ts encoding (legacy nanos
    # bigint → GreaterThanOrEqual on the long; NTZ timestamp → GreaterThan
    # after UnwrapCastInBinaryComparison); the contract is that SOME range
    # predicate on ts reaches the scan.
    assert "GreaterThan(ts" in plan or "GreaterThanOrEqual(ts" in plan


@needs_testdata
def test_q3_broadcasts_the_dim_side(spark):
    """TPC-H q3 shape: customer (dim-filtered) must broadcast, never
    shuffle the fact side for it."""
    plan = _plan(spark, "rel_q3_shipping_priority", "simple")
    assert "BroadcastHashJoin" in plan


@needs_testdata
def test_topk_plans_as_take_ordered(spark):
    """Deterministic top-k must compile to TakeOrderedAndProject (per-
    partition heap + driver merge), not a global sort."""
    plan = _plan(spark, "rel_top_customers", "simple")
    assert "TakeOrderedAndProject" in plan


@needs_testdata
def test_ivf_has_no_exchange_before_candidate_join(spark):
    """Round-2 fix (VERDICT #4): IVF cell assignment is a map-side argmin —
    the corpus side must flow Scan→…→Join with no Exchange; the only
    exchange allowed is the final per-query top-k window."""
    plan = _plan(spark, "sim_ivf_topk", "simple")
    # exactly one shuffle exchange (the top-k window); broadcasts excluded
    shuffles = plan.count("+- Exchange ") + plan.count(":- Exchange ")
    assert shuffles <= 1, plan[:2000]


@needs_testdata
def test_banded_neardup_band_join_is_broadcast(spark):
    """The sketch-band self-join must run as a broadcast hash join with the
    id/hamming predicates INSIDE the join (no 19M-row materialize-then-
    filter), and the only plain Exchange is the candidate distinct."""
    plan = _plan(spark, "sim_embedding_neardup", "simple")
    assert "BroadcastHashJoin" in plan
    assert "bit_count" in plan.split("HashAggregate")[0] or "bit_count" in plan


@needs_testdata
def test_chunking_is_shuffle_free(spark):
    """Map-side sequence+explode chunking must contain zero exchanges."""
    plan = _plan(spark, "txt_chunk_documents", "simple")
    assert "Exchange" not in plan


@needs_testdata
def test_frame_sample_is_shuffle_free(spark):
    plan = _plan(spark, "mm_frame_sample", "simple")
    assert "Exchange" not in plan


@needs_testdata
def test_scan_prunes_columns_for_projection(spark):
    """Column pruning: a 2-ish-column query over lineitem must not read the
    full 11-column schema."""
    plan = _plan(spark, "rel_topk_lineitems")
    seg = plan.split("ReadSchema:")[1].split("\n")[0]
    assert "l_comment" not in seg
    assert len(seg.split(",")) <= 6, seg


@needs_testdata
def test_cosine_topk_scores_before_any_exchange(spark):
    """Brute-force cosine at 100 TB must never shuffle the corpus with its
    vectors: scoring is a MapInPandas kernel over the scan, only its
    bounded per-partition top-k superset reaches the window exchange, and
    WindowGroupLimit keeps the global pass top-k-limited."""
    plan = _plan(spark, "sim_cosine_topk", "simple")
    assert "MapInPandas" in plan
    assert "WindowGroupLimit" in plan
    # the kernel runs below (after, in plan text order) every Exchange:
    # nothing upstream of scoring shuffles the vector column
    first_exchange = plan.find("- Exchange")
    assert first_exchange == -1 or plan.find("MapInPandas") > first_exchange


@needs_testdata
def test_top_paths_plans_as_take_ordered(spark):
    """Path mining's top-20 must compile to TakeOrderedAndProject (per-
    partition heap), not a global sort over the path universe."""
    plan = _plan(spark, "evt_top_paths", "simple")
    assert "TakeOrderedAndProject" in plan


@needs_testdata
def test_range_join_binned_plans_as_hash_join(spark):
    """The bin-bucketed range-join rewrite must compile to a HASH join on
    the bin key — the entire point vs the naive two-inequality theta join,
    which degenerates to BroadcastNestedLoopJoin (events x intervals)."""
    plan = _plan(spark, "rel_range_join_binned", "simple")
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


@needs_testdata
def test_containment_join_no_nested_loop(spark):
    """The containment prefix filter must keep candidates on an equi-join
    (prefix token), never a nested-loop probe x corpus comparison."""
    plan = _plan(spark, "dd_containment_pairs", "simple")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


@needs_testdata
def test_q2_min_cost_reuses_partitioning_for_best(spark):
    """Q2's per-part minimum must ride the (l_partkey) partitioning the
    first aggregate already established — a window min, not a second
    shuffle: exactly ONE Exchange on l_partkey in the whole plan (dims
    are broadcast)."""
    plan = _plan(spark, "rel_q2_min_cost_supplier", "simple")
    import re

    exchanges = re.findall(r"Exchange hashpartitioning\(l_partkey", plan)
    assert len(exchanges) == 1, plan[:2000]
    assert "BroadcastHashJoin" in plan


@needs_testdata
def test_q21_touches_fact_once_and_plans_semi_anti(spark):
    """Q21's EXISTS/NOT EXISTS must compile to left-semi and left-anti
    joins over the pre-aggregated (order, supplier) table — the lineitem
    fact is scanned exactly once."""
    plan = _plan(spark, "rel_q21_blocking_supplier", "simple")
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan
    # checkpoint-fenced pre-aggregate: lineitem + supplier only — the
    # correlated legs read the fence, not their own fact scans
    assert plan.count("FileScan parquet") <= 2, plan[:1500]
    assert "CartesianProduct" not in plan


@needs_testdata
def test_ivfpq_rerank_fetch_is_broadcast(spark):
    """The refine stage's full-vector fetch must be a broadcast join of
    the bounded candidate set into the corpus scan — never a shuffle of
    the vector table."""
    plan = _plan(spark, "sim_ivfpq_rerank_topk", "simple")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


@needs_testdata
def test_priority_sample_is_single_window_exchange(spark):
    """Priority sampling is map-side except the per-source top-k window:
    one Exchange on source, WindowGroupLimit bounding the global pass."""
    plan = _plan(spark, "txt_priority_sample", "simple")
    import re

    assert len(re.findall(r"Exchange hashpartitioning\(source", plan)) == 1
    assert "WindowGroupLimit" in plan


@needs_testdata
def test_keep_canonical_broadcasts_drop_list(spark):
    """r12 rebuild (5 -> 2 exchanges): the survivor leg must be
    scan -> broadcast LEFT-ANTI -> partial agg — the ids-only drop list
    broadcasts; the corpus is never co-partitioned on doc_id for it."""
    plan = _plan(spark, "dd_dedup_keep_canonical", "simple")
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    import re

    assert not re.search(r"Exchange hashpartitioning\(doc_id", plan), plan[:1500]


@needs_testdata
def test_ks_probes_have_no_store_distinct_exchange(spark):
    """r12 rebuild: the audit-only-store-groups rule is an n_ref filter
    on the ECDF-tail output, not a semi join — no exchange over a
    distinct of the store's group column may reappear."""
    import re

    for name, max_exchanges in (
        ("dq_ks_drift_incremental", 2),
        ("dq_ks_drift_daily", 3),
        ("dq_ks_drift_quantized", 4),
        ("dq_w1_drift_quantized", 4),
    ):
        plan = _plan(spark, name, "simple")
        n = len(re.findall(r"\bExchange hashpartitioning", plan))
        assert n <= max_exchanges, (name, n)
        assert "CartesianProduct" not in plan


@needs_testdata
def test_prefix_rerank_fetch_is_broadcast(spark):
    """The full-vector fetch for the shortlist must broadcast the
    |queries| x shortlist id set into the corpus scan — never shuffle
    the vector table (the ivfpq_rerank contract)."""
    plan = _plan(spark, "sim_prefix_rerank_topk", "simple")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    import re

    assert not re.search(r"Exchange hashpartitioning\(vec_id", plan), plan[:1500]
