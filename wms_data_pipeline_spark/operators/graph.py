"""Graph operators: fixed-point PageRank and distributed skyline.

The reference has no graph surface; these extend the engine the way a
training-data pipeline needs it — link-graph importance scoring for
crawl/citation corpora (PageRank is the canonical quality prior used in
public web-corpus curation, e.g. Common-Crawl-derived sets) and
pareto-front selection (skyline) for multi-criteria data picks.

Cross-engine determinism: PageRank runs entirely in SCALED INTEGER
arithmetic (BIGINT, scale 1e9). Every per-edge contribution is
``(rank * weight) div out_weight`` with positive operands, where trunc
(Spark ``div``) and floor (DuckDB ``//``) agree, and integer sums are
order-independent — so N iterations are bit-identical on any engine and
any partitioning, which double-typed PageRank cannot promise (per-ulp
drift compounds per iteration).
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: Fixed-point scale for PageRank ranks. 1e9 keeps rank*weight products
#: far inside BIGINT (1e9 * realistic edge weights ~1e6 = 1e15 << 2^63)
#: while giving ~9 significant digits.
PR_SCALE = 1_000_000_000

#: Global-pass cap for skyline stage 2 (rows surviving local skylines).
#: Exceeding it means the data is adversarially anti-correlated and the
#: single-partition final pass would be the bottleneck — fail loudly.
MAX_SKYLINE_CANDIDATES = 2_000_000

#: ``pagerank(strategy="auto")`` solves graphs at or below this many
#: AGGREGATED edges driver-side (one bounded collect, same size class as
#: a broadcast-join build side) instead of running N distributed
#: iterations. An aggregated (src, dst, weight) list this small is
#: dimension-table-sized however big the raw event scan that produced it
#: was — the scan stays distributed; only the fixed-point loop moves.
MAX_LOCAL_GRAPH_EDGES = 1_000_000

def graph_rounds(df, col: "str | None" = None) -> "int | None":
    """Rounds the fixed-point operator that produced ``df`` actually
    executed, read from the result column's metadata (``bfs_hops`` /
    ``shortest_paths`` attach it to their value column; both strategies —
    the local early-exiting loop and the distributed checkpoint-cadence
    early-exit — report it). None if ``df`` carries no rounds metadata
    (e.g. the column was dropped or rebuilt). If ``df`` carries rounds
    metadata on MORE THAN ONE column (e.g. a join of two fixed-point
    results), ``col`` is required — silently returning whichever field
    happens to come first would attribute one operator's round count to
    the other."""
    carriers = [
        f.name for f in df.schema.fields if "rounds" in (f.metadata or {})
    ]
    if col is None and len(carriers) > 1:
        raise ValueError(
            "graph_rounds: multiple columns carry rounds metadata "
            f"({carriers}); pass col= to pick one"
        )
    for f in df.schema.fields:
        if (col is None or f.name == col) and "rounds" in (f.metadata or {}):
            return int(f.metadata["rounds"])
    return None

#: The triangle census/clustering closure probe builds a hash relation from
#: the ORIENTED edge list. At or below this many edges the relation is
#: plan-time ``F.broadcast``-hinted: AQE already converts the runtime plan
#: to a broadcast hash join, but only AFTER the O(sum outdeg^2) wedge side
#: has paid its planned shuffle WRITE — the hint removes that exchange from
#: the plan entirely (measured: the single biggest line item of the census,
#: SCALE_NOTES r10). Above the threshold (two BIGINTs per row, ~16 B —
#: 8M edges ~ 128 MB hashed relation) the shuffled join is kept: on a
#: 100 TB co-occurrence graph the closure side no longer fits an executor
#: broadcast and the wedge shuffle is the correct plan.
BROADCAST_CLOSURE_MAX_EDGES = 8_000_000

# Node-count gate for broadcasting per-node side tables (degree table in
# the census orientation, per-node triangle counts in node_clustering):
# 2 longs per node, so 8M nodes is the same ~128 MB payload class as
# BROADCAST_CLOSURE_MAX_EDGES. Above it the joins fall back to shuffles.
BROADCAST_DEG_MAX_NODES = 8_000_000


def _null_safe_key(kv):
    """Sort key for driver-side (node, value) result lists that tolerates a
    NULL node (``None`` is unorderable in Python 3): nulls sort first, which
    is also a stable deterministic order. The distributed strategies emit
    the null-node row too, so the local strategies must not crash on it —
    the bit-identical contract covers nullable node columns."""
    k = kv[0]
    return (k is None, k)


def pagerank(
    edges: DataFrame,
    iterations: int = 5,
    damping_pct: int = 85,
    src: str = "src",
    dst: str = "dst",
    weight: str = "weight",
    checkpoint_every: int = 4,
    strategy: str = "auto",
) -> DataFrame:
    """Weighted PageRank with dangling-mass redistribution, in exact
    scaled-integer arithmetic (see module docstring).

    Per iteration: ``r'(v) = teleport + damping * (sum_in(v) + dangling/N)``
    where ``sum_in(v) = Σ_{u→v} (r(u) * w(u,v)) div out_w(u)``, all in
    BIGINT with ``div`` (positive trunc == floor), ``teleport =
    (100-damping)% of SCALE/N``, and dangling = Σ r(u) over nodes with no
    out-edges. Returns (node, rank_scaled) — rank_scaled/1e9 ≈ the
    probability.

    ``strategy``: ``"distributed"`` iterates in DataFrame ops —
    each iteration one shuffle on ``src`` (edges ⋈ ranks) plus one on
    ``dst`` (contribution aggregate), lineage truncated every
    ``checkpoint_every`` iterations — the path for web-scale link
    graphs. ``"local"`` collects the AGGREGATED edge list once and runs
    the fixed-point loop in driver Python over exact ints — the path
    for graphs whose edge list is broadcast-sized (an event-type
    transition matrix, a label co-occurrence graph) where N distributed
    iterations are pure scheduling overhead. ``"auto"`` counts edges and
    picks (≤ MAX_LOCAL_GRAPH_EDGES → local). Both paths share one
    integer formula, so they are bit-identical — tested, not assumed.

    Scale: edges are re-used every iteration, so callers should persist
    them. The distributed path's dangling sum is a scalar aggregate (one
    tiny driver value per iteration, the same control-plane shape as the
    watermark reads)."""
    if strategy not in ("auto", "local", "distributed"):
        raise ValueError(f"pagerank: unknown strategy {strategy!r}")
    e = edges.select(
        F.col(src).alias("src"),
        F.col(dst).alias("dst"),
        F.col(weight).cast("long").alias("w"),
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    # One bounded scalar aggregate validates weights AND sizes the graph
    # for auto-dispatch. The exact-integer contract (trunc == floor,
    # order-free sums) assumes positive weights; a null/zero weight
    # would otherwise DIVERGE between strategies (distributed `div`
    # yields NULL and silently drops the contribution, local Python
    # raises) — fail loudly in both instead.
    stats = e.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("w").isNull() | (F.col("w") < 1), 1
                ).otherwise(0)
            ),
            F.lit(0),
        ).alias("bad"),
    ).collect()[0]
    if stats["bad"]:
        raise ValueError(
            f"pagerank: {stats['bad']} edge(s) with null/non-positive "
            f"weight in {weight!r}; exact integer PageRank requires "
            "weights >= 1 (pre-filter or reweight the edge list)"
        )
    if strategy == "auto":
        strategy = (
            "local" if stats["n"] <= MAX_LOCAL_GRAPH_EDGES
            else "distributed"
        )
    if strategy == "local":
        return _pagerank_local(e, nodes, iterations, damping_pct)
    outw = e.groupBy("src").agg(F.sum("w").alias("out_w"))
    n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes.withColumn("rank_scaled", F.lit(0).cast("long"))
    init = PR_SCALE // n_nodes
    teleport = ((100 - damping_pct) * init) // 100
    ranks = nodes.withColumn("rank_scaled", F.lit(init).cast("long"))
    # Each iteration's dangling-mass collect is a SEPARATE action on the
    # ranks plan; without materialization it would re-execute every
    # iteration since the last checkpoint (quadratic replay inside each
    # checkpoint_every window). Persisting ranks before the collect
    # makes the collect populate the cache, so the contribution join
    # reads the SAME materialization; the previous iteration's cache is
    # released once its successor is materialized. localCheckpoint on
    # the cadence still truncates lineage so plan size stays bounded.
    prev_cached = None
    for it in range(iterations):
        ranks = ranks.persist()
        # dangling mass: rank held by nodes with no out-edges (this
        # action materializes the persisted ranks)
        dangling = (
            ranks.join(outw, ranks.node == outw.src, "left_anti")
            .agg(F.coalesce(F.sum("rank_scaled"), F.lit(0)))
            .collect()[0][0]
        )
        if prev_cached is not None:
            prev_cached.unpersist(False)
        prev_cached = ranks
        contrib = (
            e.join(ranks, e.src == ranks.node)
            .join(outw, "src")
            .select(
                F.col("dst").alias("node"),
                F.expr("(rank_scaled * w) div out_w").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("contrib"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.lit(teleport)
                    + F.expr(
                        f"({damping_pct} * (coalesce(contrib, 0L) "
                        f"+ {int(dangling)} div {n_nodes})) div 100"
                    )
                ).cast("long").alias("rank_scaled"),
            )
        )
        if (it + 1) % checkpoint_every == 0 and it + 1 < iterations:
            ranks = ranks.localCheckpoint()
    ranks = ranks.localCheckpoint()
    if prev_cached is not None:
        prev_cached.unpersist(False)
    return ranks


def _pagerank_local(
    e: DataFrame, nodes: DataFrame, iterations: int, damping_pct: int
) -> DataFrame:
    """Driver-side fixed point for broadcast-sized graphs: one bounded
    collect of the aggregated edges, then the IDENTICAL integer formula
    as the distributed loop (Python ``//`` on non-negative ints == Spark
    ``div`` == DuckDB ``//``), so results are bit-for-bit equal."""
    from pyspark.sql import types as T

    rows = e.collect()
    node_field = nodes.schema.fields[0]
    out_schema = T.StructType(
        [node_field, T.StructField("rank_scaled", T.LongType(), False)]
    )
    spark = e.sparkSession
    node_set = {r.src for r in rows} | {r.dst for r in rows}
    n_nodes = len(node_set)
    if n_nodes == 0:
        return spark.createDataFrame([], out_schema)
    out_w: dict = {}
    for r in rows:
        out_w[r.src] = out_w.get(r.src, 0) + int(r.w)
    init = PR_SCALE // n_nodes
    teleport = ((100 - damping_pct) * init) // 100
    ranks = {v: init for v in node_set}
    for _ in range(iterations):
        contrib = dict.fromkeys(node_set, 0)
        for r in rows:
            contrib[r.dst] += (ranks[r.src] * int(r.w)) // out_w[r.src]
        dangling = sum(ranks[v] for v in node_set if v not in out_w)
        ranks = {
            v: teleport
            + (damping_pct * (contrib[v] + dangling // n_nodes)) // 100
            for v in node_set
        }
    return spark.createDataFrame(
        sorted(ranks.items(), key=_null_safe_key), out_schema
    )


def _pool_batches(kernel):
    """Wrap a per-frame skyline kernel for the STAGE-2 global pass:
    ``mapInPandas`` feeds the coalesced single partition as MULTIPLE
    Arrow batches (spark.sql.execution.arrow.maxRecordsPerBatch, default
    10k rows), and running the kernel per batch would emit a union of
    per-batch skylines, not the global front — dominated points whose
    dominator sits in another batch would survive (code-review r8).
    Pooling is safe exactly here: stage-2 input is capped by
    MAX_SKYLINE_CANDIDATES, so the concat is bounded driver-set-sized."""
    import pandas as pd

    def _pooled(batches):
        pdfs = [p for p in batches if not p.empty]
        if pdfs:
            yield from kernel(iter([pd.concat(pdfs, ignore_index=True)]))

    return _pooled


def skyline_2d(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """Exact 2-D skyline (pareto front, minimize BOTH columns; duplicate
    points all kept): p dominates q iff p.x<=q.x, p.y<=q.y and they
    differ in at least one coordinate.

    Two-stage distributed algorithm: stage 1 computes each partition's
    LOCAL skyline in one vectorized Arrow pass (sort by (x,y) then a
    prefix-min scan — a globally non-dominated point is non-dominated in
    its own partition, so no survivor is lost); stage 2 runs the same
    kernel once over the union of local skylines on a single partition.
    Stage-1 output is tiny for any realistically correlated data (the
    front of a partition of n rows is O(log n) expected for independent
    dims); a count guard fails loudly at MAX_SKYLINE_CANDIDATES instead
    of letting an adversarial anti-correlated input serialize through
    one task. Contrast with the O(n^2) NOT-EXISTS formulation (never
    runs here) and the single-window formulation (exact but forces one
    global sort partition — what stage 1 exists to avoid)."""
    import numpy as np
    import pandas as pd

    def _local(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                yield pdf
                continue
            pdf = pdf.sort_values([x_col, y_col], kind="mergesort").reset_index(
                drop=True
            )
            x = pdf[x_col].to_numpy()
            y = pdf[y_col].to_numpy()
            n = len(pdf)
            new_group = np.empty(n, dtype=bool)
            new_group[0] = True
            new_group[1:] = x[1:] != x[:-1]
            starts = np.flatnonzero(new_group)
            gi = np.cumsum(new_group) - 1  # x-group index per row
            # m1 = min y among strictly-smaller x = running min up to the
            # end of the PREVIOUS x-group (undefined for the first group)
            cummin = np.minimum.accumulate(y)
            m1_group = np.zeros(len(starts), dtype=y.dtype)
            has_prev = np.zeros(len(starts), dtype=bool)
            if len(starts) > 1:
                m1_group[1:] = cummin[starts[1:] - 1]
                has_prev[1:] = True
            m1, hp = m1_group[gi], has_prev[gi]
            # within-group: y is sorted asc, so only the group's FIRST y
            # can strictly dominate (equal y = duplicate point, kept)
            group_first_y = y[starts][gi]
            dominated = (hp & (m1 <= y)) | (group_first_y < y)
            yield pdf[~dominated]

    # checkpoint the (tiny) survivor set: the guard count and the final
    # pass would otherwise each re-execute the full stage-1 scan
    local = df.mapInPandas(_local, schema=df.schema).localCheckpoint()
    n_cand = local.count()
    if n_cand > MAX_SKYLINE_CANDIDATES:
        raise ValueError(
            f"skyline_2d: {n_cand} local-skyline candidates exceed "
            f"MAX_SKYLINE_CANDIDATES={MAX_SKYLINE_CANDIDATES}; the input is "
            "pathologically anti-correlated — pre-bucket by x and run "
            "skyline_2d per bucket, or raise the cap deliberately"
        )
    return local.coalesce(1).mapInPandas(
        _pool_batches(_local), schema=df.schema
    )


def bfs_hops(
    edges: DataFrame,
    sources: DataFrame,
    max_hops: int = 6,
    src: str = "src",
    dst: str = "dst",
    node: str = "node",
    checkpoint_every: int = 4,
    strategy: str = "auto",
) -> DataFrame:
    """Multi-source BFS: hop distance from the nearest source node,
    following edge direction, capped at ``max_hops``. Returns
    (node, hops) for every REACHED node — unreachable nodes are absent
    (the caller left-joins if it wants NULL-distance rows).

    Frontier-free formulation: ``dist_{k+1}(v) = min(dist_k(v),
    1 + min over in-edges of dist_k(u))`` — a min-plus relaxation whose
    state is all integers, so results are exact and partitioning-
    independent (same contract as ``pagerank``). Each iteration is one
    shuffle on ``src`` (dist join edges) + one on the node key (min
    aggregate); lineage truncates every ``checkpoint_every`` iterations.
    Iterating to ``max_hops`` rather than to convergence keeps the pass
    count static for planning; BFS depth beyond ~6 on social-shaped
    graphs is usually noise (public small-world measurements).

    ``strategy`` mirrors ``pagerank``: ``"local"`` collects the
    aggregated edge list (bounded by MAX_LOCAL_GRAPH_EDGES under
    ``"auto"``) and runs the frontier loop driver-side — hop counts are
    small exact ints, so the two paths are trivially bit-identical."""
    if strategy not in ("auto", "local", "distributed"):
        raise ValueError(f"bfs_hops: unknown strategy {strategy!r}")
    e = edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
    if strategy == "auto":
        strategy = (
            "local" if e.count() <= MAX_LOCAL_GRAPH_EDGES else "distributed"
        )
    if strategy == "local":
        from pyspark.sql import types as T

        adj: dict = {}
        for r in e.collect():
            adj.setdefault(r._s, set()).add(r._d)
        hops = {r[0]: 0 for r in sources.select(node).distinct().collect()}
        frontier = set(hops)
        rounds = max_hops
        for h in range(1, max_hops + 1):
            frontier = {
                d
                for s in frontier
                for d in adj.get(s, ())
                if d not in hops
            }
            for d in frontier:
                hops[d] = h
            if not frontier:
                rounds = h
                break
        node_field = T.StructField(
            node, sources.schema[node].dataType, True
        )
        out = edges.sparkSession.createDataFrame(
            sorted(hops.items(), key=_null_safe_key),
            T.StructType(
                [node_field, T.StructField("hops", T.LongType(), False)]
            ),
        )
        return out.select(
            node, F.col("hops").alias("hops", metadata={"rounds": rounds})
        )
    dist = sources.select(F.col(node).alias("_n")).distinct().withColumn(
        "hops", F.lit(0).cast("long")
    )
    # Early-exit signature: (reached-node count, sum of hops). The node
    # set only grows and each node's hop count only decreases, so the
    # pair is unchanged across a checkpoint window IFF no node changed —
    # i.e. the relaxation reached its fixed point and every remaining
    # round would be a no-op shuffle. Checked only at the checkpoint
    # cadence, on the just-materialized frame (one cheap scalar
    # aggregate, no extra lineage replay). The local strategy already
    # early-exits; this closes the gap for shallow graphs distributed.
    prev_sig = None
    rounds = max_hops
    for it in range(max_hops):
        relaxed = (
            e.join(dist, e._s == dist._n)
            .select(F.col("_d").alias("_n"), (F.col("hops") + 1).alias("hops"))
        )
        dist = (
            dist.unionByName(relaxed)
            .groupBy("_n")
            .agg(F.min("hops").alias("hops"))
        )
        if (it + 1) % checkpoint_every == 0 and it + 1 < max_hops:
            dist = dist.localCheckpoint()
            sig = tuple(
                dist.agg(
                    F.count(F.lit(1)), F.coalesce(F.sum("hops"), F.lit(0))
                ).collect()[0]
            )
            if sig == prev_sig:
                rounds = it + 1
                break
            prev_sig = sig
    return dist.select(
        F.col("_n").alias(node),
        F.col("hops").alias("hops", metadata={"rounds": rounds}),
    )


def skyline_nd(df: DataFrame, cols: list[str]) -> DataFrame:
    """Exact d-dimensional skyline (minimize EVERY column in ``cols``;
    duplicates kept), same two-stage shape as ``skyline_2d`` — which
    remains the fast path for d=2 (prefix-min scan vs this kernel's
    front-list check).

    Kernel: points sort lexicographically (all dims ascending), under
    which any dominator precedes what it dominates (componentwise ≤ with
    one strict < implies lexicographic <), so one forward scan against
    the growing front array is exact. Per-point cost is a vectorized
    check against the current front (O(front · d)); fronts are tiny on
    correlated data and the MAX_SKYLINE_CANDIDATES guard bounds the
    one-task final pass exactly like the 2-D operator."""
    import numpy as np
    import pandas as pd

    if len(cols) < 2:
        raise ValueError("skyline_nd needs at least 2 criteria columns")

    CHUNK = 256  # rows screened per vectorized front pass
    FRONT_BLOCK = 65536  # front rows per dominance sub-pass (memory bound)

    def _local(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                yield pdf
                continue
            pdf = pdf.sort_values(cols, kind="mergesort").reset_index(drop=True)
            P = pdf[cols].to_numpy()
            n = len(pdf)
            keep = np.zeros(n, dtype=bool)
            front_chunks: list = []  # appended per chunk, consolidated lazily
            F = np.empty((0, P.shape[1]), dtype=P.dtype)
            for start in range(0, n, CHUNK):
                c = P[start : start + CHUNK]
                # vectorized screen of the whole chunk against the frozen
                # front, in FRONT_BLOCK slabs to bound temp memory
                dom = np.zeros(len(c), dtype=bool)
                for fb in range(0, len(F), FRONT_BLOCK):
                    blk = F[fb : fb + FRONT_BLOCK]
                    m = (blk[None, :, :] <= c[:, None, :]).all(2) & (
                        blk[None, :, :] < c[:, None, :]
                    ).any(2)
                    dom |= m.any(1)
                    if dom.all():
                        break
                # survivors still need the in-chunk sequential pass (a row
                # can be dominated by an earlier row of its own chunk)
                added: list = []
                for j in np.flatnonzero(~dom):
                    p = c[j]
                    if added:
                        A = np.asarray(added)
                        if ((A <= p).all(1) & (A < p).any(1)).any():
                            continue
                    keep[start + j] = True
                    # equal duplicates are kept but enter the front once
                    if not added or (added[-1] != p).any():
                        added.append(p)
                if added:
                    front_chunks.append(np.asarray(added))
                    F = (
                        np.concatenate(front_chunks)
                        if len(front_chunks) > 1
                        else front_chunks[0]
                    )
                    front_chunks = [F]
            yield pdf[keep]

    local = df.mapInPandas(_local, schema=df.schema).localCheckpoint()
    n_cand = local.count()
    if n_cand > MAX_SKYLINE_CANDIDATES:
        raise ValueError(
            f"skyline_nd: {n_cand} local-skyline candidates exceed "
            f"MAX_SKYLINE_CANDIDATES={MAX_SKYLINE_CANDIDATES}; the input is "
            "pathologically anti-correlated — pre-bucket on the first "
            "criterion and run per bucket, or raise the cap deliberately"
        )
    return local.coalesce(1).mapInPandas(
        _pool_batches(_local), schema=df.schema
    )


def _orient_edges(
    edges: DataFrame, src: str, dst: str, assume_canonical: bool = False
) -> tuple[DataFrame, DataFrame, DataFrame, int, int]:
    """Canonicalize + degree-order an edge list (shared by
    ``triangle_stats`` and ``node_clustering``): returns ``(und, deg,
    oriented, n_nodes, n_edges)`` where ``und`` is the distinct
    undirected edge set (a < b, self-loops dropped), ``deg`` its degree
    table (n, d), ``oriented`` each edge directed from its
    lower-(degree, node) endpoint as (lo, hi, dhi) with ``dhi`` = hi's
    degree (the orientation key carried so wedges emit in one canonical
    order), and ``n_nodes`` / ``n_edges`` the exact graph sizes every
    downstream dispatch gate needs — computed in ONE action on the
    tiny checkpointed degree table (count + sum(d) div 2, the
    handshake identity), r15: previously each gate re-counted its own
    frame (deg.count() here, oriented.count() in the closure, another
    deg.count() in node_clustering's charge join — three full passes
    per census query at 100 TB; now one pass over the |V|-row table).
    ``und``, ``deg`` and ``oriented`` are localCheckpoint-materialized —
    each is reused by at least two downstream plans (``deg`` by the two
    orientation joins plus the caller's final aggregate/join; without
    the checkpoint every consumer re-ran the 2|E|-row union+groupBy).

    ``assume_canonical=True`` skips the canonicalization pass when the
    caller PROVES its edges are already distinct, self-loop-free and
    ``src < dst`` (e.g. pair lists built by an ordered posexplode with
    ``j > i`` over ``collect_set`` arrays) — removing one full exchange
    + dedup aggregate of the edge list from the plan (optimization
    guide §2.4: remove shuffles outright where the data already has
    the property the shuffle would establish)."""
    if assume_canonical:
        und = edges.select(
            F.col(src).alias("a"), F.col(dst).alias("b")
        ).localCheckpoint()  # reused by degrees, orientation, and closure
    else:
        a, b = F.least(F.col(src), F.col(dst)), F.greatest(F.col(src), F.col(dst))
        und = (
            edges.filter(F.col(src) != F.col(dst))
            .select(a.alias("a"), b.alias("b"))
            .distinct()
            .localCheckpoint()  # reused by degrees, orientation, and closure
        )
    deg = (
        und.select(F.col("a").alias("n"))
        .unionByName(und.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
        .localCheckpoint()  # tiny (one row per node); consumed 3x
    )
    sizes = deg.agg(
        F.count(F.lit(1)).alias("nn"),
        F.coalesce(F.expr("sum(d) div 2"), F.lit(0)).alias("ne"),
    ).collect()[0]
    n_nodes, n_edges = int(sizes.nn), int(sizes.ne)
    da = deg.select(F.col("n").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("n").alias("b"), F.col("d").alias("db"))
    if n_nodes <= BROADCAST_DEG_MAX_NODES:
        # the degree table is 2 longs per node; below the gate both
        # orientation joins become map-side instead of SMJ-shuffling
        # the |E|-row edge list twice (a checkpointed frame's size is
        # opaque to the planner, so it would never pick broadcast on
        # its own — guide §3.1: hint when you know a side is small)
        da, db = F.broadcast(da), F.broadcast(db)
    lo_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = (
        und.join(da, "a")
        .join(db, "b")
        .select(
            F.when(lo_first, F.col("a")).otherwise(F.col("b")).alias("lo"),
            F.when(lo_first, F.col("b")).otherwise(F.col("a")).alias("hi"),
            F.when(lo_first, F.col("db")).otherwise(F.col("da")).alias(
                "dhi"
            ),
        )
        .localCheckpoint()  # reused by the wedge join and its closure probe
    )
    return und, deg, oriented, n_nodes, n_edges


def _edge_intersections(
    oriented: DataFrame, n_edges: "int | None" = None
) -> DataFrame:
    """Per-ORIENTED-EDGE triangle closure via sorted out-neighbor-array
    intersection (the r14 census plan — guide §1.2 "change the
    distributed algorithm first"): for each oriented edge x→y, the
    triangles it anchors are exactly ``N+(x) ∩ N+(y)`` (the triangle
    {x,y,z} with x lowest in the (degree, node) order has oriented
    edges x→y, x→z, y→z, so z sits in both out-neighbor sets, and no
    other edge of the triangle finds it). Returns one row per oriented
    edge: (lo, hi, zz) with ``zz`` the member array (possibly empty).

    Replaces the wedge-materialize-then-probe plan (generate all
    C(outdeg, 2) wedge rows, semi-join them against the edge list):
    same O(sqrt m) out-degree bound, same total element work, but the
    hash relation drops from |E| two-long keys probed |W| times to the
    |V|-row neighbor table probed 2|E| times, and the W-row generate →
    join → filter chain collapses into one codegen ``array_intersect``
    per edge. Measured at sf0.1 (1.2M edges, 41M wedges, adjacent
    A/B): closure count 3.1 s → 1.3 s.

    Below ``BROADCAST_CLOSURE_MAX_EDGES`` (payload: one array element
    per edge — the same size class the old closure-list broadcast
    gated on) the neighbor table is broadcast to both joins and the
    whole closure pass is map-side; above it the joins shuffle — the
    arrays then move once per edge endpoint, the same O(m^1.5) bytes
    the wedge shuffle paid, so the 100 TB story is unchanged.

    r15 fallback tuning (guide §3.1), from measurement, not conjecture:
    the sf1 event log shows the shuffled joins are perfectly BALANCED
    (task max/median 1.02-1.03 across 32 tasks on both intersection
    stages — the degree orientation caps out-degree at O(sqrt m) and
    hash partitioning spreads hub in-edges, so no salting is needed),
    and the time goes to sorting 12M edge rows plus the array-carrying
    intermediate for two SortMergeJoins. The nbrs side now carries a
    ``shuffle_hash`` hint on the fallback branch: the join builds the
    hash table on the |V|-row neighbor side (per-partition build is
    ~8·m/P bytes — scales with the shuffle-partition count) and
    streams the edges unsorted. Interleaved in-session A/B at sf1
    (12M edges, forced fallback): triangles 20.7/22.4 -> 18.1/14.0 s,
    clustering 24.6/30.1 -> 19.7/22.4 s, value parity exact.

    ``n_edges`` (exact, from ``_orient_edges``'s single gate action)
    picks the dispatch; passing None keeps the old per-call count for
    standalone use."""
    if n_edges is None:
        n_edges = oriented.count()
    nbrs = (
        oriented.groupBy("lo")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dhi", "hi"))),
                lambda s: s["hi"],
            ).alias("ns")
        )
        # consumed by BOTH sides of the intersection join: without this
        # checkpoint the whole aggregate subtree (scan + exchange +
        # collect_list) runs twice per query (seen in the r14 plan
        # capture: two identical ObjectHashAggregate+Exchange trees)
        .localCheckpoint()
    )
    if n_edges <= BROADCAST_CLOSURE_MAX_EDGES:
        nbrs = F.broadcast(nbrs)
    else:
        # shuffled-hash instead of sort-merge: skips the per-partition
        # sorts of the edge list and of the array-carrying intermediate
        # (see docstring — measured at sf1, no skew to trade against)
        nbrs = nbrs.hint("shuffle_hash")
    nx = nbrs.select(F.col("lo").alias("__nx"), F.col("ns").alias("__ns_x"))
    ny = nbrs.select(F.col("lo").alias("__ny"), F.col("ns").alias("__ns_y"))
    return (
        oriented
        # inner: every lo keys its own out-neighbor group by construction
        .join(nx, oriented.lo == F.col("__nx"))
        # left: hi may have no out-edges (pure sinks in the orientation)
        .join(ny, oriented.hi == F.col("__ny"), "left")
        .select(
            "lo",
            "hi",
            # empty-of-the-right-element-type via a zero-length slice of
            # ns_x (never null): node ids are not necessarily longs, so
            # no literal empty-array cast can be hardcoded here
            F.array_intersect(
                "__ns_x", F.coalesce("__ns_y", F.slice("__ns_x", 1, 0))
            ).alias("zz"),
        )
    )


def _closure_side(oriented: DataFrame) -> DataFrame:
    """The closure probe's build side: the oriented edge list renamed to
    the wedge's (y, z) endpoints, plan-time broadcast-hinted when the
    edge count is at or below ``BROADCAST_CLOSURE_MAX_EDGES`` (the count
    is one cheap action on the already-localCheckpoint-materialized
    frame). See the threshold's docstring for the why; above it the
    shuffled join is the plan that survives 100 TB."""
    closure = oriented.select(F.col("lo").alias("y"), F.col("hi").alias("z"))
    if oriented.count() <= BROADCAST_CLOSURE_MAX_EDGES:
        return F.broadcast(closure)
    return closure


def _ordered_wedges(oriented: DataFrame) -> DataFrame:
    """The canonical wedge set of a degree-oriented edge list: one row
    (lo, y, z) per unordered out-neighbor pair of ``lo``, emitted with
    (deg_y, y) < (deg_z, z) so the closure edge y->z — whose orientation
    agrees with this ordering by construction — matches exactly one
    wedge row.

    Node-iterator formulation (Suri & Vassilvitskii 2011's "node
    iterator++", public method): ONE shuffle aggregates each lo's
    out-neighbors into a (dhi, hi)-sorted struct array — bounded
    O(sqrt(m)) elements by the orientation — then the C(outdeg, 2)
    wedge pairs are generated MAP-SIDE by a posexplode + tail-slice
    explode with i < j (array order IS the canonical order, so no
    comparison filter). Replaces the previous self-join on lo, which
    shuffled the oriented edge list twice at the join (AQE replans from
    the logical plan and does not trust a checkpointed frame's
    partitioning, so pre-repartitioning could not elide them —
    measured, SCALE_NOTES r10); candidate count is identical, measured
    1.2x faster at sf0.1 and one full exchange of the edge list cheaper
    at scale.

    r14 rewrite of the pair generator (guide §2.3 / §1.2 per-task
    work): the former double posexplode emitted all d^2 (i, j) rows
    and FILTERED to j > i, carrying the full ``ns`` array (structs of
    dhi+hi) on every intermediate row. Now the sort key ``dhi`` is
    stripped right after the aggregate (only the order it established
    matters downstream), and the second generator explodes
    ``slice(ns, i+2, ...)`` — the tail of the array past position i —
    so exactly the C(d, 2) surviving pairs are ever generated and the
    per-row carry is a bigint array half the struct width. Same rows
    out, measured ~25% faster on the sf0.1 census."""
    nbrs = oriented.groupBy("lo").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dhi", "hi"))),
            lambda s: s["hi"],
        ).alias("ns")
    )
    return (
        nbrs.select("lo", "ns", F.posexplode("ns").alias("i", "y"))
        .select(
            "lo",
            "y",
            F.explode(
                F.slice(F.col("ns"), F.col("i") + F.lit(2), F.size("ns"))
            ).alias("z"),
        )
    )


def triangle_stats(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    assume_canonical: bool = False,
) -> DataFrame:
    """Exact triangle census of an undirected graph, returned as ONE row:
    (n_nodes, n_edges, n_wedges, n_triangles, clustering_x1e6) where
    clustering_x1e6 = (3 * triangles * 1e6) div wedges — the global
    clustering coefficient in exact scaled-integer form (same
    cross-engine contract as ``pagerank``: integer counts, staged
    ``div``, no FP anywhere).

    Degree-ordered orientation (Schank & Wagner 2005; the Suri &
    Vassilvitskii MapReduce formulation — public methods): each
    undirected edge is oriented from its lower-(degree, node) endpoint
    to the higher, which bounds every node's OUT-degree by O(sqrt(m))
    regardless of in-degree skew — the celebrity node that breaks a
    naive wedge join (deg^2 wedge rows for a 10M-follower hub) emits
    no wedges at all here, because hubs sit on the receiving end of
    their edges. Each triangle {x,y,z} in the orientation order is
    counted EXACTLY once, at its lowest-(degree, node) corner.

    Cost: one dedup shuffle (canonical edges, skipped under
    ``assume_canonical`` — see ``_orient_edges``), one degree
    aggregate, one out-neighbor aggregate on the out-degree-bounded
    src key, and a per-edge sorted-array intersection
    (``_edge_intersections`` — the r14 plan that replaced the
    materialize-41M-wedges-then-semi-join-probe shape; measured 2.4x
    on the closure pass at sf0.1) — the scalable triangle plan; a
    100 TB co-occurrence graph never sees a node-squared blowup.
    n_nodes, n_edges and n_wedges all read off the (tiny,
    checkpointed) degree table in ONE aggregate — sum(d) div 2 IS the
    edge count (handshake identity, exact integers), so the former
    separate count pass over the edge list is gone (guide §1.2: don't
    compute things twice)."""
    und, deg, oriented, n_nodes, n_edges = _orient_edges(
        edges, src, dst, assume_canonical
    )
    tri = _edge_intersections(oriented, n_edges).agg(
        F.coalesce(F.sum(F.size("zz")), F.lit(0)).alias("n_triangles")
    )
    nodes_wedges = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.coalesce(F.expr("sum(d) div 2"), F.lit(0))
        .cast("long")
        .alias("n_edges"),
        F.coalesce(
            F.sum(F.expr("(d * (d - 1)) div 2")), F.lit(0)
        ).cast("long").alias("n_wedges"),
    )
    return (
        nodes_wedges.crossJoin(F.broadcast(tri))
        .select(
            "n_nodes",
            "n_edges",
            "n_wedges",
            F.col("n_triangles").cast("long").alias("n_triangles"),
            F.when(F.col("n_wedges") > 0, F.expr(
                "(3 * n_triangles * 1000000) div n_wedges"
            )).otherwise(F.lit(0)).cast("long").alias("clustering_x1e6"),
        )
    )


def node_clustering(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    assume_canonical: bool = False,
) -> DataFrame:
    """Per-node triangle count and LOCAL clustering coefficient
    (Watts & Strogatz 1998 — public method): for every node v,
    ``clustering(v) = triangles(v) / C(deg(v), 2)`` as the exact scaled
    integer ``(n_tri * 1e6) div n_wedges`` (0 for degree < 2). Returns
    (node, degree, n_tri, clustering_x1e6) for EVERY node of the
    undirected graph — the form crawl-quality curation joins back to
    pages (a page whose neighborhood is a near-clique is template/link-
    farm shaped; a high-degree low-clustering page is a genuine hub).

    Same degree-ordered orientation and per-edge closure intersection
    as ``triangle_stats`` (shared ``_orient_edges`` /
    ``_edge_intersections`` plan — O(sqrt(m))-bounded out-neighbor
    arrays, never deg^2 per hub): each member z of an edge's
    intersection array IS one triangle (lo, hi, z) found exactly once,
    and ONE map-side explode charges it to all three corners — two
    struct entries carry size(zz) to lo and hi, the members carry 1
    each — followed by a single sum shuffle on the node key (2|E'|+T
    rows for E' = edges with >= 1 triangle, vs the former 3T; sums of
    exact ints, order-free). No FP, no global order — the
    ``pagerank`` exactness contract. ``assume_canonical`` skips the
    canonicalization exchange for pre-canonical edge lists (see
    ``_orient_edges``)."""
    und, deg, oriented, n_nodes, n_edges = _orient_edges(
        edges, src, dst, assume_canonical
    )
    inter = _edge_intersections(oriented, n_edges).filter(F.size("zz") > 0)
    corners = F.concat(
        F.array(
            F.struct(
                F.col("lo").alias("n"), F.size("zz").cast("long").alias("c")
            ),
            F.struct(
                F.col("hi").alias("n"), F.size("zz").cast("long").alias("c")
            ),
        ),
        F.transform(
            "zz", lambda z: F.struct(z.alias("n"), F.lit(1).cast("long").alias("c"))
        ),
    )
    tri = (
        inter.select(F.explode(corners).alias("s"))
        .select(F.col("s.n").alias("n"), F.col("s.c").alias("c"))
        .groupBy("n")
        .agg(F.sum("c").alias("t"))
    )
    if n_nodes <= BROADCAST_DEG_MAX_NODES:
        # tri is at most one row per node (n_nodes came free with the
        # orientation's single gate action — r15, no re-count);
        # broadcast keeps the final charge join map-side instead of
        # sort-merge-exchanging both sides
        tri = F.broadcast(tri)
    return (
        deg.join(tri, "n", "left")
        .select(
            F.col("n").alias("node"),
            F.col("d").cast("long").alias("degree"),
            F.coalesce(F.col("t"), F.lit(0)).cast("long").alias("n_tri"),
            F.when(
                F.col("d") >= 2,
                F.expr(
                    "(coalesce(t, 0) * 1000000) div ((d * (d - 1)) div 2)"
                ),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("clustering_x1e6"),
        )
    )


def shortest_paths(
    edges: DataFrame,
    sources: DataFrame,
    max_hops: int = 6,
    src: str = "src",
    dst: str = "dst",
    cost: str = "cost",
    node: str = "node",
    checkpoint_every: int = 4,
    strategy: str = "auto",
) -> DataFrame:
    """Weighted single/multi-source shortest paths, bounded at
    ``max_hops`` edges: ``max_hops`` rounds of Bellman-Ford min-plus
    relaxation (``dist_{k+1}(v) = min(dist_k(v), min over edges (u,v)
    of dist_k(u) + c(u,v))``). Returns (node, dist_cost) for every node
    reachable within the hop budget; costs are validated non-null
    >= 0 up front so the all-integer state is exact and
    partitioning-independent (the ``pagerank``/``bfs_hops`` contract —
    both strategies bit-identical).

    Distributed: each round is one shuffle on ``src`` (dist joins
    edges) + one min aggregate on the node key, lineage truncated every
    ``checkpoint_every`` rounds — the web-scale path. ``"local"``
    collects the aggregated edge list when it is broadcast-sized
    (<= MAX_LOCAL_GRAPH_EDGES under ``"auto"``) and relaxes driver-side
    — transition matrices and other dimension-sized graphs skip N
    rounds of distributed scheduling."""
    if strategy not in ("auto", "local", "distributed"):
        raise ValueError(f"shortest_paths: unknown strategy {strategy!r}")
    e = edges.select(
        F.col(src).alias("_s"),
        F.col(dst).alias("_d"),
        F.col(cost).cast("long").alias("_c"),
    )
    stats = e.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.sum(
                F.when(F.col("_c").isNull() | (F.col("_c") < 0), 1)
                .otherwise(0)
            ),
            F.lit(0),
        ).alias("bad"),
    ).collect()[0]
    if stats["bad"]:
        raise ValueError(
            f"shortest_paths: {stats['bad']} edge(s) with null/negative "
            f"cost in {cost!r}; min-plus relaxation requires costs >= 0"
        )
    if strategy == "auto":
        strategy = (
            "local" if stats["n"] <= MAX_LOCAL_GRAPH_EDGES
            else "distributed"
        )
    if strategy == "local":
        from pyspark.sql import types as T

        adj: dict = {}
        for r in e.collect():
            adj.setdefault(r._s, []).append((r._d, int(r._c)))
        dist = {r[0]: 0 for r in sources.select(node).distinct().collect()}
        rounds = max_hops
        for it in range(max_hops):
            changed = False
            nxt = dict(dist)
            for u, d_u in dist.items():
                for v, c in adj.get(u, ()):
                    if d_u + c < nxt.get(v, d_u + c + 1):
                        nxt[v] = d_u + c
                        changed = True
            dist = nxt
            if not changed:
                rounds = it + 1
                break
        node_field = T.StructField(
            node, sources.schema[node].dataType, True
        )
        out = edges.sparkSession.createDataFrame(
            sorted(dist.items(), key=_null_safe_key),
            T.StructType(
                [node_field, T.StructField("dist_cost", T.LongType(), False)]
            ),
        )
        return out.select(
            node,
            F.col("dist_cost").alias("dist_cost", metadata={"rounds": rounds}),
        )
    dist_df = sources.select(F.col(node).alias("_n")).distinct().withColumn(
        "dist_cost", F.lit(0).cast("long")
    )
    # Early-exit at the checkpoint cadence — same monotone-signature
    # argument as ``bfs_hops``: node count only grows, per-node distance
    # only shrinks, so (count, sum) unchanged ⟺ fixed point reached.
    prev_sig = None
    rounds = max_hops
    for it in range(max_hops):
        relaxed = e.join(dist_df, e._s == dist_df._n).select(
            F.col("_d").alias("_n"),
            (F.col("dist_cost") + F.col("_c")).alias("dist_cost"),
        )
        dist_df = (
            dist_df.unionByName(relaxed)
            .groupBy("_n")
            .agg(F.min("dist_cost").alias("dist_cost"))
        )
        if (it + 1) % checkpoint_every == 0 and it + 1 < max_hops:
            dist_df = dist_df.localCheckpoint()
            sig = tuple(
                dist_df.agg(
                    F.count(F.lit(1)),
                    F.coalesce(F.sum("dist_cost"), F.lit(0)),
                ).collect()[0]
            )
            if sig == prev_sig:
                rounds = it + 1
                break
            prev_sig = sig
    return dist_df.select(
        F.col("_n").alias(node),
        F.col("dist_cost").alias("dist_cost", metadata={"rounds": rounds}),
    )


def _personalized_pagerank_local(
    e: DataFrame, seed_nodes: DataFrame, iterations: int, damping_pct: int
) -> DataFrame:
    """Driver-side fixed point for broadcast-sized graphs — the seeded
    twin of ``_pagerank_local``: one bounded collect of the aggregated
    edges and the (curated, bounded) seed set, then the IDENTICAL
    integer formula as the distributed loop (Python ``//`` on
    non-negative ints == Spark ``div``), so results are bit-for-bit
    equal. Node set is graph ∪ seeds; teleport and dangling mass return
    to the seeds, split evenly — exactly the distributed expressions."""
    from pyspark.sql import types as T

    rows = e.collect()
    seed_set = {r.node for r in seed_nodes.collect()}
    if not seed_set:
        raise ValueError("personalized_pagerank: empty seed set")
    node_field = seed_nodes.schema.fields[0]
    out_schema = T.StructType(
        [node_field, T.StructField("rank_scaled", T.LongType(), False)]
    )
    spark = e.sparkSession
    node_set = {r.src for r in rows} | {r.dst for r in rows} | seed_set
    n_seeds = len(seed_set)
    out_w: dict = {}
    for r in rows:
        out_w[r.src] = out_w.get(r.src, 0) + int(r.w)
    init = PR_SCALE // n_seeds
    teleport = ((100 - damping_pct) * init) // 100
    ranks = {v: (init if v in seed_set else 0) for v in node_set}
    for _ in range(iterations):
        contrib = dict.fromkeys(node_set, 0)
        for r in rows:
            contrib[r.dst] += (ranks[r.src] * int(r.w)) // out_w[r.src]
        dangling = sum(ranks[v] for v in node_set if v not in out_w)
        ranks = {
            v: (teleport if v in seed_set else 0)
            + (
                damping_pct
                * (contrib[v] + (dangling // n_seeds if v in seed_set else 0))
            )
            // 100
            for v in node_set
        }
    return spark.createDataFrame(
        sorted(ranks.items(), key=_null_safe_key), out_schema
    )


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    iterations: int = 5,
    damping_pct: int = 85,
    src: str = "src",
    dst: str = "dst",
    weight: str = "weight",
    node: str = "node",
    checkpoint_every: int = 4,
    strategy: str = "auto",
) -> DataFrame:
    """Personalized (seeded-teleport) PageRank — the random walk restarts
    at the SEED set instead of uniformly (Haveliwala's topic-sensitive
    PageRank, public method): rank measures proximity/authority RELATIVE
    to the seeds, the standard crawl-frontier and quality-prior
    formulation when a curated trust set exists (seed domains, verified
    pages). Teleport mass ((100-damping)% each step) and dangling mass
    both return to the seeds, split evenly; non-seed nodes receive only
    propagated mass, so rank decays with distance from the seed set.

    Same exact scaled-BIGINT contract as ``pagerank`` (init
    ``SCALE div |S|`` on seeds, all steps integer ``div`` — bit-identical
    on any engine/partitioning), same per-iteration plan (one shuffle on
    ``src`` for ranks x edges, one on ``dst`` for the contribution
    aggregate, a scalar dangling collect, lineage checkpointed on
    cadence). Seeds absent from the edge list still participate (they
    are nodes; their teleport mass leaks only through their out-edges,
    of which they have none — it re-teleports). Returns every node of
    graph ∪ seeds with its rank; non-seed components unreachable from
    the seeds converge to 0.

    ``strategy`` mirrors ``pagerank`` (r14 — the seeded variant was the
    only iterative op without the local dispatch, paying N distributed
    iterations of scheduling overhead on broadcast-sized transition
    graphs; measured 2.6 → 1.3 s on evt_personalized_pagerank at sf0.1,
    the residual being the query's own transition-edge window build):
    ``"auto"`` counts edges and runs the IDENTICAL integer
    fixed point driver-side when the aggregated edge list is at or
    under ``MAX_LOCAL_GRAPH_EDGES`` — bit-identical by the shared
    formula (tested, not assumed). The local path also collects the
    seed set; seed sets are curated/bounded by contract."""
    if strategy not in ("auto", "local", "distributed"):
        raise ValueError(
            f"personalized_pagerank: unknown strategy {strategy!r}"
        )
    e = edges.select(
        F.col(src).alias("src"),
        F.col(dst).alias("dst"),
        F.col(weight).cast("long").alias("w"),
    )
    stats = e.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.sum(
                F.when(F.col("w").isNull() | (F.col("w") < 1), 1).otherwise(0)
            ),
            F.lit(0),
        ).alias("bad"),
    ).collect()[0]
    if stats["bad"]:
        raise ValueError(
            f"personalized_pagerank: {stats['bad']} edge(s) with "
            f"null/non-positive weight in {weight!r}; exact integer "
            "arithmetic requires weights >= 1"
        )
    seed_nodes = seeds.select(F.col(node).alias("node")).distinct()
    if strategy == "auto":
        strategy = (
            "local" if stats["n"] <= MAX_LOCAL_GRAPH_EDGES
            else "distributed"
        )
    if strategy == "local":
        return _personalized_pagerank_local(
            e, seed_nodes, iterations, damping_pct
        )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .unionByName(seed_nodes)
        .distinct()
        .join(seed_nodes.withColumn("__s", F.lit(True)), "node", "left")
        .select("node", F.coalesce("__s", F.lit(False)).alias("is_seed"))
        .localCheckpoint()  # reused every iteration (seed flags + grid)
    )
    n_seeds = nodes.filter("is_seed").count()
    if n_seeds == 0:
        raise ValueError("personalized_pagerank: empty seed set")
    outw = e.groupBy("src").agg(F.sum("w").alias("out_w"))
    init = PR_SCALE // n_seeds
    teleport = ((100 - damping_pct) * init) // 100
    ranks = nodes.select(
        "node",
        F.when(F.col("is_seed"), F.lit(init))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("rank_scaled"),
    )
    prev_cached = None
    for it in range(iterations):
        ranks = ranks.persist()
        dangling = (
            ranks.join(outw, ranks.node == outw.src, "left_anti")
            .agg(F.coalesce(F.sum("rank_scaled"), F.lit(0)))
            .collect()[0][0]
        )
        if prev_cached is not None:
            prev_cached.unpersist(False)
        prev_cached = ranks
        contrib = (
            e.join(ranks, e.src == ranks.node)
            .join(outw, "src")
            .select(
                F.col("dst").alias("node"),
                F.expr("(rank_scaled * w) div out_w").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("contrib"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.when(F.col("is_seed"), F.lit(teleport)).otherwise(0)
                    + F.expr(
                        f"({damping_pct} * (coalesce(contrib, 0L) "
                        f"+ (CASE WHEN is_seed THEN {int(dangling)} div "
                        f"{n_seeds} ELSE 0 END))) div 100"
                    )
                ).cast("long").alias("rank_scaled"),
            )
        )
        if (it + 1) % checkpoint_every == 0 and it + 1 < iterations:
            ranks = ranks.localCheckpoint()
    ranks = ranks.localCheckpoint()
    if prev_cached is not None:
        prev_cached.unpersist(False)
    return ranks
