"""Similarity search over embedding columns (``array<float>``).

- ``cosine_topk`` — exact brute-force top-k: broadcast the (small) query set
  against the corpus; all arithmetic is JVM-side ``zip_with``/``aggregate``
  in double precision. Per-partition it's a scan + local heap (window
  row_number under AQE); no corpus shuffle. The right baseline, and at 100 TB
  still the right VERIFIER for any ANN structure.
- ``lsh_bucket`` / ``ann_topk_lsh`` — random-hyperplane LSH: sign-bit sketch
  over deterministic pseudo-random hyperplanes (hyperplane component (i,j) =
  hex64(md5("i:j")) mapped to [-1,1] — reproducible everywhere, no RNG
  state). Candidates = same-bucket vectors, optionally multi-probe via
  several independent tables. Scale path: bucket column becomes the
  partition/cluster key; each query touches one bucket per table instead of
  the corpus.

- ``ivf_topk`` — IVF (inverted-file) ANN: a coarse quantizer partitions the
  corpus into nlist cells; a query scans only its ``nprobe`` nearest cells.
  Default quantizer is deterministic hash-seeded medoid selection
  (SQL-reproducible → full value-hash oracle); MLlib k-means is the
  alternative constructor. At scale the cell id is the partition/cluster
  key and nprobe bounds the fraction of the corpus touched per query.

- ``pq_encode`` / ``pq_adc_topk`` / ``ivfpq_encode`` / ``ivfpq_topk`` —
  product quantization: vectors compress to ``m`` subspace codes (32× here),
  searches score via per-query lookup tables over the codes alone, and the
  IVF-PQ combination routes each query to nprobe cells before the code
  scan — IVF bounds WHAT is read, PQ bounds the per-row cost. Hash-medoid
  codebooks keep the whole index oracle-expressible; per-subspace k-means
  is the production alternative on the same kernels.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window
from pyspark.sql.functions import pandas_udf

from wms_data_pipeline_spark.operators.text import hex64

#: cosine_topk refuses query sets larger than this (see its docstring):
#: 4096 queries × 64 dims × 8 bytes ≈ 2 MB of closure per task — the point
#: where "broadcast the queries" stops being obviously right.
MAX_CLOSURE_QUERIES = 4096


def dot(a: Column, b: Column) -> Column:
    """Double-precision dot product of two float-array columns (JVM-side)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k by cosine per query. ``queries`` must be small — it is
    collected into the scoring kernel's closure (the broadcast side of a
    map-side join), and that collect is EAGER: calling this function runs
    a Spark action at plan-construction time, unlike the lazy
    broadcast-join form it replaced. Callers composing the result without
    executing it still pay that one action. Above ``MAX_CLOSURE_QUERIES``
    the call refuses (the query matrix would silently bloat every task
    closure instead of erroring) — batch the query set or use the
    LSH/IVF paths, which keep queries as a DataFrame.
    Output: (query_id, vec_id, cosine_sim) with
    deterministic tie-break on vec_id, score rounded to 6dp so downstream
    comparisons are stable across summation orders.

    Plan shape is distributed top-k (the TakeOrderedAndProject idea, per
    query): a ``mapInPandas`` stage scores each corpus partition against
    the whole query matrix in numpy and emits only each partition's
    top-k-superset per query, so the global window sees ~partitions × k
    rows per query instead of the full corpus × queries cross product —
    at 100 TB the shuffle is bounded by k, not corpus size. The numpy
    scoring accumulates dim-sequentially (dot and both norms), performing
    the identical IEEE-754 op sequence as the previous zip_with/aggregate
    form and the SQL oracle; rounding stays JVM-side (`F.round`,
    HALF_UP — numpy's round is banker's and would diverge). The partition
    cut keeps every row within 1e-6 raw score of the k-th best (2× the
    6dp rounding quantum), so no row that could win after rounding is
    dropped."""
    q_rows = queries.select(query_id_col, vec_col).limit(MAX_CLOSURE_QUERIES + 1).collect()
    if len(q_rows) > MAX_CLOSURE_QUERIES:
        raise ValueError(
            f"cosine_topk collects the query set into the task closure; got "
            f"more than {MAX_CLOSURE_QUERIES} queries — batch them or use "
            f"ann_topk_lsh / ivf_topk for large query sets"
        )
    if not q_rows:
        qt = queries.schema[query_id_col].dataType.simpleString()
        it = corpus.schema[id_col].dataType.simpleString()
        return corpus.sparkSession.createDataFrame(
            [], schema=f"{query_id_col} {qt}, {id_col} {it}, cosine_sim double"
        )
    q_ids = [r[0] for r in q_rows]
    Q = np.asarray([[float(x) for x in r[1]] for r in q_rows], dtype=np.float64)
    dim = Q.shape[1]
    # query norms: left-to-right accumulation, same as norm()
    qn = np.zeros(len(q_ids), dtype=np.float64)
    for j in range(dim):
        qn += Q[:, j] * Q[:, j]
    qn = np.sqrt(qn)

    # dot products are CPU-bound; a one-row-group corpus would otherwise
    # pin the scan+score stage to a single core (no-op at real scale)
    par = corpus.sparkSession.sparkContext.defaultParallelism
    if corpus.rdd.getNumPartitions() < par:
        corpus = corpus.repartition(par)

    id_type = corpus.schema[id_col].dataType.simpleString()
    out_schema = f"__qidx int, {id_col} {id_type}, __raw_sim double"

    def _score_partition(batches):
        for pdf in batches:
            ids = pdf[id_col].to_numpy()
            rows = [
                (i, np.asarray(v, dtype=np.float64))
                for i, v in enumerate(pdf[vec_col])
                if v is not None and len(v) == dim
            ]
            if not rows:
                continue
            ridx = np.array([i for i, _ in rows])
            X = np.stack([a for _, a in rows])
            dots = np.zeros((len(rows), len(q_ids)), dtype=np.float64)
            xn = np.zeros(len(rows), dtype=np.float64)
            for j in range(dim):  # dim-sequential: oracle-identical order
                xj = X[:, j]
                dots += xj[:, None] * Q[:, j]
                xn += xj * xj
            sims = dots / (np.sqrt(xn)[:, None] * qn[None, :])
            frames = []
            for qi in range(len(q_ids)):
                col = sims[:, qi]
                finite = col[np.isfinite(col)]
                if len(finite) > k:
                    kth = np.partition(finite, len(finite) - k)[len(finite) - k]
                    # superset: covers 6dp rounding ties. Non-finite scores
                    # always pass: NaN (zero-norm row) becomes SQL NULL in
                    # the Arrow transfer — ranking LAST like the oracle's
                    # 0/0 → NULL, a deliberate contract change from the HOF
                    # form's JVM-NaN-ranks-first — but it can still land in
                    # a top-k that finite rows can't fill, and +inf ranks
                    # first outright.
                    keep = (col >= kth - 1e-6) | ~np.isfinite(col)
                else:
                    keep = np.ones(len(col), dtype=bool)
                frames.append(
                    pd.DataFrame(
                        {
                            "__qidx": qi,
                            id_col: ids[ridx[keep]],
                            "__raw_sim": col[keep],
                        }
                    )
                )
            yield pd.concat(frames, ignore_index=True)

    qid_map = F.array(*[F.lit(q) for q in q_ids])
    scored = (
        corpus.select(id_col, vec_col)
        .mapInPandas(_score_partition, schema=out_schema)
        .select(
            F.element_at(qid_map, F.col("__qidx") + 1)
        .cast(queries.schema[query_id_col].dataType)
        .alias(query_id_col),
            id_col,
            F.round(F.col("__raw_sim"), 6).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine_sim").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def prefix_rerank_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    prefix_dims: int = 8,
    shortlist: int = 40,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    rotate: "dict | None" = None,
) -> DataFrame:
    """Matryoshka-style progressive top-k (public method — MRL, Kusupati
    et al. 2022: representation PREFIXES are themselves usable
    embeddings): stage 1 scores the corpus by cosine over only the first
    ``prefix_dims`` dimensions and keeps a per-query ``shortlist``;
    stage 2 re-ranks the shortlist with full-dimension exact cosine and
    returns the top ``k``. The coarse pass costs ``prefix_dims / dim``
    of the FLOPs — and, stored as its own column (or a Parquet struct
    field), ``prefix_dims / dim`` of the SCAN BYTES via column pruning,
    which at 100 TB is the real win: the full vectors are read only for
    |queries| × shortlist rows. Complements the engine's other ANN
    shapes (LSH buckets, IVF cells, PQ codes) with the one that needs
    NO index build — the model's own dimension ordering is the index.

    Deterministic: both stages rank by (6dp-rounded score desc, id asc)
    — the ``cosine_topk`` contract — so the result is exactly
    SQL-reproducible including which candidates make the shortlist.
    Recall vs the exact baseline is governed by how front-loaded the
    embedding's information is — USE THIS when the model is
    MRL-trained (or the vectors are PCA-rotated so variance is
    front-loaded); on generic embeddings, whose information spreads
    evenly, the measured curve is poor at small prefixes (SCALE_NOTES
    r12: 0.34 recall@10 at 8/64 dims on the synthetic corpus) — rotate
    first, or use the sketch/IVF/PQ paths whose candidate generation
    does not depend on dimension ordering.

    ``rotate`` (r13): a fitted ``pca_fit`` model applied to BOTH sides
    here, so the rotating-the-corpus-but-not-the-queries footgun cannot
    happen (a half-rotated pair scores garbage silently — the prefixes
    live in different bases). Must be an UNCENTERED model: a centered
    one shifts vectors and changes full-dimension cosine, breaking the
    exact re-rank contract — refused loudly."""
    if prefix_dims < 1:
        raise ValueError(f"prefix_dims must be >= 1, got {prefix_dims}")
    if shortlist < k:
        raise ValueError(
            f"shortlist ({shortlist}) must be >= k ({k}) — the re-rank "
            "can only return what the coarse pass kept"
        )
    if rotate is not None:
        if rotate.get("center"):
            raise ValueError(
                "prefix_rerank_topk: rotate= needs an UNCENTERED pca_fit "
                "model (center=False) — centering shifts vectors and "
                "changes full-dimension cosine, so the exact re-rank "
                "would no longer rank by the original similarities"
            )
        # r14: the coarse pass reads the rotated corpus (one kernel pass
        # over the scan), but the RE-RANK rotates only the rows the
        # shortlist join keeps — the former shape ran the rotation
        # kernel over the whole corpus a second time just to fetch
        # |queries| × shortlist vectors. Same kernel on the same rows ⇒
        # bitwise-identical scores (oracle-verified); queries are
        # closure-bounded, so rotating them up front stays cheap.
        coarse_corpus = pca_rotate(corpus, rotate, vec_col=vec_col)
        queries = pca_rotate(queries, rotate, vec_col=vec_col)
    else:
        coarse_corpus = corpus
    pre_corpus = coarse_corpus.select(
        id_col, F.slice(F.col(vec_col), 1, prefix_dims).alias(vec_col)
    )
    pre_queries = queries.select(
        query_id_col, F.slice(F.col(vec_col), 1, prefix_dims).alias(vec_col)
    )
    short = cosine_topk(
        pre_corpus, pre_queries, k=shortlist,
        id_col=id_col, vec_col=vec_col, query_id_col=query_id_col,
    ).select(query_id_col, id_col)
    # shortlist ids are |queries| x shortlist — broadcast into the corpus
    # scan so fetching the full vectors is map-side; query vectors ride
    # the same way
    full_q = queries.select(
        query_id_col, F.col(vec_col).alias("__qv")
    )
    fetched = corpus.select(id_col, vec_col).join(F.broadcast(short), id_col)
    if rotate is not None:
        fetched = pca_rotate(fetched, rotate, vec_col=vec_col)
    reranked = (
        fetched
        .join(F.broadcast(full_q), query_id_col)
        .select(
            query_id_col,
            id_col,
            F.round(cosine(F.col(vec_col), F.col("__qv")), 6).alias(
                "cosine_sim"
            ),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine_sim").desc(), F.col(id_col).asc()
    )
    return (
        reranked.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def pca_fit(
    df: DataFrame,
    vec_col: str = "embedding",
    center: bool = False,
) -> dict:
    """Fit a PCA rotation over an embedding column — the missing half of
    ``prefix_rerank_topk``'s deployment guidance (VERDICT r12 #5): the
    measured recall curve says generic embeddings need their variance
    FRONT-LOADED before dimension prefixes are usable, and the docstring
    told users to "rotate first" without giving them a rotation.

    One distributed pass: per-partition moment sums (count, Σx, Σxxᵀ)
    via vectorized numpy in ``mapInPandas`` — dim×dim + dim doubles per
    partition, control-plane sized — combined on the driver, then a
    dim×dim ``eigh`` (symmetric, exact library path). Components sort by
    eigenvalue DESCENDING and each takes a deterministic sign (its
    largest-|component| entry made positive), so refits on the same data
    produce the same rotation up to float summation order.

    ``center=False`` (default) diagonalizes the SECOND-MOMENT matrix
    E[xxᵀ] rather than the covariance: the resulting transform is a pure
    orthogonal rotation (no shift), which preserves every dot product
    and norm — full-dimension cosine on rotated vectors is bit-equal in
    exact arithmetic to cosine on the originals (pinned in
    test_round13_ops), so a rotated corpus drops into ``cosine_topk`` /
    ``prefix_rerank_topk`` with identical full-dim semantics and an
    energy-ordered prefix. ``center=True`` is classical PCA (subtract
    the mean first) — right for feature work, WRONG for cosine
    retrieval: the shift changes angles.

    Returns a plain dict model (the ``bpe_encode`` merges shape):
    ``rotation`` (dim×dim row list, row i = component i), ``mean``,
    ``eigenvalues`` (descending), ``explained`` (fractions), ``center``,
    ``n``. Tiny (dim² floats) — persist it however the pipeline persists
    models."""
    def _moments(batches):
        n = 0
        s = None
        ss = None
        for pdf in batches:
            vecs = [v for v in pdf[vec_col] if v is not None]
            if not vecs:
                continue
            x = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])
            n += x.shape[0]
            s = x.sum(axis=0) if s is None else s + x.sum(axis=0)
            ss = x.T @ x if ss is None else ss + x.T @ x
        if n:
            yield pd.DataFrame(
                {
                    "n": [n],
                    "s": [s.tolist()],
                    "ss": [ss.reshape(-1).tolist()],
                }
            )

    parts = df.select(vec_col).mapInPandas(
        _moments, schema="n long, s array<double>, ss array<double>"
    ).collect()
    if not parts:
        raise ValueError(f"pca_fit: no non-null vectors in {vec_col!r}")
    n = sum(p["n"] for p in parts)
    s = np.sum([np.asarray(p["s"]) for p in parts], axis=0)
    dim = len(s)
    ss = np.sum(
        [np.asarray(p["ss"]).reshape(dim, dim) for p in parts], axis=0
    )
    mean = s / n
    m2 = ss / n
    cov = m2 - np.outer(mean, mean) if center else m2
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1]
    vals = vals[order]
    comps = vecs[:, order].T  # row i = component i
    # deterministic sign: the largest-|entry| of each component positive
    for i in range(dim):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    total = float(vals.sum()) or 1.0
    return {
        "rotation": comps.tolist(),
        "mean": mean.tolist(),
        "eigenvalues": vals.tolist(),
        "explained": (vals / total).tolist(),
        "center": center,
        "n": int(n),
    }


def pca_rotate(
    df: DataFrame,
    model: dict,
    vec_col: str = "embedding",
    out_col: "str | None" = None,
    inverse: bool = False,
) -> DataFrame:
    """Apply a fitted ``pca_fit`` rotation to an embedding column:
    ``v' = R (v - mean)`` (mean only when the model was centered), as
    one Arrow-vectorized matmul per batch — the engine's codec-kernel
    shape, no shuffle, no per-row Python. ``inverse=True`` applies
    ``Rᵀ`` (+ mean), the exact reconstruction (orthogonal ⇒ inverse =
    transpose, pinned in test_round13_ops). NULL vectors stay NULL.
    Output replaces ``vec_col`` unless ``out_col`` names a new column;
    dtype stays array<float> (the storage/scan type embeddings ship
    in — one float32 round-trip of precision, same as writing the
    rotated corpus to parquet)."""
    rot = np.asarray(model["rotation"], dtype=np.float64)
    mean = np.asarray(model["mean"], dtype=np.float64)
    centered = bool(model.get("center"))
    target = out_col or vec_col

    @pandas_udf("array<float>")
    def _rotate(vs: pd.Series) -> pd.Series:
        def one(v):
            if v is None:
                return None
            x = np.asarray(v, dtype=np.float64)
            if inverse:
                y = rot.T @ x
                if centered:
                    y = y + mean
            else:
                if centered:
                    x = x - mean
                y = rot @ x
            return y.astype(np.float32)

        return vs.map(one)

    return df.withColumn(target, _rotate(F.col(vec_col)))


def hadamard_model(dim: int) -> dict:
    """A LITERAL orthonormal rotation in ``pca_fit``'s model shape: the
    Sylvester-Hadamard matrix scaled by ``1/sqrt(dim)`` (``dim`` must be a
    power of two, so every entry is ``±2^-k`` — EXACT in binary floating
    point, which makes the matrix-vector products' only rounding the
    additions).

    Two jobs (VERDICT r13 #3):
    - **Certification**: unlike the eigendecomposition inside ``pca_fit``,
      this basis is a pure literal an ANSI-SQL oracle can apply with list
      HOFs, so the ``pca_rotate`` Arrow kernel — the same code path the
      PCA model rides — gets a FULL value-hash DuckDB pairing
      (``sim_rotated_prefix_rerank``); measured bitwise-identical to the
      kernel's float64-matmul-then-float32-cast on every test corpus.
    - **Deployment**: a data-independent decorrelating rotation (the
      structured-rotation trick public PQ/OPQ variants use) where fitting
      PCA is not worth a pass — it spreads each input coordinate across
      all output coordinates without touching norms or dot products.

    It does NOT front-load variance (it is data-blind); for recall lift
    use ``pca_fit``."""
    if dim < 1 or dim & (dim - 1):
        raise ValueError(
            f"hadamard_model: dim must be a power of two, got {dim}"
        )
    h = np.array([[1.0]])
    while h.shape[0] < dim:
        h = np.block([[h, h], [h, -h]])
    r = h / np.sqrt(dim)
    return {
        "rotation": r.tolist(),
        "mean": [0.0] * dim,
        "eigenvalues": [1.0] * dim,
        "explained": [1.0 / dim] * dim,
        "center": False,
        "n": 0,
        "kind": "hadamard",
    }


def pca_model_write(spark, model: dict, path: str) -> None:
    """Persist a ``pca_fit``/``hadamard_model`` rotation (VERDICT r13 #4)
    — the same FROZEN-GEOMETRY contract as ``ivf_index_write``'s centers:
    fit once, rotate forever. Without it, every run of a prefix-rerank
    deployment re-fits on whatever the corpus has drifted to, silently
    changing the coarse pass's basis between runs (and making persisted
    rotated corpora unjoinable with freshly rotated queries). The model is
    dim² doubles — control-plane sized — written as ONE parquet row
    through a Spark writer so ``path`` may be any Hadoop-visible
    filesystem, same as every other index sidecar. Doubles round-trip
    parquet bit-exactly, so the read-back rotation is bit-identical
    (pinned in test_round14_ops)."""
    row = [
        (
            [[float(x) for x in r] for r in model["rotation"]],
            [float(x) for x in model["mean"]],
            [float(x) for x in model["eigenvalues"]],
            [float(x) for x in model["explained"]],
            bool(model.get("center")),
            int(model.get("n", 0)),
            str(model.get("kind", "pca")),
        )
    ]
    schema = (
        "rotation array<array<double>>, mean array<double>, "
        "eigenvalues array<double>, explained array<double>, "
        "center boolean, n long, kind string"
    )
    spark.createDataFrame(row, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(path.rstrip("/"))


def pca_model_read(spark, path: str) -> dict:
    """Load a persisted rotation model (``pca_model_write``) back into the
    plain-dict shape ``pca_rotate``/``prefix_rerank_topk(rotate=)``
    consume. Bit-identical to the dict that was written."""
    rows = spark.read.parquet(path.rstrip("/")).collect()
    if len(rows) != 1:
        raise ValueError(
            f"pca_model_read: expected exactly one model row at {path!r}, "
            f"found {len(rows)}"
        )
    r = rows[0]
    return {
        "rotation": [list(c) for c in r["rotation"]],
        "mean": list(r["mean"]),
        "eigenvalues": list(r["eigenvalues"]),
        "explained": list(r["explained"]),
        "center": bool(r["center"]),
        "n": int(r["n"]),
        "kind": r["kind"],
    }


def _hyperplane(table: int, plane: int, dim: int) -> list[float]:
    """Deterministic pseudo-random hyperplane: component j =
    (hex64(md5("t:p:j")) % 2001 - 1000) / 1000 ∈ [-1, 1]. Computed driver-side
    in Python (md5 is md5 everywhere) and shipped as an array literal, so the
    per-row work is one zip_with/aggregate, not 64 scalar expressions."""
    import hashlib

    out = []
    for j in range(dim):
        h = int(hashlib.md5(f"{table}:{plane}:{j}".encode()).hexdigest()[:15], 16)
        out.append((h % 2001 - 1000) / 1000.0)
    return out


def _unit(c: list[float]) -> list[float]:
    """Unit-normalize driver-side. The norm accumulates left-to-right in
    double precision — the SAME op order as DuckDB's
    ``list_transform(mv, x -> x / sqrt(list_dot_product(mv, mv)))`` — so the
    resulting literals are bit-identical cross-engine."""
    s = sum(x * x for x in c) ** 0.5 or 1.0
    return [float(x) / s for x in c]


def medoid_centers(
    corpus: DataFrame,
    nlist: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
    normalize: bool = True,
) -> list[tuple[int, list[float]]]:
    """Deterministic coarse quantizer: the ``nlist`` corpus vectors with the
    lexicographically smallest ``md5(id || ':' || seed)`` become the cell
    centers (unit-normalized), indexed in hash order.

    md5 is md5 everywhere, so the SAME cells fall out of DuckDB SQL
    (``ORDER BY md5(vec_id::VARCHAR || ':seed') LIMIT nlist``) — which makes
    the whole IVF search oracle-expressible, unlike a k-means fit whose
    centroids depend on MLlib's init/iteration internals. Hash-sampling is
    also a defensible quantizer: it draws uniformly from the data
    distribution itself (dense regions get proportionally more cells).
    The select is a TakeOrderedAndProject (top-nlist, no full sort) and the
    collect is nlist rows — bounded control-plane."""
    rows = (
        corpus.select(
            F.col(vec_col).alias("__v"),
            F.md5(
                F.concat_ws(":", F.col(id_col).cast("string"), F.lit(str(seed)))
            ).alias("__h"),
        )
        .orderBy("__h")
        .limit(nlist)
        .collect()
    )
    if not normalize:
        return [(i, [float(x) for x in r["__v"]]) for i, r in enumerate(rows)]
    return [(i, _unit([float(x) for x in r["__v"]])) for i, r in enumerate(rows)]


def kmeans_centers(
    corpus: DataFrame,
    nlist: int,
    vec_col: str = "embedding",
    seed: int = 7,
) -> list[tuple[int, list[float]]]:
    """MLlib k-means coarse quantizer (alternative constructor): better cell
    balance on clustered corpora, but the centroids are not reproducible in
    SQL, so results can only be rows-only / recall-checked."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    fit_input = corpus.select(array_to_vector(F.col(vec_col)).alias("features"))
    model = KMeans(k=nlist, seed=seed, featuresCol="features").fit(fit_input)
    return [(i, _unit([float(x) for x in c])) for i, c in enumerate(model.clusterCenters())]


def pq_codebook(
    corpus: DataFrame,
    m: int,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
    method: str = "medoid",
    sample_size: int = 16384,
    iters: int = 20,
) -> np.ndarray:
    """(k, dim) PQ codebook; subspace ``s`` uses columns ``[s*sub, (s+1)*sub)``.

    ``method='medoid'`` (default): the hash-medoid codebook — ``k``
    hash-chosen corpus vectors, one shared set sliced per subspace. Fully
    oracle-expressible (DuckDB picks the same medoids by the same md5
    order); the registry anchor.

    ``method='kmeans'``: the production alternative — per-subspace Lloyd
    k-means refining the SAME medoid subvectors as init, trained on a
    deterministic hash-ordered sample (``sample_size`` rows — PQ codebooks
    train on a bounded sample even at 100 TB; the sample select is a
    TakeOrderedAndProject, the fit is driver-side numpy on a ≤16k×dim
    matrix). Starting Lloyd from the medoid init makes the refinement
    strict: training-sample quantization MSE is non-increasing per
    iteration, so kmeans ≤ medoid by construction (measured corpus-wide in
    tools/ab_ann_recall.py). Deterministic — no RNG anywhere: hash-ordered
    sample, medoid init, mean updates, empty clusters keep their center.
    Not oracle-expressible (iterative fit), so kmeans-codebook queries get
    rows/recall checks only — same trade as the IVF ``kmeans_centers``
    constructor."""
    meds = medoid_centers(corpus, k, id_col, vec_col, seed, normalize=False)
    book = np.array([v for _, v in meds], dtype=np.float64)  # (k, dim)
    if method == "medoid":
        return book
    if method != "kmeans":
        raise ValueError(f"unknown codebook method {method!r}")
    dim = book.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    sub = dim // m
    sample_rows = (
        corpus.select(
            F.col(vec_col).alias("__v"),
            F.md5(
                F.concat_ws(":", F.col(id_col).cast("string"), F.lit(f"pqs{seed}"))
            ).alias("__h"),
        )
        .orderBy("__h")
        .limit(sample_size)
        .collect()
    )
    X = np.array(
        [r["__v"] for r in sample_rows if r["__v"] is not None and len(r["__v"]) == dim],
        dtype=np.float64,
    )
    if len(X) == 0:
        return book
    out = book.copy()
    for s in range(m):
        lo, hi = s * sub, (s + 1) * sub
        Xs = X[:, lo:hi]
        centers = book[:, lo:hi].copy()
        for _ in range(iters):
            # argmin over ||x-c||² == argmin over (||c||² - 2x·c): one
            # matmul instead of a (n, k, sub) broadcast tensor — the
            # broadcast form allocated 256 MB per iteration at the
            # default sample/k and dominated the fit wall-clock
            d = (centers * centers).sum(axis=1)[None, :] - 2.0 * (Xs @ centers.T)
            assign = d.argmin(axis=1)
            # minlength must track the ACTUAL center count: medoid_centers
            # returns min(k, corpus_rows) rows, and a k-sized mask over a
            # smaller centers array raises on the fancy index below
            counts = np.bincount(assign, minlength=len(centers)).astype(np.float64)
            sums = np.zeros_like(centers)
            np.add.at(sums, assign, Xs)
            nonempty = counts > 0
            new_centers = centers.copy()
            new_centers[nonempty] = sums[nonempty] / counts[nonempty, None]
            if np.array_equal(new_centers, centers):
                break
            centers = new_centers
        out[:, lo:hi] = centers
    return out


def _nearest_cells_udf(unit_centers: list[tuple[int, list[float]]], n: int):
    """Arrow-batched numpy kernel: the ``n`` nearest cells per vector.

    Cell assignment is a pure MAP-SIDE argmin: the nlist centers are
    normalized to unit length driver-side (cosine argmax == dot argmax
    against unit centers — the row's own norm is constant across cells and
    cannot change the ordering) and closed over the kernel. No join, no
    window, no row blow-up, no Exchange before the candidate join. (The
    expression form scored cells with nlist zip_with/aggregate HOF dots
    per row — interpreted per element outside codegen, the same dispatch
    overhead measured in lsh_bucket; the numpy kernel accumulates
    dim-sequentially, so scores and therefore cell choices are
    bit-identical to the HOF form and the SQL oracle.)"""
    C = np.asarray([c for _, c in unit_centers], dtype=np.float64)  # (L, dim)
    nlist_, dim = C.shape
    width = min(n, nlist_)
    # (negd, cell)-asc with all-null scores (malformed vector) degraded
    # to cells [0..n-1] — the array_sort nulls-last contract of the
    # expression form.
    default = list(range(width))

    @pandas_udf("array<int>")
    def _cells(vecs: pd.Series) -> pd.Series:
        res: list = [default] * len(vecs)
        rows = [
            (i, np.asarray(v, dtype=np.float64))
            for i, v in enumerate(vecs)
            if v is not None and len(v) == dim
        ]
        if rows:
            X = np.stack([a for _, a in rows])
            D = np.zeros((len(rows), nlist_), dtype=np.float64)
            for j in range(dim):  # dim-sequential: oracle-identical order
                D += X[:, j : j + 1] * C[:, j]
            # stable argsort on -D == similarity desc, cell asc on ties
            order = np.argsort(-D, axis=1, kind="stable")[:, :width].astype("int32")
            for (i, _), cells in zip(rows, order):
                res[i] = cells.tolist()
        return pd.Series(res)

    return _cells


def _ivf_search(
    corpus_cells: DataFrame,
    queries: DataFrame,
    unit_centers: list[tuple[int, list[float]]],
    k: int,
    nprobe: int,
    id_col: str,
    vec_col: str,
    query_id_col: str,
) -> DataFrame:
    """nprobe-cell candidate join + exact cosine re-rank (shared by the
    inline ivf_topk and the persisted-index read path)."""
    q = queries.select(query_id_col, F.col(vec_col).alias("__qvec"))
    q_cells = q.withColumn(
        "cell", F.explode(_nearest_cells_udf(unit_centers, nprobe)(F.col("__qvec")))
    )
    # No dedup needed: each corpus row has exactly ONE cell and a query's
    # nprobe cells are distinct, so a (query, vec) pair matches at most once.
    cand = corpus_cells.join(F.broadcast(q_cells), "cell").select(
        query_id_col,
        id_col,
        F.round(cosine(F.col(vec_col), F.col("__qvec")), 6).alias("cosine_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine_sim").desc(), F.col(id_col).asc()
    )
    return (
        cand.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") <= k).drop("__rn")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    nlist: int = 16,
    nprobe: int = 4,
    seed: int = 7,
    quantizer: str = "medoid",
) -> DataFrame:
    """IVF approximate top-k: coarse-quantizer cells + nprobe-cell search,
    exact cosine re-rank within the probed cells.

    ``quantizer='medoid'`` (default) uses deterministic hash-seeded medoids
    (oracle-expressible, see ``medoid_centers``); ``'kmeans'`` uses MLlib.
    Either way the assignment is a map-side transform. Candidates = corpus
    rows whose cell is among the query's ``nprobe`` closest centers — the
    scan fraction is ~nprobe/nlist of the corpus instead of all of it.
    For repeated querying, persist the assignment once with
    ``ivf_index_write`` and search via ``ivf_index_topk`` — the probed
    cells then prune at the FILE level, not just the row level.
    """
    if quantizer == "medoid":
        unit_centers = medoid_centers(corpus, nlist, id_col, vec_col, seed)
    elif quantizer == "kmeans":
        unit_centers = kmeans_centers(corpus, nlist, vec_col, seed)
    else:
        raise ValueError(f"unknown quantizer {quantizer!r}")

    corpus_cells = corpus.withColumn(
        "cell", F.element_at(_nearest_cells_udf(unit_centers, 1)(F.col(vec_col)), 1)
    )
    return _ivf_search(
        corpus_cells, queries, unit_centers, k, nprobe, id_col, vec_col, query_id_col
    )


def ivf_index_write(
    corpus: DataFrame,
    path: str,
    nlist: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
    quantizer: str = "medoid",
) -> None:
    """Persist an IVF index: the cell-assigned corpus as a
    ``partitionBy("cell")`` parquet layout plus the unit centers as a
    (tiny) parquet dataset beside it.

    This is the "cell id becomes the partition key" scale story made
    physical: each cell is its own directory, so a search over the index
    reads ONLY the nprobe probed cells' files — partition pruning at plan
    time (`PartitionFilters: [cell IN (…)]`), ~nprobe/nlist of the bytes.
    Assignment cost is paid once at build, amortized over every query
    batch; on a cluster the same layout is the natural target of a
    nightly index rebuild job.

    BOTH halves of the index go through Spark writers, so ``path`` may be
    any Hadoop-visible filesystem (file:, hdfs:, s3a:, …) — a driver-local
    ``open()`` sidecar would break on exactly the cluster deployments the
    index exists for."""
    if quantizer == "medoid":
        unit_centers = medoid_centers(corpus, nlist, id_col, vec_col, seed)
    elif quantizer == "kmeans":
        unit_centers = kmeans_centers(corpus, nlist, vec_col, seed)
    else:
        raise ValueError(f"unknown quantizer {quantizer!r}")
    base = path.rstrip("/")
    corpus.withColumn(
        "cell", F.element_at(_nearest_cells_udf(unit_centers, 1)(F.col(vec_col)), 1)
    ).write.mode("overwrite").partitionBy("cell").parquet(base + "/data")
    centers_df = corpus.sparkSession.createDataFrame(
        [(int(i), [float(x) for x in c]) for i, c in unit_centers],
        schema="cell int, center array<double>",
    )
    centers_df.coalesce(1).write.mode("overwrite").parquet(base + "/centers")


def ivf_index_append(
    new_vectors: DataFrame,
    path: str,
    vec_col: str = "embedding",
) -> None:
    """Add a delta of vectors to a persisted IVF index WITHOUT rebuilding
    it — the vector twin of ``dedup.neardup_incremental``'s daily-delta
    story. The stored centers are loaded (nlist rows — bounded
    control-plane), each new vector is assigned its cell by the same
    map-side argmin kernel the build used, and the rows are APPENDED into
    the ``partitionBy("cell")`` layout, so new files land only in the
    delta's touched cell directories and every existing file is left
    untouched. Cost scales with the delta (one map-side kernel + a
    delta-sized write), never with the indexed corpus.

    The quantizer is FROZEN: centers are not refit on append (the
    train-once/add-many contract every production IVF library exposes),
    so searches see old and new vectors under one consistent cell
    geometry and results equal a from-scratch assignment of the union
    corpus against the same centers (pinned by test). Recall drifts only
    as far as the corpus distribution drifts from the training sample —
    the periodic rebuild (``ivf_index_write``) re-trains.

    The delta is repartitioned ON the cell column before the write —
    without it every shuffle partition writes into every touched cell
    directory (the small-files trap measured in the near-dup index
    build); with nlist directories this caps write parallelism at nlist
    tasks, which is the right trade for delta-sized batches."""
    spark = new_vectors.sparkSession
    base = path.rstrip("/")
    unit_centers = sorted(
        (int(r["cell"]), list(r["center"]))
        for r in spark.read.parquet(base + "/centers").collect()
    )
    assigned = new_vectors.withColumn(
        "cell", F.element_at(_nearest_cells_udf(unit_centers, 1)(F.col(vec_col)), 1)
    )
    assigned.repartition(F.col("cell")).write.mode("append").partitionBy(
        "cell"
    ).parquet(base + "/data")


def ivf_index_topk(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    nprobe: int = 4,
) -> DataFrame:
    """Search a persisted IVF index (``ivf_index_write``). The probed cell
    ids are resolved driver-side from the stored centers (queries are the
    small, broadcast side by construction), so the scan carries
    ``cell IN (probed)`` as a PARTITION filter — only those cell
    directories are read. Centers load via ``spark.read`` (nlist rows —
    bounded control-plane), so the index path may be on any Hadoop-visible
    filesystem, same as the data half."""
    base = path.rstrip("/")
    unit_centers = sorted(
        (int(r["cell"]), list(r["center"]))
        for r in spark.read.parquet(base + "/centers").collect()
    )
    q_rows = queries.select(query_id_col, vec_col).limit(MAX_CLOSURE_QUERIES + 1).collect()
    if len(q_rows) > MAX_CLOSURE_QUERIES:
        raise ValueError(
            f"ivf_index_topk collects the query set driver-side to resolve "
            f"probed cells; got more than {MAX_CLOSURE_QUERIES} queries — "
            f"batch them (same contract as cosine_topk/pq_adc_topk)"
        )
    probed: set[int] = set()
    if q_rows:
        C = np.asarray([c for _, c in unit_centers], dtype=np.float64)
        dim = C.shape[1]
        for r in q_rows:
            v = r[1]
            if v is None or len(v) != dim:
                probed.update(range(min(nprobe, len(unit_centers))))
                continue
            x = np.asarray(v, dtype=np.float64)
            D = np.zeros(len(unit_centers), dtype=np.float64)
            for j in range(dim):
                D += x[j] * C[:, j]
            probed.update(
                int(c) for c in np.argsort(-D, kind="stable")[:nprobe]
            )
    corpus_cells = spark.read.parquet(base + "/data").filter(
        F.col("cell").isin(sorted(probed)) if probed else F.lit(False)
    )
    return _ivf_search(
        corpus_cells, queries, unit_centers, k, nprobe, id_col, vec_col, query_id_col
    )


def lsh_bucket(
    vec_col: Column, n_planes: int = 8, dim: int = 64, table: int = 0
) -> Column:
    """Sign-bit LSH bucket id (0 .. 2^n_planes-1) for one hash table.
    Map-side only; the bucket is a plain long usable as a cluster/partition
    key at scale.

    Implementation is an Arrow-batched Pandas UDF (numpy), the sanctioned
    escape hatch for dense linear algebra.  The declarative alternatives
    were measured an order of magnitude slower per row on the 1M-vector
    stress: ``zip_with``/``aggregate`` higher-order functions evaluate
    their lambda interpretively per element outside whole-stage codegen
    (~90% of that stress's wall-clock was this one expression), and the
    unrolled ``x0*w0 + x1*w1 + …`` form (60×64 = 3840 nodes) overflows
    codegen method limits into interpreted fallback, which is worse.

    Bit-compatibility with the DuckDB oracle (which sums
    ``x_j * w_j`` left-to-right in float64): the numpy kernel accumulates
    dim-SEQUENTIALLY (one vectorized FMA per dimension j), so every
    (row, plane) projection performs the identical IEEE-754 operation
    sequence — buckets are bit-identical to both the oracle and the
    previous HOF implementation.

    Malformed rows keep the HOF contract: a null vector or one whose
    length ≠ dim lands in bucket 0 (the HOF null-padded these into a null
    projection → every sign bit 0); null/NaN elements contribute 0 to the
    projection."""
    # W[j, p]: hyperplane component j of plane p; powers of two per plane.
    W = np.empty((dim, n_planes), dtype=np.float64)
    for p in range(n_planes):
        W[:, p] = _hyperplane(table, p, dim)
    pows = np.left_shift(np.uint64(1), np.arange(n_planes, dtype=np.uint64))

    @pandas_udf("long")
    def _bucket(vecs: pd.Series) -> pd.Series:
        out = np.zeros(len(vecs), dtype=np.int64)
        rows = [
            (i, np.asarray(v, dtype=np.float64))
            for i, v in enumerate(vecs)
            if v is not None and len(v) == dim
        ]
        if rows:
            idx = np.array([i for i, _ in rows])
            X = np.stack([a for _, a in rows])
            np.nan_to_num(X, copy=False, nan=0.0)
            proj = np.zeros((len(rows), n_planes), dtype=np.float64)
            for j in range(dim):  # dim-sequential: oracle-identical order
                proj += X[:, j : j + 1] * W[j]
            out[idx] = ((proj > 0).astype(np.uint64) * pows).sum(axis=1).astype(np.int64)
        return pd.Series(out)

    return _bucket(vec_col)


def ann_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    n_planes: int = 8,
    dim: int = 64,
    n_tables: int = 2,
) -> DataFrame:
    """Approximate top-k: candidates = corpus vectors sharing an LSH bucket
    with the query in ANY of ``n_tables`` tables; exact cosine re-ranks the
    candidates. Recall is tunable via planes/tables (unit-tested against
    ``cosine_topk``)."""
    c = corpus
    q = queries.select(query_id_col, F.col(vec_col).alias("__qvec"))
    for t in range(n_tables):
        c = c.withColumn(f"__b{t}", lsh_bucket(F.col(vec_col), n_planes, dim, t))
        q = q.withColumn(f"__b{t}", lsh_bucket(F.col("__qvec"), n_planes, dim, t))
    cond = None
    for t in range(n_tables):
        m = c[f"__b{t}"] == q[f"__b{t}"]
        cond = m if cond is None else (cond | m)
    cand = c.join(F.broadcast(q), on=cond).select(
        query_id_col,
        id_col,
        F.round(cosine(c[vec_col], q["__qvec"]), 6).alias("cosine_sim"),
    ).dropDuplicates([query_id_col, id_col])
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine_sim").desc(), F.col(id_col).asc()
    )
    return (
        cand.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") <= k).drop("__rn")
    )


def random_projection(
    corpus: DataFrame,
    out_dim: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    table: int = 100,
) -> DataFrame:
    """Johnson-Lindenstrauss-style random projection: reduce ``dim`` floats
    to ``out_dim`` via deterministic md5-seeded hyperplanes (the same
    ``_hyperplane`` family as LSH, a distinct ``table`` id so projections
    and LSH buckets are independent). The cheap-dims story for embedding
    pipelines: store/shuffle 4× fewer floats, re-rank survivors on the
    full vectors.

    Map-side only — one Arrow kernel per partition, no shuffle, no join;
    the projection matrix is a driver-built closure constant. Accumulates
    dim-SEQUENTIALLY (same op order as lsh_bucket and the SQL oracle's
    ``list_sum(list_transform(...))``), so every projected value is
    bit-reproducible cross-engine before the 6-dp output rounding.
    Output columns are SCALAR ``proj_0..proj_{out_dim-1}`` (rounded
    JVM-side) — registry-safe, no array outputs. Malformed vectors (null
    or wrong length) project to all-zero rows, matching the oracle's
    COALESCE over null projections."""
    W = np.empty((dim, out_dim), dtype=np.float64)
    for p in range(out_dim):
        W[:, p] = _hyperplane(table, p, dim)

    @pandas_udf("array<double>")
    def _proj(vecs: pd.Series) -> pd.Series:
        zero = [0.0] * out_dim
        res: list = [zero] * len(vecs)
        rows = [
            (i, np.asarray(v, dtype=np.float64))
            for i, v in enumerate(vecs)
            if v is not None and len(v) == dim
        ]
        if rows:
            X = np.stack([a for _, a in rows])
            np.nan_to_num(X, copy=False, nan=0.0)
            P = np.zeros((len(rows), out_dim), dtype=np.float64)
            for j in range(dim):  # dim-sequential: oracle-identical order
                P += X[:, j : j + 1] * W[j]
            for (i, _), row in zip(rows, P):
                res[i] = row.tolist()
        return pd.Series(res)

    out = corpus.withColumn("__proj", _proj(F.col(vec_col)))
    return out.select(
        id_col,
        *[
            F.round(F.element_at(F.col("__proj"), p + 1), 6).alias(f"proj_{p}")
            for p in range(out_dim)
        ],
    )


def projected_rerank_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    cand: int = 50,
    out_dim: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    dim: int = 64,
    table: int = 100,
) -> DataFrame:
    """Two-stage search on cheap dims: candidates = top-``cand`` per query
    by L2 in the ``out_dim``-dim random projection (4× narrower rows, the
    scan a projected column store pays), then exact cosine re-rank of only
    those candidates on the full vectors — the standard
    coarse-then-precise pattern, here with the JL projection as the coarse
    stage. Fully deterministic and oracle-expressible: both stages rank by
    (6-dp-rounded score, id).

    Plan shape: one shared projection kernel per side; the candidate scan
    is corpus × queries with the QUERY side broadcast (BroadcastNestedLoop
    over a bounded query set — same contract as cosine_topk's closure) and
    a per-query top-cand window; the re-rank joins ``cand × queries`` rows
    back to full vectors by id. At 100 TB the projected table is the thing
    scanned (stored once, nightly job), full vectors are fetched for
    ~cand rows per query only.

    The query side is force-broadcast twice (projected and full-vector
    forms), so it carries the same boundedness contract as its five
    sibling search paths: above ``MAX_CLOSURE_QUERIES`` the call refuses
    (one cheap count action on the query side) rather than silently
    bloating every task with an oversized broadcast relation."""
    if queries.limit(MAX_CLOSURE_QUERIES + 1).count() > MAX_CLOSURE_QUERIES:
        raise ValueError(
            f"projected_rerank_topk broadcasts the query side; got more "
            f"than {MAX_CLOSURE_QUERIES} queries — batch them (same "
            f"contract as cosine_topk / ivf_index_topk / pq_adc_topk)"
        )
    proj_cols = [f"proj_{p}" for p in range(out_dim)]
    c_proj = random_projection(corpus, out_dim, id_col, vec_col, dim, table)
    q_proj = random_projection(
        queries, out_dim, query_id_col, vec_col, dim, table
    ).select(
        query_id_col, *[F.col(p).alias(f"q_{p}") for p in proj_cols]
    )
    pd2 = None
    for p in proj_cols:
        term = (F.col(p) - F.col(f"q_{p}")) * (F.col(p) - F.col(f"q_{p}"))
        pd2 = term if pd2 is None else pd2 + term
    scored = c_proj.crossJoin(F.broadcast(q_proj)).select(
        query_id_col, id_col, F.round(pd2, 6).alias("proj_dist")
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("proj_dist").asc(), F.col(id_col).asc()
    )
    cands = (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= cand)
        .drop("__rn")
    )
    vecs = corpus.select(
        id_col, F.col(vec_col).alias("__cv"), norm(F.col(vec_col)).alias("__cn")
    )
    qvecs = queries.select(
        query_id_col, F.col(vec_col).alias("__qv"), norm(F.col(vec_col)).alias("__qn")
    )
    rr = (
        cands.join(vecs, id_col)
        .join(F.broadcast(qvecs), query_id_col)
        .select(
            query_id_col,
            id_col,
            F.round(
                dot(F.col("__cv"), F.col("__qv")) / (F.col("__cn") * F.col("__qn")), 6
            ).alias("cosine_sim"),
        )
    )
    w2 = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine_sim").desc(), F.col(id_col).asc()
    )
    return (
        rr.withColumn("__rn", F.row_number().over(w2))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def auto_band_config(
    corpus_count: int, hamming_max: int = 5
) -> tuple[int, int, int]:
    """Corpus-count-driven ``(n_planes, bands, band_bits)`` for
    ``sketch_banded_neardup`` — the band-sizing rule derived from the
    round-2 1M-vector stress run (SCALE_NOTES):

    - banded probe work ≈ bands × n² / 2^band_bits, so pick
      ``band_bits ≈ log2(n) − 7`` to hold expected bucket size ~128;
    - exact pigeonhole blocking needs ``bands ≥ hamming_max + 1``, so use
      exactly that many bands (more bands only add probe work);
    - the sketch lives in one signed long, so ``bands × band_bits ≤ 63``
      clamps band_bits (at 1M vectors with hamming_max=5 this yields the
      stress-proven 60-bit / 6×10-bit config).
    """
    import math

    bands = hamming_max + 1
    ideal = round(math.log2(max(corpus_count, 2))) - 7
    band_bits = max(4, min(ideal, 63 // bands))
    return bands * band_bits, bands, band_bits


def sketch_banded_neardup(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int | None = None,
    dim: int = 64,
    bands: int | None = None,
    band_bits: int | None = None,
    hamming_max: int = 5,
    threshold: float = 0.45,
    corpus_count: int | None = None,
    pair_dedup: str = "band_responsibility",
) -> DataFrame:
    """Sketch-banded embedding near-duplicate pairs — the 100 TB plan.

    ``n_planes``-bit angular sign sketch (deterministic md5 hyperplanes) →
    exact pigeonhole band blocking (``bands`` × ``band_bits`` must cover
    ``hamming_max`` + 1 bands) → hamming filter INSIDE the band join →
    distinct over survivors only → exact-cosine verification fetching
    vectors by id. Band rows carry (id, sketch) only; vectors never enter
    the shuffle. Never quadratic in the corpus (the bench headline
    ``sim_embedding_neardup`` is this operator; stress.py drives it at
    1M vectors where all-pairs would be ~5·10¹¹ comparisons).

    By DEFAULT the sketch geometry is auto-sized from the corpus count via
    ``auto_band_config`` (pass ``corpus_count`` to skip the count job) —
    the scale-correct config is the default path. Explicit
    ``n_planes``/``bands``/``band_bits`` remain available for
    oracle-pinned configs (the registry query fixes 24/6/4 because its
    DuckDB twin inlines the 24 hyperplane literals).

    ``pair_dedup`` selects how a pair colliding in several bands is reduced
    to one candidate row (both produce identical output; A/B'd at sf0.1 and
    the 1M-vector stress scale — numbers in SCALE_NOTES §"band dedup A/B"):

    - ``"band_responsibility"``: only the FIRST matching band emits — for a
      candidate from band b, require every earlier band to differ.  Pure
      bit-ops on the two sketches already riding the row; no extra shuffle.
    - ``"distinct"``: emit from every matching band, then
      ``dropDuplicates`` over the hamming survivors (one extra Exchange
      sized by the candidate set).
    """
    if pair_dedup not in ("band_responsibility", "distinct"):
        raise ValueError(f"unknown pair_dedup {pair_dedup!r}")
    if n_planes is None or bands is None or band_bits is None:
        if not (n_planes is None and bands is None and band_bits is None):
            raise ValueError(
                "pass all of n_planes/bands/band_bits or none (auto-sizing)"
            )
        n = corpus_count if corpus_count is not None else emb.count()
        n_planes, bands, band_bits = auto_band_config(n, hamming_max)
    assert bands * band_bits == n_planes and bands >= hamming_max + 1
    spark = emb.sparkSession
    par = spark.sparkContext.defaultParallelism
    if emb.rdd.getNumPartitions() < par:
        emb = emb.repartition(par)
    mask = (1 << band_bits) - 1
    sk = emb.select(
        id_col,
        vec_col,
        lsh_bucket(F.col(vec_col), n_planes=n_planes, dim=dim, table=0).alias("sk"),
    ).localCheckpoint(eager=False)
    bands_df = sk.select(
        id_col,
        "sk",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("b"),
                        F.shiftright(F.col("sk"), band_bits * j)
                        .bitwiseAND(F.lit(mask))
                        .alias("v"),
                    )
                    for j in range(bands)
                ]
            )
        ).alias("band"),
    ).select(id_col, "sk", F.col("band.b").alias("b"), F.col("band.v").alias("v"))
    a = bands_df.select(F.col(id_col).alias("id_a"), F.col("sk").alias("sk_a"), "b", "v")
    b2 = bands_df.select(F.col(id_col).alias("id_b"), F.col("sk").alias("sk_b"), "b", "v")
    xor = F.col("sk_a").bitwiseXOR(F.col("sk_b"))
    cand = (
        a.join(b2, ["b", "v"])
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(F.bit_count(xor) <= hamming_max)
    )
    if pair_dedup == "band_responsibility":
        first_band = F.lit(True)
        for j in range(bands):
            first_band = first_band & (
                (F.col("b") <= j)
                | (F.shiftright(xor, band_bits * j).bitwiseAND(F.lit(mask)) != 0)
            )
        cand = cand.filter(first_band).select("id_a", "id_b", "sk_a", "sk_b")
    else:
        cand = cand.select("id_a", "id_b", "sk_a", "sk_b").dropDuplicates(
            ["id_a", "id_b"]
        )
    vecs = sk.select(id_col, vec_col, norm(F.col(vec_col)).alias("nrm"))
    verified = cand.join(
        vecs.select(
            F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"),
            F.col("nrm").alias("na"),
        ),
        "id_a",
    ).join(
        vecs.select(
            F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"),
            F.col("nrm").alias("nb"),
        ),
        "id_b",
    )
    cos = dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return (
        verified.withColumn("cosine_sim", F.round(cos, 6))
        .filter(F.col("cosine_sim") >= threshold)
        .select("id_a", "id_b", "cosine_sim")
    )


def pq_encode(
    corpus: DataFrame,
    m: int = 8,
    k: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
    codebook: str = "medoid",
    _codebook_arr: np.ndarray | None = None,
) -> DataFrame:
    """Product quantization (public ANN-compression method): split each
    vector into ``m`` contiguous subspaces and encode each subspace as the
    index of its nearest codeword, compressing a 64-float vector to ``m``
    small ints (here 8 bytes — 32×) plus a per-vector reconstruction MSE.

    The codebook reuses the deterministic hash-medoid quantizer (RAW
    subvectors of the ``k`` hash-chosen corpus vectors, one shared medoid
    set sliced per subspace), so — like IVF — the whole encoding is
    ORACLE-EXPRESSIBLE: DuckDB picks the same medoids by the same md5
    order and recomputes every distance. ``codebook='kmeans'`` switches to
    the production per-subspace Lloyd refinement (see ``pq_codebook``) on
    the same kernel unchanged — lower reconstruction MSE, but iterative,
    so rows/recall-checked only.

    FP contract: distances accumulate DIM-SEQUENTIALLY in float64 (a
    Python loop over the subspace dims — same left-to-right op order as
    the oracle's ``list_transform``+``list_sum``), argmin ties break to
    the smallest codeword index (numpy first-occurrence == ORDER BY
    dist, j), and the MSE divides once and rounds to 6 dp.

    Plan shape: codebook is a bounded driver collect (k rows) broadcast
    into one Arrow mapInPandas kernel over the corpus — map-side, no
    shuffle; at 100 TB the codes column becomes the stored table and this
    stage is the nightly encode pass.
    """
    # _codebook_arr: internal fast path for the search entry points, which
    # already built the identical codebook for their own LUTs — skips a
    # second medoid collect / sample collect / Lloyd fit per search call
    med_arr = (
        _codebook_arr
        if _codebook_arr is not None
        else pq_codebook(corpus, m, k, id_col, vec_col, seed, method=codebook)
    )
    dim = med_arr.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    sub = dim // m
    # effective codeword count: medoid_centers returns min(k, corpus rows)
    k = med_arr.shape[0]
    id_type = corpus.schema[id_col].dataType.simpleString()
    out_schema = f"{id_col} {id_type}, codes array<int>, mse double"

    def _encode(batches):
        for pdf in batches:
            ids = pdf[id_col].to_numpy()
            vecs = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            if vecs.ndim != 2 or vecs.shape[1] != dim:
                vecs = vecs.reshape(len(ids), -1)
            codes = np.empty((len(ids), m), dtype=np.int32)
            total = np.zeros(len(ids), dtype=np.float64)
            for s in range(m):
                # dim-sequential accumulation: identical op order to the
                # oracle's list_sum over range(1, sub+1)
                dist = np.zeros((len(ids), k), dtype=np.float64)
                for d in range(sub):
                    col = s * sub + d
                    diff = vecs[:, col, None] - med_arr[None, :, col]
                    dist = dist + diff * diff
                codes[:, s] = np.argmin(dist, axis=1)
                total = total + dist[np.arange(len(ids)), codes[:, s]]
            import pandas as _pd

            yield _pd.DataFrame(
                {
                    id_col: ids,
                    "codes": list(codes),
                    "mse": np.round(total / dim, 6),
                }
            )

    narrow = corpus.select(id_col, vec_col)
    par = corpus.sparkSession.sparkContext.defaultParallelism
    if narrow.rdd.getNumPartitions() < par:
        narrow = narrow.repartition(par)
    return narrow.mapInPandas(_encode, out_schema)


def pack_codes(codes: Column, m: int = 8, bits: int = 4) -> Column:
    """Pack an ``array<int>`` of ``m`` PQ codes (each < 2**bits) into ONE
    BIGINT: ``Σ code_s << (bits*s)``. This is the "8 bytes per vector"
    storage story made literal — the packed long IS the PQ compressed
    representation — and it keeps registry outputs scalar (array-valued
    result columns break order-insensitive canonicalizers downstream; see
    the sim_pq_encode round-5 driver failure). Pure codegen expression:
    ``m`` static element_at/shift/add nodes, no UDF."""
    if m * bits > 63:
        raise ValueError(f"m={m} codes x {bits} bits overflow a signed long")
    packed = F.lit(0).cast("long")
    for s in range(m):
        packed = packed + F.shiftleft(
            F.element_at(codes, s + 1).cast("long"), bits * s
        )
    return packed


def pq_adc_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    m: int = 8,
    kcode: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 7,
    codebook: str = "medoid",
) -> DataFrame:
    """PQ search by asymmetric distance computation (ADC, public method):
    each query precomputes an ``m × kcode`` lookup table of exact
    subspace distances to the codebook, and a corpus vector's
    approximate distance is just ``m`` LUT lookups summed over its codes
    — the scan never touches the original vectors, only the 8-byte
    codes. This is the read path PQ compression exists for; at 100 TB
    the codes table is the only thing scanned and the LUT rides the task
    closure.

    Same contracts as ``cosine_topk``/``pq_encode``: queries are a
    bounded eager collect (≤ MAX_CLOSURE_QUERIES); LUT entries and the
    per-vector total accumulate dim- and subspace-SEQUENTIALLY (the
    oracle mirrors the s-order with ``list_sum(list(sd ORDER BY s))``);
    ranking uses the 6-dp-rounded distance with an id tiebreak so both
    engines pick identical top-k rows. Output: (query_id, vec_id,
    adc_dist) — the k SMALLEST distances per query.
    """
    med_arr = pq_codebook(corpus, m, kcode, id_col, vec_col, seed, method=codebook)
    # the codebook holds min(kcode, corpus_rows) rows — size the LUT from
    # what came back, not the requested parameter (a corpus smaller than
    # kcode would otherwise break the (q, m, kcode) broadcast below)
    kcode = med_arr.shape[0]
    dim = med_arr.shape[1]
    sub = dim // m
    q_rows = queries.select(query_id_col, vec_col).limit(MAX_CLOSURE_QUERIES + 1).collect()
    if len(q_rows) > MAX_CLOSURE_QUERIES:
        raise ValueError(
            f"pq_adc_topk collects the query set into the task closure; got "
            f"more than {MAX_CLOSURE_QUERIES} queries — batch them"
        )
    if not q_rows:
        # empty query set: Q would be 1-D and crash the LUT slicing
        qt = queries.schema[query_id_col].dataType.simpleString()
        it = corpus.schema[id_col].dataType.simpleString()
        return corpus.sparkSession.createDataFrame(
            [], schema=f"{query_id_col} {qt}, {id_col} {it}, adc_dist double"
        )
    q_ids = [r[0] for r in q_rows]
    Q = np.array([[float(x) for x in r[1]] for r in q_rows], dtype=np.float64)
    # LUT[q, s, j]: dim-sequential accumulation, same op order as the oracle
    lut = np.zeros((len(q_ids), m, kcode), dtype=np.float64)
    for s in range(m):
        for d in range(sub):
            col = s * sub + d
            diff = Q[:, col, None] - med_arr[None, :, col]
            lut[:, s, :] = lut[:, s, :] + diff * diff

    codes = pq_encode(
        corpus, m=m, k=kcode, id_col=id_col, vec_col=vec_col, seed=seed,
        codebook=codebook, _codebook_arr=med_arr,
    )
    id_type = corpus.schema[id_col].dataType.simpleString()
    out_schema = f"__qidx int, {id_col} {id_type}, __raw double"

    def _scan(batches):
        for pdf in batches:
            ids = pdf[id_col].to_numpy()
            C = np.stack([np.asarray(c, dtype=np.int64) for c in pdf["codes"]])
            dist = np.zeros((len(ids), len(q_ids)), dtype=np.float64)
            for s in range(m):  # subspace-sequential: oracle-identical order
                dist = dist + lut[:, s, :][:, C[:, s]].T
            frames = []
            for qi in range(len(q_ids)):
                col = dist[:, qi]
                if len(col) > k:
                    kth = np.partition(col, k - 1)[k - 1]
                    keep = col <= kth + 1e-6  # superset across rounding ties
                else:
                    keep = np.ones(len(col), dtype=bool)
                frames.append(
                    pd.DataFrame({"__qidx": qi, id_col: ids[keep], "__raw": col[keep]})
                )
            yield pd.concat(frames, ignore_index=True)

    qid_map = F.array(*[F.lit(q) for q in q_ids])
    scored = codes.mapInPandas(_scan, schema=out_schema).select(
        F.element_at(qid_map, F.col("__qidx") + 1)
        .cast(queries.schema[query_id_col].dataType)
        .alias(query_id_col),
        id_col,
        F.round(F.col("__raw"), 6).alias("adc_dist"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("adc_dist").asc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def ivfpq_encode(
    corpus: DataFrame,
    nlist: int = 16,
    m: int = 8,
    kcode: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_seed: int = 11,
    seed: int = 7,
    codebook: str = "medoid",
    _codebook_arr: np.ndarray | None = None,
    _cell_arr: np.ndarray | None = None,
) -> DataFrame:
    """IVF-PQ index encode (the combined layout large ANN deployments
    use): one map-side kernel assigns each vector a coarse L2 cell (full-
    dim argmin over ``nlist`` hash-medoids, its own seed) AND its PQ
    codes — so the stored table is (id, cell, codes): 8 bytes of codes
    plus a routing key, no floats. At 100 TB ``cell`` becomes the
    partition column (the persisted-IVF layout above) and a search reads
    nprobe/nlist of the FILES, then ADC-scans only codes.

    Same FP contract as ``pq_encode``: all distances accumulate
    dim-sequentially; ties break to the smallest index."""
    if _cell_arr is not None:
        cell_arr = _cell_arr
    else:
        cell_meds = medoid_centers(
            corpus, nlist, id_col, vec_col, cell_seed, normalize=False
        )
        cell_arr = np.array([v for _, v in cell_meds], dtype=np.float64)
    code_arr = (
        _codebook_arr
        if _codebook_arr is not None
        else pq_codebook(corpus, m, kcode, id_col, vec_col, seed, method=codebook)
    )
    dim = code_arr.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    sub = dim // m
    kcode = code_arr.shape[0]  # effective count: min(kcode, corpus rows)
    id_type = corpus.schema[id_col].dataType.simpleString()
    out_schema = f"{id_col} {id_type}, cell int, codes array<int>"

    def _encode(batches):
        for pdf in batches:
            ids = pdf[id_col].to_numpy()
            vecs = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            if vecs.ndim != 2 or vecs.shape[1] != dim:
                vecs = vecs.reshape(len(ids), -1)
            cd = np.zeros((len(ids), len(cell_arr)), dtype=np.float64)
            for d in range(dim):  # dim-sequential, full-dim cell distance
                diff = vecs[:, d, None] - cell_arr[None, :, d]
                cd = cd + diff * diff
            cells = np.argmin(cd, axis=1).astype(np.int32)
            codes = np.empty((len(ids), m), dtype=np.int32)
            for s in range(m):
                dist = np.zeros((len(ids), kcode), dtype=np.float64)
                for d in range(sub):
                    col = s * sub + d
                    diff = vecs[:, col, None] - code_arr[None, :, col]
                    dist = dist + diff * diff
                codes[:, s] = np.argmin(dist, axis=1)
            yield pd.DataFrame({id_col: ids, "cell": cells, "codes": list(codes)})

    narrow = corpus.select(id_col, vec_col)
    par = corpus.sparkSession.sparkContext.defaultParallelism
    if narrow.rdd.getNumPartitions() < par:
        narrow = narrow.repartition(par)
    return narrow.mapInPandas(_encode, out_schema)


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
    m: int = 8,
    kcode: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    cell_seed: int = 11,
    seed: int = 7,
    codebook: str = "medoid",
) -> DataFrame:
    """IVF-PQ search: each query probes its ``nprobe`` nearest coarse
    cells (L2 to the cell medoids, driver-side — nlist rows), then
    ADC-scans ONLY the codes of vectors in probed cells. Candidate work
    per query is ~nprobe/nlist of the corpus, and the scan touches
    8-byte codes, never vectors — IVF bounds WHAT is read, PQ bounds
    HOW MUCH per row. Deterministic and oracle-checkable end to end:
    every ranking (cell assignment, probe choice, code argmin, final
    top-k) orders by (sequentially-accumulated distance, index)."""
    # build cell centers + codebook ONCE and share with the encode stage —
    # the encode call used to recompute both (a second medoid collect,
    # sample collect, and Lloyd fit per search call with codebook='kmeans')
    cell_meds = medoid_centers(corpus, nlist, id_col, vec_col, cell_seed, normalize=False)
    cell_arr = np.array([v for _, v in cell_meds], dtype=np.float64)
    code_arr = pq_codebook(corpus, m, kcode, id_col, vec_col, seed, method=codebook)
    # effective codebook size (min(kcode, corpus_rows)) — the LUT below must
    # match what pq_codebook actually returned, same clamp as pq_adc_topk
    kcode = code_arr.shape[0]
    enc = ivfpq_encode(
        corpus, nlist, m, kcode, id_col, vec_col, cell_seed, seed,
        codebook=codebook, _codebook_arr=code_arr, _cell_arr=cell_arr,
    )
    dim = code_arr.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    sub = dim // m
    q_rows = queries.select(query_id_col, vec_col).limit(MAX_CLOSURE_QUERIES + 1).collect()
    if len(q_rows) > MAX_CLOSURE_QUERIES:
        raise ValueError("ivfpq_topk: query set too large for the task closure")
    if not q_rows:
        # empty query set: Q would be 1-D and crash the qcd slicing —
        # same short-circuit as ivfpq_index_topk (also covers
        # ivfpq_rerank_topk, whose stage 1 this is)
        qt = queries.schema[query_id_col].dataType.simpleString()
        it = corpus.schema[id_col].dataType.simpleString()
        return corpus.sparkSession.createDataFrame(
            [], schema=f"{query_id_col} {qt}, {id_col} {it}, adc_dist double"
        )
    q_ids = [r[0] for r in q_rows]
    Q = np.array([[float(x) for x in r[1]] for r in q_rows], dtype=np.float64)
    qcd = np.zeros((len(q_ids), nlist), dtype=np.float64)
    for d in range(dim):
        diff = Q[:, d, None] - cell_arr[None, :, d]
        qcd = qcd + diff * diff
    # nprobe nearest cells, ties to the smallest cell index (stable sort
    # over (dist, j) == lexsort on j then dist)
    probed = []
    for qi in range(len(q_ids)):
        order = np.lexsort((np.arange(nlist), qcd[qi]))
        probed.append(set(order[:nprobe].tolist()))
    lut = np.zeros((len(q_ids), m, kcode), dtype=np.float64)
    for s in range(m):
        for d in range(sub):
            col = s * sub + d
            diff = Q[:, col, None] - code_arr[None, :, col]
            lut[:, s, :] = lut[:, s, :] + diff * diff

    id_type = corpus.schema[id_col].dataType.simpleString()
    out_schema = f"__qidx int, {id_col} {id_type}, __raw double"

    def _scan(batches):
        for pdf in batches:
            ids = pdf[id_col].to_numpy()
            cells = pdf["cell"].to_numpy()
            C = np.stack([np.asarray(c, dtype=np.int64) for c in pdf["codes"]])
            frames = []
            for qi in range(len(q_ids)):
                mask = np.isin(cells, list(probed[qi]))
                if not mask.any():
                    continue
                Cm = C[mask]
                dist = np.zeros(Cm.shape[0], dtype=np.float64)
                for s in range(m):
                    dist = dist + lut[qi, s, :][Cm[:, s]]
                if len(dist) > k:
                    kth = np.partition(dist, k - 1)[k - 1]
                    keep = dist <= kth + 1e-6
                else:
                    keep = np.ones(len(dist), dtype=bool)
                frames.append(
                    pd.DataFrame(
                        {"__qidx": qi, id_col: ids[mask][keep], "__raw": dist[keep]}
                    )
                )
            if frames:
                yield pd.concat(frames, ignore_index=True)

    qid_map = F.array(*[F.lit(q) for q in q_ids])
    scored = enc.mapInPandas(_scan, schema=out_schema).select(
        F.element_at(qid_map, F.col("__qidx") + 1)
        .cast(queries.schema[query_id_col].dataType)
        .alias(query_id_col),
        id_col,
        F.round(F.col("__raw"), 6).alias("adc_dist"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("adc_dist").asc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def ivfpq_rerank_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    cand: int = 30,
    nlist: int = 16,
    nprobe: int = 4,
    m: int = 8,
    kcode: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    cell_seed: int = 11,
    seed: int = 7,
    codebook: str = "medoid",
) -> DataFrame:
    """IVF-PQ search REFINED by an exact full-vector re-rank — the read
    path production ANN deployments actually run (FAISS's refine stage,
    public method), and the remedy to the measured clustered-corpus
    finding (SCALE_NOTES r7): on clustered embeddings ADC's quantization
    error swamps within-cluster neighbor distances, so standalone IVF-PQ
    recall collapses to ~0.10. The codes BOUND the candidate set
    (nprobe/nlist of the corpus, 8-byte scan), the full vectors RANK the
    survivors (~cand rows fetched per query). ``cand`` is the recall
    knob and must be sized to the ADC noise floor, not to k: on the
    clustered 1M-vector corpus recall@10 at m=8 is 0.20/0.48/0.81/1.00
    for cand 100/500/2000/8000, and doubling the code bits (m=16) cuts
    the required depth ~4-8x (0.865 at cand=500) — bits and re-rank
    depth trade off against full-vector fetch bandwidth.

    Stage 1 is ``ivfpq_topk`` with k=cand (deterministic rounded-ADC +
    id ranking); stage 2 joins the candidate ids back to full vectors
    (broadcast — bounded by queries × cand rows) and ranks by exact L2
    accumulated dim-sequentially, so the whole two-stage result is
    oracle-checkable. Output: (query_id, vec_id, l2_dist), k smallest."""
    cands = ivfpq_topk(
        corpus, queries, k=cand, nlist=nlist, nprobe=nprobe, m=m, kcode=kcode,
        id_col=id_col, vec_col=vec_col, query_id_col=query_id_col,
        cell_seed=cell_seed, seed=seed, codebook=codebook,
    ).select(query_id_col, id_col)
    vecs = corpus.select(id_col, F.col(vec_col).alias("__cv"))
    qvecs = queries.select(query_id_col, F.col(vec_col).alias("__qv"))
    # candidate side is bounded (<= MAX_CLOSURE_QUERIES x cand rows) —
    # broadcast it so the full-vector fetch is one map-side join over the
    # corpus scan, never a shuffle of the vector table
    rr = (
        vecs.join(F.broadcast(cands), id_col)
        .join(F.broadcast(qvecs), query_id_col)
        .select(
            query_id_col,
            id_col,
            F.round(
                F.aggregate(
                    F.zip_with(
                        F.col("__cv"), F.col("__qv"),
                        lambda c, q: (c.cast("double") - q.cast("double"))
                        * (c.cast("double") - q.cast("double")),
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
                6,
            ).alias("l2_dist"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("l2_dist").asc(), F.col(id_col).asc()
    )
    return (
        rr.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def ivfpq_index_write(
    corpus: DataFrame,
    path: str,
    nlist: int = 16,
    m: int = 8,
    kcode: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_seed: int = 11,
    seed: int = 7,
    codebook: str = "medoid",
) -> None:
    """Persist an IVF-PQ index — the layout a 100 TB vector corpus
    actually deploys: the stored table is (id, codes_packed BIGINT)
    ``partitionBy("cell")``, so the index holds ~9 bytes per vector
    (vs 8*dim for raw doubles), a search partition-prunes to the probed
    cells AND scans only packed codes. Sidecar datasets (all through
    Spark writers — any Hadoop filesystem): ``cells`` (the full-dim L2
    cell medoids), ``codebook`` (the per-subspace PQ codebook rows),
    ``meta`` (nlist/m/kcode/bits/dim — a probe with different geometry
    would silently mis-rank).

    Codes are bit-packed (``pack_codes``: Σ code_s << bits*s) rather
    than stored as arrays: it is the compression story made literal,
    and it keeps every stored column scalar. Same determinism contract
    as ivfpq_encode/ivfpq_topk (dim-sequential distance accumulation,
    ties to the smallest index), so a search over the persisted index
    is bit-identical to the in-memory ``ivfpq_topk`` — which is exactly
    what lets the registry query share its full value-hash oracle."""
    cell_meds = medoid_centers(corpus, nlist, id_col, vec_col, cell_seed, normalize=False)
    cell_arr = np.array([v for _, v in cell_meds], dtype=np.float64)
    code_arr = pq_codebook(corpus, m, kcode, id_col, vec_col, seed, method=codebook)
    eff_k = code_arr.shape[0]
    bits = max(1, int(np.ceil(np.log2(max(eff_k, 2)))))
    if m * bits > 63:
        raise ValueError(f"m={m} x {bits} bits overflows a signed long")
    enc = ivfpq_encode(
        corpus, nlist, m, kcode, id_col, vec_col, cell_seed, seed,
        codebook=codebook, _codebook_arr=code_arr, _cell_arr=cell_arr,
    )
    base = path.rstrip("/")
    packed = enc.select(
        id_col, "cell", pack_codes(F.col("codes"), m=m, bits=bits).alias("codes_packed")
    )
    packed.repartition(F.col("cell")).write.mode("overwrite").partitionBy(
        "cell"
    ).parquet(base + "/data")
    spark = corpus.sparkSession
    spark.createDataFrame(
        [(int(i), [float(x) for x in row]) for i, row in enumerate(cell_arr)],
        schema="cell int, center array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(base + "/cells")
    spark.createDataFrame(
        [(int(i), [float(x) for x in row]) for i, row in enumerate(code_arr)],
        schema="code int, vec array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(base + "/codebook")
    # the codebook METHOD rides the meta sidecar too: append re-encodes
    # against the stored codebook rows (never refits), but an auditor —
    # or a rebuild — needs to know whether those rows are medoids or
    # Lloyd-fitted k-means centroids
    spark.createDataFrame(
        [(nlist, m, int(eff_k), bits, int(code_arr.shape[1]), codebook)],
        schema="nlist int, m int, kcode int, bits int, dim int, codebook string",
    ).coalesce(1).write.mode("overwrite").parquet(base + "/meta")


def ivfpq_index_topk(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Search a persisted IVF-PQ index (``ivfpq_index_write``): probed
    cell ids resolve driver-side from the stored medoids (nlist rows),
    becoming a PARTITION filter on the data read; the scan unpacks each
    row's BIGINT codes and sums the query's LUT — 8-byte-code ADC over
    nprobe/nlist of the files. Geometry self-configures from the meta
    sidecar. Deterministic and bit-identical to the in-memory
    ``ivfpq_topk`` (same accumulation orders, same tie rules)."""
    base = path.rstrip("/")
    meta = spark.read.parquet(base + "/meta").collect()[0]
    nlist, m, kcode, bits, dim = meta.nlist, meta.m, meta.kcode, meta.bits, meta.dim
    sub = dim // m
    cell_arr = np.array(
        [r["center"] for r in sorted(
            spark.read.parquet(base + "/cells").collect(), key=lambda r: r["cell"]
        )],
        dtype=np.float64,
    )
    code_arr = np.array(
        [r["vec"] for r in sorted(
            spark.read.parquet(base + "/codebook").collect(), key=lambda r: r["code"]
        )],
        dtype=np.float64,
    )
    q_rows = queries.select(query_id_col, vec_col).limit(MAX_CLOSURE_QUERIES + 1).collect()
    if len(q_rows) > MAX_CLOSURE_QUERIES:
        raise ValueError(
            "ivfpq_index_topk collects the query set driver-side to resolve "
            f"probed cells; got more than {MAX_CLOSURE_QUERIES} queries — "
            "batch them (same contract as the sibling search paths)"
        )
    if not q_rows:
        # an empty query set would make Q 1-D and crash the qcd slicing —
        # short-circuit like ivf_index_topk's empty-probe path
        id_type = (
            spark.read.parquet(base + "/data").schema[id_col].dataType.simpleString()
        )
        qt = queries.schema[query_id_col].dataType.simpleString()
        return spark.createDataFrame(
            [], schema=f"{query_id_col} {qt}, {id_col} {id_type}, adc_dist double"
        )
    q_ids = [r[0] for r in q_rows]
    Q = np.array([[float(x) for x in r[1]] for r in q_rows], dtype=np.float64)
    qcd = np.zeros((len(q_ids), nlist), dtype=np.float64)
    for d in range(dim):
        diff = Q[:, d, None] - cell_arr[None, :, d]
        qcd = qcd + diff * diff
    probed = []
    for qi in range(len(q_ids)):
        order = np.lexsort((np.arange(nlist), qcd[qi]))
        probed.append(set(order[:nprobe].tolist()))
    lut = np.zeros((len(q_ids), m, kcode), dtype=np.float64)
    for s in range(m):
        for d in range(sub):
            col = s * sub + d
            diff = Q[:, col, None] - code_arr[None, :, col]
            lut[:, s, :] = lut[:, s, :] + diff * diff

    all_probed = sorted(set().union(*probed)) if probed else []
    data = spark.read.parquet(base + "/data").filter(
        F.col("cell").isin(all_probed) if all_probed else F.lit(False)
    )
    id_type = data.schema[id_col].dataType.simpleString()
    out_schema = f"__qidx int, {id_col} {id_type}, __raw double"
    mask_val = (1 << bits) - 1

    def _scan(batches):
        for pdf in batches:
            ids = pdf[id_col].to_numpy()
            cells = pdf["cell"].to_numpy()
            packed = pdf["codes_packed"].to_numpy().astype(np.int64)
            C = np.empty((len(ids), m), dtype=np.int64)
            for s in range(m):
                C[:, s] = (packed >> (bits * s)) & mask_val
            frames = []
            for qi in range(len(q_ids)):
                sel = np.isin(cells, list(probed[qi]))
                if not sel.any():
                    continue
                Cm = C[sel]
                dist = np.zeros(Cm.shape[0], dtype=np.float64)
                for s in range(m):
                    dist = dist + lut[qi, s, :][Cm[:, s]]
                if len(dist) > k:
                    kth = np.partition(dist, k - 1)[k - 1]
                    keep = dist <= kth + 1e-6
                else:
                    keep = np.ones(len(dist), dtype=bool)
                frames.append(
                    pd.DataFrame(
                        {"__qidx": qi, id_col: ids[sel][keep], "__raw": dist[keep]}
                    )
                )
            if frames:
                yield pd.concat(frames, ignore_index=True)

    qid_map = F.array(*[F.lit(q) for q in q_ids])
    scored = data.mapInPandas(_scan, schema=out_schema).select(
        F.element_at(qid_map, F.col("__qidx") + 1)
        .cast(queries.schema[query_id_col].dataType)
        .alias(query_id_col),
        id_col,
        F.round(F.col("__raw"), 6).alias("adc_dist"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("adc_dist").asc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def ivfpq_index_append(
    new_vectors: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Append a delta into a persisted IVF-PQ index with FROZEN geometry
    (cells and codebook are not refit — the same train-once/add-many
    contract as ``ivf_index_append``, applied to the compressed layout).
    The delta is encoded against the stored cell medoids and codebook
    (both bounded sidecar collects), packed, and appended into only its
    touched cell directories; searches then see old and new vectors
    under one consistent quantization, identical to a from-scratch
    encode of the union against the same sidecars."""
    spark = new_vectors.sparkSession
    base = path.rstrip("/")
    meta = spark.read.parquet(base + "/meta").collect()[0]
    cell_arr = np.array(
        [r["center"] for r in sorted(
            spark.read.parquet(base + "/cells").collect(), key=lambda r: r["cell"]
        )],
        dtype=np.float64,
    )
    code_arr = np.array(
        [r["vec"] for r in sorted(
            spark.read.parquet(base + "/codebook").collect(), key=lambda r: r["code"]
        )],
        dtype=np.float64,
    )
    enc = ivfpq_encode(
        new_vectors, meta.nlist, meta.m, meta.kcode, id_col, vec_col,
        _codebook_arr=code_arr, _cell_arr=cell_arr,
    )
    enc.select(
        id_col, "cell",
        pack_codes(F.col("codes"), m=meta.m, bits=meta.bits).alias("codes_packed"),
    ).repartition(F.col("cell")).write.mode("append").partitionBy(
        "cell"
    ).parquet(base + "/data")


def sq8_scale(vec_col: Column) -> Column:
    """Per-vector symmetric SQ8 scale: 127 / max|x| (1.0 for the zero
    vector). THE single Spark-side source of the pinned quantizer shared
    by sim_embedding_quantize (accounting) and sq8_topk (search)."""
    amax = F.array_max(F.transform(vec_col, lambda x: F.abs(x)))
    return F.when(amax > 0, F.lit(127.0) / amax).otherwise(F.lit(1.0))


def sq8_dequantize(vec_col: Column, scale_col: Column) -> Column:
    """Quantize-then-dequantize through the pinned int8 grid:
    floor(x * sc + 0.5) / sc — floor(x+0.5) rather than round() because
    both engines floor identically on every double, while their round()
    tie rules differ."""
    return F.transform(
        vec_col, lambda x: F.floor(x * scale_col + F.lit(0.5)) / scale_col
    )


def sq8_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """SQ8 scalar-quantized search (FAISS's SQ8, public method):
    asymmetric L2 between each RAW query vector and the corpus vectors
    reconstructed through the int8 grid — the higher-accuracy form, and
    the quantization family's middle tier (4x compression vs float32 at
    near-exact ranking: 0.965 recall@10 on the clustered 1M corpus,
    SCALE_NOTES r7, vs PQ m=8's 0.10 without a refine stage).

    r14 rewrite on the ``cosine_topk`` pattern (guide §4.2): the former
    crossJoin evaluated an interpreted zip_with/aggregate HOF fold per
    (corpus row × query) pair — ~corpus × queries × dim lambda
    dispatches; now one ``mapInPandas`` stage scores each partition
    against the collected query matrix in numpy and emits only the
    partition's top-k superset per query (shuffle bounded by k, not
    corpus size). The numpy kernel replicates the pinned quantizer
    bit-for-bit — ``127/max|x|`` scale, ``floor(x*sc+0.5)/sc`` grid —
    and accumulates the squared distance dim-sequentially, the
    identical IEEE-754 op sequence as the HOF fold and the oracle's
    list_sum. Non-finite ELEMENT VALUES become SQL NULL scores and rank
    first under the ascending order, as the HOF form's null distances
    did. Degenerate-input contract (ADVICE r14): corpus rows whose
    vector is NULL or not ``dim``-sized are EXCLUDED from the ranking
    (the same contract as the sibling top-k kernels), and a NULL query
    vector is rejected at collect — unlike the pre-r14 HOF form, which
    emitted such rows with NULL distances occupying top-k slots.
    Rounding stays JVM-side (HALF_UP). Measured 1.9 → 0.9 s on
    sim_sq8_topk at sf0.1; oracle hash unchanged."""
    q_rows = (
        queries.select(query_id_col, vec_col)
        .limit(MAX_CLOSURE_QUERIES + 1)
        .collect()
    )
    if len(q_rows) > MAX_CLOSURE_QUERIES:
        raise ValueError(
            f"sq8_topk collects the query side into the scoring kernel; "
            f"got more than {MAX_CLOSURE_QUERIES} queries — batch them"
        )
    if not q_rows:
        qt = queries.schema[query_id_col].dataType.simpleString()
        it = corpus.schema[id_col].dataType.simpleString()
        return corpus.sparkSession.createDataFrame(
            [], schema=f"{query_id_col} {qt}, {id_col} {it}, sq8_dist double"
        )
    q_ids = [r[0] for r in q_rows]
    Q = np.asarray([[float(x) for x in r[1]] for r in q_rows], dtype=np.float64)
    dim = Q.shape[1]
    par = corpus.sparkSession.sparkContext.defaultParallelism
    if corpus.rdd.getNumPartitions() < par:
        corpus = corpus.repartition(par)
    id_type = corpus.schema[id_col].dataType.simpleString()
    out_schema = f"__qidx int, {id_col} {id_type}, __raw double"

    def _score_partition(batches):
        for pdf in batches:
            ids = pdf[id_col].to_numpy()
            rows = [
                (i, np.asarray(v, dtype=np.float64))
                for i, v in enumerate(pdf[vec_col])
                if v is not None and len(v) == dim
            ]
            if not rows:
                continue
            ridx = np.array([i for i, _ in rows])
            X = np.stack([a for _, a in rows])
            amax = np.abs(X).max(axis=1)
            sc = np.where(amax > 0, 127.0 / amax, 1.0)[:, None]
            DQ = np.floor(X * sc + 0.5) / sc
            acc = np.zeros((len(rows), len(q_ids)), dtype=np.float64)
            for j in range(dim):  # dim-sequential: oracle-identical order
                diff = DQ[:, j][:, None] - Q[:, j][None, :]
                acc += diff * diff
            frames = []
            for qi in range(len(q_ids)):
                col = acc[:, qi]
                finite = col[np.isfinite(col)]
                if len(finite) > k:
                    kth = np.partition(finite, k - 1)[k - 1]
                    # superset covers 6dp rounding ties; non-finite rows
                    # pass through (NaN -> SQL NULL, ranking first under
                    # asc like the HOF form's null distances)
                    keep = (col <= kth + 1e-6) | ~np.isfinite(col)
                else:
                    keep = np.ones(len(col), dtype=bool)
                frames.append(
                    pd.DataFrame(
                        {
                            "__qidx": qi,
                            id_col: ids[ridx[keep]],
                            "__raw": col[keep],
                        }
                    )
                )
            yield pd.concat(frames, ignore_index=True)

    qid_map = F.array(*[F.lit(q) for q in q_ids])
    scored = (
        corpus.select(id_col, vec_col)
        .mapInPandas(_score_partition, schema=out_schema)
        .select(
            F.element_at(qid_map, F.col("__qidx") + 1)
        .cast(queries.schema[query_id_col].dataType)
        .alias(query_id_col),
            id_col,
            F.round(F.col("__raw"), 6).alias("sq8_dist"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("sq8_dist").asc(), F.col(id_col)
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def maxsim_topk(
    tokens: DataFrame,
    query_tokens: DataFrame,
    k: int = 5,
    doc_col: str = "doc_id",
    vec_col: str = "embedding",
    qdoc_col: str = "query_doc",
) -> DataFrame:
    """Multi-vector late-interaction retrieval (ColBERT-style MaxSim,
    public method): documents and queries are BAGS of token vectors;
    ``score(q, d) = Σ_{qv∈q} max_{dv∈d} cos(qv, dv)`` — each query token
    finds its best-matching document token, scores sum over query tokens.
    Returns (qdoc_col, doc_col, maxsim_x1m) top-k per query doc, the
    score as integer micros.

    Distributed shape: the query token matrix is collected into the
    scoring closure (MAX_CLOSURE_QUERIES guard, same contract as
    ``cosine_topk``); one Arrow pass computes each partition's PARTIAL
    per-(doc, query-token) max — max is associative, so docs may span
    partitions freely — and the shuffle then carries only
    docs × query_tokens partial-max rows (never token × token). The
    per-token maxima round to integer MICROS before the sum, making the
    final score an order-free BIGINT sum (FP summation order can't flip
    a comparison, the same exact-integer trick as the PageRank and EWMA
    operators); cosines themselves accumulate dim-sequentially like
    every kernel here, so the raw maxima are bit-identical to the SQL
    oracle's list_dot_product form."""
    q_rows = (
        query_tokens.select(qdoc_col, vec_col)
        .limit(MAX_CLOSURE_QUERIES + 1)
        .collect()
    )
    if len(q_rows) > MAX_CLOSURE_QUERIES:
        raise ValueError(
            f"maxsim_topk collects the query token set into the task "
            f"closure; got more than {MAX_CLOSURE_QUERIES} query tokens — "
            "batch the query docs"
        )
    spark = tokens.sparkSession
    qdoc_type = query_tokens.schema[qdoc_col].dataType.simpleString()
    doc_type = tokens.schema[doc_col].dataType.simpleString()
    if not q_rows:
        return spark.createDataFrame(
            [],
            schema=f"{qdoc_col} {qdoc_type}, {doc_col} {doc_type}, "
            "maxsim_x1m bigint",
        )
    q_docs = [r[0] for r in q_rows]
    Q = np.asarray([[float(x) for x in r[1]] for r in q_rows], dtype=np.float64)
    dim = Q.shape[1]
    qn = np.zeros(len(q_rows), dtype=np.float64)
    for j in range(dim):
        qn += Q[:, j] * Q[:, j]
    qn = np.sqrt(qn)

    par = spark.sparkContext.defaultParallelism
    if tokens.rdd.getNumPartitions() < par:
        tokens = tokens.repartition(par)

    out_schema = f"__qidx int, {doc_col} {doc_type}, __pmax double"

    def _partial_max(batches):
        for pdf in batches:
            rows = [
                (d, np.asarray(v, dtype=np.float64))
                for d, v in zip(pdf[doc_col], pdf[vec_col])
                if v is not None and len(v) == dim
            ]
            if not rows:
                continue
            docs = np.array([d for d, _ in rows])
            X = np.stack([a for _, a in rows])
            dots = np.zeros((len(rows), len(q_rows)), dtype=np.float64)
            xn = np.zeros(len(rows), dtype=np.float64)
            for j in range(dim):  # dim-sequential: oracle-identical order
                xj = X[:, j]
                dots += xj[:, None] * Q[:, j]
                xn += xj * xj
            sims = dots / (np.sqrt(xn)[:, None] * qn[None, :])
            sims = np.where(np.isfinite(sims), sims, -np.inf)
            order = np.argsort(docs, kind="mergesort")
            sdocs, ssims = docs[order], sims[order]
            cuts = np.flatnonzero(
                np.r_[True, sdocs[1:] != sdocs[:-1]]
            )
            frames = []
            for s, e in zip(cuts, np.r_[cuts[1:], len(sdocs)]):
                pm = ssims[s:e].max(axis=0)
                frames.append(
                    pd.DataFrame(
                        {
                            "__qidx": np.arange(len(q_rows), dtype=np.int32),
                            doc_col: sdocs[s],
                            "__pmax": pm,
                        }
                    )
                )
            yield pd.concat(frames, ignore_index=True)

    # ONE doc-keyed exchange after the kernel serves BOTH aggregates (r13
    # planlint sweep, 4 -> 3): hash(doc) is a subset of the per-(doc,
    # qtoken) max key AND of the per-(qdoc, doc) sum key, so each reuses
    # the repartition's ClusteredDistribution with no further shuffle —
    # only the final top-k window (qdoc) exchanges again. The repartition
    # must sit AFTER mapInPandas: the kernel emits fresh output
    # attributes, so any partitioning of its INPUT is invisible to the
    # planner downstream. Skew bound: a doc's partial-max rows are
    # |its partitions| x |query tokens| — bounded by the closure cap.
    partial = (
        tokens.select(doc_col, vec_col)
        .mapInPandas(_partial_max, schema=out_schema)
        .repartition(F.col(doc_col))
    )
    qmap = spark.createDataFrame(
        [(i, d) for i, d in enumerate(q_docs)],
        schema=f"__qidx int, {qdoc_col} {qdoc_type}",
    )
    per_qtoken = (
        partial.groupBy(doc_col, "__qidx")
        .agg(F.max("__pmax").alias("__m"))
        .join(F.broadcast(qmap), "__qidx")
        .select(
            qdoc_col,
            doc_col,
            F.round(F.col("__m") * 1_000_000, 0).cast("bigint").alias("__micros"),
        )
    )
    scores = per_qtoken.groupBy(qdoc_col, doc_col).agg(
        F.sum("__micros").cast("bigint").alias("maxsim_x1m")
    )
    w = Window.partitionBy(qdoc_col).orderBy(
        F.col("maxsim_x1m").desc(), F.col(doc_col)
    )
    return (
        scores.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )
