"""Recall@10 vs exact for every ANN structure at stress scale — the
recall-vs-cost curve a user choosing between LSH / IVF / PQ-ADC / IVF-PQ
(and between the medoid and kmeans PQ codebooks) actually needs
(VERDICT r5 #3/#4).

Corpus: the sf0.1 embeddings table (2,000 x 64) tiled ``copies`` times with
a deterministic xxhash64 perturbation (same construction as
tools/stress.py embeddings_stress) and MATERIALIZED to parquet, so every
leg reads identical bytes and leg wall-times are comparable. Queries = the
first ``n_queries`` base vectors. Ground truth is computed driver-side in
numpy from one Arrow collect of the corpus — this is a measurement
harness, not an operator; at 1M x 64 the matrix is ~256 MB.

Each structure is measured at 2-3 operating points; recall is against the
metric the structure actually ranks by (cosine for LSH/IVF, euclidean for
PQ-ADC/IVF-PQ — the corpus is unnormalized, so the two rankings differ and
mixing them would understate everything). Output: one JSON line per leg
(name, params, recall@10, wall seconds, bytes-touched fraction where the
structure bounds it) + a summary table for SCALE_NOTES.

Round 7 adds a CLUSTERED corpus mode (VERDICT r6 #1): the uniform tiled
corpus is vector quantization's WORST case (no cluster structure for the
coarse quantizer to exploit), so the round-6 table's "relative orderings
transfer to real data" reading was an assertion. ``mode=clustered``
generates a deterministic mixture of Gaussians — ``n_centers`` centers
drawn N(0, 1) in 64-d from a fixed seed, each vector = its
hash-assigned center + N(0, sigma^2) per-dim noise seeded per vec_id —
the shape real embedding corpora (topic/domain clusters) actually have,
and re-runs the same 12 operating points so the two tables are
column-comparable.

Usage: python tools/ab_ann_recall.py [copies] [n_queries] [mode]
       (copies=500 -> 1,000,000 vectors; copies=10 for a quick sanity run;
        mode = uniform (default) | clustered)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from pyspark.sql import functions as F

from wms_data_pipeline_spark.operators import similarity as sim
from wms_data_pipeline_spark.session import get_spark


def build_corpus(spark, copies: int, work: str) -> str:
    emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    n = emb.count()
    cdf = spark.range(copies).select(F.col("id").alias("copy"))
    tiled = (
        emb.crossJoin(cdf)
        .select(
            (F.col("vec_id") + F.col("copy") * n).alias("vec_id"),
            F.expr(
                "transform(embedding, (x, i) -> x + cast(pmod("
                f"xxhash64((vec_id + copy * {n}) * 64 + i), 1000) as double)"
                " / 500.0 - 1.0)"
            ).cast("array<float>").alias("embedding"),
        )
        .repartition(64)
    )
    path = os.path.join(work, "corpus")
    tiled.write.mode("overwrite").parquet(path)
    return path


def build_clustered_corpus(
    spark, n_vectors: int, work: str, n_centers: int = 100,
    sigma: float = 0.5, dim: int = 64, seed: int = 42,
) -> str:
    """Deterministic mixture-of-Gaussians corpus: centers ~ N(0, I) in
    ``dim`` dims (inter-center distance ~ sqrt(2*dim) ≈ 11.3), cluster
    assignment = splitmix64(vec_id) % n_centers (near-equal multinomial
    sizes; a driver-side stable hash, NOT xxhash64 — see hash_cluster),
    per-vector noise ~ N(0, sigma^2 I) from an RNG seeded by
    vec_id — so the corpus is identical regardless of partitioning or
    parallelism. sigma=0.5 gives intra-cluster radius ~ sigma*sqrt(dim) =
    4, well inside the center spacing: clusters are distinct but not
    degenerate points. Materialized to parquet like the uniform path so
    every leg reads identical bytes."""
    import pandas as pd

    rng = np.random.default_rng(seed)
    centers = rng.normal(0.0, 1.0, (n_centers, dim))

    def gen(batches):
        for pdf in batches:
            vecs = []
            for vid in pdf["id"]:
                c = int(np.uint64(hash_cluster(int(vid), n_centers)))
                noise = np.random.default_rng(int(vid)).normal(0.0, sigma, dim)
                vecs.append((centers[c] + noise).astype(np.float32).tolist())
            yield pd.DataFrame({"vec_id": pdf["id"], "embedding": vecs})

    def hash_cluster(vid: int, k: int) -> int:
        # xxhash64 is JVM-side; driver-side we need the same assignment only
        # to be DETERMINISTIC, not identical to xxhash64 — use a splitmix64
        # step, stable across processes
        x = (vid + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
        x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
        x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
        return (x ^ (x >> 31)) % k

    base = spark.range(n_vectors).repartition(64)
    out = base.mapInPandas(gen, schema="vec_id long, embedding array<float>")
    path = os.path.join(work, "corpus")
    out.write.mode("overwrite").parquet(path)
    return path


def exact_topk(X: np.ndarray, ids: np.ndarray, Q: np.ndarray, qids, metric: str, k=10):
    """Ground-truth top-k id sets per query, numpy brute force."""
    out = {}
    if metric == "cosine":
        nx = np.sqrt((X * X).sum(axis=1))
        nq = np.sqrt((Q * Q).sum(axis=1))
    for i, qid in enumerate(qids):
        if metric == "cosine":
            score = -(X @ Q[i]) / (nx * nq[i])  # ascending = best first
        else:
            score = ((X - Q[i]) ** 2).sum(axis=1)
        out[qid] = set(ids[np.argsort(score, kind="stable")[:k]].tolist())
    return out


def mean_recall(result_rows, truth, k=10):
    got: dict = {}
    for r in result_rows:
        got.setdefault(r[0], set()).add(r[1])
    recs = [len(got.get(q, set()) & t) / k for q, t in truth.items()]
    return round(sum(recs) / len(recs), 3)


def main() -> None:
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    mode = sys.argv[3] if len(sys.argv) > 3 else "uniform"
    work = tempfile.mkdtemp(prefix="ab_ann_")
    spark = get_spark("ab-ann-recall")
    spark.sparkContext.setLogLevel("ERROR")
    try:
        if mode == "clustered":
            path = build_clustered_corpus(spark, copies * 2000, work)
        else:
            path = build_corpus(spark, copies, work)
        corpus = spark.read.parquet(path)
        total = corpus.count()
        print(f"corpus: {total} vectors x 64 dims ({mode}) at {path}", flush=True)

        pdf = corpus.toPandas()
        ids = pdf["vec_id"].to_numpy()
        X = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
        del pdf
        queries = corpus.filter(F.col("vec_id") < n_queries).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        q_rows = queries.collect()
        qids = [r.query_id for r in q_rows]
        Q = np.array([[float(x) for x in r.embedding] for r in q_rows])
        truth_cos = exact_topk(X, ids, Q, qids, "cosine")
        truth_l2 = exact_topk(X, ids, Q, qids, "l2")
        del X

        results = []

        def leg(name, params, truth, thunk, touched=None):
            t0 = time.perf_counter()
            rows = [(r[0], r[1]) for r in thunk().collect()]
            wall = round(time.perf_counter() - t0, 1)
            rec = mean_recall(rows, truth)
            row = {"leg": name, **params, "recall_at_10": rec, "wall_sec": wall}
            if touched is not None:
                row["corpus_fraction_scanned"] = touched
            results.append(row)
            print(json.dumps(row), flush=True)

        for n_tables in (1, 2, 4):
            leg(
                "lsh", {"n_planes": 8, "n_tables": n_tables}, truth_cos,
                lambda nt=n_tables: sim.ann_topk_lsh(
                    corpus, queries, k=10, n_planes=8, n_tables=nt
                ),
                touched=round(n_tables / 2 ** 8, 4),
            )
        for nlist, nprobe in ((256, 8), (256, 16), (256, 32)):
            leg(
                "ivf", {"nlist": nlist, "nprobe": nprobe}, truth_cos,
                lambda nl=nlist, np_=nprobe: sim.ivf_topk(
                    corpus, queries, k=10, nlist=nl, nprobe=np_
                ),
                touched=round(nprobe / nlist, 4),
            )
        for kcode, cb in ((16, "medoid"), (256, "medoid"), (256, "kmeans")):
            leg(
                "pq_adc", {"m": 8, "kcode": kcode, "codebook": cb}, truth_l2,
                lambda kc=kcode, c=cb: sim.pq_adc_topk(
                    corpus, queries, k=10, m=8, kcode=kc, codebook=c
                ),
                touched=1.0,  # scans all codes (8 B/vec), never the vectors
            )
        for nprobe, cb in ((16, "medoid"), (16, "kmeans"), (32, "kmeans")):
            leg(
                "ivfpq",
                {"nlist": 256, "nprobe": nprobe, "m": 8, "kcode": 256, "codebook": cb},
                truth_l2,
                lambda np_=nprobe, c=cb: sim.ivfpq_topk(
                    corpus, queries, k=10, nlist=256, nprobe=np_, m=8,
                    kcode=256, codebook=c,
                ),
                touched=round(nprobe / 256, 4),
            )

        # SQ8 ground truth is computable driver-side from the corpus matrix
        # (the quantizer is a closed-form per-row map) — exact replica of
        # sim.sq8_topk's pinned floor(x*sc+0.5)/sc grid, so the number in
        # SCALE_NOTES is rerunnable, not a one-off
        t0 = time.perf_counter()
        pdf_all = corpus.toPandas()
        Xall = np.stack(
            [np.asarray(v, dtype=np.float64) for v in pdf_all["embedding"]]
        )
        ids_all = pdf_all["vec_id"].to_numpy()
        del pdf_all
        am = np.abs(Xall).max(axis=1, keepdims=True)
        sc = np.where(am > 0, 127.0 / am, 1.0)
        DQ = np.floor(Xall * sc + 0.5) / sc
        recs = []
        for i, qid in enumerate(qids):
            d = ((DQ - Q[i]) ** 2).sum(axis=1)
            got = set(ids_all[np.argsort(d, kind="stable")[:10]].tolist())
            recs.append(len(got & truth_l2[qid]) / 10)
        row = {
            "leg": "sq8", "compression_vs_f32": 4.0,
            "recall_at_10": round(sum(recs) / len(recs), 3),
            "wall_sec": round(time.perf_counter() - t0, 1),
            "corpus_fraction_scanned": 1.0,
        }
        results.append(row)
        print(json.dumps(row), flush=True)
        del Xall, DQ

        for nprobe, cand_n in ((16, 50), (16, 100)):
            leg(
                "ivfpq_rerank",
                {"nlist": 256, "nprobe": nprobe, "cand": cand_n, "m": 8,
                 "kcode": 256, "codebook": "medoid"},
                truth_l2,
                lambda np_=nprobe, c=cand_n: sim.ivfpq_rerank_topk(
                    corpus, queries, k=10, cand=c, nlist=256, nprobe=np_,
                    m=8, kcode=256,
                ),
                touched=round(nprobe / 256, 4),
            )

        # codebook reconstruction-quality A/B (corpus-wide mean MSE)
        for cb in ("medoid", "kmeans"):
            t0 = time.perf_counter()
            mse = sim.pq_encode(corpus, m=8, k=256, codebook=cb).agg(
                F.avg("mse").alias("mse")
            ).collect()[0]["mse"]
            row = {
                "leg": "pq_encode_mse", "m": 8, "kcode": 256, "codebook": cb,
                "mean_mse": round(float(mse), 4),
                "wall_sec": round(time.perf_counter() - t0, 1),
            }
            results.append(row)
            print(json.dumps(row), flush=True)

        print("\n=== summary (paste into SCALE_NOTES) ===")
        for r in results:
            params = ", ".join(
                f"{k}={v}" for k, v in r.items()
                if k not in ("leg", "recall_at_10", "wall_sec", "mean_mse")
            )
            tail = (
                f"recall@10={r['recall_at_10']}" if "recall_at_10" in r
                else f"mean_mse={r['mean_mse']}"
            )
            print(f"{r['leg']:16s} {params:60s} {tail}  ({r['wall_sec']}s)")
    finally:
        spark.stop()
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
