"""Deterministic scale-up of the driver testdata: N disjoint key universes
of sf0.1 -> sf{0.1*N} under .scratch/ (gitignored; /root/testdata is
read-only).

Why replication instead of fresh synthesis: the goal is MEASURED
sf0.1 -> sf1 scaling factors for the headline queries (VERDICT r12 #1),
which needs data whose distributions match what the queries were tuned
on. Each copy shifts every key family by a disjoint stride (referential
integrity preserved within a copy; joins never cross copies), so group
cardinalities scale xN while per-group row counts stay put — the same
growth law as TPC-H's own scale factors. region/nation stay fixed
(TPC-H semantics: dimension tables do not scale).

Two tables are PERTURBED so copy-level duplication does not change the
workload's character:
- documents: every 7th word (per-copy phase) is rewritten to a
  copy-specific token, pushing cross-copy Jaccard far below near-dup
  thresholds — otherwise every doc gains 9 near-identical twins and the
  MinHash/LSH candidate space grows quadratically in copies instead of
  linearly (x45 pairs, not x10). n_chars is recomputed.
- embeddings: deterministic per-(copy, row) jitter ~2% of component
  scale, so kNN/ANN neighborhoods stay non-degenerate (10 identical
  copies of every vector would make top-k ties meaningless).

Run: python tools/make_scale_data.py [N] [src_sf_dir] [out_dir]
Defaults: 10 /root/testdata/sf0.1 /root/repo/.scratch/sf1
"""

import os
import re
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

STRIDES = {
    "customer": {"c_custkey": 10_000_000},
    "supplier": {"s_suppkey": 1_000_000},
    "part": {"p_partkey": 10_000_000},
    "orders": {"o_orderkey": 100_000_000, "o_custkey": 10_000_000},
    "lineitem": {
        "l_orderkey": 100_000_000,
        "l_partkey": 10_000_000,
        "l_suppkey": 1_000_000,
    },
    "events": {"event_id": 100_000_000, "user_id": 10_000_000},
    "documents": {"doc_id": 1_000_000},
    "embeddings": {"vec_id": 1_000_000},
}

FIXED = ("region", "nation")

_WORD = re.compile(r"\S+")


def _perturb_text(text: str, copy: int) -> str:
    if text is None:
        return None
    words = _WORD.findall(text)
    for i in range(copy % 7, len(words), 7):
        words[i] = f"c{copy}tok{i % 13}"
    return " ".join(words)


def _one_copy(name: str, table: pa.Table, copy: int) -> pa.Table:
    cols = {c: table.column(c) for c in table.column_names}
    out = {}
    for c in table.column_names:
        arr = cols[c]
        stride = STRIDES.get(name, {}).get(c)
        if stride is not None and copy > 0:
            shifted = pa.compute.add(arr, pa.scalar(copy * stride, arr.type))
            out[c] = shifted
        else:
            out[c] = arr
    if name == "documents" and copy > 0:
        texts = [
            _perturb_text(t, copy) for t in cols["text"].to_pylist()
        ]
        out["text"] = pa.array(texts, type=pa.string())
        out["n_chars"] = pa.array(
            [None if t is None else len(t) for t in texts], type=pa.int64()
        )
    if name == "embeddings" and copy > 0:
        rng = np.random.RandomState(1_000 + copy)
        vecs = cols["embedding"].to_pylist()
        jittered = []
        for v in vecs:
            if v is None:
                jittered.append(None)
                continue
            x = np.asarray(v, dtype=np.float32)
            scale = float(np.abs(x).mean()) or 1.0
            jittered.append(
                (x + rng.uniform(-0.02, 0.02, len(x)).astype(np.float32) * scale).tolist()
            )
        out["embedding"] = pa.array(jittered, type=pa.list_(pa.float32()))
    return pa.table(
        [out[c] for c in table.column_names], schema=table.schema
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    dst = (
        sys.argv[3]
        if len(sys.argv) > 3
        else "/root/repo/.scratch/sf1"
    )
    os.makedirs(dst, exist_ok=True)
    for name in FIXED:
        t = pq.read_table(f"{src}/{name}.parquet")
        pq.write_table(t, f"{dst}/{name}.parquet", version="2.6")
        print(f"{name}: {t.num_rows} rows (fixed dim)")
    for name in STRIDES:
        t = pq.read_table(f"{src}/{name}.parquet")
        outdir = f"{dst}/{name}.parquet"
        os.makedirs(outdir, exist_ok=True)
        for copy in range(n):
            pq.write_table(
                _one_copy(name, t, copy),
                f"{outdir}/part-{copy:03d}.parquet",
                version="2.6",
            )
        print(f"{name}: {t.num_rows} x {n} rows")


if __name__ == "__main__":
    main()
