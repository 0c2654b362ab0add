#!/usr/bin/env python
"""Deterministic scale-up of the driver testdata: replicate sf0.1 K times
with id-offset remapping into a scratch dir (default .scratch/sf1.0) for
the round-4 scale-posture runs. NO randomness — replica k is a pure
function of replica 0:

  - big-table keys shift by k * 10_000_000 (divisible by 10/50, so every
    ``id % 10`` / ``% 50`` derivation keeps its distribution per replica);
    region/nation stay single-copy (constant dimensions, TPC-H style)
  - document texts of replica k > 0 get a ' rk<k>' suffix so the
    non-duplicated majority stays unique across replicas (the dup_docs
    derivation pins canonical texts to doc_id % 97 — dup GROUP COUNT is
    corpus-invariant by design, so dup group SIZE grows ~10x and pair
    counts ~100x; that superlinearity is corpus-semantic, not an engine
    artifact, and is called out in BENCH.md)
  - embeddings of replica k get a per-replica SIGNED PERMUTATION of the
    64 dims (norms and intra-replica cosines preserved EXACTLY, so the
    near-dup pair structure is exactly K x the sf0.1 one; cross-replica
    cosines decorrelate instead of exploding into cos=1 duplicate pairs)

Usage: python jobs/make_sf.py [out_dir] [K] [src_dir]
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np

OFF = 10_000_000

SHIFTS = {
    "customer": {"c_custkey"},
    "supplier": {"s_suppkey"},
    "part": {"p_partkey"},
    "orders": {"o_orderkey", "o_custkey"},
    "lineitem": {"l_orderkey", "l_partkey", "l_suppkey"},
    "events": {"event_id", "user_id"},
    "documents": {"doc_id"},
}


def _perm_signs(k: int, dims: int = 64):
    """Deterministic signed permutation for replica k (LCG-driven
    Fisher-Yates; identity for replica 0)."""
    if k == 0:
        return np.arange(dims), np.ones(dims, dtype=np.float32)
    mask = (1 << 64) - 1
    state = (k * 6364136223846793005 + 1442695040888963407) & mask

    def nxt(bound):
        nonlocal state
        state = (state * 6364136223846793005 + 1442695040888963407) & mask
        return (state >> 33) % bound

    perm = np.arange(dims)
    for i in range(dims - 1, 0, -1):
        j = nxt(i + 1)
        perm[i], perm[j] = perm[j], perm[i]
    signs = np.array([1.0 if nxt(2) == 0 else -1.0 for _ in range(dims)],
                     dtype=np.float32)
    return perm, signs


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else \
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".scratch", "sf1.0")
    k_reps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    src = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    for t in ("region", "nation"):
        con.execute(f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')) "
                    f"TO '{out}/{t}.parquet' (FORMAT PARQUET)")

    for t, keys in SHIFTS.items():
        cols = [r[0] for r in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{src}/{t}.parquet')").fetchall()]
        parts = []
        for k in range(k_reps):
            sel = []
            for c in cols:
                if c in keys:
                    sel.append(f"{c} + {k * OFF} AS {c}")
                elif t == "documents" and c == "text" and k > 0:
                    sel.append(f"text || ' rk{k}' AS text")
                elif t == "documents" and c == "n_chars" and k > 0:
                    sel.append(f"n_chars + {len(f' rk{k}')} AS n_chars")
                else:
                    sel.append(c)
            parts.append("SELECT " + ", ".join(sel)
                         + f" FROM read_parquet('{src}/{t}.parquet')")
        con.execute(f"COPY ({' UNION ALL '.join(parts)}) TO "
                    f"'{out}/{t}.parquet' (FORMAT PARQUET)")
        print(t, con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{out}/{t}.parquet')").fetchone()[0])

    # embeddings: signed permutation per replica (numpy), vec_id shift
    base = con.execute(
        f"SELECT vec_id, embedding, label FROM "
        f"read_parquet('{src}/embeddings.parquet') ORDER BY vec_id").df()
    mat = np.stack(base["embedding"].to_numpy()).astype(np.float32)
    frames = []
    import pandas as pd
    for k in range(k_reps):
        perm, signs = _perm_signs(k, mat.shape[1])
        m = (mat[:, perm] * signs).astype(np.float32)
        frames.append(pd.DataFrame({
            "vec_id": base["vec_id"].to_numpy() + k * OFF,
            "embedding": list(m),
            "label": base["label"].to_numpy()}))
    allf = pd.concat(frames, ignore_index=True)
    con.register("emb_scaled", allf)
    con.execute(f"COPY (SELECT vec_id, CAST(embedding AS FLOAT[]) AS embedding, "
                f"CAST(label AS INTEGER) AS label FROM emb_scaled ORDER BY vec_id) "
                f"TO '{out}/embeddings.parquet' (FORMAT PARQUET)")
    print("embeddings", con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{out}/embeddings.parquet')").fetchone()[0])


if __name__ == "__main__":
    main()
