#!/usr/bin/env python3
"""Sampled-slice parity for O(n²)-oracle dedup queries (VERDICT r8 item 4).

At sf0.1 the brute-force DuckDB oracle for llm_dedup_ngram is infeasible
(5000 docs → 12.5M pairs × ~1000-gram list intersections), so the driver
only hash-checks it at sf0.01. This check closes the gap: the SPARK side
runs on the FULL sf0.1 corpus (so the prefix filter executes with the
real document-frequency order), and its output pairs are then restricted
to a deterministic doc_id slice (doc_id % mod == 0 on BOTH endpoints).
Jaccard depends only on the two documents — not on the rest of the
corpus — so those pairs must equal the brute-force oracle run on the
sliced documents table exactly. 0 mismatches = the full-corpus sf0.1
execution is verified on the feasible sub-square.

Usage: python3 tools/slice_parity.py <sfDir> <verifyOutDir> <query> <mod> [residue]
  (expects <verifyOutDir>/<query>/ parquet from a FULL-corpus graft.Verify
   run and <verifyOutDir>/oracle_sql.json; sweep residue over 0..mod-1 to
   verify every same-residue pair)
"""
import sys, json
from pathlib import Path

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main():
    sf_dir, out_dir, query, mod = sys.argv[1], sys.argv[2], sys.argv[3], int(sys.argv[4])
    res = int(sys.argv[5]) if len(sys.argv) > 5 else 0
    sql = json.loads(Path(out_dir, "oracle_sql.json").read_text())[query]
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir, f"{t}.parquet")
        if not p.exists():
            continue
        if t == "documents":
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{p}' WHERE doc_id % {mod} = {res}")
        else:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    want = con.execute(sql).df()
    got = con.execute(
        f"SELECT * FROM '{Path(out_dir, query)}/*.parquet' "
        f"WHERE doc_a % {mod} = {res} AND doc_b % {mod} = {res} "
        f"ORDER BY doc_a, doc_b").df()
    want = want.sort_values(list(want.columns)).reset_index(drop=True)
    got = got.sort_values(list(got.columns)).reset_index(drop=True)
    print(f"[slice] query={query} mod={mod} residue={res} "
          f"slice_docs={con.execute('SELECT count(*) FROM documents').fetchone()[0]} "
          f"spark_pairs={len(got)} oracle_pairs={len(want)}")
    if list(got.columns) != list(want.columns):
        print(f"[slice] FAIL column mismatch: {list(got.columns)} vs {list(want.columns)}")
        sys.exit(1)
    if len(got) != len(want):
        gk = set(map(tuple, got[["doc_a", "doc_b"]].values.tolist()))
        wk = set(map(tuple, want[["doc_a", "doc_b"]].values.tolist()))
        print(f"[slice] FAIL row count; spark-only={sorted(gk - wk)[:5]} "
              f"oracle-only={sorted(wk - gk)[:5]}")
        sys.exit(1)
    bad = 0
    for c in got.columns:
        if got[c].dtype.kind == "f":
            diff = (got[c] - want[c]).abs().max()
            if not (got[c].equals(want[c]) or diff == 0.0):
                print(f"[slice] FAIL col {c} maxAbsDiff={diff}")
                bad += 1
        elif not got[c].astype("int64").equals(want[c].astype("int64")):
            print(f"[slice] FAIL col {c} value mismatch")
            bad += 1
    if bad:
        sys.exit(1)
    print(f"[slice] PASS {query}: {len(got)} pairs cell-exact on the slice")


if __name__ == "__main__":
    main()
