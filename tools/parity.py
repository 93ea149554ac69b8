#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare (SURVEY.md §5.3.3).

Usage: python3 tools/parity.py <sfDir> <verifyOutDir> [query ...]

Reads <verifyOutDir>/oracle_sql.json, registers each test table as a DuckDB
view over <sfDir>/*.parquet, runs every oracle SQL, and compares against the
parquet the Verify main dumped per query: column-name sets, row counts, and
cell-exact values (columns sorted by name, mirroring the driver). Floats are
compared exactly; near-misses report max abs diff to aid debugging.
"""
import sys, json, math
from pathlib import Path

import duckdb
import pandas as pd
import numpy as np

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns and unify datetime units (the driver does the same).

    Deliberately does NOT coerce numeric dtypes: the driver's hash is typed,
    so an int64-vs-float64 column (e.g. DuckDB HUGEINT landing as float64)
    must FAIL here too — that exact class slipped through in round 2 when
    this function silently converted Decimals before comparing values.
    Decimal objects are still converted (both engines emit them only via
    explicit casts that match), but the conversion is recorded so compare()
    can surface a dtype diff instead of masking it.
    """
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    return df


def dtype_key(s: pd.Series) -> str:
    """Comparable dtype label; object columns are labelled by cell type."""
    d = str(s.dtype)
    if d == "object" and len(s):
        v = next((x for x in s if x is not None), None)
        if v is not None:
            return f"object[{type(v).__name__}]"
    return d


def cells_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        return (math.isnan(a) and math.isnan(b)) or a == b
    if isinstance(a, (list, np.ndarray)) or isinstance(b, (list, np.ndarray)):
        la, lb = list(a), list(b)
        return len(la) == len(lb) and all(cells_equal(x, y) for x, y in zip(la, lb))
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    return a == b


def compare(name: str, ours: pd.DataFrame, oracle: pd.DataFrame):
    ours, oracle = normalize(ours), normalize(oracle)
    if list(ours.columns) != list(oracle.columns):
        return False, f"columns differ: ours={list(ours.columns)} oracle={list(oracle.columns)}"
    if len(ours) != len(oracle):
        return False, f"row count differs: ours={len(ours)} oracle={len(oracle)}"
    # Typed compare first: the driver hashes typed values, so dtype drift
    # (int64 vs float64, float64 vs object[Decimal]) is a real failure even
    # when every cell is numerically equal.
    dt_bad = [(c, dtype_key(ours[c]), dtype_key(oracle[c]))
              for c in ours.columns if dtype_key(ours[c]) != dtype_key(oracle[c])]
    if dt_bad:
        c, a, b = dt_bad[0]
        return False, f"dtype differs on col {c}: ours={a} oracle={b} (nCols={len(dt_bad)})"
    for c in ours.columns:
        av, bv = ours[c].tolist(), oracle[c].tolist()
        bad = [i for i in range(len(av)) if not cells_equal(av[i], bv[i])]
        if bad:
            i = bad[0]
            extra = ""
            if isinstance(av[i], float) and isinstance(bv[i], float):
                diffs = [abs(x - y) for x, y in zip(av, bv)
                         if isinstance(x, float) and isinstance(y, float)
                         and not (math.isnan(x) or math.isnan(y))]
                extra = f" (maxAbsDiff={max(diffs):.3e}, nBad={len(bad)})"
            return False, f"col {c} row {i}: ours={av[i]!r} oracle={bv[i]!r}{extra}"
    return True, "ok"


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle_sql = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    declared = {p.name for p in Path(out_dir).iterdir() if p.is_dir()}
    n_pass = n_fail = 0
    for name in sorted(declared | set(oracle_sql)):
        if only and name not in only:
            continue
        if name not in oracle_sql:
            print(f"NOTE {name}: no oracle (rows-only check) rows="
                  + str(len(con.sql(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df())))
            continue
        if name not in declared:
            print(f"FAIL {name}: oracle declared but no query output dir")
            n_fail += 1
            continue
        try:
            ours = con.sql(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
        except Exception as e:
            print(f"FAIL {name}: cannot read our output: {e}")
            n_fail += 1
            continue
        try:
            theirs = con.sql(oracle_sql[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        ok, msg = compare(name, ours, theirs)
        if ok:
            n_pass += 1
            print(f"PASS {name}")
        else:
            n_fail += 1
            print(f"FAIL {name}: {msg}")
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
