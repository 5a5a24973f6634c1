#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: run graft.Verify first
(`sbt "runMain graft.Verify <sfDir> <outDir>"`), then this script compares
each <outDir>/<query> parquet against DuckDB executing oracle_sql.json on the
same testdata. Canonicalization: columns sorted by name, doubles rounded to
6 d.p., timestamps rendered UTC ISO, rows sorted by all columns.

Usage: python3 tools/oracle_check.py <sfDir> <outDir> [query ...]
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            df[c] = s.round(6)
        elif pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.dt.strftime("%Y-%m-%dT%H:%M:%S.%f")
        elif s.dtype == object:
            # decimals, dates, lists
            df[c] = s.map(lambda v: str(v))
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    if sf_dir.startswith("-") or out_dir.startswith("-"):
        sys.exit(f"usage: oracle_check.py <sfDir> <outDir> [query ...]; "
                 f"got flag-like arg ({sf_dir!r}, {out_dir!r})")
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = n_skip = 0
    for qdir in sorted(glob.glob(os.path.join(out_dir, "q*"))):
        name = os.path.basename(qdir)
        if only and name not in only:
            continue
        files = glob.glob(os.path.join(qdir, "*.parquet"))
        if not files:
            print(f"EMPTY   {name} (no parquet written)"); n_fail += 1; continue
        got = pd.concat([pd.read_parquet(f) for f in sorted(files)])
        # the DRIVER's canonicalizer sorts rows by every column and dies on
        # array/struct cells; this local gate stringifies them (canon), so
        # fail the SHAPE explicitly here instead of passing what the driver
        # would kill (QueriesSmokeSpec enforces the same contract in-suite)
        bad_cols = [c for c in got.columns
                    if got[c].map(lambda v: isinstance(v, (np.ndarray, list, dict))).any()]
        if bad_cols:
            print(f"NONSCALAR {name}: driver-fatal array/struct columns {bad_cols}")
            n_fail += 1
            continue
        if name not in oracle:
            status = "ROWSONLY" if len(got) > 0 else "ROWSONLY-EMPTY!"
            print(f"{status} {name}: rows={len(got)}"); n_skip += 1; continue
        try:
            want = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"ORACLE-ERR {name}: {str(e)[:200]}"); n_fail += 1; continue
        g, w = canon(got.copy()), canon(want.copy())
        if list(g.columns) != list(w.columns):
            print(f"SCHEMA  {name}: engine={list(g.columns)} oracle={list(w.columns)}")
            n_fail += 1; continue
        if len(g) != len(w):
            print(f"ROWS    {name}: engine={len(g)} oracle={len(w)}")
            n_fail += 1; continue
        if g.equals(w):
            print(f"PASS    {name} ({len(g)} rows)"); n_pass += 1
        else:
            neq = (g != w) & ~(g.isna() & w.isna())
            bad_cols = [c for c in g.columns if neq[c].any()]
            print(f"VALUES  {name}: mismatched cols={bad_cols}")
            for c in bad_cols[:3]:
                idx = neq[c].idxmax()
                print(f"        first diff [{c}] row {idx}: engine={g[c][idx]!r} oracle={w[c][idx]!r}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
