#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB over the testdata parquet tables, load the corresponding Spark result
parquet written by graft.Verify, canonicalize (sort columns by name, sort
rows, normalize dtypes) and compare exactly.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>
"""
import json, sys, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]")
        elif s.dtype == object:
            # dates / decimals / bytes → string canon
            df[c] = s.map(lambda v: str(v) if v is not None else None)
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok, bad = [], []
    for name, sql in sorted(oracle.items()):
        try:
            exp = con.execute(sql).df()
            files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
            if not files:
                bad.append((name, "no spark output")); continue
            got = con.execute(
                f"SELECT * FROM read_parquet({files!r})").df()
            e, g = canon(exp), canon(got)
            if list(e.columns) != list(g.columns):
                bad.append((name, f"columns differ: oracle={list(e.columns)} spark={list(g.columns)}")); continue
            if len(e) != len(g):
                bad.append((name, f"rowcount differs: oracle={len(e)} spark={len(g)}")); continue
            try:
                pd.testing.assert_frame_equal(e, g, check_dtype=False, check_exact=True)
                ok.append(name)
            except AssertionError as ex:
                # find first differing cell for a useful message
                msg = str(ex).split("\n")[0]
                for c in e.columns:
                    neq = ~((e[c] == g[c]) | (e[c].isna() & g[c].isna()))
                    if neq.any():
                        i = int(np.argmax(neq.values))
                        msg = f"col {c} row {i}: oracle={e[c].iloc[i]!r} spark={g[c].iloc[i]!r}"
                        break
                bad.append((name, msg))
        except Exception as ex:
            bad.append((name, f"error: {ex}"))
    for n in ok: print(f"  OK   {n}")
    for n, m in bad: print(f"  FAIL {n}: {m}")
    print(f"{len(ok)}/{len(oracle)} match")
    sys.exit(0 if not bad else 1)

if __name__ == "__main__":
    main()
