#!/usr/bin/env python3
"""Materialize the PINNED sf0.1 sub-corpus for the dedup-family sweep
(round 17; r16 verdict item 6).

Nine registry queries (t35/t36/t37, t54, t56, t67/t68, t72, t74) are
excluded from the plain sf0.1 sweep because their ORACLES are
quadratic/recursive in DuckDB — an oracle-side cost, not an engine
limit. This shrinks the ORACLE's corpus instead of the engine's: an
id-sampled subset of the sf0.1 documents/embeddings (deterministic,
`id % mod == 0` — an odd modulus keeps both doc-id parities, which
t68/t72 split on), written as a full testdata-layout directory so the
SAME Verify + compare.py gate runs end-to-end on it. The remaining
eight tables are copied from the small seed dir purely so compare.py's
view creation binds — the nine queries read only documents/embeddings.

Usage: make_subsample.py <sf0.1-dir> <small-seed-dir> <dest-dir> [mod=3]
"""
import duckdb, os, shutil, sys

def main():
    src_big, src_small, dst = sys.argv[1], sys.argv[2], sys.argv[3]
    mod = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    assert mod % 2 == 1, "modulus must be odd to keep both doc-id parities"
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.execute(
        f"COPY (SELECT * FROM read_parquet('{src_big}/documents.parquet') "
        f"WHERE doc_id % {mod} = 0 ORDER BY doc_id) "
        f"TO '{dst}/documents.parquet' (FORMAT PARQUET)")
    con.execute(
        f"COPY (SELECT * FROM read_parquet('{src_big}/embeddings.parquet') "
        f"WHERE vec_id % {mod} = 0 ORDER BY vec_id) "
        f"TO '{dst}/embeddings.parquet' (FORMAT PARQUET)")
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events"]:
        shutil.copyfile(f"{src_small}/{t}.parquet", f"{dst}/{t}.parquet")
    n_docs = con.execute(
        f"SELECT count(*) FROM read_parquet('{dst}/documents.parquet')").fetchone()[0]
    n_emb = con.execute(
        f"SELECT count(*) FROM read_parquet('{dst}/embeddings.parquet')").fetchone()[0]
    print(f"subsample at {dst}: mod={mod} documents={n_docs} embeddings={n_emb}")

if __name__ == "__main__":
    main()
