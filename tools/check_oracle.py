#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, registers the parquet tables of
<sfDir> as DuckDB views, runs each oracle, and compares against the
parquet the Spark side wrote — columns sorted by name, values compared
exactly (with a tiny float tolerance fallback reported separately).
"""
import sys, json, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        qdir = f"{out_dir}/{name}"
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_bad += 1; continue
        try:
            exp = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); n_bad += 1; continue
        got = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchdf()
        exp = exp.reindex(sorted(exp.columns), axis=1)
        got = got.reindex(sorted(got.columns), axis=1)
        if list(exp.columns) != list(got.columns):
            print(f"FAIL {name}: cols exp={list(exp.columns)} got={list(got.columns)}")
            n_bad += 1; continue
        if len(exp) != len(got):
            print(f"FAIL {name}: rows exp={len(exp)} got={len(got)}")
            n_bad += 1; continue
        # exact compare in row order (both sides ORDER BY'd)
        bad_cols = []
        for c in exp.columns:
            ev, gv = exp[c], got[c]
            try:
                eq = (ev.isna() & gv.isna()) | (ev == gv)
            except Exception:
                eq = ev.astype(str) == gv.astype(str)
            if not eq.all():
                i = (~eq).idxmax()
                bad_cols.append((c, ev[i], gv[i], int((~eq).sum())))
        if bad_cols:
            print(f"FAIL {name}: {bad_cols[:3]}")
            n_bad += 1
        else:
            print(f"ok   {name} ({len(exp)} rows)")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} bad ==")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
