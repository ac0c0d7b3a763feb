#!/usr/bin/env python3
"""Oracle output-type lint — the q116/q71/q217 HUGEINT class.

DuckDB promotes SUM(BIGINT) [and SUM(...) OVER ()] to HUGEINT, and a
CASE/arith mixing a HUGEINT branch infects the whole column; the
compare layer then reads int128 as float64 against Spark's int64 and
the hash goes red even when every value matches. Three rounds hit
this (q116 r13, q71 r14, q217 r15). This lint closes the class: run
`DESCRIBE (<oracle sql>)` for every oracle at a given SF and fail any
output column whose DuckDB type is HUGEINT/UHUGEINT — those can never
hash-match a Spark BIGINT column. DECIMAL outputs are reported as
warnings (legitimate only when the Spark side writes the same decimal;
the compare layer handles matching decimals, so they are not hard
failures).

Usage: python3 tools/lint_oracle_types.py <sfDir> <verifyOutDir>
  (<verifyOutDir> only needs oracle_sql.json — run graft.Verify first)
"""
import sys, json, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

HARD = ("HUGEINT", "UHUGEINT")


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_hard = n_warn = 0
    for name, sql in sorted(oracle.items()):
        try:
            cols = con.execute(f"DESCRIBE ({sql})").fetchall()
        except Exception as e:
            print(f"FAIL {name}: DESCRIBE error {e}")
            n_hard += 1
            continue
        for cname, ctype, *_ in cols:
            up = str(ctype).upper()
            if any(h in up for h in HARD):
                print(f"FAIL {name}: column {cname} is {ctype} "
                      f"(int128 -> float64 at compare; CAST to BIGINT)")
                n_hard += 1
            elif up.startswith("DECIMAL"):
                print(f"warn {name}: column {cname} is {ctype} "
                      f"(ok only if Spark writes the same decimal)")
                n_warn += 1
    print(f"{len(oracle)} oracles linted, {n_hard} hard, {n_warn} warn")
    return 1 if n_hard else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
