#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each query result
parquet written by graft.Verify, run the corresponding oracle SQL in DuckDB
over the sfDir tables and compare (columns sorted by name, rows sorted).

Usage: check_oracle.py <sfDir> <verifyOutDir>
"""
import json, math, sys
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
prefixes = sys.argv[3].split(",") if len(sys.argv) > 3 else None

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return str(v)

n_pass = n_fail = 0
for name, sql in sorted(oracle.items()):
    if prefixes and not any(name.startswith(p) for p in prefixes):
        continue
    try:
        got = duckdb.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'",
                         connection=con)
        got_cols = sorted(got.columns)
        got_rows = sorted(tuple(canon(v) for v in r)
                          for r in got.select(", ".join(f'"{c}"' for c in got_cols)).fetchall())
        want = con.sql(sql)
        want_cols = sorted(want.columns)
        want_rows = sorted(tuple(canon(v) for v in r)
                           for r in want.select(", ".join(f'"{c}"' for c in want_cols)).fetchall())
        if got_cols != want_cols:
            print(f"FAIL {name}: columns {got_cols} != {want_cols}")
            n_fail += 1
        elif got_rows != want_rows:
            diff = [(a, b) for a, b in zip(got_rows, want_rows) if a != b]
            print(f"FAIL {name}: {len(got_rows)} vs {len(want_rows)} rows; "
                  f"first diffs: {diff[:3]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got_rows)} rows)")
            n_pass += 1
    except Exception as e:
        print(f"ERROR {name}: {e}")
        n_fail += 1

print(f"\n{n_pass} passed, {n_fail} failed")
sys.exit(1 if n_fail else 0)
