#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>
For each query in oracle_sql.json: run the SQL in DuckDB over the sf tables,
load the Spark parquet result, sort columns by name and rows by all columns,
and compare values exactly.
"""
import json, sys, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> list:
    df = df.reindex(sorted(df.columns), axis=1)
    rows = []
    for t in df.itertuples(index=False):
        row = []
        for v in t:
            if isinstance(v, float):
                row.append("%.10g" % v)
            elif hasattr(v, "isoformat"):
                row.append(v.isoformat())
            else:
                row.append(str(v))
        rows.append(tuple(row))
    return sorted(rows)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    # oracle_sql.json is dual-keyed (bare name + <name>.parquet, same SQL);
    # normalize to the suffixed file-name key and dedup.
    oracles = {(k if k.endswith(".parquet") else k + ".parquet"): v
               for k, v in oracles.items()}
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            want = canon(con.sql(sql).df())
            got = canon(pd.read_parquet(f"{out_dir}/{name}"))
            if want == got:
                print(f"PASS {name} ({len(got)} rows)")
                n_pass += 1
            else:
                n_fail += 1
                print(f"FAIL {name}: spark={len(got)} duck={len(want)} rows")
                only_g = [r for r in got if r not in set(want)][:3]
                only_w = [r for r in want if r not in set(got)][:3]
                print(f"  spark-only: {only_g}")
                print(f"  duck-only:  {only_w}")
        except Exception as e:
            n_fail += 1
            print(f"ERROR {name}: {e}")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
