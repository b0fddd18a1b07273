#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
- registers each testdata parquet as a DuckDB view,
- executes every oracle_sql.json entry,
- compares against the corresponding Spark result parquet
  (columns sorted by name, rows sorted, values hashed).
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize ints/floats (duckdb HUGEINT sums arrive as object dtype)
    for c in df.columns:
        if df[c].dtype == object:
            coerced = pd.to_numeric(df[c], errors="coerce")
            if not coerced.isna().any():
                df[c] = coerced
        if pd.api.types.is_integer_dtype(df[c]) or \
                pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64").round(9)
        else:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main(sf_dir: str, out_dir: str, only=None) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    if only:
        oracle = {k: v for k, v in oracle.items() if k in only}
    n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            expected = con.execute(sql).df()
            actual = pd.read_parquet(f"{out_dir}/{name}")
            e, a = canon(expected), canon(actual)
            if list(e.columns) != list(a.columns):
                print(f"FAIL {name}: columns {list(e.columns)} vs "
                      f"{list(a.columns)}")
                n_fail += 1
            elif len(e) != len(a):
                print(f"FAIL {name}: rows {len(e)} vs {len(a)}")
                n_fail += 1
            elif not e.equals(a):
                diff = (e != a).any(axis=1)
                print(f"FAIL {name}: value mismatch in {int(diff.sum())} "
                      f"rows; first:\n{e[diff].head(3)}\nvs\n"
                      f"{a[diff].head(3)}")
                n_fail += 1
            else:
                print(f"PASS {name} ({len(e)} rows)")
        except Exception as exc:  # noqa: BLE001
            print(f"ERROR {name}: {exc}")
            n_fail += 1
    print(f"{'ALL PASS' if n_fail == 0 else f'{n_fail} FAILURES'}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else
                  "/root/testdata/sf0.01",
                  sys.argv[2] if len(sys.argv) > 2 else "/tmp/vout",
                  set(sys.argv[3].split(",")) if len(sys.argv) > 3
                  else None))
