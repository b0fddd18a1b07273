#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
- registers each testdata parquet as a DuckDB view,
- executes every oracle_sql.json entry,
- compares against the corresponding Spark result parquet
  (columns sorted by name, rows sorted, values rounded to 9 digits).

Usage:
    check_correctness.py [sfDir] [outDir] [q1,q2,...] [--strict] [--diff]

--strict  compare float columns at FULL precision (no round-to-9) — the
          driver's gate hashes exact values, so a row that passes the
          rounded compare but fails --strict is exactly the
          driver-red/local-green class that cost rounds 5 and 6 an
          investigation each. Run --strict before shipping any query
          whose output carries a float column.
--diff    on any mismatch, print the FIRST mismatching (row, column)
          with both values at full repr precision plus their delta,
          instead of the 3-row frame summary — names the diverging
          column immediately.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame, strict: bool) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize ints/floats (duckdb HUGEINT sums arrive as object dtype)
    for c in df.columns:
        if df[c].dtype == object:
            coerced = pd.to_numeric(df[c], errors="coerce")
            if not coerced.isna().any():
                df[c] = coerced
        if pd.api.types.is_integer_dtype(df[c]):
            # strict keeps integers INTEGER: a float64 cast would
            # compare BIGINT checksums at 2^53 precision — exactly the
            # class of silent near-miss --strict exists to catch
            df[c] = df[c].astype("Int64" if strict else "float64")
            if not strict:
                df[c] = df[c].round(9)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
            if not strict:
                df[c] = df[c].round(9)
        else:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def first_diff(e: pd.DataFrame, a: pd.DataFrame) -> str:
    """Locate the first mismatching (row, column); full-precision repr."""
    for i in range(len(e)):
        for c in e.columns:
            ev, av = e.at[i, c], a.at[i, c]
            # isna FIRST: comparing a pd.NA (nullable Int64 cell)
            # with != raises instead of returning a bool
            if pd.isna(ev) and pd.isna(av):
                continue
            if pd.isna(ev) or pd.isna(av) or ev != av:
                delta = ""
                if isinstance(ev, float) and isinstance(av, float):
                    delta = f" (delta={av - ev!r})"
                return (f"first diff at row {i} col '{c}': "
                        f"oracle={ev!r} spark={av!r}{delta}")
    return "frames compare unequal but no cell-level diff found"


def main(sf_dir: str, out_dir: str, only=None, strict=False,
         diff=False) -> int:
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
            e = canon(expected, strict)
            a = canon(actual, strict)
            if list(e.columns) != list(a.columns):
                print(f"FAIL {name}: columns {list(e.columns)} vs "
                      f"{list(a.columns)}")
                n_fail += 1
            elif len(e) != len(a):
                print(f"FAIL {name}: rows {len(e)} vs {len(a)}")
                n_fail += 1
            elif not e.equals(a):
                bad = (e != a).any(axis=1)
                if diff:
                    print(f"FAIL {name}: {first_diff(e, a)}")
                else:
                    print(f"FAIL {name}: value mismatch in "
                          f"{int(bad.sum())} rows; first:\n"
                          f"{e[bad].head(3)}\nvs\n{a[bad].head(3)}")
                n_fail += 1
            else:
                print(f"PASS {name} ({len(e)} rows)")
        except Exception as exc:  # noqa: BLE001
            print(f"ERROR {name}: {exc}")
            n_fail += 1
    mode = " [strict]" if strict else ""
    print(f"{'ALL PASS' if n_fail == 0 else f'{n_fail} FAILURES'}{mode}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = {a for a in sys.argv[1:] if a.startswith("--")}
    sys.exit(main(argv[0] if len(argv) > 0 else "/root/testdata/sf0.01",
                  argv[1] if len(argv) > 1 else "/tmp/vout",
                  set(argv[2].split(",")) if len(argv) > 2 else None,
                  strict="--strict" in flags,
                  diff="--diff" in flags))
