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
--timeout=N  bound each ORACLE replay to N seconds (duckdb
          con.interrupt() from a watchdog thread). A handful of
          oracles are deliberately brute-force pair generators
          (completeness proofs for the engine's blocked joins:
          q_fuzzy_pairs, q_setsim_join, the near-dup family) and go
          quadratic in DuckDB at sf0.1+ — the ENGINE is near-linear;
          only the replay SQL is O(n²). A timed-out query prints SKIP
          (not FAIL): its engine result is hash-verified at the
          driver's sf0.01 gate where the brute-force replay is cheap.
--scaled  replace known-quadratic oracle SQL with the bounded
          rewrites in SCALED_ORACLE below (same exact verify — e.g.
          levenshtein / intersection arithmetic — but candidate
          generation uses the same deletion-variant / prefix-token
          blocking the engine proves complete at sf0.01). Lets the
          strict full-set replay finish at sf0.1 with zero skips.
"""
import json
import sys
import threading

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Queries whose oracle SQL pins SOLVER-DERIVED literals (optimal-bin
# splits, counterfactual points) computed at the driver's sf0.01
# gate. The solve is not SQL-expressible, so the oracle encodes the
# solved model for the GATE dataset; replaying that SQL at any other
# SF compares an sf0.01 model against an sf0.1 fit and mismatches by
# construction. At non-gate SFs these print SKIP (sf-pinned) — their
# engine results remain hash-verified where the pinned oracle is
# valid.
#
# Why each remaining row is irreducibly solver-literal (r10 audit,
# after the piecewise family was de-pinned via ExactFit's shared
# expression IR):
#  - q_2d_fit / q_2d_cart / q_cont_2d_fit: the 2D rectangle solver's
#    output is a branch-and-bound SEARCH RESULT over exponentially
#    many rectangle layouts; there is no closed form to replay, and
#    enumerating layouts in SQL is the solver itself.
#  - q_counterfactual: same class — the found counterfactual is a
#    B&B search output over bin assignments.
#  - q_mdlp_splits: MDLP is a RECURSION whose structure (which
#    segment splits next, when the MDL criterion stops) is decided by
#    comparisons of entropies — transcendental functions of the
#    counts. A recursive-CTE replay would hinge on DuckDB's ln() and
#    the JVM's Math.log() agreeing to the last ulp on every argmin
#    comparison, an assumption the engine's exact-parity discipline
#    exists to avoid (the de-pinned fits compare only doubles both
#    engines DERIVED through identical IEEE +,-,*,/ sequences; ln
#    is correctly-rounded in neither engine). The pinned oracle
#    instead verifies the invariant exactly: per-bin (count, event)
#    re-aggregated from raw data at the solved cut points.
SF_PINNED = {
    "q_2d_cart", "q_2d_fit", "q_cont_2d_fit",
    "q_counterfactual",
    "q_mdlp_splits",
}
GATE_SF_DIR = "sf0.01"

# Bounded rewrites for oracles whose DRIVER-GATE form is deliberately
# brute-force (completeness proofs, O(n²) pairs). Used only with
# --scaled, only by this local tool — the driver's sf0.01 gate keeps
# the brute-force originals. Each rewrite keeps the EXACT verify
# arithmetic and output shape; only candidate generation switches to
# the blocking whose completeness the sf0.01 brute-force run proves.
# (q_kcore is NOT here: its oracle is edge-blocked and, since its
# round CTEs became AS MATERIALIZED — DuckDB otherwise inlines each
# twice-referenced edge CTE, re-deriving e0 transitively — it runs in
# under a second at sf0.1; no timeout needed.)
SCALED_ORACLE: dict = {
    # prefix-filter blocking (Chaudhuri et al.): under one global token
    # order, two sets with Jaccard >= 19/20 must share a token within
    # each one's (ls - ceil(0.95*ls) + 1)-prefix; candidates then
    # verify with the ORIGINAL exact intersection/union arithmetic.
    "q_setsim_join": r"""
        WITH t AS (
          SELECT doc_id, list_sort(list_distinct(list_filter(
                   string_split_regex(lower(trim(text)), '\s+'),
                   x -> x <> ''))) AS s
          FROM documents WHERE text IS NOT NULL),
        tt AS (SELECT doc_id, s, len(s) AS ls FROM t WHERE len(s) > 0),
        pre AS (
          SELECT doc_id, ls,
                 unnest(s[1 : ls - ((19 * ls + 19) // 20) + 1]) AS tok
          FROM tt),
        cand AS (
          SELECT DISTINCT a.doc_id AS ia, b.doc_id AS ib
          FROM pre a JOIN pre b ON a.tok = b.tok
                                AND a.doc_id < b.doc_id
          WHERE 20 * least(a.ls, b.ls) >= 19 * greatest(a.ls, b.ls)),
        p AS (
          SELECT ia, ib, len(list_intersect(a.s, b.s))::BIGINT AS i,
                 len(list_distinct(a.s || b.s))::BIGINT AS u
          FROM cand JOIN tt a ON a.doc_id = cand.ia
                    JOIN tt b ON b.doc_id = cand.ib),
        q AS (SELECT * FROM p WHERE 20 * i >= 19 * u)
        SELECT count(*) AS n_pairs,
               COALESCE(sum(ia + ib), 0)::BIGINT AS id_sum,
               COALESCE(sum(i), 0)::BIGINT AS inter_sum,
               COALESCE(sum(u), 0)::BIGINT AS uni_sum
        FROM q""",
    # O(n log n) skyline: survivor iff qty strictly exceeds the max
    # qty at every strictly-lower price AND equals its own price
    # group's max — the same dominance predicate as the NOT EXISTS
    # original, evaluated with one group-max + one running window max.
    "q_skyline": r"""
        WITH p AS (
          SELECT l_orderkey, l_linenumber,
                 CAST(FLOOR(l_extendedprice) AS BIGINT) AS price_fl,
                 CAST(FLOOR(l_quantity) AS BIGINT) AS qty
          FROM lineitem
          WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL),
        g AS (SELECT price_fl, max(qty) AS mq FROM p GROUP BY 1),
        r AS (SELECT price_fl, mq,
                     max(mq) OVER (ORDER BY price_fl
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING) AS m1
              FROM g),
        sky AS (SELECT price_fl, mq FROM r
                WHERE m1 IS NULL OR mq > m1)
        SELECT a.l_orderkey, a.l_linenumber, a.price_fl, a.qty
        FROM p a JOIN sky s ON a.price_fl = s.price_fl
                           AND a.qty = s.mq
        ORDER BY a.price_fl, a.qty, a.l_orderkey, a.l_linenumber""",
}


class AbandonedConnection(TimeoutError):
    """interrupt() failed to cancel within the grace join: the worker
    thread may still be executing on the connection, and concurrent use
    of one DuckDB connection is unsafe — the caller must abandon it and
    reconnect before the next oracle."""


def run_sql(con, sql: str, timeout_s):
    """Execute oracle SQL; interrupt and raise TimeoutError past bound."""
    if not timeout_s:
        return con.execute(sql).df()
    out = {}

    def work():
        try:
            out["df"] = con.execute(sql).df()
        except Exception as exc:  # noqa: BLE001 — re-raised on main thread
            out["exc"] = exc

    t = threading.Thread(target=work, daemon=True)
    t.start()
    t.join(timeout_s)
    if t.is_alive():
        con.interrupt()
        t.join(30)
        if t.is_alive():
            raise AbandonedConnection(
                f"oracle replay exceeded {timeout_s}s and did not "
                f"cancel within the 30s grace join")
        raise TimeoutError(f"oracle replay exceeded {timeout_s}s")
    if "exc" in out:
        raise out["exc"]
    return out["df"]


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
         diff=False, timeout=None, scaled=False) -> int:
    def connect():
        c = duckdb.connect()
        for t in TABLES:
            c.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        return c
    con = connect()
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    if scaled:
        oracle = {k: SCALED_ORACLE.get(k, v) for k, v in oracle.items()}
    if only:
        oracle = {k: v for k, v in oracle.items() if k in only}
    n_fail = 0
    n_skip = 0
    pinned_ok = GATE_SF_DIR in sf_dir
    for name, sql in sorted(oracle.items()):
        if name in SF_PINNED and not pinned_ok:
            print(f"SKIP {name}: sf-pinned oracle (solver-derived "
                  f"literals valid at the {GATE_SF_DIR} gate only)")
            n_skip += 1
            continue
        try:
            expected = run_sql(con, sql, timeout)
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
        except AbandonedConnection as exc:
            # the worker thread may still be running on `con` —
            # abandon it (daemon thread dies with the process) and
            # reconnect so the remaining oracles run on a clean,
            # single-user connection
            print(f"SKIP {name}: {exc} — connection abandoned and "
                  f"re-established for the remaining oracles",
                  flush=True)
            con = connect()
            n_skip += 1
        except TimeoutError as exc:
            print(f"SKIP {name}: {exc} — quadratic oracle replay "
                  f"(engine result hash-verified at the sf0.01 gate); "
                  f"re-run with --scaled for a bounded rewrite",
                  flush=True)
            n_skip += 1
        except Exception as exc:  # noqa: BLE001
            print(f"ERROR {name}: {exc}")
            n_fail += 1
    mode = " [strict]" if strict else ""
    skip = f" ({n_skip} skipped: sf-pinned or oracle timeout)" \
        if n_skip else ""
    print(f"{'ALL PASS' if n_fail == 0 else f'{n_fail} FAILURES'}"
          f"{mode}{skip}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = {a for a in sys.argv[1:] if a.startswith("--")}
    timeout_s = None
    for f in flags:
        if f.startswith("--timeout="):
            timeout_s = float(f.split("=", 1)[1])
    sys.exit(main(argv[0] if len(argv) > 0 else "/root/testdata/sf0.01",
                  argv[1] if len(argv) > 1 else "/tmp/vout",
                  set(argv[2].split(",")) if len(argv) > 2 else None,
                  strict="--strict" in flags,
                  diff="--diff" in flags,
                  timeout=timeout_s,
                  scaled="--scaled" in flags))
