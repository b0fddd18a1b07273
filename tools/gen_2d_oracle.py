#!/usr/bin/env python3
"""Generate the DuckDB oracle SQL for the pinned-2D-fit queries from a
Verify dump: reads the rect layout + splits the Spark query emitted and
prints a CASE-based replay (bin by literal splits, map cells to rect
keys, aggregate, recompute woe/mean)."""
import sys

import pandas as pd


def case_chain(col, splits):
    lines = []
    for i, s in enumerate(splits):
        lines.append(f"WHEN {col} < {s!r} THEN {i}")
    return ("CASE " + " ".join(lines) + f" ELSE {len(splits)} END"
            if splits else "0")


def rect_case(rects):
    lines = []
    for key in rects:
        xs, ys = key.split(":")
        x1, x2 = map(int, xs.split("-"))
        y1, y2 = map(int, ys.split("-"))
        lines.append(f"WHEN bx BETWEEN {x1} AND {x2} "
                     f"AND by BETWEEN {y1} AND {y2} THEN '{key}'")
    return "CASE " + " ".join(lines) + " END"


def floats(s):
    return [float(x) for x in s.split(",")] if s else []


def main(out_dir):
    for q in ["q_2d_fit", "q_2d_cart", "q_cont_2d_fit"]:
        df = pd.read_parquet(f"{out_dir}/{q}")
        sx = floats(df.splits_x[0])
        sy = floats(df.splits_y[0])
        rects = list(df.rect)
        if q == "q_cont_2d_fit":
            xcol, ycol = "l_quantity", "l_discount"
            sql = f"""WITH b AS (
  SELECT {case_chain(xcol, sx)} AS bx,
         {case_chain(ycol, sy)} AS by,
         l_extendedprice AS t
  FROM lineitem),
r AS (SELECT {rect_case(rects)} AS rect, t FROM b)
SELECT rect, count(*)::BIGINT AS count,
       round(avg(t), 6) AS mean,
       '{df.splits_x[0]}' AS splits_x, '{df.splits_y[0]}' AS splits_y
FROM r GROUP BY rect ORDER BY rect"""
        else:
            xcol, ycol = "l_extendedprice", "l_quantity"
            sql = f"""WITH b AS (
  SELECT {case_chain(xcol, sx)} AS bx,
         {case_chain(ycol, sy)} AS by,
         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
  FROM lineitem),
r AS (SELECT {rect_case(rects)} AS rect, y FROM b),
agg AS (SELECT rect, count(*) AS n, sum(y) AS e, count(*) - sum(y) AS ne
        FROM r GROUP BY 1),
tot AS (SELECT sum(e)::DOUBLE te, sum(ne)::DOUBLE tne FROM agg)
SELECT rect, n::BIGINT AS count, e::BIGINT AS event,
       round(CASE WHEN e > 0 AND ne > 0
             THEN ln((ne / tne) / (e / te)) ELSE 0.0 END, 6) AS woe,
       '{df.splits_x[0]}' AS splits_x, '{df.splits_y[0]}' AS splits_y
FROM agg, tot ORDER BY rect"""
        print(f"===== {q} =====")
        print(sql)
        print()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/v2d")
