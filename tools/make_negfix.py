#!/usr/bin/env python3
"""Negative-domain fixture variant for the div-vs-floor sweep
(PERF_NOTES r12): copies an sf dir with events.value shifted down by
$50 (about half the rows go NEGATIVE, with non-integer cents) and
events.ts shifted back 55 years (pre-1970 => negative epoch), leaving
every other table untouched. Any query whose integer-division /
bucketing sites disagree cross-engine on the negative domain
(truncate-toward-zero vs floor) fails its oracle hash here while both
engines still run the same SQL-visible data.

Usage: make_negfix.py <srcSfDir> <dstDir>
"""
import sys

import duckdb

src, dst = sys.argv[1], sys.argv[2]
con = duckdb.connect()
con.sql("SET TimeZone='UTC'")
import os
os.makedirs(dst, exist_ok=True)
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "documents", "embeddings"]:
    con.sql(f"COPY (SELECT * FROM '{src}/{t}.parquet') TO "
            f"'{dst}/{t}.parquet' (FORMAT PARQUET)")
con.sql(f"""COPY (SELECT event_id,
      ts - INTERVAL 55 YEAR AS ts,
      user_id, event_type,
      round(value - 50.0, 2) AS value, props
    FROM '{src}/events.parquet') TO '{dst}/events.parquet'
    (FORMAT PARQUET)""")
neg = con.sql(f"SELECT min(value), max(value), min(ts), "
              f"sum(CASE WHEN value < 0 THEN 1 ELSE 0 END) "
              f"FROM '{dst}/events.parquet'").fetchone()
print("negfix written:", neg)
