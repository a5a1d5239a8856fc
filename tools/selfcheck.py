#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB oracle comparison.

Reads /tmp/graft_verify/<name>.parquet (Spark results) and
oracle_sql.json, runs each oracle in DuckDB over the same sf dir,
sorts columns by name and rows by all columns, and compares values
(floats within 1e-6 relative). Prints one line per query + a summary.
"""
import json, math, sys
import duckdb

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

oracle = json.load(open(f"{out}/oracle_sql.json"))

def norm(v):
    if v is None: return None
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return v
    return v

def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm(r[i]) for i in order))
    return [cols[i] for i in order], sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))

def eq(a, b):
    if isinstance(a, float) or isinstance(b, float):
        try:
            af, bf = float(a), float(b)
        except (TypeError, ValueError):
            return a == b
        if math.isnan(af) and math.isnan(bf): return True
        return abs(af - bf) <= 1e-6 * max(1.0, abs(af), abs(bf))
    return a == b

ok, bad, rows_only = 0, [], 0
for name in sorted(oracle):
    sql = oracle[name]
    try:
        sp = con.execute(f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')")
        sp_cols = [d[0] for d in sp.description]; sp_rows = sp.fetchall()
        dk = con.execute(sql)
        dk_cols = [d[0] for d in dk.description]; dk_rows = dk.fetchall()
    except Exception as e:
        bad.append((name, f"error: {e}")); continue
    sc, sr = canon(sp_cols, sp_rows)
    dc, dr = canon(dk_cols, dk_rows)
    if sc != dc:
        bad.append((name, f"schema: spark={sc} duck={dc}")); continue
    if len(sr) != len(dr):
        bad.append((name, f"rows: spark={len(sr)} duck={len(dr)}")); continue
    mism = None
    for i, (a, b) in enumerate(zip(sr, dr)):
        if not all(eq(x, y) for x, y in zip(a, b)):
            mism = (i, a, b); break
    if mism:
        bad.append((name, f"values@{mism[0]}: spark={mism[1]} duck={mism[2]}")); continue
    ok += 1

import os
no_oracle = [n for n in
             (f for f in os.listdir(out) if os.path.isdir(os.path.join(out, f)))
             if n not in oracle]
print(f"PASS {ok}/{len(oracle)} with-oracle; no-oracle (rows-only): {sorted(no_oracle)}")
for n, why in bad:
    print(f"FAIL {n}: {why[:400]}")
