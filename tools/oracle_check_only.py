#!/usr/bin/env python3
"""oracle_check with a query-name filter: oracle_check_only.py
<sfDir> <verifyOutDir> <name,name,...> — same compare, subset only."""
import json
import os
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows):
    def key(row):
        return tuple("\x00" if v is None else repr(v) for v in row)
    return sorted(rows, key=key)


def main(sf_dir, out_dir, names):
    con = duckdb.connect()
    con.sql("SET TimeZone='UTC'")
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        # Spark-written tables are DIRECTORIES of part files (the sf1
        # scaling fixture); the driver's are single files
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in names:
        sql = oracle[name]
        try:
            spark_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            cols_s = sorted(spark_rel.columns)
            spark_rows = con.sql(
                "SELECT " + ", ".join(f'"{c}"' for c in cols_s)
                + f" FROM '{out_dir}/{name}/*.parquet'").fetchall()
            duck_rel = con.sql(sql)
            cols_d = sorted(duck_rel.columns)
            idx = [duck_rel.columns.index(c) for c in cols_d]
            duck_rows = [tuple(r[i] for i in idx) for r in duck_rel.fetchall()]
        except Exception as e:
            print(f"FAIL {name}: ERROR {e}", flush=True)
            n_fail += 1
            continue
        if cols_s != cols_d:
            print(f"FAIL {name}: columns {cols_s} != {cols_d}", flush=True)
            n_fail += 1
            continue
        a, b = canon(spark_rows), canon(duck_rows)
        if a == b:
            print(f"PASS {name} ({len(a)} rows)", flush=True)
            n_pass += 1
        else:
            bad = next((i for i, (x, y) in enumerate(zip(a, b)) if x != y),
                       min(len(a), len(b)))
            print(f"FAIL {name}: rows {len(a)} vs {len(b)}, first diff "
                  f"{bad}:\n  spark={a[bad] if bad < len(a) else None}\n"
                  f"  duck ={b[bad] if bad < len(b) else None}", flush=True)
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail", flush=True)
    # mirror oracle_check.py: automation must see failures in the code
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3].split(","))
