#!/usr/bin/env python3
"""Full-scale (sf1) correctness gate — r12 VERDICT task 2.

Extends the 82-row spot-gate to the WHOLE registry at the 10x ScaleUp
fixture: every row whose oracle is tractable in DuckDB at sf1 is
hash-compared exactly like oracle_check.py; rows whose oracles are
inherently super-linear (all-pairs / block-quadratic recomputations —
the ops themselves are banded, their ORACLES are brute force) are
pre-excluded with a written reason, and anything that still exceeds
the per-row timeout is excluded as measured-super-linear. The artifact
(CORRECTNESS_sf1.json) records status + wall seconds + reason per row.

Usage: sf1_gate.py <sfDir> <verifyOutDir> [outJson] [timeoutSec]
Runs N_WORKERS rows concurrently, each in its own process with its own
DuckDB (threads capped so workers share the box).
"""
import json
import multiprocessing as mp
import os
import sys
import time

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

N_WORKERS = 4
ROW_CAP = 8_000_000  # beyond this an in-memory sorted compare thrashes

# oracles KNOWN to be super-linear in the data (the brute-force
# recomputation, not the op under test) — not attempted at sf1
PRE_EXCLUDED = {
    "record_linkage": "oracle is within-block quadratic levenshtein "
                      "(~100x sf0.1 cost at 10x data); sf1 evidence "
                      "via record_linkage_capped",
    "golden_record": "oracle recomputes the block-quadratic pair set "
                     "before the CC rounds; sf1 evidence via "
                     "golden_record_capped",
    "embedding_pairs": "oracle is all-pairs 64-d cosine over the "
                       "augmented corpus (~1.4e9 pairs at sf1); sf1 "
                       "evidence via embedding_pairs_lowt",
    "paraphrase_mine": "oracle is all-pairs 64-d cosine + list "
                       "jaccard over the corpus; sf1 evidence via "
                       "paraphrase_mine_capped",
}


def check_one(sf_dir, out_dir, name, sql, timeout, q):
    import duckdb
    t0 = time.time()
    try:
        con = duckdb.connect()
        con.sql("SET TimeZone='UTC'")
        con.sql(f"SET threads={max(2, 32 // N_WORKERS)}")
        for t in TABLES:
            path = f"{sf_dir}/{t}.parquet"
            if os.path.isdir(path):
                path = f"{path}/*.parquet"
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
        spark_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        cols_s = sorted(spark_rel.columns)
        n_spark = con.sql(
            f"SELECT count(*) FROM '{out_dir}/{name}/*.parquet'"
        ).fetchone()[0]
        if n_spark > ROW_CAP:
            q.put((name, "excluded",
                   f"result too large for in-memory compare ({n_spark} "
                   "rows)", time.time() - t0))
            return
        spark_rows = con.sql(
            "SELECT " + ", ".join(f'"{c}"' for c in cols_s)
            + f" FROM '{out_dir}/{name}/*.parquet'").fetchall()
        duck_rel = con.sql(sql)
        cols_d = sorted(duck_rel.columns)
        idx = [duck_rel.columns.index(c) for c in cols_d]
        duck_rows = [tuple(r[i] for i in idx) for r in duck_rel.fetchall()]
    except Exception as e:
        q.put((name, "fail", f"ERROR {e}"[:300], time.time() - t0))
        return
    if cols_s != cols_d:
        q.put((name, "fail", f"columns {cols_s} != {cols_d}",
               time.time() - t0))
        return

    def key(row):
        return tuple("\x00" if v is None else repr(v) for v in row)

    a = sorted(spark_rows, key=key)
    b = sorted(duck_rows, key=key)
    if a == b:
        q.put((name, "pass", f"{len(a)} rows", time.time() - t0))
    else:
        bad = next((i for i, (x, y) in enumerate(zip(a, b)) if x != y),
                   min(len(a), len(b)))
        sa = repr(a[bad])[:160] if bad < len(a) else None
        sb = repr(b[bad])[:160] if bad < len(b) else None
        q.put((name, "fail",
               f"rows {len(a)} vs {len(b)} first diff {bad}: "
               f"spark={sa} duck={sb}", time.time() - t0))


def main(sf_dir, out_dir, out_json, timeout, only=None):
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(only) if only else sorted(oracle)
    # a re-run over a subset MERGES into an existing artifact: fixed
    # rows replace their old status, everything else is preserved
    results = {}
    if only and os.path.exists(out_json):
        results = {k: v for k, v in
                   json.load(open(out_json))["results"].items()
                   if k not in only}
    for n, why in PRE_EXCLUDED.items():
        if (only is None or n in only) and n in oracle:
            results[n] = {"status": "excluded", "reason": why, "sec": 0.0}
    todo = [n for n in names if n not in results
            and os.path.isdir(f"{out_dir}/{n}")]
    for n in names:
        if n not in results and not os.path.isdir(f"{out_dir}/{n}"):
            results[n] = {"status": "fail",
                          "reason": "no Verify output dir", "sec": 0.0}
    running = {}  # name -> (proc, queue, start)
    i = 0
    while i < len(todo) or running:
        while i < len(todo) and len(running) < N_WORKERS:
            name = todo[i]
            i += 1
            q = mp.Queue()
            p = mp.Process(target=check_one,
                           args=(sf_dir, out_dir, name, oracle[name],
                                 timeout, q))
            p.start()
            running[name] = (p, q, time.time())
        time.sleep(0.5)
        done = []
        for name, (p, q, t0) in running.items():
            if not q.empty():
                nm, status, reason, sec = q.get()
                results[nm] = {"status": status, "reason": reason,
                               "sec": round(sec, 1)}
                print(f"{status.upper()} {nm}: {reason} ({sec:.0f}s)",
                      flush=True)
                p.join(5)
                done.append(name)
            elif time.time() - t0 > timeout:
                p.terminate()
                p.join(5)
                results[name] = {
                    "status": "excluded",
                    "reason": f"oracle exceeded {timeout}s at sf1 "
                              "(super-linear in DuckDB)",
                    "sec": round(time.time() - t0, 1)}
                print(f"EXCLUDED {name}: timeout {timeout}s", flush=True)
                done.append(name)
            elif not p.is_alive():
                results[name] = {"status": "fail",
                                 "reason": "worker died",
                                 "sec": round(time.time() - t0, 1)}
                done.append(name)
        for name in done:
            del running[name]
    n_pass = sum(1 for r in results.values() if r["status"] == "pass")
    n_fail = sum(1 for r in results.values() if r["status"] == "fail")
    n_exc = sum(1 for r in results.values() if r["status"] == "excluded")
    summary = {"sf_dir": sf_dir, "pass": n_pass, "fail": n_fail,
               "excluded": n_exc, "total": len(results),
               "results": dict(sorted(results.items()))}
    with open(out_json, "w") as f:
        json.dump(summary, f, indent=1)
    print(f"== {n_pass} pass, {n_fail} fail, {n_exc} excluded "
          f"-> {out_json}", flush=True)
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         sys.argv[3] if len(sys.argv) > 3 else "CORRECTNESS_sf1.json",
         int(sys.argv[4]) if len(sys.argv) > 4 else 600,
         set(sys.argv[5].split(",")) if len(sys.argv) > 5 else None)
