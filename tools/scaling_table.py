#!/usr/bin/env python3
"""Join two Bench artifacts (sf0.1 and sf1 runs of the same code) into
the per-row scaling table for PERF_NOTES: ratio = t(sf1)/t(sf0.1) on a
10x dataset. Flags rows above the linear-with-log-headroom bound.

Usage: scaling_table.py <bench_sf01.json> <bench_sf1.json> [boundX=12]
"""
import json
import sys


def qmap(path):
    d = json.load(open(path))
    return d["queries"], d


def main(p01, p1, bound=12.0):
    q01, d01 = qmap(p01)
    q1, d1 = qmap(p1)
    names = sorted(set(q01) & set(q1))
    rows = []
    for n in names:
        a, b = q01[n], q1[n]
        # sub-100ms sf0.1 rows: ratio is jitter-dominated; use a floor
        ratio = b / max(a, 0.05)
        rows.append((ratio, n, a, b))
    rows.sort(reverse=True)
    over = [r for r in rows if r[0] > bound and r[3] > 1.0]
    print(f"| rows | {len(names)} | sf0.1 total {sum(q01[n] for n in names):.1f} s"
          f" | sf1 total {sum(q1[n] for n in names):.1f} s |")
    print(f"over {bound}x (and >1s at sf1): {len(over)}")
    print()
    print("| query | sf0.1 s | sf1 s | ratio |")
    print("|---|---|---|---|")
    for ratio, n, a, b in rows[:25]:
        flag = " **>12x**" if (ratio > bound and b > 1.0) else ""
        print(f"| `{n}`{flag} | {a:.3f} | {b:.3f} | {ratio:.1f}x |")
    import statistics
    med = statistics.median(r[0] for r in rows)
    print()
    print(f"median ratio {med:.1f}x; load sf1 run: "
          f"{d1['load']['avg1mBefore']:.1f}->{d1['load']['avg1mAfter']:.1f}, "
          f"wall {d1['load']['wallSec']:.0f}s, iters {d1['load']['iters']}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         float(sys.argv[3]) if len(sys.argv) > 3 else 12.0)
