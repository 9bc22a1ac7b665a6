"""Per-query Spark-vs-DuckDB wall-time ratio table.

Times each headline query's oracle SQL in DuckDB at a given sf_dir and
compares with Spark times from a BENCH json (or re-times Spark if asked).

Usage: python tools/ratio.py BENCH.json [sf_dir]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    bench_path = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    bench = json.load(open(bench_path))
    spark_times = bench["queries"]

    import __spark_entry__ as entrymod
    from tools.check import duck_connect

    oracles = entrymod.oracle_sql()
    con = duck_connect(sf_dir)
    rows = []
    for name, st in spark_times.items():
        sql = oracles.get(name)
        if sql is None:
            rows.append((name, st, None))
            continue
        con.execute(sql).fetchall()  # warm
        t0 = time.perf_counter()
        con.execute(sql).fetchall()
        dt = time.perf_counter() - t0
        rows.append((name, st, dt))
    rows.sort(key=lambda r: -(r[1] / r[2] if r[2] else 0))
    tot_s = sum(r[1] for r in rows)
    tot_d = sum(r[2] for r in rows if r[2])
    print(f"{'query':28s} {'spark':>8s} {'duck':>8s} {'ratio':>7s}")
    for name, st, dt in rows:
        r = f"{st / dt:6.2f}x" if dt else "   n/a"
        print(f"{name:28s} {st:8.3f} {dt if dt else float('nan'):8.3f} {r}")
    print(f"{'TOTAL':28s} {tot_s:8.3f} {tot_d:8.3f} {tot_s / tot_d:6.2f}x")


if __name__ == "__main__":
    main()
