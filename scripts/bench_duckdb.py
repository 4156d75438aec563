#!/usr/bin/env python3
"""DuckDB twin of the four BASELINE bench shapes, invoked by graft.Bench
so the Spark-vs-DuckDB ratio is measured by the gate itself — both
engines timed in the same uncontended run (VERDICT r8 task #6), instead
of re-measured with session-to-session variance by each judge.

Usage: bench_duckdb.py <sfDir> [threads]
Prints ONE JSON line: {"q1_scan_count": sec, ..., "duckdb_version": "..."}
Protocol: 1 warmup + 3 timed runs per shape, median, warm OS cache.
"""
import json
import os
import statistics
import sys
import time

import duckdb

sf = sys.argv[1]
threads = int(sys.argv[2]) if len(sys.argv) > 2 else (os.cpu_count() or 8)

con = duckdb.connect()
con.execute(f"SET threads TO {threads}")

def table(name):
    """Single-file parquet or a directory of part files (the generated
    10x copies are directories) — glob the parts in the latter case."""
    p = f"{sf}/{name}.parquet"
    return f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"

li = table("lineitem")
orders = table("orders")
li_cols = [r[0] for r in con.execute(f"DESCRIBE SELECT * FROM {li}").fetchall()]
hash_expr = "hash(" + ", ".join(li_cols) + ")"

shapes = {
    "q1_scan_count": f"SELECT count(*) FROM {li}",
    "q2_group_sum": f"SELECT l_returnflag, sum(l_quantity) FROM {li} GROUP BY l_returnflag",
    "q3_uniq_exact": f"SELECT count(DISTINCT o_custkey) FROM {orders}",
    "q4_hash_scan": f"SELECT sum({hash_expr} % 1000000007) FROM {li}",
}

out = {}
for name, q in shapes.items():
    con.execute(q).fetchall()  # warmup
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        con.execute(q).fetchall()
        ts.append(time.perf_counter() - t0)
    out[name] = round(statistics.median(ts), 4)
out["duckdb_version"] = duckdb.__version__
out["threads"] = threads
print(json.dumps(out))
