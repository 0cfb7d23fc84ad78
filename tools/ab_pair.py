#!/usr/bin/env python
"""Controlled reversed-order A/B for a pair of catalog queries
(VERDICT r7 task 2: pagerank 2.1x / containment 1.6x on the official
r7 bench vs r6 — untouched operators, suspected host bounce).

One invocation = ONE fresh JVM that warms the tables, then times the
named queries in the given order with bench.py's noop-sink force.
The wrapper mode (--runs N) execs itself N times with the order
reversed on alternate runs, so order effects and JVM state are
controlled away and only host noise or a real regression remains.

Usage:
  python tools/ab_pair.py --runs 4 [--sf-dir D] pagerank containment
  python tools/ab_pair.py --one pagerank containment   # single JVM
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_one(names: list[str], sf_dir: str) -> dict[str, float]:
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
    from twitter_to_sqlite_spark import tables
    from twitter_to_sqlite_spark.plans import catalog
    from twitter_to_sqlite_spark.session import get_spark

    spark = get_spark("ab_pair")
    for name in tables.TABLE_NAMES:
        tables.load_table(spark, sf_dir, name).count()
    out: dict[str, float] = {}
    for n in names:
        t0 = time.monotonic()
        catalog.QUERIES[n](spark, sf_dir).write.mode(
            "overwrite").format("noop").save()
        out[n] = round(time.monotonic() - t0, 2)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf-dir",
                    default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                           "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=0,
                    help="wrapper mode: N fresh-JVM runs, order "
                         "reversed on odd runs")
    ap.add_argument("--one", action="store_true",
                    help="worker mode: time once in THIS process")
    args = ap.parse_args()

    if args.one:
        print("ABRESULT " + json.dumps(run_one(args.queries, args.sf_dir)))
        return

    if args.runs < 1:
        ap.error("wrapper mode needs --runs N (N >= 1), "
                 "or pass --one to time in this process")
    results = []
    for i in range(args.runs):
        order = list(args.queries) if i % 2 == 0 else list(
            reversed(args.queries))
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one",
             "--sf-dir", args.sf_dir] + order,
            capture_output=True, text=True, cwd=REPO)
        line = next((ln for ln in p.stdout.splitlines()
                     if ln.startswith("ABRESULT ")), None)
        if line is None:
            print(f"run {i}: FAILED\n{p.stderr[-2000:]}", file=sys.stderr)
            sys.exit(1)
        r = json.loads(line[len("ABRESULT "):])
        r["__order"] = ",".join(order)
        results.append(r)
        print(json.dumps(r), flush=True)
    for q in args.queries:
        vals = [r[q] for r in results]
        print(f"{q}: min={min(vals)} max={max(vals)} "
              f"all={vals}")


if __name__ == "__main__":
    main()
