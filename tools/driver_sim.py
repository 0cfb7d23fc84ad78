#!/usr/bin/env python
"""Local twin of the driver's correctness gate, with per-query timing.

Runs every __spark_entry__.queries() entry at sf0.01 next to its DuckDB
oracle, compares rows/schema/value-hash the way the driver does
(columns sorted by name, values canonicalized through pandas, multiset
hash), and prints a table sorted by wall time so the slow tail of the
correctness pass is visible.

Usage: python tools/driver_sim.py [sf_dir] [--only name,name] [--window[=N]]

--window runs just the first N entries of queries() (default 50) —
QUERIES is staleness-ordered, so that IS the driver's next
certification window. ~5× cheaper per-commit loop; the closing
battery still runs the full registry.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entry_mod
from twitter_to_sqlite_spark.session import get_spark

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _canon_df(pdf):
    """Canonicalize a pandas frame the way a hash-compare driver would:
    columns sorted by name, every value stringified with float rounding,
    rows sorted, then one sha256 over the whole thing."""
    import pandas as pd

    pdf = pdf[sorted(pdf.columns)]
    cells = []
    for _, row in pdf.iterrows():
        r = []
        for v in row:
            if v is None or (isinstance(v, float) and v != v):
                r.append("<null>")
            elif isinstance(v, float):
                r.append(f"{v:.6g}")
            elif isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
                r.append(json.dumps([str(x) for x in v]))
            else:
                r.append(str(v))
        cells.append("\x1f".join(r))
    cells.sort()
    return hashlib.sha256("\x1e".join(cells).encode()).hexdigest()


def main() -> None:
    # Accept both `--only=a,b` and `--only a,b` (argparse-style).
    argv = sys.argv[1:]
    args: list[str] = []
    only = None
    window = None
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--only":
            if i + 1 >= len(argv):
                sys.exit("--only needs a comma-separated name list")
            only = set(argv[i + 1].split(","))
            i += 2
            continue
        if a.startswith("--only="):
            only = set(a.split("=", 1)[1].split(","))
        elif a == "--window":
            window = 50
        elif a.startswith("--window="):
            window = int(a.split("=", 1)[1])
        else:
            args.append(a)
        i += 1
    sf_dir = args[0] if args else "/root/testdata/sf0.01"

    spark = get_spark("driver-sim")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries = entry_mod.queries()
    if window is not None:
        # queries() is staleness-ordered (never-verified first), so
        # the head-N slice is exactly the driver's next gate window.
        queries = dict(list(queries.items())[:window])
    oracles = entry_mod.oracle_sql()
    results = {}
    t_start = time.perf_counter()
    for name, q in queries.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            sdf = q(spark, sf_dir)
            spdf = sdf.toPandas()
            sql = oracles.get(name)
            if sql is None:
                results[name] = {"rows": len(spdf), "hash_match": None,
                                 "t": round(time.perf_counter() - t0, 2)}
                continue
            opdf = con.execute(sql).df()
            rows_match = len(spdf) == len(opdf)
            schema_match = sorted(spdf.columns) == sorted(opdf.columns)
            hash_match = (rows_match and schema_match
                          and _canon_df(spdf) == _canon_df(opdf))
            results[name] = {
                "rows_match": rows_match, "schema_match": schema_match,
                "hash_match": hash_match, "rows": len(spdf),
                "t": round(time.perf_counter() - t0, 2),
            }
        except Exception as e:  # noqa: BLE001
            results[name] = {"err": f"{type(e).__name__}: {e}"[:200],
                             "t": round(time.perf_counter() - t0, 2)}
    total = time.perf_counter() - t_start

    bad = {n: r for n, r in results.items()
           if r.get("err") or r.get("hash_match") is False}
    for n, r in sorted(results.items(), key=lambda kv: -kv[1]["t"]):
        flag = ("ERR " if r.get("err")
                else "FAIL" if r.get("hash_match") is False
                else "  ok" if r.get("hash_match")
                else "rows")
        print(f"{flag} {r['t']:7.2f}s {n}  {r.get('err', '')}")
    print(f"\nTOTAL {total:.1f}s  n={len(results)}  bad={len(bad)}")
    if bad:
        print(json.dumps(bad, indent=1))
        sys.exit(1)


if __name__ == "__main__":
    main()
