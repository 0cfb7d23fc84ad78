#!/usr/bin/env python
"""Dump .explain("formatted") for catalog queries to plans/<tag>/ files.

Usage: python tools/explain_dump.py --tag r10 --suffix before [--names a,b,c]

Writes plans/<tag>/<query>_<suffix>.txt for each named query (default:
all catalog queries), plus a one-line-per-query summary of plan-shape
counters (Exchange / SortMergeJoin / BroadcastHashJoin / BatchEvalPython
/ ArrowEvalPython / CartesianProduct node counts) to stdout — the
cheap, judge-checkable evidence base for optimization claims.
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from twitter_to_sqlite_spark.plans import catalog
from twitter_to_sqlite_spark.session import get_spark

COUNTERS = [
    "Exchange", "SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
    "BatchEvalPython", "ArrowEvalPython", "CartesianProduct", "Window",
    "HashAggregate", "Scan parquet",
]


def formatted(df) -> str:
    qe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return qe.explainString(mode)


def counts(text: str) -> dict[str, int]:
    return {c: len(re.findall(re.escape(c) + r"\b", text)) for c in COUNTERS}


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--tag", default="r10")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--names", default=None,
                    help="comma-separated query names (default: all)")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    names = ([n.strip() for n in args.names.split(",") if n.strip()]
             if args.names else list(catalog.QUERIES))
    unknown = [n for n in names if n not in catalog.QUERIES]
    if unknown:
        ap.error(f"unknown queries: {unknown}")

    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", args.tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("explain_dump")

    for name in names:
        try:
            df = catalog.QUERIES[name](spark, args.sf_dir)
            text = formatted(df)
        except Exception as ex:  # noqa: BLE001 - report and continue
            print(f"{name:35s} ERROR {ex}")
            continue
        path = os.path.join(out_dir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(text)
        c = counts(text)
        summary = " ".join(f"{k.replace(' ', '_')}={v}"
                           for k, v in c.items() if v)
        print(f"{name:35s} {summary}")


if __name__ == "__main__":
    main()
