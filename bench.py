#!/usr/bin/env python
"""Benchmark harness: runs every catalog query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced end-to-end with a noop sink (full computation, no
driver-side row transfer), after a shared warmup that touches every
input table so JVM/codegen startup isn't billed to the first query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from twitter_to_sqlite_spark import tables
from twitter_to_sqlite_spark.plans import catalog
from twitter_to_sqlite_spark.session import get_spark


def force(df) -> int:
    # noop sink: full execution of every column, zero driver transfer.
    df.write.mode("overwrite").format("noop").save()
    return 0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark("bench")

    # Warmup: materialize each table once (parquet footer reads, codegen).
    for name in tables.TABLE_NAMES:
        tables.load_table(spark, sf_dir, name).count()

    timings: dict[str, float] = {}
    for name, q in catalog.QUERIES.items():
        t0 = time.perf_counter()
        force(q(spark, sf_dir))
        timings[name] = round(time.perf_counter() - t0, 4)

    total = round(sum(timings.values()), 4)
    print(json.dumps({
        "metric": "catalog_total_runtime",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))


if __name__ == "__main__":
    main()
