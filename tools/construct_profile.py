#!/usr/bin/env python
"""Profile DataFrame CONSTRUCTION time (q(spark, sf_dir) call only, no
action) for every catalog query — finds guide §7.3 driver-side
plan-build overhead (py4j round-trip trees, eager builds) that the
bench can't separate from execution.  Writes /tmp/construct_profile.json.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")

from twitter_to_sqlite_spark import tables
from twitter_to_sqlite_spark.plans import catalog
from twitter_to_sqlite_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("construct-profile")
    for name in tables.TABLE_NAMES:
        tables.load_table(spark, sf_dir, name).count()
    catalog.clear_caches(include_infra=True)
    for name, build in catalog.INFRA_BUILDS.items():
        build(spark, sf_dir)
    for name, build in catalog.SHARED_BUILDS.items():
        build(spark, sf_dir)

    out: dict[str, float] = {}
    for name, q in catalog.QUERIES.items():
        best = None
        for _ in range(2):  # min-of-2: absorb one-time codegen/imports
            t0 = time.perf_counter()
            q(spark, sf_dir)
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 4)
    with open("/tmp/construct_profile.json", "w") as f:
        json.dump(out, f)
    for k, v in sorted(out.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{v:8.3f}  {k}")
    print("TOTAL construct:", round(sum(out.values()), 2))


if __name__ == "__main__":
    main()
