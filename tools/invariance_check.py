#!/usr/bin/env python
"""Partition-count / AQE invariance twin of the correctness gate.

Re-runs the oracle-parity compare under a FOREIGN session shape —
200 shuffle partitions, AQE disabled, local[16] — i.e. deliberately
NOT the tuned session.py configuration. Catching a query whose answer
depends on partition count or on AQE's runtime re-planning here is
the point: results must be a pure function of the data.

Usage: python tools/invariance_check.py [sf_dir] [--only a,b] [--window[=N]]
(defaults to every registry entry; pass --only for the fast loop, or
--window for the head-N staleness window — both forwarded to
driver_sim's argument parser via runpy).
"""

from __future__ import annotations

import os
import runpy
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def main() -> None:
    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "200")
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    # driver_sim's get_spark getOrCreate picks up THIS session (configs
    # on an existing session are not overridden), so the whole compare
    # runs under the foreign shape.
    runpy.run_path(
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "driver_sim.py"),
        run_name="__main__",
    )


if __name__ == "__main__":
    main()
