#!/usr/bin/env python
"""Refresh plans/catalog.py's LAST_VERIFIED map from the accumulated
CORRECTNESS_r{N}.json files (VERDICT r6 task 2: rotate the driver's
50-entry gate window by staleness, mechanically).

Usage: python tools/rotate_registry.py [--write]

Prints the refreshed `LAST_VERIFIED` literal (registry insertion
order, never-verified entries as 0). With --write, splices it into
plans/catalog.py in place. Run at the START of a round, after the
driver has dropped the new CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CATALOG = os.path.join(
    REPO, "twitter_to_sqlite_spark", "plans", "catalog.py")


def last_verified() -> dict[str, int]:
    last: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        rnd = int(m.group(1))
        with open(path) as fh:
            rows = json.load(fh)
        for name, row in rows.items():
            # a failed row is not a verification — keep the entry hot
            ok = (isinstance(row, dict)
                  and row.get("rows_match") and row.get("schema_match")
                  and row.get("hash_match"))
            if ok:
                last[name] = max(last.get(name, 0), rnd)
    return last


def registry_names(src: str) -> list[str]:
    m = re.search(r"_QUERY_IMPLS: dict\[str, Callable\[\[SparkSession, "
                  r"str\], DataFrame\]\] = \{(.*?)\n\}", src, re.S)
    if not m:
        raise SystemExit("could not locate _QUERY_IMPLS in catalog.py")
    return re.findall(r'^\s+"([^"]+)":', m.group(1), re.M)


def main() -> None:
    src = open(CATALOG).read()
    names = registry_names(src)
    last = last_verified()
    body = "\n".join(f'    "{n}": {last.get(n, 0)},' for n in names)
    literal = "LAST_VERIFIED: dict[str, int] = {\n" + body + "\n}"
    stale = sorted(names, key=lambda n: last.get(n, 0))[:50]
    print(literal)
    print(f"\n# gate window (first 50): "
          f"{sum(1 for n in stale if last.get(n, 0) == 0)} never-verified, "
          f"stalest round = "
          f"{min((last.get(n, 0) for n in stale if last.get(n, 0)), default=0)}",
          file=sys.stderr)
    if "--write" in sys.argv:
        new_src, n = re.subn(
            r"LAST_VERIFIED: dict\[str, int\] = \{.*?\n\}",
            literal, src, count=1, flags=re.S)
        if n != 1:
            raise SystemExit("LAST_VERIFIED block not found for --write")
        open(CATALOG, "w").write(new_src)
        print(f"wrote {CATALOG}", file=sys.stderr)


if __name__ == "__main__":
    main()
