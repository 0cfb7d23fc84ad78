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
    # --stage a,b,c: park never-verified entries BEHIND the window
    # this round (sentinel 99); the next round's plain rotation
    # recomputes them to 0 from the CORRECTNESS files, putting them at
    # the top of that round's window (the r5-staged-queries protocol —
    # used when the current window is reserved for re-certification).
    staged: set[str] = set()
    for a in sys.argv[1:]:
        if a.startswith("--stage="):
            staged = set(a.split("=", 1)[1].split(","))
    unknown = staged - set(names)
    if unknown:
        raise SystemExit(f"--stage names not in registry: {unknown}")

    def key(n):
        return 99 if n in staged else last.get(n, 0)

    body = "\n".join(f'    "{n}": {key(n)},' for n in names)
    literal = "LAST_VERIFIED: dict[str, int] = {\n" + body + "\n}"
    stale = sorted(names, key=key)[:50]
    print(literal)
    print(f"\n# gate window (first 50): "
          f"{sum(1 for n in stale if key(n) == 0)} never-verified, "
          f"stalest round = "
          f"{min((key(n) for n in stale if key(n)), default=0)}"
          + (f", staged for next round: {sorted(staged)}" if staged else ""),
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
