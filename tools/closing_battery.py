#!/usr/bin/env python
"""The round's closing battery, as ONE mechanical step (VERDICT r7
task 3: twice a late commit landed after the "final" gate run, leaving
README/BENCH_LOCAL counts off by the tail commits).

Runs, in order, each in a FRESH process:
  1. full gate twin            (tools/driver_sim.py, sf0.01)
  2. partition invariance      (tools/invariance_check.py, sf0.001)
  3. full bench                (bench.py at $SPARK_GRAFT_SF_DIR,
                                written to BENCH_LOCAL.json)
  4. registry-count consistency check: README's advertised counts
     must equal len(catalog.QUERIES) — prints the lines to fix if not.
  5. README test-count check (VERDICT r8 task 4: the "NNN tests"
     tree line drifted twice from hand edits): pytest --collect-only
     is the source of truth for the COUNT. The tree line is rewritten
     to the collected count (and still fails, so the rewrite gets
     committed and re-gated); the Status line's "**X passed + Y
     skipped" is asserted to SUM to the collected count — the battery
     never runs the suite, so the X/Y split must come from a real
     full-suite run, which the round protocol performs separately.

Exit code is non-zero if any stage fails, so the round's LAST commit
can gate on `python tools/closing_battery.py`. Budget ~20 min.

Usage: python tools/closing_battery.py [--skip-bench]
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run(cmd: list[str], log: str) -> tuple[int, str]:
    t0 = time.monotonic()
    with open(log, "w") as fh:
        p = subprocess.run(cmd, stdout=fh, stderr=subprocess.STDOUT,
                           cwd=REPO)
    dt = time.monotonic() - t0
    tail = open(log).read()[-3000:]
    return p.returncode, f"[{dt:.0f}s] {tail}"


def main() -> None:
    skip_bench = "--skip-bench" in sys.argv
    from twitter_to_sqlite_spark.plans import catalog

    n = len(catalog.QUERIES)
    failures: list[str] = []

    print(f"closing battery: {n} registry entries", flush=True)

    rc, tail = run([sys.executable, "tools/driver_sim.py"],
                   "/tmp/battery_gate.log")
    m = re.search(r"TOTAL .* n=(\d+)\s+bad=(\d+)", tail)
    ok = rc == 0 and m and int(m.group(1)) == n and m.group(2) == "0"
    print(f"1. gate twin: {'OK' if ok else 'FAIL'} "
          f"({m.group(0) if m else tail[-300:]})", flush=True)
    if not ok:
        failures.append("gate")

    rc, tail = run([sys.executable, "tools/invariance_check.py",
                    "/root/testdata/sf0.001"],
                   "/tmp/battery_invariance.log")
    m = re.search(r"TOTAL .* n=(\d+)\s+bad=(\d+)", tail)
    ok = rc == 0 and m and int(m.group(1)) == n and m.group(2) == "0"
    print(f"2. invariance: {'OK' if ok else 'FAIL'} "
          f"({m.group(0) if m else tail[-300:]})", flush=True)
    if not ok:
        failures.append("invariance")

    if not skip_bench:
        rc, tail = run([sys.executable, "bench.py"],
                       "/tmp/battery_bench.log")
        # bench prints the FULL-detail line first (all per-query
        # timings + builds — what BENCH_LOCAL archives) and a compact
        # driver-facing line last; keep the full one.
        line = None
        for ln in open("/tmp/battery_bench.log").read().splitlines():
            if ln.startswith("{") and '"builds"' in ln:
                line = ln
                break
        ok = rc == 0 and line is not None
        if ok:
            with open(os.path.join(REPO, "BENCH_LOCAL.json"), "w") as fh:
                fh.write(line + "\n")
            d = json.loads(line)
            print(f"3. bench: OK ({d['value']}s, "
                  f"{len(d['queries'])} entries -> BENCH_LOCAL.json)",
                  flush=True)
        else:
            print(f"3. bench: FAIL {tail[-300:]}", flush=True)
            failures.append("bench")
    else:
        print("3. bench: SKIPPED (--skip-bench)", flush=True)

    # 4. README count consistency: the FIRST "NNN catalog queries"
    # claim (the current Status paragraph; later ones are history)
    # and the tree listing's "NNN named queries" line must both match
    # the live registry.
    readme = open(os.path.join(REPO, "README.md")).read()
    ok4 = True
    for pat, where in ((r"(\d+) catalog queries", "Status paragraph"),
                       (r"(\d+) named queries", "tree listing")):
        m4 = re.search(pat, readme)
        if not m4 or int(m4.group(1)) != n:
            print(f"4. README: STALE count "
                  f"{m4.group(1) if m4 else 'none'} != {n} "
                  f"(update the {where})", flush=True)
            ok4 = False
    if ok4:
        print(f"4. README: query counts agree ({n})", flush=True)
    else:
        failures.append("readme")

    # 5. README test counts vs pytest collection (the battery never
    # RUNS the suite, so it only asserts what collection can prove):
    # the tree listing's "NNN tests" must equal the collected count
    # (rewritten as a convenience, still a failure so the rewrite gets
    # committed and re-gated), and the Status paragraph's
    # "**X passed + Y skipped" must SUM to the collected count — the
    # X/Y split itself must come from a real suite run, which the
    # round protocol performs separately.
    rc, tail = run([sys.executable, "-m", "pytest", "--collect-only",
                    "-q", "tests/"], "/tmp/battery_collect.log")
    mc = re.search(r"(\d+) tests collected",
                   open("/tmp/battery_collect.log").read())
    if rc != 0 or not mc:
        print(f"5. test count: FAIL collecting ({tail[-200:]})",
              flush=True)
        failures.append("collect")
    else:
        total = int(mc.group(1))
        src = open(os.path.join(REPO, "README.md")).read()
        new = re.sub(r"\d+ tests:", f"{total} tests:", src, count=1)
        if new != src:
            open(os.path.join(REPO, "README.md"), "w").write(new)
            print(f"5. README tree test count: REWRITTEN to {total} "
                  "collected — commit the diff and re-run", flush=True)
            failures.append("readme-tests")
        ms = re.search(r"\*\*(\d+) passed \+ (\d+)", new)
        if not ms:
            # A missing/reformatted suite-claim line is exactly the
            # drift this check exists to catch — never fall through
            # to the agree branch (ADVICE r9).
            print("5. README suite claim: '**X passed + Y skipped' "
                  "line not found — restore it from a fresh "
                  "full-suite run", flush=True)
            failures.append("readme-tests")
        elif int(ms.group(1)) + int(ms.group(2)) != total:
            print(f"5. README suite claim: {ms.group(1)} passed + "
                  f"{ms.group(2)} skipped != {total} collected — "
                  "update from a fresh full-suite run", flush=True)
            failures.append("readme-tests")
        elif "readme-tests" not in failures:
            print(f"5. README test counts: agree ({total} collected)",
                  flush=True)

    if failures:
        print(f"BATTERY FAILED: {failures}", flush=True)
        sys.exit(1)
    print("BATTERY GREEN", flush=True)


if __name__ == "__main__":
    main()
