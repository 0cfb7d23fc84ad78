#!/usr/bin/env python
"""One-shot mechanical split of plans/catalog.py (VERDICT r8 task 7).

The 12.7k-line catalog is sliced into contiguous chunk modules at
section boundaries, preserving top-level definition order EXACTLY —
no block is reordered, so every import-time reference stays backward
(the original single file executed top-to-bottom, so import-time
forward references were impossible). Modules chain via star imports
with cumulative ``__all__`` (explicitly including underscore names),
and catalog.py stays the façade: docstring + registries
(INFRA_BUILDS/_QUERY_IMPLS/LAST_VERIFIED/QUERIES/ORACLE_SQL) + the
registry-sync assertion, so tools/rotate_registry.py's regexes and
every ``catalog.<name>`` reference in tests keep working.

The ONLY blocks that move are call-time forward references ACROSS the
chosen boundaries (a function body in module i naming a global defined
in module j>i — legal in one namespace, a NameError across chained
modules): each such target is verified to be a dependency-free
top-level Assign (cache dicts / integer constants) and hoisted to the
end of module 1. Anything else aborts the split.

Usage: python tools/split_catalog.py [--write]
"""

from __future__ import annotations

import ast
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PLANS = os.path.join(REPO, "twitter_to_sqlite_spark", "plans")
CATALOG = os.path.join(PLANS, "catalog.py")

# (module_name, first_line) — boundaries fall between top-level blocks
# (asserted below). catalog.py keeps lines 1-13 (docstring) and
# REGISTRY_START..end (the registry + sync assertion).
DOC_END = 13
MODULES = [
    ("_q01_relational", 14),
    ("_q02_search_events", 598),
    ("_q03_dedup", 826),
    ("_q04_analytics", 1227),
    ("_q05_text_multimodal", 3870),
    ("_q06_curation_streaming", 6888),
    ("_q07_quantized_drift", 8633),
    ("_q08_eval_ops", 10033),
]
REGISTRY_START = 11979

MODULE_DOC = {
    "_q01_relational":
        "Catalog chunk 1: core relational operators (SURVEY "
        "§2.5-2.8) + shared helpers (_t) and hoisted caches.",
    "_q02_search_events":
        "Catalog chunk 2: text search (SURVEY §2.9) and "
        "event-time operators (sessionization, as-of join).",
    "_q03_dedup":
        "Catalog chunk 3: dedup family (exact/minhash/simhash/"
        "jaccard) + clear_caches.",
    "_q04_analytics":
        "Catalog chunk 4: r2-r4 analytics (ANN tiers, sketches, "
        "graph, stats, CDC, sampling).",
    "_q05_text_multimodal":
        "Catalog chunk 5: text analysis + multimodal + substring "
        "dedup + weighted sampling.",
    "_q06_curation_streaming":
        "Catalog chunk 6: r5-r6 curation extensions + artifact "
        "store + stream/batch agreement certification.",
    "_q07_quantized_drift":
        "Catalog chunk 7: r7 quantized ANN (PQ/IVFPQ), drift "
        "(EMD/PSI), DSIR, planners, kNN graph.",
    "_q08_eval_ops":
        "Catalog chunk 8: eval metrics, sweeps, certificates, "
        "ops/maintenance queries.",
}


def main() -> None:
    src = open(CATALOG).read()
    lines = src.splitlines(keepends=True)
    tree = ast.parse(src)

    bounds = [m[1] for m in MODULES[1:]] + [REGISTRY_START]
    spans = [(n.lineno, n.end_lineno) for n in tree.body]
    for b in bounds:
        inside = [s for s in spans if s[0] < b <= s[1]]
        assert not inside, f"boundary {b} falls inside block {inside}"

    def module_of(lineno: int) -> int:
        """Index into MODULES, or -1 for the façade regions."""
        if lineno <= DOC_END or lineno >= REGISTRY_START:
            return -1
        idx = -1
        for i, (_, start) in enumerate(MODULES):
            if lineno >= start:
                idx = i
        return idx

    # top-level defined names -> (block index, module index)
    defined: dict[str, int] = {}
    block_names: list[list[str]] = []
    for i, node in enumerate(tree.body):
        names: list[str] = []
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef,
                             ast.ClassDef)):
            names = [node.name]
        elif isinstance(node, ast.Assign):
            names = [t.id for t in node.targets if isinstance(t, ast.Name)]
        elif isinstance(node, ast.AnnAssign) and isinstance(
                node.target, ast.Name):
            names = [node.target.id]
        elif isinstance(node, (ast.Import, ast.ImportFrom)):
            # __future__ flags are per-module compiler directives, not
            # re-exportable values
            if not (isinstance(node, ast.ImportFrom)
                    and node.module == "__future__"):
                names = [(a.asname or a.name).split(".")[0]
                         for a in node.names]
        block_names.append(names)
        for n in names:
            defined.setdefault(n, i)

    def refs(node) -> set[str]:
        out: set[str] = set()

        class V(ast.NodeVisitor):
            def visit_Name(self, n):
                if isinstance(n.ctx, ast.Load) and n.id in defined:
                    out.add(n.id)

        V().visit(node)
        return out

    # Cross-module forward references (import-time forward refs cannot
    # exist in a file that imported, so these are all call-time): move
    # each target block to the END of its earliest referencing module,
    # recursively moving the target's own import-time dependencies
    # first (in dependency order). Every moved block and every dep it
    # is evaluated against must be singly-assigned, so relocating the
    # evaluation point cannot change the value.
    assign_counts: dict[str, int] = {}
    for names in block_names:
        for n in names:
            assign_counts[n] = assign_counts.get(n, 0) + 1

    moved: dict[int, int] = {}   # block index -> destination module
    move_order: dict[int, list[int]] = {}  # module -> blocks in order

    def cur_module(j: int) -> int:
        return moved.get(j, module_of(tree.body[j].lineno))

    def move(j: int, dest: int, depth: int = 0) -> None:
        assert depth < 10, "hoist recursion too deep"
        if cur_module(j) <= dest:
            return
        node = tree.body[j]
        assert isinstance(node, (ast.Assign, ast.AnnAssign)), (
            f"move target at line {node.lineno} is not an Assign")
        for n in block_names[j]:
            assert assign_counts[n] == 1, (
                f"{n} multiply-assigned; unsafe to move")
        value = node.value
        deps = (refs(value) if value is not None else set())
        deps -= set(block_names[j])
        for d in sorted(deps):
            dj = defined[d]
            assert assign_counts[d] == 1, (
                f"dep {d} multiply-assigned; unsafe to move past it")
            move(dj, dest, depth + 1)
        moved[j] = dest
        move_order.setdefault(dest, []).append(j)
        print(f"moving line {node.lineno} ({block_names[j]}) -> "
              f"end of {MODULES[dest][0]}", file=sys.stderr)

    changed = True
    while changed:
        changed = False
        for i, node in enumerate(tree.body):
            mi = moved.get(i, module_of(node.lineno))
            if mi < 0:
                continue
            for r in refs(node):
                j = defined[r]
                if r not in block_names[i] and cur_module(j) > mi:
                    move(j, mi)
                    changed = True

    hoist_lines: set[int] = set()
    for j in moved:
        node = tree.body[j]
        hoist_lines.update(range(node.lineno, node.end_lineno + 1))

    def moved_text(dest: int) -> tuple[str, list[str]]:
        text, names = "", []
        for j in move_order.get(dest, []):
            node = tree.body[j]
            text += ("\n\n"
                     + "".join(lines[node.lineno - 1:node.end_lineno])
                     .rstrip("\n") + "\n")
            names.extend(n for n in block_names[j] if n not in names)
        return text, names

    pkg = "twitter_to_sqlite_spark.plans"
    out_files: dict[str, str] = {}
    for k, (name, start) in enumerate(MODULES):
        end = (MODULES[k + 1][1] if k + 1 < len(MODULES)
               else REGISTRY_START)  # exclusive
        body = "".join(l for ln, l in enumerate(lines, 1)
                       if start <= ln < end and ln not in hoist_lines)
        own = []
        for i, node in enumerate(tree.body):
            if module_of(node.lineno) == k and i not in moved:
                own.extend(n for n in block_names[i] if n not in own)
        tail_assigns, moved_names = moved_text(k)
        own += [n for n in moved_names if n not in own]
        if k == 0:
            header = f'"""{MODULE_DOC[name]}"""\n\n'
            text = (header + body + tail_assigns
                    + "\n\n__all__ = [\n"
                    + "".join(f'    "{n}",\n' for n in own)
                    + "]\n")
        else:
            prev = MODULES[k - 1][0]
            header = (
                f'"""{MODULE_DOC[name]}"""\n\n'
                "from __future__ import annotations\n\n"
                f"from {pkg} import {prev} as _prev\n"
                f"from {pkg}.{prev} import *  # noqa: F401,F403\n\n")
            text = (header + body + tail_assigns
                    + "\n\n__all__ = list(_prev.__all__) + [\n"
                    + "".join(f'    "{n}",\n' for n in own)
                    + "]\n")
        out_files[name] = text

    last = MODULES[-1][0]
    facade = (
        "".join(lines[:DOC_END])
        + "\nfrom __future__ import annotations\n\n"
        + "from collections.abc import Callable\n\n"
        + "from pyspark.sql import DataFrame, SparkSession\n\n"
        + f"from {pkg}.{last} import *  # noqa: F401,F403\n\n"
        + "".join(lines[REGISTRY_START - 1:]))

    n_out = sum(t.count("\n") for t in out_files.values())
    print(f"façade: {facade.count(chr(10))} lines; "
          f"{len(out_files)} chunk modules, {n_out} lines total",
          file=sys.stderr)
    if "--write" in sys.argv:
        for name, text in out_files.items():
            open(os.path.join(PLANS, name + ".py"), "w").write(text)
        open(CATALOG, "w").write(facade)
        print("written", file=sys.stderr)


if __name__ == "__main__":
    main()
