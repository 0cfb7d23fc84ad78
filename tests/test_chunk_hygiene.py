"""Chunk-module import hygiene (VERDICT r9 task 5).

The eight plans/_q0N chunk modules chain by star-import, so every
earlier chunk's names are visible in later chunks. A later chunk that
accidentally re-defines a helper already defined in an earlier chunk
would silently shadow it for everything downstream — the registry
would keep importing, tests of the earlier name would keep passing,
and only consumers resolving through the chain would see the imposter.
These tests make that a pytest failure, statically (AST — no Spark).
"""

from __future__ import annotations

import ast
import os

CHUNK_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "twitter_to_sqlite_spark", "plans")

CHUNKS = sorted(
    f for f in os.listdir(CHUNK_DIR)
    if f.startswith("_q") and f.endswith(".py"))

# Names every chunk necessarily (re)binds as chain plumbing.
PLUMBING = {"_prev", "__all__", "annotations"}


def _defined_names(path: str, include_imports: bool = False) -> set[str]:
    """Top-level names a module DEFINES itself (def/class/assign
    targets; optionally import bindings — chunk 1 re-exports its
    shared imports through __all__ by design), excluding the
    star-import chain plumbing."""
    tree = ast.parse(open(path).read())
    out: set[str] = set()
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef,
                             ast.ClassDef)):
            out.add(node.name)
        elif isinstance(node, ast.Assign):
            for t in node.targets:
                if isinstance(t, ast.Name):
                    out.add(t.id)
        elif isinstance(node, ast.AnnAssign):
            if isinstance(node.target, ast.Name):
                out.add(node.target.id)
        elif include_imports and isinstance(node,
                                            (ast.Import, ast.ImportFrom)):
            for a in node.names:
                if a.name != "*":
                    out.add(a.asname or a.name.split(".")[0])
    return out - PLUMBING


def test_chunks_exist():
    assert len(CHUNKS) == 8, CHUNKS


def test_no_name_defined_in_two_chunks():
    """Pairwise-disjoint top-level definitions across all chunks: one
    collision anywhere in the 12.7k-line surface = one failure naming
    the chunks and the shadowed symbol."""
    owners: dict[str, str] = {}
    clashes: list[tuple[str, str, str]] = []
    for fname in CHUNKS:
        for name in _defined_names(os.path.join(CHUNK_DIR, fname)):
            if name in owners:
                clashes.append((name, owners[name], fname))
            else:
                owners[name] = fname
    assert not clashes, (
        "top-level name(s) defined in two chunk modules — the later "
        f"definition shadows the earlier one downstream: {clashes}")


def test_chunk_all_additions_match_definitions():
    """Every name a chunk APPENDS to the chained __all__ must be
    defined in that same chunk (an append pointing at another chunk's
    symbol would re-export stale bindings if the owner ever moved),
    and appended names must be unique across chunks."""
    import importlib

    prev_all: list[str] = []
    for fname in CHUNKS:
        mod = importlib.import_module(
            "twitter_to_sqlite_spark.plans." + fname[:-3])
        added = [n for n in mod.__all__ if n not in set(prev_all)]
        defined = _defined_names(os.path.join(CHUNK_DIR, fname),
                                 include_imports=True)
        missing = [n for n in added if n not in defined]
        assert not missing, (
            f"{fname}: __all__ appends names it does not define: "
            f"{missing}")
        prev_all = list(mod.__all__)
