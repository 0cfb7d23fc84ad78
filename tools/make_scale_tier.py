#!/usr/bin/env python
"""Build a heavier bench tier by deterministic replication of the
sf0.1 corpus (VERDICT r10 'Next round' #2: at sf0.1 every heavy entry
is scheduler-floor-bound — c8 ≈ c32 — so the bench lost its power to
discriminate plan improvements; a 10× tier restores it).

Writes $OUT (default /root/testdata/sf1) with:

  documents  ×10 — replica j>0 gets doc_id + j·10M and every token
               salted with an `x{j}` suffix, so replicas share no
               shingles/terms with each other or the originals
               (independent corpus growth — the scale_probe
               `distinct=True` convention; near-dup pair counts grow
               linearly, the operator contract's regime, not the
               adversarial everything-is-a-copy n² regime).
  embeddings ×4  — replica j>0 gets vec_id + j·10M and a deterministic
               per-(row, dim, replica) sinusoidal jitter, so replicas
               are NOT cosine-duplicates of their originals (cosine is
               scale-invariant, so a pure rescale would plant 4-way
               duplicate clusters and force quadratic pair growth).
               ×4 not ×10: the fixed-k centroid set means in-cell pair
               generation grows as (n/k)² per cell — ×4 rows ≈ ×16
               pair work, already deep past the scheduler floor.
  orders     ×10 — o_orderkey + j·10M, same customers (a customer base
               placing 10× the orders).
  lineitem   ×10 — l_orderkey + j·10M (follows its order replica),
               l_suppkey + j·10k (fresh supplier node ids per replica,
               so the distinct customer↔supplier edge set really grows
               ~10× instead of collapsing in the distinct).
  events     ×10 — event_id + j·100M, same users/ts distribution.
  region/nation/customer/supplier/part — copied (dimension tables).

Every transformation is a pure function of (row, replica), so the
tier is bit-reproducible. No oracle runs at this tier — it is a
PERFORMANCE probe ($SPARK_GRAFT_SF_DIR selector, unchanged bench.py
contract); correctness stays certified at sf0.001/0.01 by the gate.

Usage: python tools/make_scale_tier.py [out_dir]
"""

from __future__ import annotations

import math
import os
import re
import shutil
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
COPY = ["region", "nation", "customer", "supplier", "part"]


def _read(name: str) -> pa.Table:
    return pq.read_table(os.path.join(SRC, f"{name}.parquet"))


def _write(out_dir: str, name: str, tab: pa.Table) -> None:
    pq.write_table(tab, os.path.join(out_dir, f"{name}.parquet"))
    print(f"  {name}: {tab.num_rows} rows")


def _bump(tab: pa.Table, col: str, delta: int) -> pa.Table:
    i = tab.schema.get_field_index(col)
    bumped = pc.add(tab.column(col), pa.scalar(delta, tab.schema.field(col).type))
    return tab.set_column(i, tab.schema.field(col), bumped)


def documents(n: int) -> pa.Table:
    base = _read("documents")
    parts = [base]
    texts = base.column("text").to_pylist()
    for j in range(1, n):
        rep = _bump(base, "doc_id", j * 10_000_000)
        salted = [re.sub(r"(\S+)", rf"\g<1>x{j}", t or "") for t in texts]
        i = rep.schema.get_field_index("text")
        rep = rep.set_column(i, rep.schema.field("text"),
                             pa.array(salted, pa.string()))
        k = rep.schema.get_field_index("n_chars")
        rep = rep.set_column(k, rep.schema.field("n_chars"),
                             pa.array([len(t) for t in salted], pa.int64()))
        parts.append(rep)
    return pa.concat_tables(parts)


def embeddings(n: int) -> pa.Table:
    base = _read("embeddings")
    parts = [base]
    vecs = base.column("embedding").to_pylist()
    ids = base.column("vec_id").to_pylist()
    for j in range(1, n):
        rep = _bump(base, "vec_id", j * 10_000_000)
        jit = [
            [v + 0.05 * math.sin(0.7 * d + 1.3 * j + 0.001 * vid)
             for d, v in enumerate(vec)]
            for vid, vec in zip(ids, vecs)
        ]
        i = rep.schema.get_field_index("embedding")
        rep = rep.set_column(i, rep.schema.field("embedding"),
                             pa.array(jit, pa.list_(pa.float32())))
        parts.append(rep)
    return pa.concat_tables(parts)


def replicate(name: str, n: int, bumps: dict[str, int]) -> pa.Table:
    base = _read(name)
    parts = [base]
    for j in range(1, n):
        rep = base
        for col, stride in bumps.items():
            rep = _bump(rep, col, j * stride)
        parts.append(rep)
    return pa.concat_tables(parts)


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf1"
    os.makedirs(out_dir, exist_ok=True)
    print(f"writing {out_dir}")
    for name in COPY:
        shutil.copyfile(os.path.join(SRC, f"{name}.parquet"),
                        os.path.join(out_dir, f"{name}.parquet"))
    _write(out_dir, "documents", documents(10))
    _write(out_dir, "embeddings", embeddings(4))
    _write(out_dir, "orders", replicate("orders", 10, {"o_orderkey": 10_000_000}))
    _write(out_dir, "lineitem", replicate(
        "lineitem", 10, {"l_orderkey": 10_000_000, "l_suppkey": 10_000}))
    _write(out_dir, "events", replicate("events", 10, {"event_id": 100_000_000}))
    print("done")


if __name__ == "__main__":
    main()
