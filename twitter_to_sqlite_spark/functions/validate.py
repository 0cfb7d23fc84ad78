"""Declarative data-quality checks compiled to aggregation plans —
the validation gate a training pipeline runs before (and after) every
transformation stage, in the spirit of Deequ/Great Expectations but
expressed as plain Catalyst plans.

Each check returns a one-row DataFrame (check, violations, passed);
``run_checks`` unions them into one report. Every check is a single
scan-aggregate (or one broadcast anti-join for referential checks), so
a full report on 100 TB costs one pass per involved table — and
because the checks are plans, Catalyst fuses same-table checks that
are combined via ``combine_table_checks`` into ONE aggregate job.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _report(df: DataFrame, name: str, violations: Column) -> DataFrame:
    # coalesce: sum() over an empty relation is NULL, and an empty
    # table violates nothing
    agg = df.agg(
        F.coalesce(violations.cast("long"), F.lit(0)).alias("violations"))
    return agg.select(
        F.lit(name).alias("check_name"),
        "violations",
        (F.col("violations") == 0).alias("passed"),
    )


def not_null_expr(col: str, name: str | None = None) -> tuple[str, Column]:
    """(name, violations-aggregate) for a NULL check — feed to
    :func:`combine_table_checks` or wrap via :func:`not_null`."""
    return (name or f"not_null({col})",
            F.sum(F.col(col).isNull().cast("long")))


def not_null(df: DataFrame, col: str, name: str | None = None) -> DataFrame:
    """Violations = rows where `col` IS NULL."""
    return _report(df, *not_null_expr(col, name))


def unique_expr(cols: list[str],
                name: str | None = None) -> tuple[str, Column]:
    """(name, violations-aggregate) for a pk check: rows beyond the
    first per key. Rows with a NULL key count as violations
    (count DISTINCT ignores NULLs in Spark and DuckDB alike) —
    deliberate: a primary key is non-null by definition, so
    NULL-keyed rows can never satisfy it."""
    return (name or f"unique({','.join(cols)})",
            F.count(F.lit(1)) - F.countDistinct(*[F.col(c) for c in cols]))


def unique(df: DataFrame, cols: list[str],
           name: str | None = None) -> DataFrame:
    """Violations = rows beyond the first per key (0 ⇔ cols are a pk).
    NULL-keyed rows count as violations (see :func:`unique_expr`)."""
    label, expr = unique_expr(cols, name)
    return _report(df, label, expr)


def accepted_range_expr(col: str, lo=None, hi=None,
                        name: str | None = None) -> tuple[str, Column]:
    """(name, violations-aggregate) for a bounds check on non-null
    values."""
    c = F.col(col)
    bad = F.lit(False)
    if lo is not None:
        bad = bad | (c < F.lit(lo))
    if hi is not None:
        bad = bad | (c > F.lit(hi))
    return (name or f"range({col})",
            F.sum((c.isNotNull() & bad).cast("long")))


def accepted_range(df: DataFrame, col: str, lo=None, hi=None,
                   name: str | None = None) -> DataFrame:
    """Violations = non-null values outside [lo, hi]."""
    label, expr = accepted_range_expr(col, lo, hi, name)
    return _report(df, label, expr)


def combine_table_checks(df: DataFrame,
                         specs: list[tuple[str, Column]]) -> DataFrame:
    """Fuse several aggregate checks over ONE table into ONE
    scan-aggregate job — the 100 TB form of a validation gate: a
    table is read once no matter how many constraints it carries
    (each separate check DataFrame would otherwise be its own scan;
    Catalyst does not merge sibling jobs). ``specs`` are the
    (name, violations-aggregate) pairs the ``*_expr`` helpers
    produce; the one aggregated row explodes into the same
    (check_name, violations, passed) report rows ``run_checks``
    unions."""
    if not specs:
        raise ValueError("combine_table_checks needs at least one spec")
    row = df.agg(*[
        F.coalesce(expr.cast("long"), F.lit(0)).alias(f"__v{i}")
        for i, (_, expr) in enumerate(specs)
    ])
    reports = F.explode(F.array(*[
        F.struct(F.lit(name).alias("check_name"),
                 F.col(f"__v{i}").alias("violations"))
        for i, (name, _) in enumerate(specs)
    ]))
    return (row.select(reports.alias("r"))
            .select("r.check_name", "r.violations",
                    (F.col("r.violations") == 0).alias("passed")))


def foreign_key(child: DataFrame, col: str, parent: DataFrame,
                parent_col: str, name: str | None = None) -> DataFrame:
    """Violations = non-null child keys with no parent row (orphans).

    Scale: broadcast anti-join when the parent key set is small; a
    plain shuffled anti-join otherwise — Catalyst/AQE decide. Exactly
    the F1 skip-existing shape, counted instead of kept.
    """
    orphans = (
        child.filter(F.col(col).isNotNull())
        .join(parent.select(F.col(parent_col).alias(col)).distinct(),
              col, "left_anti")
    )
    return _report(orphans, name or f"fk({col})", F.count(F.lit(1)))


def profile_drift(current: DataFrame, baseline: DataFrame,
                  rel_tol: float = 0.25) -> DataFrame:
    """Anomaly-aware quality gate: compare today's column profile
    against a STORED one (Deequ's `isConsistentWith` idea) — both
    sides are ``kmv_distinct`` outputs (col_name, n_kept,
    kmv_estimate), the baseline typically read back from the parquet
    snapshot the last run persisted. A static predicate can't catch
    "user_id cardinality doubled overnight"; a drift check against
    the previous profile can.

    Full outer join on col_name so SCHEMA drift is caught too: a
    column missing from either side FAILS unconditionally (estimate 0
    stands in for the missing side's value, and `passed` additionally
    requires both sides present — a rel_tol ≥ 1 must not mask a
    dropped column whose rel_change is exactly 1.0). Returns one row
    per column: (check_name, baseline_est, current_est, rel_change,
    passed) with rel_change = |cur − base| / max(base, 1) rounded to
    4 and passed ⇔ both present ∧ rel_change ≤ rel_tol.

    Scale: the profiles are sketches (rows = #columns), so the gate
    itself is O(columns) regardless of table size — the expensive
    pass is the profile build, one KMV scan per snapshot, already
    paid when the baseline was persisted.
    """
    b = baseline.select(
        "col_name", F.col("kmv_estimate").alias("__b"))
    c = current.select(
        "col_name", F.col("kmv_estimate").alias("__c"))
    j = b.join(c, "col_name", "full_outer")
    base = F.coalesce(F.col("__b"), F.lit(0)).cast("long")
    cur = F.coalesce(F.col("__c"), F.lit(0)).cast("long")
    rel = F.round(F.abs(cur - base) / F.greatest(base, F.lit(1)), 4)
    return j.select(
        F.concat(F.lit("drift("), F.col("col_name"), F.lit(")"))
        .alias("check_name"),
        base.alias("baseline_est"),
        cur.alias("current_est"),
        rel.alias("rel_change"),
        (F.col("__b").isNotNull() & F.col("__c").isNotNull()
         & (rel <= F.lit(float(rel_tol)))).alias("passed"),
    )


def run_checks(checks: list[DataFrame]) -> DataFrame:
    """Union the one-row check reports into the full report."""
    if not checks:
        raise ValueError("run_checks needs at least one check")
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out
