"""Sink operators (SURVEY §2.2): the write-side semantics of the
reference expressed as DataFrame plans + parquet writers.

The reference's storage semantics are SQLite INSERT OR REPLACE /
INSERT OR IGNORE keyed by pk. On a lake they become MERGE (Delta) or,
on pure parquet — what the driver's testdata uses — a deterministic
union + window dedup. Both shapes are implemented here; the plan
builders (``*_plan``) are pure and oracle-testable, the ``write_*``
helpers do the I/O.

Scale notes: last-write-wins is a single window shuffle partitioned by
pk — the same shape Delta's MERGE uses internally. For a 100 TB fact
table, partition the table by a time column and MERGE only the
touched partitions (see ``write_upsert``'s partition pruning).
"""

from __future__ import annotations

import importlib.util
import json
import os
import shutil
import threading
import time
import uuid
from contextlib import contextmanager

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: Delta Lake fast-path availability. When delta-spark is installed and
#: the target is a Delta table, keyed upserts run as a transactional
#: MERGE (object-store-safe commit) instead of the parquet rename swap.
HAS_DELTA = importlib.util.find_spec("delta") is not None


def upsert_plan(existing: DataFrame, incoming: DataFrame, keys: list[str],
                version_col: str) -> DataFrame:
    """Keyed last-write-wins upsert (INSERT OR REPLACE).

    Reference: ``insert_all(..., pk=..., replace=True)`` on tweets
    (utils.py:434), users (utils.py:432,454), places (utils.py:420).

    `version_col` orders writes: the row with the highest version per
    key wins, and incoming beats existing on ties (the reference's
    "later write wins" — SURVEY §7.3 hard-part 3). Deterministic even
    when one batch contains the same pk twice.
    """
    e = existing.withColumn("__src", F.lit(0))
    i = incoming.withColumn("__src", F.lit(1))
    unioned = e.unionByName(i, allowMissingColumns=True)
    w = Window.partitionBy(*keys).orderBy(
        F.col(version_col).desc(), F.col("__src").desc()
    )
    return (
        unioned.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__src")
    )


def insert_if_absent_plan(existing: DataFrame, incoming: DataFrame,
                          keys: list[str]) -> DataFrame:
    """First-write-wins insert (INSERT OR IGNORE).

    Reference: ``insert_all(..., ignore=True)`` for `following`, so the
    original ``first_seen`` is preserved (utils.py:459-469,
    cli.py:727-733).
    Plan: existing ∪ (incoming ⟕anti existing). The anti-join
    broadcasts whichever side is small; dedup incoming on pk first so a
    batch with repeated keys inserts one row.
    """
    fresh = (
        incoming.dropDuplicates(keys)
        .join(existing.select(*keys), on=keys, how="left_anti")
    )
    return existing.unionByName(fresh, allowMissingColumns=True)


def hash_id_plan(df: DataFrame, cols: list[str] | None = None,
                 id_col: str = "id") -> DataFrame:
    """Content-hash surrogate key + collapse of identical rows.

    Reference: ``hash_id="id"`` for the sources dimension
    (utils.py:668-673) and pk-less archive tables (archive.py:248) —
    pk = hash of row content, so identical rows dedup to one.

    Uses sha1 over ``to_json`` of the selected columns in sorted field
    order — the same *construction* as the reference's canonical-JSON
    sha1 (utils.py's hash_record via archive.py:248), but NOT
    byte-identical to it: ``to_json`` drops null fields, doesn't
    \\uXXXX-escape non-ASCII, and doesn't sort nested keys, so archive
    pk values differ from a reference-built DB. The hash is stable and
    collision-safe for dedup, which is all K4 requires; where byte
    parity with sqlite_utils matters (the sources dim), the exact-hash
    pandas UDF in transforms/tweets.py is used instead. Scale:
    dropDuplicates on the hash is a partial-agg shuffle on a
    high-entropy key — no skew by construction.
    """
    cols = cols or df.columns
    ordered = sorted(cols)
    h = F.sha1(F.to_json(F.struct(*[F.col(c) for c in ordered])))
    return df.withColumn(id_col, h).dropDuplicates([id_col])


def m2m_bridge_plan(df: DataFrame, left_id: str, right_id: str,
                    left_name: str, right_name: str) -> DataFrame:
    """Build the m2m bridge rows (tweet↔media style).

    Reference: ``table.m2m("media", ...)`` creating media_tweets
    (utils.py:442-446).
    """
    return (
        df.select(
            F.col(left_id).alias(f"{left_name}_id"),
            F.col(right_id).alias(f"{right_name}_id"),
        )
        .dropDuplicates()
    )


# --------------------------------------------------------------- I/O

# A healthy writer fills its lock file microseconds after creating it;
# an unparseable lock OLDER than this is a crash artifact, not a
# writer mid-create.
_LOCK_GRACE = 5.0

# A lock whose pid CAN'T be probed (foreign tooling, corrupt content)
# may belong to a holder alive mid-merge — only break it after a TTL
# sized to the longest plausible held merge, not the create grace.
_LOCK_STALE_TTL = 600.0


class ConcurrentWriteError(RuntimeError):
    """Another writer holds the table lock; the upsert was NOT applied.

    Raised instead of corrupting the table: the parquet swap writers
    are single-writer by construction (two interleaved rename swaps can
    drop each other's rows), so concurrent upserts must serialize on
    the lock or fail cleanly with this error.
    """


@contextmanager
def table_lock(path: str, timeout: float = 120.0, poll: float = 0.05):
    """Advisory exclusive lock for read-merge-swap writers.

    ``O_CREAT|O_EXCL`` on ``<path>.__lock`` is atomic on POSIX and NFS;
    the lock file records the holder's pid so a lock left by a dead
    process (crash between write and unlink) is detected and broken —
    liveness without a daemon. On repeated contention the writer polls
    until ``timeout`` then raises :class:`ConcurrentWriteError` rather
    than proceeding unlocked.

    Two races the break path must NOT lose to:
      * a contender can read the lock in the instant between the
        holder's O_EXCL create and its json write — an EMPTY file.
        Unparseable content is therefore stale only after
        ``_LOCK_GRACE`` seconds (a healthy writer fills it in
        microseconds), never immediately;
      * two contenders may both deem the lock stale — breaking is an
        atomic ``rename`` claim, so exactly one of them removes it and
        the loser goes back to polling instead of unlinking a fresh
        lock that a third writer just created.

    Scope: the lock must cover the READ of the existing table as well
    as the swap — locking only the swap still loses updates (two
    writers both read the pre-merge table). On Delta tables this is
    unnecessary: optimistic concurrency is handled by the commit
    protocol (see ``_delta_merge``).
    """
    lock = f"{path}.__lock"
    parent = os.path.dirname(path)
    if parent:
        os.makedirs(parent, exist_ok=True)
    deadline = time.monotonic() + timeout
    while True:
        try:
            fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            with os.fdopen(fd, "w") as f:
                json.dump({"pid": os.getpid(), "ts": time.time()}, f)
            break
        except FileExistsError:
            holder, stale = None, False
            try:
                with open(lock) as f:
                    holder = json.load(f).get("pid")
            except FileNotFoundError:
                continue  # released between create-attempt and read
            except (OSError, ValueError, json.JSONDecodeError):
                # Unreadable content: mid-create (fresh) or a crash
                # between create and write (old). Age decides.
                try:
                    stale = time.time() - os.stat(lock).st_mtime > _LOCK_GRACE
                except OSError:
                    continue
            if holder is not None:
                try:
                    os.kill(int(holder), 0)
                except ProcessLookupError:
                    stale = True  # holder gone (same-host check; a
                    # shared filesystem would use a TTL policy here)
                except PermissionError:
                    pass  # EPERM: the process EXISTS under another
                    # uid — very much alive; keep polling
                except (OSError, ValueError):
                    # Undeterminable (garbage pid content, exotic
                    # errno). OUR writers always record int(getpid()),
                    # so this is a foreign/corrupt lock — break it
                    # after the HELD-lock TTL (not the microseconds-
                    # scale create grace: the foreign holder could be
                    # alive mid-merge) instead of wedging every writer
                    # until a human deletes it.
                    try:
                        stale = (time.time() - os.stat(lock).st_mtime
                                 > _LOCK_STALE_TTL)
                    except OSError:
                        continue
            if stale:
                claim = f"{lock}.stale.{os.getpid()}.{time.monotonic_ns()}"
                try:
                    os.rename(lock, claim)  # atomic: one breaker wins
                    os.unlink(claim)
                except OSError:
                    pass  # lost the claim race — someone else broke it
                continue
            if time.monotonic() >= deadline:
                raise ConcurrentWriteError(
                    f"timed out after {timeout}s waiting for {lock} "
                    f"(held by pid {holder}); table left untouched"
                ) from None
            time.sleep(poll)
    try:
        yield
    finally:
        try:
            os.unlink(lock)
        except OSError:
            pass


def _delta_merge(spark, incoming: DataFrame, path: str, keys: list[str],
                 version_col: str) -> bool:
    """Transactional keyed upsert via Delta MERGE when available.

    Returns True iff the fast-path applied: delta-spark importable AND
    ``path`` is a Delta table. The MERGE condition reproduces
    ``upsert_plan``'s K1 ordering — per-key latest incoming row wins,
    and it beats the stored row on version ties (WHEN MATCHED guarded
    by ``s.ver >= t.ver`` for persisted version columns; dunder
    bookkeeping versions aren't stored, so matched rows always update).
    Delta's optimistic concurrency makes this safe on object stores
    with no rename and no advisory lock — concurrent writers conflict
    at commit time and retry, which is exactly the guarantee the
    parquet path approximates with :func:`table_lock`.
    """
    if not HAS_DELTA:
        return False
    from delta.tables import DeltaTable  # deferred: optional dep

    try:
        is_delta = DeltaTable.isDeltaTable(spark, path)
    except Exception:
        # delta-spark the PYTHON package being importable does not mean
        # the SESSION has the Delta jars/extension: on a vanilla
        # SparkSession the JVM class resolves to a py4j JavaPackage and
        # this call raises (TypeError). Fall back to the parquet path
        # instead of failing every upsert in such environments.
        return False
    if not is_delta:
        return False
    # MERGE requires unique source keys: keep the latest per pk.
    w = Window.partitionBy(*keys).orderBy(F.col(version_col).desc())
    src = (
        incoming.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    persisted_version = not version_col.startswith("__")
    if not persisted_version:
        src = src.drop(version_col)
    cond = " AND ".join(f"t.{k} <=> s.{k}" for k in keys)
    m = DeltaTable.forPath(spark, path).alias("t").merge(src.alias("s"), cond)
    if persisted_version:
        m = m.whenMatchedUpdateAll(condition=f"s.{version_col} >= t.{version_col}")
    else:
        m = m.whenMatchedUpdateAll()
    m.whenNotMatchedInsertAll().execute()
    return True


def write_swap(df: DataFrame, path: str,
               partition_by: list[str] | None = None) -> None:
    """Executor-side rewrite of a parquet table whose plan may READ
    from ``path`` itself: write the plan to a temp sibling directory,
    then atomically swap it over the old one.

    This is the scale-safe replacement for the collect()-then-rewrite
    pattern — the table never crosses the driver; the merge runs fully
    distributed and the swap is two directory renames (atomic on POSIX
    and HDFS; on S3-style object stores, substitute a Delta/Iceberg
    commit — same plan, transactional metadata swap instead of rename).
    Crash-safety: a crash between the two renames leaves the old table
    at ``<path>.__old-*`` — recoverable, never half-written. Cleanup of
    ``old``/``tmp`` happens ONLY after the swap has fully succeeded; if
    the second rename fails the displaced original is renamed back into
    place and ``tmp`` is left on disk for inspection, so no code path
    deletes the only surviving copy of the data.
    """
    tmp = f"{path}.__tmp-{uuid.uuid4().hex[:8]}"
    old = f"{path}.__old-{uuid.uuid4().hex[:8]}"
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(tmp)
    displaced = False
    if os.path.exists(path):
        os.rename(path, old)
        displaced = True
    try:
        os.rename(tmp, path)
    except BaseException:
        # Roll back: restore the displaced original so the table is
        # never lost; keep tmp (the freshly written data) for recovery.
        if displaced and not os.path.exists(path):
            os.rename(old, path)
        raise
    # Swap succeeded — now (and only now) drop the displaced copy.
    if displaced:
        shutil.rmtree(old, ignore_errors=True)


def swap_partitions(tmp: str, path: str, partition_col: str) -> None:
    """Move every ``<partition_col>=<value>`` directory from a freshly
    written temp dataset into the live table, replacing same-valued
    partitions — dynamic partition overwrite expressed as per-partition
    directory swaps, so the merged plan can read the live partitions it
    is replacing. Untouched partitions are never opened or moved.

    Displaced partition dirs are renamed to a dot-prefixed name first
    (hidden from Spark's partition discovery) so a concurrent reader
    never sees ``day=X.__old`` parsed as a partition value.

    Crash-safety mirrors ``write_swap``: if a swap fails mid-way, the
    partition being swapped is renamed back into place and ``tmp`` is
    LEFT ON DISK for recovery — no code path deletes the only copy of
    freshly merged data. ``tmp`` is removed only after every partition
    has swapped successfully.
    """
    os.makedirs(path, exist_ok=True)
    prefix = f"{partition_col}="
    for d in os.listdir(tmp):
        if not d.startswith(prefix):
            continue
        src, dst = os.path.join(tmp, d), os.path.join(path, d)
        displaced = os.path.join(path, f".{d}.__old")
        if os.path.exists(displaced):
            shutil.rmtree(displaced, ignore_errors=True)
        moved = False
        if os.path.exists(dst):
            os.rename(dst, displaced)
            moved = True
        try:
            os.rename(src, dst)
        except BaseException:
            # Restore the displaced live partition; keep tmp intact.
            if moved and not os.path.exists(dst):
                os.rename(displaced, dst)
            raise
        if moved:
            shutil.rmtree(displaced, ignore_errors=True)
    shutil.rmtree(tmp, ignore_errors=True)


def write_overwrite(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """Full-refresh overwrite — archive_* drop & recreate
    (archive.py:240-248). Routed through the atomic swap so a plan
    derived from the table itself can still full-refresh it."""
    write_swap(df, path, partition_by)


def write_upsert_partitioned(spark, incoming: DataFrame, path: str,
                             keys: list[str], version_col: str,
                             partition_col: str) -> None:
    """Partition-pruned keyed upsert: the 100 TB MERGE shape.

    Only the partitions present in `incoming` are read, merged, and
    rewritten (dynamic partition overwrite); untouched partitions'
    files are not opened, let alone rewritten. Requires the pk to be
    stable within a partition (true for tweets partitioned by
    created-date: a tweet's id fixes its date).

    This is exactly what Delta MERGE does under partition predicates;
    expressed here on plain parquet so the engine needs no extra
    dependency. When delta-spark is installed and the table is Delta,
    the MERGE fast-path runs instead (Delta prunes partitions from the
    join keys itself). Parquet writers serialize on
    :func:`table_lock` — the read of the live partitions and the
    directory swap happen under one exclusive section, so concurrent
    upserts can't lose each other's rows.
    """
    if _delta_merge(spark, incoming, path, keys, version_col):
        return
    touched = [r[0] for r in incoming.select(partition_col).distinct().collect()]
    if not touched:
        return
    with table_lock(path):
        _upsert_partitioned_locked(spark, incoming, path, keys,
                                   version_col, partition_col, touched)


#: serializes the session-global partition-inference toggle across
#: threads (see _read_no_infer).
_NO_INFER_LOCK = threading.Lock()


def _read_no_infer(spark, path: str) -> DataFrame:
    """Read a parquet dataset with partition-column TYPE INFERENCE
    off: directory names round-trip verbatim as strings. Inference
    turns ``day=00`` into int 0, which casts back to the string "0" —
    an IN-filter on '00' then silently matches NOTHING, and the
    partition swap replaces a full directory with only the incoming
    rows (observed data loss; pinned by
    test_compact_table_preserves_partition_layout)."""
    key = "spark.sql.sources.partitionColumnTypeInference.enabled"
    # Process-wide mutex: table_lock only serializes writers of the
    # SAME table, so two maintenance paths on different tables could
    # interleave their read-save-restore of this session-global conf
    # and leave inference permanently off (every later read in the
    # session then returns partition columns as strings). The lock
    # makes the toggle atomic; concurrent plain readers still briefly
    # see it off, as the comment below concedes.
    with _NO_INFER_LOCK:
        prev = spark.conf.get(key)
        spark.conf.set(key, "false")
        try:
            df = spark.read.parquet(path)
            df.schema  # force analysis while inference is off (classic
            # mode analyzes reads eagerly anyway; this pins it — under
            # Spark Connect, deferred analysis could otherwise run
            # after the conf is restored). The toggle is
            # session-global, so concurrent same-session readers
            # briefly see it off — these are maintenance paths.
            return df
        finally:
            spark.conf.set(key, prev)


def _upsert_partitioned_locked(spark, incoming, path, keys, version_col,
                               partition_col, touched) -> None:
    if os.path.exists(path):
        # Legacy layout (table written before partitioning was enabled):
        # fall back to a plain full upsert without the partition column
        # — the UNLOCKED body, since this caller already holds the lock.
        probe = _read_no_infer(spark, path)
        if partition_col not in probe.columns:
            _upsert_locked(spark, incoming.drop(partition_col), path, keys,
                           version_col)
            return
        # Partition pruning: the IN-filter on the partition column means
        # only touched directories are scanned. Inference is off (see
        # _read_no_infer), so the cast to the incoming dtype is exact —
        # repeated merges can't drift the schema or miss directories.
        in_type = dict(incoming.dtypes)[partition_col]
        # Null-safe membership: a NULL partition value in the batch
        # lands in __HIVE_DEFAULT_PARTITION__, whose existing rows an
        # isin() filter would silently DROP (NULL isin anything is
        # NULL) — the swap would then replace the live null-partition
        # directory with only the incoming rows. Data loss, not a
        # corner case: any caller without tweets' coalesce-to-
        # 'unknown' guard could hit it.
        non_null = [t for t in touched if t is not None]
        pred = (
            F.col(partition_col).isin(non_null) if non_null else F.lit(False)
        )
        if len(non_null) != len(touched):
            pred = pred | F.col(partition_col).isNull()
        existing = (
            probe
            .withColumn(partition_col, F.col(partition_col).cast(in_type))
            .filter(pred)
        )
        merged = upsert_plan(existing, incoming, keys, version_col)
    else:
        merged = upsert_plan(incoming.limit(0), incoming, keys, version_col)
    if version_col.startswith("__"):
        merged = merged.drop(version_col)
    # Write the merged touched partitions to a temp dataset (fully
    # distributed — the plan reads the live partitions while they are
    # still in place), then swap only those partition directories in.
    tmp = f"{path}.__tmp-{uuid.uuid4().hex[:8]}"
    merged.write.mode("overwrite").partitionBy(partition_col).parquet(tmp)
    swap_partitions(tmp, path, partition_col)


def write_upsert(spark, incoming: DataFrame, path: str, keys: list[str],
                 version_col: str) -> None:
    """Parquet-backed keyed upsert: read-modify-write via upsert_plan.

    On Delta this is a single ``MERGE WHEN MATCHED UPDATE ALL WHEN NOT
    MATCHED INSERT ALL``; parquet has no row-level transaction so we
    rewrite. At scale, partition `path` by a stable bucket of the key
    (or date) and rewrite only partitions present in `incoming` —
    dynamic partition overwrite keeps the rewrite proportional to the
    batch, not the table (write_upsert_partitioned).

    Concurrency: the Delta fast-path (when installed + table is Delta)
    commits transactionally; the parquet path takes
    :func:`table_lock` around read-merge-swap so two concurrent
    upserts serialize (or the late one fails with
    :class:`ConcurrentWriteError` after the lock timeout) — never an
    interleaved rename that drops rows.
    """
    if _delta_merge(spark, incoming, path, keys, version_col):
        return
    with table_lock(path):
        _upsert_locked(spark, incoming, path, keys, version_col)


def _upsert_locked(spark, incoming, path, keys, version_col) -> None:
    """The read-merge-swap body; caller must hold :func:`table_lock`."""
    if os.path.exists(path):
        existing = spark.read.parquet(path)
        out = upsert_plan(existing, incoming, keys, version_col)
    else:
        out = upsert_plan(incoming.limit(0), incoming, keys, version_col)
    # A dunder version column is engine bookkeeping — don't persist
    # it. Stored rows then carry no version; on the next merge they
    # union as null, which sorts after any real incoming version
    # under desc ordering, so incoming still beats stored (K1).
    if version_col.startswith("__"):
        out = out.drop(version_col)
    # Executor-side rewrite + atomic swap: the merged table never
    # crosses the driver (the old collect()/createDataFrame pattern
    # capped tables at spark.driver.maxResultSize).
    write_swap(out, path)


def compact_table(spark, path: str, target_bytes: int = 128 << 20,
                  min_files: int = 2) -> bool:
    """Small-file compaction for an upsert-maintained parquet table.

    Every incremental upsert rewrites the table through ``write_swap``,
    but streaming ``foreachBatch`` sinks and partitioned upserts can
    still accumulate many small files — the classic long-running-table
    pathology (each scan pays per-file open/footer costs; at 100 TB a
    million 1 MB files is a listing storm). Compaction rewrites the
    table into ``ceil(total_bytes / target_bytes)`` files via the same
    crash-safe swap, under the same :func:`table_lock` as the writers
    so it can run as online maintenance.

    No-ops (returns False) when the table already averages at least
    ``target_bytes / 2`` per file or has fewer than ``min_files`` —
    compaction must be idempotent and cheap to schedule.

    Partitioned tables keep their layout: partition columns are read
    off the ``key=value`` directory structure and the rewrite goes
    through the same ``partitionBy`` — flattening them would strand
    rows outside the directories ``write_upsert_partitioned`` swaps.
    Two desync traps are closed explicitly: partition-column TYPE
    INFERENCE is disabled for the read (``month=01`` must not round-
    trip to ``month=1`` — the upserters match directories by name),
    and a hot partition is salted into ``ceil(bytes/target)`` output
    files instead of collapsing into one task writing one giant file.
    """
    sizes, _ = _walk_sizes(path)
    if len(sizes) < min_files:
        return False
    total = sum(sizes)
    if total / len(sizes) >= target_bytes / 2:
        return False
    part_cols = _partition_cols(path)
    with table_lock(path):
        # Re-size UNDER the lock: the pre-lock walk only decided the
        # cheap no-op; the write plan's bucket counts must match the
        # data actually read (a concurrent upsert may have landed a
        # new hot partition between the two).
        sizes, per_dir = _walk_sizes(path)
        total = sum(sizes)
        n_out = max(1, -(-total // target_bytes))
        df = _read_no_infer(spark, path)
        if len(part_cols) == 1:
            # Salt count per partition value via a depth-1 literal map
            # (a when-chain would nest one level per live partition —
            # StackOverflow territory on a years-of-days table): a
            # 50 GB hot day compacts to ~bytes/target files, a tiny
            # day stays one file. Deterministic salt (row-content
            # hash): a retried task re-salts identically, the
            # SPARK-23207 nondeterministic-repartition hazard.
            # Directory names are URI-escaped on disk — unquote before
            # comparing with column VALUES.
            import urllib.parse

            buckets = {
                urllib.parse.unquote(d.split("=", 1)[1]):
                    max(1, -(-b // target_bytes))
                for d, b in per_dir.items() if "=" in d
            }
            entries: list = []
            for v, n in sorted(buckets.items()):
                entries += [F.lit(v), F.lit(n)]
            nb = F.coalesce(
                F.element_at(F.create_map(*entries),
                             F.col(part_cols[0]).cast("string")),
                F.lit(1),
            ) if entries else F.lit(1)
            salt = F.pmod(
                F.hash(*[F.col(c) for c in df.columns]), nb)
            n_tasks = max(1, sum(buckets.values())) if buckets else n_out
            out = df.withColumn("__csalt", salt) \
                .repartition(n_tasks, *part_cols, "__csalt") \
                .drop("__csalt")
        elif part_cols:
            # Multi-level layouts: salting the top level would scatter
            # leaf directories across tasks and multiply output files;
            # plain repartition on the full partition key keeps one
            # task per leaf (hot single LEAF files stay unsplit — rare
            # for multi-level schemes, whose leaves are fine-grained).
            out = df.repartition(max(1, n_out), *part_cols)
        else:
            out = df.repartition(n_out)
        write_swap(out, path, partition_by=part_cols or None)
    return True


def _walk_sizes(path: str) -> tuple[list[int], dict[str, int]]:
    """Parquet file sizes under ``path`` plus bytes per first-level
    entry (partition dir or '.')."""
    sizes: list[int] = []
    per_dir: dict[str, int] = {}
    for root, _dirs, files in os.walk(path):
        rel = os.path.relpath(root, path)
        top = rel.split(os.sep)[0] if rel != "." else "."
        for f in files:
            if f.endswith(".parquet"):
                n = os.path.getsize(os.path.join(root, f))
                sizes.append(n)
                per_dir[top] = per_dir.get(top, 0) + n
    return sizes, per_dir


def _partition_cols(path: str) -> list[str]:
    """Partition columns of a parquet dataset, read off the nested
    ``key=value`` directory names (outermost first)."""
    cols: list[str] = []
    cur = path
    while True:
        try:
            subs = [d for d in os.listdir(cur)
                    if "=" in d and not d.startswith(".")
                    and os.path.isdir(os.path.join(cur, d))]
        except OSError:
            return cols
        if not subs:
            return cols
        cols.append(subs[0].split("=", 1)[0])
        cur = os.path.join(cur, subs[0])


# ---------------------------------------------------------------------
# Versioned tables: snapshot time travel over plain parquet.
#
# Delta/Iceberg are the production answer (the Delta MERGE fast-path
# above is env-gated on delta-spark); this is the same COMMIT PROTOCOL
# hand-rolled on a directory of immutable version snapshots + one
# atomically-replaced manifest, so time travel, as-of reads, version
# diffs (CDC between versions via relational.snapshot_diff) and
# retention vacuum work on any POSIX path with zero dependencies (the
# manifest swap uses os.replace, like the rest of this module's
# rename-based commits; on HDFS/object stores substitute a
# Delta/Iceberg commit — the protocol is the same).
#
# Crash-safety invariants:
#   * data is written BEFORE the manifest commit — readers resolve
#     versions through the manifest only, so a crash mid-write leaves
#     an invisible orphan directory, never a readable half-version;
#   * vacuum commits the shrunk manifest BEFORE deleting directories —
#     a crash leaves orphan dirs (cleanable), never a manifest entry
#     pointing at deleted data;
#   * all manifest mutations run under the advisory table_lock, so
#     concurrent writers serialize and version numbers never collide.
# ---------------------------------------------------------------------

_MANIFEST = "_manifest.json"


def _manifest_path(path: str) -> str:
    return os.path.join(path, _MANIFEST)


def _read_manifest(path: str) -> dict:
    mp = _manifest_path(path)
    if not os.path.exists(mp):
        return {"versions": []}
    with open(mp) as fh:
        return json.load(fh)


def _commit_manifest(path: str, manifest: dict) -> None:
    os.makedirs(path, exist_ok=True)
    tmp = _manifest_path(path) + f".tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    os.replace(tmp, _manifest_path(path))


def _version_dir(path: str, v: int) -> str:
    return os.path.join(path, f"v{v:06d}")


def write_version(df: DataFrame, path: str) -> int:
    """Commit ``df`` as the next snapshot version of the table at
    ``path``; returns the new version number. The snapshot itself is
    immutable once committed — updates are new versions, which is what
    makes as-of reads and version diffs exact.

    The (possibly long) distributed write happens OUTSIDE the lock,
    into a uuid staging directory — holding the advisory lock across a
    multi-minute snapshot write would time concurrent writers out
    instead of serializing them. The lock covers only version
    allocation + one rename + the manifest commit."""
    os.makedirs(path, exist_ok=True)
    staging = os.path.join(path, f".staging-{uuid.uuid4().hex[:8]}")
    df.write.mode("overwrite").parquet(staging)
    try:
        with table_lock(path):
            manifest = _read_manifest(path)
            # Allocate past BOTH the manifest and any vNNNNNN
            # directory already on disk: a crash between the rename
            # below and _commit_manifest leaves a manifest-invisible
            # orphan dir, and manifest-max+1 would re-allocate its
            # number — os.rename then fails ENOTEMPTY forever. Orphans
            # stay unreadable (readers resolve through the manifest);
            # skipping their numbers keeps them harmless, as the
            # crash-safety notes above promise.
            on_disk = [int(d[1:]) for d in os.listdir(path)
                       if d.startswith("v") and d[1:].isdigit()]
            v = max(manifest["versions"] + on_disk, default=0) + 1
            os.rename(staging, _version_dir(path, v))
            manifest["versions"].append(v)
            _commit_manifest(path, manifest)
    except BaseException:
        shutil.rmtree(staging, ignore_errors=True)
        raise
    return v


def list_versions(path: str) -> list[int]:
    return sorted(_read_manifest(path)["versions"])


def read_version(spark, path: str, version: int | None = None) -> DataFrame:
    """Time travel: the table as of ``version`` (default: latest
    committed). Reading resolves through the manifest, so uncommitted
    or vacuumed snapshots are never visible."""
    versions = list_versions(path)
    if not versions:
        raise FileNotFoundError(f"no committed versions at {path}")
    if version is None:
        version = versions[-1]
    if version not in versions:
        raise ValueError(
            f"version {version} not available at {path}; "
            f"committed: {versions}")
    return spark.read.parquet(_version_dir(path, version))


def vacuum_versions(path: str, keep_last: int = 2) -> list[int]:
    """Retention: drop all but the last ``keep_last`` versions.
    Manifest first, directories second — see the crash-safety notes."""
    with table_lock(path):
        manifest = _read_manifest(path)
        versions = sorted(manifest["versions"])
        drop = versions[:-keep_last] if keep_last > 0 else versions
        if not drop:
            return []
        manifest["versions"] = versions[len(drop):]
        _commit_manifest(path, manifest)
        for v in drop:
            shutil.rmtree(_version_dir(path, v), ignore_errors=True)
    return drop


def version_diff(spark, path: str, v_from: int, v_to: int,
                 key_cols: list[str], compare_cols: list[str]) -> DataFrame:
    """CDC between two committed versions: the changelog that replays
    ``v_from`` into ``v_to`` (relational.snapshot_diff, whose
    diff→apply round-trip is law-tested) — Delta's CDF surface on the
    hand-rolled version store."""
    from twitter_to_sqlite_spark.operators import relational as R

    return R.snapshot_diff(
        read_version(spark, path, v_from),
        read_version(spark, path, v_to),
        key_cols, compare_cols)


def gc_plan(spark, path: str, keep_last: int = 2) -> DataFrame:
    """Retention PLAN for the version store: one row per committed
    version with its exact row count and whether a
    ``vacuum_versions(keep_last)`` run would drop it — the dry-run a
    pipeline reviews (and alerts on) before destructive GC, plus the
    fraction of stored rows the vacuum would reclaim.

    Read side is manifest-resolved like every reader, so orphan
    staging/crash dirs are invisible to the plan exactly as they are
    to queries. Scale: one metadata-cheap count aggregate per version
    (parquet row counts come from footer statistics — no data scan);
    the report is |versions| rows, unioned lazily, nothing collected.
    """
    versions = list_versions(path)
    if not versions:
        raise FileNotFoundError(f"no committed versions at {path}")
    cut = len(versions) - keep_last if keep_last > 0 else len(versions)
    per = None
    for i, v in enumerate(versions):
        row = read_version(spark, path, v).agg(
            F.count(F.lit(1)).alias("n_rows")).select(
            F.lit(v).cast("long").alias("version"),
            "n_rows",
            F.lit(i < cut).alias("expirable"))
        per = row if per is None else per.unionByName(row)
    tot = per.agg(
        F.sum("n_rows").alias("__tot"),
        F.sum(F.when(F.col("expirable"), F.col("n_rows"))
              .otherwise(F.lit(0))).alias("__exp"))
    return per.crossJoin(F.broadcast(tot)).select(
        "version", "n_rows", "expirable",
        F.round(F.col("__exp").cast("double") / F.col("__tot"), 6)
        .alias("reclaim_frac"))


def diff_column_profile(spark, path: str, v_from: int, v_to: int,
                        key_cols: list[str],
                        compare_cols: list[str]) -> DataFrame:
    """Change ATTRIBUTION between two committed versions: which
    columns are actually churning? version_diff answers "which rows
    changed"; a pipeline reviewing an upstream refresh asks the next
    question — was it a price restatement or a status flip — before
    deciding whether downstream incremental jobs must re-run. One row
    per compare column with its changed-row count, plus '_added' /
    '_removed' rows for membership churn.

    Scale: one conditional aggregate over the version_diff frame
    (bounded by CHANGE volume, not table size — snapshot_diff already
    reduced the full outer join to changed rows only), exploded from
    a single row into the |compare_cols|+2 report rows.
    """
    d = version_diff(spark, path, v_from, v_to, key_cols, compare_cols)
    ct = F.col("change_type")
    aggs = [
        F.sum((ct == "added").cast("long")).alias("__added"),
        F.sum((ct == "removed").cast("long")).alias("__removed"),
    ]
    for c in compare_cols:
        changed = (ct == "changed") & ~F.col(f"old_{c}").eqNullSafe(
            F.col(f"new_{c}"))
        aggs.append(F.sum(changed.cast("long")).alias(f"__c_{c}"))
    one = d.agg(*aggs)
    rows = [F.struct(F.lit(c).alias("column"),
                     F.col(f"__c_{c}").alias("n"))
            for c in compare_cols]
    rows += [F.struct(F.lit("_added").alias("column"),
                      F.col("__added").alias("n")),
             F.struct(F.lit("_removed").alias("column"),
                      F.col("__removed").alias("n"))]
    return (one.select(F.explode(F.array(*rows)).alias("__r"))
            .select("__r.column", "__r.n"))
