"""Columnar IO with scale-oriented layout.

The reference stored everything as Cassandra wide rows — every analytical
read was a full-table scan through the connector, with no column pruning
beyond the CQL projection and no partition pruning at all (SURVEY.md §4).
Here the awards fact lands as Parquet partitioned by (year, month) of
start_date, so:

- time-bucketed queries (the monthly rollups, A3) prune at the directory
  level before any IO;
- Catalyst pushes predicates to row-group stats and prunes columns to the
  ReadSchema;
- files are sized by spark.sql.files.maxPartitionBytes for even task splits.

At 100 TB the same layout holds: ~240 month partitions x size-bounded files;
per-partition writes are idempotent overwrite (dynamic partition overwrite),
so re-ingesting a month replaces exactly that month.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def local_frame(spark: SparkSession, rows, schema) -> DataFrame:
    """Bounded local rows → DataFrame as ONE cheap partition.

    ``spark.createDataFrame(list, schema)`` parallelizes the pickled rows
    into ``defaultParallelism`` PYTHON slices: every downstream action then
    schedules that many Python-runner tasks (measured round 15 at local[32]:
    ~0.17 s of executor time per task for a 100-row frame — ~5.5 s of task
    time and ~0.5 s wall per action, repeated for every collect/join/write
    that touches the frame), and a write emits that many tiny files (the
    guide §6 small-file problem seeded at the source). Model-state frames
    (centroids, codebooks, probe cells, k-bounded audit outputs) are bounded
    by construction, so one slice is the right layout at EVERY scale: one
    task per action, one file per write. Values are bit-preserved — the rows
    are the same driver-side objects either way."""
    return spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)


def write_awards_partitioned(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write an awards-shaped DataFrame partitioned by (year, month)."""
    spark = df.sparkSession
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    out = df.withColumn("year", F.year("start_date").cast("int")).withColumn(
        "month", F.month("start_date").cast("int")
    )
    out.write.mode(mode).partitionBy("year", "month").parquet(path)


def read_awards(spark: SparkSession, path: str) -> DataFrame:
    """Read the partitioned awards table; year/month partition columns are
    available for pruning (e.g. .filter('year = 2023') never touches other
    directories)."""
    return spark.read.parquet(path)


def compact(df: DataFrame, target_partitions: int) -> DataFrame:
    """Coalesce small files before a write (post-AQE output sizing)."""
    return df.coalesce(target_partitions)


# --------------------------------------------------------------------------
# PK upsert semantics (merge-on-read + compaction)
# --------------------------------------------------------------------------
# The reference's Cassandra INSERT was implicitly an upsert on award_id
# (last write wins). On immutable columnar storage the scalable equivalent
# is merge-on-read: appends carry a monotonically increasing version; readers
# keep the newest row per key; a periodic compaction rewrites the table to
# one row per key. No global key lookup on the write path — writes stay
# append-only and O(batch), exactly what a 100-TB ingest needs.

VERSION_COL = "_version"

# URI schemes treated as local-filesystem (atomic-rename capable)
_LOCAL_SCHEMES = ("file",)


def _require_rename_capable(path: str, op: str) -> None:
    """Refuse object-store paths for operations whose crash-safety depends
    on atomic rename (os.replace / shutil.move). s3://, s3a://, gs://,
    abfs:// etc. have no atomic rename — a crash mid-swap can lose the
    table. The public-knowledge answer there is a real table format with
    snapshot commits (Delta/Iceberg, not installable in this environment);
    failing fast beats silently unsafe semantics."""
    scheme, sep, _ = path.partition("://")
    if sep and scheme.lower() not in _LOCAL_SCHEMES:
        raise ValueError(
            f"{op} requires an atomic-rename filesystem; got scheme "
            f"'{scheme}://'. Use a table format with snapshot commits "
            "(Delta/Iceberg) for object-store state."
        )


def append_versions(df: DataFrame, path: str, version: int) -> None:
    """Append a batch stamped with its version (e.g. the ingest run's epoch
    millis — caller supplies it so replays are idempotent). Guarded to
    rename-capable filesystems: the append itself is object-store-safe, but
    the table's upsert contract includes compact_versions, which is not —
    better to refuse at first write than corrupt at first compaction."""
    _require_rename_capable(path, "append_versions")
    df.withColumn(VERSION_COL, F.lit(version).cast("long")).write.mode("append").parquet(path)


def upsert_versions(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    version: int,
    key: str,
    compact_every: "int | None" = None,
) -> None:
    """Append + cadence-scheduled compaction: the merge-on-read PK-upsert
    sink with its maintenance folded in (the ``compact_every`` contract
    the streaming index jobs use, applied here — round-13 closing the
    loop: compact_versions existed but nothing scheduled it). After the
    append, when the live table holds MORE than ``compact_every``
    distinct versions, it is rewritten to one (newest row per key) —
    bounding read_latest's merge-on-read window cost at a constant
    instead of letting it grow with ingest history."""
    append_versions(df, path, version)
    if compact_every:
        n = spark.read.parquet(path).select(VERSION_COL).distinct().count()
        if n > int(compact_every):
            compact_versions(spark, path, key)


def read_latest(spark: SparkSession, path: str, key: str) -> DataFrame:
    """Last-write-wins view: newest version per key (merge-on-read)."""
    from pyspark.sql import Window

    df = spark.read.parquet(path)
    w = Window.partitionBy(key).orderBy(F.desc(VERSION_COL))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", VERSION_COL)
    )


def compact_versions(spark: SparkSession, path: str, key: str) -> None:
    """Rewrite the table keeping only the newest row per key (the
    compaction that bounds merge-on-read cost).

    Swap order is crash-safe on a local filesystem: write the compacted copy
    aside, rename the live table aside, rename the compacted copy in, THEN
    delete the old copy — at no point is the data unrecoverable (a crash
    between the two renames leaves the full old table at ``path__old_*``).
    Object stores have no atomic rename; there the public-knowledge answer
    is a real table format (Delta/Iceberg snapshot commit) — enforced by
    _require_rename_capable, same as the versioned-state manifest below."""
    _require_rename_capable(path, "compact_versions")
    latest = read_latest(spark, path, key).withColumn(
        VERSION_COL, F.lit(0).cast("long")
    )
    token = uuid.uuid4().hex[:8]
    tmp = f"{path}__compact_{token}"
    old = f"{path}__old_{token}"
    latest.write.mode("overwrite").parquet(tmp)
    shutil.move(path, old)
    shutil.move(tmp, path)
    shutil.rmtree(old)


# --------------------------------------------------------------------------
# Versioned state table (manifest-pointer commits)
# --------------------------------------------------------------------------
# Small materialized-state tables (incremental rollup state, stream
# accumulators) need atomic replace + replay idempotency. Layout:
#
#   path/_MANIFEST.json   -> {"version": N, "batch_id": B}
#   path/v=N/...parquet   -> the committed state snapshot
#
# Readers load the version the manifest points at; writers stage a new
# v=N+1 directory and then atomically repoint the manifest (os.replace — a
# POSIX atomic rename). A crash mid-write leaves a dangling v=N+1 dir and an
# intact manifest: the previous state is still what readers see. batch_id in
# the manifest makes foreachBatch replays detectable (at-least-once ->
# effectively-once). Local-filesystem scope; on object stores use a table
# format with snapshot commits.

_MANIFEST = "_MANIFEST.json"

# hadoop_swap_rewrite only sweeps an orphaned __compact_* staging dir
# once this old — a fresh one may belong to a concurrent swap mid-write
_COMPACT_ORPHAN_AGE_MS = 15 * 60 * 1000

# filesystems whose rename is NOT atomic (object stores) — the swap
# below would have an unbounded corruption window there; a real table
# format (Delta/Iceberg snapshot commits) is the answer on those
_NO_ATOMIC_RENAME = (
    "s3", "s3a", "s3n", "gs", "abfs", "abfss", "wasb", "wasbs", "oss",
    "cos", "swift",
)


def require_atomic_rename(path: str, op: str) -> None:
    """Refuse object-store schemes for swap-based rewrites (no atomic
    rename — an interrupted swap there has an unbounded corruption
    window). Callers check this FIRST, before any FS round-trip."""
    scheme, sep, _ = path.partition("://")
    if sep and scheme.lower() in _NO_ATOMIC_RENAME:
        raise ValueError(
            f"{op} requires an atomic-rename filesystem; got scheme "
            f"'{scheme}://'. Use a table format with snapshot commits "
            "(Delta/Iceberg) for object-store indexes."
        )


def hadoop_data_file_stats(spark: SparkSession, path: str) -> "tuple[int, int]":
    """``(n_files, n_bytes)`` of the DATA files under a parquet directory
    (recursively, through the Hadoop FS API so it works on any
    filesystem), skipping markers (_SUCCESS) and hidden files — the
    fragmentation metric the index compactors report and size their
    rewrites from."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(hpath):
        return 0, 0
    it = fs.listFiles(hpath, True)
    n = b = 0
    while it.hasNext():
        f = it.next()
        name = f.getPath().getName()
        if not name.startswith("_") and not name.startswith("."):
            n += 1
            b += int(f.getLen())
    return n, b


def hadoop_data_file_count(spark: SparkSession, path: str) -> int:
    return hadoop_data_file_stats(spark, path)[0]


def hadoop_read_json(spark: SparkSession, path: str) -> "dict | None":
    """Read a small JSON sidecar through the Hadoop FS API (None if
    absent) — manifests and metas must live on the SAME filesystem as
    the data they describe (the winnow-meta lesson: a driver-local read
    of a remote index fails from every other driver)."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(hpath):
        return None
    stream = fs.open(hpath)
    try:
        data = jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
    finally:
        stream.close()
    return json.loads(bytes(data).decode("utf-8"))


def hadoop_write_json(spark: SparkSession, path: str, obj: dict) -> None:
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    out = fs.create(hpath, True)
    try:
        out.write(bytearray(json.dumps(obj).encode("utf-8")))
    finally:
        out.close()


def hadoop_delete_prefixed(spark: SparkSession, target: str, prefix: str) -> None:
    """Delete every data file under ``target`` (recursively) whose name
    starts with ``prefix`` — the self-clean step of the idempotent
    batch-append: a crashed attempt's partial moves are identified by
    the batch's name prefix alone."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(target)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(hpath):
        return
    stale = []
    it = fs.listFiles(hpath, True)
    while it.hasNext():
        f = it.next().getPath()
        if f.getName().startswith(prefix):
            stale.append(f)
    for f in stale:
        fs.delete(f, False)


def hadoop_staged_append(
    spark: SparkSession, staging: str, target: str, prefix: str
) -> None:
    """Move every data file under ``staging`` into ``target`` — same
    relative subdirectory (so a partitionBy layout's ``cell=N`` dirs
    land in place and a flat layout's files land at the root) — renamed
    with the batch's ``prefix``; then drop the staging dir. The move
    step of the exactly-once append: the caller cleans prefix files
    first (hadoop_delete_prefixed), writes the staging dir, calls this,
    and advances its manifest LAST."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    spath = jvm.org.apache.hadoop.fs.Path(staging)
    sfs = spath.getFileSystem(conf)
    tpath = jvm.org.apache.hadoop.fs.Path(target)
    tfs = tpath.getFileSystem(conf)
    s_uri = str(sfs.makeQualified(spath).toUri().getPath())
    moves = []
    it = sfs.listFiles(spath, True)
    while it.hasNext():
        f = it.next().getPath()
        name = f.getName()
        if name.startswith("_") or name.startswith("."):
            continue
        parent = str(f.getParent().toUri().getPath())
        rel = parent[len(s_uri):].strip("/")
        moves.append((f, rel, name))
    for f, rel, name in moves:
        dest_dir = jvm.org.apache.hadoop.fs.Path(
            f"{target}/{rel}" if rel else target
        )
        tfs.mkdirs(dest_dir)
        dest = jvm.org.apache.hadoop.fs.Path(
            f"{target}/{rel}/{prefix}{name}"
            if rel
            else f"{target}/{prefix}{name}"
        )
        if not tfs.rename(f, dest):
            raise IOError(
                f"staged append: rename {f} -> {dest} failed; replaying "
                "the batch cleans its prefix files and redoes the move"
            )
    sfs.delete(spath, True)


def hadoop_swap_rewrite(spark: SparkSession, target: str, write_tmp, op: str) -> None:
    """Crash-bounded in-place rewrite of one parquet component: stage the
    rewritten copy aside, rename the live directory aside, rename the
    copy in, THEN delete the old — compact_versions' swap order carried
    onto the Hadoop FileSystem API so it serves hdfs:// as well as
    file:// (both have atomic directory rename). At no point is the data
    unrecoverable: a crash between the two renames leaves the full old
    component at ``{target}__old_*``. Object-store schemes are refused
    up front (no atomic rename — use a snapshot-commit table format
    there), matching the versioned-state contract above.

    Entry self-heals that crash window: if ``target`` is missing but a
    ``{target}__old_*`` leftover exists, the leftover is renamed back
    into place before the rewrite starts — a stream that folds
    compaction into foreachBatch (compact_every) recovers on its next
    trigger instead of failing every subsequent batch on a missing
    component. Orphaned ``__compact_*`` staging dirs are swept either
    way (they are pre-swap copies, never the only copy) — but only once
    older than ``_COMPACT_ORPHAN_AGE_MS``, so a CONCURRENT swap's
    in-flight staging dir is never destroyed by a second entrant
    (round-14 ADVICE). The component contract is still single-writer
    per component (two completing swaps race at the rename step, last
    one wins); the age guard only keeps the failure mode at "one swap
    wins" instead of "the other's staging dir is deleted mid-write".

    ``write_tmp(tmp_path)`` writes the rewritten component (the caller
    owns the plan — the swap only sequences the renames)."""
    require_atomic_rename(target, op)
    token = uuid.uuid4().hex[:8]
    tmp = f"{target}__compact_{token}"
    old = f"{target}__old_{token}"
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    t_path = jvm.org.apache.hadoop.fs.Path(target)
    fs = t_path.getFileSystem(conf)
    parent = t_path.getParent()
    base = t_path.getName()
    if fs.exists(parent):
        leftovers = [
            st
            for st in fs.listStatus(parent)
            if st.getPath().getName().startswith(f"{base}__old_")
        ]
        if leftovers and not fs.exists(t_path):
            # Crash landed between rename-aside and rename-in: the
            # newest __old_* IS the live component — restore it.
            newest = max(leftovers, key=lambda st: st.getModificationTime())
            keep = newest.getPath()
            if not fs.rename(keep, t_path):
                raise IOError(
                    f"{op}: auto-restore {keep} -> {target} failed; "
                    f"restore it manually (hdfs dfs -mv) and re-run"
                )
            leftovers.remove(newest)
        if fs.exists(t_path):
            for st in leftovers:
                fs.delete(st.getPath(), True)
        now_ms = int(time.time() * 1000)
        for st in fs.listStatus(parent):
            if (
                st.getPath().getName().startswith(f"{base}__compact_")
                and now_ms - st.getModificationTime() > _COMPACT_ORPHAN_AGE_MS
            ):
                fs.delete(st.getPath(), True)
    write_tmp(tmp)
    if not fs.rename(t_path, jvm.org.apache.hadoop.fs.Path(old)):
        raise IOError(f"{op}: rename {target} -> {old} failed")
    if not fs.rename(jvm.org.apache.hadoop.fs.Path(tmp), t_path):
        raise IOError(
            f"{op}: rename {tmp} -> {target} failed; previous component "
            f"preserved at {old}"
        )
    fs.delete(jvm.org.apache.hadoop.fs.Path(old), True)


def read_state_manifest(path: str) -> dict | None:
    try:
        with open(os.path.join(path, _MANIFEST), encoding="utf-8") as fh:
            return json.load(fh)
    except (OSError, ValueError):
        return None


def read_versioned_state(spark: SparkSession, path: str) -> DataFrame | None:
    """Load the committed state snapshot, or None if nothing committed yet."""
    manifest = read_state_manifest(path)
    if manifest is None:
        return None
    return spark.read.parquet(os.path.join(path, f"v={manifest['version']}"))


def commit_versioned_state(df: DataFrame, path: str, batch_id: int) -> None:
    """Write df as the next state version and atomically repoint the
    manifest. Prior versions older than the immediate predecessor are
    pruned (the predecessor is kept so a reader that loaded the manifest
    just before the swap can still finish its scan)."""
    _require_rename_capable(path, "commit_versioned_state")
    manifest = read_state_manifest(path)
    version = (manifest["version"] + 1) if manifest else 0
    df.write.mode("overwrite").parquet(os.path.join(path, f"v={version}"))
    tmp = os.path.join(path, f"{_MANIFEST}.tmp")
    with open(tmp, "w", encoding="utf-8") as fh:
        json.dump({"version": version, "batch_id": batch_id}, fh)
    os.replace(tmp, os.path.join(path, _MANIFEST))  # the atomic commit point
    for name in os.listdir(path):
        if name.startswith("v=") and int(name[2:]) < version - 1:
            shutil.rmtree(os.path.join(path, name), ignore_errors=True)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 32,
    mode: str = "overwrite",
) -> None:
    """Materialize a table bucketed (and sorted) by the join/aggregation key.

    Two tables bucketed by the same key into the same bucket count join
    WITHOUT a shuffle exchange — at 100 TB this turns the recurring
    fact ⋈ fact joins (and repeated aggregations on the same key) from a
    full-network shuffle into a local merge per bucket. The reference's
    Cassandra layout had the same goal (partition-key locality) but lost it
    the moment data entered Spark.
    """
    (
        df.write.mode(mode)
        .bucketBy(num_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(table)
    )


def zorder_value(
    df: DataFrame, cols: list[str], bits: int = 12, alias: str = "_z"
) -> DataFrame:
    """Add a Morton (Z-order) interleave column over ``cols``.

    Each column is linearly quantized to ``bits`` bits between its global
    min and max (one tiny 1-row aggregate broadcast back — the
    fixed_width_histogram pattern), then the bit-planes are interleaved so
    nearby (c1, c2, ...) points get nearby z-values. The whole computation
    is shift/or/floor expressions inside whole-stage codegen — no UDF.

    Linear quantization keeps the oracle-friendly determinism but is
    skew-sensitive; for heavy-tailed columns substitute a percent_rank
    pre-pass for the min/max scaling (one extra shuffle) and interleave the
    ranks instead.
    """
    if not cols or bits * len(cols) > 63:
        raise ValueError(f"need 1+ cols with bits*len(cols) <= 63, got {cols!r}")
    stats = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"_mn_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"_mx_{c}") for c in cols],
    )
    out = df.join(F.broadcast(stats))
    top = (1 << bits) - 1
    quantized = []
    for c in cols:
        mn, mx = F.col(f"_mn_{c}"), F.col(f"_mx_{c}")
        span = F.when(mx > mn, mx - mn).otherwise(F.lit(1.0))
        q = F.floor(
            (F.col(c).cast("double") - mn) * F.lit(float(top + 1)) / span
        )
        quantized.append(F.least(q, F.lit(top)).cast("long"))
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, q in enumerate(quantized):
            bit = F.shiftright(q, b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * len(cols) + i))
    return out.select(*df.columns, z.alias(alias))


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    num_files: int = 32,
    bits: int = 12,
) -> None:
    """Cluster ``df`` on the Z-order of ``cols`` and write size-balanced
    parquet files.

    Range-partitioning by z-value + sorting within each file makes every
    file's min/max footer stats NARROW on ALL interleaved columns at once,
    so a conjunctive box predicate (c1 BETWEEN ... AND c2 BETWEEN ...)
    prunes most files/row-groups at planning time — the multi-dimensional
    generalization of the single-key sort that only helps the leading
    column. This is the data-skipping layout for append-heavy 100-TB
    tables where queries filter on 2-4 correlated dimensions.
    """
    zdf = zorder_value(df, cols, bits=bits)
    (
        zdf.repartitionByRange(num_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def scd2_apply(
    current: DataFrame,
    updates: DataFrame,
    key: str,
    tracked: list[str],
    eff_date_col: str = "eff_date",
    eff_from_col: str = "eff_from",
    eff_to_col: str = "eff_to",
) -> DataFrame:
    """Slowly-changing-dimension Type-2 merge: apply a batch of dimension
    updates, closing changed open rows and appending new versions, keeping
    full history.

    The reference refreshes its dimension data by re-downloading and
    overwriting whole tables (app/ml_app.py ingest path); at 100 TB the
    scalable pattern is incremental history maintenance:

    - ``current``: the history table — ``key``, tracked attrs,
      ``eff_from``, ``eff_to`` (NULL = open row).
    - ``updates``: one row per key — ``key``, tracked attrs, ``eff_date``.

    Plan shape: closed history rows PASS THROUGH with no shuffle; open rows
    full-outer-join updates on the key (ONE shuffle — broadcast if the
    update batch is small), then each joined row expands through
    ``inline(array(struct...))`` into 0–2 output rows (close + insert for
    changed keys, insert for brand-new keys, identity otherwise) — the
    single-join alternative to the three-branch MERGE rewrite, which would
    re-shuffle the open set once per branch.

    Update rows are taken as-is (dedupe/latest-wins upstream); attribute
    comparison is null-safe (``eqNullSafe``), so NULL -> value and
    value -> NULL both count as changes.
    """
    open_rows = current.filter(F.col(eff_to_col).isNull())
    closed_rows = current.filter(F.col(eff_to_col).isNotNull())

    upd = updates.select(
        F.col(key).alias("_uk"),
        F.col(eff_date_col).alias("_ud"),
        *[F.col(c).alias(f"_u_{c}") for c in tracked],
    )
    j = open_rows.join(upd, open_rows[key] == F.col("_uk"), "full_outer")

    changed = ~F.lit(True)
    for c in tracked:
        changed = changed | ~F.col(c).eqNullSafe(F.col(f"_u_{c}"))

    def _row(key_c, from_c, to_c, cols):
        return F.struct(
            key_c.alias(key),
            *[c.alias(name) for c, name in zip(cols, tracked)],
            from_c.alias(eff_from_col),
            to_c.alias(eff_to_col),
        )

    old_cols = [F.col(c) for c in tracked]
    new_cols = [F.col(f"_u_{c}") for c in tracked]
    keep_old = _row(F.col(key), F.col(eff_from_col), F.lit(None).cast("timestamp"), old_cols)
    close_old = _row(F.col(key), F.col(eff_from_col), F.col("_ud"), old_cols)
    insert_new = _row(F.col("_uk"), F.col("_ud"), F.lit(None).cast("timestamp"), new_cols)

    rows = (
        F.when(F.col("_uk").isNull(), F.array(keep_old))  # no update for key
        .when(F.col(key).isNull(), F.array(insert_new))  # brand-new key
        .when(changed, F.array(close_old, insert_new))  # SCD2 close + insert
        .otherwise(F.array(keep_old))  # update arrived, nothing changed
    )
    out_cols = [key, *tracked, eff_from_col, eff_to_col]
    return closed_rows.select(*out_cols).unionByName(
        j.select(F.inline(rows)).select(*out_cols)
    )
