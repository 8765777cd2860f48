"""Data-layout optimization for the write path (beyond-reference;
100 TB posture).

At scale, *how files are laid out* decides scan cost as much as the
plan: partition pruning needs directory partitioning on low-
cardinality predicates, row-group skipping needs value clustering on
high-cardinality ones.  Two helpers:

* ``write_partitioned`` — directory partitioning + per-file size
  control (repartition on the partition key so each directory gets
  dense files, not one sliver per task).
* ``write_clustered`` — range-cluster rows on sort keys (for ONE
  dominant filter key range clustering via ``repartitionByRange`` +
  ``sortWithinPartitions`` gives parquet min/max row-group statistics
  that let Spark's scan skip row groups for selective predicates).
* ``write_zordered`` — Morton-interleaved clustering for 2+
  INDEPENDENT filter dimensions, where linear range clustering keeps
  stats tight on the first key only: every file gets a small
  bounding box in all clustered columns at once.
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    files_per_partition: int = 1,
    format: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Directory-partitioned write with dense files: repartition on
    the partition columns first so each directory holds
    ``files_per_partition`` files instead of one fragment per task."""
    if files_per_partition == 1:
        # one task per key → one dense file per directory
        out = df.repartition(*[F.col(c) for c in partition_cols])
    else:
        # salt so each directory gets N files written in parallel
        out = df.repartition(
            *[F.col(c) for c in partition_cols],
            (F.rand(seed=42) * files_per_partition).cast("int"),
        )
    out.write.partitionBy(*partition_cols).format(format).mode(mode).save(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table (hash-bucketed on ``bucket_cols``,
    optionally sorted within buckets): two tables bucketed the same
    way join WITHOUT an Exchange on either side — at 100 TB this
    turns the orders⋈lineitem fact-fact join from a full dual
    shuffle into a zip of co-located buckets.  Requires
    ``saveAsTable`` (bucket metadata lives in the session catalog /
    metastore; plain ``.save(path)`` silently drops bucketing).
    Pre-repartition on the bucket columns so each bucket is written
    by one task — otherwise every task writes a sliver of every
    bucket (task_count × n_buckets files)."""
    w = (
        df.repartition(n_buckets, *[F.col(c) for c in bucket_cols])
        .write.bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.format("parquet").mode(mode).saveAsTable(table)
    # an append does not reliably invalidate the session's cached file
    # listing for the table (observed: spark.table() serving the
    # pre-append row count when the insert's source plan was a
    # checkpointed RDD) — refresh explicitly so readers in the same
    # session see the new files; metadata-only, cheap at any scale
    df.sparkSession.catalog.refreshTable(table)


def compact_bucketed_table(spark, table: str, extra_locks: list[str] | None = None) -> int:
    """Small-file compaction for an append-accumulated BUCKETED
    managed table (the band/fp index maintenance pass: each streaming
    micro-batch appends its own bucket file set, so after N batches
    every bucket is N small files and the zero-Exchange index join
    pays N file-opens per bucket).  Rewrites the table to exactly one
    dense file per bucket, PRESERVING the bucket spec — introspected
    from the catalog, staged under ``{table}__compacting``, swapped
    via table renames with a ``{table}__precompact`` backup and the
    same crash-recovery-on-entry discipline as :func:`compact_dataset`.

    Writer exclusion: holds the dataset lock on the table's location,
    plus one lock per ``extra_locks`` path — pass the archive path of
    the ingest loop that maintains this index so compaction and
    micro-batches exclude each other (the loops lock the archive
    path, not the index location).  Returns the number of data files
    after compaction."""
    if "." in table:
        raise ValueError(f"qualified table names are not supported: {table!r}")
    staging, backup = f"{table}__compacting", f"{table}__precompact"

    def _describe(name: str) -> dict:
        return {
            r["col_name"]: r["data_type"]
            for r in spark.sql(f"DESCRIBE FORMATTED {name}").collect()
        }

    # Resolve the LOCK path before mutating anything, from whichever
    # of table/backup exists.  The crash-recovery rename itself must
    # run INSIDE the lock (mirroring compact_dataset's order): a
    # second compaction entering during another's live swap window
    # sees table-missing + backup-present, and renaming the backup
    # out from under the in-flight swap would break its staging
    # rename and resurrect stale pre-compact data.  A managed-table
    # rename moves the directory, so the backup's location carries
    # the __precompact suffix — strip it to lock the same canonical
    # path the live compaction holds.
    def _resolve_lock_loc() -> str:
        if spark.catalog.tableExists(table):
            return _describe(table)["Location"]
        if spark.catalog.tableExists(backup):
            loc = _describe(backup)["Location"]
            if loc.rstrip("/").endswith("__precompact"):
                loc = loc.rstrip("/")[: -len("__precompact")]
            return loc
        raise ValueError(f"compact_bucketed_table: no table {table!r}")

    try:
        lock_loc = _resolve_lock_loc()
    except AnalysisException:
        # TOCTOU: a concurrent compaction's swap renamed the table
        # between tableExists() and DESCRIBE.  The rename pair keeps
        # table-or-backup present at every instant, so one
        # re-resolution lands on whichever name now exists instead of
        # surfacing the raw AnalysisException.
        lock_loc = _resolve_lock_loc()
    locks = [lock_loc] + list(extra_locks or [])
    taken: list[str] = []
    try:
        for p in locks:
            acquire_dataset_lock(
                spark, p, owner=f"compact_bucketed_table({table})"
            )
            taken.append(p)
        # crash recovery, now safely exclusive: crashed between the
        # two renames means the backup IS the table
        if not spark.catalog.tableExists(table) and spark.catalog.tableExists(
            backup
        ):
            spark.sql(f"ALTER TABLE {backup} RENAME TO {table}")
        if not spark.catalog.tableExists(table):
            raise ValueError(f"compact_bucketed_table: no table {table!r}")
        desc = _describe(table)
        if "Num Buckets" not in desc:
            raise ValueError(
                f"compact_bucketed_table: {table!r} is not bucketed"
            )
        n_buckets = int(desc["Num Buckets"])

        def _cols(key: str) -> list[str]:
            raw = desc.get(key, "[]").strip("[]")
            return [c.strip(" `") for c in raw.split(",") if c.strip(" `")]

        bucket_cols, sort_cols = _cols("Bucket Columns"), _cols("Sort Columns")
        location = desc["Location"]
        spark.sql(f"DROP TABLE IF EXISTS {staging}")  # crashed attempt
        # read the LOCATION, not the table: a bucketed relation claims
        # HashPartitioning(bucket_cols, n) at the logical level, so the
        # optimizer deletes write_bucketed's repartition as redundant —
        # and the planner then disables the bucketed scan anyway (no
        # operator requires the distribution), leaving arbitrary file
        # splits that write one file per (task, bucket) instead of one
        # per bucket (measured 25 files for an 8-bucket table).  The
        # plain path scan claims nothing, so the repartition stands.
        write_bucketed(
            spark.read.format("parquet").load(location),
            staging,
            bucket_cols,
            n_buckets=n_buckets,
            sort_cols=sort_cols or None,
        )
        spark.sql(f"DROP TABLE IF EXISTS {backup}")
        spark.sql(f"ALTER TABLE {table} RENAME TO {backup}")
        spark.sql(f"ALTER TABLE {staging} RENAME TO {table}")
        spark.sql(f"DROP TABLE {backup}")
        spark.catalog.refreshTable(table)
        new_loc = {
            r["col_name"]: r["data_type"]
            for r in spark.sql(f"DESCRIBE FORMATTED {table}").collect()
        }["Location"]
        p = spark._jvm.org.apache.hadoop.fs.Path(new_loc)
        fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
        return len(
            [
                s
                for s in fs.listStatus(p)
                if s.getPath().getName().startswith("part-")
            ]
        )
    finally:
        for p in taken:
            release_dataset_lock(spark, p)


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    n_files: int = 8,
    format: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Range-clustered write: rows globally range-partitioned then
    sorted within each file on ``cluster_cols`` — parquet min/max
    stats become disjoint, so point/range scans skip whole files and
    row groups."""
    (
        df.repartitionByRange(n_files, *cluster_cols)
        .sortWithinPartitions(*cluster_cols)
        .write.format(format)
        .mode(mode)
        .save(path)
    )


def zorder_key(cols: list, bits: int = 8):
    """Morton (Z-order) key: bit-interleave ``len(cols)`` already-
    binned non-negative ints (each < 2**bits) into one clustering
    key.  Pure whole-stage-codegen JVM arithmetic (shift/and/or per
    bit) — no UDF, no shuffle; cost is ``bits × d`` integer ops per
    row.

    Bit layout: output bit ``b*d + i`` is input bit ``b`` of column
    ``i``, so column 0 holds the LEAST significant position within
    each interleave group (ties between equal-bit prefixes break on
    earlier columns last — irrelevant for clustering quality, fixed
    for determinism and the oracle)."""
    d = len(cols)
    if d < 2:
        raise ValueError("zorder_key: needs >= 2 columns (use range "
                         "clustering / write_clustered for 1 key)")
    cols = [F.col(c) if isinstance(c, str) else c for c in cols]
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(cols):
            z = z + F.shiftleft(
                F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1)),
                b * d + i,
            )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    bits: int = 8,
    n_files: int = 8,
    format: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Z-order clustered write for MULTI-dimensional pruning: range
    clustering (:func:`write_clustered`) makes file min/max stats
    tight on the FIRST sort key only — a filter on the second key
    alone skips nothing.  Interleaving the keys' bits gives every
    file a small bounding box in ALL ``cluster_cols`` at once, so
    selective predicates on any subset of the dimensions skip files
    (the Delta OPTIMIZE ZORDER workload, done with stock Spark ops).

    Each column is first binned to ``2**bits`` quantile ranks via an
    ``approxQuantile`` boundary array (driver-side: ``2**bits``
    doubles per column — metadata-sized at any data scale) and a
    binary-search-free JVM bucket lookup (``size(filter(...))`` over
    the broadcast boundary literal); the interleaved key then drives
    ``repartitionByRange + sortWithinPartitions``.  Quantile binning
    (not min/max scaling) keeps the z-curve balanced under skew —
    a heavy-hitter value occupies many cells instead of collapsing
    the curve into one.

    The z-key is a TRANSIENT clustering driver — it is not written.
    One shuffle total (the range partition); binning adds one
    aggregate pass over the two columns only."""
    if len(cluster_cols) < 2:
        raise ValueError("write_zordered: needs >= 2 cluster_cols")
    n_bins = 2 ** bits
    probs = [i / n_bins for i in range(1, n_bins)]
    binned = []
    for c in cluster_cols:
        cuts = df.select(F.col(c).cast("double").alias(c)).approxQuantile(
            c, probs, 0.001
        )
        arr = F.array(*[F.lit(float(v)) for v in cuts])
        binned.append(
            F.size(F.filter(arr, lambda b: b <= F.col(c).cast("double")))
        )
    zcol = zorder_key(binned, bits=bits)
    (
        df.withColumn("__z", zcol)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.format(format)
        .mode(mode)
        .save(path)
    )


def table_location(spark, table: str) -> str:
    """A managed table's storage location (DESCRIBE FORMATTED) — the
    canonical path the writer-exclusion lock protects: compaction,
    index appends, and ingest loops must all lock the SAME string for
    the exclusion to hold."""
    return {
        r["col_name"]: r["data_type"]
        for r in spark.sql(f"DESCRIBE FORMATTED {table}").collect()
    }["Location"]


def _dataset_lock(jvm, path: str):
    return jvm.org.apache.hadoop.fs.Path(path + "__lock")


def acquire_dataset_lock(spark, path: str, owner: str) -> None:
    """Take the per-dataset writer-exclusion lock: a marker file at
    ``{path}__lock`` created atomically (``FileSystem.create`` with
    overwrite=False — atomic on HDFS and local FS alike), containing
    the owner tag for diagnostics.

    This is what turns the "no concurrent writers during compaction"
    contract from documentation into an error: ``compact_dataset``
    holds the lock across its read-rewrite-swap window, the streaming
    ingest batch processors hold it across each micro-batch, and
    whichever side arrives second raises instead of silently losing
    the other's writes.

    A process killed while holding the lock leaves it behind; the
    next acquire raises with the holder tag and the lock path — after
    confirming nothing is running, the operator deletes the file to
    release.  That manual step is the deliberate trade: a stale lock
    fails loudly and recoverably, a missed exclusion loses data
    silently."""
    jvm = spark._jvm
    lock = _dataset_lock(jvm, path)
    fs = lock.getFileSystem(spark._jsc.hadoopConfiguration())
    created = False
    try:
        out = fs.create(lock, False)
        created = True
        out.write(bytearray(owner.encode("utf-8")))
        out.close()
    except Exception as e:  # Py4JJavaError wrapping FileAlreadyExists
        if created:
            # the atomic create WON; the failure is writing the owner
            # tag — release our own lock rather than stranding an
            # empty one, and surface the real error
            fs.delete(lock, False)
            raise
        if "FileAlreadyExistsException" not in str(e) and not fs.exists(lock):
            raise
        holder = "unknown"
        try:
            stream = fs.open(lock)
            reader = jvm.java.io.BufferedReader(
                jvm.java.io.InputStreamReader(stream)
            )
            holder = reader.readLine() or "unknown"
            reader.close()
        except Exception:
            pass
        raise ValueError(
            f"dataset {path} is locked by {holder!r} ({lock}); a "
            "compaction or ingest batch is in flight — or crashed "
            "while holding the lock, in which case delete the lock "
            "file to release it"
        )


def release_dataset_lock(spark, path: str) -> None:
    lock = _dataset_lock(spark._jvm, path)
    fs = lock.getFileSystem(spark._jsc.hadoopConfiguration())
    fs.delete(lock, False)


def compact_dataset(
    spark,
    path: str,
    target_files: int = 1,
    format: str = "parquet",
) -> int:
    """Small-file compaction for an append-accumulated dataset (the
    maintenance pass every streaming landing zone needs: per-batch
    subdirectories — e.g. ``streaming.run_exact_dedup_ingest``'s
    ``batch=N`` layout — fragment into one file per micro-batch, and
    scan cost at 100 TB is dominated by file-open overhead once files
    shrink below a row group).

    Reads the dataset (partition-discovery columns included),
    rewrites it as ``target_files`` dense files via a staging
    directory, then swaps via two renames with a backup in between.
    The swap is NOT a single atomic operation: a crash between the
    two renames leaves the dataset parked at ``path__precompact``, so
    on entry that backup — if present while ``path`` is missing — is
    renamed back into place before anything else (crash recovery).

    Compaction must not run concurrently with writers: an append
    (e.g. a streaming micro-batch) landing between the read and the
    swap would be silently dropped by the rewrite.  That exclusion is
    ENFORCED via :func:`acquire_dataset_lock` — held here across the
    whole read-rewrite-swap window, and taken per micro-batch by the
    streaming ingest loops (streaming/curate.py), so a concurrent
    writer raises instead of losing data.  Returns the number of data
    files after compaction."""
    acquire_dataset_lock(spark, path, owner=f"compact_dataset({path})")
    try:
        jvm = spark._jvm
        conf = spark._jsc.hadoopConfiguration()
        src = jvm.org.apache.hadoop.fs.Path(path)
        fs = src.getFileSystem(conf)
        backup = jvm.org.apache.hadoop.fs.Path(path + "__precompact")
        if not fs.exists(src) and fs.exists(backup):
            # crashed between rename(src, backup) and rename(staging,
            # src): the backup IS the dataset — restore it and continue
            fs.rename(backup, src)
        if not fs.exists(src):
            raise FileNotFoundError(f"compact_dataset: no dataset at {path}")
        # PRESERVE hive-style partition layout (batch=N, date=...):
        # the rewrite must keep partition values as DIRECTORIES, or the
        # next partitioned append (archive/batch=N+1) would mix leaf
        # depths and every subsequent read would fail with
        # 'Conflicting directory structures detected'
        part_cols: list[str] = []
        probe = src
        while True:
            subs = [
                s
                for s in fs.listStatus(probe)
                if s.isDirectory() and "=" in s.getPath().getName()
            ]
            if not subs:
                break
            part_cols.append(subs[0].getPath().getName().split("=", 1)[0])
            probe = subs[0].getPath()
        df = spark.read.format(format).load(path)
        staging = jvm.org.apache.hadoop.fs.Path(path + "__compacting")
        if fs.exists(staging):
            # leftover from a crashed attempt: staged data was never
            # swapped in, the source is still authoritative — discard
            fs.delete(staging, True)
        if part_cols:
            # colocate each partition value in one task → one dense
            # file per partition directory
            writer = df.repartition(
                max(target_files, 1), *[F.col(c) for c in part_cols]
            ).write.partitionBy(*part_cols)
        else:
            writer = df.repartition(target_files).write
        writer.mode("overwrite").format(format).save(str(staging))
        if fs.exists(backup):
            fs.delete(backup, True)
        # Hadoop rename reports failure by RETURN VALUE — an unchecked
        # false from the second rename followed by the backup delete
        # would leave no dataset at `path`
        if not fs.rename(src, backup):
            raise IOError(
                f"compact_dataset: rename({path}, __precompact) failed"
                " — dataset left untouched"
            )
        if not fs.rename(staging, src):
            fs.rename(backup, src)  # restore
            raise IOError(
                f"compact_dataset: rename(__compacting, {path}) failed"
                " — dataset restored from backup"
            )
        fs.delete(backup, True)
        # refresh only this path — clearCache() would wipe every cached
        # table in the session
        spark.catalog.refreshByPath(path)

        def _count_parts(p) -> int:
            n = 0
            for s in fs.listStatus(p):
                if s.isDirectory():
                    n += _count_parts(s.getPath())
                elif s.getPath().getName().startswith("part-"):
                    n += 1
            return n

        return _count_parts(src)
    finally:
        release_dataset_lock(spark, path)


def replace_dataset(spark, staging: str, path: str, backup_suffix: str = "__preswap") -> None:
    """Atomically replace the dataset at ``path`` with the one staged
    at ``staging`` — the two-rename + backup discipline of
    :func:`compact_dataset` factored out for every epoch-rewrite
    consumer (the streaming complete-mode drain sink uses this so a
    reader never observes a half-written epoch and a crash mid-swap
    keeps the previous epoch; ``apply_cdc_batch`` runs the same
    sequence under its dataset lock).

    Crash states and their recovery, all handled ON ENTRY of the next
    call: (a) backup present while ``path`` is missing — crashed
    between the two renames; the backup IS the dataset and is
    restored first.  (b) staging leftover — never swapped in; the
    caller overwrote it anyway (``mode('overwrite')``), so nothing to
    do here.  Hadoop ``rename`` reports failure by RETURN VALUE: both
    renames are checked, and a failed second rename restores the
    backup and raises instead of leaving ``path`` empty."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    src = jvm.org.apache.hadoop.fs.Path(path)
    fs = src.getFileSystem(conf)
    stg = jvm.org.apache.hadoop.fs.Path(staging)
    backup = jvm.org.apache.hadoop.fs.Path(path + backup_suffix)
    if not fs.exists(stg):
        raise FileNotFoundError(f"replace_dataset: nothing staged at {staging}")
    if not fs.exists(src) and fs.exists(backup):
        # crashed between the two renames on a PREVIOUS swap: restore
        # so the pre-swap state is what this swap replaces.  The
        # recovery rename must be CHECKED like every other rename
        # (round-12 review): an unchecked false here followed by the
        # backup delete below would destroy the only copy
        if not fs.rename(backup, src):
            raise IOError(
                f"replace_dataset: recovery rename({backup}, {path})"
                " failed — backup left in place, nothing replaced"
            )
    if fs.exists(backup):
        # src exists too: leftover from a crash AFTER the second
        # rename but before the backup delete — stale, safe to drop
        fs.delete(backup, True)
    had_src = fs.exists(src)
    if had_src and not fs.rename(src, backup):
        raise IOError(
            f"replace_dataset: rename({path}, {backup_suffix}) failed"
            " — dataset left untouched"
        )
    if not fs.rename(stg, src):
        if had_src:
            fs.rename(backup, src)  # put the previous epoch back
        raise IOError(
            f"replace_dataset: rename(staging, {path}) failed —"
            " dataset restored from backup"
        )
    fs.delete(backup, True)
    spark.catalog.refreshByPath(path)
