"""Streaming snapshot maintenance: a CDC change stream continuously
folded into a queryable snapshot dataset — the MERGE-INTO loop every
warehouse mirror runs, built from :func:`~htsql_spark.operators.
analytics.apply_cdc` plus the layout module's writer-exclusion lock
and rename-swap discipline.

Per micro-batch the snapshot side is NEVER shuffled (apply_cdc's
broadcast key-set anti join), so the loop's steady-state cost is
O(batch) + one map-side pass over the snapshot — at 100 TB the
rewrite I/O dominates, which is the same floor Delta/Iceberg MERGE
pays (they reduce it with file-level pruning; here the snapshot is a
plain parquet dataset and the whole point is stock-Spark ops).

Delivery semantics: offsets are exactly-once via the streaming
checkpoint, and the batch body is IDEMPOTENT — re-applying the same
change batch to an already-updated snapshot is a fixed point (upserts
rewrite the same values, deletes find nothing) — so crash-retry
re-runs converge.  The swap is the two-rename + backup pattern of
``layout.compact_dataset`` with the same crash recovery on entry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.analytics import apply_cdc
from ..operators.layout import (
    acquire_dataset_lock,
    release_dataset_lock,
    replace_dataset,
)


def apply_cdc_batch(
    spark: SparkSession,
    batch: DataFrame,
    snapshot_path: str,
    key: str | list[str],
    ts_col: str = "ts",
    op_col: str = "op",
    delete_op: str = "D",
    snapshot_files: int = 8,
) -> None:
    """Fold one CDC batch into the snapshot at ``snapshot_path``
    under the dataset lock (shared with ``compact_dataset`` and the
    ingest loops, so maintenance passes and snapshot updates exclude
    each other).  A missing snapshot bootstraps from the batch's
    non-meta columns (first batch = initial load).  Usable directly
    for one-shot batch MERGEs too."""
    acquire_dataset_lock(
        spark, snapshot_path, owner=f"apply_cdc_batch({snapshot_path})"
    )
    try:
        jvm = spark._jvm
        conf = spark._jsc.hadoopConfiguration()
        src = jvm.org.apache.hadoop.fs.Path(snapshot_path)
        fs = src.getFileSystem(conf)
        backup = jvm.org.apache.hadoop.fs.Path(snapshot_path + "__presnap")
        if not fs.exists(src) and fs.exists(backup):
            # crashed between the two swap renames: the backup IS the
            # snapshot — restore before anything else.  CHECKED
            # (round-12 review): an unchecked false would make the
            # missing-snapshot bootstrap below silently reinitialize
            # the snapshot from this one change batch
            if not fs.rename(backup, src):
                raise IOError(
                    f"apply_cdc_batch: recovery rename(__presnap,"
                    f" {snapshot_path}) failed — snapshot not applied"
                )
        base_cols = [c for c in batch.columns if c not in (ts_col, op_col)]
        if fs.exists(src):
            base = spark.read.parquet(snapshot_path)
        else:
            base = spark.createDataFrame(
                [], batch.select(*base_cols).schema
            )
        new_snap = apply_cdc(
            base.select(*base_cols),
            batch,
            key=key,
            ts_col=ts_col,
            op_col=op_col,
            delete_op=delete_op,
        )
        staging = snapshot_path + "__staging"
        # mode('overwrite') discards a crashed attempt's leftover
        # staging; the swap itself is layout.replace_dataset — the
        # checked two-rename + backup discipline (a failed rename
        # restores the snapshot and raises; an unchecked false would
        # leave the path empty and the next batch's bootstrap would
        # silently reinitialize from one change batch)
        (
            new_snap.repartition(snapshot_files)
            .write.mode("overwrite")
            .parquet(staging)
        )
        replace_dataset(
            spark, staging, snapshot_path, backup_suffix="__presnap"
        )
    finally:
        release_dataset_lock(spark, snapshot_path)


def run_cdc_snapshot(
    spark: SparkSession,
    stream: DataFrame,
    snapshot_path: str,
    key: str | list[str],
    ts_col: str = "ts",
    op_col: str = "op",
    delete_op: str = "D",
    snapshot_files: int = 8,
) -> None:
    """Drive :func:`apply_cdc_batch` from a Structured Streaming
    change source with ``availableNow`` (drain the backlog, then
    return).  Change batches must carry ``key``, the snapshot
    attribute columns, ``ts_col`` and ``op_col``; ordering ACROSS
    batches is by arrival (a later micro-batch's upsert beats an
    earlier one's regardless of ts — CDC logs replay in order), and
    within a batch by (``ts_col``, ``op_col`` desc) per apply_cdc's
    contract."""

    def process(batch: DataFrame, batch_id: int) -> None:
        apply_cdc_batch(
            spark,
            batch,
            snapshot_path,
            key=key,
            ts_col=ts_col,
            op_col=op_col,
            delete_op=delete_op,
            snapshot_files=snapshot_files,
        )

    (
        stream.writeStream.foreachBatch(process)
        .trigger(availableNow=True)
        .option("checkpointLocation", f"{snapshot_path}__checkpoint")
        .start()
        .awaitTermination()
    )
