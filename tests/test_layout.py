"""Data-layout write path (operators/layout.py): small-file
compaction, its crash recovery, and the writer-exclusion lock that
enforces the no-concurrent-writers contract between compaction and
the streaming ingest loops."""

import os

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


# ----------------------------------------------------------------------
# compaction (moved from tests/test_sketches.py — layout tests live
# with the layout module)
# ----------------------------------------------------------------------

def test_compact_dataset_preserves_content(spark, tmp_path):
    """Compacting a per-batch fragmented archive: file count drops to
    the target, every row survives byte-for-byte."""
    from htsql_spark.operators.layout import compact_dataset

    path = str(tmp_path / "frag")
    docs = _docs(spark)
    # fragment: 5 "batches", several files each
    for b in range(5):
        docs.filter(F.col("doc_id") % 5 == b).repartition(4).write.parquet(
            f"{path}/batch={b}"
        )
    before = spark.read.parquet(path)
    exp = sorted(map(tuple, before.collect()))
    n_files = compact_dataset(spark, path, target_files=2)
    assert n_files == 2
    after = spark.read.parquet(path)
    got = sorted(map(tuple, after.collect()))
    assert got == exp  # batch partition column included, values intact


def test_compact_dataset_missing_path_raises(spark, tmp_path):
    from htsql_spark.operators.layout import compact_dataset

    with pytest.raises(FileNotFoundError):
        compact_dataset(spark, str(tmp_path / "nope"))
    # the lock taken on entry must not leak past the failure
    assert not os.path.exists(str(tmp_path / "nope") + "__lock")


def test_compact_dataset_recovers_from_crashed_swap(spark, tmp_path):
    """A crash between the two swap renames leaves the dataset parked
    at path__precompact and nothing at path; the next compact_dataset
    call must restore the backup and complete instead of raising
    FileNotFoundError with the data stranded."""
    from htsql_spark.operators.layout import compact_dataset

    path = str(tmp_path / "ds")
    docs = _docs(spark)
    docs.repartition(6).write.parquet(path)
    exp = sorted(map(tuple, spark.read.parquet(path).collect()))
    # simulate the crash window: src renamed away, staging never
    # renamed in (the staging dir itself was already consumed/absent)
    os.rename(path, path + "__precompact")
    n_files = compact_dataset(spark, path, target_files=1)
    assert n_files == 1
    got = sorted(map(tuple, spark.read.parquet(path).collect()))
    assert got == exp
    assert not os.path.exists(path + "__precompact")


# ----------------------------------------------------------------------
# writer-exclusion lock
# ----------------------------------------------------------------------

def test_compaction_blocked_by_held_lock(spark, tmp_path):
    """An ingest batch's lock makes a concurrent compaction raise
    (naming the holder), instead of silently dropping the batch's
    append; after release, compaction proceeds and releases its own
    lock."""
    from htsql_spark.operators.layout import (
        acquire_dataset_lock,
        compact_dataset,
        release_dataset_lock,
    )

    path = str(tmp_path / "ds")
    _docs(spark).repartition(4).write.parquet(path)
    acquire_dataset_lock(spark, path, owner="run_dedup_ingest batch=7")
    with pytest.raises(ValueError, match="run_dedup_ingest batch=7"):
        compact_dataset(spark, path)
    release_dataset_lock(spark, path)
    assert compact_dataset(spark, path, target_files=1) == 1
    assert not os.path.exists(path + "__lock")
    # double-acquire of the raw primitive also refuses
    acquire_dataset_lock(spark, path, owner="a")
    with pytest.raises(ValueError, match="'a'"):
        acquire_dataset_lock(spark, path, owner="b")
    release_dataset_lock(spark, path)


def test_ingest_batches_blocked_by_compaction_lock(spark, tmp_path):
    """Both streaming batch processors check the archive lock at
    batch start: a held compaction lock turns the micro-batch into a
    loud failure (retried by the stream after the lock clears), never
    a write raced against the rewrite window."""
    from htsql_spark.operators.layout import (
        acquire_dataset_lock,
        release_dataset_lock,
    )
    from htsql_spark.streaming.curate import (
        _process_exact_batch,
        _process_ingest_batch,
    )

    archive = str(tmp_path / "arch")
    batch = _docs(spark).filter("doc_id < 20")
    acquire_dataset_lock(spark, archive, owner=f"compact_dataset({archive})")
    with pytest.raises(ValueError, match="compact_dataset"):
        _process_exact_batch(spark, batch, 0, archive, 0.001)
    with pytest.raises(ValueError, match="compact_dataset"):
        _process_ingest_batch(spark, batch, 0, archive, "t_lock_idx", 0.8)
    release_dataset_lock(spark, archive)
    # after release the batch goes through and releases its own lock
    _process_exact_batch(spark, batch, 0, archive, 0.001)
    assert not os.path.exists(archive + "__lock")
    assert spark.read.parquet(archive).count() == batch.count()


def test_ingest_batch_releases_lock_on_failure(spark, tmp_path):
    """A batch that BLOWS UP mid-processing still releases the lock
    (finally), so the stream's retry isn't deadlocked against its own
    crashed attempt."""
    from htsql_spark.streaming.curate import _process_exact_batch

    archive = str(tmp_path / "arch")
    bad = _docs(spark).select("doc_id")  # no text column -> fails
    with pytest.raises(Exception):
        _process_exact_batch(spark, bad, 0, archive, 0.001)
    assert not os.path.exists(archive + "__lock")
