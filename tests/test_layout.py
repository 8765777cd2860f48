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


def _drop_table(spark, *names):
    """Drop tables AND their warehouse directories: the session
    catalog is per-session but the warehouse is shared on disk, so a
    prior (crashed) session can orphan a location that makes
    saveAsTable fail with LOCATION_ALREADY_EXISTS."""
    import shutil

    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for name in names:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        shutil.rmtree(os.path.join(wh, name.lower()), ignore_errors=True)


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


def test_compact_bucketed_table_preserves_rows_and_bucketing(spark):
    """Fragment a bucketed index with several appends, compact: rows
    survive exactly, file count drops to one per bucket, the bucket
    spec survives the swap (the candidate join still reads the index
    scan with no non-broadcast Exchange above it), and the locks are
    released."""
    from pyspark.sql import functions as F

    from htsql_spark.operators import dedup
    from htsql_spark.operators.layout import (
        compact_bucketed_table,
        write_bucketed,
    )

    docs = _docs(spark)
    _drop_table(spark, "t_cbt_idx", "t_cbt_idx__compacting", "t_cbt_idx__precompact")
    for b in range(4):  # 4 "batches" of appends -> 4 file sets
        write_bucketed(
            dedup._band_table(docs.filter(F.col("doc_id") % 4 == b)),
            "t_cbt_idx",
            ["h"],
            n_buckets=8,
            sort_cols=["h"],
            mode="append" if b else "overwrite",
        )
    before = spark.table("t_cbt_idx")
    exp = sorted(map(tuple, before.collect()))
    n_files = compact_bucketed_table(spark, "t_cbt_idx")
    assert n_files == 8
    after = spark.table("t_cbt_idx")
    assert sorted(map(tuple, after.collect())) == exp
    # bucket spec survived: the (band, h) candidate join reads the
    # index without a non-broadcast Exchange above its scan
    probe = dedup._band_table(docs.filter("doc_id < 30"))
    cross = after.alias("e").join(
        probe.alias("i"),
        (F.col("e.band") == F.col("i.band")) & (F.col("e.h") == F.col("i.h")),
    )
    plan = cross._jdf.queryExecution().executedPlan().toString()
    lines = plan.splitlines()
    scan_line = next(i for i, l in enumerate(lines) if "t_cbt_idx" in l)
    assert not any(
        "Exchange" in l for l in lines[:scan_line] if "Broadcast" not in l
    ), plan
    spark.sql("DROP TABLE IF EXISTS t_cbt_idx")


def test_compact_bucketed_table_blocked_by_ingest_lock(spark, tmp_path):
    """extra_locks wires the index compaction into the ingest loop's
    archive-path exclusion: a held archive lock blocks compaction,
    and a failed acquisition releases the location lock it already
    took (no stranded locks)."""
    import os

    from htsql_spark.operators import dedup
    from htsql_spark.operators.layout import (
        acquire_dataset_lock,
        compact_bucketed_table,
        release_dataset_lock,
        write_bucketed,
    )

    _drop_table(spark, "t_cbt2_idx", "t_cbt2_idx__compacting", "t_cbt2_idx__precompact")
    write_bucketed(
        dedup._band_table(_docs(spark).filter("doc_id < 50")),
        "t_cbt2_idx",
        ["h"],
        n_buckets=4,
    )
    archive = str(tmp_path / "arch")
    acquire_dataset_lock(spark, archive, owner="run_dedup_ingest batch=3")
    with pytest.raises(ValueError, match="run_dedup_ingest batch=3"):
        compact_bucketed_table(spark, "t_cbt2_idx", extra_locks=[archive])
    # the location lock taken before the failure must be gone again
    loc = {
        r["col_name"]: r["data_type"]
        for r in spark.sql("DESCRIBE FORMATTED t_cbt2_idx").collect()
    }["Location"]
    assert not os.path.exists(loc.removeprefix("file:") + "__lock")
    release_dataset_lock(spark, archive)
    assert compact_bucketed_table(spark, "t_cbt2_idx", extra_locks=[archive]) == 4
    spark.sql("DROP TABLE IF EXISTS t_cbt2_idx")


def test_compact_bucketed_table_validation(spark, tmp_path):
    from htsql_spark.operators.layout import compact_bucketed_table

    with pytest.raises(ValueError, match="no table"):
        compact_bucketed_table(spark, "t_cbt_nope")
    with pytest.raises(ValueError, match="qualified"):
        compact_bucketed_table(spark, "db.tbl")
    # unbucketed table rejected
    _drop_table(spark, "t_cbt_flat")
    _docs(spark).limit(5).write.mode("overwrite").saveAsTable("t_cbt_flat")
    with pytest.raises(ValueError, match="not bucketed"):
        compact_bucketed_table(spark, "t_cbt_flat")
    spark.sql("DROP TABLE IF EXISTS t_cbt_flat")
