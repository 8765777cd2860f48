"""Streaming corpus curation: the batch ``curate_corpus`` pipeline
re-expressed over a document stream — continuous ingest for a
training-data landing zone.

Stage semantics on a stream:

* **quality gate** — narrow stateless filter, identical expression to
  batch (the codegen'd ``quality_score``); applied per micro-batch at
  the scan.
* **fingerprint dedup** — stateful: keep the FIRST-SEEN document per
  normalized-content fingerprint.  With an event-time column, state
  is bounded via ``dropDuplicatesWithinWatermark`` (expired
  fingerprints are forgotten after the watermark); without one, the
  keyed state grows with the distinct-fingerprint count — fine for a
  drain-the-backlog ``availableNow`` job, wrong for an unbounded
  24/7 stream (give it a timestamp).
* **split tagging** — narrow md5 threshold arithmetic, identical to
  batch; a doc's split never depends on other rows, so batch and
  stream agree row-for-row.

Batch-vs-stream note: batch ``curate_corpus`` picks the MIN doc_id
per fingerprint; a stream keeps the first ARRIVAL.  For an
append-in-id-order landing zone the two coincide; otherwise the
survivor may differ while the kept fingerprint set is identical —
the documented streaming contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_documents_stream(
    spark: SparkSession, sf_dir: str, glob: str = "*.parquet"
) -> DataFrame:
    """File-source stream over a documents landing directory (swap
    ``format`` for Kafka in production).  Schema is probed from the
    existing files — file streams require a declared schema."""
    schema = spark.read.option("pathGlobFilter", glob).parquet(sf_dir).schema
    return (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", glob)
        .option("maxFilesPerTrigger", 1)
        .parquet(sf_dir)
    )


def run_dedup_ingest(
    spark: SparkSession,
    stream: DataFrame,
    archive_path: str,
    index_table: str,
    threshold: float = 0.8,
) -> None:
    """Continuous near-dup-free ingest: each micro-batch is deduped
    against the ever-growing archive via the bucketed LSH band index,
    survivors are appended to the archive, and their bands appended
    to the index — the index-maintenance loop
    :func:`~htsql_spark.operators.dedup.materialize_band_index`
    documents, driven by Structured Streaming.

    Per batch: banding the batch is O(batch); the candidate join
    reads the bucketed index (no archive recompute, no archive-side
    shuffle); verification re-shingles only candidate docs.  The
    archive is touched only through (a) the index scan and (b) the
    candidate-doc semi-join — never fully re-processed.

    Delivery semantics: offsets are exactly-once via the streaming
    checkpoint, but ``foreachBatch`` bodies re-RUN on crash-retry.
    The archive write is therefore idempotent (per-batch
    subdirectory, overwritten on retry); the index append is
    at-least-once, which is SAFE here because duplicate band rows
    only produce duplicate candidates and the candidate join is
    ``distinct()`` — dedup semantics survive a retried batch.
    availableNow drains the backlog and returns.

    Within-batch duplicates are also dropped (first-seen by id
    order); batch ids must be globally unique (append-only ingest
    contract)."""
    from ..operators import dedup

    if not spark.catalog.tableExists(index_table):
        # a previously-dropped table can orphan its managed location,
        # which blocks re-creation — clear it through the JVM FS API
        wh = spark.conf.get("spark.sql.warehouse.dir")
        p = spark._jvm.org.apache.hadoop.fs.Path(wh, index_table.lower())
        fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
        if fs.exists(p):
            fs.delete(p, True)

    def process(batch: DataFrame, batch_id: int) -> None:
        from pyspark.sql import functions as BF

        batch = batch.dropDuplicates(["doc_id"])
        have_archive = spark.catalog.tableExists(index_table)
        if have_archive:
            archive = spark.read.parquet(archive_path)
            pairs = dedup.incremental_dup_pairs(
                archive,
                batch,
                threshold=threshold,
                archive_bands=spark.table(index_table),
            )
            # drop batch docs that matched the archive (cross) or an
            # earlier batch doc (within: keep the pair's min id)
            dead = pairs.filter(BF.col("origin") == "cross").select(
                BF.col("b").alias("doc_id")
            ).union(
                pairs.filter(BF.col("origin") == "within").select(
                    BF.col("b").alias("doc_id")
                )
            )
            survivors = batch.join(dead.distinct(), "doc_id", "left_anti")
        else:
            pairs = dedup.incremental_dup_pairs(
                batch.limit(0), batch, threshold=threshold
            )
            dead = pairs.select(BF.col("b").alias("doc_id"))
            survivors = batch.join(dead.distinct(), "doc_id", "left_anti")
        survivors = survivors.cache()
        # per-batch subdir + overwrite → a retried batch rewrites its
        # own directory instead of double-appending
        survivors.write.mode("overwrite").parquet(f"{archive_path}/batch={batch_id}")
        from ..operators.layout import write_bucketed

        write_bucketed(
            dedup._band_table(survivors),
            index_table,
            ["h"],
            sort_cols=["h"],
            # first batch (re)creates the table — overwrite also clears
            # any stale warehouse location from a dropped table; later
            # batches append with the same bucket spec, staying bucketed
            mode="append" if have_archive else "overwrite",
        )
        survivors.unpersist()

    (
        stream.writeStream.foreachBatch(process)
        .trigger(availableNow=True)
        .option("checkpointLocation", f"{archive_path}__checkpoint")
        .start()
        .awaitTermination()
    )


def curate_stream(
    docs: DataFrame,
    min_quality: float = 0.5,
    weights: dict[str, float] | None = None,
    ts_col: str | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Quality gate → first-seen fingerprint dedup → split tag, over a
    streaming documents DataFrame.  Returns (doc_id, quality, split)
    — the same shape as batch ``curate_corpus``."""
    from ..operators.pipeline import hash_split
    from ..operators.textstats import fingerprint, quality_score

    t = F.col("text")
    scored = docs.select(
        "doc_id",
        *( [F.col(ts_col)] if ts_col else [] ),
        quality_score(t).alias("quality"),
        fingerprint(t).alias("fp"),
    ).filter(F.col("quality") >= min_quality)
    if ts_col:
        deduped = scored.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            ["fp"]
        ).drop(ts_col)
    else:
        deduped = scored.dropDuplicates(["fp"])
    return hash_split(deduped.drop("fp"), "doc_id", weights)
