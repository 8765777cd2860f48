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
