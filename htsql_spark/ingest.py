"""Raw-corpus ingestion sources — the entry point of a training-data
pipeline: a directory of text files becomes a `documents`-shaped
DataFrame ready for the dedup/quality/split operators.

Everything rides Spark's distributed file readers (`spark.read.text`),
so listing, splitting, and scanning parallelize across executors; at
100 TB ingestion is bounded by I/O, not the driver (no file list ever
materializes driver-side beyond the InMemoryFileIndex every Spark scan
already uses).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def text_corpus(
    spark: SparkSession, path: str, wholetext: bool = True
) -> DataFrame:
    """Ingest a directory/glob of ``*.txt`` files as a corpus.

    ``wholetext=True`` (default): one row per FILE — (path, text) —
    the standard one-document-per-file corpus layout; ``doc_id`` is
    the file path, which is stable across runs and cluster sizes
    (unlike monotonically_increasing_id, which depends on partition
    layout).  ``wholetext=False``: one row per LINE — (path, line) —
    for line-delimited corpora; within-file order is preserved by the
    reader but not otherwise materialized.

    Note wholetext makes one task per file (a file is not splittable
    as a single value): right for many medium files, wrong for one
    giant file — use line mode there.
    """
    df = spark.read.text(path, wholetext=wholetext)
    col = "text" if wholetext else "line"
    return df.select(
        F.input_file_name().alias("path"), F.col("value").alias(col)
    )


def documents_from_text(
    spark: SparkSession, path: str, lang_default: str = "und"
) -> DataFrame:
    """`documents`-table-shaped ingestion: (doc_id, text, lang,
    source, n_chars) from a directory of text files.  doc_id is the
    64-bit xxhash of the file path (deterministic, join-friendly);
    `source` keeps the readable path; lang starts as ``lang_default``
    until :func:`htsql_spark.operators.textstats.lang_id` refines it.
    """
    raw = text_corpus(spark, path, wholetext=True)
    return raw.select(
        F.xxhash64(F.col("path")).alias("doc_id"),
        F.col("text"),
        F.lit(lang_default).alias("lang"),
        F.col("path").alias("source"),
        F.length("text").alias("n_chars"),
    )
