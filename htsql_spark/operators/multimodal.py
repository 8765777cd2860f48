"""Multimodal column plumbing: opaque ``binary`` payloads + typed
metadata, processed with Arrow-batched pandas UDFs via ``mapInPandas``.

The container has no image/audio/video codecs, so the *decode* step is
a clearly-marked stub (deterministic fake) behind ``try_decode`` — but
the Spark-side plumbing is real and tested: schema contracts, batch
iteration, partition-preserving transforms, and the UDF signatures a
production decode would drop into.

At 100 TB: binary payloads stay columnar (parquet binary), batches
stream through Arrow without driver involvement, and per-partition
batch size is bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: schema of a multimodal asset table: opaque payload + typed metadata
ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("digest", T.StringType(), False),
        T.StructField("feat", T.ArrayType(T.FloatType()), True),
    ]
)


def assets_from_documents(docs: DataFrame) -> DataFrame:
    """Build a synthetic asset table from documents: utf-8 payload,
    kind from doc source — the stand-in for real blobs in tests."""
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("image").alias("kind"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.create_map(F.lit("lang"), F.col("lang"), F.lit("source"), F.col("source")).alias(
            "meta"
        ),
    )


def try_decode(payload: bytes, kind: str) -> list[float]:
    """STUB: real decode (PIL / torchaudio / pyav) is unavailable in
    this container.  Produces a deterministic 8-dim fake feature from
    the payload digest so the pipeline is testable end-to-end.
    Replace the body with a real decoder in production."""
    if payload is None:
        raise NotImplementedError("no payload")
    h = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in h[:8]]


def extract_features(assets: DataFrame, batch_hint: int | None = None) -> DataFrame:
    """mapInPandas feature extraction: Arrow batches in, Arrow batches
    out; per-batch vectorized metadata (length, md5) plus the decode
    stub per asset."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            out = pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "n_bytes": payloads.map(lambda b: 0 if b is None else len(b)).astype(
                        "int32"
                    ),
                    "digest": payloads.map(
                        lambda b: "" if b is None else hashlib.md5(b).hexdigest()
                    ),
                    "feat": [
                        None if b is None else try_decode(bytes(b), k)
                        for b, k in zip(payloads, pdf["kind"])
                    ],
                }
            )
            yield out

    return assets.mapInPandas(fn, FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("payload", T.BinaryType(), True),
    ]
)


def resize_images(assets: DataFrame, width: int = 224, height: int = 224) -> DataFrame:
    """Image resize over Arrow batches — the standard vision-pipeline
    preprocessing step.  The pixel work is the same STUB contract as
    :func:`try_decode` (no codecs in this container: the fake "resize"
    is a deterministic truncate/pad of the payload to width·height
    bytes), but the Spark side is the production shape: mapInPandas,
    columnar binary in/out, output schema declared, partitioning
    untouched, per-batch memory bounded by Arrow batch size."""
    target = width * height

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = [
                None if b is None else (bytes(b)[:target]).ljust(target, b"\0")
                for b in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "width": width,
                    "height": height,
                    "payload": resized,
                }
            )

    return assets.mapInPandas(fn, RESIZED_SCHEMA)


def frame_sample_plan(assets: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling *plan*: one row per (asset, frame index) —
    the explode happens JVM-side from declared metadata, the actual
    frame decode would be a second mapInPandas over this plan.
    Frame count comes from meta['frames'] (defaults to 30)."""
    frames = F.coalesce(
        F.element_at(F.col("meta"), F.lit("frames")).cast("int"), F.lit(30)
    )
    idx = F.sequence(F.lit(0), frames - 1, F.lit(every_n))
    return assets.select(
        F.col("asset_id"), F.col("kind"), F.explode(idx).alias("frame_idx")
    )
