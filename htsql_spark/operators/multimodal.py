"""Multimodal column plumbing: opaque ``binary`` payloads + typed
metadata, processed with Arrow-batched pandas UDFs via ``mapInPandas``.

Image decode is REAL: :mod:`.imaging` provides pure-python/numpy
BMP/PPM/PNG codecs (the container has no PIL/opencv), so
``image_features`` and ``sampled_frame_features`` run actual pixel
work — header parse, inflate, unfilter, channel means — inside Arrow
batches; ``audio_features`` decodes real RIFF/WAVE PCM to samples.
Video decode parses REAL containers: APNG (public spec — acTL/fcTL/
fdAT chunk walk with CRC validation, frames through the PNG codec)
and RIFF AVI with uncompressed DIB 'vids' frames (the BMP pixel
layout inside a chunk-walked RIFF, like WAV); the trivial RAWV
container remains for plumbing tests.  Only mp4/h264 stay stubbed
(``try_decode`` raises for those — no codec libraries in this
container).

At 100 TB: binary payloads stay columnar (parquet binary), batches
stream through Arrow without driver involvement, and per-partition
batch size is bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import imaging

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
    """Decode a payload into a feature vector.  Image formats with a
    real codec in :mod:`.imaging` (BMP/PPM/PNG) decode to actual
    pixels → [w, h, mean_r, mean_g, mean_b, std_gray].  Audio and
    WAV PCM audio decodes to actual samples → [rate, n, rms].  Video
    containers with a real parser (APNG, RAWV) decode their FIRST
    frame's pixels → [n_frames, w, h, mean_r, mean_g, mean_b];
    mp4/h264 raise NotImplementedError (no codec libraries in this
    container — honest stub).  Unrecognized binary (e.g. the utf-8
    text payloads in the synthetic asset fixture) falls back to a
    deterministic digest feature so metadata-only pipelines remain
    testable end-to-end."""
    if payload is None:
        raise NotImplementedError("no payload")
    if kind == "audio":
        rate, samples = imaging.decode_wav(payload)  # ValueError on non-WAV
        x = samples.astype("float64")
        return [float(rate), float(len(samples)), float(np.sqrt((x * x).mean()))]
    if kind == "video":
        n = imaging.video_frame_count(payload)  # NotImplementedError on mp4
        img = imaging.decode_video_frame(payload, 0).astype("float64")
        return [
            float(n),
            float(img.shape[1]),
            float(img.shape[0]),
            float(img[:, :, 0].mean()),
            float(img[:, :, 1].mean()),
            float(img[:, :, 2].mean()),
        ]
    try:
        img = imaging.decode_image(payload)
    except ValueError:
        h = hashlib.sha256(payload).digest()
        return [b / 255.0 for b in h[:8]]
    f = img.astype("float64")
    gray = f.mean(axis=2)
    return [
        float(img.shape[1]),
        float(img.shape[0]),
        float(f[:, :, 0].mean()),
        float(f[:, :, 1].mean()),
        float(f[:, :, 2].mean()),
        float(gray.std()),
    ]


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
    """REAL image resize over Arrow batches — the standard
    vision-pipeline preprocessing step: decode (BMP/PPM/PNG via
    :mod:`.imaging`), nearest-neighbor resample with numpy index
    arithmetic, re-encode as BMP.  Payloads that are not decodable
    images pass through as a deterministic truncate/pad of the raw
    bytes (the legacy plumbing contract, kept so metadata-only
    fixtures still flow).  mapInPandas, columnar binary in/out,
    partitioning untouched, per-batch memory bounded by Arrow batch
    size."""
    target = width * height

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = []
            for b in pdf["payload"]:
                if b is None:
                    resized.append(None)
                    continue
                data = bytes(b)
                try:
                    img = imaging.decode_image(data)
                except ValueError:
                    resized.append(data[:target].ljust(target, b"\0"))
                    continue
                h0, w0 = img.shape[:2]
                ys = (np.arange(height) * h0 // height).clip(0, h0 - 1)
                xs = (np.arange(width) * w0 // width).clip(0, w0 - 1)
                resized.append(imaging.encode_bmp(img[ys][:, xs]))
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "width": width,
                    "height": height,
                    "payload": resized,
                }
            )

    return assets.mapInPandas(fn, RESIZED_SCHEMA)


# ----------------------------------------------------------------------
# real-pixel paths: synthetic planted images + decode-to-features
# ----------------------------------------------------------------------
#: deterministic planted color per (doc_id [, frame]) — the oracle
#: recomputes these in plain SQL, so decode output is value-checked
def _plant_color(doc_id: int, frame: int = 0) -> tuple[int, int, int]:
    return (
        (doc_id + 11 * frame) % 256,
        (doc_id * 7 + frame) % 256,
        (doc_id * 13 + 5 * frame) % 256,
    )


def image_assets_from_documents(docs: DataFrame, size: int = 8) -> DataFrame:
    """Planted image per document: a solid ``size``×``size`` color
    image whose RGB derives from doc_id, encoded in a format cycling
    BMP → PPM → PNG by doc_id % 3.  The payload is REAL bytes of each
    format, built inside Arrow batches — decode must parse the actual
    headers/inflate to recover the color."""

    @F.pandas_udf(T.BinaryType())
    def synth(ids: pd.Series) -> pd.Series:
        out = []
        for i in ids:
            i = int(i)
            px = np.full((size, size, 3), _plant_color(i), dtype=np.uint8)
            enc = (imaging.encode_bmp, imaging.encode_ppm, imaging.encode_png)[i % 3]
            out.append(enc(px))
        return pd.Series(out)

    # widen to default parallelism before the CPU-bound synth — see
    # video_assets_from_documents (file-split partitioning sizes by
    # bytes; a small docs file = ONE split = one core for the whole
    # encode/decode chain)
    par = docs.sparkSession.sparkContext.defaultParallelism
    return docs.select("doc_id", "lang").repartition(par).select(
        F.col("doc_id").alias("asset_id"),
        F.lit("image").alias("kind"),
        synth(F.col("doc_id")).alias("payload"),
        F.create_map(F.lit("lang"), F.col("lang")).alias("meta"),
    )


def video_assets_from_documents(
    docs: DataFrame, n_frames: int = 30, size: int = 4,
    container: str = "apng",
) -> DataFrame:
    """Planted video per document: ``n_frames`` solid frames whose
    colors vary by (doc_id, frame index), packed into a REAL APNG
    container by default (``container='avi'`` packs a RIFF AVI with
    uncompressed DIB frames — the BMP pixel layout inside a real
    chunk-walked container; ``container='rawv'`` keeps the trivial
    length-prefixed test container).

    The input is repartitioned to the session's default parallelism
    BEFORE synthesis: per-row cost here is CPU (30 encoded frames),
    not I/O, and Spark's file-split partitioning sizes splits by
    BYTES — a small documents file arrives as ONE split and the whole
    synth+decode chain would run on one core (measured exactly that
    at sf0.1: 5000 docs, 1 partition, 3.1 s serial vs ~0.6 s spread).
    Only doc_ids shuffle, never payloads; downstream mapInPandas
    stages inherit the widened partitioning."""

    @F.pandas_udf(T.BinaryType())
    def synth(ids: pd.Series) -> pd.Series:
        out = []
        for i in ids:
            i = int(i)
            px = [
                np.full((size, size, 3), _plant_color(i, f), dtype=np.uint8)
                for f in range(n_frames)
            ]
            if container == "apng":
                out.append(imaging.encode_apng(px))
            elif container == "avi":
                out.append(imaging.encode_avi(px))
            else:
                out.append(imaging.encode_rawv([imaging.encode_bmp(p) for p in px]))
        return pd.Series(out)

    par = docs.sparkSession.sparkContext.defaultParallelism
    return docs.select("doc_id").repartition(par).select(
        F.col("doc_id").alias("asset_id"),
        F.lit("video").alias("kind"),
        synth(F.col("doc_id")).alias("payload"),
        F.create_map(F.lit("frames"), F.lit(str(n_frames))).alias("meta"),
    )


def _plant_wave(doc_id: int) -> tuple[int, int]:
    """(amplitude, n_samples) for the planted square wave — both pure
    functions of doc_id so oracles recompute them in SQL."""
    return 100 + (doc_id % 200) * 100, 160 + (doc_id % 5) * 40


def audio_assets_from_documents(docs: DataFrame, rate: int = 8000) -> DataFrame:
    """Planted WAV per document: a ±amp square wave (amp, length both
    f(doc_id)) written as REAL RIFF/WAVE PCM bytes — decode must walk
    the actual chunks to recover the samples."""

    @F.pandas_udf(T.BinaryType())
    def synth(ids: pd.Series) -> pd.Series:
        out = []
        for i in ids:
            amp, n = _plant_wave(int(i))
            wave = np.where(np.arange(n) % 2 == 0, amp, -amp).astype("<i2")
            out.append(imaging.encode_wav(wave, rate))
        return pd.Series(out)

    # NO pre-repartition here (unlike the image/video builders): the
    # square-wave synth is ~10 µs/doc, so the exchange costs more
    # than the parallelism buys at every scale (measured 0.34 s ->
    # 0.67 s at sf0.1 with the repartition in)
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("audio").alias("kind"),
        synth(F.col("doc_id")).alias("payload"),
        F.create_map(F.lit("rate"), F.lit(str(rate))).alias("meta"),
    )


AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType(), False),
        T.StructField("n_samples", T.IntegerType(), False),
        T.StructField("duration_s", T.DoubleType(), False),
        T.StructField("rms", T.DoubleType(), False),
        T.StructField("peak", T.IntegerType(), False),
    ]
)


def audio_features(assets: DataFrame) -> DataFrame:
    """REAL WAV decode over Arrow batches: RIFF chunk walk, int16
    samples, rate/duration/RMS/peak.  Narrow mapInPandas, no shuffle
    — per-asset cost is a numpy reduction."""

    def fn(batches):
        for pdf in batches:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                rate, samples = imaging.decode_wav(bytes(payload))
                x = samples.astype("float64")
                rows.append(
                    (
                        int(aid),
                        rate,
                        len(samples),
                        round(len(samples) / rate, 6),
                        round(float(np.sqrt((x * x).mean())), 6),
                        int(np.abs(samples).max()),
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in AUDIO_FEATURE_SCHEMA.fields]
            )

    return assets.select("asset_id", "payload").mapInPandas(fn, AUDIO_FEATURE_SCHEMA)


def audio_fingerprint(assets: DataFrame, windows: int = 16) -> DataFrame:
    """Energy-profile audio fingerprint (chromaprint-style shape, one
    octave simpler): decode WAV, split samples into ``windows`` equal
    windows, take the integer-rounded RMS energy of each, and md5 the
    (n_samples, e1..eW) vector — two clips collide iff their length
    and coarse energy envelope agree.  Narrow mapInPandas (numpy per
    asset), no shuffle; only (id, fp) leaves the task — the audio
    sibling of :func:`image_ahash`.  Returns (asset_id, fp)."""
    import hashlib

    def fn(batches):
        for pdf in batches:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                _, samples = imaging.decode_wav(bytes(payload))
                x = samples.astype("float64")
                es = [
                    int(round(float(np.sqrt((w * w).mean())))) if len(w) else 0
                    for w in np.array_split(x, windows)
                ]
                key = ",".join([str(len(samples))] + [str(e) for e in es])
                rows.append((int(aid), hashlib.md5(key.encode()).hexdigest()))
            yield pd.DataFrame(rows, columns=["asset_id", "fp"])

    return assets.select("asset_id", "payload").mapInPandas(
        fn, "asset_id long, fp string"
    )


def audio_dup_pairs(assets: DataFrame, windows: int = 16) -> DataFrame:
    """Duplicate-audio pairs by fingerprint equality: decode-and-hash
    (narrow) then ONE fp-keyed equi-join — pixels/samples never
    shuffle, the same scale shape as exact text dedup.  Returns
    (a, b) with a < b for every same-fingerprint pair."""
    # pin the narrow (asset_id, fp) table: both sides of the
    # self-join otherwise re-run the WAV decode over the full payload
    # column (the textstats winnow-pairs lesson — decode once, join
    # the 2-column result)
    fps = audio_fingerprint(assets, windows).localCheckpoint(eager=False)
    x, y = fps.alias("x"), fps.alias("y")
    return (
        x.join(
            y,
            (F.col("x.fp") == F.col("y.fp"))
            & (F.col("x.asset_id") < F.col("y.asset_id")),
        )
        .select(F.col("x.asset_id").alias("a"), F.col("y.asset_id").alias("b"))
    )


def _ahash_of(img: "np.ndarray", grid: int = 8) -> int:
    """Average-hash of a decoded (h, w, 3) uint8 image: grayscale →
    ``grid``×``grid`` exact area-mean blocks (integral image) →
    bit b = block_b ≥ mean(blocks), packed MSB-first into int64."""
    gray = img.astype("float64").mean(axis=2)
    h, w = gray.shape
    ii = np.zeros((h + 1, w + 1))
    ii[1:, 1:] = gray.cumsum(0).cumsum(1)
    ys = (np.arange(grid + 1) * h) // grid
    xs = (np.arange(grid + 1) * w) // grid
    blocks = np.empty((grid, grid))
    for i in range(grid):
        for j in range(grid):
            y0, y1, x0, x1 = ys[i], ys[i + 1], xs[j], xs[j + 1]
            area = max((y1 - y0) * (x1 - x0), 1)
            blocks[i, j] = (
                ii[y1, x1] - ii[y0, x1] - ii[y1, x0] + ii[y0, x0]
            ) / area
    bits = (blocks >= blocks.mean()).flatten()
    val = np.uint64(0)
    for b in bits:
        val = np.uint64(val << np.uint64(1)) | np.uint64(bool(b))
    return int(val.astype(np.int64))


def image_ahash(assets: DataFrame, grid: int = 8) -> DataFrame:
    """Perceptual average-hash over REAL decoded pixels.  Narrow
    mapInPandas — per-image numpy, no shuffle.  Returns
    (asset_id, ahash)."""

    def fn(batches):
        for pdf in batches:
            rows = [
                (int(aid), _ahash_of(imaging.decode_image(bytes(p)), grid))
                for aid, p in zip(pdf["asset_id"], pdf["payload"])
            ]
            yield pd.DataFrame(rows, columns=["asset_id", "ahash"])

    return assets.select("asset_id", "payload").mapInPandas(
        fn, "asset_id long, ahash long"
    )


def frame_hashes(
    assets: DataFrame, every_n: int = 10, grid: int = 8
) -> DataFrame:
    """Per-sampled-frame perceptual hashes for videos (APNG or RAWV
    container): seek every ``every_n``-th frame, decode only those,
    aHash each.  Narrow.  Returns (asset_id, frame_idx, fhash)."""

    def fn(batches):
        for pdf in batches:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                data = bytes(payload)
                for idx in range(0, imaging.video_frame_count(data), every_n):
                    rows.append(
                        (
                            int(aid),
                            idx,
                            _ahash_of(imaging.decode_video_frame(data, idx), grid),
                        )
                    )
            yield pd.DataFrame(rows, columns=["asset_id", "frame_idx", "fhash"]).astype(
                {"frame_idx": "int32"}
            )

    return assets.select("asset_id", "payload").mapInPandas(
        fn, "asset_id long, frame_idx int, fhash long"
    )


def video_dup_pairs(
    assets: DataFrame,
    every_n: int = 10,
    min_shared: int = 2,
    max_postings: int = 1000,
) -> DataFrame:
    """Near-duplicate VIDEOS by shared sampled-frame perceptual
    hashes: the MOSS/winnow recipe applied to frames — inverted index
    on the frame hash, posting cap against degenerate hashes (black
    frames, title cards — the video equivalent of boilerplate), pairs
    sharing ≥ ``min_shared`` sampled frames.  Only (id, hash64) pairs
    shuffle; pixels never leave the decode stage."""
    # pin the narrow (asset_id, fhash) table: the posting count, the
    # prune join, and BOTH sides of the pair self-join otherwise each
    # re-run the frame decode over the full payload column
    fh = (
        frame_hashes(assets, every_n)
        .select("asset_id", "fhash")
        .distinct()
        .localCheckpoint(eager=False)
    )
    postings = fh.groupBy("fhash").agg(F.count(F.lit(1)).alias("__n"))
    pruned = fh.join(postings.filter(F.col("__n") <= max_postings), "fhash").select(
        "asset_id", "fhash"
    )
    x, y = pruned.alias("x"), pruned.alias("y")
    return (
        x.join(
            y,
            (F.col("x.fhash") == F.col("y.fhash"))
            & (F.col("x.asset_id") < F.col("y.asset_id")),
        )
        .groupBy(
            F.col("x.asset_id").alias("a"), F.col("y.asset_id").alias("b")
        )
        .agg(F.count(F.lit(1)).alias("shared_frames"))
        .filter(F.col("shared_frames") >= min_shared)
    )


def bitmap_assets_from_documents(docs: DataFrame, block: int = 4) -> DataFrame:
    """Planted images whose 8×8 brightness blocks ARE the 64 bits of
    doc_id (bright block = set bit): decoding + average-hashing one
    recovers exactly doc_id (all-zero ids degenerate to all-ones hash
    — the aHash of a uniform image).  Makes the perceptual-dedup path
    value-checkable end-to-end in SQL."""

    @F.pandas_udf(T.BinaryType())
    def synth(ids: pd.Series) -> pd.Series:
        out = []
        n = 8 * block
        for i in ids:
            bits = np.array(
                [(int(i) >> (63 - k)) & 1 for k in range(64)], dtype=np.uint8
            ).reshape(8, 8)
            img = np.kron(bits * 255, np.ones((block, block), np.uint8))
            out.append(imaging.encode_bmp(np.stack([img] * 3, axis=2)))
        return pd.Series(out)

    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("image").alias("kind"),
        synth(F.col("doc_id")).alias("payload"),
        F.create_map().cast("map<string,string>").alias("meta"),
    )


def bitmap_video_assets_from_documents(
    docs: DataFrame, n_frames: int = 30, block: int = 2,
    container: str = "apng",
) -> DataFrame:
    """Planted videos whose frame f encodes the 64 bits of
    (doc_id + f) as brightness blocks — per-frame aHash recovers
    exactly doc_id + f, making the video-dedup path SQL-checkable
    end-to-end (see :func:`bitmap_assets_from_documents`).  Default
    container is REAL APNG (CRC-validated chunk walk at decode);
    ``container='avi'`` packs a RIFF AVI with uncompressed DIB
    frames; ``container='rawv'`` keeps the trivial test container."""

    @F.pandas_udf(T.BinaryType())
    def synth(ids: pd.Series) -> pd.Series:
        out = []
        for i in ids:
            px = []
            for f in range(n_frames):
                v = int(i) + f
                bits = np.array(
                    [(v >> (63 - k)) & 1 for k in range(64)], dtype=np.uint8
                ).reshape(8, 8)
                img = np.kron(bits * 255, np.ones((block, block), np.uint8))
                px.append(np.stack([img] * 3, axis=2))
            if container == "apng":
                out.append(imaging.encode_apng(px))
            elif container == "avi":
                out.append(imaging.encode_avi(px))
            else:
                out.append(imaging.encode_rawv([imaging.encode_bmp(p) for p in px]))
        return pd.Series(out)

    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("video").alias("kind"),
        synth(F.col("doc_id")).alias("payload"),
        F.create_map().cast("map<string,string>").alias("meta"),
    )


def image_dup_pairs(assets: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-duplicate IMAGES by perceptual hash: decode-and-hash
    (narrow) then the shared 4×16-bit banded hamming join — the same
    scale shape as text simhash dedup; only (id, hash64) ever
    shuffles, never pixels."""
    from .dedup import hash64_near_pairs

    return hash64_near_pairs(
        image_ahash(assets), id_col="asset_id", hash_col="ahash",
        max_hamming=max_hamming,
    )


IMAGE_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("mean_r", T.DoubleType(), False),
        T.StructField("mean_g", T.DoubleType(), False),
        T.StructField("mean_b", T.DoubleType(), False),
    ]
)


def image_features(assets: DataFrame) -> DataFrame:
    """REAL image decode over Arrow batches: parse BMP/PPM/PNG bytes,
    average channels.  Narrow mapInPandas — no shuffle; at 100 TB the
    only cost is the scan plus per-batch numpy work."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                img = imaging.decode_image(bytes(payload))
                f = img.astype("float64")
                rows.append(
                    (
                        int(aid),
                        img.shape[1],
                        img.shape[0],
                        float(f[:, :, 0].mean()),
                        float(f[:, :, 1].mean()),
                        float(f[:, :, 2].mean()),
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in IMAGE_FEATURE_SCHEMA]
            ).astype({"width": "int32", "height": "int32"})

    return assets.mapInPandas(fn, IMAGE_FEATURE_SCHEMA)


FRAME_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("mean_r", T.DoubleType(), False),
        T.StructField("mean_g", T.DoubleType(), False),
        T.StructField("mean_b", T.DoubleType(), False),
    ]
)


def sampled_frame_features(assets: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame sampling with REAL per-frame decode: seek every
    ``every_n``-th frame in the video payload (APNG chunk walk or
    RAWV length-prefix seek — a real demuxer seeks the same way),
    decode only those frames, average channels.  One output row per
    sampled frame; still a narrow mapInPandas."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                data = bytes(payload)
                for idx in range(0, imaging.video_frame_count(data), every_n):
                    img = imaging.decode_video_frame(data, idx).astype("float64")
                    rows.append(
                        (
                            int(aid),
                            idx,
                            float(img[:, :, 0].mean()),
                            float(img[:, :, 1].mean()),
                            float(img[:, :, 2].mean()),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in FRAME_FEATURE_SCHEMA]
            ).astype({"frame_idx": "int32"})

    return assets.mapInPandas(fn, FRAME_FEATURE_SCHEMA)


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
