"""Pure-python image codec round-trips + real-pixel Spark paths."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from htsql_spark.operators import imaging, multimodal


def _rand_img(h, w, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)


@pytest.mark.parametrize("w", [1, 3, 4, 7, 16])
def test_bmp_roundtrip_padding_widths(w):
    # row stride padding kicks in for widths not divisible by 4
    img = _rand_img(5, w, seed=w)
    assert np.array_equal(imaging.decode_bmp(imaging.encode_bmp(img)), img)


def test_ppm_roundtrip_and_comment():
    img = _rand_img(6, 9, seed=3)
    assert np.array_equal(imaging.decode_ppm(imaging.encode_ppm(img)), img)
    # header comments are legal PPM
    data = b"P6\n# a comment\n9 6\n255\n" + img.tobytes()
    assert np.array_equal(imaging.decode_ppm(data), img)


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_png_roundtrip_every_filter(ftype):
    # each encoder filter type exercises the matching decoder unfilter
    # path (None/Sub/Up/Average/Paeth, PNG spec §9)
    img = _rand_img(7, 11, seed=ftype)
    assert np.array_equal(
        imaging.decode_png(imaging.encode_png(img, filter_type=ftype)), img
    )


def test_decode_image_sniffs_formats():
    img = _rand_img(4, 4, seed=9)
    for enc in (imaging.encode_bmp, imaging.encode_ppm, imaging.encode_png):
        assert np.array_equal(imaging.decode_image(enc(img)), img)
    with pytest.raises(ValueError):
        imaging.decode_image(b"not an image")


def test_rawv_seek_decodes_single_frame():
    frames = [_rand_img(4, 4, seed=i) for i in range(5)]
    data = imaging.encode_rawv([imaging.encode_bmp(f) for f in frames])
    assert imaging.rawv_frame_count(data) == 5
    for i in (0, 2, 4):
        assert np.array_equal(imaging.decode_rawv_frame(data, i), frames[i])
    with pytest.raises(IndexError):
        imaging.decode_rawv_frame(data, 5)


def test_try_decode_real_image_vs_fallback_vs_stub():
    img = np.full((8, 8, 3), (10, 20, 30), dtype=np.uint8)
    feat = multimodal.try_decode(imaging.encode_png(img), "image")
    assert feat == [8.0, 8.0, 10.0, 20.0, 30.0, 0.0]
    # unrecognized binary → deterministic digest fallback
    assert len(multimodal.try_decode(b"plain text", "image")) == 8
    # WAV PCM audio decodes for real: rate, n, exact rms of ±amp wave
    wave = np.where(np.arange(100) % 2 == 0, 500, -500).astype("<i2")
    assert multimodal.try_decode(imaging.encode_wav(wave, 8000), "audio") == [
        8000.0, 100.0, 500.0,
    ]
    # malformed audio is a decode error; video container stays stubbed
    with pytest.raises(ValueError):
        multimodal.try_decode(b"RIFF....WAVE", "audio")
    with pytest.raises(NotImplementedError):
        multimodal.try_decode(b"\x00\x00mp4?", "video")


def test_image_features_planted_colors(db):
    docs = db.table("documents").filter(F.col("doc_id") < 30)
    feats = multimodal.image_features(
        multimodal.image_assets_from_documents(docs)
    )
    for r in feats.collect():
        i = r["asset_id"]
        assert (r["width"], r["height"]) == (8, 8)
        assert (r["mean_r"], r["mean_g"], r["mean_b"]) == (
            float(i % 256), float(i * 7 % 256), float(i * 13 % 256)
        )


def test_sampled_frame_features_planted_colors(db):
    docs = db.table("documents").filter(F.col("doc_id") < 10)
    out = multimodal.sampled_frame_features(
        multimodal.video_assets_from_documents(docs), every_n=10
    )
    rows = out.collect()
    assert {r["frame_idx"] for r in rows} == {0, 10, 20}
    for r in rows:
        i, f = r["asset_id"], r["frame_idx"]
        assert (r["mean_r"], r["mean_g"], r["mean_b"]) == (
            float((i + 11 * f) % 256),
            float((i * 7 + f) % 256),
            float((i * 13 + 5 * f) % 256),
        )


def test_wav_codec_roundtrip_and_chunk_walk():
    """Encode→decode roundtrip; decoder skips unknown chunks and
    honors RIFF word alignment; non-PCM and stereo are rejected."""
    import struct

    wave = (np.sin(np.linspace(0, 20, 321)) * 12000).astype("<i2")
    payload = imaging.encode_wav(wave, 44100)
    rate, back = imaging.decode_wav(payload)
    assert rate == 44100 and np.array_equal(back, wave)
    # splice an odd-sized unknown chunk before data: still decodes
    fmt_end = 12 + 8 + 16
    junk = struct.pack("<4sI", b"LIST", 3) + b"abc" + b"\x00"  # padded
    spliced = payload[:fmt_end] + junk + payload[fmt_end:]
    rate2, back2 = imaging.decode_wav(spliced)
    assert rate2 == 44100 and np.array_equal(back2, wave)
    # stereo rejected
    bad = bytearray(payload)
    struct.pack_into("<H", bad, 12 + 8 + 2, 2)  # channels=2
    with pytest.raises(ValueError):
        imaging.decode_wav(bytes(bad))


def test_audio_features_planted(db):
    from htsql_spark.operators import multimodal

    docs = db.table("documents").filter(F.col("doc_id") < 20)
    rows = multimodal.audio_features(
        multimodal.audio_assets_from_documents(docs)
    ).collect()
    assert len(rows) == 20
    for r in rows:
        amp, n = multimodal._plant_wave(r["asset_id"])
        assert r["rms"] == float(amp) and r["peak"] == amp
        assert r["n_samples"] == n and r["sample_rate"] == 8000


def test_image_perceptual_dedup(spark):
    """aHash over real decoded pixels: exact clones at hamming 0, a
    few-pixel perturbation within hamming<=3, a structurally different
    pattern never pairs."""
    from htsql_spark.operators import multimodal

    def gradient(seed, flip_px=0, transpose=False):
        y, x = np.mgrid[0:32, 0:32]
        img = ((x * 8 + seed) % 256).astype(np.uint8)
        if transpose:
            img = img.T.copy()
        img = np.stack([img] * 3, axis=2)
        if flip_px:
            img[:flip_px, :2, :] = 255 - img[:flip_px, :2, :]
        return imaging.encode_bmp(img)

    rows = []
    for i in range(5):
        rows.append((i, gradient(i)))
        rows.append((100 + i, gradient(i)))             # exact clone
        rows.append((200 + i, gradient(i, flip_px=2)))  # tiny perturbation
        rows.append((300 + i, gradient(i, transpose=True)))  # different layout
    assets = spark.createDataFrame(rows, "asset_id long, payload binary")
    pairs = multimodal.image_dup_pairs(assets, max_hamming=3).collect()
    found = {(r["a"], r["b"]): r["hamming"] for r in pairs}
    for i in range(5):
        assert found.get((i, 100 + i)) == 0          # clones: identical hash
        assert ((i, 200 + i) in found               # perturbed: near
                and found[(i, 200 + i)] <= 3)
        assert (i, 300 + i) not in found            # transposed: far


def test_video_dedup_shared_frames(spark):
    """Videos sharing sampled frames pair; disjoint-content videos
    don't.  Clones share ALL frames; a half-overlap copy (same first
    frames, new tail) still pairs via min_shared."""
    from htsql_spark.operators import multimodal

    def frame(seed, f):
        y, x = np.mgrid[0:16, 0:16]
        img = ((x * 16 + y * 3 + seed * 37 + f * 11) % 256).astype(np.uint8)
        return imaging.encode_bmp(np.stack([img] * 3, axis=2))

    def video(seed, n=30, tail_seed=None):
        frames = [
            frame(seed if (tail_seed is None or f < n // 2) else tail_seed, f)
            for f in range(n)
        ]
        return imaging.encode_rawv(frames)

    rows = []
    for i in range(3):
        rows.append((i, video(i)))
        rows.append((100 + i, video(i)))                   # exact clone
        rows.append((200 + i, video(i, tail_seed=50 + i))) # first half shared
        rows.append((300 + i, video(70 + i)))              # disjoint
    assets = spark.createDataFrame(rows, "asset_id long, payload binary")
    pairs = multimodal.video_dup_pairs(assets, every_n=10, min_shared=2)
    found = {(r["a"], r["b"]): r["shared_frames"] for r in pairs.collect()}
    for i in range(3):
        assert found.get((i, 100 + i)) == 3       # all 3 sampled frames shared
        assert found.get((i, 200 + i)) == 2       # frames 0,10 shared; 20 differs
        assert (i, 300 + i) not in found


def test_decode_wav_truncated_chunk_raises():
    """A chunk whose declared size extends past the buffer must raise
    a clear error, not silently decode a short slice."""
    import numpy as np
    import pytest

    from htsql_spark.operators.imaging import decode_wav, encode_wav

    good = encode_wav(np.array([100, -100, 100, -100], dtype="<i2"))
    with pytest.raises(ValueError, match="truncated WAV"):
        decode_wav(good[:-3])  # data chunk declares more than remains
    # fmt chunk shorter than the 16 PCM bytes
    import struct

    bad_fmt = struct.pack("<4sI4s", b"RIFF", 4 + 12, b"WAVE") + struct.pack(
        "<4sI", b"fmt ", 4
    ) + b"\x00" * 4
    with pytest.raises(ValueError, match="truncated WAV fmt"):
        decode_wav(bad_fmt)


def test_apng_roundtrip_and_container_contract():
    """APNG encode→per-frame decode roundtrip over random pixels;
    chunk CRCs are validated; differential (sub-canvas) frames and
    mp4 payloads are rejected; a plain single-image PNG is not
    mistaken for an animation."""
    import struct
    import zlib

    rng = np.random.RandomState(7)
    frames = [rng.randint(0, 256, (12, 10, 3), dtype=np.uint8) for _ in range(4)]
    apng = imaging.encode_apng(frames)
    assert imaging.is_apng(apng)
    assert imaging.apng_frame_count(apng) == 4
    assert imaging.video_frame_count(apng) == 4
    for i, fr in enumerate(frames):
        assert np.array_equal(imaging.decode_apng_frame(apng, i), fr)
        assert np.array_equal(imaging.decode_video_frame(apng, i), fr)
    # sniffing decode_image yields the default image (frame 0's IDAT)
    assert np.array_equal(imaging.decode_image(apng), frames[0])
    with pytest.raises(IndexError):
        imaging.decode_apng_frame(apng, 4)
    # single-image PNG is not an APNG
    plain = imaging.encode_png(frames[0])
    assert not imaging.is_apng(plain)
    with pytest.raises(ValueError):
        imaging.apng_frame_count(plain)
    # CRC validation is LAZY (per decode_apng_frame's contract):
    # corruption in a chunk the requested frame CONSUMES raises,
    # corruption in a skipped frame's payload does not — frame
    # sampling must not pay to hash frames it never decodes
    spans = list(imaging._png_chunk_spans(apng))
    idat = next(s for s in spans if s[0] == b"IDAT")
    fdats = [s for s in spans if s[0] == b"fdAT"]
    bad = bytearray(apng)
    bad[idat[1] + 2] ^= 0xFF  # frame 0's own payload
    with pytest.raises(ValueError, match="CRC"):
        imaging.decode_apng_frame(bytes(bad), 0)
    bad2 = bytearray(apng)
    bad2[fdats[-1][1] + 6] ^= 0xFF  # last frame's payload
    assert np.array_equal(
        imaging.decode_apng_frame(bytes(bad2), 0), frames[0]
    )
    with pytest.raises(ValueError, match="CRC"):
        imaging.decode_apng_frame(bytes(bad2), 3)
    # differential frame (nonzero offset) rejected: patch frame 1's
    # fcTL x_offset and re-CRC the chunk
    pos, out = 8, bytearray(apng)
    nfctl = 0
    while pos + 8 <= len(out):
        (ln,) = struct.unpack_from(">I", bytes(out), pos)
        typ = bytes(out[pos + 4 : pos + 8])
        if typ == b"fcTL":
            nfctl += 1
            if nfctl == 2:
                struct.pack_into(">I", out, pos + 8 + 12, 1)  # x_offset = 1
                body = bytes(out[pos + 8 : pos + 8 + ln])
                struct.pack_into(
                    ">I", out, pos + 8 + ln, zlib.crc32(b"fcTL" + body)
                )
        pos += 12 + ln
    with pytest.raises(ValueError, match="differential"):
        imaging.decode_apng_frame(bytes(out), 1)
    # mp4 magic → honest NotImplementedError
    with pytest.raises(NotImplementedError):
        imaging.video_frame_count(b"\x00\x00\x00\x18ftypmp42xxxx")


def test_avi_roundtrip_and_container_contract():
    """AVI encode→per-frame decode roundtrip over random pixels via
    the shared video dispatch; truncation and mismatched sizes raise
    named errors; a WAV (also RIFF) is not mistaken for an AVI."""
    rng = np.random.RandomState(11)
    frames = [rng.randint(0, 256, (9, 7, 3), dtype=np.uint8) for _ in range(3)]
    avi = imaging.encode_avi(frames)
    assert imaging.avi_frame_count(avi) == 3
    assert imaging.video_frame_count(avi) == 3
    for i, fr in enumerate(frames):
        assert np.array_equal(imaging.decode_avi_frame(avi, i), fr)
        assert np.array_equal(imaging.decode_video_frame(avi, i), fr)
    with pytest.raises(ValueError):
        imaging.decode_avi_frame(avi, 3)
    # truncated payload fails loudly, not with a short frame
    with pytest.raises(ValueError):
        imaging.avi_frame_count(avi[: len(avi) - 10])
    # RIFF/WAVE is not RIFF/AVI
    wav = imaging.encode_wav(np.zeros(16, dtype=np.int16))
    with pytest.raises(NotImplementedError):
        imaging.video_frame_count(wav)
    with pytest.raises(ValueError):
        imaging.avi_frame_count(wav)
    # frames must share one size
    with pytest.raises(ValueError):
        imaging.encode_avi([frames[0], rng.randint(0, 256, (4, 4, 3), dtype=np.uint8)])


def test_avi_video_pipeline_end_to_end(spark):
    """The planted-color video fixtures run through the REAL AVI
    container: per-frame means recompute the planted colors."""
    from htsql_spark.operators import multimodal as MM

    docs = spark.range(6).select(F.col("id").alias("doc_id"))
    assets = MM.video_assets_from_documents(docs, n_frames=5, size=4, container="avi")
    stats = MM.sampled_frame_features(assets, every_n=2)
    got = {
        (r["asset_id"], r["frame_idx"]): (r["mean_r"], r["mean_g"], r["mean_b"])
        for r in stats.collect()
    }
    for i in range(6):
        for f in (0, 2, 4):
            exp = MM._plant_color(i, f)
            assert got[(i, f)] == tuple(float(c) for c in exp), (i, f)


def test_avi_rec_list_and_frameless_movi():
    """Spec-valid AVIs may wrap frames in 'rec ' interleave LISTs
    inside movi — those must decode identically to the flat layout;
    and a movi with no recognized frame chunk raises instead of
    silently reporting a 0-frame video."""
    import struct

    rng = np.random.RandomState(7)
    frames = [rng.randint(0, 256, (6, 5, 3), dtype=np.uint8) for _ in range(3)]
    flat = imaging.encode_avi(frames)

    def chunk(cid, body):
        return struct.pack("<4sI", cid, len(body)) + body + (
            b"\0" if len(body) & 1 else b""
        )

    # rebuild the container with every 00db chunk wrapped in a rec LIST
    w, h, layout = imaging._avi_layout(flat)
    dibs = [flat[off : off + sz] for off, sz in layout]
    movi_body = b"movi" + b"".join(
        chunk(b"LIST", b"rec " + chunk(b"00db", d)) for d in dibs
    )
    # splice: everything before the old movi LIST + the new movi LIST
    old_movi_at = flat.find(b"LIST", 12)
    while flat[old_movi_at + 8 : old_movi_at + 12] != b"movi":
        old_movi_at = flat.find(b"LIST", old_movi_at + 4)
    body = flat[12:old_movi_at] + chunk(b"LIST", movi_body)
    rec_avi = struct.pack("<4sI4s", b"RIFF", len(body) + 4, b"AVI ") + body

    assert imaging.avi_frame_count(rec_avi) == 3
    for i, fr in enumerate(frames):
        assert np.array_equal(imaging.decode_avi_frame(rec_avi, i), fr)

    # movi holding only an unrecognized chunk: loud failure
    junk_movi = b"movi" + chunk(b"00wb", b"\0" * 8)
    body2 = flat[12:old_movi_at] + chunk(b"LIST", junk_movi)
    junk_avi = struct.pack("<4sI4s", b"RIFF", len(body2) + 4, b"AVI ") + body2
    with pytest.raises(ValueError, match="no recognized frame"):
        imaging.avi_frame_count(junk_avi)
