"""Pure-python/numpy image codecs for the multimodal pipeline.

The container ships no image libraries (no PIL/opencv), so these
decoders are written from the public format specifications — enough
to run REAL pixel work through the Arrow/mapInPandas plumbing in
:mod:`.multimodal`:

* **BMP** — uncompressed 24-bit BITMAPINFOHEADER (bottom-up, BGR,
  4-byte row padding).
* **PPM** — binary P6, maxval 255.
* **PNG** — 8-bit RGB/RGBA, non-interlaced; zlib (stdlib) inflate +
  full scanline unfilter (None/Sub/Up/Average/Paeth per the PNG spec
  §9).  The encoder can emit any filter type, which is how the
  decoder's unfilter paths are unit-tested.

Everything decodes to a ``numpy.uint8`` array of shape (h, w, 3).
These codecs run *inside* Arrow batches on executors — per-image
cost is numpy slicing; nothing here touches the driver.

* **WAV** — RIFF/WAVE PCM 16-bit mono (chunk walk, unknown-chunk
  skip, word alignment) — real audio sample decode.

* **APNG** — Animated PNG (the public APNG spec, now folded into the
  W3C PNG specification): acTL animation control, fcTL frame
  control, fdAT frame data chunks with shared sequence numbering and
  per-chunk CRC validation.  A REAL multi-frame container whose
  frames reuse the PNG codec above — full-canvas source-blend frames
  only (differential x/y-offset or over-blend frames raise; our
  encoder never emits them).

* **AVI** — RIFF AVI (public VFW spec) carrying an uncompressed
  24-bit DIB 'vids' stream: LIST hdrl/strl/movi walk with size
  validation; frames are the BMP pixel layout (bottom-up BGR,
  4-byte stride) decoded by the same path as BMP.

``RAWV`` below is a deliberately trivial length-prefixed frame
container kept for plumbing tests.  mp4/h264 decode stays honestly
out of scope for this container (no codec libraries).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


# ----------------------------------------------------------------------
# BMP (24-bit uncompressed)
# ----------------------------------------------------------------------
def encode_bmp(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → 24-bit bottom-up BMP."""
    h, w, _ = pixels.shape
    stride = (w * 3 + 3) & ~3
    img = np.zeros((h, stride), dtype=np.uint8)
    # bottom-up rows, BGR order
    img[:, : w * 3] = pixels[::-1, :, ::-1].reshape(h, w * 3)
    body = img.tobytes()
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + len(body), 0, 0, 54
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return header + body


def decode_bmp(data: bytes) -> np.ndarray:
    if data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    offset = struct.unpack_from("<I", data, 10)[0]
    hdr_size = struct.unpack_from("<I", data, 14)[0]
    if hdr_size < 40:
        raise ValueError("BITMAPCOREHEADER not supported")
    w, h = struct.unpack_from("<ii", data, 18)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    comp = struct.unpack_from("<I", data, 30)[0]
    if bpp != 24 or comp != 0:
        raise ValueError(f"only uncompressed 24-bit BMP supported (bpp={bpp})")
    bottom_up = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    img = np.frombuffer(data, np.uint8, count=h * stride, offset=offset)
    img = img.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if bottom_up:
        img = img[::-1]
    return img[:, :, ::-1].copy()  # BGR → RGB


# ----------------------------------------------------------------------
# PPM (binary P6)
# ----------------------------------------------------------------------
def encode_ppm(pixels: np.ndarray) -> bytes:
    h, w, _ = pixels.shape
    return f"P6\n{w} {h}\n255\n".encode() + pixels.tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    if data[:2] != b"P6":
        raise ValueError("not a binary PPM payload")
    # header: magic, width, height, maxval — whitespace/comment separated
    fields: list[int] = []
    pos = 2
    while len(fields) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError("only maxval=255 PPM supported")
    return np.frombuffer(data, np.uint8, count=h * w * 3, offset=pos).reshape(h, w, 3).copy()


# ----------------------------------------------------------------------
# PNG (8-bit RGB/RGBA, non-interlaced)
# ----------------------------------------------------------------------
def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _filter_scanline(ftype: int, cur: np.ndarray, prev: np.ndarray, ch: int) -> bytes:
    """Apply PNG filter ``ftype`` to a raw scanline (encoder side)."""
    n = len(cur)
    left = np.concatenate([np.zeros(ch, np.int32), cur[:-ch].astype(np.int32)])
    up = prev.astype(np.int32)
    ul = np.concatenate([np.zeros(ch, np.int32), prev[:-ch].astype(np.int32)])
    c32 = cur.astype(np.int32)
    if ftype == 0:
        out = c32
    elif ftype == 1:
        out = c32 - left
    elif ftype == 2:
        out = c32 - up
    elif ftype == 3:
        out = c32 - (left + up) // 2
    elif ftype == 4:
        pred = np.fromiter(
            (_paeth(int(left[i]), int(up[i]), int(ul[i])) for i in range(n)),
            np.int32,
            n,
        )
        out = c32 - pred
    else:
        raise ValueError(f"bad filter {ftype}")
    return (out % 256).astype(np.uint8).tobytes()


def _unfilter_scanline(
    ftype: int, line: np.ndarray, prev: np.ndarray, ch: int
) -> np.ndarray:
    """Invert PNG filter ``ftype`` (decoder side).  Sub/Paeth have a
    serial left-dependency, so those run per-byte; None/Up/Average's
    vectorizable parts use numpy."""
    n = len(line)
    cur = line.astype(np.int32)
    if ftype == 0:
        pass
    elif ftype == 2:
        cur = (cur + prev) % 256
    elif ftype in (1, 3, 4):
        out = np.zeros(n, np.int32)
        for i in range(n):
            a = out[i - ch] if i >= ch else 0
            b = int(prev[i])
            c = int(prev[i - ch]) if i >= ch else 0
            if ftype == 1:
                pred = a
            elif ftype == 3:
                pred = (a + b) // 2
            else:
                pred = _paeth(a, b, c)
            out[i] = (cur[i] + pred) % 256
        cur = out
    else:
        raise ValueError(f"bad filter {ftype}")
    return cur.astype(np.uint8)


def encode_png(pixels: np.ndarray, filter_type: int = 0) -> bytes:
    """(h, w, 3) uint8 RGB → PNG (color type 2).  ``filter_type``
    selects the per-scanline filter — used to exercise every decoder
    unfilter path in tests."""
    h, w, _ = pixels.shape

    def chunk(typ: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + typ
            + body
            + struct.pack(">I", zlib.crc32(typ + body))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = bytearray()
    prev = np.zeros(w * 3, np.uint8)
    for y in range(h):
        cur = pixels[y].reshape(-1)
        raw.append(filter_type)
        raw += _filter_scanline(filter_type, cur, prev, 3)
        prev = cur
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    if data[:8] != PNG_MAGIC:
        raise ValueError("not a PNG payload")
    pos, idat = 8, b""
    w = h = ctype = None
    while pos + 8 <= len(data):
        (ln,) = struct.unpack_from(">I", data, pos)
        typ = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
        if typ == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(">IIBBBBB", body)
            if depth != 8 or ctype not in (2, 6) or interlace:
                raise ValueError(
                    "only 8-bit RGB/RGBA non-interlaced PNG supported"
                )
        elif typ == b"IDAT":
            idat += body
        elif typ == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    ch = 3 if ctype == 2 else 4
    stride = w * ch
    raw = zlib.decompress(idat)
    out = np.zeros((h, stride), np.uint8)
    prev = np.zeros(stride, np.uint8)
    for y in range(h):
        off = y * (stride + 1)
        ftype = raw[off]
        line = np.frombuffer(raw, np.uint8, count=stride, offset=off + 1)
        prev = _unfilter_scanline(ftype, line, prev, ch)
        out[y] = prev
    img = out.reshape(h, w, ch)
    return img[:, :, :3].copy()


# ----------------------------------------------------------------------
# APNG (Animated PNG) — public spec; frames reuse the PNG codec
# ----------------------------------------------------------------------
def _png_chunk(typ: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + typ
        + body
        + struct.pack(">I", zlib.crc32(typ + body))
    )


def _png_chunks(data: bytes):
    """Walk PNG chunks with CRC validation — a real container parse,
    not a byte-offset guess."""
    for typ, start, ln in _png_chunk_spans(data):
        yield typ, _png_chunk_body(data, typ, start, ln)


def _png_chunk_spans(data: bytes):
    """Structure-only chunk walk: yields (typ, body_start, body_len)
    with length/truncation checks but NO body slice and NO CRC — the
    lazy fast path for consumers that sample a few chunks out of a
    large container (every_n frame sampling CRC-validated every fdAT
    of every SKIPPED frame through the eager walk; at sf0.1 that was
    most of op_frame_sample's cost).  Callers pull the chunks they
    actually consume through :func:`_png_chunk_body`, which validates
    the CRC at slice time."""
    pos = 8
    while pos + 8 <= len(data):
        (ln,) = struct.unpack_from(">I", data, pos)
        typ = data[pos + 4 : pos + 8]
        end = pos + 8 + ln
        if end + 4 > len(data):
            raise ValueError(f"truncated PNG chunk {typ!r}")
        yield typ, pos + 8, ln
        pos = end + 4


def _png_chunk_body(data: bytes, typ: bytes, start: int, ln: int) -> bytes:
    """Slice + CRC-validate one chunk located by _png_chunk_spans."""
    body = data[start : start + ln]
    (crc,) = struct.unpack_from(">I", data, start + ln)
    if crc != zlib.crc32(data[start - 4 : start + ln]):
        raise ValueError(f"PNG chunk {typ!r} CRC mismatch")
    return body


def encode_apng(frames: list[np.ndarray], delay_den: int = 10) -> bytes:
    """(h, w, 3) uint8 RGB frames → APNG per the public spec: IHDR +
    acTL, then per frame an fcTL (full canvas, source blend) and the
    frame's zlib scanline stream — frame 0 as IDAT, the rest as fdAT
    with the shared fcTL/fdAT sequence numbering."""
    if not frames:
        raise ValueError("APNG needs at least one frame")
    h, w, _ = frames[0].shape
    out = bytearray(PNG_MAGIC)
    out += _png_chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
    out += _png_chunk(b"acTL", struct.pack(">II", len(frames), 0))
    seq = 0
    for i, fr in enumerate(frames):
        if fr.shape != (h, w, 3):
            raise ValueError("all APNG frames must match the canvas size")
        fctl = struct.pack(">IIIIIHHBB", seq, w, h, 0, 0, 1, delay_den, 0, 0)
        seq += 1
        out += _png_chunk(b"fcTL", fctl)
        raw = bytearray()
        for y in range(h):
            raw.append(0)  # filter None
            raw += fr[y].reshape(-1).tobytes()
        z = zlib.compress(bytes(raw))
        if i == 0:
            out += _png_chunk(b"IDAT", z)
        else:
            out += _png_chunk(b"fdAT", struct.pack(">I", seq) + z)
            seq += 1
    out += _png_chunk(b"IEND", b"")
    return bytes(out)


def is_apng(data: bytes) -> bool:
    """True when the payload is a PNG with an acTL before IDAT."""
    if data[:8] != PNG_MAGIC:
        return False
    try:
        for typ, _ in _png_chunks(data):
            if typ == b"acTL":
                return True
            if typ == b"IDAT":
                return False
    except ValueError:
        return False
    return False


def apng_frame_count(data: bytes) -> int:
    if data[:8] != PNG_MAGIC:
        raise ValueError("not a PNG payload")
    for typ, body in _png_chunks(data):
        if typ == b"acTL":
            return struct.unpack(">II", body)[0]
        if typ == b"IDAT":
            break
    raise ValueError("not an APNG (no acTL before IDAT)")


def decode_apng_frame(data: bytes, idx: int) -> np.ndarray:
    """Decode animation frame ``idx``: walk the chunk stream, gather
    the frame's fcTL + data (IDAT for the first animated frame, fdAT
    joined across chunks otherwise), then feed a synthesized
    single-image PNG through :func:`decode_png`.  Only full-canvas
    source-blend frames are supported — differential frames raise.

    CRC validation is LAZY: only the chunks this frame consumes
    (IHDR, its fcTL, its IDAT/fdAT run) are validated — the walk
    locates every other frame's chunks structurally without slicing
    or hashing their bodies.  every_n sampling at sf0.1 spent most of
    its time CRC-ing skipped frames (measured 3.4 s -> see bench
    op_frame_sample); corruption in a SKIPPED frame's payload is
    deliberately not this call's problem — decode that frame to
    check it."""
    if data[:8] != PNG_MAGIC:
        raise ValueError("not a PNG payload")
    ihdr = None
    # per frame: (fcTL span, [data chunk spans]); spans are
    # (typ, body_start, body_len) — bodies pulled + CRC'd lazily
    frames: list[tuple[tuple, list[tuple]]] = []
    for span in _png_chunk_spans(data):
        typ = span[0]
        if typ == b"IHDR":
            ihdr = _png_chunk_body(data, *span)
        elif typ == b"fcTL":
            frames.append((span, []))
        elif typ == b"IDAT":
            if frames:  # fcTL preceded IDAT → IDAT is animation frame 0
                frames[0][1].append(span)
            # else: static default image outside the animation — skip
        elif typ == b"fdAT":
            if not frames:
                raise ValueError("fdAT before any fcTL")
            frames[-1][1].append(span)
        elif typ == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    if not frames:
        raise ValueError("not an APNG (no fcTL chunks)")
    if not 0 <= idx < len(frames):
        raise IndexError(f"frame {idx} out of range({len(frames)})")
    fc_span, data_spans = frames[idx]
    fc = _png_chunk_body(data, *fc_span)
    z = bytearray()
    for span in data_spans:
        body = _png_chunk_body(data, *span)
        # fdAT carries a 4-byte sequence number before the payload
        z.extend(body[4:] if span[0] == b"fdAT" else body)
    seq, fw, fh, x0, y0, dn, dd, dispose, blend = struct.unpack(">IIIIIHHBB", fc)
    w, h = struct.unpack_from(">II", ihdr, 0)
    if (fw, fh, x0, y0) != (w, h, 0, 0) or (blend != 0 and idx > 0):
        raise ValueError(
            "differential APNG frames (sub-canvas region or over-blend) "
            "not supported"
        )
    sub = struct.pack(">II", fw, fh) + ihdr[8:]
    png = (
        PNG_MAGIC
        + _png_chunk(b"IHDR", sub)
        + _png_chunk(b"IDAT", bytes(z))
        + _png_chunk(b"IEND", b"")
    )
    return decode_png(png)


# ----------------------------------------------------------------------
# format sniffing + the RAWV frame container
# ----------------------------------------------------------------------
def decode_image(data: bytes) -> np.ndarray:
    """Sniff magic bytes and decode to (h, w, 3) uint8 RGB."""
    if data[:8] == PNG_MAGIC:
        return decode_png(data)
    if data[:2] == b"BM":
        return decode_bmp(data)
    if data[:2] == b"P6":
        return decode_ppm(data)
    raise ValueError("unrecognized image format")


RAWV_MAGIC = b"RAWV"


def encode_rawv(frames: list[bytes]) -> bytes:
    """Trivial video stand-in: magic + frame count + length-prefixed
    encoded frames.  Lets frame sampling decode REAL per-frame pixels
    without a real container parser."""
    out = bytearray(RAWV_MAGIC)
    out += struct.pack("<I", len(frames))
    for f in frames:
        out += struct.pack("<I", len(f))
        out += f
    return bytes(out)


def rawv_frame_count(data: bytes) -> int:
    if data[:4] != RAWV_MAGIC:
        raise ValueError("not a RAWV payload")
    return struct.unpack_from("<I", data, 4)[0]


def decode_rawv_frame(data: bytes, idx: int) -> np.ndarray:
    """Decode frame ``idx`` without materializing the others — a real
    demuxer seeks the same way."""
    if data[:4] != RAWV_MAGIC:
        raise ValueError("not a RAWV payload")
    n = struct.unpack_from("<I", data, 4)[0]
    if not 0 <= idx < n:
        raise IndexError(f"frame {idx} out of range({n})")
    pos = 8
    for _ in range(idx):
        (ln,) = struct.unpack_from("<I", data, pos)
        pos += 4 + ln
    (ln,) = struct.unpack_from("<I", data, pos)
    return decode_image(data[pos + 4 : pos + 4 + ln])


# ----------------------------------------------------------------------
# video container dispatch: real APNG or the RAWV test container
# ----------------------------------------------------------------------
def video_frame_count(data: bytes) -> int:
    """Frame count for any supported video container (APNG, AVI/DIB
    or RAWV).  mp4/h264 raise NotImplementedError — no codec in this
    container."""
    if data[:4] == RAWV_MAGIC:
        return rawv_frame_count(data)
    if data[:8] == PNG_MAGIC:
        return apng_frame_count(data)
    if data[:4] == b"RIFF" and data[8:12] == b"AVI ":
        return avi_frame_count(data)
    raise NotImplementedError(
        "unsupported video container (mp4/h264 decode out of scope)"
    )


def decode_video_frame(data: bytes, idx: int) -> np.ndarray:
    """Decode frame ``idx`` from any supported container without
    materializing the others (APNG walks chunks, AVI reads the DIB
    slot, RAWV seeks)."""
    if data[:4] == RAWV_MAGIC:
        return decode_rawv_frame(data, idx)
    if data[:8] == PNG_MAGIC:
        return decode_apng_frame(data, idx)
    if data[:4] == b"RIFF" and data[8:12] == b"AVI ":
        return decode_avi_frame(data, idx)
    raise NotImplementedError(
        "unsupported video container (mp4/h264 decode out of scope)"
    )


# ----------------------------------------------------------------------
# WAV (RIFF/WAVE, PCM 16-bit mono) — public spec, stdlib struct only
# ----------------------------------------------------------------------
def encode_wav(samples: "np.ndarray", rate: int = 8000) -> bytes:
    """Minimal RIFF/WAVE writer: PCM (fmt tag 1), mono, 16-bit
    little-endian.  Enough container to exercise a REAL chunk-walking
    decode path."""
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 1, rate, rate * 2, 2, 16)
    dat = struct.pack("<4sI", b"data", len(data)) + data
    hdr = struct.pack("<4sI4s", b"RIFF", 4 + len(fmt) + len(dat), b"WAVE")
    return hdr + fmt + dat


def decode_wav(payload: bytes) -> tuple[int, "np.ndarray"]:
    """Parse a RIFF/WAVE payload by walking its chunks (fmt + data;
    unknown chunks skipped, odd-size pad honored per the RIFF spec).
    Returns (sample_rate, int16 sample array).  PCM 16-bit mono only
    — anything else raises ValueError."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, channels, bits, data = 12, None, None, None, None
    while pos + 8 <= len(payload):
        cid, sz = struct.unpack_from("<4sI", payload, pos)
        pos += 8
        if pos + sz > len(payload):
            # a declared size past the buffer would silently yield a
            # short slice (short-unpack error / truncated samples)
            raise ValueError(
                f"truncated WAV chunk {cid!r}: declares {sz} bytes, "
                f"{len(payload) - pos} remain"
            )
        body = payload[pos : pos + sz]
        pos += sz + (sz & 1)  # RIFF chunks are word-aligned
        if cid == b"fmt ":
            if sz < 16:
                raise ValueError(f"truncated WAV fmt chunk ({sz} bytes)")
            tag, channels, rate, _, _, bits = struct.unpack_from("<HHIIHH", body, 0)
            if tag != 1:
                raise ValueError(f"unsupported WAV format tag {tag} (PCM only)")
        elif cid == b"data":
            data = body
    if rate is None or data is None:
        raise ValueError("WAV payload missing fmt or data chunk")
    if channels != 1 or bits != 16:
        raise ValueError(f"only 16-bit mono supported, got {channels}ch/{bits}bit")
    if len(data) & 1:
        raise ValueError("truncated WAV data chunk (odd byte count for int16)")
    return int(rate), np.frombuffer(data, dtype="<i2")


# ----------------------------------------------------------------------
# AVI (RIFF container, uncompressed 24-bit DIB 'vids' stream) — public
# OpenDML/VFW spec; frames reuse the BMP pixel layout (bottom-up BGR,
# 4-byte-aligned rows), so the pixel path is the proven BMP decoder's.
# mp4/h264 stay honestly out of scope (no codec in this container).
# ----------------------------------------------------------------------
def encode_avi(frames: list["np.ndarray"], fps: int = 10) -> bytes:
    """(h, w, 3) uint8 RGB frames → minimal spec-conformant AVI:
    RIFF('AVI ') { LIST hdrl { avih, LIST strl { strh('vids'/'DIB '),
    strf(BITMAPINFOHEADER) } }, LIST movi { '00db' DIB frames } }."""
    if not frames:
        raise ValueError("AVI needs at least one frame")
    h, w = frames[0].shape[:2]
    stride = (w * 3 + 3) & ~3
    dibs = []
    for f in frames:
        if f.shape[:2] != (h, w):
            raise ValueError("AVI frames must share one size")
        rows = np.zeros((h, stride), dtype=np.uint8)
        rows[:, : w * 3] = f[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
        dibs.append(rows.tobytes())
    frame_bytes = stride * h

    def chunk(cid: bytes, body: bytes) -> bytes:
        return struct.pack("<4sI", cid, len(body)) + body + (b"\0" if len(body) & 1 else b"")

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps, frame_bytes * fps, 0, 0x10,  # us/frame, rate, pad, HASINDEX-less flags
        len(frames), 0, 1, frame_bytes, w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"DIB ", 0, 0, 0, 0, 1, fps, 0, len(frames),
        frame_bytes, 0, 0, 0, 0, w, h,
    )
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_bytes, 0, 0, 0, 0)
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(b"movi", b"".join(chunk(b"00db", d) for d in dibs))
    body = b"AVI " + hdrl + movi
    return struct.pack("<4sI", b"RIFF", len(body)) + body


def _avi_walk(data: bytes):
    """Yield (fourcc, offset, size) for every top-level-and-movi chunk
    the frame reader needs; validates RIFF framing and sizes."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    end = 8 + struct.unpack_from("<I", data, 4)[0]
    if end > len(data):
        raise ValueError("truncated AVI: RIFF size exceeds payload")
    pos = 12
    while pos + 8 <= end:
        cid, sz = struct.unpack_from("<4sI", data, pos)
        if pos + 8 + sz > end:
            raise ValueError(f"truncated AVI chunk {cid!r}")
        yield cid, pos + 8, sz
        pos += 8 + sz + (sz & 1)


def _avi_layout(data: bytes) -> tuple[int, int, list[tuple[int, int]]]:
    """(width, height, [(frame_offset, size), ...]) via the header and
    movi walks.  movi recurses into ``rec `` sub-LISTs (spec-valid
    interleave grouping — VfW readers must treat their contents as if
    inline), and a movi list that yields no recognized frame chunks
    raises instead of silently decoding as a 0-frame video."""
    w = h = None
    frames: list[tuple[int, int]] = []

    def walk_movi(pos: int, end: int) -> None:
        while pos + 8 <= end:
            c2, s2 = struct.unpack_from("<4sI", data, pos)
            body_off = pos + 8
            if body_off + s2 > end:
                raise ValueError(f"truncated AVI sub-chunk {c2!r}")
            if c2 in (b"00db", b"00dc"):
                frames.append((body_off, s2))
            elif c2 == b"LIST" and data[body_off : body_off + 4] == b"rec ":
                walk_movi(body_off + 4, body_off + s2)
            pos = body_off + s2 + (s2 & 1)

    saw_movi = False
    for cid, off, sz in _avi_walk(data):
        if cid != b"LIST":
            continue
        kind = data[off : off + 4]
        pos = off + 4
        end = off + sz
        if kind == b"movi":
            saw_movi = True
            walk_movi(pos, end)
            continue
        while pos + 8 <= end:
            c2, s2 = struct.unpack_from("<4sI", data, pos)
            body_off = pos + 8
            if body_off + s2 > end:
                raise ValueError(f"truncated AVI sub-chunk {c2!r}")
            if kind == b"hdrl" and c2 == b"avih":
                if s2 < 40:
                    raise ValueError("truncated avih header")
                vals = struct.unpack_from("<IIIIIIIIII", data, body_off)
                w, h = vals[8], vals[9]
            pos = body_off + s2 + (s2 & 1)
    if w is None or h is None:
        raise ValueError("AVI missing avih header")
    if saw_movi and not frames:
        raise ValueError(
            "AVI movi list contains no recognized frame chunks"
            " (only uncompressed 00db/00dc DIB streams are supported)"
        )
    return w, h, frames


def avi_frame_count(data: bytes) -> int:
    return len(_avi_layout(data)[2])


def decode_avi_frame(data: bytes, idx: int) -> "np.ndarray":
    """Decode DIB frame ``idx``: bottom-up BGR rows, 4-byte stride —
    the BMP pixel layout, reused."""
    w, h, frames = _avi_layout(data)
    if not 0 <= idx < len(frames):
        raise ValueError(f"AVI frame {idx} out of range ({len(frames)} frames)")
    off, sz = frames[idx]
    stride = (w * 3 + 3) & ~3
    if sz < stride * h:
        raise ValueError("truncated AVI DIB frame")
    rows = np.frombuffer(data, np.uint8, count=stride * h, offset=off).reshape(
        h, stride
    )
    return rows[:, : w * 3].reshape(h, w, 3)[::-1, :, ::-1].copy()
