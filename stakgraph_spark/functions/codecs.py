"""Pure-stdlib media codecs: PNG (zlib), WAV (wave), BMP (struct).

The reference treats uploaded media as opaque payloads plus typed
metadata; this engine's multimodal surface (operators/multimodal.py)
additionally DECODES where a codec is implementable without
third-party libraries. All four corpus arms are — png/wav/bmp plus
RIFF AVI video (uncompressed 8-bit DIB frames) — so the decode step
is real end-to-end; only formats that genuinely need an external
codec (mp4/h264) stay behind the marked decode_stub boundary.

Decoders are complete for the profiles the synthetic corpus emits and
validate their input (PNG: signature, per-chunk CRC32, IHDR profile,
all five scanline filters reconstructed; WAV: RIFF parse via stdlib
`wave`; BMP: BITMAPFILEHEADER/BITMAPINFOHEADER, bottom-up rows,
4-byte row padding stripped; AVI: RIFF/'AVI ' signature, avih
dimensions + frame count cross-checked against the movi chunks, strf
8-bit-DIB profile check). Encoders exist so the synthetic corpus
carries REAL bytes and every decode in the pipeline is a genuine
round-trip, differentially checked against a DuckDB oracle that
predicts the decoded statistics arithmetically (mm_media_features).
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

# ---------------------------------------------------------------------------
# PNG — 8-bit grayscale (colour type 0), the full filter set
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(width: int, height: int, pixels: bytes) -> bytes:
    """Minimal spec-conformant writer: 8-bit grayscale, one IDAT,
    Sub (type 1) filter on every scanline — chosen over None so a
    decoder cannot round-trip without actually reconstructing."""
    if len(pixels) != width * height:
        raise ValueError("pixel buffer does not match dimensions")
    raw = bytearray()
    for y in range(height):
        row = pixels[y * width : (y + 1) * width]
        raw.append(1)  # Sub
        prev = 0
        for b in row:
            raw.append((b - prev) & 0xFF)
            prev = b
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> tuple[int, int, bytes]:
    """Full grayscale-8 decoder: chunk walk with CRC verification,
    IDAT concatenation, zlib inflate, and reconstruction of all five
    PNG filter types (None/Sub/Up/Average/Paeth, spec §9)."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, width, height, idat = 8, 0, 0, bytearray()
    while pos < len(data):
        (ln,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + ln]
        (crc,) = struct.unpack_from(">I", data, pos + 8 + ln)
        if crc != zlib.crc32(tag + body) & 0xFFFFFFFF:
            raise ValueError(f"CRC mismatch in {tag!r}")
        if tag == b"IHDR":
            width, height, depth, ctype = struct.unpack(">IIBB", body[:10])
            if (depth, ctype) != (8, 0):
                raise ValueError("decoder supports 8-bit grayscale only")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + ln
    raw = zlib.decompress(bytes(idat))
    if len(raw) != height * (width + 1):
        raise ValueError("inflated length does not match dimensions")
    out = bytearray(width * height)
    for y in range(height):
        ftype = raw[y * (width + 1)]
        row = raw[y * (width + 1) + 1 : (y + 1) * (width + 1)]
        for x in range(width):
            a = out[y * width + x - 1] if x else 0  # left
            b = out[(y - 1) * width + x] if y else 0  # up
            c = out[(y - 1) * width + x - 1] if x and y else 0  # up-left
            v = row[x]
            if ftype == 1:
                v += a
            elif ftype == 2:
                v += b
            elif ftype == 3:
                v += (a + b) >> 1
            elif ftype == 4:
                v += _paeth(a, b, c)
            elif ftype != 0:
                raise ValueError(f"unknown filter type {ftype}")
            out[y * width + x] = v & 0xFF
    return width, height, bytes(out)


# ---------------------------------------------------------------------------
# WAV — mono 8-bit unsigned PCM via the stdlib RIFF implementation
# ---------------------------------------------------------------------------

def encode_wav(samples: bytes, framerate: int = 8000) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)  # 8-bit unsigned: one sample IS one byte
        w.setframerate(framerate)
        w.writeframes(samples)
    return buf.getvalue()


def decode_wav(data: bytes) -> tuple[int, int, bytes]:
    """-> (n_frames, framerate, samples). Mono 8-bit profile."""
    with wave.open(io.BytesIO(data), "rb") as w:
        if (w.getnchannels(), w.getsampwidth()) != (1, 1):
            raise ValueError("decoder supports mono 8-bit PCM only")
        n = w.getnframes()
        return n, w.getframerate(), w.readframes(n)


# ---------------------------------------------------------------------------
# BMP — 8-bit palettized (grayscale palette), bottom-up padded rows
# ---------------------------------------------------------------------------

def encode_bmp(width: int, height: int, pixels: bytes) -> bytes:
    if len(pixels) != width * height:
        raise ValueError("pixel buffer does not match dimensions")
    palette = b"".join(struct.pack("<BBBB", i, i, i, 0) for i in range(256))
    rows = _dib_rows(width, height, pixels)  # bottom-up padded, per spec
    offset = 14 + 40 + len(palette)
    header = struct.pack("<2sIHHI", b"BM", offset + len(rows), 0, 0, offset)
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 8, 0, len(rows), 2835, 2835, 256, 0)
    return header + info + palette + bytes(rows)


def decode_bmp(data: bytes) -> tuple[int, int, bytes]:
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    (offset,) = struct.unpack_from("<I", data, 10)
    size, width, height, _planes, bpp = struct.unpack_from("<IiiHH", data, 14)
    if size != 40 or bpp != 8:
        raise ValueError("decoder supports 8-bit BITMAPINFOHEADER only")
    bottom_up = height > 0
    height = abs(height)
    pad = (-width) % 4
    out = bytearray(width * height)
    for i in range(height):
        y = height - 1 - i if bottom_up else i
        start = offset + i * (width + pad)
        out[y * width : (y + 1) * width] = data[start : start + width]
    return width, height, bytes(out)


# ---------------------------------------------------------------------------
# AVI — RIFF container, uncompressed 8-bit DIB ('DIB ') video frames
# ---------------------------------------------------------------------------
# The video arm's container format. Frames are stored exactly like the
# BMP pixel array (bottom-up rows, 4-byte padded) inside '00db' chunks
# of a LIST/movi, with the standard hdrl (avih + strl{strh,strf}) and
# an idx1 index. Reference parity: uploads.rs treats media as opaque
# payload + typed metadata; decoding here is the engine's multimodal
# extension (SURVEY §2 LLM-pipeline components), not a reference port.

def _dib_rows(width: int, height: int, pixels: bytes) -> bytes:
    """Bottom-up 4-byte-padded row packing shared by BMP and AVI DIB."""
    pad = (-width) % 4
    rows = bytearray()
    for y in range(height - 1, -1, -1):
        rows += pixels[y * width : (y + 1) * width] + b"\x00" * pad
    return bytes(rows)


def _undib_rows(width: int, height: int, data: bytes, offset: int = 0) -> bytes:
    pad = (-width) % 4
    out = bytearray(width * height)
    for i in range(height):
        y = height - 1 - i
        start = offset + i * (width + pad)
        out[y * width : (y + 1) * width] = data[start : start + width]
    return bytes(out)


def _riff_chunk(tag: bytes, body: bytes) -> bytes:
    return tag + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")


def _riff_list(list_type: bytes, body: bytes) -> bytes:
    return _riff_chunk(b"LIST", list_type + body)


def encode_avi(width: int, height: int, frames: list[bytes], fps: int = 10) -> bytes:
    if any(len(f) != width * height for f in frames):
        raise ValueError("frame buffer does not match dimensions")
    n = len(frames)
    dibs = [_dib_rows(width, height, f) for f in frames]
    frame_sz = len(dibs[0]) if dibs else 0
    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        frame_sz * fps,    # dwMaxBytesPerSec
        0,                 # dwPaddingGranularity
        0x10,              # dwFlags = AVIF_HASINDEX
        n, 0, 1,           # dwTotalFrames, dwInitialFrames, dwStreams
        frame_sz,          # dwSuggestedBufferSize
        width, height,
        0, 0, 0, 0,        # dwReserved[4]
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIi4h",
        b"vids", b"DIB ", 0, 0, 0, 0,
        1, fps,            # dwScale, dwRate -> fps frames/sec
        0, n,              # dwStart, dwLength (frames)
        frame_sz, 0, 0,    # dwSuggestedBufferSize, dwQuality, dwSampleSize
        0, 0, width, height,  # rcFrame
    )
    palette = b"".join(struct.pack("<BBBB", i, i, i, 0) for i in range(256))
    strf = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 8, 0, frame_sz, 2835, 2835, 256, 0
    ) + palette
    hdrl = _riff_list(
        b"hdrl",
        _riff_chunk(b"avih", avih)
        + _riff_list(b"strl", _riff_chunk(b"strh", strh) + _riff_chunk(b"strf", strf)),
    )
    movi_body = b"".join(_riff_chunk(b"00db", d) for d in dibs)
    movi = _riff_list(b"movi", movi_body)
    # idx1: one AVIINDEXENTRY per frame; dwChunkOffset is relative to
    # the start of the 'movi' list type fourcc (the common convention)
    idx, off = bytearray(), 4
    for d in dibs:
        idx += struct.pack("<4sIII", b"00db", 0x10, off, len(d))  # AVIIF_KEYFRAME
        off += 8 + len(d) + (len(d) & 1)
    riff_body = b"AVI " + hdrl + movi + _riff_chunk(b"idx1", bytes(idx))
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def _walk_riff(data: bytes, start: int, end: int):
    o = start
    while o + 8 <= end:
        tag = data[o : o + 4]
        (size,) = struct.unpack_from("<I", data, o + 4)
        yield tag, o + 8, size
        o += 8 + size + (size & 1)


def decode_avi(data: bytes) -> tuple[int, int, int, bytes]:
    """-> (width, height, n_frames, concatenated frame pixels).

    Full container parse: RIFF/'AVI ' signature, hdrl/avih header
    (dimensions + frame count), strf profile check (8-bit DIB), then
    every '00db'/'00dc' chunk of LIST/movi un-padded bottom-up. A
    truncated movi or a frame-count mismatch raises."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI")
    width = height = total = None
    pixels = bytearray()
    n_seen = 0
    for tag, body_off, size in _walk_riff(data, 12, len(data)):
        if tag != b"LIST":
            continue
        ltype = data[body_off : body_off + 4]
        if ltype == b"hdrl":
            for t2, o2, s2 in _walk_riff(data, body_off + 4, body_off + size):
                if t2 == b"avih":
                    hdr = struct.unpack_from("<14I", data, o2)
                    total, width, height = hdr[4], hdr[8], hdr[9]
                elif t2 == b"LIST" and data[o2 : o2 + 4] == b"strl":
                    for t3, o3, _s3 in _walk_riff(data, o2 + 4, o2 + s2):
                        if t3 == b"strf":
                            info = struct.unpack_from("<IiiHHI", data, o3)
                            if info[0] != 40 or info[4] != 8:
                                raise ValueError("decoder supports 8-bit DIB streams only")
        elif ltype == b"movi":
            if width is None:
                raise ValueError("movi before hdrl")
            for t2, o2, s2 in _walk_riff(data, body_off + 4, body_off + size):
                if t2 in (b"00db", b"00dc"):
                    if o2 + s2 > len(data):
                        raise ValueError("truncated frame chunk")
                    pixels += _undib_rows(width, height, data, o2)
                    n_seen += 1
    if width is None or total is None:
        raise ValueError("missing avih header")
    if n_seen != total:
        raise ValueError(f"frame count mismatch: header {total}, movi {n_seen}")
    return width, height, n_seen, bytes(pixels)
