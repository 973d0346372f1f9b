"""Pure-stdlib media codecs: PNG (zlib), WAV (wave), BMP (struct).

The reference treats uploaded media as opaque payloads plus typed
metadata; this engine's multimodal surface (operators/multimodal.py)
additionally DECODES where a codec is implementable without
third-party libraries. These three are — so the decode step is real
for png/wav/bmp and remains a declared stub only for container
formats (mp4) that genuinely need an external codec.

Decoders are complete for the profiles the synthetic corpus emits and
validate their input (PNG: signature, per-chunk CRC32, IHDR profile,
all five scanline filters reconstructed; WAV: RIFF parse via stdlib
`wave`; BMP: BITMAPFILEHEADER/BITMAPINFOHEADER, bottom-up rows,
4-byte row padding stripped). Encoders exist so the synthetic corpus
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
    pad = (-width) % 4
    palette = b"".join(struct.pack("<BBBB", i, i, i, 0) for i in range(256))
    rows = bytearray()
    for y in range(height - 1, -1, -1):  # bottom-up, per spec
        rows += pixels[y * width : (y + 1) * width] + b"\x00" * pad
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
