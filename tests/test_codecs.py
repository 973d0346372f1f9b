"""Pure-stdlib media codecs (functions/codecs.py): round-trips, the
full PNG filter set, validation rejects, and the multimodal surface's
arm routing. Closes the round-4 'What's missing' decode-stub item for
ALL FOUR corpus arms (png/wav/bmp + RIFF AVI video); decode_stub
remains only as the extension boundary for formats with no
pure-stdlib codec."""

import struct
import zlib

import pytest

from stakgraph_spark.functions.codecs import (
    _PNG_SIG,
    decode_avi,
    decode_bmp,
    decode_png,
    decode_wav,
    encode_avi,
    encode_bmp,
    encode_png,
    encode_wav,
)


def _ramp(d: int, n: int) -> bytes:
    return bytes((d + i) % 256 for i in range(n))


@pytest.mark.parametrize("w,h", [(1, 1), (3, 5), (64, 48), (31, 24), (5, 1), (1, 7)])
def test_png_bmp_roundtrip(w, h):
    px = _ramp(12345, w * h)
    assert decode_png(encode_png(w, h, px)) == (w, h, px)
    assert decode_bmp(encode_bmp(w, h, px)) == (w, h, px)


@pytest.mark.parametrize("n", [1, 255, 256, 257, 1000])
def test_wav_roundtrip(n):
    s = _ramp(99, n)
    assert decode_wav(encode_wav(s)) == (n, 8000, s)


def _chunk(tag, body):
    return (
        struct.pack(">I", len(body)) + tag + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def test_png_decoder_reconstructs_every_filter_type():
    """Hand-build a PNG whose five scanlines use filters 0..4 — a
    decoder that skips reconstruction cannot pass (spec §9)."""
    w, h = 4, 5
    px = bytes(range(w * h))
    rows = [px[y * w : (y + 1) * w] for y in range(h)]
    raw, prev = bytearray(), [0] * w
    for y, f in enumerate(range(5)):
        row = rows[y]
        raw.append(f)
        for x, v in enumerate(row):
            a = row[x - 1] if x else 0
            b = prev[x]
            c = prev[x - 1] if x else 0
            if f == 0:
                e = v
            elif f == 1:
                e = (v - a) & 0xFF
            elif f == 2:
                e = (v - b) & 0xFF
            elif f == 3:
                e = (v - ((a + b) >> 1)) & 0xFF
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                e = (v - pred) & 0xFF
            raw.append(e)
        prev = row
    data = (
        _PNG_SIG
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0))
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )
    assert decode_png(data) == (w, h, px)


def test_png_rejects_corrupt_crc_and_bad_signature():
    good = bytearray(encode_png(3, 3, _ramp(0, 9)))
    good[20] ^= 0xFF  # flip a byte inside IHDR without fixing the CRC
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(good))
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"JUNK" + bytes(8))


def test_bmp_rejects_non_bmp():
    with pytest.raises(ValueError, match="not a BMP"):
        decode_bmp(b"XX" + bytes(64))


@pytest.mark.parametrize("w,h,nf", [(1, 1, 1), (5, 3, 4), (32, 24, 24), (7, 2, 1), (2, 9, 3)])
def test_avi_roundtrip(w, h, nf):
    px = _ramp(4242, w * h * nf)
    frames = [px[i * w * h : (i + 1) * w * h] for i in range(nf)]
    assert decode_avi(encode_avi(w, h, frames)) == (w, h, nf, px)


def test_avi_rejects_non_avi_and_frame_count_mismatch():
    with pytest.raises(ValueError, match="not an AVI"):
        decode_avi(b"RIFX" + bytes(64))
    with pytest.raises(ValueError, match="not an AVI"):
        decode_avi(b"RIFF" + struct.pack("<I", 4) + b"WAVE")
    good = bytearray(encode_avi(3, 2, [_ramp(0, 6), _ramp(6, 6)]))
    # lie in avih dwTotalFrames (offset: RIFF(12) + LIST hdr(12) +
    # avih hdr(8) + 4*4 bytes into the 14-DWORD avih body)
    struct.pack_into("<I", good, 12 + 12 + 8 + 16, 9)
    with pytest.raises(ValueError, match="frame count mismatch"):
        decode_avi(bytes(good))


def test_unknown_media_type_is_the_declared_boundary():
    from stakgraph_spark.operators.multimodal import decode, decode_stub

    with pytest.raises(NotImplementedError):
        decode_stub(b"", "hologram")
    with pytest.raises(NotImplementedError):
        decode(b"x" * 16, "mp4", "video")  # no pure-stdlib h264 codec


def test_decode_routes_real_codecs():
    from stakgraph_spark.operators.multimodal import decode

    px = _ramp(7, 12)
    assert decode(encode_png(4, 3, px), "png", "image")["samples"] == px
    assert decode(encode_bmp(4, 3, px), "bmp", "image")["samples"] == px
    assert decode(encode_wav(px), "wav", "audio")["n_frames"] == 12
    d = decode(encode_avi(4, 3, [px]), "avi", "video")
    assert (d["width"], d["height"], d["n_frames"], d["samples"]) == (4, 3, 1, px)
