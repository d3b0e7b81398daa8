"""Pure-Python PNG codec (functions/png.py) + the real multimodal decode
path it unlocks (r4 — the codec layer was fully stubbed before)."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from mentor_rdf_parsers_spark.functions.png import (
    SIGNATURE,
    _chunk,
    decode_png,
    encode_png,
    is_png,
    resize_nearest,
)


@pytest.mark.parametrize("shape", [(5, 7), (8, 3, 1), (6, 9, 2), (4, 4, 3), (10, 2, 4)])
@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_roundtrip_every_shape_and_filter(shape, filter_type):
    rng = np.random.default_rng(hash((shape, filter_type)) % 2**32)
    a = rng.integers(0, 256, size=shape, dtype=np.uint8)
    data = encode_png(a, filter_type=filter_type)
    assert is_png(data)
    d = decode_png(data)
    expect = a if a.ndim == 3 else a[:, :, None]
    assert d.shape == expect.shape
    assert (d == expect).all()


def test_palette_png_expands_to_rgb():
    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
    idx = bytes([0, 0, 1, 2, 0, 2, 1, 0])  # 2 rows x 3 px, filter 0 per row
    raw = (
        SIGNATURE
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 3, 2, 8, 3, 0, 0, 0))
        + _chunk(b"PLTE", pal)
        + _chunk(b"IDAT", zlib.compress(idx))
        + _chunk(b"IEND", b"")
    )
    d = decode_png(raw)
    assert d.shape == (2, 3, 3)
    assert tuple(d[0, 1]) == (0, 255, 0) and tuple(d[1, 0]) == (0, 0, 255)


def test_invalid_variants_raise_cleanly():
    a = np.zeros((2, 2), dtype=np.uint8)
    data = bytearray(encode_png(a))
    # corrupt the bit-depth byte inside IHDR (offset: 8 sig + 8 hdr + 8 w/h)
    data[24] = 3  # depth 3 is illegal for every color type
    with pytest.raises(ValueError, match="bit depth"):
        decode_png(bytes(data))
    rgb = bytearray(encode_png(np.zeros((2, 2, 3), dtype=np.uint8)))
    rgb[24] = 4  # sub-byte depth is illegal for truecolor
    with pytest.raises(ValueError, match="bit depth"):
        decode_png(bytes(rgb))
    with pytest.raises(ValueError):
        decode_png(b"JFIF not a png")


def _raw_png(w, h, depth, color_type, interlace, idat, plte=None):
    import struct
    import zlib

    def chunk(t, b):
        return (struct.pack(">I", len(b)) + t + b
                + struct.pack(">I", zlib.crc32(t + b) & 0xFFFFFFFF))

    from mentor_rdf_parsers_spark.functions.png import SIGNATURE

    out = SIGNATURE + chunk(
        b"IHDR", struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0,
                             interlace))
    if plte is not None:
        out += chunk(b"PLTE", plte)
    return out + chunk(b"IDAT", zlib.compress(idat)) + chunk(b"IEND", b"")


_ADAM7 = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]


class TestVariantDepthsAndInterlace:
    """r5: every legal depth/color-type plus Adam7 — decoded against
    hand-built spec-shaped files (filter 0 or Up rows)."""

    def test_16bit_rgb_high_byte(self):
        rng = np.random.default_rng(11)
        img16 = rng.integers(0, 65536, (9, 13, 3)).astype(np.uint16)
        raw = b"".join(b"\x00" + img16[y].astype(">u2").tobytes()
                       for y in range(9))
        d = decode_png(_raw_png(13, 9, 16, 2, 0, raw))
        assert np.array_equal(d, (img16 >> 8).astype(np.uint8))

    def test_4bit_gray_rescales(self):
        rng = np.random.default_rng(12)
        g4 = rng.integers(0, 16, (7, 11)).astype(np.uint8)
        rows = []
        for y in range(7):
            row = list(g4[y]) + [0]  # pad to even
            rows.append(b"\x00" + bytes(
                (row[i] << 4) | row[i + 1] for i in range(0, 11, 2)))
        d = decode_png(_raw_png(11, 7, 4, 0, 0, b"".join(rows)))
        assert np.array_equal(
            d[:, :, 0], (g4.astype(np.uint16) * 255 // 15).astype(np.uint8))

    def test_1bit_palette(self):
        rng = np.random.default_rng(13)
        pal = np.array([[255, 0, 0], [0, 255, 0]], dtype=np.uint8)
        b1 = rng.integers(0, 2, (5, 10)).astype(np.uint8)
        raw = b"".join(b"\x00" + np.packbits(b1[y]).tobytes()
                       for y in range(5))
        d = decode_png(_raw_png(10, 5, 1, 3, 0, raw, plte=pal.tobytes()))
        assert np.array_equal(d, pal[b1])

    def test_adam7_rgb(self):
        rng = np.random.default_rng(14)
        img = rng.integers(0, 256, (21, 17, 3)).astype(np.uint8)
        raw = bytearray()
        for x0, y0, dx, dy in _ADAM7:
            sub = img[y0::dy, x0::dx]
            for y in range(sub.shape[0]):
                raw += b"\x00" + sub[y].tobytes()
        d = decode_png(_raw_png(17, 21, 8, 2, 1, bytes(raw)))
        assert np.array_equal(d, img)

    def test_adam7_16bit_gray_with_up_filter(self):
        rng = np.random.default_rng(15)
        img16 = rng.integers(0, 65536, (12, 9)).astype(np.uint16)
        raw = bytearray()
        for x0, y0, dx, dy in _ADAM7:
            sub = img16[y0::dy, x0::dx]
            if sub.size == 0:
                continue
            prev = np.zeros(sub.shape[1] * 2, dtype=np.uint8)
            for y in range(sub.shape[0]):
                line = np.frombuffer(sub[y].astype(">u2").tobytes(),
                                     dtype=np.uint8)
                raw += b"\x02" + ((line.astype(int) - prev) & 0xFF).astype(
                    np.uint8).tobytes()
                prev = line
        d = decode_png(_raw_png(9, 12, 16, 0, 1, bytes(raw)))
        assert np.array_equal(d[:, :, 0], (img16 >> 8).astype(np.uint8))


def test_resize_nearest_shapes_and_determinism():
    rng = np.random.default_rng(3)
    a = rng.integers(0, 256, (100, 60, 3), dtype=np.uint8)
    r1 = resize_nearest(a, 30, 50)
    r2 = resize_nearest(a, 30, 50)
    assert r1.shape == (50, 30, 3) and (r1 == r2).all()
    # identity resize is exact
    assert (resize_nearest(a, 60, 100) == a).all()


def test_decode_images_real_png_path(spark):
    from mentor_rdf_parsers_spark.operators.multimodal import (
        MEDIA,
        decode_images,
        resize_images,
    )

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (48, 96, 3), dtype=np.uint8)
    rows = [
        ("png1", "image", bytearray(encode_png(img)), "image/png"),
        ("blob1", "image", bytearray(b"\xff\xd8 not-a-png payload"), "image/jpeg"),
    ]
    media = spark.createDataFrame(rows, MEDIA)

    meta = {r["media_id"]: r for r in decode_images(media).collect()}
    # real decode: true dimensions, features from actual pixels
    assert (meta["png1"]["width"], meta["png1"]["height"]) == (96, 48)
    assert len(meta["png1"]["features"]) == 8
    lum = img.mean() / 255.0 * 2 - 1
    assert abs(meta["png1"]["features"][0] - lum) < 1e-3
    # non-PNG stays on the deterministic fake
    assert 16 <= meta["blob1"]["width"] <= 255

    thumbs = {r["media_id"]: r for r in
              resize_images(media, target_w=24, target_h=24).collect()}
    t = thumbs["png1"]
    assert (t["src_width"], t["src_height"]) == (96, 48)
    assert (t["width"], t["height"]) == (24, 12)  # aspect-fit
    # the thumbnail payload is a REAL decodable PNG of the stated size
    arr = decode_png(bytes(t["payload"]))
    assert arr.shape == (12, 24, 3)
    assert (arr == resize_nearest(img, 24, 12)).all()
    # non-PNG thumbnail stays the digest stand-in (not PNG bytes)
    assert not is_png(bytes(thumbs["blob1"]["payload"]))


def _make_wav(freq=440.0, rate=8000, ms=500, width=2):
    import io
    import wave

    n = rate * ms // 1000
    t = np.arange(n) / rate
    s = np.sin(2 * np.pi * freq * t)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(width)
        w.setframerate(rate)
        if width == 2:
            w.writeframes((s * 32767).astype("<i2").tobytes())
        else:
            w.writeframes(((s * 127) + 128).astype("u1").tobytes())
    return buf.getvalue()


def test_extract_audio_features_real_wav_path(spark):
    from mentor_rdf_parsers_spark.operators.multimodal import (
        MEDIA,
        extract_audio_features,
    )

    rows = [
        ("wav1", "audio", bytearray(_make_wav(ms=500)), "audio/wav"),
        ("wav8", "audio", bytearray(_make_wav(ms=250, width=1)), "audio/wav"),
        ("mp3ish", "audio", bytearray(b"\xff\xfb fake mp3 bytes" * 8), "audio/mpeg"),
    ]
    media = spark.createDataFrame(rows, MEDIA)
    meta = {r["media_id"]: r for r in extract_audio_features(media).collect()}
    # REAL path: duration from the RIFF header, not byte-length heuristics
    assert meta["wav1"]["duration_ms"] == 500
    assert meta["wav8"]["duration_ms"] == 250
    # a pure sine has substantial RMS -> feature[0] well above silence (-1)
    assert meta["wav1"]["features"][0] > 0.0
    # fake path: byte-length-derived duration for compressed formats
    b = bytes(rows[2][2])
    assert meta["mp3ish"]["duration_ms"] == len(b) // 16
