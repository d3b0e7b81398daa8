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


def test_unsupported_variants_raise_cleanly():
    a = np.zeros((2, 2), dtype=np.uint8)
    data = bytearray(encode_png(a))
    # corrupt the bit-depth byte inside IHDR (offset: 8 sig + 8 hdr + 8 w/h)
    data[24] = 16
    # crc now wrong but depth check fires first
    with pytest.raises(NotImplementedError):
        decode_png(bytes(data))
    with pytest.raises(ValueError):
        decode_png(b"JFIF not a png")


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
