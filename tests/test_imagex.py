"""functions/imagex.py — BMP decode + TIFF/WebP probes (r5) and the
multimodal dispatch for all three."""

from __future__ import annotations

import numpy as np
import pytest

from mentor_rdf_parsers_spark.functions import imagex


class TestBmp:
    def test_rgb_roundtrip_exact(self):
        rng = np.random.default_rng(3)
        img = rng.integers(0, 256, (21, 37, 3)).astype(np.uint8)
        out = imagex.decode_bmp(imagex.encode_bmp(img))
        np.testing.assert_array_equal(out, img)

    def test_gray_expands(self):
        g = np.arange(0, 150, dtype=np.uint8).reshape(10, 15)
        out = imagex.decode_bmp(imagex.encode_bmp(g))
        np.testing.assert_array_equal(out, np.stack([g] * 3, axis=2))

    def test_row_padding_widths(self):
        # strides land on all four 4-byte alignment cases
        for w in (5, 6, 7, 8):
            img = np.full((3, w, 3), 99, np.uint8)
            assert imagex.decode_bmp(imagex.encode_bmp(img)).shape == (3, w, 3)

    def test_rejects(self):
        assert not imagex.is_bmp(b"PNG")
        with pytest.raises(ValueError):
            imagex.decode_bmp(b"definitely not a bitmap")


class TestPnm:
    def test_ppm_roundtrip_exact(self):
        rng = np.random.default_rng(4)
        img = rng.integers(0, 256, (17, 23, 3)).astype(np.uint8)
        out = imagex.decode_pnm(imagex.encode_pnm(img))
        np.testing.assert_array_equal(out, img)

    def test_pgm_expands_to_rgb(self):
        g = np.arange(0, 120, dtype=np.uint8).reshape(8, 15)
        out = imagex.decode_pnm(imagex.encode_pnm(g))
        np.testing.assert_array_equal(out, np.stack([g] * 3, axis=2))

    def test_comment_in_header(self):
        img = np.full((4, 6, 3), 9, np.uint8)
        data = imagex.encode_pnm(img).replace(
            b"\n255\n", b"\n# a comment line\n255\n")
        np.testing.assert_array_equal(imagex.decode_pnm(data), img)

    def test_probe_and_decode_dispatch(self):
        from mentor_rdf_parsers_spark.operators.multimodal import (
            _probe_one,
            _try_decode_image,
        )

        img = np.full((7, 11, 3), 3, np.uint8)
        data = imagex.encode_pnm(img)
        p = _probe_one(data)
        assert (p["container"], p["codec"], p["width"], p["height"]) == (
            "pnm", "ppm", 11, 7)
        np.testing.assert_array_equal(_try_decode_image(data), img)

    def test_rejects(self):
        assert not imagex.is_pnm(b"P3\n...")  # ASCII variants out of scope
        with pytest.raises(ValueError):
            imagex.decode_pnm(b"P6\n4 4\n255")  # truncated


class TestTiffDecode:
    def test_uncompressed_rgb_roundtrip(self):
        rng = np.random.default_rng(8)
        img = rng.integers(0, 256, (19, 27, 3)).astype(np.uint8)
        out = imagex.decode_tiff(imagex.encode_tiff(img))
        np.testing.assert_array_equal(out, img)

    def test_gray_expands(self):
        g = np.arange(0, 143, dtype=np.uint8).reshape(11, 13)
        out = imagex.decode_tiff(imagex.encode_tiff(g))
        np.testing.assert_array_equal(out, np.stack([g] * 3, axis=2))

    def test_compressed_strips(self):
        """Compression 5 (LZW — TIFF MSB-first variant with
        EarlyChange), 8 (zlib — stdlib) and 32773 (PackBits RLE)
        decode for real; only JPEG-in-TIFF needs a codec library."""
        rng = np.random.default_rng(9)
        img = rng.integers(0, 256, (23, 31, 3)).astype(np.uint8)
        for comp in (5, 8, 32773):
            out = imagex.decode_tiff(imagex.encode_tiff(img,
                                                        compression=comp))
            np.testing.assert_array_equal(out, img)
        # PackBits repeat runs (the encoder only emits literals)
        assert imagex._packbits(bytes([0xFD, 7])) == bytes([7] * 4)
        assert imagex._packbits(bytes([0x02, 1, 2, 3])) == bytes([1, 2, 3])

    def test_lzw_width_boundaries_and_clear_cycle(self):
        """LZW streams crossing every code-width switch (511/1023/2047)
        and the 4094-entry clear."""
        rng = np.random.default_rng(11)
        for data in (
            # noise fills the table every ~8 KB → several clear cycles
            bytes(rng.integers(0, 256, 60000, dtype=np.uint8)),
            np.repeat(rng.integers(0, 8, 1500), 50).astype(np.uint8).tobytes(),
        ):
            assert imagex._tiff_lzw(imagex._tiff_lzw_encode(data)) == data

    def test_jpeg_in_tiff_rejected_by_name(self):
        data = bytearray(imagex.encode_tiff(np.zeros((4, 4), np.uint8)))
        # flip the Compression tag value (259) to 7 = JPEG
        i = data.find(b"\x03\x01\x03\x00")  # tag 259, type SHORT (LE)
        data[i + 8] = 7
        with pytest.raises(NotImplementedError, match="compression 7"):
            imagex.decode_tiff(bytes(data))

    def test_image_path_dispatch(self):
        from mentor_rdf_parsers_spark.operators.multimodal import (
            _try_decode_image,
        )

        img = np.full((6, 9, 3), 77, np.uint8)
        np.testing.assert_array_equal(
            _try_decode_image(imagex.encode_tiff(img)), img)
        # dimension-only fixture (no strips) falls through to the fake
        assert _try_decode_image(imagex.make_tiff(5, 6)) is None


class TestTiffWebpProbes:
    def test_tiff_both_byte_orders(self):
        assert imagex.probe_tiff(imagex.make_tiff(640, 480)) == {
            "width": 640, "height": 480}
        assert imagex.probe_tiff(imagex.make_tiff(33, 44, big_endian=True)
                                 ) == {"width": 33, "height": 44}
        assert imagex.probe_tiff(b"II*\x00" + b"\xff" * 4) is None

    def test_webp_vp8l(self):
        p = imagex.probe_webp(imagex.make_webp_vp8l_header(320, 200))
        assert p == {"width": 320, "height": 200, "codec": "vp8l"}
        assert imagex.probe_webp(b"RIFF\x04\x00\x00\x00AVI ") is None


class TestMultimodalDispatch:
    def test_probe_one(self):
        from mentor_rdf_parsers_spark.operators.multimodal import _probe_one

        img = np.full((12, 30, 3), 42, np.uint8)
        p = _probe_one(imagex.encode_bmp(img))
        assert (p["container"], p["width"], p["height"]) == ("bmp", 30, 12)
        p = _probe_one(imagex.make_tiff(100, 60))
        assert (p["container"], p["width"], p["height"]) == ("tiff", 100, 60)
        p = _probe_one(imagex.make_webp_vp8l_header(48, 32))
        assert (p["container"], p["codec"], p["width"]) == (
            "webp", "vp8l", 48)

    def test_decode_image_real_bmp(self):
        from mentor_rdf_parsers_spark.operators.multimodal import (
            _try_decode_image,
        )

        img = np.full((9, 13, 3), 7, np.uint8)
        np.testing.assert_array_equal(
            _try_decode_image(imagex.encode_bmp(img)), img)
        # webp/tiff pixel decode honestly absent → falls to the fake
        assert _try_decode_image(imagex.make_webp_vp8l_header(4, 4)) is None


class TestIco:
    def test_png_entry_roundtrip(self):
        rng = np.random.default_rng(12)
        img = rng.integers(0, 256, (32, 48, 3)).astype(np.uint8)
        ico = imagex.encode_ico(img)
        assert imagex.probe_ico(ico) == {"width": 48, "height": 32,
                                         "n_frames": 1}
        np.testing.assert_array_equal(imagex.decode_ico(ico), img)

    def test_classic_dib_entry(self):
        """Pre-PNG favicons store a headerless BMP whose height field
        counts image + AND-mask rows."""
        import struct

        img = np.arange(32 * 48 * 3, dtype=np.uint8).reshape(32, 48, 3)
        dib = bytearray(imagex.encode_bmp(img)[14:])
        (h_,) = struct.unpack("<i", dib[8:12])
        struct.pack_into("<i", dib, 8, h_ * 2)
        entry = bytes([48, 32, 0, 0]) + struct.pack("<HHII", 1, 24,
                                                    len(dib), 22)
        ico = b"\x00\x00\x01\x00\x01\x00" + entry + bytes(dib)
        np.testing.assert_array_equal(imagex.decode_ico(ico), img)

    def test_multimodal_dispatch(self):
        from mentor_rdf_parsers_spark.operators.multimodal import (
            _probe_one,
            _try_decode_image,
        )

        img = np.full((16, 16, 3), 5, np.uint8)
        ico = imagex.encode_ico(img)
        p = _probe_one(ico)
        assert (p["container"], p["width"], p["height"]) == ("ico", 16, 16)
        np.testing.assert_array_equal(_try_decode_image(ico), img)

    def test_rejects(self):
        assert not imagex.is_ico(b"\x00\x00\x02\x00\x01\x00")  # CUR, not ICO
        assert imagex.probe_ico(b"GIF89a") is None
