"""functions/jpeg.py — pure-Python baseline JPEG codec (VERDICT r4 ask
#2: closes the largest remaining multimodal stub the way the PNG codec
did). Round-trips are LOSSY, so assertions use tolerances sized for
smooth gradients at high quality; structure assertions (markers,
determinism, rejects) are exact."""

from __future__ import annotations

import numpy as np
import pytest

from mentor_rdf_parsers_spark.functions import jpeg


def _gradient_gray(h=40, w=56):
    y, x = np.mgrid[0:h, 0:w]
    return ((y * 2 + x * 3) % 256).astype(np.uint8)


def _gradient_rgb(h=40, w=56):
    y, x = np.mgrid[0:h, 0:w]
    return np.stack(
        [(x * 4) % 256, (y * 3) % 256, ((x + y) * 2) % 256], axis=2
    ).astype(np.uint8)


class TestRoundTrip:
    def test_grayscale(self):
        img = _gradient_gray()
        data = jpeg.encode_jpeg(img, quality=92)
        assert jpeg.is_jpeg(data)
        out = jpeg.decode_jpeg(data)
        assert out.shape == (40, 56, 1)
        assert np.abs(out[:, :, 0].astype(int) - img.astype(int)).max() <= 4

    def test_rgb_444(self):
        img = _gradient_rgb()
        out = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=92))
        assert out.shape == (40, 56, 3)
        err = np.abs(out.astype(int) - img.astype(int))
        assert err.max() <= 8 and err.mean() < 2

    def test_rgb_420_subsampled(self):
        img = _gradient_rgb()
        data = jpeg.encode_jpeg(img, quality=92, subsample="420")
        out = jpeg.decode_jpeg(data)
        assert out.shape == (40, 56, 3)
        # chroma is 2×2 block-mean'd; smooth gradients stay close
        err = np.abs(out.astype(int) - img.astype(int))
        assert err.max() <= 12 and err.mean() < 3
        # 4:2:0 carries 4x fewer chroma blocks → smaller file
        assert len(data) < len(jpeg.encode_jpeg(img, quality=92))

    def test_odd_dimensions_padded(self):
        """Non-multiple-of-8 (and odd, so 4:2:0 chroma pads twice)."""
        img = _gradient_rgb(37, 51)
        for sub in ("444", "420"):
            out = jpeg.decode_jpeg(
                jpeg.encode_jpeg(img, quality=92, subsample=sub))
            assert out.shape == (37, 51, 3)
            assert np.abs(out.astype(int) - img.astype(int)).max() <= 12

    def test_restart_intervals(self):
        """DRI/RSTn: encoder emits restart markers, decoder resets DC
        predictors and bit alignment at each — output identical to the
        no-restart encoding of the same input."""
        img = _gradient_rgb(37, 51)
        plain = jpeg.decode_jpeg(jpeg.encode_jpeg(img, 92, "420"))
        with_rst = jpeg.encode_jpeg(img, 92, "420", restart_interval=2)
        assert b"\xff\xdd" in with_rst  # DRI segment
        assert b"\xff\xd0" in with_rst  # first RST marker
        np.testing.assert_array_equal(jpeg.decode_jpeg(with_rst), plain)

    def test_quality_monotone(self):
        img = _gradient_gray()
        lo = jpeg.encode_jpeg(img, quality=20)
        hi = jpeg.encode_jpeg(img, quality=95)
        assert len(lo) < len(hi)
        err_lo = np.abs(
            jpeg.decode_jpeg(lo)[:, :, 0].astype(int) - img.astype(int)
        ).mean()
        err_hi = np.abs(
            jpeg.decode_jpeg(hi)[:, :, 0].astype(int) - img.astype(int)
        ).mean()
        assert err_hi < err_lo

    def test_deterministic(self):
        img = _gradient_rgb()
        assert jpeg.encode_jpeg(img, 85, "420", 3) == jpeg.encode_jpeg(
            img, 85, "420", 3)

    def test_byte_stuffing_survives(self):
        """High-quality noise produces 0xFF bytes in the entropy stream;
        stuffing (FF00) must keep them from reading as markers."""
        rng = np.random.default_rng(7)
        img = rng.integers(0, 256, size=(24, 24), dtype=np.uint8)
        data = jpeg.encode_jpeg(img, quality=100)
        out = jpeg.decode_jpeg(data)
        assert out.shape == (24, 24, 1)
        # q100 quantizers are ~1: near-lossless even for noise
        assert np.abs(out[:, :, 0].astype(int) - img.astype(int)).max() <= 6


class TestProgressive:
    """SOF2: spectral selection + successive approximation (round-5).
    Progressive reorders the SAME quantized coefficients across scans,
    so its decode must be bit-identical to the baseline encoding of the
    same input — the strongest possible oracle, no tolerance needed."""

    def test_bit_identical_to_baseline_gray(self):
        img = _gradient_gray(37, 51)
        base = jpeg.decode_jpeg(jpeg.encode_jpeg(img, 90))
        prog = jpeg.decode_jpeg(jpeg.encode_jpeg(img, 90, progressive=True))
        np.testing.assert_array_equal(prog, base)

    def test_bit_identical_to_baseline_color(self):
        img = _gradient_rgb(41, 67)
        for sub in ("444", "420"):
            base = jpeg.decode_jpeg(jpeg.encode_jpeg(img, 85, sub))
            prog = jpeg.decode_jpeg(
                jpeg.encode_jpeg(img, 85, sub, progressive=True))
            np.testing.assert_array_equal(prog, base)

    def test_sof2_marker_and_scan_count(self):
        data = jpeg.encode_jpeg(_gradient_rgb(), 85, progressive=True)
        assert b"\xff\xc2" in data and b"\xff\xc0" not in data
        assert data.count(b"\xff\xda") == 10  # libjpeg-shaped scan script

    def test_eob_runs_and_zrl(self):
        """A flat image maxes out cross-block EOB runs; a sparse one
        exercises ZRL folding in the refinement scans."""
        rng = np.random.default_rng(3)
        flat = np.full((64, 64, 3), 130, np.uint8)
        sparse = np.zeros((48, 56, 3), np.uint8)
        sparse[7:9, 30:32] = 255
        noise = rng.integers(0, 256, (96, 80, 3)).astype(np.uint8)
        for img in (flat, sparse, noise):
            for q in (15, 95):
                base = jpeg.decode_jpeg(jpeg.encode_jpeg(img, q, "420"))
                prog = jpeg.decode_jpeg(
                    jpeg.encode_jpeg(img, q, "420", progressive=True))
                np.testing.assert_array_equal(prog, base)

    def test_progressive_with_restarts(self):
        """DRI in a progressive stream: EOB runs flush and DC predictors
        reset at every RSTn, per scan."""
        img = _gradient_rgb(37, 51)
        base = jpeg.decode_jpeg(jpeg.encode_jpeg(img, 90, "420"))
        data = jpeg.encode_jpeg(img, 90, "420", restart_interval=2,
                                progressive=True)
        assert b"\xff\xdd" in data
        np.testing.assert_array_equal(jpeg.decode_jpeg(data), base)

    def test_multimodal_decodes_progressive_payload(self):
        """Progressive JPEGs (the common web export) now take the REAL
        decode path in the Spark stage, not the digest fake."""
        from mentor_rdf_parsers_spark.operators.multimodal import (
            _try_decode_image,
        )

        img = _gradient_rgb(24, 40)
        arr = _try_decode_image(jpeg.encode_jpeg(img, 92, progressive=True))
        assert arr is not None and arr.shape == (24, 40, 3)


class TestRejects:
    def test_not_a_jpeg(self):
        assert not jpeg.is_jpeg(b"\x89PNG\r\n\x1a\n")
        with pytest.raises(ValueError):
            jpeg.decode_jpeg(b"not a jpeg at all")

    def test_arithmetic_coding_rejected_by_name(self):
        """Swap SOF0 → SOF9 (arithmetic) in a valid stream: named reject."""
        data = bytearray(jpeg.encode_jpeg(_gradient_gray(), 85))
        i = data.find(b"\xff\xc0")
        data[i + 1] = 0xC9
        with pytest.raises(NotImplementedError, match="SOF9"):
            jpeg.decode_jpeg(bytes(data))

    def test_bad_subsample_arg(self):
        with pytest.raises(ValueError, match="subsample"):
            jpeg.encode_jpeg(_gradient_gray(), subsample="422")


class TestMultimodalWiring:
    def test_try_decode_image_handles_jpeg(self):
        from mentor_rdf_parsers_spark.operators.multimodal import (
            _try_decode_image,
        )

        img = _gradient_rgb()
        arr = _try_decode_image(jpeg.encode_jpeg(img, 92))
        assert arr is not None and arr.shape == (40, 56, 3)
        # corrupt / unknown bytes fall through to the fake (None)
        assert _try_decode_image(b"\xff\xd8\xffgarbage") is None

    def test_decode_images_real_jpeg_dimensions(self, spark):
        """A JPEG payload flowing through the Spark decode_images stage
        reports its TRUE dimensions, not the digest-derived fake."""
        from mentor_rdf_parsers_spark.operators.multimodal import (
            MEDIA,
            decode_images,
        )

        payload = jpeg.encode_jpeg(_gradient_rgb(40, 56), 92)
        media = spark.createDataFrame(
            [("m1", "image", bytearray(payload), "image/jpeg")], MEDIA)
        row = decode_images(media).collect()[0]
        assert (row["width"], row["height"]) == (56, 40)
