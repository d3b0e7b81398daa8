"""functions/flac.py — FLAC is lossless, so every encoder/decoder
pairing must round-trip bit-exactly; corruption must raise (CRCs are
verified), never decode silently."""

from __future__ import annotations

import numpy as np
import pytest

from mentor_rdf_parsers_spark.functions import flac


def _tone(n: int, bits: int = 16, channels: int = 1,
          seed: int = 7) -> np.ndarray:
    """Sine + noise: smooth enough that fixed/LPC predictors earn
    small residuals, noisy enough to exercise Rice quotients."""
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    amp = (1 << (bits - 2)) - 1
    out = []
    for c in range(channels):
        s = amp * np.sin(2 * np.pi * (220 + 110 * c) * t / 8000.0)
        s = s + rng.integers(-50, 51, n)
        out.append(np.clip(s, -(1 << (bits - 1)),
                           (1 << (bits - 1)) - 1).astype(np.int64))
    return out[0] if channels == 1 else np.stack(out, axis=1)


class TestRoundtrip:
    @pytest.mark.parametrize("mode", ["verbatim", "constant", "fixed",
                                      "lpc"])
    def test_mono_subframe_modes(self, mode):
        if mode == "constant":
            x = np.full(1000, -1234, np.int64)
        else:
            x = _tone(1000)
        data = flac.encode_flac(x, rate=8000, mode=mode, block_size=256)
        out, rate = flac.decode_flac(data)
        assert rate == 8000
        np.testing.assert_array_equal(out[:, 0], x)

    @pytest.mark.parametrize("chmode", ["independent", "left_side",
                                        "right_side", "mid_side"])
    def test_stereo_decorrelation(self, chmode):
        x = _tone(700, channels=2)
        data = flac.encode_flac(x, rate=44100, mode="verbatim",
                                channel_mode=chmode, block_size=192)
        out, rate = flac.decode_flac(data)
        np.testing.assert_array_equal(out, x)

    def test_stereo_lpc_mid_side(self):
        """The realistic layout: LPC subframes on mid/side channels."""
        x = _tone(2000, channels=2, seed=3)
        data = flac.encode_flac(x, mode="lpc", channel_mode="mid_side",
                                block_size=512)
        out, _ = flac.decode_flac(data)
        np.testing.assert_array_equal(out, x)

    @pytest.mark.parametrize("bits", [8, 16, 24])
    def test_sample_widths(self, bits):
        x = _tone(500, bits=bits)
        data = flac.encode_flac(x, bits=bits, mode="fixed", block_size=250)
        out, _ = flac.decode_flac(data)
        np.testing.assert_array_equal(out[:, 0], x)

    def test_wasted_bits(self):
        x = (_tone(400) >> 3) << 3  # 3 guaranteed-zero low bits
        data = flac.encode_flac(x, mode="verbatim", wasted=3,
                                block_size=200)
        out, _ = flac.decode_flac(data)
        np.testing.assert_array_equal(out[:, 0], x)

    def test_partial_final_block(self):
        x = _tone(1000)
        data = flac.encode_flac(x, mode="fixed", block_size=300)  # 300*3+100
        out, _ = flac.decode_flac(data)
        np.testing.assert_array_equal(out[:, 0], x)


class TestProbe:
    def test_streaminfo_fields(self):
        x = _tone(1234, channels=2)
        data = flac.encode_flac(x, rate=48000, bits=16)
        info = flac.probe_streaminfo(data)
        assert info["sample_rate"] == 48000
        assert info["channels"] == 2
        assert info["bits"] == 16
        assert info["total_samples"] == 1234

    def test_float_path_shape(self):
        x = _tone(800, channels=2)
        dur, s, rate = flac.decode_flac_float(flac.encode_flac(x, rate=8000))
        assert dur == 100  # 800 / 8000 Hz
        assert s.dtype == np.float32 and s.ndim == 1 and len(s) == 800
        assert float(np.abs(s).max()) <= 1.0

    def test_not_flac(self):
        assert flac.probe_streaminfo(b"OggS....") is None
        with pytest.raises(ValueError, match="STREAMINFO"):
            flac.decode_flac(b"RIFF....WAVE")


class TestCorruption:
    def test_frame_crc_detects_bitflip(self):
        x = _tone(600)
        data = bytearray(flac.encode_flac(x, mode="fixed", block_size=300))
        # flip a bit deep in the first frame's entropy section
        data[len(data) // 2] ^= 0x10
        with pytest.raises(ValueError):
            flac.decode_flac(bytes(data))

    def test_header_crc8_detects_corruption(self):
        x = _tone(300)
        data = bytearray(flac.encode_flac(x, block_size=300))
        info = flac.probe_streaminfo(bytes(data))
        off = flac._frames_offset(bytes(data))
        data[off + 2] ^= 0x04  # inside the frame header, before CRC-8
        with pytest.raises(ValueError):
            flac.decode_flac(bytes(data))
        assert info is not None  # probe untouched by frame corruption

    def test_truncation_raises(self):
        x = _tone(500)
        data = flac.encode_flac(x, block_size=500)
        with pytest.raises(ValueError):
            flac.decode_flac(data[: len(data) - 7])


class TestMultimodalDispatch:
    def test_audio_path_decodes_flac(self):
        from mentor_rdf_parsers_spark.operators.multimodal import (
            _try_decode_audio,
        )

        x = _tone(1600, channels=2)
        dur, s, rate = _try_decode_audio(
            flac.encode_flac(x, rate=16000, mode="lpc",
                             channel_mode="mid_side"))
        assert (dur, rate) == (100, 16000)
        expected = (x.astype(np.float32) / 32768.0).mean(axis=1)
        np.testing.assert_allclose(s, expected, atol=1e-6)

    def test_corrupt_flac_falls_to_probe(self):
        from mentor_rdf_parsers_spark.operators.multimodal import (
            _try_decode_audio,
        )

        data = bytearray(flac.encode_flac(_tone(300), block_size=300))
        data[-10] ^= 0xFF
        assert _try_decode_audio(bytes(data)) is None
