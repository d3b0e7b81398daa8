"""MJPEG-in-AVI frame sampling and IMA-ADPCM audio decode (round 5).

The multimodal frame-sampling / audio-feature operators gained REAL
paths for the two formats decodable without external codecs: MJPEG AVI
(RIFF walk + the baseline-JPEG codec) and IMA ADPCM WAV (published
table-driven decode). Non-matching payloads must keep the deterministic
stub behavior the earlier rounds pinned down.
"""

import numpy as np
import pytest

from mentor_rdf_parsers_spark.functions import adpcm, avi, jpeg
from mentor_rdf_parsers_spark.operators.multimodal import MEDIA


def _mjpeg_fixture(n_frames=8, w=24, h=16):
    frames = [
        jpeg.encode_jpeg(
            np.full((h, w, 3), [10 + i * 25, 60, 200 - i * 20], dtype=np.uint8))
        for i in range(n_frames)
    ]
    return frames, avi.encode_mjpeg_avi(frames, w, h, fps=10)


class TestAviCodec:
    def test_roundtrip_and_header(self):
        frames, payload = _mjpeg_fixture()
        assert avi.is_avi(payload)
        info = avi.avi_info(payload)
        assert (info["width"], info["height"]) == (24, 16)
        assert info["total_frames"] == 8 and info["fps"] == 10.0
        got = list(avi.iter_frames(payload))
        assert got == frames  # byte-identical frame payloads
        # every frame is independently decodable by the jpeg codec
        arr = jpeg.decode_jpeg(got[3])
        assert arr.shape == (16, 24, 3)
        # solid-color frame: JPEG is lossy but a flat field stays close
        assert abs(int(arr[0, 0, 0]) - 85) < 8

    def test_rejections_named(self):
        with pytest.raises(ValueError, match="not a RIFF/AVI"):
            list(avi.iter_frames(b"0123456789" * 8))
        # a frame chunk that is not JPEG → rejected, not mis-decoded
        bad = avi.encode_mjpeg_avi([b"\xff\xd8fakejpeg"], 8, 8)
        bad = bad.replace(b"\xff\xd8fakejpeg", b"notajpeg!")
        with pytest.raises(ValueError, match="non-JPEG frame"):
            list(avi.iter_frames(bad))
        assert not avi.is_avi(b"RIFF\x04\x00\x00\x00WAVE")


class TestAdpcmCodec:
    def test_roundtrip_tone(self):
        t = np.arange(16000, dtype=np.float64) / 16000
        sig = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
        wav = adpcm.encode_ima_wav(sig, rate=16000)
        assert adpcm.is_ima_adpcm_wav(wav)
        # genuinely compressed: ~4 bits/sample vs PCM's 16
        assert len(wav) < len(sig) * 2 / 3
        dec, rate = adpcm.decode_ima_wav(wav)
        assert rate == 16000 and len(dec) == len(sig)  # fact-chunk trim
        assert float(np.sqrt(np.mean((dec - sig) ** 2))) < 0.02

    def test_block_independence(self):
        # each block header carries (predictor, step index) at block
        # START — decoding must not drift across block boundaries
        rng = np.random.default_rng(3)
        sig = rng.uniform(-0.3, 0.3, 5000).astype(np.float32)
        dec, _ = adpcm.decode_ima_wav(adpcm.encode_ima_wav(sig, rate=8000))
        assert len(dec) == len(sig)
        # error stays bounded in the LAST block, not just the first
        tail = slice(len(sig) - 500, len(sig))
        assert float(np.sqrt(np.mean((dec[tail] - sig[tail]) ** 2))) < 0.15

    def test_stereo_roundtrip(self):
        # stereo: per-channel state headers + alternating 4-byte groups;
        # channels carry DIFFERENT signals so any interleave mistake
        # shows up as cross-channel bleed, not just extra noise
        t = np.arange(12000, dtype=np.float64) / 16000
        left = 0.5 * np.sin(2 * np.pi * 440 * t)
        right = 0.35 * np.sin(2 * np.pi * 1031 * t)
        sig = np.stack([left, right], axis=1).astype(np.float32)
        wav = adpcm.encode_ima_wav(sig, rate=16000)
        assert adpcm.is_ima_adpcm_wav(wav)
        dec, rate = adpcm.decode_ima_wav(wav)
        assert rate == 16000 and dec.shape == sig.shape
        for c in range(2):
            err = float(np.sqrt(np.mean((dec[:, c] - sig[:, c]) ** 2)))
            assert err < 0.03, (c, err)
        # each tone must land in its own channel, not bleed across
        assert float(np.corrcoef(dec[:, 1], right)[0, 1]) > 0.99
        assert abs(float(np.corrcoef(dec[:, 1], left)[0, 1])) < 0.05

    def test_stereo_truncation_and_corruption_fail_closed(self):
        from mentor_rdf_parsers_spark.operators.multimodal import (
            _try_decode_audio,
        )

        rng = np.random.default_rng(5)
        sig = rng.uniform(-0.4, 0.4, (2000, 2)).astype(np.float32)
        p = adpcm.encode_ima_wav(sig, rate=8000)
        for cut in range(12, len(p), max(1, len(p) // 30)):
            try:
                adpcm.decode_ima_wav(p[:cut])
            except ValueError:
                pass
            _try_decode_audio(p[:cut])  # dispatch never raises
        for _ in range(30):
            q = bytearray(p)
            for _ in range(4):
                q[rng.integers(0, len(q))] = rng.integers(0, 256)
            try:
                adpcm.decode_ima_wav(bytes(q))
            except ValueError:
                pass
            _try_decode_audio(bytes(q))

    def test_variant_rejections_named(self):
        sig = np.zeros(100, dtype=np.float32)
        wav = bytearray(adpcm.encode_ima_wav(sig))
        with pytest.raises(ValueError, match="not an IMA ADPCM"):
            adpcm.decode_ima_wav(b"RIFFxxxxWAVE")
        # flip channel count to an unsupported 3 in the fmt chunk
        fmt_off = wav.index(b"fmt ") + 8
        wav[fmt_off + 2] = 3
        with pytest.raises(ValueError, match="3-channel"):
            adpcm.decode_ima_wav(bytes(wav))


class TestOperatorIntegration:
    def test_sample_frames_real_avi_path(self, spark):
        from mentor_rdf_parsers_spark.operators.multimodal import sample_frames

        frames, payload = _mjpeg_fixture()
        rows = [("v_avi", "video", payload, "video/x-msvideo"),
                ("v_stub", "video", b"0123456789" * 8, "video/mp4")]
        media = spark.createDataFrame(rows, MEDIA)
        out = sample_frames(media, every_n=2, max_frames=3).collect()
        real = sorted((r for r in out if r["media_id"] == "v_avi"),
                      key=lambda r: r["frame_idx"])
        # every 2nd source frame, source indices preserved
        assert [r["frame_idx"] for r in real] == [0, 2, 4]
        assert [bytes(r["payload"]) for r in real] == [
            frames[0], frames[2], frames[4]]
        # sampled frames decode downstream with the jpeg codec
        assert jpeg.decode_jpeg(bytes(real[1]["payload"])).shape == (16, 24, 3)
        # non-AVI payload keeps the r1-pinned stub behavior
        stub = [r for r in out if r["media_id"] == "v_stub"]
        assert sorted(r["frame_idx"] for r in stub) == [0, 1, 2]

    def test_audio_features_real_adpcm_path(self, spark):
        from mentor_rdf_parsers_spark.operators.multimodal import (
            extract_audio_features,
        )

        t = np.arange(8000, dtype=np.float64) / 8000
        sig = (0.4 * np.sin(2 * np.pi * 200 * t)).astype(np.float32)
        payload = adpcm.encode_ima_wav(sig, rate=8000)
        rows = [("a_ima", "audio", payload, "audio/wav"),
                ("a_stub", "audio", b"RIFFfakeaudio" * 16, "audio/mpeg")]
        media = spark.createDataFrame(rows, MEDIA)
        out = {r["media_id"]: r
               for r in extract_audio_features(media, bytes_per_ms=16).collect()}
        # true duration from the decoded sample count: 8000 @ 8 kHz = 1 s
        assert out["a_ima"]["duration_ms"] == 1000
        # real features: a 0.4-amplitude sine has RMS ~0.283 → feat0 ~ -0.43
        assert abs(out["a_ima"]["features"][0] - (0.283 * 2 - 1)) < 0.05
        # non-WAV bytes keep the stub duration (len // bytes_per_ms)
        assert out["a_stub"]["duration_ms"] == (13 * 16) // 16
