"""functions/gif.py — pure-Python GIF codec (r5): LZW round trips,
interlace, animation with disposal, and the multimodal wiring.

The encoder quantizes to a fixed 6×7×6 palette grid, so any image
built FROM that grid round-trips exactly — the lossless oracle every
structural feature (interlace, sub-block splits, animation) is checked
against."""

from __future__ import annotations

import numpy as np
import pytest

from mentor_rdf_parsers_spark.functions import gif

_LR = np.linspace(0, 255, 6).astype(np.uint8)
_LG = np.linspace(0, 255, 7).astype(np.uint8)
_LB = np.linspace(0, 255, 6).astype(np.uint8)


def _grid_image(h, w, seed):
    rng = np.random.default_rng(seed)
    return np.stack([
        _LR[rng.integers(0, 6, (h, w))],
        _LG[rng.integers(0, 7, (h, w))],
        _LB[rng.integers(0, 6, (h, w))],
    ], axis=2)


class TestRoundTrip:
    def test_single_frame_exact(self):
        img = _grid_image(33, 47, 5)
        data = gif.encode_gif(img)
        assert gif.is_gif(data)
        np.testing.assert_array_equal(gif.decode_gif(data), img)

    def test_interlaced_exact(self):
        img = _grid_image(29, 31, 6)
        data = gif.encode_gif(img, interlace=True)
        np.testing.assert_array_equal(gif.decode_gif(data), img)

    def test_large_image_multi_subblock(self):
        """>255-byte LZW stream forces sub-block splitting; noise data
        also forces LZW table resets at 4096 codes."""
        img = _grid_image(120, 160, 7)
        np.testing.assert_array_equal(gif.decode_gif(gif.encode_gif(img)),
                                      img)

    def test_animation_frames_exact(self):
        frames = [_grid_image(21, 34, s) for s in range(4)]
        data = gif.encode_gif(frames, delay_cs=5)
        out = list(gif.decode_gif_frames(data))
        assert len(out) == 4
        for a, b in zip(out, frames):
            np.testing.assert_array_equal(a, b)

    def test_quantization_bounded(self):
        grad = np.stack(
            np.meshgrid(np.arange(64), np.arange(48), indexing="ij")
            + [np.full((64, 48), 100)], axis=2).astype(np.uint8)
        d = gif.decode_gif(gif.encode_gif(grad))
        assert np.abs(d.astype(int) - grad.astype(int)).max() <= 26

    def test_probe(self):
        data = gif.encode_gif([_grid_image(10, 20, 1)] * 3)
        assert gif.probe_gif(data) == {"width": 20, "height": 10,
                                       "n_frames": 3}
        assert gif.probe_gif(b"not a gif") is None

    def test_rejects_non_gif(self):
        assert not gif.is_gif(b"\x89PNG\r\n\x1a\n")
        with pytest.raises(ValueError):
            gif.decode_gif(b"plainly not a gif")

    def test_deferred_clear_stream(self):
        """Encoders may FREEZE the LZW table at 4096 codes instead of
        emitting a clear ('deferred clear'); the decoder must freeze in
        lockstep or every later code is misaligned."""
        rng = np.random.default_rng(21)
        h, w = 96, 128  # enough pixels to exhaust 4096 codes
        idx = rng.integers(0, 252, h * w).astype(np.uint8)

        # inline deferred-clear encoder: same as gif._lzw_encode but
        # freezes instead of clearing at 4096
        clear, eoi = 256, 257
        table = {bytes([c]): c for c in range(256)}
        next_code = eoi + 1
        width = 9
        out = bytearray()
        acc = nbits = 0

        def emit(code):
            nonlocal acc, nbits
            acc |= code << nbits
            nbits += width
            while nbits >= 8:
                out.append(acc & 0xFF)
                acc >>= 8
                nbits -= 8

        emit(clear)
        prev = b""
        for c in idx.tobytes():
            cur = prev + bytes([c])
            if cur in table:
                prev = cur
                continue
            emit(table[prev])
            if next_code < 4096:
                table[cur] = next_code
                if next_code == (1 << width) and width < 12:
                    width += 1
                next_code += 1
            prev = bytes([c])
        emit(table[prev])
        emit(eoi)
        if nbits:
            out.append(acc & 0xFF)
        assert next_code == 4096  # the deferred regime was actually hit

        decoded = gif._lzw_decode(8, bytes(out), h * w)
        np.testing.assert_array_equal(decoded, idx)

    def test_truncation_never_hangs(self):
        data = gif.encode_gif([_grid_image(16, 16, s) for s in range(2)])
        for cut in range(1, len(data), max(1, len(data) // 30)):
            try:
                list(gif.decode_gif_frames(data[:cut]))
            except (ValueError, IndexError):
                pass  # clean rejection is fine; hangs/other errors are not


class TestMultimodalWiring:
    def test_decode_image_path(self):
        from mentor_rdf_parsers_spark.operators.multimodal import (
            _probe_one,
            _try_decode_image,
        )

        img = _grid_image(18, 26, 9)
        data = gif.encode_gif([img, _grid_image(18, 26, 10)])
        arr = _try_decode_image(data)
        np.testing.assert_array_equal(arr, img)  # first frame
        p = _probe_one(data)
        assert (p["container"], p["codec"], p["width"], p["height"],
                p["n_frames"]) == ("gif", "gif", 26, 18, 2)

    def test_animated_gif_samples_as_video(self):
        from mentor_rdf_parsers_spark.functions import png
        from mentor_rdf_parsers_spark.operators.multimodal import (
            _try_sample_video,
        )

        frames = [_grid_image(14, 22, s) for s in range(6)]
        data = gif.encode_gif(frames)
        picked = _try_sample_video(data, 2, 3)
        assert [i for i, _ in picked] == [0, 2, 4]
        for (i, payload), src in zip(picked, frames[::2]):
            np.testing.assert_array_equal(png.decode_png(payload), src)
