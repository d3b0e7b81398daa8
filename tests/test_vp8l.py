"""VP8L (WebP lossless) codec: round trips over every coding feature,
a hand-built stream pinning the bit layout, and corruption fuzz.

The encoder and decoder are independent implementations of RFC 9649's
stream (shared constants only), so bit-exact round trips across
transforms, cache sizes, and prefix-code shapes exercise both sides of
every code path.
"""

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mentor_rdf_parsers_spark.functions import vp8l
from mentor_rdf_parsers_spark.functions.vp8l import (
    _BitWriter, decode_vp8l, decode_webp, encode_webp, _tokenize,
)

rng = np.random.default_rng(20260818)


def _rt(arr, **kw):
    data = encode_webp(arr, **kw)
    out = decode_webp(data)
    assert out.shape == (arr.shape[0], arr.shape[1],
                         out.shape[2]), "dims survive"
    return data, out


class TestRoundTrips:
    def test_random_rgb_literals(self):
        a = rng.integers(0, 256, (13, 17, 3), dtype=np.uint8)
        _, out = _rt(a, palette="off")
        assert (out == a).all()

    def test_grayscale_input_expands(self):
        a = rng.integers(0, 256, (9, 11), dtype=np.uint8)
        _, out = _rt(a, palette="off")
        assert out.shape == (9, 11, 3)
        assert (out == a[:, :, None]).all()

    def test_solid_color_simple_codes(self):
        a = np.full((9, 9, 3), 200, np.uint8)
        data, out = _rt(a, palette="off", use_lz77=False)
        assert (out == a).all()
        assert len(data) < 60, "simple prefix codes stay tiny"

    def test_lz77_row_copies(self):
        row = rng.integers(0, 256, (1, 31, 3), dtype=np.uint8)
        a = np.tile(row, (24, 1, 1))
        data, out = _rt(a, palette="off")
        assert (out == a).all()
        # the repeated rows must come out as backward references
        pix = [int(p) for p in
               ((a[:, :, 0].astype(np.uint32) << 16)
                | (a[:, :, 1].astype(np.uint32) << 8)
                | a[:, :, 2] | 0xFF000000).ravel()]
        tokens = _tokenize(pix, 31, cache_bits=0, use_lz77=True)
        kinds = {t[0] for t in tokens}
        assert "copy" in kinds

    def test_plane_distance_codes_used(self):
        # distance == xsize is plane code 1 ((0, 1)); distance == 1 is
        # plane code 2 ((1, 0)) — both must map through the 2D table
        pix = [0xFF000000 | i for i in range(8)] * 8  # rows repeat
        tokens = _tokenize(pix, 8, cache_bits=0, use_lz77=True)
        copies = [t for t in tokens if t[0] == "copy"]
        assert copies and all(c[2] <= 120 for c in copies)

    def test_color_cache(self):
        a = (rng.integers(0, 4, (20, 20, 3), dtype=np.uint8) * 80)
        for bits in (1, 4, 11):
            _, out = _rt(a, palette="off", color_cache_bits=bits)
            assert (out == a).all()

    def test_cache_tokens_emitted(self):
        pix = [0xFF112233, 0xFF445566] * 50
        tokens = _tokenize(pix, 10, cache_bits=8, use_lz77=False)
        assert any(t[0] == "cache" for t in tokens)

    def test_subtract_green(self):
        a = rng.integers(0, 256, (11, 12, 3), dtype=np.uint8)
        _, out = _rt(a, palette="off", subtract_green=True)
        assert (out == a).all()

    @pytest.mark.parametrize("mode", range(14))
    def test_every_predictor_mode(self, mode):
        a = np.cumsum(rng.integers(0, 5, (16, 16, 3)), axis=1) \
            .astype(np.uint8)
        _, out = _rt(a, palette="off", predictor=mode, pred_bits=3)
        assert (out == a).all(), f"predictor {mode}"

    def test_predictor_block_sizes(self):
        a = rng.integers(0, 256, (17, 19, 3), dtype=np.uint8)
        for bits in (2, 5, 9):
            _, out = _rt(a, palette="off", predictor=11, pred_bits=bits)
            assert (out == a).all()

    def test_color_transform(self):
        a = rng.integers(0, 256, (14, 15, 3), dtype=np.uint8)
        for cte in ((0x40, 0x20, 0x10), (0x90, 0xFF, 0x80), (1, 2, 3)):
            _, out = _rt(a, palette="off", color_cte=cte)
            assert (out == a).all(), f"cte {cte}"

    def test_stacked_transforms(self):
        a = np.cumsum(rng.integers(0, 7, (16, 16, 3)), axis=0) \
            .astype(np.uint8)
        _, out = _rt(a, palette="off", subtract_green=True, predictor=7,
                     color_cte=(8, 16, 24))
        assert (out == a).all()

    @pytest.mark.parametrize("n_colors", [2, 3, 4, 9, 16, 40, 250])
    def test_palette_with_bundling(self, n_colors):
        vals = rng.integers(0, 256, (n_colors, 3), dtype=np.uint8)
        idx = rng.integers(0, n_colors, (15, 23))
        a = vals[idx]
        _, out = _rt(a)  # palette='auto' engages
        assert (out == a).all()

    def test_single_color_auto_palette(self):
        # 1-entry palette: 8 bundled indices per packed byte
        a = np.full((5, 11, 3), 123, np.uint8)
        _, out = _rt(a)
        assert (out == a).all()

    def test_palette_width_not_multiple_of_bundle(self):
        # 2 colors → 8 indices per packed byte; width 13 exercises the
        # partial trailing bundle
        a = (rng.integers(0, 2, (7, 13, 3), dtype=np.uint8) * 255)
        _, out = _rt(a)
        assert (out == a).all()

    def test_meta_prefix_groups(self):
        a = rng.integers(0, 256, (33, 37, 3), dtype=np.uint8)
        _, out = _rt(a, palette="off", meta_bits=3)
        assert (out == a).all()

    def test_alpha_channel(self):
        a = rng.integers(0, 256, (8, 8, 4), dtype=np.uint8)
        a[0, 0, 3] = 7  # force a non-opaque pixel
        _, out = _rt(a, palette="off")
        assert out.shape == (8, 8, 4) and (out == a).all()

    def test_opaque_alpha_returns_rgb(self):
        a = np.dstack([rng.integers(0, 256, (6, 6, 3), dtype=np.uint8),
                       np.full((6, 6), 255, np.uint8)])
        _, out = _rt(a, palette="off")
        assert out.shape == (6, 6, 3) and (out == a[:, :, :3]).all()

    def test_1x1_and_single_row(self):
        for shape in ((1, 1, 3), (1, 40, 3), (40, 1, 3)):
            a = rng.integers(0, 256, shape, dtype=np.uint8)
            _, out = _rt(a, palette="off")
            assert (out == a).all()


class TestBitLayout:
    def test_hand_built_single_pixel_stream(self):
        """Pin the wire format independent of the encoder: header bits,
        transform/cache/meta flags, and five simple prefix codes."""
        bw = _BitWriter()
        bw.write(0, 14)   # width - 1
        bw.write(0, 14)   # height - 1
        bw.write(0, 1)    # alpha unused
        bw.write(0, 3)    # version
        bw.write(0, 1)    # no transforms
        bw.write(0, 1)    # no color cache
        bw.write(0, 1)    # no meta prefix codes
        for sym in (0x42, 0xFF, 0x07, 0xFF, 0x00):  # G R B A dist
            bw.write(1, 1)   # simple code
            bw.write(0, 1)   # one symbol
            bw.write(1, 1)   # 8-bit symbol
            bw.write(sym, 8)
        body = bytes([0x2F]) + bw.getvalue()
        out = decode_vp8l(body)
        assert out.shape == (1, 1, 3)
        assert tuple(out[0, 0]) == (0xFF, 0x42, 0x07)  # R G B

    def test_header_dimensions(self):
        a = rng.integers(0, 256, (3, 300, 3), dtype=np.uint8)
        data = encode_webp(a, palette="off")
        from mentor_rdf_parsers_spark.functions.imagex import probe_webp
        probe = probe_webp(data)
        assert probe == {"width": 300, "height": 3, "codec": "vp8l"}

    def test_distance_map_head(self):
        # the verified prefix of the spec's 120-entry plane-code table
        assert vp8l._DIST_MAP[:16] == [
            (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2),
            (-1, 2), (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0),
            (1, 3), (-1, 3)]
        assert len(set(vp8l._DIST_MAP)) == 120


@st.composite
def _image_and_config(draw):
    h = draw(st.integers(1, 12))
    w = draw(st.integers(1, 12))
    channels = draw(st.sampled_from([3, 4]))
    # low-cardinality palettes and full-range literals both arise
    lo_card = draw(st.booleans())
    seed = draw(st.integers(0, 2**31 - 1))
    r = np.random.default_rng(seed)
    if lo_card:
        vals = r.integers(0, 256, (draw(st.integers(1, 6)), channels),
                          dtype=np.uint8)
        arr = vals[r.integers(0, len(vals), (h, w))]
    else:
        arr = r.integers(0, 256, (h, w, channels), dtype=np.uint8)
    cfg = {
        "palette": draw(st.sampled_from(["auto", "off"])),
        "color_cache_bits": draw(st.sampled_from([0, 1, 3, 8])),
        "use_lz77": draw(st.booleans()),
    }
    if cfg["palette"] == "off":
        if draw(st.booleans()):
            cfg["subtract_green"] = True
        mode = draw(st.integers(-1, 13))
        if mode >= 0:
            cfg["predictor"] = mode
            cfg["pred_bits"] = draw(st.integers(2, 6))
        if draw(st.booleans()):
            cfg["color_cte"] = (draw(st.integers(0, 255)),
                                draw(st.integers(0, 255)),
                                draw(st.integers(0, 255)))
        if draw(st.booleans()):
            cfg["meta_bits"] = draw(st.integers(2, 4))
    return arr, cfg


class TestFuzz:
    @settings(max_examples=120, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(_image_and_config())
    def test_any_config_roundtrips(self, case):
        """Every encoder configuration × random content must decode
        bit-exactly — this walks prefix-code shapes (simple/normal/
        const), cache interactions, transform stacking, and bundling
        widths the example tests can't enumerate."""
        arr, cfg = case
        out = decode_webp(encode_webp(arr, **cfg))
        expect = arr if arr.shape[2] == 3 or (arr[:, :, 3] != 255).any() \
            else arr[:, :, :3]
        assert out.shape == expect.shape
        assert (out == expect).all()


class TestImagePathDispatch:
    def test_try_decode_image_webp(self):
        from mentor_rdf_parsers_spark.operators.multimodal import (
            _try_decode_image,
        )

        a = rng.integers(0, 256, (10, 14, 3), dtype=np.uint8)
        out = _try_decode_image(encode_webp(a, palette="off"))
        assert out is not None and (out == a).all()

    def test_lossy_webp_falls_to_stub_path(self):
        from mentor_rdf_parsers_spark.operators.multimodal import (
            _try_decode_image,
        )

        body = b"\x00\x00\x00\x9d\x01\x2a\x10\x00\x10\x00"
        chunk = b"VP8 " + len(body).to_bytes(4, "little") + body
        data = (b"RIFF" + (4 + len(chunk)).to_bytes(4, "little")
                + b"WEBP" + chunk)
        assert _try_decode_image(data) is None  # named stub boundary

    def test_probe_agrees_with_decode(self):
        from mentor_rdf_parsers_spark.functions.imagex import probe_webp

        a = rng.integers(0, 256, (21, 34, 3), dtype=np.uint8)
        data = encode_webp(a)
        probe = probe_webp(data)
        out = decode_webp(data)
        assert (probe["width"], probe["height"]) == (34, 21)
        assert out.shape[:2] == (21, 34)


class TestRobustness:
    def test_lossy_vp8_rejected_by_name(self):
        body = b"\x00\x00\x00\x9d\x01\x2a\x10\x00\x10\x00"
        chunk = b"VP8 " + len(body).to_bytes(4, "little") + body
        data = (b"RIFF" + (4 + len(chunk)).to_bytes(4, "little")
                + b"WEBP" + chunk)
        with pytest.raises(NotImplementedError, match="VP8"):
            decode_webp(data)

    def test_not_webp(self):
        with pytest.raises(ValueError):
            decode_webp(b"RIFF\x00\x00\x00\x00WAVE" + b"\x00" * 8)

    def test_truncation_never_crashes(self):
        a = rng.integers(0, 256, (9, 9, 3), dtype=np.uint8)
        data = encode_webp(a, palette="off", color_cache_bits=3)
        for cut in range(12, len(data), 7):
            with pytest.raises((ValueError, NotImplementedError)):
                decode_webp(data[:cut])

    def test_bit_flips_decode_or_reject(self):
        a = rng.integers(0, 256, (9, 9, 3), dtype=np.uint8)
        data = bytearray(encode_webp(a, palette="off"))
        for pos in range(20, len(data), 5):
            flipped = bytearray(data)
            flipped[pos] ^= 0x40
            try:
                out = decode_webp(bytes(flipped))
                assert out.shape[0] == 9 and out.shape[1] == 9
            except (ValueError, NotImplementedError, IndexError):
                pass  # rejected, not crashed

    def test_oversize_guard(self):
        bw = _BitWriter()
        bw.write(16383, 14)
        bw.write(16383, 14)
        bw.write(0, 4)
        with pytest.raises(ValueError, match="too large"):
            decode_vp8l(bytes([0x2F]) + bw.getvalue() + b"\x00" * 8)
