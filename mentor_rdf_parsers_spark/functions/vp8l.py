"""Pure-Python VP8L (WebP lossless) codec: prefix-coded ARGB with
LZ77 backward references, color cache, and all four transforms
(predictor, color, subtract-green, color-indexing with pixel
bundling) — plus an encoder for fixtures/thumbnails/round-trips.

VP8L needs no external codec: it is canonical prefix codes (DEFLATE
convention: first-read bit is the code's MSB) over an LSB-first
bitstream, LZ77 with a 2D close-neighborhood distance map, and four
invertible pixel transforms — all per the public WebP Lossless
Bitstream Specification (RFC 9649).  WebP is the one modern web image
format the image path still lacked; lossy VP8 essence stays behind the
documented stub boundary (boolean arithmetic coding + loop filter — a
genuine video codec).

Decode cost model: the symbol loop is per-pixel Python with per-bit
prefix reads (a backward reference covers many pixels, so it's
sub-O(pixels) on typical screenshots); transform inverses are small
integer ops per pixel.  Fine for fixture/thumbnail/web-asset scale,
same boundary as functions/gif.py.

The 120-entry short-distance map is derived from the spec's generation
rule — the window dx ∈ [-7, 8], dy ∈ [0, 7] (120 pixels strictly
before the current one) ordered by (dx² + dy², |dx|, sign) — which
reproduces the spec table's verified prefix; the encoder only emits
codes through the same map, so round trips are exact by construction.

No reference-repo counterpart (task-brief multimodal requirement);
format per the public RFC 9649 specification.
"""

from __future__ import annotations

import struct
from typing import Optional

import numpy as np

_MAX_PIXELS = 1 << 26  # decode-side memory guard (64M pixels)
_MAX_CODE_LEN = 15
_CLC_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)


def _dist_map() -> list[tuple[int, int]]:
    pairs = [
        (dx, dy)
        for dy in range(8)
        for dx in range(-7, 9)
        if dy > 0 or dx > 0
    ]
    pairs.sort(key=lambda p: (p[0] * p[0] + p[1] * p[1], abs(p[0]), p[0] < 0))
    return pairs


_DIST_MAP = _dist_map()
assert len(_DIST_MAP) == 120 and _DIST_MAP[:4] == [(0, 1), (1, 0), (1, 1), (-1, 1)]


# ------------------------------------------------------------ bit I/O


class _BitReader:
    """LSB-first bit reader; reads past the end yield zeros but set
    ``overrun`` so the caller can reject truncated streams."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # next byte index
        self.buf = 0
        self.nbits = 0
        self.overrun = False

    def read(self, n: int) -> int:
        while self.nbits < n:
            if self.pos < len(self.data):
                self.buf |= self.data[self.pos] << self.nbits
                self.pos += 1
            else:
                self.overrun = True
            self.nbits += 8
        val = self.buf & ((1 << n) - 1)
        self.buf >>= n
        self.nbits -= n
        return val


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.buf = 0
        self.nbits = 0

    def write(self, val: int, n: int) -> None:
        self.buf |= (val & ((1 << n) - 1)) << self.nbits
        self.nbits += n
        while self.nbits >= 8:
            self.out.append(self.buf & 0xFF)
            self.buf >>= 8
            self.nbits -= 8

    def getvalue(self) -> bytes:
        if self.nbits:
            self.out.append(self.buf & 0xFF)
            self.buf = 0
            self.nbits = 0
        return bytes(self.out)


# ------------------------------------------------- prefix-code decode


class _PrefixCode:
    """Canonical prefix code. ``const`` (single-symbol) codes consume
    zero bits; otherwise codes are read MSB-first (DEFLATE convention)
    bit by bit against a {(length, code): symbol} map."""

    __slots__ = ("const", "table")

    def __init__(self, const: Optional[int], table: Optional[dict]):
        self.const = const
        self.table = table

    @classmethod
    def from_lengths(cls, lengths: list[int]) -> "_PrefixCode":
        used = [(s, l) for s, l in enumerate(lengths) if l > 0]
        if not used:
            raise ValueError("VP8L: prefix code with no symbols")
        if len(used) == 1:
            return cls(used[0][0], None)
        kraft = sum(1 << (_MAX_CODE_LEN - l) for _, l in used)
        if kraft != 1 << _MAX_CODE_LEN:
            raise ValueError("VP8L: incomplete/oversubscribed prefix code")
        table: dict[tuple[int, int], int] = {}
        code = 0
        for length in range(1, _MAX_CODE_LEN + 1):
            for sym, l in used:
                if l == length:
                    table[(length, code)] = sym
                    code += 1
            code <<= 1
        return cls(None, table)

    def read(self, br: _BitReader) -> int:
        if self.const is not None:
            return self.const
        code = 0
        for length in range(1, _MAX_CODE_LEN + 1):
            code = (code << 1) | br.read(1)
            sym = self.table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("VP8L: invalid prefix code in stream")


def _read_prefix_code(br: _BitReader, alphabet_size: int) -> _PrefixCode:
    if br.read(1):  # simple code: 1 or 2 literal symbols
        num_symbols = br.read(1) + 1
        first_8bit = br.read(1)
        sym0 = br.read(8 if first_8bit else 1)
        if num_symbols == 1:
            return _PrefixCode(sym0, None)
        sym1 = br.read(8)
        # first-read symbol takes code 0, second takes code 1
        return _PrefixCode(None, {(1, 0): sym0, (1, 1): sym1})
    num_clc = 4 + br.read(4)
    clc_lengths = [0] * len(_CLC_ORDER)
    for i in range(num_clc):
        clc_lengths[_CLC_ORDER[i]] = br.read(3)
    clc = _PrefixCode.from_lengths(clc_lengths)
    if br.read(1):  # explicit max_symbol
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths: list[int] = []
    prev_len = 8
    while len(lengths) < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        s = clc.read(br)
        if s < 16:
            lengths.append(s)
            if s:
                prev_len = s
        else:
            if s == 16:
                repeat, fill = 3 + br.read(2), prev_len
            elif s == 17:
                repeat, fill = 3 + br.read(3), 0
            else:
                repeat, fill = 11 + br.read(7), 0
            if len(lengths) + repeat > alphabet_size:
                raise ValueError("VP8L: code-length repeat overflows alphabet")
            lengths.extend([fill] * repeat)
    lengths.extend([0] * (alphabet_size - len(lengths)))
    return _PrefixCode.from_lengths(lengths)


def _lz77_value(br: _BitReader, prefix: int) -> int:
    """Length/distance prefix decoding: codes 0-3 are the values 1-4;
    higher codes carry (prefix-2)>>1 extra bits."""
    if prefix < 4:
        return prefix + 1
    extra_bits = (prefix - 2) >> 1
    offset = (2 + (prefix & 1)) << extra_bits
    return offset + br.read(extra_bits) + 1


# -------------------------------------------------- pixel arithmetic

_MASK_LO = 0x00FF00FF
_MASK_HI = 0xFF00FF00


def _add_pixels(a: int, b: int) -> int:
    """Per-channel (a + b) mod 256 on packed ARGB ints."""
    lo = ((a & _MASK_LO) + (b & _MASK_LO)) & _MASK_LO
    hi = ((a & _MASK_HI) + (b & _MASK_HI)) & _MASK_HI
    return lo | hi


def _average2(a: int, b: int) -> int:
    return (((a ^ b) & 0xFEFEFEFE) >> 1) + (a & b)


def _clip255(v: int) -> int:
    return 0 if v < 0 else 255 if v > 255 else v


def _clamp_add_sub_full(a: int, b: int, c: int) -> int:
    out = 0
    for shift in (24, 16, 8, 0):
        out |= _clip255(((a >> shift) & 0xFF) + ((b >> shift) & 0xFF)
                        - ((c >> shift) & 0xFF)) << shift
    return out


def _clamp_add_sub_half(a: int, b: int, c: int) -> int:
    ave = _average2(a, b)
    out = 0
    for shift in (24, 16, 8, 0):
        av = (ave >> shift) & 0xFF
        d = av - ((c >> shift) & 0xFF)
        # C-style truncation toward zero, per the spec's (a - b) / 2
        half = -((-d) >> 1) if d < 0 else d >> 1
        out |= _clip255(av + half) << shift
    return out


def _select(t: int, l: int, tl: int) -> int:
    diff = 0
    for shift in (24, 16, 8, 0):
        tc = (t >> shift) & 0xFF
        lc = (l >> shift) & 0xFF
        tlc = (tl >> shift) & 0xFF
        diff += abs(lc - tlc) - abs(tc - tlc)
    return t if diff <= 0 else l


def _predict(mode: int, l: int, t: int, tl: int, tr: int) -> int:
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return l
    if mode == 2:
        return t
    if mode == 3:
        return tr
    if mode == 4:
        return tl
    if mode == 5:
        return _average2(_average2(l, tr), t)
    if mode == 6:
        return _average2(l, tl)
    if mode == 7:
        return _average2(l, t)
    if mode == 8:
        return _average2(tl, t)
    if mode == 9:
        return _average2(t, tr)
    if mode == 10:
        return _average2(_average2(l, tl), _average2(t, tr))
    if mode == 11:
        return _select(t, l, tl)
    if mode == 12:
        return _clamp_add_sub_full(l, t, tl)
    if mode == 13:
        return _clamp_add_sub_half(l, t, tl)
    raise ValueError(f"VP8L: predictor mode {mode} out of range")


def _int8(v: int) -> int:
    return v - 256 if v >= 128 else v


def _ct_delta(t: int, c: int) -> int:
    return (_int8(t) * _int8(c)) >> 5  # arithmetic shift, per spec


# -------------------------------------------------- transform inverses


def _inv_predictor(pix: list[int], w: int, h: int, size_bits: int,
                   modes: list[int], mw: int) -> None:
    for y in range(h):
        row = y * w
        mrow = (y >> size_bits) * mw
        for x in range(w):
            i = row + x
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = pix[i - 1]
            elif x == 0:
                pred = pix[i - w]
            else:
                mode = (modes[mrow + (x >> size_bits)] >> 8) & 0xFF
                t = pix[i - w]
                # rightmost column: TR wraps to the first pixel of the
                # current row (linear-memory artifact, normative)
                tr = pix[i - w + 1]
                pred = _predict(mode, pix[i - 1], t, pix[i - w - 1], tr)
            pix[i] = _add_pixels(pix[i], pred)


def _inv_color_transform(pix: list[int], w: int, h: int, size_bits: int,
                         ctes: list[int], mw: int) -> None:
    for y in range(h):
        row = y * w
        mrow = (y >> size_bits) * mw
        for x in range(w):
            i = row + x
            cte = ctes[mrow + (x >> size_bits)]
            red_to_blue = (cte >> 16) & 0xFF
            green_to_blue = (cte >> 8) & 0xFF
            green_to_red = cte & 0xFF
            p = pix[i]
            g = (p >> 8) & 0xFF
            r = ((p >> 16) & 0xFF) + _ct_delta(green_to_red, g) & 0xFF
            b = (p & 0xFF) + _ct_delta(green_to_blue, g)
            b = (b + _ct_delta(red_to_blue, r)) & 0xFF
            pix[i] = (p & 0xFF00FF00) | (r << 16) | b


def _inv_subtract_green(pix: list[int]) -> None:
    for i, p in enumerate(pix):
        g = (p >> 8) & 0xFF
        r = ((p >> 16) & 0xFF) + g & 0xFF
        b = (p & 0xFF) + g & 0xFF
        pix[i] = (p & 0xFF00FF00) | (r << 16) | b


def _inv_palette(pix: list[int], w: int, h: int, palette: list[int],
                 width_bits: int) -> list[int]:
    """Packed-index image (green channel) → full-width paletted pixels."""
    if width_bits == 0:
        out = []
        for p in pix:
            idx = (p >> 8) & 0xFF
            if idx >= len(palette):
                raise ValueError("VP8L: palette index out of range")
            out.append(palette[idx])
        return out
    per = 1 << width_bits  # source pixels per packed pixel
    bits = 8 >> width_bits  # bits per index
    mask = (1 << bits) - 1
    packed_w = len(pix) // h
    out = [0] * (w * h)
    for y in range(h):
        src_row = y * packed_w
        dst_row = y * w
        for x in range(w):
            g = (pix[src_row + (x >> width_bits)] >> 8) & 0xFF
            idx = (g >> ((x & (per - 1)) * bits)) & mask
            if idx >= len(palette):
                raise ValueError("VP8L: palette index out of range")
            out[dst_row + x] = palette[idx]
    return out


# ------------------------------------------------------------- decode


def _read_transforms(br: _BitReader, xsize: int, ysize: int):
    """Read the level-0 transform list; returns (transforms, spatial
    xsize) — a color-indexing transform shrinks the width every later
    read uses (bundled sub-8-bit indices)."""
    transforms = []
    seen = set()
    while br.read(1):
        ttype = br.read(2)
        if ttype in seen:
            raise ValueError("VP8L: duplicate transform")
        seen.add(ttype)
        if ttype == 2:  # subtract green
            transforms.append(("subgreen",))
        elif ttype in (0, 1):  # predictor / color
            size_bits = br.read(3) + 2
            mw = (xsize + (1 << size_bits) - 1) >> size_bits
            mh = (ysize + (1 << size_bits) - 1) >> size_bits
            sub = _decode_image_stream(br, mw, mh, False)
            kind = "pred" if ttype == 0 else "color"
            transforms.append((kind, size_bits, sub, mw, xsize))
        elif ttype == 3:  # color indexing
            n_colors = br.read(8) + 1
            raw = _decode_image_stream(br, n_colors, 1, False)
            palette = []
            prev = 0
            for p in raw:  # component-wise delta from previous entry
                prev = _add_pixels(prev, p)
                palette.append(prev)
            width_bits = (3 if n_colors <= 2 else 2 if n_colors <= 4
                          else 1 if n_colors <= 16 else 0)
            transforms.append(("palette", palette, width_bits, xsize))
            xsize = (xsize + (1 << width_bits) - 1) >> width_bits
    return transforms, xsize


def _decode_image_stream(br: _BitReader, xsize: int, ysize: int,
                         is_level0: bool):
    """One spatially-coded ARGB image; level 0 additionally carries
    transforms and the meta-prefix (entropy) image."""
    if xsize * ysize > _MAX_PIXELS:
        raise ValueError("VP8L: image too large")
    transforms: list = []
    if is_level0:
        transforms, xsize = _read_transforms(br, xsize, ysize)

    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("VP8L: bad color-cache size")
    cache_size = (1 << cache_bits) if cache_bits else 0

    entropy = None
    prefix_bits = 0
    ew = 0
    num_groups = 1
    if is_level0 and br.read(1):
        prefix_bits = br.read(3) + 2
        ew = (xsize + (1 << prefix_bits) - 1) >> prefix_bits
        eh = (ysize + (1 << prefix_bits) - 1) >> prefix_bits
        entropy = _decode_image_stream(br, ew, eh, False)
        num_groups = 1 + max((p >> 8) & 0xFFFF for p in entropy)

    green_size = 256 + 24 + cache_size
    groups = []
    for _ in range(num_groups):
        groups.append((
            _read_prefix_code(br, green_size),
            _read_prefix_code(br, 256),   # red
            _read_prefix_code(br, 256),   # blue
            _read_prefix_code(br, 256),   # alpha
            _read_prefix_code(br, 40),    # distance
        ))

    total = xsize * ysize
    pix: list[int] = []
    cache = [0] * cache_size
    cache_shift = 32 - cache_bits if cache_bits else 0
    pos = 0
    group = groups[0]
    while pos < total:
        if br.overrun:
            # fail closed DURING the loop: a corrupt header claiming a
            # 16k×16k canvas over an exhausted (zero-padded) reader
            # must not spin 268M Python iterations before the
            # post-loop check
            raise ValueError("VP8L: truncated bitstream")
        if entropy is not None:
            x, y = pos % xsize, pos // xsize
            meta = (entropy[(y >> prefix_bits) * ew + (x >> prefix_bits)]
                    >> 8) & 0xFFFF
            group = groups[meta]
        s = group[0].read(br)
        if s < 256:
            r = group[1].read(br)
            b = group[2].read(br)
            a = group[3].read(br)
            p = (a << 24) | (r << 16) | (s << 8) | b
            pix.append(p)
            if cache_bits:
                cache[(0x1E35A7BD * p & 0xFFFFFFFF) >> cache_shift] = p
            pos += 1
        elif s < 280:
            length = _lz77_value(br, s - 256)
            dist_code = _lz77_value(br, group[4].read(br))
            if dist_code > 120:
                dist = dist_code - 120
            else:
                dx, dy = _DIST_MAP[dist_code - 1]
                dist = max(dy * xsize + dx, 1)
            if dist > pos or pos + length > total:
                raise ValueError("VP8L: backward reference out of range")
            if cache_bits:
                for _ in range(length):
                    p = pix[-dist]
                    pix.append(p)
                    cache[(0x1E35A7BD * p & 0xFFFFFFFF) >> cache_shift] = p
            else:
                for _ in range(length):
                    pix.append(pix[-dist])
            pos += length
        else:
            if not cache_bits or s - 280 >= cache_size:
                raise ValueError("VP8L: color-cache symbol without cache")
            pix.append(cache[s - 280])
            pos += 1
    if br.overrun:
        raise ValueError("VP8L: truncated bitstream")

    for t in reversed(transforms):
        if t[0] == "subgreen":
            _inv_subtract_green(pix)
        elif t[0] == "pred":
            _inv_predictor(pix, xsize, ysize, t[1], t[2], t[3])
        elif t[0] == "color":
            _inv_color_transform(pix, xsize, ysize, t[1], t[2], t[3])
        else:  # palette: restores the pre-bundling width
            pix = _inv_palette(pix, t[3], ysize, t[1], t[2])
            xsize = t[3]
    return pix


def decode_vp8l(body: bytes) -> np.ndarray:
    """VP8L chunk body → uint8 array of shape (H, W, 3) or, when the
    header flags alpha, (H, W, 4)."""
    if len(body) < 5 or body[0] != 0x2F:
        raise ValueError("VP8L: bad signature byte")
    br = _BitReader(body[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    alpha_used = br.read(1)
    if br.read(3) != 0:
        raise ValueError("VP8L: unknown version")
    pix = _decode_image_stream(br, w, h, True)
    arr = np.array(pix, dtype=np.uint32).reshape(h, w)
    channels = [(arr >> 16) & 0xFF, (arr >> 8) & 0xFF, arr & 0xFF]
    if alpha_used:
        channels.append((arr >> 24) & 0xFF)
    return np.stack(channels, axis=2).astype(np.uint8)


def is_webp(data: bytes) -> bool:
    return len(data) >= 16 and data[:4] == b"RIFF" and data[8:12] == b"WEBP"


def decode_webp(data: bytes) -> np.ndarray:
    """RIFF WebP container → pixels. Lossless (VP8L) payloads decode
    for real, including inside an extended (VP8X) container; lossy VP8
    essence genuinely needs a video codec and is rejected by name."""
    if not is_webp(data):
        raise ValueError("not a WebP (bad RIFF header)")
    i = 12
    while i + 8 <= len(data):
        cc = data[i:i + 4]
        (size,) = struct.unpack("<I", data[i + 4:i + 8])
        body = data[i + 8:i + 8 + size]
        if cc == b"VP8L":
            return decode_vp8l(body)
        if cc == b"VP8 ":
            raise NotImplementedError(
                "WebP: lossy VP8 essence needs a video codec")
        i += 8 + size + (size & 1)
    raise ValueError("WebP: no image chunk found")


# ------------------------------------------------------------- encode


def _huffman_lengths(counts: list[int], limit: int = _MAX_CODE_LEN) -> list[int]:
    """Counts → canonical code lengths, depth-limited, complete
    (Kraft sum exactly 1) whenever ≥2 symbols are used."""
    import heapq

    used = [i for i, c in enumerate(counts) if c > 0]
    lengths = [0] * len(counts)
    if not used:
        return lengths
    if len(used) == 1:
        lengths[used[0]] = 1
        return lengths
    heap: list = []
    for idx, s in enumerate(used):
        heapq.heappush(heap, (counts[s], idx, ("leaf", s)))
    next_id = len(used)
    while len(heap) > 1:
        c1, _, n1 = heapq.heappop(heap)
        c2, _, n2 = heapq.heappop(heap)
        heapq.heappush(heap, (c1 + c2, next_id, ("node", n1, n2)))
        next_id += 1
    stack = [(heap[0][2], 0)]
    while stack:
        node, depth = stack.pop()
        if node[0] == "leaf":
            lengths[node[1]] = max(depth, 1)
        else:
            stack.append((node[1], depth + 1))
            stack.append((node[2], depth + 1))
    # depth-limit + completeness fix-up (zlib-style Kraft adjustment)
    for s in used:
        if lengths[s] > limit:
            lengths[s] = limit
    full = 1 << limit

    def kraft() -> int:
        return sum(1 << (limit - lengths[s]) for s in used)

    while kraft() > full:  # oversubscribed: push the deepest sub-limit down
        cand = max((s for s in used if lengths[s] < limit),
                   key=lambda s: lengths[s])
        lengths[cand] += 1
    excess = full - kraft()
    while excess:  # undersubscribed: promote deepest symbols up
        for s in sorted(used, key=lambda s: -lengths[s]):
            gain = 1 << (limit - lengths[s])
            if lengths[s] > 1 and gain <= excess:
                lengths[s] -= 1
                excess -= gain
                break
        else:
            raise AssertionError("VP8L: Kraft fix-up failed")
    return lengths


def _canonical_codes(lengths: list[int]) -> dict[int, tuple[int, int]]:
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    for length in range(1, _MAX_CODE_LEN + 1):
        for sym, l in enumerate(lengths):
            if l == length:
                codes[sym] = (length, code)
                code += 1
        code <<= 1
    return codes


class _Writer:
    """Symbol writer for one prefix code (mirrors _PrefixCode.read)."""

    def __init__(self, lengths: list[int]):
        used = [s for s, l in enumerate(lengths) if l > 0]
        self.const = used[0] if len(used) == 1 else None
        self.codes = _canonical_codes(lengths)

    def write(self, bw: _BitWriter, sym: int) -> None:
        if self.const is not None:
            if sym != self.const:
                raise AssertionError("VP8L encoder: symbol outside code")
            return
        length, code = self.codes[sym]
        for i in range(length - 1, -1, -1):  # MSB-first on the wire
            bw.write((code >> i) & 1, 1)


def _rle_code_lengths(lengths: list[int]):
    """Code-length array → (symbol, extra, extra_bits) stream using the
    16/17/18 repeat codes."""
    out = []
    i = 0
    n = len(lengths)
    prev_nz = 8
    while i < n:
        l = lengths[i]
        j = i
        while j < n and lengths[j] == l:
            j += 1
        run = j - i
        i = j
        if l == 0:
            while run >= 11:
                take = min(run, 11 + 127)
                out.append((18, take - 11, 7))
                run -= take
            while run >= 3:
                take = min(run, 3 + 7)
                out.append((17, take - 3, 3))
                run -= take
            out.extend([(0, 0, 0)] * run)
        else:
            if l != prev_nz:
                out.append((l, 0, 0))
                run -= 1
            prev_nz = l
            while run >= 3:
                take = min(run, 3 + 3)
                out.append((16, take - 3, 2))
                run -= take
            out.extend([(l, 0, 0)] * run)
    return out


def _write_prefix_code(bw: _BitWriter, counts: list[int]) -> _Writer:
    used = [s for s, c in enumerate(counts) if c > 0]
    if not used:
        used = [0]
        counts = list(counts)
        counts[0] = 1
    if len(used) <= 2 and max(used) < 256:
        bw.write(1, 1)  # simple code
        bw.write(len(used) - 1, 1)
        bw.write(1, 1)  # first symbol in 8 bits
        bw.write(used[0], 8)
        if len(used) == 2:
            bw.write(used[1], 8)
        lengths = [0] * len(counts)
        for s in used:
            lengths[s] = 1
        w = _Writer(lengths)
        if len(used) == 2:  # simple codes assign bit 0/1 in read order
            w.codes = {used[0]: (1, 0), used[1]: (1, 1)}
        else:
            w.const = used[0]
        return w
    bw.write(0, 1)  # normal code
    lengths = _huffman_lengths(counts)
    rle = _rle_code_lengths(lengths)
    clc_counts = [0] * len(_CLC_ORDER)
    for sym, _, _ in rle:
        clc_counts[sym] += 1
    if sum(1 for c in clc_counts if c) < 2:
        # a single-symbol code-length code would repeat forever on the
        # decode side; pad the table with one unused symbol
        clc_counts[0 if clc_counts[0] == 0 else 15] = 1
    clc_lengths = _huffman_lengths(clc_counts, limit=7)
    num_clc = max(
        (i + 1 for i, s in enumerate(_CLC_ORDER) if clc_lengths[s] > 0),
        default=4)
    num_clc = max(num_clc, 4)
    bw.write(num_clc - 4, 4)
    for i in range(num_clc):
        bw.write(clc_lengths[_CLC_ORDER[i]], 3)
    bw.write(0, 1)  # no explicit max_symbol
    clc_writer = _Writer(clc_lengths)
    for sym, extra, extra_bits in rle:
        clc_writer.write(bw, sym)
        if extra_bits:
            bw.write(extra, extra_bits)
    return _Writer(lengths)


def _lz77_prefix(value: int) -> tuple[int, int, int]:
    """Value ≥ 1 → (prefix code, extra value, extra bits)."""
    if value <= 4:
        return value - 1, 0, 0
    for prefix in range(4, 40):
        extra_bits = (prefix - 2) >> 1
        offset = (2 + (prefix & 1)) << extra_bits
        if offset + 1 <= value <= offset + (1 << extra_bits):
            return prefix, value - offset - 1, extra_bits
    raise ValueError(f"VP8L: value {value} exceeds prefix-code range")


def _tokenize(pix: list[int], xsize: int, *, cache_bits: int,
              use_lz77: bool) -> list[tuple]:
    """Greedy literal/copy/cache tokenizer, mirroring decoder state.
    Copy candidates: the previous pixel (run-length) and the pixel one
    row up — the two distances that dominate synthetic/screenshot
    content — mapped through the short-distance plane codes when they
    apply."""
    plane = {}
    for idx, (dx, dy) in enumerate(_DIST_MAP):
        d = dy * xsize + dx
        if d >= 1 and d not in plane:
            plane[d] = idx + 1
    tokens: list[tuple] = []
    cache_size = (1 << cache_bits) if cache_bits else 0
    cache = [None] * cache_size
    cache_shift = 32 - cache_bits if cache_bits else 0
    total = len(pix)
    pos = 0
    while pos < total:
        best_len, best_dist = 0, 0
        if use_lz77:
            for dist in (1, xsize):
                if dist > pos:
                    continue
                run = 0
                while (pos + run < total and run < 4096
                       and pix[pos + run] == pix[pos + run - dist]):
                    run += 1
                if run > best_len:
                    best_len, best_dist = run, dist
        if best_len >= 3:
            dist_code = plane.get(best_dist, best_dist + 120)
            tokens.append(("copy", best_len, dist_code))
            if cache_size:
                for k in range(best_len):
                    p = pix[pos + k]
                    cache[(0x1E35A7BD * p & 0xFFFFFFFF) >> cache_shift] = p
            pos += best_len
            continue
        p = pix[pos]
        if cache_size:
            slot = (0x1E35A7BD * p & 0xFFFFFFFF) >> cache_shift
            if cache[slot] == p:
                tokens.append(("cache", slot))
                pos += 1
                continue
            cache[slot] = p
        tokens.append(("lit", p))
        pos += 1
    return tokens


def _encode_image_stream(bw: _BitWriter, pix: list[int], xsize: int,
                         ysize: int, *, level0: bool = False,
                         cache_bits: int = 0,
                         use_lz77: bool = True,
                         meta_bits: int = 0) -> None:
    """Write one spatially-coded image (no transforms — the caller
    writes those).  meta_bits > 0 splits the level-0 image into
    2^meta_bits tiles with two alternating prefix-code groups
    (checkerboard)."""
    bw.write(1 if cache_bits else 0, 1)
    if cache_bits:
        bw.write(cache_bits, 4)
    num_groups = 1
    ew = 0
    group_of_tile: list[int] = []
    if meta_bits and not level0:
        raise ValueError("VP8L: meta prefix codes only exist at level 0")
    if meta_bits:
        bw.write(1, 1)
        bw.write(meta_bits - 2, 3)
        ew = (xsize + (1 << meta_bits) - 1) >> meta_bits
        eh = (ysize + (1 << meta_bits) - 1) >> meta_bits
        group_of_tile = [(tx + ty) & 1 for ty in range(eh) for tx in range(ew)]
        num_groups = 2 if len(set(group_of_tile)) > 1 else 1
        group_of_tile = [g % num_groups for g in group_of_tile]
        entropy_pix = [0xFF000000 | (g << 8) for g in group_of_tile]
        _encode_image_stream(bw, entropy_pix, ew, eh, use_lz77=False)
    elif level0:
        bw.write(0, 1)

    tokens = _tokenize(pix, xsize, cache_bits=cache_bits, use_lz77=use_lz77)
    # assign each token its group (by the position of its first pixel)
    cache_size = (1 << cache_bits) if cache_bits else 0
    green_size = 256 + 24 + cache_size
    hists = [[[0] * green_size, [0] * 256, [0] * 256, [0] * 256, [0] * 40]
             for _ in range(num_groups)]
    token_groups = []
    pos = 0
    for tok in tokens:
        if meta_bits:
            x, y = pos % xsize, pos // xsize
            g = group_of_tile[(y >> meta_bits) * ew + (x >> meta_bits)]
        else:
            g = 0
        token_groups.append(g)
        h = hists[g]
        if tok[0] == "lit":
            p = tok[1]
            h[0][(p >> 8) & 0xFF] += 1
            h[1][(p >> 16) & 0xFF] += 1
            h[2][p & 0xFF] += 1
            h[3][(p >> 24) & 0xFF] += 1
            pos += 1
        elif tok[0] == "copy":
            lp, _, _ = _lz77_prefix(tok[1])
            dp, _, _ = _lz77_prefix(tok[2])
            h[0][256 + lp] += 1
            h[4][dp] += 1
            pos += tok[1]
        else:
            h[0][280 + tok[1]] += 1
            pos += 1
    writers = []
    for g in range(num_groups):
        writers.append(tuple(_write_prefix_code(bw, hists[g][k])
                             for k in range(5)))
    for tok, g in zip(tokens, token_groups):
        wr = writers[g]
        if tok[0] == "lit":
            p = tok[1]
            wr[0].write(bw, (p >> 8) & 0xFF)
            wr[1].write(bw, (p >> 16) & 0xFF)
            wr[2].write(bw, p & 0xFF)
            wr[3].write(bw, (p >> 24) & 0xFF)
        elif tok[0] == "copy":
            lp, le, lb = _lz77_prefix(tok[1])
            wr[0].write(bw, 256 + lp)
            if lb:
                bw.write(le, lb)
            dp, de, db = _lz77_prefix(tok[2])
            wr[4].write(bw, dp)
            if db:
                bw.write(de, db)
        else:
            wr[0].write(bw, 280 + tok[1])


def _fwd_subtract_green(pix: list[int]) -> list[int]:
    out = []
    for p in pix:
        g = (p >> 8) & 0xFF
        r = ((p >> 16) & 0xFF) - g & 0xFF
        b = (p & 0xFF) - g & 0xFF
        out.append((p & 0xFF00FF00) | (r << 16) | b)
    return out


def _sub_pixels(a: int, b: int) -> int:
    """Per-channel (a - b) mod 256 on packed ARGB ints."""
    lo = (((a & _MASK_LO) | 0x01000100) - (b & _MASK_LO)) & _MASK_LO
    hi = ((((a >> 8) & _MASK_LO) | 0x01000100)
          - ((b >> 8) & _MASK_LO)) & _MASK_LO
    return lo | (hi << 8)


def _fwd_predictor(pix: list[int], w: int, h: int, mode: int,
                   size_bits: int) -> list[int]:
    out = [0] * len(pix)
    for y in range(h):
        row = y * w
        for x in range(w):
            i = row + x
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = pix[i - 1]
            elif x == 0:
                pred = pix[i - w]
            else:
                pred = _predict(mode, pix[i - 1], pix[i - w],
                                pix[i - w - 1], pix[i - w + 1])
            out[i] = _sub_pixels(pix[i], pred)
    return out


def _fwd_color_transform(pix: list[int], cte: int) -> list[int]:
    red_to_blue = (cte >> 16) & 0xFF
    green_to_blue = (cte >> 8) & 0xFF
    green_to_red = cte & 0xFF
    out = []
    for p in pix:
        g = (p >> 8) & 0xFF
        r = (p >> 16) & 0xFF
        b = p & 0xFF
        nr = (r - _ct_delta(green_to_red, g)) & 0xFF
        nb = (b - _ct_delta(green_to_blue, g) - _ct_delta(red_to_blue, r)) \
            & 0xFF
        out.append((p & 0xFF00FF00) | (nr << 16) | nb)
    return out


def encode_vp8l(arr: np.ndarray, *, palette: str = "auto",
                predictor: Optional[int] = None, pred_bits: int = 4,
                subtract_green: bool = False,
                color_cte: Optional[tuple[int, int, int]] = None,
                cte_bits: int = 4,
                color_cache_bits: int = 0, use_lz77: bool = True,
                meta_bits: int = 0) -> bytes:
    """uint8 (H, W), (H, W, 3) or (H, W, 4) → VP8L chunk body.

    ``predictor`` applies one spatial predictor mode (0-13) to every
    block; ``color_cte`` applies one (green_to_red, green_to_blue,
    red_to_blue) element to every block; ``palette`` ('auto'/'on'/
    'off') color-indexes when ≤256 distinct pixels, with sub-8-bit
    index bundling.  Transforms compose in the written order; the
    decoder inverts them in reverse, so round trips are exact."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    if a.shape[2] == 1:
        a = np.repeat(a, 3, axis=2)
    h, w = a.shape[:2]
    if not (1 <= w <= 16384 and 1 <= h <= 16384):
        raise ValueError("VP8L: dimensions must be 1..16384")
    has_alpha = a.shape[2] == 4
    alpha = (a[:, :, 3].astype(np.uint32) if has_alpha
             else np.full((h, w), 255, np.uint32))
    packed = ((alpha << 24)
              | (a[:, :, 0].astype(np.uint32) << 16)
              | (a[:, :, 1].astype(np.uint32) << 8)
              | a[:, :, 2].astype(np.uint32))
    pix = [int(p) for p in packed.ravel()]
    alpha_used = bool(has_alpha and (a[:, :, 3] != 255).any())

    bw = _BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(1 if alpha_used else 0, 1)
    bw.write(0, 3)  # version

    xsize = w
    uniq = sorted(set(pix))
    use_palette = (palette == "on"
                   or (palette == "auto" and len(uniq) <= 256
                       and predictor is None and color_cte is None
                       and not subtract_green))
    if use_palette and len(uniq) > 256:
        raise ValueError("VP8L: palette requested but >256 distinct pixels")

    if use_palette:
        bw.write(1, 1)
        bw.write(3, 2)  # color-indexing transform
        bw.write(len(uniq) - 1, 8)
        index_of = {p: i for i, p in enumerate(uniq)}
        deltas = []
        prev = 0
        for p in uniq:  # palette entries are delta-coded
            deltas.append(_sub_pixels(p, prev))
            prev = p
        _encode_image_stream(bw, deltas, len(uniq), 1, use_lz77=False)
        width_bits = (3 if len(uniq) <= 2 else 2 if len(uniq) <= 4
                      else 1 if len(uniq) <= 16 else 0)
        if width_bits:
            per = 1 << width_bits
            bits = 8 >> width_bits
            packed_w = (w + per - 1) >> width_bits
            out = [0] * (packed_w * h)
            for y in range(h):
                for x in range(w):
                    g = index_of[pix[y * w + x]]
                    out[y * packed_w + (x >> width_bits)] |= \
                        g << ((x & (per - 1)) * bits)
            pix = [0xFF000000 | (v << 8) for v in out]
            xsize = packed_w
        else:
            pix = [0xFF000000 | (index_of[p] << 8) for p in pix]
    else:
        if subtract_green:
            bw.write(1, 1)
            bw.write(2, 2)
            pix = _fwd_subtract_green(pix)
        if predictor is not None:
            if not 0 <= predictor <= 13:
                raise ValueError("VP8L: predictor mode must be 0..13")
            bw.write(1, 1)
            bw.write(0, 2)
            bw.write(pred_bits - 2, 3)
            mw = (xsize + (1 << pred_bits) - 1) >> pred_bits
            mh = (h + (1 << pred_bits) - 1) >> pred_bits
            mode_img = [0xFF000000 | (predictor << 8)] * (mw * mh)
            _encode_image_stream(bw, mode_img, mw, mh, use_lz77=False)
            pix = _fwd_predictor(pix, xsize, h, predictor, pred_bits)
        if color_cte is not None:
            g2r, g2b, r2b = (v & 0xFF for v in color_cte)
            bw.write(1, 1)
            bw.write(1, 2)
            bw.write(cte_bits - 2, 3)
            mw = (xsize + (1 << cte_bits) - 1) >> cte_bits
            mh = (h + (1 << cte_bits) - 1) >> cte_bits
            cte = 0xFF000000 | (r2b << 16) | (g2b << 8) | g2r
            _encode_image_stream(bw, [cte] * (mw * mh), mw, mh,
                                 use_lz77=False)
            pix = _fwd_color_transform(pix, cte)
    bw.write(0, 1)  # end of transforms

    _encode_image_stream(bw, pix, xsize, h, level0=True,
                         cache_bits=color_cache_bits,
                         use_lz77=use_lz77, meta_bits=meta_bits)
    return bytes([0x2F]) + bw.getvalue()


def encode_webp(arr: np.ndarray, **kwargs) -> bytes:
    """Pixels → a complete lossless WebP file (RIFF + VP8L chunk)."""
    body = encode_vp8l(arr, **kwargs)
    chunk = b"VP8L" + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
