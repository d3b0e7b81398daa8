"""Pure-Python FLAC audio decoder + spec-shaped fixture encoder.

Closes the "compressed audio essence" stub for the one mainstream
compressed audio format whose bitstream needs no external codec
library: FLAC is free of patent-encumbered transforms — it is LPC
prediction + Rice-coded residuals, fully specified in RFC 9639 — so a
stdlib+numpy decoder can be bit-exact (lossless: decode(encode(x)) ==
x, asserted in tests). MP3/AAC/Opus/Vorbis stay behind the named stub
boundary (synthesis filterbanks/MDCT psychoacoustics genuinely need a
codec library to be worth trusting); their header-level probes live in
functions/mpegaudio.py and functions/oggflac.py.

Decoder coverage: STREAMINFO + metadata-block walk, frame headers
(all block-size/sample-rate/sample-size codes, UTF-8 coded frame and
sample numbers, CRC-8 verified), subframes CONSTANT / VERBATIM /
FIXED(0-4) / LPC(1-32), wasted bits, Rice residual partitions (4- and
5-bit parameters, escape-to-raw), stereo decorrelation (left/side,
right/side, mid/side) and frame CRC-16 verification.

Practical ceiling (same honesty as functions/png.py ADVICE note): the
residual loop is per-sample pure Python — fine for fixture-scale and
clip-scale audio in tests/probes; a minute of 44.1 kHz stereo costs
~5M Python iterations. The Spark-side plumbing batches via Arrow
regardless; swap in a C codec where one exists.

The encoder exists to produce spec-valid fixtures that exercise every
decoder path (verbatim / constant / fixed+Rice / LPC+Rice subframes,
mid/side and left/side channel modes, wasted bits) — it is a test
vector writer with correct CRCs, not a compression-ratio contender.

No reference-repo counterpart (task-brief multimodal requirement).
"""

from __future__ import annotations

import struct
from typing import Optional

import numpy as np

_BLOCK_SIZES = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
                8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
                13: 8192, 14: 16384, 15: 32768}
_SAMPLE_RATES = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000,
                 6: 22050, 7: 24000, 8: 32000, 9: 44100, 10: 48000,
                 11: 96000}
_SAMPLE_SIZES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}
_FIXED_COEFS = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def is_flac(data: bytes) -> bool:
    return data[:4] == b"fLaC"


# ------------------------------------------------------------- CRC

def _crc8(data: bytes) -> int:
    """CRC-8, poly x^8+x^2+x+1 (0x07), init 0 — the frame-header CRC."""
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07 if crc & 0x80 else crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    """CRC-16, poly x^16+x^15+x^2+1 (0x8005), init 0 — the frame CRC."""
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005 if crc & 0x8000 else crc << 1) & 0xFFFF
    return crc


# ------------------------------------------------------- bit reader

class _Bits:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes, bytepos: int = 0):
        self.data = data
        self.pos = bytepos * 8

    def read(self, n: int) -> int:
        v = 0
        pos, data = self.pos, self.data
        end = pos + n
        if end > len(data) * 8:
            raise ValueError("FLAC: bitstream truncated")
        while n:
            byte = data[pos >> 3]
            avail = 8 - (pos & 7)
            take = avail if avail < n else n
            v = (v << take) | ((byte >> (avail - take)) & ((1 << take) - 1))
            pos += take
            n -= take
        self.pos = pos
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v & (1 << (n - 1)) else v

    def read_unary(self) -> int:
        n = 0
        while not self.read(1):
            n += 1
        return n

    def read_utf8_coded(self) -> int:
        """FLAC's UTF-8-style variable-length number (frame/sample no)."""
        b0 = self.read(8)
        if b0 < 0x80:
            return b0
        n_extra = 0
        mask = 0x40
        while b0 & mask:
            n_extra += 1
            mask >>= 1
        if n_extra == 0 or n_extra > 6:
            raise ValueError("FLAC: bad UTF-8 coded number")
        v = b0 & (mask - 1)
        for _ in range(n_extra):
            c = self.read(8)
            if c & 0xC0 != 0x80:
                raise ValueError("FLAC: bad UTF-8 continuation")
            v = (v << 6) | (c & 0x3F)
        return v

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def bytepos(self) -> int:
        return self.pos >> 3


# ------------------------------------------------------------ decode

def probe_streaminfo(data: bytes) -> Optional[dict]:
    """STREAMINFO fields without decoding frames (cheap probe)."""
    if not is_flac(data) or len(data) < 8:
        return None
    off = 4
    while off + 4 <= len(data):
        hdr = data[off]
        (length,) = struct.unpack(">I", b"\x00" + data[off + 1 : off + 4])
        body = data[off + 4 : off + 4 + length]
        if hdr & 0x7F == 0 and length >= 34:
            rate = (body[10] << 12) | (body[11] << 4) | (body[12] >> 4)
            channels = ((body[12] >> 1) & 7) + 1
            bits = (((body[12] & 1) << 4) | (body[13] >> 4)) + 1
            total = ((body[13] & 0x0F) << 32) | struct.unpack(
                ">I", body[14:18])[0]
            return {"sample_rate": rate, "channels": channels,
                    "bits": bits, "total_samples": total,
                    "frames_offset": off + 4 + length
                    if hdr & 0x80 else None}
        if hdr & 0x80:
            return None  # last block and it wasn't STREAMINFO
        off += 4 + length
    return None


def _frames_offset(data: bytes) -> int:
    off = 4
    while off + 4 <= len(data):
        hdr = data[off]
        (length,) = struct.unpack(">I", b"\x00" + data[off + 1 : off + 4])
        off += 4 + length
        if hdr & 0x80:
            return off
    raise ValueError("FLAC: no last-metadata-block flag")


def _decode_residuals(bits: _Bits, n: int, order: int) -> list:
    """Rice-coded residual section (both coding methods + escape)."""
    method = bits.read(2)
    if method > 1:
        raise ValueError("FLAC: reserved residual coding method")
    param_bits = 4 if method == 0 else 5
    escape = (1 << param_bits) - 1
    part_order = bits.read(4)
    n_parts = 1 << part_order
    if n % n_parts:
        raise ValueError("FLAC: partition count does not divide blocksize")
    res = []
    for p in range(n_parts):
        count = (n >> part_order) - (order if p == 0 else 0)
        if count < 0:
            raise ValueError("FLAC: predictor order exceeds first partition")
        param = bits.read(param_bits)
        if param == escape:
            raw = bits.read(5)
            if raw == 0:
                res.extend([0] * count)
            else:
                res.extend(bits.read_signed(raw) for _ in range(count))
        else:
            for _ in range(count):
                q = bits.read_unary()
                v = (q << param) | bits.read(param)
                res.append((v >> 1) ^ -(v & 1))  # unzigzag
    return res


def _decode_subframe(bits: _Bits, n: int, bps: int) -> list:
    if bits.read(1):
        raise ValueError("FLAC: subframe padding bit set")
    sf_type = bits.read(6)
    wasted = 0
    if bits.read(1):
        wasted = bits.read_unary() + 1
    bps -= wasted
    if sf_type == 0:  # CONSTANT
        out = [bits.read_signed(bps)] * n
    elif sf_type == 1:  # VERBATIM
        out = [bits.read_signed(bps) for _ in range(n)]
    elif 8 <= sf_type <= 12:  # FIXED, order 0-4
        order = sf_type & 7
        out = [bits.read_signed(bps) for _ in range(order)]
        out.extend(_decode_residuals(bits, n, order))
        coefs = _FIXED_COEFS[order]
        for i in range(order, n):
            out[i] += sum(c * out[i - 1 - j] for j, c in enumerate(coefs))
    elif sf_type >= 32:  # LPC, order 1-32
        order = (sf_type & 31) + 1
        out = [bits.read_signed(bps) for _ in range(order)]
        prec = bits.read(4) + 1
        if prec == 16:
            raise ValueError("FLAC: invalid QLP precision")
        shift = bits.read_signed(5)
        if shift < 0:
            raise ValueError("FLAC: negative QLP shift")
        coefs = [bits.read_signed(prec) for _ in range(order)]
        out.extend(_decode_residuals(bits, n, order))
        for i in range(order, n):
            out[i] += sum(c * out[i - 1 - j]
                          for j, c in enumerate(coefs)) >> shift
    else:
        raise ValueError(f"FLAC: reserved subframe type {sf_type}")
    if wasted:
        out = [v << wasted for v in out]
    return out


def decode_flac(data: bytes) -> tuple[np.ndarray, int]:
    """FLAC bytes → (int32 samples shaped (n, channels), sample_rate).

    Bit-exact per RFC 9639; frame-header CRC-8 and frame CRC-16 are
    verified (a mismatch raises — corruption must not decode
    silently)."""
    info = probe_streaminfo(data)
    if info is None:
        raise ValueError("not a FLAC stream (no STREAMINFO)")
    rate0, bps0 = info["sample_rate"], info["bits"]
    total = info["total_samples"]
    bits = _Bits(data, _frames_offset(data))
    channels_out: list = []
    got = 0
    while bits.bytepos() < len(data) and (total == 0 or got < total):
        frame_start = bits.bytepos()
        if bits.read(14) != 0x3FFE:
            raise ValueError("FLAC: lost frame sync")
        bits.read(1)  # reserved
        bits.read(1)  # blocking strategy
        bs_code = bits.read(4)
        sr_code = bits.read(4)
        ch_code = bits.read(4)
        ss_code = bits.read(3)
        bits.read(1)  # reserved
        bits.read_utf8_coded()
        if bs_code == 0:
            raise ValueError("FLAC: reserved block size code")
        n = _BLOCK_SIZES.get(bs_code, 0)
        if bs_code == 6:
            n = bits.read(8) + 1
        elif bs_code == 7:
            n = bits.read(16) + 1
        rate = _SAMPLE_RATES.get(sr_code, rate0)
        if sr_code == 12:
            rate = bits.read(8) * 1000
        elif sr_code == 13:
            rate = bits.read(16)
        elif sr_code == 14:
            rate = bits.read(16) * 10
        elif sr_code == 15:
            raise ValueError("FLAC: invalid sample rate code")
        bps = _SAMPLE_SIZES.get(ss_code, bps0)
        hdr_end = bits.bytepos()
        if _crc8(data[frame_start:hdr_end]) != bits.read(8):
            raise ValueError("FLAC: frame header CRC-8 mismatch")
        if ch_code <= 7:
            chans = [_decode_subframe(bits, n, bps)
                     for _ in range(ch_code + 1)]
        elif ch_code in (8, 9, 10):  # left/side, right/side, mid/side
            extra0 = 1 if ch_code == 9 else 0   # side channel gets +1 bit
            extra1 = 0 if ch_code == 9 else 1
            c0 = _decode_subframe(bits, n, bps + extra0)
            c1 = _decode_subframe(bits, n, bps + extra1)
            if ch_code == 8:       # left, side → right = left - side
                chans = [c0, [a - b for a, b in zip(c0, c1)]]
            elif ch_code == 9:     # side, right → left = right + side
                chans = [[a + b for a, b in zip(c0, c1)], c1]
            else:                  # mid, side
                left, right = [], []
                for m, s in zip(c0, c1):
                    m = (m << 1) | (s & 1)
                    left.append((m + s) >> 1)
                    right.append((m - s) >> 1)
                chans = [left, right]
        else:
            raise ValueError(f"FLAC: reserved channel assignment {ch_code}")
        bits.align()
        if _crc16(data[frame_start : bits.bytepos()]) != bits.read(16):
            raise ValueError("FLAC: frame CRC-16 mismatch")
        if not channels_out:
            channels_out = [[] for _ in chans]
        for acc, c in zip(channels_out, chans):
            acc.extend(c)
        got += n
    if not channels_out or (total and got < total):
        # STREAMINFO-only / truncated stream (e.g. a metadata fixture):
        # refuse rather than return silence — callers fall back to the
        # header-level probe for duration.
        raise ValueError("FLAC: stream ends before total_samples")
    out = np.array(channels_out, dtype=np.int64).T
    if total:
        out = out[:total]
    return out.astype(np.int32), rate0


def decode_flac_float(data: bytes):
    """(duration_ms, float32 mono mixdown in [-1, 1], rate) — the
    multimodal audio-path shape (matches _try_decode_wav)."""
    info = probe_streaminfo(data)
    if info is None:
        return None
    samples, rate = decode_flac(data)
    s = samples.astype("float32") / float(1 << (info["bits"] - 1))
    if s.shape[1] > 1:
        s = s.mean(axis=1)
    else:
        s = s[:, 0]
    return (int(len(s) * 1000 / max(rate, 1)), s, rate)


# ------------------------------------------------------------ encode

class _BitWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, v: int, n: int) -> None:
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.out.append((self.acc >> (self.nbits - 8)) & 0xFF)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.out)


def _write_rice(bw: _BitWriter, res: list, order: int, n: int) -> None:
    """Single-partition Rice section, parameter from the mean residual
    magnitude (the classic closed-form choice)."""
    mean = (sum(abs(r) for r in res) / max(len(res), 1)) or 0.5
    param = max(0, min(14, int(np.ceil(np.log2(mean + 1)))))
    bw.write(0, 2)   # 4-bit params
    bw.write(0, 4)   # partition order 0
    bw.write(param, 4)
    for r in res:
        v = (abs(r) << 1) - (1 if r < 0 else 0)  # zigzag
        bw.write_unary(v >> param)
        bw.write(v & ((1 << param) - 1), param)


def _write_subframe(bw: _BitWriter, x: list, bps: int, mode: str,
                    wasted: int = 0) -> None:
    bw.write(0, 1)
    if wasted:
        if any(v & ((1 << wasted) - 1) for v in x):
            raise ValueError(
                "FLAC: wasted-bits encoding needs samples with that many "
                "low zero bits (would otherwise be lossy)")
        x = [v >> wasted for v in x]
    if mode == "constant":
        bw.write(0, 6)
    elif mode == "verbatim":
        bw.write(1, 6)
    elif mode == "fixed":
        bw.write(8 | 2, 6)  # fixed order 2
    elif mode == "lpc":
        order = 2
        bw.write(32 | (order - 1), 6)
    else:
        raise ValueError(mode)
    if wasted:
        bw.write(1, 1)
        bw.write(1, wasted)  # unary: (wasted-1) zeros then a 1
        bps -= wasted
    else:
        bw.write(0, 1)
    if mode == "constant":
        bw.write(x[0], bps)
    elif mode == "verbatim":
        for v in x:
            bw.write(v, bps)
    elif mode == "fixed":
        for v in x[:2]:
            bw.write(v, bps)
        res = [x[i] - (2 * x[i - 1] - x[i - 2]) for i in range(2, len(x))]
        _write_rice(bw, res, 2, len(x))
    else:  # lpc order 2: x[i] ≈ (c0·x[i-1] + c1·x[i-2]) >> shift
        prec, shift = 12, 10
        c0, c1 = 1638, -614  # ~1.6, -0.6: a gentle IIR-ish predictor
        for v in x[:2]:
            bw.write(v, bps)
        bw.write(prec - 1, 4)
        bw.write(shift, 5)
        bw.write(c0, prec)
        bw.write(c1, prec)
        res = [x[i] - ((c0 * x[i - 1] + c1 * x[i - 2]) >> shift)
               for i in range(2, len(x))]
        _write_rice(bw, res, 2, len(x))


def encode_flac(samples: np.ndarray, rate: int = 44100, bits: int = 16,
                mode: str = "verbatim", channel_mode: str = "independent",
                block_size: int = 4096, wasted: int = 0) -> bytes:
    """int samples (n,) or (n, channels) → spec-valid FLAC bytes.

    ``mode`` picks the subframe type every block uses (verbatim /
    constant / fixed / lpc); ``channel_mode`` independent | mid_side |
    left_side | right_side (stereo only). Lossless by construction —
    tests assert decode_flac(encode_flac(x)) == x bit-exactly."""
    a = np.asarray(samples, dtype=np.int64)
    if a.ndim == 1:
        a = a[:, None]
    n_total, n_ch = a.shape
    if channel_mode != "independent" and n_ch != 2:
        raise ValueError("channel decorrelation needs stereo input")
    lim = 1 << (bits - 1)
    if a.min() < -lim or a.max() >= lim:
        raise ValueError(f"samples exceed {bits}-bit range")
    # STREAMINFO
    si = bytearray()
    si += struct.pack(">HH", block_size, block_size)
    si += b"\x00\x00\x00" * 2  # min/max frame size unknown
    si += bytes([(rate >> 12) & 0xFF, (rate >> 4) & 0xFF,
                 ((rate & 0xF) << 4) | ((n_ch - 1) << 1)
                 | ((bits - 1) >> 4),
                 (((bits - 1) & 0xF) << 4) | ((n_total >> 32) & 0xF)])
    si += struct.pack(">I", n_total & 0xFFFFFFFF)
    si += b"\x00" * 16  # MD5 unset (permitted)
    out = bytearray(b"fLaC")
    out += bytes([0x80]) + struct.pack(">I", len(si))[1:] + si
    for f, start in enumerate(range(0, n_total, block_size)):
        block = a[start : start + block_size]
        n = block.shape[0]
        bw = _BitWriter()
        bw.write(0x3FFE, 14)
        bw.write(0, 1)
        bw.write(0, 1)  # fixed-blocksize strategy, frame number coded
        bw.write(7, 4)  # block size: 16-bit value - 1 follows
        bw.write(0, 4)  # sample rate: from STREAMINFO
        ch_codes = {"independent": n_ch - 1, "left_side": 8,
                    "right_side": 9, "mid_side": 10}
        bw.write(ch_codes[channel_mode], 4)
        ss_codes = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}
        bw.write(ss_codes[bits], 3)
        bw.write(0, 1)
        if f < 0x80:
            bw.write(f, 8)  # UTF-8 coded frame number (1 byte)
        elif f < 0x800:
            bw.write(0xC0 | (f >> 6), 8)
            bw.write(0x80 | (f & 0x3F), 8)
        else:  # fixture writer: 2048 frames ≈ 8M samples is plenty
            raise ValueError("FLAC encoder: frame number exceeds 2 bytes")
        bw.write(n - 1, 16)
        bw.align()
        hdr = bw.bytes()
        bw2 = _BitWriter()
        cols = [block[:, c].tolist() for c in range(n_ch)]
        if channel_mode == "independent":
            subs = [(c, bits) for c in cols]
        elif channel_mode == "left_side":
            subs = [(cols[0], bits),
                    ([l - r for l, r in zip(*cols)], bits + 1)]
        elif channel_mode == "right_side":
            subs = [([l - r for l, r in zip(*cols)], bits + 1),
                    (cols[1], bits)]
        else:  # mid_side
            subs = [([(l + r) >> 1 for l, r in zip(*cols)], bits),
                    ([l - r for l, r in zip(*cols)], bits + 1)]
        for x, sub_bps in subs:
            _write_subframe(bw2, x, sub_bps, mode, wasted=wasted)
        bw2.align()
        body = hdr + bytes([_crc8(hdr)]) + bw2.bytes()
        out += body + struct.pack(">H", _crc16(body))
    return bytes(out)
