"""Pure-Python baseline JPEG codec (stdlib ``struct`` + numpy).

The container ships no PIL/ffmpeg, but baseline sequential JPEG (ITU
T.81) needs neither: markers + Huffman-coded quantized DCT blocks, all
expressible with numpy 8×8 matrix arithmetic and a bit reader. This
closes the largest remaining multimodal stub (`multimodal._fake_decode`
for JPEG payloads) the same way ``functions/png.py`` closed PNG.

Supported: baseline/extended sequential DCT (SOF0/SOF1) and
progressive DCT (SOF2 — spectral selection and successive
approximation, DC/AC first and refinement scans with EOB-run coding,
T.81 Annex G), 8-bit, 1-component grayscale and 3-component YCbCr, any
h/v sampling factors (4:4:4, 4:2:0, 4:2:2, ...), restart intervals
(DRI/RSTn), multi-table DQT/DHT segments, table redefinition between
scans. Rejected with a clear error: arithmetic coding (SOF9+), 12-bit
precision, 4-component CMYK, hierarchical (SOF5+).

Huffman and quantization tables are always read from the file's own
DHT/DQT segments (baseline JPEG requires them to be embedded), so the
encoder is free to emit simple GENERATED canonical tables — every DC
size category at 4 bits, all 162 AC run/size symbols at 8 bits — rather
than transcribing the Annex K Huffman tables; the quantization bases
are the published Annex K matrices with the libjpeg-style quality
scaling. Compression is a little looser than an optimized encoder; the
bitstream is fully standard and the decoder handles third-party files.

Decode cost model: the DCT/dequant/color math is vectorized numpy per
8×8 block; entropy decoding is a per-coefficient Python bit loop —
O(nonzero coefficients) Python iterations per image. Fine for
fixture/thumbnail-scale assets in an Arrow-batched task; a megapixel
photographic decode costs seconds, so bulk photo pipelines still want a
native codec (the honest boundary this module documents).
"""

from __future__ import annotations

import struct
from typing import Optional

import numpy as np

# zigzag position -> raster index (ITU T.81 Figure 5 / jpeg_natural_order)
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])

# Annex K base quantization tables (raster order)
_Q_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)
_Q_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8×8 DCT-II matrix C: forward F = C·f·Cᵀ, inverse
    f = Cᵀ·F·C (separable, so blocks are two 8×8 matmuls each way)."""
    u = np.arange(8)[:, None]
    x = np.arange(8)[None, :]
    c = 0.5 * np.cos((2 * x + 1) * u * np.pi / 16)
    c[0, :] *= 1 / np.sqrt(2)
    return c


_C = _dct_matrix()


def is_jpeg(data: bytes) -> bool:
    return len(data) >= 3 and data[:2] == b"\xff\xd8" and data[2] == 0xFF


def probe_jpeg(data: bytes) -> Optional[dict]:
    """Header-only probe (no entropy decode): dimensions, component
    count and coding process from the first SOFn marker."""
    if not is_jpeg(data):
        return None
    i = 2
    while i + 4 <= len(data):
        if data[i] != 0xFF:
            return None
        marker = data[i + 1]
        if marker in (0xD9, 0xDA):  # EOI / entropy data: no SOF seen
            return None
        if 0xD0 <= marker <= 0xD7 or marker == 0x01:
            i += 2
            continue
        (seglen,) = struct.unpack(">H", data[i + 2 : i + 4])
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            h, w = struct.unpack(">HH", data[i + 5 : i + 9])
            return {"width": w, "height": h,
                    "components": data[i + 9],
                    "progressive": marker == 0xC2}
        i += 2 + seglen
    return None


# ------------------------------------------------------------- huffman

def _build_decode_table(counts, vals) -> dict:
    """Canonical JPEG Huffman: (bit length, code) → symbol."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = vals[k]
            k += 1
            code += 1
        code <<= 1
    return table


def _build_encode_table(counts, vals) -> dict:
    """Canonical JPEG Huffman: symbol → (code, bit length)."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[vals[k]] = (code, length)
            k += 1
            code += 1
        code <<= 1
    return table


class _Bits:
    """MSB-first bit reader over one destuffed entropy segment."""

    __slots__ = ("d", "i", "b")

    def __init__(self, d: bytes):
        self.d = d
        self.i = 0
        self.b = 0

    def bit(self) -> int:
        v = (self.d[self.i] >> (7 - self.b)) & 1
        self.b += 1
        if self.b == 8:
            self.b = 0
            self.i += 1
        return v

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v


def _huff_decode(bits: _Bits, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | bits.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("JPEG: invalid Huffman code in entropy stream")


def _extend(v: int, t: int) -> int:
    """T.81 EXTEND: map t received magnitude bits to a signed value."""
    if t and v < (1 << (t - 1)):
        return v - (1 << t) + 1
    return v


def _decode_block(bits: _Bits, dc_tab: dict, ac_tab: dict, pred: int):
    """One 8×8 block → (zigzag-order coefficients, new DC predictor)."""
    coef = np.zeros(64, dtype=np.int32)
    t = _huff_decode(bits, dc_tab)
    diff = _extend(bits.bits(t), t) if t else 0
    pred += diff
    coef[0] = pred
    k = 1
    while k < 64:
        rs = _huff_decode(bits, ac_tab)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL: 16 zeros
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("JPEG: AC run past end of block")
        coef[k] = _extend(bits.bits(s), s)
        k += 1
    return coef, pred


def _dc_first(bits: _Bits, dc_tab: dict, coef, pred: int, al: int) -> int:
    """Progressive DC first scan (Ss=0, Ah=0): baseline DC difference,
    stored point-transformed (<< Al). Returns the new predictor
    (unshifted domain, per T.81 G.1.2.1)."""
    t = _huff_decode(bits, dc_tab)
    diff = _extend(bits.bits(t), t) if t else 0
    pred += diff
    coef[0] = pred << al
    return pred


def _ac_first(bits: _Bits, ac_tab: dict, coef, ss: int, se: int,
              al: int, eobrun: int) -> int:
    """Progressive AC first scan (T.81 G.1.2.2): run/size coding of the
    point-transformed band Ss..Se plus EOBn end-of-band run codes
    (r<15, s=0 → run of 2^r + extra-bits blocks whose band is all
    zero from here on). Returns the remaining EOB run."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _huff_decode(bits, ac_tab)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r != 15:
                eobrun = (1 << r) - 1  # this block is the run's first
                if r:
                    eobrun += bits.bits(r)
                break
            k += 16  # ZRL
        else:
            k += r
            if k > se:
                raise ValueError("JPEG: AC run past spectral band")
            coef[k] = _extend(bits.bits(s), s) << al
            k += 1
    return eobrun


def _ac_refine(bits: _Bits, ac_tab: dict, coef, ss: int, se: int,
               al: int, eobrun: int) -> int:
    """Progressive AC refinement scan (T.81 G.1.2.3): each symbol either
    introduces a newly-nonzero ±2^Al coefficient after a run of
    zero-history positions, or starts an EOB run; while walking, every
    already-nonzero coefficient passed consumes one correction bit
    (1 = increase magnitude by 2^Al). Mirrors the libjpeg
    decode_mcu_AC_refine control flow."""
    p1 = 1 << al
    m1 = -1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _huff_decode(bits, ac_tab)
            r, s = rs >> 4, rs & 0x0F
            val = 0
            if s == 0:
                if r != 15:
                    eobrun = 1 << r  # includes this block; tail below
                    if r:
                        eobrun += bits.bits(r)
                    break
                # r == 15 (ZRL): skip 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("JPEG: refinement symbol with size>1")
                val = p1 if bits.bit() else m1
            while k <= se:
                t = int(coef[k])
                if t != 0:
                    if bits.bit() and (t & p1) == 0:
                        coef[k] = t + (p1 if t >= 0 else m1)
                else:
                    r -= 1
                    if r < 0:
                        break
                k += 1
            if val and k <= se:
                coef[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:  # correction bits for the rest of this block
            t = int(coef[k])
            if t != 0:
                if bits.bit() and (t & p1) == 0:
                    coef[k] = t + (p1 if t >= 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


# -------------------------------------------------------------- decode

def _entropy_segments(data: bytes, start: int):
    """Entropy-coded bytes from ``start``, destuffed (FF00→FF), split at
    restart markers; returns (segments, index of the terminating marker)."""
    segs = []
    cur = bytearray()
    i = start
    n = len(data)
    while i < n:
        b = data[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        if i + 1 >= n:
            break
        m = data[i + 1]
        if m == 0x00:
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= m <= 0xD7:  # RSTn
            segs.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:
            break  # real marker (EOI / next scan)
    segs.append(bytes(cur))
    return segs, i


def _run_scan(segs, scan, comps, coefs, bdims, mcux, mcuy, dri,
              ss, se, ah, al, progressive) -> None:
    """Decode one scan's entropy segments into the per-component
    coefficient arrays. ``scan``: [(comp index, dc table, ac table)].
    Interleaved scans (>1 component) walk the MCU grid; single-component
    scans walk the component's own block grid (T.81 A.2.2 — sampling
    factors are ignored for non-interleaved data)."""
    interleaved = len(scan) > 1
    if interleaved:
        n_mcus = mcux * mcuy

        def mcu_blocks(m):
            my, mx = divmod(m, mcux)
            for idx, dc_tab, ac_tab in scan:
                _, h, v, _ = comps[idx]
                for by in range(v):
                    for bx in range(h):
                        yield idx, my * v + by, mx * h + bx, dc_tab, ac_tab
    else:
        idx0, dc0, ac0 = scan[0]
        by_c, bx_c = bdims[idx0]
        n_mcus = by_c * bx_c

        def mcu_blocks(m):
            yield idx0, m // bx_c, m % bx_c, dc0, ac0

    preds = {entry[0]: 0 for entry in scan}
    eobrun = 0
    seg_i = 0
    bits = _Bits(segs[0])
    for m in range(n_mcus):
        if dri and m and m % dri == 0:
            seg_i += 1
            bits = _Bits(segs[seg_i])
            preds = dict.fromkeys(preds, 0)
            eobrun = 0
        for idx, r, c, dc_tab, ac_tab in mcu_blocks(m):
            coef = coefs[idx][r, c]
            if not progressive:
                cf, preds[idx] = _decode_block(bits, dc_tab, ac_tab, preds[idx])
                coef[:] = cf
            elif ss == 0:
                if ah == 0:
                    preds[idx] = _dc_first(bits, dc_tab, coef, preds[idx], al)
                elif bits.bit():  # DC refinement: one raw bit per block
                    coef[0] = int(coef[0]) | (1 << al)
            elif ah == 0:
                eobrun = _ac_first(bits, ac_tab, coef, ss, se, al, eobrun)
            else:
                eobrun = _ac_refine(bits, ac_tab, coef, ss, se, al, eobrun)


def decode_jpeg(data: bytes) -> np.ndarray:
    """JPEG bytes → uint8 array of shape (H, W, 1) grayscale or
    (H, W, 3) RGB. Handles baseline (single-scan) and progressive
    (multi-scan) streams through the same coefficient accumulator."""
    if not is_jpeg(data):
        raise ValueError("not a JPEG (bad SOI)")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class 0=DC/1=AC, id) -> table
    comps = None  # [(cid, h, v, tq)]
    width = height = None
    dri = 0
    progressive = False
    coefs = bdims = None
    hmax = vmax = mcux = mcuy = 0
    n_scans = 0
    i = 2
    while i + 4 <= len(data):
        if data[i] != 0xFF:
            raise ValueError("JPEG: expected marker")
        marker = data[i + 1]
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # TEM / stray RSTn
            i += 2
            continue
        (seglen,) = struct.unpack(">H", data[i + 2 : i + 4])
        body = data[i + 4 : i + 2 + seglen]
        i += 2 + seglen
        if marker == 0xDB:  # DQT (possibly several tables)
            p = 0
            while p < len(body):
                pq, tq_id = body[p] >> 4, body[p] & 0x0F
                if pq != 0:
                    raise NotImplementedError("JPEG: 16-bit quant tables")
                tbl = np.frombuffer(body[p + 1 : p + 65], dtype=np.uint8)
                qt[tq_id] = tbl.astype(np.int32)  # zigzag order
                p += 65
        elif marker == 0xC4:  # DHT (possibly several tables)
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 0x0F
                counts = list(body[p + 1 : p + 17])
                nv = sum(counts)
                vals = list(body[p + 17 : p + 17 + nv])
                huff[(tc, th)] = _build_decode_table(counts, vals)
                p += 17 + nv
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 progressive
            progressive = marker == 0xC2
            prec = body[0]
            if prec != 8:
                raise NotImplementedError(f"JPEG: {prec}-bit precision")
            height, width = struct.unpack(">HH", body[1:5])
            nc = body[5]
            if nc not in (1, 3):
                raise NotImplementedError(f"JPEG: {nc}-component images")
            comps = []
            for c in range(nc):
                cid, hv, tq_id = body[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, tq_id))
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            mcux = -(-width // (8 * hmax))
            mcuy = -(-height // (8 * vmax))
            # coefficient store sized to the padded MCU grid; bdims is
            # each component's true block grid (non-interleaved scans)
            coefs = [
                np.zeros((mcuy * v, mcux * h, 64), dtype=np.int32)
                for _, h, v, _ in comps
            ]
            def _ceil_div(a, b):
                return -(-a // b)

            # component's true block grid: ceil(ceil(dim·f/fmax) / 8)
            bdims = [
                (_ceil_div(_ceil_div(height * v, vmax), 8),
                 _ceil_div(_ceil_div(width * h, hmax), 8))
                for _, h, v, _ in comps
            ]
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG: SOF{marker - 0xC0} coding process not supported"
            )
        elif marker == 0xDD:  # DRI
            (dri,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS — decode the scan, then keep parsing
            if comps is None:
                raise ValueError("JPEG: SOS before SOF")
            ns = body[0]
            scan = []
            for s in range(ns):
                cs, tda = body[1 + 2 * s], body[2 + 2 * s]
                idx = next(j for j, c in enumerate(comps) if c[0] == cs)
                # DC-refinement scans use no Huffman table at all and
                # AC scans no DC table: resolve lazily-absent ids to None
                scan.append((idx, huff.get((0, tda >> 4)),
                             huff.get((1, tda & 0x0F))))
            ss_, se_ = body[1 + 2 * ns], body[2 + 2 * ns]
            ahal = body[3 + 2 * ns]
            if not progressive:
                ss_, se_, ahal = 0, 63, 0
            if ss_ > 0 and ns != 1:
                raise ValueError("JPEG: interleaved AC progressive scan")
            segs, i = _entropy_segments(data, i)
            _run_scan(segs, scan, comps, coefs, bdims, mcux, mcuy, dri,
                      ss_, se_, ahal >> 4, ahal & 0x0F, progressive)
            n_scans += 1
        # APPn/COM/DNL etc.: skipped
    if comps is None or n_scans == 0:
        raise ValueError("JPEG: missing SOF/SOS")

    out = []
    for (_, h, v, tq_id), cf in zip(comps, coefs):
        q = qt[tq_id].astype(np.float64)
        n_by, n_bx = cf.shape[:2]
        zz = cf.reshape(-1, 64).astype(np.float64) * q[None, :]
        blk = np.zeros_like(zz)
        blk[:, ZIGZAG] = zz  # dequant, then dezigzag
        pix = np.einsum(
            "ux,nuv,vy->nxy", _C, blk.reshape(-1, 8, 8), _C
        ) + 128.0
        plane = (
            pix.reshape(n_by, n_bx, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(n_by * 8, n_bx * 8)
        )
        up = np.repeat(np.repeat(plane, vmax // v, axis=0), hmax // h, axis=1)
        out.append(up[:height, :width])
    if len(out) == 1:
        gray = np.clip(out[0], 0, 255).astype(np.uint8)
        return gray[:, :, None]
    y, cb, cr = out
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.stack([r, g, b], axis=2), 0, 255).astype(np.uint8)


# -------------------------------------------------------------- encode

# generated canonical tables (see module docstring): all 12 DC size
# categories at 4 bits; EOB, ZRL, every (run 0–15, size 1–10) and the
# 14 progressive EOBn run codes (r 1–14, s 0) at 8 bits — 176 codes,
# max canonical code 175 < 255, so no all-ones code at either length.
_DC_COUNTS = [0, 0, 0, 12] + [0] * 12
_DC_VALS = list(range(12))
_AC_COUNTS = [0] * 7 + [176] + [0] * 8
_AC_VALS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
] + [r << 4 for r in range(1, 15)]


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, val: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.acc = (self.acc << 1) | ((val >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:  # byte stuffing
                    self.out.append(0x00)
                self.acc = 0
                self.n = 0

    def flush(self) -> None:
        while self.n:
            self.write(1, 1)  # pad with 1-bits per T.81


def _size_cat(v: int) -> int:
    return int(abs(v)).bit_length()


def _encode_block(bw: _BitWriter, coef: np.ndarray, dc_tab: dict,
                  ac_tab: dict, pred: int) -> int:
    """One zigzag-order quantized block → bitstream; returns new DC pred."""
    diff = int(coef[0]) - pred
    s = _size_cat(diff)
    code, ln = dc_tab[s]
    bw.write(code, ln)
    if s:
        bw.write(diff if diff > 0 else diff + (1 << s) - 1, s)
    run = 0
    last_nz = int(np.max(np.nonzero(coef)[0])) if np.any(coef[1:]) else 0
    for k in range(1, 64):
        v = int(coef[k])
        if k > last_nz:
            break
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_tab[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        s = _size_cat(v)
        code, ln = ac_tab[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, ln = ac_tab[0x00]  # EOB
        bw.write(code, ln)
    return int(coef[0])


def _flush_eobrun(bw: _BitWriter, ac_tab: dict, eobrun: int,
                  be: list | None = None) -> int:
    """Emit a pending EOBn run code (+ its extra bits) and any banked
    refinement correction bits from the run's blocks; returns 0."""
    if eobrun > 0:
        nbits = eobrun.bit_length() - 1
        code, ln = ac_tab[nbits << 4]
        bw.write(code, ln)
        if nbits:
            bw.write(eobrun & ((1 << nbits) - 1), nbits)
    if be:
        for b in be:
            bw.write(b, 1)
        be.clear()
    return 0


def _enc_dc_first(bw: _BitWriter, dc_tab: dict, coef0, pred: int,
                  al: int) -> int:
    """Progressive DC first scan: difference coding of the
    point-transformed (>> Al) DC; returns the new predictor."""
    t = int(coef0) >> al
    diff = t - pred
    s = _size_cat(diff)
    code, ln = dc_tab[s]
    bw.write(code, ln)
    if s:
        bw.write(diff if diff > 0 else diff + (1 << s) - 1, s)
    return t


def _enc_ac_first(bw: _BitWriter, ac_tab: dict, coef, ss: int, se: int,
                  al: int, eobrun: int) -> int:
    """Progressive AC first scan over the band Ss..Se with EOB-run
    accumulation across blocks (T.81 G.1.2.2 / jcphuff
    encode_mcu_AC_first control flow)."""
    r = 0
    for k in range(ss, se + 1):
        v = int(coef[k])
        t = (-v if v < 0 else v) >> al
        if t == 0:
            r += 1
            continue
        if eobrun > 0:
            eobrun = _flush_eobrun(bw, ac_tab, eobrun)
        while r > 15:
            code, ln = ac_tab[0xF0]  # ZRL
            bw.write(code, ln)
            r -= 16
        s = t.bit_length()
        code, ln = ac_tab[(r << 4) | s]
        bw.write(code, ln)
        tv = -t if v < 0 else t
        bw.write(tv if tv > 0 else tv + (1 << s) - 1, s)
        r = 0
    if r > 0:
        eobrun += 1
        if eobrun == 0x7FFF:
            eobrun = _flush_eobrun(bw, ac_tab, eobrun)
    return eobrun


def _enc_ac_refine(bw: _BitWriter, ac_tab: dict, coef, ss: int, se: int,
                   al: int, eobrun: int, be: list) -> int:
    """Progressive AC refinement scan: newly-nonzero (±2^Al) symbols,
    ZRL folding bounded by the last newly-nonzero index, correction
    bits buffered per block (``br``) and emitted right after the
    covering symbol; blocks folded into an EOB run bank their bits in
    ``be`` until the run's EOBn flush (jcphuff encode_mcu_AC_refine)."""
    absv = []
    eob_k = ss - 1
    for k in range(ss, se + 1):
        v = int(coef[k])
        t = (-v if v < 0 else v) >> al
        absv.append(t)
        if t == 1:
            eob_k = k
    r = 0
    br: list = []
    for k in range(ss, se + 1):
        t = absv[k - ss]
        if t == 0:
            r += 1
            continue
        while r > 15 and k <= eob_k:
            eobrun = _flush_eobrun(bw, ac_tab, eobrun, be)
            code, ln = ac_tab[0xF0]
            bw.write(code, ln)
            r -= 16
            for b in br:
                bw.write(b, 1)
            br = []
        if t > 1:  # previously nonzero: one correction bit
            br.append(t & 1)
            continue
        eobrun = _flush_eobrun(bw, ac_tab, eobrun, be)
        code, ln = ac_tab[(r << 4) | 1]
        bw.write(code, ln)
        bw.write(0 if int(coef[k]) < 0 else 1, 1)  # sign of the new coef
        for b in br:
            bw.write(b, 1)
        br = []
        r = 0
    if r > 0 or br:
        eobrun += 1
        be.extend(br)
        if eobrun == 0x7FFF:
            eobrun = _flush_eobrun(bw, ac_tab, eobrun, be)
    return eobrun


def _encode_scan_entropy(samp, blocks, scan_comps, ss, se, ah, al,
                         dc_enc, ac_enc, bdims, mcux, mcuy,
                         dri: int) -> bytes:
    """Entropy-coded bytes (with RSTn markers if ``dri``) for one scan.
    Baseline scans arrive as (Ss=0, Se=63); progressive DC as
    (0, 0) and AC as single-component (Ss≥1) scans — the same MCU
    walk rule as the decoder's ``_run_scan``."""
    interleaved = len(scan_comps) > 1
    if interleaved:
        n_mcus = mcux * mcuy

        def mcu_blocks(m):
            my, mx = divmod(m, mcux)
            for ci in scan_comps:
                sh, sv = samp[ci]
                for by in range(sv):
                    for bx in range(sh):
                        yield ci, my * sv + by, mx * sh + bx
    else:
        ci0 = scan_comps[0]
        by_c, bx_c = bdims[ci0]
        n_mcus = by_c * bx_c

        def mcu_blocks(m):
            yield ci0, m // bx_c, m % bx_c

    out = bytearray()
    bw = _BitWriter()
    preds = {ci: 0 for ci in scan_comps}
    eobrun = 0
    be: list = []
    rst = 0
    for m in range(n_mcus):
        if dri and m and m % dri == 0:
            eobrun = _flush_eobrun(bw, ac_enc, eobrun, be)
            bw.flush()
            out += bw.out
            out += bytes([0xFF, 0xD0 + rst % 8])
            rst += 1
            bw = _BitWriter()
            preds = dict.fromkeys(preds, 0)
        for ci, r, c in mcu_blocks(m):
            coef = blocks[ci][r, c]
            if ss == 0 and se == 63:  # baseline full-spectral block
                preds[ci] = _encode_block(bw, coef, dc_enc, ac_enc, preds[ci])
            elif ss == 0:
                if ah == 0:
                    preds[ci] = _enc_dc_first(bw, dc_enc, coef[0],
                                              preds[ci], al)
                else:  # DC refinement: next magnitude bit, raw
                    bw.write((int(coef[0]) >> al) & 1, 1)
            elif ah == 0:
                eobrun = _enc_ac_first(bw, ac_enc, coef, ss, se, al, eobrun)
            else:
                eobrun = _enc_ac_refine(bw, ac_enc, coef, ss, se, al,
                                        eobrun, be)
    eobrun = _flush_eobrun(bw, ac_enc, eobrun, be)
    bw.flush()
    out += bw.out
    return bytes(out)


def _scaled_q(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg-style quality scaling of an Annex K base table."""
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int32)


def _seg(marker: int, body: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body


def _dht_seg(tc: int, th: int, counts, vals) -> bytes:
    return _seg(0xC4, bytes([tc << 4 | th]) + bytes(counts) + bytes(vals))


def _fdct_quant(plane: np.ndarray, q_zig: np.ndarray) -> np.ndarray:
    """(8n, 8m) float plane → (n·m, 64) zigzag-order quantized blocks."""
    hh, ww = plane.shape
    blocks = (
        plane.reshape(hh // 8, 8, ww // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
    ) - 128.0
    coefs = np.einsum("ux,nxy,vy->nuv", _C, blocks, _C)
    zz = coefs.reshape(-1, 64)[:, ZIGZAG]
    return np.round(zz / q_zig).astype(np.int32)


def encode_jpeg(arr: np.ndarray, quality: int = 85,
                subsample: str = "444",
                restart_interval: int = 0,
                progressive: bool = False) -> bytes:
    """uint8 (H, W), (H, W, 1) or (H, W, 3) → JFIF bytes.
    ``subsample``: "444" (no chroma subsampling) or "420" (2×2 chroma
    block-mean, the common photographic layout — also exercises the
    decoder's upsampling path). ``restart_interval`` > 0 emits DRI +
    RSTn markers every that many MCUs (what camera firmware writes for
    error resilience — exercises the decoder's restart path).
    ``progressive`` emits SOF2 with the libjpeg default scan script
    (interleaved DC at Al=1, spectral-selection AC first scans,
    successive-approximation AC and DC refinement scans) — the same
    coefficients bit-exactly, reordered across scans."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ch = a.shape
    if ch not in (1, 3):
        raise ValueError(f"JPEG encode: {ch}-channel input unsupported")
    if subsample not in ("444", "420"):
        raise ValueError(f"subsample must be '444' or '420', got {subsample!r}")
    if ch == 1:
        planes = [a[:, :, 0].astype(np.float64)]
        samp = [(1, 1)]
        q_ids = [0]
        q_tables = [_scaled_q(_Q_LUM, quality)]
    else:
        rgb = a.astype(np.float64)
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, cb, cr]
        samp = [(2, 2), (1, 1), (1, 1)] if subsample == "420" else \
            [(1, 1), (1, 1), (1, 1)]
        q_ids = [0, 1, 1]
        q_tables = [_scaled_q(_Q_LUM, quality), _scaled_q(_Q_CHROMA, quality)]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    # per-component plane at its own resolution, edge-padded to the MCU grid
    blocks = []  # per comp: (n_by, n_bx, zigzag blocks array)
    for (sh, sv), plane, qi in zip(samp, planes, q_ids):
        if (sh, sv) != (hmax, vmax):  # downsample by block mean
            fy, fx = vmax // sv, hmax // sh
            py = -plane.shape[0] % fy
            px = -plane.shape[1] % fx
            p = np.pad(plane, ((0, py), (0, px)), mode="edge")
            plane = p.reshape(
                p.shape[0] // fy, fy, p.shape[1] // fx, fx
            ).mean(axis=(1, 3))
        th, tw = mcuy * sv * 8, mcux * sh * 8
        plane = np.pad(
            plane,
            ((0, th - plane.shape[0]), (0, tw - plane.shape[1])),
            mode="edge",
        )
        zz = _fdct_quant(plane, q_tables[qi][ZIGZAG].astype(np.float64))
        blocks.append(zz.reshape(th // 8, tw // 8, 64))

    dc_enc = _build_encode_table(_DC_COUNTS, _DC_VALS)
    ac_enc = _build_encode_table(_AC_COUNTS, _AC_VALS)
    ncomp = len(planes)

    def cdiv(a, b):
        return -(-a // b)

    bdims = [
        (cdiv(cdiv(h * sv, vmax), 8), cdiv(cdiv(w * sh, hmax), 8))
        for sh, sv in samp
    ]
    if progressive:
        # libjpeg default scan script shape: interleaved DC first at
        # Al=1, luma AC split 1–5 / 6–63 at Al=2, chroma AC at Al=1,
        # then successive-approximation refinements and DC refinement.
        if ncomp == 1:
            script = [
                ([0], 0, 0, 0, 1),
                ([0], 1, 5, 0, 2),
                ([0], 6, 63, 0, 2),
                ([0], 1, 63, 2, 1),
                ([0], 0, 0, 1, 0),
                ([0], 1, 63, 1, 0),
            ]
        else:
            script = [
                ([0, 1, 2], 0, 0, 0, 1),
                ([0], 1, 5, 0, 2),
                ([2], 1, 63, 0, 1),
                ([1], 1, 63, 0, 1),
                ([0], 6, 63, 0, 2),
                ([0], 1, 63, 2, 1),
                ([0, 1, 2], 0, 0, 1, 0),
                ([2], 1, 63, 1, 0),
                ([1], 1, 63, 1, 0),
                ([0], 1, 63, 1, 0),
            ]
    else:
        script = [(list(range(ncomp)), 0, 63, 0, 0)]

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for qi, qtab in enumerate(q_tables):
        out += _seg(0xDB, bytes([qi]) + bytes(qtab[ZIGZAG].astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci, (sh, sv) in enumerate(samp):
        sof += bytes([ci + 1, (sh << 4) | sv, q_ids[ci]])
    out += _seg(0xC2 if progressive else 0xC0, sof)
    out += _dht_seg(0, 0, _DC_COUNTS, _DC_VALS)
    out += _dht_seg(1, 0, _AC_COUNTS, _AC_VALS)
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    for scan_comps, ss, se, ah, al in script:
        sos = bytes([len(scan_comps)])
        for ci in scan_comps:
            sos += bytes([ci + 1, 0x00])  # every component uses DC0/AC0
        sos += bytes([ss, se, (ah << 4) | al])
        out += _seg(0xDA, sos)
        out += _encode_scan_entropy(
            samp, blocks, scan_comps, ss, se, ah, al,
            dc_enc, ac_enc, bdims, mcux, mcuy, restart_interval,
        )
    out += b"\xff\xd9"  # EOI
    return bytes(out)
