"""BMP decode + TIFF/WebP header probes — pure stdlib + numpy.

Completes the image-format long tail for the multimodal operators:
uncompressed BMP (the one remaining common format with a codec-free
pixel layout) decodes for real; TIFF and WebP get header-only probes
(dimensions) — their pixel payloads (LZW/JPEG-in-TIFF, VP8/VP8L) stay
behind the documented stub boundary.

Layouts per the public specs: BITMAPINFOHEADER, TIFF 6.0 IFDs, and
the WebP container (VP8 keyframe header / VP8L signature / VP8X
canvas). No reference-repo counterpart (task-brief requirement).
"""

from __future__ import annotations

import struct
from typing import Optional

import numpy as np


# ------------------------------------------------------------------ BMP

def is_bmp(data: bytes) -> bool:
    return len(data) >= 26 and data[:2] == b"BM"


def decode_bmp(data: bytes) -> np.ndarray:
    """Uncompressed (BI_RGB) 8-bit-palette / 24 / 32-bit BMP →
    (H, W, 3) uint8 RGB. Rows are 4-byte aligned and stored bottom-up
    (top-down when height is negative)."""
    if not is_bmp(data):
        raise ValueError("not a BMP (bad magic)")
    (pixel_off,) = struct.unpack("<I", data[10:14])
    (hdr_size,) = struct.unpack("<I", data[14:18])
    if hdr_size < 40:
        raise NotImplementedError("BMP: BITMAPCOREHEADER not supported")
    w, h = struct.unpack("<ii", data[18:26])
    _planes, bpp = struct.unpack("<HH", data[26:30])
    (compression,) = struct.unpack("<I", data[30:34])
    if compression not in (0, 3):  # BI_RGB / BI_BITFIELDS (default masks)
        raise NotImplementedError(f"BMP: compression {compression}")
    if bpp not in (8, 24, 32):
        raise NotImplementedError(f"BMP: {bpp}-bit pixels")
    top_down = h < 0
    h = abs(h)
    palette = None
    if bpp == 8:
        (n_colors,) = struct.unpack("<I", data[46:50])
        n_colors = n_colors or 256
        pal = np.frombuffer(
            data[14 + hdr_size : 14 + hdr_size + 4 * n_colors],
            dtype=np.uint8).reshape(-1, 4)
        palette = pal[:, [2, 1, 0]]  # BGRA → RGB
    stride = (w * bpp // 8 + 3) & ~3
    need = pixel_off + stride * h
    if len(data) < need:
        raise ValueError("BMP: truncated pixel data")
    rows = np.frombuffer(data, dtype=np.uint8, count=stride * h,
                         offset=pixel_off).reshape(h, stride)
    if bpp == 8:
        idx = rows[:, :w]
        out = palette[np.minimum(idx, len(palette) - 1)]
    else:
        ch = bpp // 8
        px = rows[:, : w * ch].reshape(h, w, ch)
        out = px[:, :, [2, 1, 0]]  # BGR(A) → RGB
    return out if top_down else out[::-1]


def encode_bmp(arr: np.ndarray) -> bytes:
    """uint8 (H, W) or (H, W, 3) → 24-bit BI_RGB BMP (bottom-up)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = np.stack([a] * 3, axis=2)
    h, w = a.shape[:2]
    stride = (w * 3 + 3) & ~3
    body = np.zeros((h, stride), dtype=np.uint8)
    body[:, : w * 3] = a[::-1, :, [2, 1, 0]].reshape(h, w * 3)
    pixels = body.tobytes()
    header = (b"BM" + struct.pack("<IHHI", 54 + len(pixels), 0, 0, 54)
              + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                            len(pixels), 2835, 2835, 0, 0))
    return header + pixels


# ---------------------------------------------------------------- netpbm

def is_pnm(data: bytes) -> bool:
    return len(data) > 2 and data[0:1] == b"P" and data[1:2] in b"56"


def decode_pnm(data: bytes) -> np.ndarray:
    """Binary netpbm: P5 (gray) / P6 (RGB), 8-bit maxval → (H, W, C)
    uint8. Header = magic, whitespace/comment-separated width, height,
    maxval, one whitespace byte, then raw samples."""
    if not is_pnm(data):
        raise ValueError("not a binary PGM/PPM (bad magic)")
    fields = []
    i = 2
    while len(fields) < 3:
        while i < len(data) and data[i : i + 1].isspace():
            i += 1
        if i < len(data) and data[i] == ord("#"):  # comment to EOL
            while i < len(data) and data[i] not in b"\r\n":
                i += 1
            continue
        j = i
        while j < len(data) and not data[j : j + 1].isspace():
            j += 1
        if j == i:
            raise ValueError("PNM: truncated header")
        fields.append(int(data[i:j]))
        i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise NotImplementedError(f"PNM: maxval {maxval} (only 8-bit)")
    ch = 3 if data[1:2] == b"6" else 1
    need = w * h * ch
    px = np.frombuffer(data, dtype=np.uint8, count=need, offset=i)
    if len(px) < need:
        raise ValueError("PNM: truncated pixel data")
    arr = px.reshape(h, w, ch)
    return np.repeat(arr, 3, axis=2) if ch == 1 else arr


def encode_pnm(arr: np.ndarray) -> bytes:
    """uint8 (H, W) → P5, (H, W, 3) → P6."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 3 and a.shape[2] == 1:
        a = a[:, :, 0]
    magic = b"P6" if a.ndim == 3 else b"P5"
    h, w = a.shape[:2]
    return magic + f"\n{w} {h}\n255\n".encode() + a.tobytes()


# ----------------------------------------------------------------- TIFF

def probe_tiff(data: bytes) -> Optional[dict]:
    """First IFD's ImageWidth/ImageLength (tags 256/257)."""
    if len(data) < 8 or data[:4] not in (b"II*\x00", b"MM\x00*"):
        return None
    bo = "<" if data[:2] == b"II" else ">"
    (ifd_off,) = struct.unpack(bo + "I", data[4:8])
    if ifd_off + 2 > len(data):
        return None
    (n_entries,) = struct.unpack(bo + "H", data[ifd_off : ifd_off + 2])
    width = height = None
    for k in range(n_entries):
        e = ifd_off + 2 + 12 * k
        if e + 12 > len(data):
            return None
        tag, typ = struct.unpack(bo + "HH", data[e : e + 4])
        if tag in (256, 257):
            if typ == 3:  # SHORT
                (v,) = struct.unpack(bo + "H", data[e + 8 : e + 10])
            else:  # LONG
                (v,) = struct.unpack(bo + "I", data[e + 8 : e + 12])
            if tag == 256:
                width = v
            else:
                height = v
    if width is None or height is None:
        return None
    return {"width": width, "height": height}


def make_tiff(width: int, height: int, big_endian: bool = False) -> bytes:
    """Minimal spec-shaped TIFF: header + one IFD carrying the two
    dimension tags (no strip data — probes only read the IFD)."""
    bo = ">" if big_endian else "<"
    out = (b"MM\x00*" if big_endian else b"II*\x00")
    out += struct.pack(bo + "I", 8)
    entries = [
        struct.pack(bo + "HHI", 256, 4, 1) + struct.pack(bo + "I", width),
        struct.pack(bo + "HHI", 257, 4, 1) + struct.pack(bo + "I", height),
    ]
    out += struct.pack(bo + "H", len(entries)) + b"".join(entries)
    out += struct.pack(bo + "I", 0)  # no next IFD
    return out


# ----------------------------------------------------------------- WebP

def probe_webp(data: bytes) -> Optional[dict]:
    """Dimensions from the first VP8 (lossy keyframe), VP8L (lossless
    signature) or VP8X (extended canvas) chunk."""
    if len(data) < 16 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        return None
    i = 12
    while i + 8 <= len(data):
        cc = data[i : i + 4]
        (size,) = struct.unpack("<I", data[i + 4 : i + 8])
        body = data[i + 8 : i + 8 + size]
        if cc == b"VP8 " and len(body) >= 10:
            # 3-byte frame tag, 3-byte start code 9d 01 2a, then dims
            if body[3:6] == b"\x9d\x01\x2a":
                w, h = struct.unpack("<HH", body[6:10])
                return {"width": w & 0x3FFF, "height": h & 0x3FFF,
                        "codec": "vp8"}
        elif cc == b"VP8L" and len(body) >= 5 and body[0] == 0x2F:
            bits = int.from_bytes(body[1:5], "little")
            return {"width": (bits & 0x3FFF) + 1,
                    "height": ((bits >> 14) & 0x3FFF) + 1,
                    "codec": "vp8l"}
        elif cc == b"VP8X" and len(body) >= 10:
            w = int.from_bytes(body[4:7], "little") + 1
            h = int.from_bytes(body[7:10], "little") + 1
            return {"width": w, "height": h, "codec": "vp8x"}
        i += 8 + size + (size & 1)
    return None


def make_webp_vp8l_header(width: int, height: int) -> bytes:
    """Spec-shaped WebP wrapper with a VP8L signature + dimension bits
    (no pixel stream — probes only; decode honestly needs libwebp)."""
    bits = (width - 1) & 0x3FFF | (((height - 1) & 0x3FFF) << 14)
    body = bytes([0x2F]) + bits.to_bytes(4, "little")
    chunk = b"VP8L" + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
