"""Pure-Python GIF codec (stdlib + numpy): LZW decode, palettes,
interlacing, animation frames — and an encoder for fixtures/thumbnails.

GIF needs no external codec: LZW over palette indices plus fixed-layout
headers (GIF87a/89a). Common in web-scraped corpora (and the one
legacy format where "image" and "video" blur — animated GIFs sample
like video). Decode returns RGB frames with per-frame disposal applied
to the logical screen, so downstream sees what a browser would.

Decode cost model: the LZW loop is per-code Python (a code covers
several pixels, so it's sub-O(pixels)); palette mapping, interlace
reordering and disposal compositing are numpy. Fine for
fixture/thumbnail/web-asset scale.

No reference-repo counterpart (task-brief multimodal requirement);
format per the public GIF89a specification.
"""

from __future__ import annotations

import struct
from typing import Iterator, Optional

import numpy as np


def is_gif(data: bytes) -> bool:
    return data[:6] in (b"GIF87a", b"GIF89a")


def probe_gif(data: bytes) -> Optional[dict]:
    """Header-only probe: logical screen size + frame/loop info."""
    if not is_gif(data) or len(data) < 13:
        return None
    w, h = struct.unpack("<HH", data[6:10])
    n_frames = 0
    try:
        for _ in _iter_blocks(data):
            n_frames += 1
    except ValueError:
        pass  # truncated: report what was walkable
    return {"width": w, "height": h, "n_frames": max(n_frames, 1)}


def _skip_subblocks(data: bytes, i: int) -> int:
    while True:
        if i >= len(data):
            raise ValueError("GIF: truncated sub-blocks")
        n = data[i]
        i += 1 + n
        if n == 0:
            return i


def _iter_blocks(data: bytes):
    """Yield (image_descriptor_offset, gce or None) per frame."""
    i = 13
    gct_flag = data[10] & 0x80
    if gct_flag:
        i += 3 * (2 << (data[10] & 0x07))
    gce = None
    while i < len(data):
        b = data[i]
        if b == 0x3B:  # trailer
            return
        if b == 0x21:  # extension
            label = data[i + 1]
            if label == 0xF9 and data[i + 2] >= 4:  # graphic control
                gce = data[i + 3 : i + 3 + 4]
            i = _skip_subblocks(data, i + 2)
            continue
        if b == 0x2C:  # image descriptor
            yield i, gce
            gce = None
            j = i + 9
            if data[j] & 0x80:  # local color table
                j += 1 + 3 * (2 << (data[j] & 0x07))
            else:
                j += 1
            i = _skip_subblocks(data, j + 1)  # +1: LZW min code size
            continue
        raise ValueError(f"GIF: unknown block 0x{b:02x}")
    raise ValueError("GIF: missing trailer")


def _lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> np.ndarray:
    """GIF-variant LZW: variable code width, clear/eoi codes, MSB-last
    bit packing inside little-endian byte stream."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = np.empty(n_pixels, dtype=np.uint8)
    n_out = 0
    # dictionary as index->bytes; rebuilt on clear
    base = [bytes([c]) for c in range(clear)] + [b"", b""]
    table = list(base)
    width = min_code_size + 1
    acc = 0
    nbits = 0
    prev: Optional[bytes] = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table = list(base)
                width = min_code_size + 1
                prev = None
                continue
            if code == eoi:
                return out[:n_out]
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                if len(table) < 4096:  # deferred-clear: table freezes
                    table.append(prev + entry[:1])
            elif code == len(table) and code < 4096:
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError("GIF: LZW code out of range")
            take = min(len(entry), n_pixels - n_out)
            out[n_out : n_out + take] = np.frombuffer(
                entry[:take], dtype=np.uint8)
            n_out += take
            if n_out >= n_pixels:
                return out
            prev = entry
            if len(table) == (1 << width) and width < 12:
                width += 1
    return out[:n_out]


_INTERLACE_ROWS = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif_frames(data: bytes) -> Iterator[np.ndarray]:
    """Yield each frame as an (H, W, 3) uint8 RGB array on the logical
    screen, with GIF89a disposal methods 0/1 (leave), 2 (restore to
    background) and 3 (restore to previous) applied between frames."""
    if not is_gif(data):
        raise ValueError("not a GIF (bad signature)")
    if len(data) < 13:
        raise ValueError("GIF: truncated header")
    w, h = struct.unpack("<HH", data[6:10])
    # plausibility cap: u16 dims allow a 65535² screen (12.9 GB RGB) —
    # a corrupt header must raise, not OOM an executor task
    if w == 0 or h == 0 or w * h > (1 << 26):
        raise ValueError(f"GIF: implausible screen {w}x{h}")
    packed = data[10]
    bg_index = data[11]
    gct = None
    i = 13
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(data[13 : 13 + 3 * n], dtype=np.uint8
                            ).reshape(n, 3)
        i += 3 * n
    if gct is not None and bg_index < len(gct):
        screen = np.tile(gct[bg_index], (h, w, 1)).astype(np.uint8)
    else:
        screen = np.zeros((h, w, 3), dtype=np.uint8)
    background = screen.copy()

    for off, gce in _iter_blocks(data):
        if off + 10 > len(data):
            raise ValueError("GIF: truncated image descriptor")
        fx, fy, fw, fh = struct.unpack("<HHHH", data[off + 1 : off + 9])
        # a frame must fit the logical screen — this also bounds the
        # LZW output allocation against corrupt descriptors
        if fw == 0 or fh == 0 or fx + fw > w or fy + fh > h:
            raise ValueError(f"GIF: frame {fw}x{fh}@{fx},{fy} "
                             f"outside {w}x{h} screen")
        flags = data[off + 9]
        j = off + 10
        ct = gct
        if flags & 0x80:
            n = 2 << (flags & 0x07)
            ct = np.frombuffer(data[j : j + 3 * n], dtype=np.uint8
                               ).reshape(n, 3)
            j += 3 * n
        if ct is None:
            raise ValueError("GIF: frame without any color table")
        min_code = data[j]
        j += 1
        # gather LZW sub-blocks
        chunks = []
        while True:
            n = data[j]
            j += 1
            if n == 0:
                break
            chunks.append(data[j : j + n])
            j += n
        idx = _lzw_decode(min_code, b"".join(chunks), fw * fh)
        if len(idx) < fw * fh:  # pad truncated streams with background
            idx = np.pad(idx, (0, fw * fh - len(idx)))
        idx = idx.reshape(fh, fw)
        if flags & 0x40:  # interlaced: reorder rows
            de = np.empty_like(idx)
            r = 0
            for start, step in _INTERLACE_ROWS:
                rows = range(start, fh, step)
                for y in rows:
                    de[y] = idx[r]
                    r += 1
            idx = de
        rgb = ct[np.minimum(idx, len(ct) - 1)]

        transparent = gce[3] if gce is not None and (gce[0] & 0x01) else None
        disposal = (gce[0] >> 2) & 0x07 if gce is not None else 0
        prev_region = screen[fy : fy + fh, fx : fx + fw].copy()
        region = screen[fy : fy + fh, fx : fx + fw]
        if transparent is not None:
            mask = idx != transparent
            region[mask] = rgb[mask]
        else:
            region[:] = rgb
        yield screen.copy()
        if disposal == 2:
            screen[fy : fy + fh, fx : fx + fw] = (
                background[fy : fy + fh, fx : fx + fw])
        elif disposal == 3:
            screen[fy : fy + fh, fx : fx + fw] = prev_region


def decode_gif(data: bytes) -> np.ndarray:
    """First frame as (H, W, 3) uint8 RGB."""
    for frame in decode_gif_frames(data):
        return frame
    raise ValueError("GIF: no image data")


# -------------------------------------------------------------- encode

def _lzw_encode(min_code_size: int, indices: np.ndarray) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    table = {bytes([c]): c for c in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int):
        nonlocal acc, nbits, width
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    prev = b""
    for c in indices.tobytes():
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
        else:
            emit(clear)
            table = {bytes([k]): k for k in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        prev = bytes([c])
    if prev:
        emit(table[prev])
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(frames, delay_cs: int = 10, interlace: bool = False) -> bytes:
    """uint8 (H, W, 3) frame(s) → GIF89a bytes. Colors are quantized to
    a deterministic 6×7×6 level grid (252-entry palette) — fixtures and
    thumbnails, not archival fidelity. Multiple frames become an
    animation with per-frame GCE delays."""
    if isinstance(frames, np.ndarray):
        frames = [frames]
    if not frames:
        raise ValueError("encode_gif: no frames")
    h, w = frames[0].shape[:2]
    levels = (
        np.linspace(0, 255, 6).astype(np.uint8),
        np.linspace(0, 255, 7).astype(np.uint8),
        np.linspace(0, 255, 6).astype(np.uint8),
    )
    palette = np.zeros((256, 3), dtype=np.uint8)
    k = 0
    for r in levels[0]:
        for g in levels[1]:
            for b in levels[2]:
                palette[k] = (r, g, b)
                k += 1

    def quant(fr: np.ndarray) -> np.ndarray:
        fr = np.asarray(fr, dtype=np.uint8)
        if fr.ndim == 2:
            fr = np.stack([fr] * 3, axis=2)
        ri = np.clip((fr[:, :, 0].astype(int) * 5 + 127) // 255, 0, 5)
        gi = np.clip((fr[:, :, 1].astype(int) * 6 + 127) // 255, 0, 6)
        bi = np.clip((fr[:, :, 2].astype(int) * 5 + 127) // 255, 0, 5)
        return (ri * 42 + gi * 6 + bi).astype(np.uint8)

    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | 0x07, 0, 0])  # GCT present, 256 entries
    out += palette.tobytes()
    if len(frames) > 1:
        # Netscape loop extension
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for fr in frames:
        idx = quant(fr)
        if len(frames) > 1:
            out += b"\x21\xf9\x04" + bytes([0]) + struct.pack(
                "<H", delay_cs) + b"\x00\x00"
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h)
        out += bytes([0x40 if interlace else 0])
        if interlace:
            order = []
            for start, step in _INTERLACE_ROWS:
                order.extend(range(start, h, step))
            idx = idx[np.array(order)]
        out += bytes([8])  # LZW min code size
        lzw = _lzw_encode(8, idx.reshape(-1))
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)
