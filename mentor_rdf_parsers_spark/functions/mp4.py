"""Pure-Python ISO BMFF (MP4/MOV) container demux + MJPEG muxer.

The task brief's multimodal requirement: make the Spark-side plumbing
real and push the honest codec boundary as far as stdlib+numpy allows.
For MP4 that boundary is the CONTAINER: box structure, track metadata
(duration, dimensions, codec fourcc) and per-sample demux via the
stsz/stsc/stco tables are pure byte arithmetic — no codec needed — so
they are real here. Frame ESSENCE stays honest: samples whose codec is
`jpeg`/`mjpa` (Motion-JPEG in MP4, each sample a standalone baseline
JPEG) decode for real via functions/jpeg.py; avc1/hev1/vp09 essence
genuinely needs ffmpeg and falls back to the documented stub in
operators/multimodal.py.

The muxer writes a minimal but fully standard one-video-track MP4
(ftyp + mdat + moov with mvhd/tkhd/mdhd/hdlr/vmhd/dinf/stbl) with a
`jpeg` VisualSampleEntry — QuickTime-compatible Motion-JPEG — so tests
can round-trip container → samples → pixels without any external
library, and the parser is exercised against spec-shaped input.

Box layouts follow ISO/IEC 14496-12 (public spec); no reference-repo
counterpart (the reference has no media path — task-brief requirement).
"""

from __future__ import annotations

import struct
from typing import Iterator, Optional

_CONTAINERS = {
    b"moov", b"trak", b"mdia", b"minf", b"stbl", b"dinf", b"edts",
    b"mvex", b"moof", b"traf",
}


def is_mp4(data: bytes) -> bool:
    return len(data) >= 12 and data[4:8] == b"ftyp"


def _iter_boxes(data: bytes, start: int, end: int):
    """Yield (fourcc, body_start, body_end) for the boxes in a span;
    handles 64-bit largesize and size==0 (box runs to span end)."""
    i = start
    while i + 8 <= end:
        (size,) = struct.unpack(">I", data[i : i + 4])
        typ = data[i + 4 : i + 8]
        body = i + 8
        if size == 1:  # 64-bit largesize follows
            if body + 8 > end:
                return
            (size,) = struct.unpack(">Q", data[body : body + 8])
            body += 8
            box_end = i + size
        elif size == 0:  # to end of enclosing span
            box_end = end
        else:
            box_end = i + size
        if box_end > end or box_end <= i:
            return  # malformed size: stop rather than loop
        yield typ, body, box_end
        i = box_end


def _find(data: bytes, start: int, end: int, path: list[bytes]):
    """First box matching a nested fourcc path; returns (body, end)."""
    span = (start, end)
    for name in path:
        found = None
        for typ, b, e in _iter_boxes(data, span[0], span[1]):
            if typ == name:
                found = (b, e)
                break
        if found is None:
            return None
        span = found
    return span


def _u32s(body: bytes, off: int, n: int) -> list[int]:
    return list(struct.unpack(">%dI" % n, body[off : off + 4 * n]))


def parse_mp4(data: bytes) -> dict:
    """Container metadata: movie duration + one dict per track with
    handler kind, codec fourcc, dimensions, timescale and the sample
    tables needed for demux (``iter_samples``)."""
    if not is_mp4(data):
        raise ValueError("not an ISO BMFF file (no ftyp)")
    out: dict = {"brand": data[8:12].decode("latin1"), "duration_ms": 0,
                 "tracks": []}
    moov = _find(data, 0, len(data), [b"moov"])
    if moov is None:
        raise ValueError("MP4: missing moov box")
    for typ, b, e in _iter_boxes(data, moov[0], moov[1]):
        if typ == b"mvhd":
            ver = data[b]
            if ver == 1:
                ts, dur = struct.unpack(">IQ", data[b + 20 : b + 32])
            else:
                ts, dur = struct.unpack(">II", data[b + 12 : b + 20])
            out["duration_ms"] = int(dur * 1000 / ts) if ts else 0
        elif typ == b"trak":
            trk = _parse_trak(data, b, e)
            if trk:
                out["tracks"].append(trk)
    return out


def _parse_trak(data: bytes, start: int, end: int) -> Optional[dict]:
    trk: dict = {"kind": "other", "codec": "", "width": 0, "height": 0,
                 "timescale": 0, "duration_ms": 0, "n_samples": 0,
                 "sizes": [], "stsc": [], "chunk_offsets": [], "sync": None}
    tkhd = _find(data, start, end, [b"tkhd"])
    if tkhd:
        # width/height are the trailing two 16.16 values of the box
        # (same tail position for version 0 and 1 layouts)
        w, h = struct.unpack(">II", data[tkhd[1] - 8 : tkhd[1]])
        trk["width"], trk["height"] = w >> 16, h >> 16
    mdia = _find(data, start, end, [b"mdia"])
    if mdia is None:
        return None
    mdhd = _find(data, mdia[0], mdia[1], [b"mdhd"])
    if mdhd:
        b = mdhd[0]
        if data[b] == 1:
            ts, dur = struct.unpack(">IQ", data[b + 20 : b + 32])
        else:
            ts, dur = struct.unpack(">II", data[b + 12 : b + 20])
        trk["timescale"] = ts
        trk["duration_ms"] = int(dur * 1000 / ts) if ts else 0
    hdlr = _find(data, mdia[0], mdia[1], [b"hdlr"])
    if hdlr:
        handler = data[hdlr[0] + 8 : hdlr[0] + 12]
        trk["kind"] = {b"vide": "video", b"soun": "audio"}.get(
            handler, handler.decode("latin1", "replace"))
    stbl = _find(data, mdia[0], mdia[1], [b"minf", b"stbl"])
    if stbl is None:
        return trk
    for typ, b, e in _iter_boxes(data, stbl[0], stbl[1]):
        body = data[b:e]
        if typ == b"stsd" and len(body) >= 16:
            # first sample entry's fourcc (codec)
            trk["codec"] = body[12:16].decode("latin1", "replace")
            if trk["kind"] == "video" and len(body) >= 44:
                sw, sh = struct.unpack(">HH", body[40:44])
                trk["width"] = trk["width"] or sw
                trk["height"] = trk["height"] or sh
        elif typ == b"stsz":
            fixed, count = struct.unpack(">II", body[4:12])
            trk["n_samples"] = count
            trk["sizes"] = ([fixed] * count if fixed
                            else _u32s(body, 12, count))
        elif typ == b"stsc":
            (count,) = struct.unpack(">I", body[4:8])
            trk["stsc"] = [
                tuple(_u32s(body, 8 + 12 * i, 3)) for i in range(count)
            ]
        elif typ == b"stco":
            (count,) = struct.unpack(">I", body[4:8])
            trk["chunk_offsets"] = _u32s(body, 8, count)
        elif typ == b"co64":
            (count,) = struct.unpack(">I", body[4:8])
            trk["chunk_offsets"] = list(
                struct.unpack(">%dQ" % count, body[8 : 8 + 8 * count]))
        elif typ == b"stss":
            (count,) = struct.unpack(">I", body[4:8])
            trk["sync"] = _u32s(body, 8, count)  # 1-based sample numbers
    return trk


def iter_samples(data: bytes, track: dict) -> Iterator[bytes]:
    """Demux a track's samples in order via stsc/stco/stsz — pure
    offset arithmetic, no codec. Works for any essence format."""
    sizes = track["sizes"]
    offsets = track["chunk_offsets"]
    stsc = track["stsc"]
    if not sizes or not offsets or not stsc:
        return
    si = 0
    n_chunks = len(offsets)
    for ei, (first, spc, _desc) in enumerate(stsc):
        last = stsc[ei + 1][0] - 1 if ei + 1 < len(stsc) else n_chunks
        for chunk in range(first, last + 1):
            pos = offsets[chunk - 1]
            for _ in range(spc):
                if si >= len(sizes):
                    return
                yield data[pos : pos + sizes[si]]
                pos += sizes[si]
                si += 1


# ------------------------------------------------------------------ mux

def _box(typ: bytes, *bodies: bytes) -> bytes:
    body = b"".join(bodies)
    return struct.pack(">I", len(body) + 8) + typ + body


def _full(typ: bytes, version: int, flags: int, body: bytes) -> bytes:
    return _box(typ, struct.pack(">B", version) + flags.to_bytes(3, "big"),
                body)


_UNITY_MATRIX = struct.pack(
    ">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)


def encode_mp4_mjpeg(frames: list[bytes], fps: int = 10,
                     width: int = 0, height: int = 0) -> bytes:
    """Minimal standard Motion-JPEG MP4: one video track whose samples
    are the given standalone JPEG byte strings (one chunk, all sync).
    Dimensions default to the first frame's SOF values when 0."""
    if not frames:
        raise ValueError("encode_mp4_mjpeg: no frames")
    if not (width and height):
        from .jpeg import decode_jpeg

        h_, w_ = decode_jpeg(frames[0]).shape[:2]
        width, height = width or w_, height or h_
    timescale = fps * 100
    delta = 100
    dur = delta * len(frames)

    ftyp = _box(b"ftyp", b"isom", struct.pack(">I", 0x200), b"isomiso2mp41")
    mdat_header_at = len(ftyp)
    mdat = _box(b"mdat", *frames)
    first_sample_off = mdat_header_at + 8

    stsd_entry = _box(
        b"jpeg",
        bytes(6), struct.pack(">H", 1),            # reserved, data_ref_idx
        bytes(16),                                  # predefined/reserved
        struct.pack(">HH", width, height),
        struct.pack(">II", 0x480000, 0x480000),     # 72 dpi
        bytes(4), struct.pack(">H", 1),             # reserved, frame_count
        bytes(32),                                  # compressorname
        struct.pack(">Hh", 24, -1),                 # depth, predefined
    )
    stbl = _box(
        b"stbl",
        _full(b"stsd", 0, 0, struct.pack(">I", 1) + stsd_entry),
        _full(b"stts", 0, 0, struct.pack(">III", 1, len(frames), delta)),
        _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, len(frames), 1)),
        _full(b"stsz", 0, 0, struct.pack(">II", 0, len(frames))
              + b"".join(struct.pack(">I", len(f)) for f in frames)),
        _full(b"stco", 0, 0, struct.pack(">II", 1, first_sample_off)),
    )
    minf = _box(
        b"minf",
        _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0)),
        _box(b"dinf", _full(b"dref", 0, 0, struct.pack(">I", 1)
                            + _full(b"url ", 0, 1, b""))),
        stbl,
    )
    mdia = _box(
        b"mdia",
        _full(b"mdhd", 0, 0, struct.pack(
            ">IIIIHH", 0, 0, timescale, dur, 0x55C4, 0)),  # lang 'und'
        _full(b"hdlr", 0, 0, bytes(4) + b"vide" + bytes(12)
              + b"VideoHandler\x00"),
        minf,
    )
    trak = _box(
        b"trak",
        _full(b"tkhd", 0, 7, struct.pack(">IIII", 0, 0, 1, 0)
              + struct.pack(">I", dur) + bytes(8)
              + struct.pack(">HHHH", 0, 0, 0, 0) + _UNITY_MATRIX
              + struct.pack(">II", width << 16, height << 16)),
        mdia,
    )
    moov = _box(
        b"moov",
        _full(b"mvhd", 0, 0, struct.pack(
            ">IIII", 0, 0, timescale, dur)
            + struct.pack(">IHH", 0x10000, 0x100, 0) + bytes(8)
            + _UNITY_MATRIX + bytes(24) + struct.pack(">I", 2)),
        trak,
    )
    return ftyp + mdat + moov
