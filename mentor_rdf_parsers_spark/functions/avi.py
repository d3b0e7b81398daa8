"""Minimal MJPEG-in-AVI container codec (pure stdlib).

Motion-JPEG AVI is the one mainstream video container whose frames are
decodable without an external codec: the RIFF/AVI structure is a plain
chunk walk and each ``00dc``/``00db`` chunk is a standalone baseline
JPEG — which :mod:`mentor_rdf_parsers_spark.functions.jpeg` already
decodes. This gives the multimodal frame-sampling operator
(``operators/multimodal.py:sample_frames``) a REAL path: true frame
boundaries, true frame payloads, true fps/dimension metadata from the
``avih`` header.

Same pattern as the PNG/JPEG codecs (task-brief multimodal requirement;
the reference — a parser library — has no media path): the container
walk is complete for the format variant named here; everything else
(non-MJPEG streams, OpenDML index-only files) is rejected with a named
error, never silently mis-decoded.

Layout written by :func:`encode_mjpeg_avi` (and accepted, among others,
by the reader)::

    RIFF('AVI ' LIST('hdrl' avih LIST('strl' strh strf))
               LIST('movi' 00dc...) idx1)

All multi-byte integers little-endian; chunks pad to even length.
"""

from __future__ import annotations

import struct
from typing import Iterator, Optional


def is_avi(data: bytes) -> bool:
    return len(data) >= 12 and data[:4] == b"RIFF" and data[8:12] == b"AVI "


def _chunks(data: bytes, pos: int, end: int) -> Iterator[tuple[bytes, int, int]]:
    """Yield (fourcc, payload_offset, payload_size) over a chunk run.
    For LIST chunks the fourcc yielded is the *list type* prefixed with
    ``LIST:`` and the payload excludes the 4-byte type tag."""
    while pos + 8 <= end:
        fourcc = data[pos:pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = pos + 8
        if body + size > end:
            raise ValueError("AVI: chunk overruns container")
        if fourcc == b"LIST" and size >= 4:
            yield b"LIST:" + data[body:body + 4], body + 4, size - 4
        else:
            yield fourcc, body, size
        pos = body + size + (size & 1)  # even padding


def avi_info(data: bytes) -> dict:
    """Parse the ``avih`` main header: frame timing, count, dimensions."""
    if not is_avi(data):
        raise ValueError("not a RIFF/AVI payload")
    for cc, off, size in _chunks(data, 12, len(data)):
        if cc == b"LIST:hdrl":
            for cc2, off2, size2 in _chunks(data, off, off + size):
                if cc2 == b"avih" and size2 >= 40:
                    us_pf, _bps, _pad, _flags, total, _init, streams, _buf, w, h = (
                        struct.unpack_from("<10I", data, off2))
                    return {
                        "usec_per_frame": us_pf,
                        "fps": round(1e6 / us_pf, 3) if us_pf else 0.0,
                        "total_frames": total,
                        "streams": streams,
                        "width": w,
                        "height": h,
                    }
    raise ValueError("AVI: no avih header found")


def iter_frames(data: bytes) -> Iterator[bytes]:
    """Yield the raw bytes of every video frame chunk (``NNdc``/``NNdb``)
    in the ``movi`` list, in stream order. MJPEG frames start with the
    JPEG SOI marker; a frame chunk that does not is rejected — this
    reader is for MJPEG AVIs, not arbitrary codecs."""
    if not is_avi(data):
        raise ValueError("not a RIFF/AVI payload")
    seen_movi = False
    for cc, off, size in _chunks(data, 12, len(data)):
        if cc != b"LIST:movi":
            continue
        seen_movi = True
        for cc2, off2, size2 in _chunks(data, off, off + size):
            if cc2[2:4] in (b"dc", b"db"):
                frame = data[off2:off2 + size2]
                if frame[:2] != b"\xff\xd8":
                    raise ValueError(
                        "AVI: non-JPEG frame chunk — only MJPEG AVIs decode "
                        "here (compressed codecs need ffmpeg)")
                yield frame
    if not seen_movi:
        raise ValueError("AVI: no movi list found")


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    return fourcc + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")


def _list(list_type: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", list_type + body)


def encode_mjpeg_avi(
    frames: list, width: int, height: int, fps: float = 10.0,
    max_jpeg_size: Optional[int] = None,
) -> bytes:
    """JPEG-frame bytes → a minimal standards-shaped MJPEG AVI.

    Used to synthesize deterministic video fixtures (and as the encode
    half of the round-trip tests); writes the canonical
    hdrl(avih+strl(strh+strf))/movi/idx1 layout that any AVI reader —
    including :func:`iter_frames` — accepts."""
    if not frames:
        raise ValueError("AVI encode: need at least one frame")
    for f in frames:
        if bytes(f[:2]) != b"\xff\xd8":
            raise ValueError("AVI encode: frames must be JPEG (SOI missing)")
    us_pf = int(round(1e6 / fps)) if fps else 0
    buf = max_jpeg_size or max(len(f) for f in frames)
    avih = struct.pack(
        "<10I4I", us_pf, buf * int(fps or 1), 0, 0x10,  # AVIF_HASINDEX
        len(frames), 0, 1, buf, width, height, 0, 0, 0, 0)
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh", b"vids", b"MJPG", 0, 0, 0, 0,
        1, int(round(fps or 1)), 0, len(frames), buf, 0xFFFFFFFF, 0,
        0, 0, width, height)
    # BITMAPINFOHEADER
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0)
    hdrl = _list(b"hdrl", _chunk(b"avih", avih) +
                 _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)))
    movi_body = b"".join(_chunk(b"00dc", bytes(f)) for f in frames)
    movi = _list(b"movi", movi_body)
    # idx1: offsets relative to the start of the movi list type tag
    idx, off = b"", 4
    for f in frames:
        idx += struct.pack("<4sIII", b"00dc", 0x10, off, len(f))
        off += 8 + len(f) + (len(f) & 1)
    riff_body = b"AVI " + hdrl + movi + _chunk(b"idx1", idx)
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body
