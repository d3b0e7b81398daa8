"""MPEG audio (MP3) and ADTS AAC frame-header walks — pure stdlib.

Full MP3/AAC sample decode (hybrid filterbank / MDCT synthesis)
genuinely needs a codec library; but the FRAME HEADERS are published
fixed tables (ISO/IEC 11172-3 / 13818-7), so duration, bitrate,
sample rate and channel layout are real byte arithmetic. This upgrades
the multimodal audio stub from "duration = bytes at a nominal constant
bitrate" to the true header-derived duration for MP3/AAC payloads —
what a curation pipeline actually filters on — while sample-level
features stay on the documented deterministic fake.

No reference-repo counterpart (task-brief multimodal requirement).
"""

from __future__ import annotations

from typing import Optional

# kbps by (version group, layer); index 0 = free-format, 15 = invalid
_BITRATES = {
    (1, 1): [0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384,
             416, 448],
    (1, 2): [0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256,
             320, 384],
    (1, 3): [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
             256, 320],
    (2, 1): [0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192,
             224, 256],
    (2, 2): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144,
             160],
}
_BITRATES[(2, 3)] = _BITRATES[(2, 2)]

_RATES_MPEG1 = [44100, 48000, 32000]

_ADTS_RATES = [96000, 88200, 64000, 48000, 44100, 32000, 24000, 22050,
               16000, 12000, 11025, 8000]


def _mp3_frame(data: bytes, i: int) -> Optional[tuple[int, int, int]]:
    """Parse one MP3 frame header at ``i``; returns (frame_bytes,
    samples_per_frame, sample_rate) or None if not a valid header."""
    if i + 4 > len(data):
        return None
    h = int.from_bytes(data[i : i + 4], "big")
    if (h >> 21) & 0x7FF != 0x7FF:
        return None
    ver_bits = (h >> 19) & 3      # 3=MPEG1, 2=MPEG2, 0=MPEG2.5, 1=reserved
    layer_bits = (h >> 17) & 3    # 3=Layer I, 2=II, 1=III
    br_idx = (h >> 12) & 0xF
    sr_idx = (h >> 10) & 3
    padding = (h >> 9) & 1
    if ver_bits == 1 or layer_bits == 0 or br_idx in (0, 15) or sr_idx == 3:
        return None
    layer = 4 - layer_bits
    vgroup = 1 if ver_bits == 3 else 2
    rate = _RATES_MPEG1[sr_idx]
    if ver_bits == 2:
        rate //= 2
    elif ver_bits == 0:
        rate //= 4
    bitrate = _BITRATES[(vgroup, layer)][br_idx] * 1000
    if layer == 1:
        size = (12 * bitrate // rate + padding) * 4
        samples = 384
    else:
        samples = 1152 if (layer == 2 or vgroup == 1) else 576
        size = samples // 8 * bitrate // rate + padding
    return (size, samples, rate) if size > 4 else None


def probe_mp3(data: bytes) -> Optional[dict]:
    """Walk consecutive MP3 frames (skipping an ID3v2 prologue).
    Returns {duration_ms, sample_rate, bitrate_kbps (mean), n_frames}
    or None if the payload is not a consistent MP3 stream."""
    i = 0
    if data[:3] == b"ID3" and len(data) > 10:
        # syncsafe 28-bit size after the 10-byte ID3v2 header
        i = 10 + ((data[6] & 0x7F) << 21 | (data[7] & 0x7F) << 14
                  | (data[8] & 0x7F) << 7 | (data[9] & 0x7F))
    n_frames = 0
    total_samples = 0
    payload_bytes = 0
    rate = 0
    while i + 4 <= len(data):
        fr = _mp3_frame(data, i)
        if fr is None:
            if n_frames == 0:
                i += 1  # hunt for the first syncword
                if i > 64 * 1024:
                    return None
                continue
            break  # trailing garbage / ID3v1 tag: stop at last frame
        size, samples, rate = fr
        n_frames += 1
        total_samples += samples
        payload_bytes += size
        i += size
    if n_frames == 0 or rate == 0:
        return None
    # one lone syncword in arbitrary bytes is not an MP3: require either
    # a second consecutive frame or a clean end (EOF / ID3v1 tag)
    if n_frames == 1 and len(data) - i > 4 and data[i : i + 3] != b"TAG":
        return None
    dur_ms = int(total_samples * 1000 / rate)
    return {
        "duration_ms": dur_ms,
        "sample_rate": rate,
        "bitrate_kbps": int(payload_bytes * 8 / max(dur_ms, 1)),
        "n_frames": n_frames,
    }


def probe_adts_aac(data: bytes) -> Optional[dict]:
    """Walk ADTS AAC frames (ISO 13818-7: 0xFFF sync, 1024 samples per
    frame). Returns {duration_ms, sample_rate, channels, n_frames} or
    None."""
    i = 0
    n_frames = 0
    rate = 0
    channels = 0
    while i + 7 <= len(data):
        if data[i] != 0xFF or (data[i + 1] & 0xF6) != 0xF0:
            if n_frames == 0:
                return None
            break
        sr_idx = (data[i + 2] >> 2) & 0xF
        if sr_idx >= len(_ADTS_RATES):
            return None
        rate = _ADTS_RATES[sr_idx]
        channels = ((data[i + 2] & 1) << 2) | (data[i + 3] >> 6)
        size = ((data[i + 3] & 0x03) << 11 | data[i + 4] << 3
                | data[i + 5] >> 5)
        if size < 7:
            return None
        n_frames += 1
        i += size
    if n_frames == 0 or rate == 0:
        return None
    if n_frames == 1 and i < len(data):  # lone syncword + garbage
        return None
    return {
        "duration_ms": int(n_frames * 1024 * 1000 / rate),
        "sample_rate": rate,
        "channels": channels,
        "n_frames": n_frames,
    }


# ----------------------------------------------------- test-fixture mux

def make_mp3(n_frames: int, sr_idx: int = 0, br_idx: int = 9,
             layer_bits: int = 1) -> bytes:
    """Spec-shaped MPEG-1 frames with silent (zero) payloads — enough
    structure for any header walker; not decodable audio."""
    out = bytearray()
    h = (0x7FF << 21) | (3 << 19) | (layer_bits << 17) | (1 << 16)
    h |= (br_idx << 12) | (sr_idx << 10) | (1 << 3)
    for _ in range(n_frames):
        hdr = h.to_bytes(4, "big")
        fr = _mp3_frame(hdr, 0)
        assert fr is not None
        out += hdr + bytes(fr[0] - 4)
    return bytes(out)


def make_adts(n_frames: int, sr_idx: int = 4, channels: int = 2,
              body: int = 64) -> bytes:
    out = bytearray()
    for _ in range(n_frames):
        size = 7 + body
        hdr = bytearray(7)
        hdr[0] = 0xFF
        hdr[1] = 0xF1  # MPEG-4, layer 0, no CRC
        hdr[2] = (1 << 6) | (sr_idx << 2) | (channels >> 2)
        hdr[3] = ((channels & 3) << 6) | (size >> 11)
        hdr[4] = (size >> 3) & 0xFF
        hdr[5] = ((size & 7) << 5) | 0x1F
        hdr[6] = 0xFC
        out += bytes(hdr) + bytes(body)
    return bytes(out)
