"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing (schemas, partitioning, Arrow batch shape,
`mapInPandas` signatures) is real and tested. The codec layer is split:
**PNG (r4), baseline AND progressive JPEG (r5), GIF incl. animation
(r5), PCM + IMA-ADPCM WAV (r4/r5), and Motion-JPEG video in all three
demuxed containers — AVI, MP4 and Matroska/WebM (r5) — decode for
real**; MP3/ADTS-AAC/Ogg-Opus/Vorbis/FLAC get real
header-derived durations; `probe_media` reports container/codec/dims/
duration for every format from native header walks
(functions/{png,jpeg,gif,imagex,avi,mp4,ebml,adpcm,mpegaudio,oggflac}.py
— pure stdlib + numpy, no PIL/ffmpeg). The remaining honest boundary is compressed
ESSENCE that genuinely requires codec libraries (h264/vp9/av1 frames,
MP3/AAC/opus samples): those keep clearly-marked deterministic fakes,
and `strict_codecs=True` raises `NotImplementedError` up front to
signal that the general-purpose codec layer is absent.

At 100 TB the rules encoded here are:
* media bytes travel as a `binary` column — never base64 strings, never
  through `collect()`;
* decode/resize/frame-sample run in `mapInPandas` so one Arrow batch
  amortizes the Python crossing for hundreds of blobs;
* outputs carry fixed StructType metadata so Catalyst can prune (a
  reader asking only for `width,height` never deserializes pixels).
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MEDIA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("kind", StringType(), False),       # image|audio|video
        StructField("payload", BinaryType(), True),     # opaque bytes
        StructField("mime", StringType(), True),
    ]
)

IMAGE_META = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("n_bytes", IntegerType(), False),
        StructField("sha", StringType(), False),
        StructField("features", ArrayType(FloatType()), True),
    ]
)

FRAME = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("payload", BinaryType(), True),
    ]
)


def _fake_decode(payload: bytes) -> tuple[int, int]:
    """STUB: deterministic fake for image formats without a native
    decoder (no PIL in container; PNG/JPEG/GIF/BMP/netpbm DO decode for
    real — see _try_decode_image). Derives a stable (width, height)
    from the byte digest so tests are reproducible. Replace body with
    `PIL.Image.open(io.BytesIO(...))`."""
    h = hashlib.sha256(payload or b"").digest()
    return 16 + h[0] % 240, 16 + h[1] % 240


def _try_decode_image(payload: bytes):
    """REAL decode for PNG (all variants), JPEG (baseline +
    progressive), GIF (first frame), lossless WebP (VP8L), BMP and
    netpbm payloads (functions/{png,jpeg,gif,vp8l,imagex}.py — stdlib
    + numpy, no external codec). Returns the pixel array or None for
    other formats / unsupported variants (those fall through to the
    fake)."""
    from ..functions import jpeg, png

    try:
        if png.is_png(payload):
            return png.decode_png(payload)
        if jpeg.is_jpeg(payload):
            return jpeg.decode_jpeg(payload)
        from ..functions import gif, imagex, vp8l

        if gif.is_gif(payload):
            return gif.decode_gif(payload)  # first frame
        if vp8l.is_webp(payload):
            return vp8l.decode_webp(payload)  # VP8L; lossy VP8 → stub
        if imagex.is_bmp(payload):
            return imagex.decode_bmp(payload)
        if imagex.is_pnm(payload):
            return imagex.decode_pnm(payload)
        if payload[:4] in (b"II*\x00", b"MM\x00*"):
            return imagex.decode_tiff(payload)  # none/LZW/deflate/PackBits/JPEG
        if imagex.is_ico(payload):
            return imagex.decode_ico(payload)  # largest PNG/DIB entry
    except (NotImplementedError, ValueError, IndexError):
        pass  # arithmetic-JPEG / VP8-lossy / corrupt → stub path
    return None


def _png_features(arr, dim: int) -> list[float]:
    """Classical pixel features for REAL decodes (learned embeddings are
    a model call and stay out of scope): luminance mean/std, 2×2 grid of
    luminance means, aspect ratio, channel count — all scaled to [-1, 1],
    padded/truncated to ``dim``."""
    import numpy as np

    a = arr.astype("float32")
    lum = a.mean(axis=2) / 255.0
    h, w = lum.shape
    grid = [
        float(lum[i * h // 2:(i + 1) * h // 2, j * w // 2:(j + 1) * w // 2].mean())
        for i in range(2) for j in range(2)
        if lum[i * h // 2:(i + 1) * h // 2, j * w // 2:(j + 1) * w // 2].size
    ] or [float(lum.mean())] * 4
    feats = [
        float(lum.mean()) * 2 - 1,
        float(lum.std()) * 2 - 1,
        *[g * 2 - 1 for g in (grid + grid)[:4]],
        float(np.tanh(w / max(h, 1) - 1.0)),
        arr.shape[2] / 4.0 * 2 - 1,
    ]
    return (feats + [0.0] * dim)[:dim]


def _fake_features(payload: bytes, dim: int = 8) -> list[float]:
    """STUB: deterministic fake feature extractor (no vision model in
    container): dim floats from the sha256 digest, in [-1, 1]."""
    h = hashlib.sha256(b"feat:" + (payload or b"")).digest()
    return [(h[i] - 128) / 128.0 for i in range(dim)]


def decode_images(
    media: DataFrame, feature_dim: int = 8, strict_codecs: bool = False
) -> DataFrame:
    """media(kind='image') → IMAGE_META via mapInPandas.

    PNG, JPEG (baseline + progressive), GIF, lossless WebP (VP8L),
    BMP, netpbm, TIFF and ICO payloads decode for REAL (true
    width/height, classical pixel features); other formats use the
    deterministic fake. `strict_codecs=True` raises
    NotImplementedError up front (for environments where
    general-purpose codecs beyond these are required)."""
    if strict_codecs:
        raise NotImplementedError(
            "general image decode requires PIL/torchvision — not present "
            "in this container; PNG/JPEG/GIF/VP8L-WebP/BMP/netpbm/TIFF/ICO "
            "decode natively, other formats use the deterministic fake"
        )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("media_id", "width", "height", "n_bytes", "sha", "features")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                arr = _try_decode_image(b)
                if arr is not None:
                    h, w = arr.shape[:2]
                    feats = _png_features(arr, feature_dim)
                else:
                    w, h = _fake_decode(b)
                    feats = _fake_features(b, feature_dim)
                out["media_id"].append(mid)
                out["width"].append(w)
                out["height"].append(h)
                out["n_bytes"].append(len(b))
                out["sha"].append(hashlib.sha256(b).hexdigest())
                out["features"].append(feats)
            yield pd.DataFrame(out)

    return media.where(F.col("kind") == "image").mapInPandas(fn, schema=IMAGE_META)


def _pick_frames(frames, every_n: int, max_frames: int):
    picked = []
    for i, frame in enumerate(frames):
        if i % max(every_n, 1) == 0:
            picked.append((i, frame))
            if len(picked) >= max_frames:
                break
    return picked or None


def _try_sample_video(b: bytes, every_n: int, max_frames: int):
    """REAL frame sampling for Motion-JPEG payloads in any of the three
    containers this repo demuxes natively — AVI (functions/avi.py, RIFF
    chunk walk), MP4 (functions/mp4.py, stsz/stsc/stco sample tables)
    and Matroska/WebM (functions/ebml.py, SimpleBlock walk). Each
    sampled frame is a standalone baseline JPEG the jpeg codec decodes.
    Returns [(source_frame_idx, jpeg_bytes)] or None for other
    containers / codecs (those fall through to the stub)."""
    from ..functions import avi, ebml, gif, mp4, png

    try:
        if avi.is_avi(b):
            return _pick_frames(avi.iter_frames(b), every_n, max_frames)
        if gif.is_gif(b):
            # animated GIF: frames are real decoded pixels, re-encoded
            # as standalone PNGs (the downstream-decodable contract)
            return _pick_frames(
                (png.encode_png(fr) for fr in gif.decode_gif_frames(b)),
                every_n, max_frames)
        if mp4.is_mp4(b):
            meta = mp4.parse_mp4(b)
            trk = next((t for t in meta["tracks"]
                        if t["kind"] == "video"
                        and t["codec"] in ("jpeg", "mjpa")), None)
            if trk is None:
                return None  # avc1/hev1/vp09 essence → stub path
            return _pick_frames(mp4.iter_samples(b, trk), every_n,
                                max_frames)
        if ebml.is_ebml(b):
            meta = ebml.parse_matroska(b)
            trk = next((t for t in meta["tracks"]
                        if t["kind"] == "video"
                        and t["codec"] == "V_MJPEG"), None)
            if trk is None:
                return None  # VP8/VP9/AV1 essence → stub path
            return _pick_frames(ebml.iter_blocks(b, trk["number"]),
                                every_n, max_frames)
    except (ValueError, struct.error, IndexError):
        # malformed container that passed the magic check → stub path
        return None
    return None


def sample_frames(
    media: DataFrame, every_n: int = 10, max_frames: int = 4,
    strict_codecs: bool = False,
) -> DataFrame:
    """media(kind='video') → FRAME rows via mapInPandas.

    Motion-JPEG payloads in AVI, MP4 and Matroska/WebM containers
    sample for REAL (native demux, functions/{avi,mp4,ebml}.py):
    every ``every_n``-th source frame, payload = the frame's own JPEG
    bytes — directly decodable downstream by functions/jpeg.py.
    Non-MJPEG essence (h264/vp9/av1 — codecs genuinely need ffmpeg)
    keeps the stub: deterministic byte slices with sequential
    frame_idx. Row-per-frame output keeps downstream (per-frame
    feature extract) embarrassingly parallel.
    """
    if strict_codecs:
        raise NotImplementedError(
            "general video decode requires ffmpeg — not present in this "
            "container; Motion-JPEG in AVI/MP4/Matroska samples natively, "
            "other codecs use the deterministic stub")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "payload": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                real = _try_sample_video(b, every_n, max_frames)
                if real is not None:
                    for idx, frame in real:
                        out["media_id"].append(mid)
                        out["frame_idx"].append(idx)
                        out["payload"].append(frame)
                    continue
                n = min(max_frames, max(1, len(b) // max(every_n, 1)))
                for i in range(n):
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["payload"].append(b[i * every_n : (i + 1) * every_n])
            yield pd.DataFrame(out)

    return media.where(F.col("kind") == "video").mapInPandas(fn, schema=FRAME)


RESIZED = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("src_width", IntegerType(), True),
        StructField("src_height", IntegerType(), True),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
        StructField("payload", BinaryType(), True),
    ]
)

AUDIO_META = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("duration_ms", IntegerType(), False),
        StructField("n_bytes", IntegerType(), False),
        StructField("sha", StringType(), False),
        StructField("features", ArrayType(FloatType()), True),
    ]
)


def resize_images(
    media: DataFrame, target_w: int = 224, target_h: int = 224,
    strict_codecs: bool = False,
) -> DataFrame:
    """media(kind='image') → aspect-fit resized rows via mapInPandas.

    The aspect-fit arithmetic (scale = min(tw/w, th/h), never upscale)
    is real for every format. PNG/JPEG/GIF/VP8L-WebP/BMP/netpbm/TIFF/
    ICO payloads get a REAL thumbnail: decode → nearest-neighbor
    resample → re-encode as PNG. Other payloads keep the digest-derived
    stand-in payload sized ∝ out_w·out_h so downstream batch-shape
    accounting behaves like a real thumbnail stage."""
    if strict_codecs:
        raise NotImplementedError(
            "general image resize requires PIL — not present in this "
            "container; PNG and baseline JPEG resize natively"
        )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions import png

        for pdf in batches:
            out = {k: [] for k in
                   ("media_id", "src_width", "src_height", "width", "height", "payload")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                arr = _try_decode_image(b)
                if arr is not None:
                    h, w = arr.shape[:2]
                else:
                    w, h = _fake_decode(b)
                scale = min(target_w / w, target_h / h, 1.0)
                ow, oh = max(1, round(w * scale)), max(1, round(h * scale))
                if arr is not None:
                    thumb = png.encode_png(png.resize_nearest(arr, ow, oh))
                else:
                    seed = hashlib.sha256(b"resize:%d:%d:" % (ow, oh) + b).digest()
                    n_out = max(1, (ow * oh) // 64)
                    thumb = (seed * (n_out // len(seed) + 1))[:n_out]
                out["media_id"].append(mid)
                out["src_width"].append(w)
                out["src_height"].append(h)
                out["width"].append(ow)
                out["height"].append(oh)
                out["payload"].append(thumb)
            yield pd.DataFrame(out)

    return media.where(F.col("kind") == "image").mapInPandas(fn, schema=RESIZED)


def _try_decode_wav(payload: bytes):
    """REAL decode for PCM WAV payloads (stdlib ``wave`` — the RIFF/WAVE
    container needs no external codec). Returns ``(duration_ms,
    samples: float32 ndarray in [-1, 1], rate)`` or None for non-WAV /
    compressed-WAV bytes (those fall through to the fake)."""
    import io
    import wave

    import numpy as np

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    try:
        with wave.open(io.BytesIO(payload)) as w:
            rate = w.getframerate()
            n = w.getnframes()
            width = w.getsampwidth()
            channels = w.getnchannels()
            frames = w.readframes(n)
    except Exception:
        return None  # non-PCM / truncated → stub path
    if width == 2:
        s = np.frombuffer(frames, dtype="<i2").astype("float32") / 32768.0
    elif width == 1:
        s = (np.frombuffer(frames, dtype="u1").astype("float32") - 128.0) / 128.0
    elif width == 3:  # 24-bit: widen each LE triple to int32, shift down
        raw = np.frombuffer(frames, dtype=np.uint8)
        raw = raw[: len(raw) - len(raw) % 3].reshape(-1, 3)
        v = (raw[:, 0].astype(np.int32)
             | raw[:, 1].astype(np.int32) << 8
             | raw[:, 2].astype(np.int32) << 16)
        v = np.where(v & 0x800000, v - (1 << 24), v)
        s = v.astype("float32") / float(1 << 23)
    elif width == 4:
        s = np.frombuffer(frames, dtype="<i4").astype("float32") / float(1 << 31)
    else:
        return None  # exotic widths → stub path
    if channels > 1:  # mixdown so ZCR/spectral features see one stream
        s = s[: len(s) - len(s) % channels].reshape(-1, channels).mean(axis=1)
    return (int(n * 1000 / max(rate, 1)), s, rate)


def _try_decode_audio(payload: bytes):
    """REAL decode for PCM WAV (stdlib ``wave``), IEEE-float WAV and
    G.711 A-law/µ-law WAV (functions/g711.py — closed-form segment
    expansion), IMA ADPCM WAV (functions/adpcm.py — published
    table-driven decode), and FLAC (functions/flac.py — RFC 9639
    LPC + Rice bitstream, bit-exact, CRC-verified). Returns
    (duration_ms, samples, rate) or None (→ stub path)."""
    wav = _try_decode_wav(payload)
    if wav is not None:
        return wav
    from ..functions import adpcm, flac, g711

    if len(payload) >= 12 and payload[:4] == b"RIFF" \
            and payload[8:12] == b"WAVE":
        ext = g711.decode_wav_ext(payload)
        if ext is not None:
            return ext
    if adpcm.is_ima_adpcm_wav(payload):
        try:
            samples, rate = adpcm.decode_ima_wav(payload)
        except ValueError:
            return None  # >2 channels / exotic nibble width → stub path
        if samples.ndim > 1:  # stereo: mixdown for ZCR/spectral features
            samples = samples.mean(axis=1)
        return (int(len(samples) * 1000 / max(rate, 1)), samples, rate)
    if flac.is_flac(payload):
        try:
            return flac.decode_flac_float(payload)
        except ValueError:
            return None  # corrupt/reserved-feature stream → stub path
    return None


def _try_probe_compressed_audio(payload: bytes):
    """REAL header-level metadata for MP3 / ADTS-AAC payloads
    (functions/mpegaudio.py — frame-header walk over published ISO
    tables; no sample decode). Returns the probe dict (duration_ms,
    sample_rate, ...) or None (→ nominal-bitrate fake duration)."""
    from ..functions import mpegaudio

    from ..functions import oggflac

    probe = mpegaudio.probe_adts_aac(payload)
    if probe is None:
        probe = oggflac.probe_ogg(payload) or oggflac.probe_flac(payload)
    if probe is None:
        probe = mpegaudio.probe_mp3(payload)
    return probe


def _wav_features(samples, dim: int) -> list[float]:
    """Classical audio features for REAL decodes: RMS, zero-crossing
    rate, and log-spaced FFT band energies — all in [-1, 1], padded /
    truncated to ``dim``. (MFCC-grade features are a model/DSP-library
    call and stay out of scope.)"""
    import numpy as np

    if samples.size == 0:
        return [0.0] * dim
    rms = float(np.sqrt(np.mean(samples**2)))
    zcr = float(np.mean(np.abs(np.diff(np.signbit(samples)))))
    spec = np.abs(np.fft.rfft(samples[: 1 << 14])) ** 2
    total = float(spec.sum()) or 1.0
    edges = np.unique(np.geomspace(1, max(len(spec) - 1, 1), 5).astype(int))
    bands = [float(spec[a:b].sum()) / total
             for a, b in zip(edges[:-1], edges[1:])]
    feats = [rms * 2 - 1, zcr * 2 - 1, *[b * 2 - 1 for b in (bands + [0.0] * 4)[:4]],
             float(np.tanh(samples.size / 1e6)), float(np.tanh(samples.mean() * 10))]
    return (feats + [0.0] * dim)[:dim]


def extract_audio_features(
    media: DataFrame, feature_dim: int = 8, bytes_per_ms: int = 16,
    strict_codecs: bool = False,
) -> DataFrame:
    """media(kind='audio') → AUDIO_META via mapInPandas.

    PCM WAV (stdlib ``wave``), IMA ADPCM WAV (functions/adpcm.py — a
    genuinely compressed format, 4 bits/sample) and FLAC
    (functions/flac.py — RFC 9639 LPC + Rice bitstream, bit-exact)
    payloads decode for REAL: true duration from the sample count,
    classical features (RMS, zero-crossing rate, FFT band energies)
    from the actual samples. MP3, ADTS-AAC and Ogg Opus/Vorbis
    payloads get a REAL duration/sample-rate from header walks
    (functions/mpegaudio.py and functions/oggflac.py — published spec
    fields, no codec needed) while their sample-level features keep
    the deterministic fake; unrecognized formats keep the fake
    entirely — duration is byte length at a nominal constant bitrate
    and features are sha256-derived."""
    if strict_codecs:
        raise NotImplementedError(
            "general audio decode requires ffmpeg/torchaudio — not present "
            "in this container; PCM/ADPCM/float/G.711 WAV and FLAC decode "
            "natively, other formats use the deterministic fake"
        )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in
                   ("media_id", "duration_ms", "n_bytes", "sha", "features")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                wav = _try_decode_audio(b)
                if wav is not None:
                    dur, samples, _rate = wav
                    feats = _wav_features(samples, feature_dim)
                else:
                    probe = _try_probe_compressed_audio(b)
                    dur = (probe["duration_ms"] if probe is not None
                           else len(b) // max(bytes_per_ms, 1))
                    feats = _fake_features(b, feature_dim)
                out["media_id"].append(mid)
                out["duration_ms"].append(dur)
                out["n_bytes"].append(len(b))
                out["sha"].append(hashlib.sha256(b).hexdigest())
                out["features"].append(feats)
            yield pd.DataFrame(out)

    return media.where(F.col("kind") == "audio").mapInPandas(fn, schema=AUDIO_META)


PROBE = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("container", StringType(), False),
        StructField("codec", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
        StructField("n_frames", IntegerType(), True),
        StructField("n_bytes", IntegerType(), False),
    ]
)

_WAV_TAGS = {1: "pcm", 3: "float", 6: "alaw", 7: "mulaw",
             0x11: "ima-adpcm", 0x55: "mp3"}


def _probe_one(b: bytes) -> dict:
    """Dispatch a payload to the native container parsers
    (functions/{png,jpeg,avi,mp4,ebml,adpcm,mpegaudio}.py) — header
    walks only, no essence decode. Curation pipelines filter on this
    (drop tiny images, cap video length, reject unknown containers)
    before paying for any decode."""
    import struct as _s

    from ..functions import avi, ebml, jpeg, mp4, mpegaudio, png

    out = {"container": "unknown", "codec": None, "width": None,
           "height": None, "duration_ms": None, "n_frames": None}
    try:
        if png.is_png(b):
            w, h = _s.unpack(">II", b[16:24])
            return {**out, "container": "png", "codec": "png",
                    "width": w, "height": h, "n_frames": 1}
        jp = jpeg.probe_jpeg(b)
        if jp is not None:
            return {**out, "container": "jpeg",
                    "codec": "jpeg-progressive" if jp["progressive"]
                    else "jpeg-baseline",
                    "width": jp["width"], "height": jp["height"],
                    "n_frames": 1}
        from ..functions import gif, imagex

        gp = gif.probe_gif(b)
        if gp is not None:
            return {**out, "container": "gif", "codec": "gif",
                    "width": gp["width"], "height": gp["height"],
                    "n_frames": gp["n_frames"]}
        if imagex.is_bmp(b):
            w, h = _s.unpack("<ii", b[18:26])
            return {**out, "container": "bmp", "codec": "bmp",
                    "width": w, "height": abs(h), "n_frames": 1}
        if imagex.is_pnm(b):
            arr = imagex.decode_pnm(b)
            return {**out, "container": "pnm",
                    "codec": "ppm" if b[1:2] == b"6" else "pgm",
                    "width": arr.shape[1], "height": arr.shape[0],
                    "n_frames": 1}
        ip = imagex.probe_ico(b)
        if ip is not None:
            return {**out, "container": "ico", "codec": "ico",
                    "width": ip["width"], "height": ip["height"],
                    "n_frames": ip["n_frames"]}
        tp = imagex.probe_tiff(b)
        if tp is not None:
            return {**out, "container": "tiff", "codec": "tiff",
                    "width": tp["width"], "height": tp["height"],
                    "n_frames": 1}
        wp = imagex.probe_webp(b)
        if wp is not None:
            return {**out, "container": "webp", "codec": wp["codec"],
                    "width": wp["width"], "height": wp["height"],
                    "n_frames": 1}
        if avi.is_avi(b):
            info = avi.avi_info(b)
            dur = int(info["usec_per_frame"] * info["total_frames"] / 1000)
            return {**out, "container": "avi", "codec": "mjpeg",
                    "width": info["width"], "height": info["height"],
                    "duration_ms": dur, "n_frames": info["total_frames"]}
        if mp4.is_mp4(b):
            meta = mp4.parse_mp4(b)
            trk = next((t for t in meta["tracks"] if t["kind"] == "video"),
                       None) or next(iter(meta["tracks"]), None)
            return {**out, "container": "mp4",
                    "codec": trk["codec"] if trk else None,
                    "width": trk["width"] if trk else None,
                    "height": trk["height"] if trk else None,
                    "duration_ms": meta["duration_ms"],
                    "n_frames": trk["n_samples"] if trk else None}
        if ebml.is_ebml(b):
            meta = ebml.parse_matroska(b)
            trk = next((t for t in meta["tracks"] if t["kind"] == "video"),
                       None) or next(iter(meta["tracks"]), None)
            return {**out, "container": meta["doctype"] or "matroska",
                    "codec": trk["codec"] if trk else None,
                    "width": trk["width"] if trk else None,
                    "height": trk["height"] if trk else None,
                    "duration_ms": meta["duration_ms"],
                    "n_frames": meta["n_blocks"]}
        if len(b) >= 12 and b[:4] == b"RIFF" and b[8:12] == b"WAVE":
            return _probe_wav(b, out)
        from ..functions import oggflac

        ogg = oggflac.probe_ogg(b)
        if ogg is not None:
            return {**out, "container": "ogg", "codec": ogg["codec"],
                    "duration_ms": ogg["duration_ms"]}
        flac = oggflac.probe_flac(b)
        if flac is not None:
            return {**out, "container": "flac", "codec": "flac",
                    "duration_ms": flac["duration_ms"]}
        aac = mpegaudio.probe_adts_aac(b)
        if aac is not None:
            return {**out, "container": "adts", "codec": "aac",
                    "duration_ms": aac["duration_ms"],
                    "n_frames": aac["n_frames"]}
        mp3 = mpegaudio.probe_mp3(b)
        if mp3 is not None:
            return {**out, "container": "mp3", "codec": "mp3",
                    "duration_ms": mp3["duration_ms"],
                    "n_frames": mp3["n_frames"]}
    except (ValueError, _s.error, IndexError):
        pass  # malformed container: report unknown, never fail the batch
    return out


def _probe_wav(b: bytes, out: dict) -> dict:
    import struct as _s

    tag = channels = rate = byterate = 0
    data_len = 0
    i = 12
    while i + 8 <= len(b):
        cc, size = b[i : i + 4], _s.unpack("<I", b[i + 4 : i + 8])[0]
        if cc == b"fmt " and size >= 16:
            tag, channels, rate, byterate = _s.unpack(
                "<HHII", b[i + 8 : i + 20])
        elif cc == b"data":
            data_len = size
        i += 8 + size + (size & 1)
    dur = int(data_len * 1000 / byterate) if byterate else None
    return {**out, "container": "wav",
            "codec": _WAV_TAGS.get(tag, "tag-0x%x" % tag),
            "duration_ms": dur, "n_frames": None}


def probe_media(media: DataFrame) -> DataFrame:
    """media (any kind) → PROBE rows via mapInPandas: container,
    codec, dimensions, duration — from native header walks only (the
    cheap pre-decode pass a 100 TB curation run gates on). Unknown
    containers return container='unknown' with NULL metadata rather
    than failing the batch."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in
                   ("media_id", "container", "codec", "width", "height",
                    "duration_ms", "n_frames", "n_bytes")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                p = _probe_one(b)
                out["media_id"].append(mid)
                for k in ("container", "codec", "width", "height",
                          "duration_ms", "n_frames"):
                    out[k].append(p[k])
                out["n_bytes"].append(len(b))
            yield pd.DataFrame(out)

    return media.mapInPandas(fn, schema=PROBE)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Pull media spans out of the interleaved `documents` table into the
    MEDIA shape (payload stays null until a fetch stage fills it — the
    ref is opaque). Pure column ops, no UDF."""
    spans = docs.select(
        "doc_id", F.posexplode("spans").alias("pos", "span")
    ).where(F.col("span.kind") == "media")
    return spans.select(
        F.concat_ws("#", "doc_id", F.col("pos").cast("string")).alias("media_id"),
        F.lit("image").alias("kind"),
        F.col("span.media_ref").cast("binary").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
    )
