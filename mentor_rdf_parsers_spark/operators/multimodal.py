"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing (schemas, partitioning, Arrow batch shape,
`mapInPandas` signatures) is real and tested; the actual codec calls are
STUBBED behind deterministic fakes because the decode libraries (PIL,
ffmpeg, torchaudio, …) are not in this container — each fake is clearly
marked and raises `NotImplementedError` when `strict_codecs=True`.

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
    """STUB: deterministic fake for image decode (no PIL in container).
    Derives a stable (width, height) from the byte digest so tests are
    reproducible. Replace body with `PIL.Image.open(io.BytesIO(...))`."""
    h = hashlib.sha256(payload or b"").digest()
    return 16 + h[0] % 240, 16 + h[1] % 240


def _fake_features(payload: bytes, dim: int = 8) -> list[float]:
    """STUB: deterministic fake feature extractor (no vision model in
    container): dim floats from the sha256 digest, in [-1, 1]."""
    h = hashlib.sha256(b"feat:" + (payload or b"")).digest()
    return [(h[i] - 128) / 128.0 for i in range(dim)]


def decode_images(
    media: DataFrame, feature_dim: int = 8, strict_codecs: bool = False
) -> DataFrame:
    """media(kind='image') → IMAGE_META via mapInPandas.

    `strict_codecs=True` surfaces the stub as NotImplementedError (for
    environments where a real codec is expected)."""
    if strict_codecs:
        raise NotImplementedError(
            "image decode requires PIL/torchvision — not present in this "
            "container; plumbing is exercised with the deterministic fake"
        )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("media_id", "width", "height", "n_bytes", "sha", "features")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                w, h = _fake_decode(b)
                out["media_id"].append(mid)
                out["width"].append(w)
                out["height"].append(h)
                out["n_bytes"].append(len(b))
                out["sha"].append(hashlib.sha256(b).hexdigest())
                out["features"].append(_fake_features(b, feature_dim))
            yield pd.DataFrame(out)

    return media.where(F.col("kind") == "image").mapInPandas(fn, schema=IMAGE_META)


def sample_frames(
    media: DataFrame, every_n: int = 10, max_frames: int = 4,
    strict_codecs: bool = False,
) -> DataFrame:
    """media(kind='video') → FRAME rows (frame-sampling plumbing).

    STUB decode: 'frames' are deterministic byte slices of the payload;
    real impl would ffmpeg-seek inside mapInPandas. Row-per-frame output
    keeps downstream (per-frame feature extract) embarrassingly parallel.
    """
    if strict_codecs:
        raise NotImplementedError("video decode requires ffmpeg — stubbed here")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "payload": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
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
    is real; the pixel resample is the STUB part — the output payload is
    a deterministic digest-derived stand-in sized ∝ out_w·out_h, so
    downstream batch-shape/size accounting behaves like a real thumbnail
    stage. Replace the payload line with `PIL.Image.resize` when codecs
    exist."""
    if strict_codecs:
        raise NotImplementedError(
            "image resize requires PIL — not present in this container"
        )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in
                   ("media_id", "src_width", "src_height", "width", "height", "payload")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                w, h = _fake_decode(b)
                scale = min(target_w / w, target_h / h, 1.0)
                ow, oh = max(1, round(w * scale)), max(1, round(h * scale))
                seed = hashlib.sha256(b"resize:%d:%d:" % (ow, oh) + b).digest()
                n_out = max(1, (ow * oh) // 64)
                fake = (seed * (n_out // len(seed) + 1))[:n_out]
                out["media_id"].append(mid)
                out["src_width"].append(w)
                out["src_height"].append(h)
                out["width"].append(ow)
                out["height"].append(oh)
                out["payload"].append(fake)
            yield pd.DataFrame(out)

    return media.where(F.col("kind") == "image").mapInPandas(fn, schema=RESIZED)


def extract_audio_features(
    media: DataFrame, feature_dim: int = 8, bytes_per_ms: int = 16,
    strict_codecs: bool = False,
) -> DataFrame:
    """media(kind='audio') → AUDIO_META via mapInPandas.

    Duration is derived from the byte length at a nominal constant
    bitrate (real impl reads the container header); the MFCC-ish feature
    vector is the STUB (sha256-derived floats, like the image fake)."""
    if strict_codecs:
        raise NotImplementedError(
            "audio decode requires ffmpeg/torchaudio — stubbed here"
        )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in
                   ("media_id", "duration_ms", "n_bytes", "sha", "features")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                out["media_id"].append(mid)
                out["duration_ms"].append(len(b) // max(bytes_per_ms, 1))
                out["n_bytes"].append(len(b))
                out["sha"].append(hashlib.sha256(b).hexdigest())
                out["features"].append(_fake_features(b, feature_dim))
            yield pd.DataFrame(out)

    return media.where(F.col("kind") == "audio").mapInPandas(fn, schema=AUDIO_META)


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
