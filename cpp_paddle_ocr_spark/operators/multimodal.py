"""Multimodal column plumbing: opaque binary media + typed metadata.

Images/audio/video are carried as ``binary`` columns with typed metadata,
processed via Arrow-batched ``mapInPandas`` — same batching discipline as the
extraction cascade.

``decode_media_meta(real=True)`` performs REAL header decoding for PNG
(IHDR), GIF (logical screen descriptor), JPEG (SOF segment scan) and BMP
(BITMAPINFOHEADER) — pure-Python byte parsing, no codec library — yielding
true width/height/media_type; formats without a parser get NULL dims.
Pixel-level work (resampling, frame extraction, CNN features) would need
PIL/ffmpeg, absent in this container, so those kernels stay STUBBED:
``real=False`` (default) runs a deterministic fake (hash-derived values)
that keeps every Spark-side contract real — schema, partitioning, UDF
signature, Arrow batch shape — and ``real=True`` raises
``NotImplementedError`` where the codec call would go.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("magic", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("media_type", T.StringType(), True),
    ]
)

_MAGICS = {
    b"\xff\xd8\xff": "image/jpeg",
    b"\x89PNG": "image/png",
    b"GIF8": "image/gif",
    b"RIFF": "audio/wav",
    b"<!DO": "text/html",
    b"<htm": "text/html",
}


def _fake_decode(blob: bytes) -> tuple[int, int]:
    """Deterministic stand-in for the codec: dims from a byte hash."""
    h = int.from_bytes(blob[:8].ljust(8, b"\0"), "little")
    return 64 + (h % 1920), 64 + ((h >> 16) % 1080)


def parse_image_dims(blob: bytes) -> tuple[int | None, int | None]:
    """Real (width, height) from the container header — pure-Python byte
    parsing of the published file formats, no codec library.

    PNG: 8-byte signature, first chunk is IHDR with big-endian u32 dims.
    GIF: 'GIF87a'/'GIF89a' then the logical screen descriptor (LE u16 dims).
    JPEG: scan marker segments for SOFn (C0-CF minus C4/C8/CC); dims are
    big-endian u16 at offsets 5/7 of the segment payload.
    BMP: BITMAPINFOHEADER signed LE i32 dims at offsets 18/22 (height may be
    negative for top-down bitmaps).
    """
    if blob.startswith(b"\x89PNG\r\n\x1a\n") and len(blob) >= 24:
        return (
            int.from_bytes(blob[16:20], "big"),
            int.from_bytes(blob[20:24], "big"),
        )
    if blob.startswith((b"GIF87a", b"GIF89a")) and len(blob) >= 10:
        return (
            int.from_bytes(blob[6:8], "little"),
            int.from_bytes(blob[8:10], "little"),
        )
    if blob.startswith(b"\xff\xd8"):
        i = 2
        while i + 9 <= len(blob):
            if blob[i] != 0xFF:
                i += 1
                continue
            marker = blob[i + 1]
            if marker == 0xFF:
                i += 1
                continue
            if marker in (0x01,) or 0xD0 <= marker <= 0xD9:
                i += 2  # standalone markers have no length field
                continue
            if i + 4 > len(blob):
                break
            seg_len = int.from_bytes(blob[i + 2 : i + 4], "big")
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                if i + 9 <= len(blob):
                    return (
                        int.from_bytes(blob[i + 7 : i + 9], "big"),
                        int.from_bytes(blob[i + 5 : i + 7], "big"),
                    )
                break
            i += 2 + seg_len
        return None, None
    if blob.startswith(b"BM") and len(blob) >= 26:
        return (
            int.from_bytes(blob[18:22], "little", signed=True),
            abs(int.from_bytes(blob[22:26], "little", signed=True)),
        )
    return None, None


def decode_media_meta(df: DataFrame, real: bool = False) -> DataFrame:
    """binary column → typed media metadata rows (mapInPandas fan-through).

    ``real=True`` parses true dims from PNG/GIF/JPEG/BMP headers (NULL dims
    for other formats); ``real=False`` keeps the deterministic fake used by
    the driver fixtures.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, blob in zip(pdf["url"], pdf["media"]):
                if blob is None:
                    rows.append((url, 0, None, None, None, None))
                    continue
                blob = bytes(blob)
                magic = blob[:4].hex() if blob else None
                mt = next(
                    (v for k, v in _MAGICS.items() if blob.startswith(k)),
                    "application/octet-stream",
                )
                if real:
                    w, h = parse_image_dims(blob)
                else:
                    w, h = _fake_decode(blob)
                rows.append((url, len(blob), magic, w, h, mt))
            yield pd.DataFrame(
                rows, columns=[f.name for f in MEDIA_META_SCHEMA.fields]
            )

    return df.select("url", F.col("media")).mapInPandas(fn, MEDIA_META_SCHEMA)


FEATURE_DIM = 8

_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("feature", T.ArrayType(T.DoubleType()), False),
    ]
)


def extract_media_features(df: DataFrame, real: bool = False) -> DataFrame:
    """binary column → deterministic FEATURE_DIM-dim embedding (fake CNN).

    Batch shape is real: one NumPy matrix per Arrow batch, vectorized hash
    folding — the stand-in for a batched model forward (X2 discipline).
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if real:
            raise NotImplementedError("real feature extraction needs a model runtime")
        for pdf in batches:
            feats = np.zeros((len(pdf), FEATURE_DIM), dtype=np.float64)
            for i, blob in enumerate(pdf["media"]):
                if not blob:
                    continue
                b = np.frombuffer(bytes(blob)[:4096], dtype=np.uint8)
                pad = (-b.size) % FEATURE_DIM
                m = np.pad(b, (0, pad)).reshape(-1, FEATURE_DIM).astype(np.float64)
                feats[i] = m.mean(axis=0) / 255.0
            yield pd.DataFrame(
                {"url": pdf["url"], "feature": list(feats)}
            )

    return df.select("url", F.col("media")).mapInPandas(fn, _FEATURE_SCHEMA)


def frame_sample(df: DataFrame, every_n_bytes: int = 65536, real: bool = False) -> DataFrame:
    """Video-frame-sampling stub: one row per sampled 'frame' (fan-out).

    Real implementation would demux + decode; the stub samples byte offsets,
    preserving the one-to-many row shape downstream operators rely on.
    """
    if real:
        raise NotImplementedError("real frame sampling needs ffmpeg")
    n_frames = (F.length("media") / F.lit(every_n_bytes)).cast("int") + 1
    return (
        df.select("url", "media", F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"))
        .select(
            "url",
            "frame_idx",
            (F.col("frame_idx") * every_n_bytes).alias("byte_offset"),
            F.substring(
                F.col("media"), F.col("frame_idx") * every_n_bytes + 1, 16
            ).alias("frame_header"),
        )
    )
