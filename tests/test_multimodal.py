"""Multimodal plumbing stubs: schema/batching real, codec stubbed."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cpp_paddle_ocr_spark.operators.multimodal import (
    FEATURE_DIM,
    decode_media_meta,
    extract_media_features,
    frame_sample,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        ("u1", b"\xff\xd8\xff\xe0" + b"j" * 100),
        ("u2", b"\x89PNG\r\n" + b"p" * 50),
        ("u3", b"<!DOCTYPE html><p>x</p>"),
        ("u4", None),
        ("u5", b"RIFF" + b"w" * 200000),
    ]
    return spark.createDataFrame(rows, "url string, media binary").cache()


def test_decode_meta(spark, media):
    meta = {r.url: r for r in decode_media_meta(media).collect()}
    assert meta["u1"].media_type == "image/jpeg"
    assert meta["u2"].media_type == "image/png"
    assert meta["u3"].media_type == "text/html"
    assert meta["u4"].n_bytes == 0 and meta["u4"].width is None
    assert meta["u5"].media_type == "audio/wav"
    assert 64 <= meta["u1"].width < 64 + 1920


def test_decode_meta_deterministic(spark, media):
    a = sorted(map(tuple, decode_media_meta(media).collect()))
    b = sorted(map(tuple, decode_media_meta(media.repartition(3)).collect()))
    assert a == b


def test_real_decode_is_explicit_stub(spark, media):
    with pytest.raises(Exception) as ei:
        decode_media_meta(media, real=True).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )


def test_features_shape(spark, media):
    rows = {r.url: r.feature for r in extract_media_features(media).collect()}
    assert all(len(v) == FEATURE_DIM for v in rows.values())
    assert all(0.0 <= x <= 1.0 for x in rows["u1"])
    assert rows["u4"] == [0.0] * FEATURE_DIM


def test_frame_sample_fanout(spark, media):
    frames = frame_sample(media.filter(F.col("media").isNotNull()), every_n_bytes=65536)
    per_url = {
        r[0]: r[1]
        for r in frames.groupBy("url").agg(F.count("*")).collect()
    }
    assert per_url["u5"] == 4  # 200000 bytes / 65536 + 1
    assert per_url["u1"] == 1
