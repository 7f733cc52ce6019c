"""Embedding quantization codec (operators/quantize.py): round-trip bounds,
zero-vector edge, and preservation of ANN structure on dequantized codes."""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from cpp_paddle_ocr_spark.operators.quantize import (  # noqa: E402
    dequantize,
    quantization_report,
    quantize_embeddings,
)

SF = "/root/testdata/sf0.001"


def test_codec_bounds_and_zero_vector(spark):
    df = spark.createDataFrame(
        [(0, [1.0, -2.0, 0.5, 2.0]), (1, [0.0, 0.0, 0.0, 0.0])],
        "vec_id bigint, embedding array<float>",
    )
    rows = {r.vec_id: r for r in quantize_embeddings(df).collect()}
    # scale = max|v|/127; codes within [-127, 127]; extremes hit ±127
    assert abs(rows[0].scale - 2.0 / 127) < 1e-12
    assert max(rows[0].qemb) == 127 and min(rows[0].qemb) == -127
    assert rows[1].scale == 0.0 and rows[1].qemb == [0, 0, 0, 0]

    rep = {r.vec_id: r for r in quantization_report(df).collect()}
    # reconstruction error bounded by scale/2 (+6dp rounding slack)
    assert rep[0].max_abs_err <= rows[0].scale / 2 + 1e-6
    assert rep[0].cos_roundtrip > 0.999
    assert rep[1].max_abs_err == 0.0 and rep[1].cos_roundtrip == 1.0


def test_report_on_fixture_embeddings(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    rep = quantization_report(emb)
    n = emb.count()
    rows = rep.collect()
    assert len(rows) == n
    # int8 with per-vector scale keeps direction to ~1e-4 cosine on real
    # 64-dim vectors
    assert all(r.cos_roundtrip >= 0.9999 for r in rows)
    assert all(r.max_abs_err <= r.scale / 2 + 1e-6 for r in rows)


def test_ann_topk_preserved_on_dequantized(spark):
    """The codec's purpose: cosine top-k over dequantized int8 codes must
    essentially reproduce the float top-k (>= 9 of 10 on the fixture)."""
    from cpp_paddle_ocr_spark.operators.similarity import cosine_topk

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    deq = quantize_embeddings(emb).select(
        "vec_id", dequantize().cast("array<float>").alias("embedding")
    )
    orig = [r.vec_id for r in cosine_topk(emb).collect()]
    requant = [r.vec_id for r in cosine_topk(deq).collect()]
    assert len(set(orig) & set(requant)) >= 9
