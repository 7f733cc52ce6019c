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


from hypothesis import given, settings, strategies as st  # noqa: E402

_vec = st.lists(
    st.floats(
        min_value=-1e6,
        max_value=1e6,
        allow_nan=False,
        allow_infinity=False,
        width=32,
    ),
    min_size=4,
    max_size=16,
)


@settings(max_examples=10, deadline=None)
@given(st.lists(_vec, min_size=1, max_size=12))
def test_codec_invariants_random_vectors(spark, vecs):
    """For arbitrary float32 vectors: codes stay in [-127,127], the
    reconstruction error is bounded by scale/2, and dequantize(quantize(v))
    of a zero vector is exactly zero."""
    # pad ragged vectors to a common length (codec is per-vector, but the
    # DataFrame column wants one array type; padding with 0.0 is neutral)
    width = max(len(v) for v in vecs)
    rows = [(i, v + [0.0] * (width - len(v))) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    out = {r.vec_id: r for r in quantize_embeddings(df).collect()}
    deq = {
        r.vec_id: r.deq
        for r in quantize_embeddings(df)
        .select("vec_id", dequantize().alias("deq"))
        .collect()
    }
    for i, v in rows:
        q = out[i]
        assert all(-127 <= c <= 127 for c in q.qemb), q.qemb
        bound = q.scale / 2 + 1e-9 * max(1.0, q.scale)
        orig = [float(np_f32(x)) for x in v]
        for o, d in zip(orig, deq[i]):
            assert abs(o - d) <= bound, (o, d, q.scale)
        if q.scale == 0.0:
            assert all(c == 0 for c in q.qemb)


def np_f32(x):
    import numpy as np

    return np.float32(x)
