"""Windowed streaming quality metrics: watermark + tumbling window."""

from __future__ import annotations

from cpp_paddle_ocr_spark.sources.documents import generate_documents
from cpp_paddle_ocr_spark.streaming.metrics import (
    run_quality_stream,
    windowed_quality,
)


def test_windowed_quality_on_batch(spark):
    # the same aggregation works on a static frame (windows all emit)
    from cpp_paddle_ocr_spark.operators.extract import extract

    docs = generate_documents(spark, 120, oversize_max=500_000).cache()
    ext = extract(docs).join(docs.select("url", "warc_ts"), "url")
    q = windowed_quality(ext).collect()
    assert q
    assert sum(r.n_pages for r in q) == 120
    for r in q:
        assert 0 <= r.n_ok <= r.n_pages


def test_quality_stream_appends_closed_windows(spark, tmp_path):
    in_dir, out_dir, ckpt = (
        str(tmp_path / "in"),
        str(tmp_path / "out"),
        str(tmp_path / "ck"),
    )
    # 200 docs span ~7.6h of event time (137s apart)
    generate_documents(spark, 200, oversize_max=500_000).write.parquet(in_dir)
    q = run_quality_stream(
        spark, in_dir, out_dir, ckpt, window="1 hour", watermark="5 minutes"
    )
    q.awaitTermination(180)
    rows = spark.read.parquet(out_dir).collect()
    # all windows except the still-open tail are emitted and disjoint
    assert len(rows) >= 5
    spans = sorted((r.window_start, r.window_end) for r in rows)
    for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
        assert e1 <= s2
    assert sum(r.n_pages for r in rows) <= 200
    assert all(r.n_pages > 0 for r in rows)
