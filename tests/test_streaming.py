"""Streaming ingestion: incremental extraction equals the batch pipeline."""

from __future__ import annotations

import hashlib

from cpp_paddle_ocr_spark.sources.documents import generate_documents
from cpp_paddle_ocr_spark.streaming.ingest import extract_stream, run_stream_job


def sha(t: str) -> str:
    return hashlib.sha256(t.encode()).hexdigest()


def test_stream_job_matches_golden(spark, tmp_path, golden_checksums):
    in_dir, out_dir, ckpt = (
        str(tmp_path / "in"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    generate_documents(spark, 60, oversize_max=2_000_000).write.parquet(in_dir)
    q = run_stream_job(spark, in_dir, out_dir, ckpt)
    q.awaitTermination(120)
    rows = spark.read.parquet(out_dir).collect()
    assert len(rows) == 60
    for r in rows:
        digest, success, n_blocks = golden_checksums[r.url]
        assert r.success == success and r.n_blocks == n_blocks
        assert sha(r.extracted_text) == digest


def test_extract_stream_is_streaming_plan(spark, tmp_path):
    in_dir = str(tmp_path / "in2")
    generate_documents(spark, 10, oversize_max=2_000_000).write.parquet(in_dir)
    from cpp_paddle_ocr_spark.schemas import DOCUMENTS_SCHEMA

    s = spark.readStream.schema(DOCUMENTS_SCHEMA).parquet(in_dir)
    out = extract_stream(s)
    assert out.isStreaming
    assert [f.name for f in out.schema.fields][:4] == [
        "url", "success", "error", "n_blocks",
    ]
