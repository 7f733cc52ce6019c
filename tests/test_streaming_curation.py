"""Streaming curation pipeline (streaming/curation.py): gates + dedup on a
live stream must agree with the batch-side equivalent over the same pages."""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from cpp_paddle_ocr_spark.operators.extract import extract  # noqa: E402
from cpp_paddle_ocr_spark.operators.text_analysis import (  # noqa: E402
    lang_cols,
    quality_cols,
)
from cpp_paddle_ocr_spark.schemas import DOCUMENTS_SCHEMA  # noqa: E402
from cpp_paddle_ocr_spark.sources.documents import generate_documents  # noqa: E402
from cpp_paddle_ocr_spark.streaming.curation import curate_stream  # noqa: E402


def test_curate_stream_matches_batch_gates_and_dedups(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    docs = generate_documents(spark, 50, oversize_max=2_000_000)
    # plant exact duplicates: re-emit the first 10 pages under new urls
    dupes = docs.filter(
        F.col("url").rlike("/page/[0-9]$")
    ).withColumn("url", F.concat(F.col("url"), F.lit("-copy")))
    docs.unionByName(dupes).write.parquet(in_dir)

    s = spark.readStream.schema(DOCUMENTS_SCHEMA).parquet(in_dir)
    out = curate_stream(s, lang="en", min_quality=0.3)
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("curated_t")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql("select * from curated_t").collect()
    assert rows, "stream produced no curated rows"

    # gate invariants on every emitted row
    for r in rows:
        assert r.pred_lang == "en"
        assert r.quality >= 0.3
    # exact dedup: one row per fingerprint
    fps = [r.fp for r in rows]
    assert len(fps) == len(set(fps))

    # batch equivalent over the same input: same kept-fingerprint SET
    # (first-seen picks a different representative url — compare identity
    # of the curated texts, not which duplicate won)
    batch = (
        extract(spark.read.parquet(in_dir))
        .filter(F.col("success"))
        .select(F.col("extracted_text").alias("text"))
        .select("text", *lang_cols(), *quality_cols())
        .filter((F.col("pred_lang") == "en") & (F.col("quality") >= 0.3))
        .select(F.md5(F.col("text")).alias("fp"))
        .distinct()
    )
    assert set(fps) == {r.fp for r in batch.collect()}
