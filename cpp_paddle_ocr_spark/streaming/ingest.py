"""Structured Streaming ingestion (SURVEY.md §7.7, optional sink/source).

The reference is a request/response service — its streaming analog is
continuous crawl ingestion: new page files land in a directory (or Kafka /
Iceberg CDC in production), the cascade runs incrementally, results append.

Two forms:

* ``extract_stream(stream_df)`` — stateless transform of a streaming
  DataFrame via one ``mapInPandas`` (the pure ``extract_batch`` handles all
  guards internally, so no union-of-branches is needed on the streaming
  plan).
* ``run_stream_job`` — file-source → ``foreachBatch`` running the full
  guarded batch operator (JVM-side guards + size routing) with exactly-once
  sink semantics via the streaming checkpoint — the streaming counterpart of
  the lineage/resume protocol.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.extract import _extract_fn, extract
from ..schemas import DOCUMENTS_SCHEMA, OUTPUT_SCHEMA


def extract_stream(stream_df: DataFrame) -> DataFrame:
    """Stateless streaming transform: pages → extraction rows."""
    return stream_df.select("url", "html").mapInPandas(
        _extract_fn(None), OUTPUT_SCHEMA
    )


def run_stream_job(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """File-source ingestion job; returns the StreamingQuery."""
    stream = (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(in_dir)
    )

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        extract(batch_df).write.mode("append").parquet(out_dir)

    writer = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
