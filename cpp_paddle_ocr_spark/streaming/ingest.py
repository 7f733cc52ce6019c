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
  guarded batch operator (JVM-side guards + size routing). ``foreachBatch``
  is at-least-once, so the sink is made idempotent: output is partitioned by
  ``epoch_id`` and written with dynamic partition overwrite — a retried
  epoch REPLACES its own partition (extraction is deterministic, so the
  replay is byte-identical), giving exactly-once *visible* results on top of
  the streaming checkpoint — the streaming counterpart of the lineage/resume
  protocol.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.extract import _extract_fn, extract, prepare_routed
from ..schemas import DOCUMENTS_SCHEMA, OUTPUT_SCHEMA


def extract_stream(stream_df: DataFrame) -> DataFrame:
    """Stateless streaming transform: pages → extraction rows.

    ``prepare_routed`` is a plain projection (streaming-safe): it computes
    the (html_size, route) columns the extraction payload requires and
    blanks guard-row bytes before the Arrow channel, exactly like the batch
    operator.
    """
    return prepare_routed(stream_df.select("url", "html")).mapInPandas(
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
        # idempotent epoch replay: dynamic overwrite of THIS epoch's
        # partition only — a blind append would duplicate rows whenever
        # foreachBatch retries an epoch after a failure. The overwrite mode
        # is a per-WRITE option, not a session conf flip (which would
        # silently change overwrite semantics for unrelated writes).
        (
            extract(batch_df)
            .withColumn("epoch_id", F.lit(int(epoch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch_id")
            .parquet(out_dir)
        )

    writer = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
