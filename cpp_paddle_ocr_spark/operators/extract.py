"""The fused extraction operator: ``extract(df) -> df``.

The ``processRequest`` analog (``src/ocr_worker.cpp:213-311``) as one
``mapInPandas`` pass, with the transport guards lifted OUT of Python into
Catalyst-visible SQL branches (X1): empty and oversized pages are answered
with pure-SQL error rows and never cross the JVM→Python Arrow channel — the
Spark-native form of the reference rejecting oversized requests at the pipe
buffer before they reach a worker (P6, ``src/ocr_ipc_service.cpp:222-239``).

Scale shape (100 TB view):
* narrow scan → filter split (no shuffle for the guard branches);
* one shuffle for the salted size-routed repartition (optional, skipped when
  ``num_partitions=None`` and the source layout is already good);
* ``mapInPandas`` — the only Python hop; Arrow batches are the worker queues;
* no shuffle after extraction (per-page results are final).

Error-string parity: the SQL branches produce byte-identical ``error``
messages to ``core.pipeline.extract_batch`` so golden outputs match whichever
path answered the page.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from ..config import MAX_HTML_BYTES
from ..core.pipeline import extract_batch
from ..plans.partitioning import size_routed_repartition
from ..schemas import OUTPUT_SCHEMA, SPAN_SCHEMA


def _guard_row(df: DataFrame, error_col) -> DataFrame:
    """Build OUTPUT_SCHEMA error rows in pure SQL (never reaches Python)."""
    return df.select(
        F.col("url"),
        F.lit(False).alias("success"),
        error_col.alias("error"),
        F.lit(0).alias("n_blocks"),
        F.array().cast(T.ArrayType(SPAN_SCHEMA)).alias("spans"),
        F.lit("").alias("extracted_text"),
        F.lit(0.0).alias("processing_time_ms"),
    )


def _extract_fn(metrics: dict | None):
    """Build the mapInPandas payload; ``metrics`` are LongAccumulators (P7)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = extract_batch(pdf["url"].tolist(), pdf["html"].tolist())
            if metrics is not None:
                metrics["n_pages"].add(len(out))
                metrics["n_ok"].add(int(out["success"].sum()))
                metrics["n_blocks"].add(int(out["n_blocks"].sum()))
            yield out

    return fn


def make_metrics(spark) -> dict:
    """Service-stats accumulators (P7, ``src/ocr_ipc_service.cpp:438-448``)."""
    sc = spark.sparkContext
    return {
        "n_pages": sc.accumulator(0),
        "n_ok": sc.accumulator(0),
        "n_blocks": sc.accumulator(0),
    }


def extract(
    df: DataFrame,
    num_partitions: int | None = None,
    metrics: dict | None = None,
) -> DataFrame:
    """Run the full det → cls → rec cascade over a documents DataFrame.

    ``df`` needs columns ``url`` (string) and ``html`` (binary); extra columns
    are pruned before the Python hop (column pruning stays effective, X12).
    ``num_partitions`` enables the salted size-routed shuffle; leave ``None``
    to inherit the source partitioning (no shuffle at all).
    """
    base = df.select("url", "html")
    size = F.length(F.col("html"))
    valid = F.expr("is_valid_utf8(html)")

    empty = base.filter(F.col("html").isNull() | (size == 0))
    oversized = base.filter(size > MAX_HTML_BYTES)
    invalid = base.filter((size > 0) & (size <= MAX_HTML_BYTES) & ~valid)
    work = base.filter(size.isNotNull() & (size > 0) & (size <= MAX_HTML_BYTES) & valid)

    if num_partitions is not None:
        work = size_routed_repartition(work, num_partitions)

    extracted = work.mapInPandas(_extract_fn(metrics), OUTPUT_SCHEMA)

    empty_rows = _guard_row(empty, F.lit("empty html"))
    invalid_rows = _guard_row(invalid, F.lit("undecodable html (invalid utf-8)"))
    oversized_rows = _guard_row(
        oversized,
        F.concat(
            F.lit("oversized html ("),
            size.cast("string"),
            F.lit(f" bytes > {MAX_HTML_BYTES}); route via dedicated range partition"),
        ),
    )
    return (
        extracted.unionByName(empty_rows)
        .unionByName(invalid_rows)
        .unionByName(oversized_rows)
    )
