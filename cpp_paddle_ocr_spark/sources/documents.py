"""Documents source: fixture generation + table readers (SURVEY.md §2.1).

S1/S3 — the production source is a plain table scan
(``spark.read.parquet`` / Iceberg when a catalog is configured); html arrives
in-row as binary, so the reference's ``imread``/base64 decode collapses into
the UTF-8 decode inside the extraction UDF (S2).

For tests/benchmarks the fixture table is generated *distributed*: the pure
generator ``fixtures.page(i)`` is keyed on the row id alone, so
``spark.range`` + ``mapInPandas`` scales generation to any size without a
driver-side loop.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..fixtures import layout_page, media_item, page
from ..schemas import DOCUMENTS_SCHEMA, MEDIA_SCHEMA


def _gen_partitions(spark: SparkSession, n: int) -> int:
    """Default partition count for the synthetic generators.

    Compute-bound fixture tasks (page synthesis now, the Python cascade
    reading the result later) should be sized by DURATION, not bytes: one
    task per core means one wave, and on a shared-tenant host one slow
    core adds its whole task to the stage wall (guide §2.6 stragglers —
    the round-6 extract passes spread 52-106 s at 32 one-wave tasks).
    Four waves bound the straggler penalty to ~¼ wave: interleaved-pair
    A/B of the 200k-doc extract over a 32-file vs 128-file fixture
    measured 0.925/0.969/0.773 (128-file faster in every pair). Small
    tables stay at one-partition-per-core — the ``n // 1000`` guard keeps
    test/fixture tables (≤ ~32k rows) at the old layout so only
    long-stage fixtures split finer.
    """
    dp = spark.sparkContext.defaultParallelism
    return min(4 * dp, max(dp, n // 1000))


def generate_documents(
    spark: SparkSession,
    n: int,
    oversize_max: int = 16_000_000,
    num_partitions: int | None = None,
) -> DataFrame:
    """Deterministic documents table of ``n`` rows, generated in parallel."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                [page(int(i), oversize_max) for i in pdf["id"]],
                columns=[f.name for f in DOCUMENTS_SCHEMA.fields],
            )

    rng = spark.range(0, n, 1, num_partitions or _gen_partitions(spark, n))
    return rng.mapInPandas(gen, DOCUMENTS_SCHEMA)


def generate_media(
    spark: SparkSession,
    n: int,
    num_partitions: int | None = None,
) -> DataFrame:
    """Deterministic media table (url, media binary) — same distributed
    generation shape as ``generate_documents``; rows are pure functions of
    the row id (``fixtures.media_item``)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                [media_item(int(i)) for i in pdf["id"]],
                columns=[f.name for f in MEDIA_SCHEMA.fields],
            )

    rng = spark.range(0, n, 1, num_partitions or _gen_partitions(spark, n))
    return rng.mapInPandas(gen, MEDIA_SCHEMA)


def generate_layout_docs(
    spark: SparkSession,
    n: int,
    num_partitions: int | None = None,
) -> DataFrame:
    """Deterministic layout-fixture table (url, html binary) for the T1-T3
    structure stage — pure function of the row id (``fixtures.layout_page``)."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("html", T.BinaryType(), True),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                [layout_page(int(i)) for i in pdf["id"]],
                columns=["url", "html"],
            )

    rng = spark.range(0, n, 1, num_partitions or _gen_partitions(spark, n))
    return rng.mapInPandas(gen, schema)


def write_documents_parquet(
    spark: SparkSession,
    path: str,
    n: int,
    oversize_max: int = 16_000_000,
    num_partitions: int | None = None,
) -> None:
    generate_documents(spark, n, oversize_max, num_partitions).write.mode(
        "overwrite"
    ).parquet(path)


def read_documents(spark: SparkSession, path: str) -> DataFrame:
    """S1: table scan. Parquet path or Iceberg table name both accepted."""
    if "/" in path or path.endswith(".parquet"):
        return spark.read.schema(DOCUMENTS_SCHEMA).parquet(path)
    return spark.read.table(path)


def from_base64(df: DataFrame, col: str = "html_b64") -> DataFrame:
    """S2: base64 transport source (``src/ocr_ipc_service.cpp:16-43``):
    pages arriving base64-encoded (e.g. JSON sidecar feeds) → binary html."""
    from pyspark.sql import functions as F

    return df.withColumn("html", F.unbase64(F.col(col))).drop(col)
