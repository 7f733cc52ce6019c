"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship extraction over the deterministic fixture table.
``queries()`` — every implemented operator from SURVEY.md §2 (+ the
training-data pipeline operators); ``oracle_sql()`` — DuckDB oracles for all
SQL-expressible ones. The extraction-cascade queries run on deterministic
synthetic Common-Crawl-style pages (BASELINE.json input_hint; no external
data) and get rows-only checks; everything else runs on the driver's parquet
tables with full value-hash oracles.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from cpp_paddle_ocr_spark.operators import (
    dedup,
    relational,
    similarity,
    text_analysis,
)
from cpp_paddle_ocr_spark.operators.extract import extract
from cpp_paddle_ocr_spark.operators.multimodal import decode_media_meta
from cpp_paddle_ocr_spark.operators.staged import extract_staged
from cpp_paddle_ocr_spark.sources.documents import generate_documents

_N_EXTRACT = 240  # fixture pages for the extraction-pipeline checks


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: extract main content for every url (SURVEY.md §7.4)."""
    docs = generate_documents(spark, _N_EXTRACT, oversize_max=2_000_000)
    out = extract(docs, num_partitions=8)
    # spans (array<struct>) dropped for a stable, hashable driver check
    return out.select(
        "url", "success", "error", "n_blocks", "extracted_text"
    ).orderBy("url")


def _q_extract_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = generate_documents(spark, _N_EXTRACT, oversize_max=2_000_000)
    return extract(docs).select(
        "url", "success", "error", "n_blocks", "extracted_text"
    )


def _q_extract_staged(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = generate_documents(spark, _N_EXTRACT, oversize_max=2_000_000)
    return extract_staged(docs).select(
        "url", "success", "error", "n_blocks", "extracted_text"
    )


def _q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = generate_documents(spark, 60, oversize_max=2_000_000)
    media = docs.select("url", F.col("html").alias("media"))
    return decode_media_meta(media)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    q.update(relational.QUERIES)
    q.update(text_analysis.QUERIES)
    q.update(dedup.QUERIES)
    q.update(similarity.QUERIES)
    # extraction cascade + multimodal plumbing: non-SQL-expressible
    # (custom mapInPandas pipelines) → rows-only checks
    q["extract_pages"] = _q_extract_pages
    q["extract_pages_staged"] = _q_extract_staged
    q["multimodal_meta"] = _q_multimodal_meta
    return q


def oracle_sql() -> dict[str, str]:
    o: dict[str, str] = {}
    o.update(relational.ORACLES)
    o.update(text_analysis.ORACLES)
    o.update(dedup.ORACLES)
    o.update(similarity.ORACLES)
    return o
