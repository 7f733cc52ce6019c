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
    clustering,
    corpus,
    dedup,
    governance,
    graph,
    layout,
    quantize,
    regression,
    relational,
    similarity,
    text_analysis,
)
from cpp_paddle_ocr_spark.operators.extract import extract
from cpp_paddle_ocr_spark.operators.multimodal import decode_media_meta
from cpp_paddle_ocr_spark.operators.staged import extract_staged
from cpp_paddle_ocr_spark.sources.documents import (
    generate_documents,
    generate_media,
)

_N_EXTRACT = 240  # fixture pages for the extraction-pipeline checks


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: extract main content for every url (SURVEY.md §7.4)."""
    docs = generate_documents(spark, _N_EXTRACT, oversize_max=2_000_000)
    out = extract(docs, num_partitions=8)
    # spans (array<struct>) dropped for a stable, hashable driver check
    return out.select(
        "url", "success", "error", "n_blocks", "extracted_text"
    ).orderBy("url")


def _digest_shape(out: DataFrame) -> DataFrame:
    """(url, digest, success, n_blocks) — the committed-golden hash shape
    (the fixture rows here are a strict subset of the 2000-row golden set,
    so CHECKSUMS.tsv is the full value oracle for BOTH extract forms)."""
    return out.select(
        "url",
        F.sha2(F.col("extracted_text"), 256).alias("digest"),
        F.col("success").cast("int").alias("success"),
        F.col("n_blocks").alias("n_blocks"),
    )


def _q_extract_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = generate_documents(spark, _N_EXTRACT, oversize_max=2_000_000)
    return _digest_shape(extract(docs))


def _q_extract_staged(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = generate_documents(spark, _N_EXTRACT, oversize_max=2_000_000)
    return _digest_shape(extract_staged(docs))


def _q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL header decode over the deterministic media fixture table; fully
    oracled against the committed golden TSV (scripts/gen_media_golden.py) —
    closing round-2's last ``no_oracle`` entry."""
    media = generate_media(spark, 60)
    return decode_media_meta(media, real=True)


_GOLDEN_TSV = str(
    __import__("pathlib").Path(__file__).resolve().parent
    / "tests"
    / "golden"
    / "CHECKSUMS.tsv"
)
_N_GOLDEN = 2000  # rows in the committed golden set (scripts/gen_golden.py)


def _q_extract_golden_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-oracle row for the flagship cascade: re-extract the golden
    fixture set and emit (url, sha256(extracted_text), success, n_blocks);
    the DuckDB oracle reads the COMMITTED golden TSV — values are pinned by
    the repo, not derived from this run, so a hash-green here means the
    distributed pipeline reproduces the committed reference bytes."""
    docs = generate_documents(spark, _N_GOLDEN, oversize_max=2_000_000)
    return extract(docs).select(
        "url",
        F.sha2(F.col("extracted_text"), 256).alias("digest"),
        F.col("success").cast("int").alias("success"),
        F.col("n_blocks").alias("n_blocks"),
    )


_EXTRACT_GOLDEN_SQL = f"""
SELECT url, digest, success, n_blocks
FROM read_csv('{_GOLDEN_TSV}', delim='\t', header=false,
              columns={{'url': 'VARCHAR', 'digest': 'VARCHAR',
                        'success': 'INTEGER', 'n_blocks': 'INTEGER'}})
"""

_MEDIA_GOLDEN_TSV = str(
    __import__("pathlib").Path(__file__).resolve().parent
    / "tests"
    / "golden"
    / "MEDIA_META.tsv"
)

_MEDIA_META_SQL = f"""
SELECT url, n_bytes, magic, width, height, media_type
FROM read_csv('{_MEDIA_GOLDEN_TSV}', delim='\t', header=false,
              columns={{'url': 'VARCHAR', 'n_bytes': 'BIGINT',
                        'magic': 'VARCHAR', 'width': 'INTEGER',
                        'height': 'INTEGER', 'media_type': 'VARCHAR'}})
"""


def _q_windowed_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7 as a windowed aggregation (the streaming metrics operator run in
    batch mode over the golden fixture set): tumbling 1-hour windows on
    warc_ts over the REAL extraction output. Full oracle: warc_ts is the
    deterministic ``EPOCH + 137s * i`` of fixtures.page, so DuckDB
    reconstructs the identical windows from the committed golden TSV."""
    from cpp_paddle_ocr_spark.streaming.metrics import extract_stream_with_ts

    docs = generate_documents(spark, _N_GOLDEN, oversize_max=2_000_000)
    out = extract_stream_with_ts(docs)
    # window key from timestamp COMPONENTS, not F.window: the driver's
    # session timezone is not ours to pin, and F.window aligns to the UTC
    # epoch — under a host tz with a non-whole-hour offset the boundaries
    # would shift by :30 against the oracle. Components round-trip the
    # naive fixture timestamp identically in any session tz. The true
    # F.window + watermark form runs under our own (UTC-pinned) session in
    # tests/test_streaming_metrics.py.
    window_start = F.format_string(
        "%04d-%02d-%02d %02d:00:00",
        F.year("warc_ts"),
        F.month("warc_ts"),
        F.dayofmonth("warc_ts"),
        F.hour("warc_ts"),
    )
    return (
        out.groupBy(window_start.alias("window_start"))
        .agg(
            F.count("*").alias("n_pages"),
            F.sum(F.col("success").cast("long")).alias("n_ok"),
            F.sum("n_blocks").alias("n_spans"),
        )
    )


_WINDOWED_QUALITY_SQL = f"""
WITH g AS (
  SELECT CAST(regexp_extract(url, '/page/(\\d+)$', 1) AS BIGINT) AS i,
         success, n_blocks
  FROM read_csv('{_GOLDEN_TSV}', delim='\t', header=false,
                columns={{'url': 'VARCHAR', 'digest': 'VARCHAR',
                          'success': 'INTEGER', 'n_blocks': 'INTEGER'}})
)
SELECT strftime(date_trunc('hour',
                TIMESTAMP '2025-01-01 00:00:00' + i * INTERVAL 137 SECOND),
                '%Y-%m-%d %H:%M:%S') AS window_start,
       count(*) AS n_pages,
       CAST(sum(success) AS BIGINT) AS n_ok,
       CAST(sum(n_blocks) AS BIGINT) AS n_spans
FROM g
GROUP BY 1
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    q.update(relational.QUERIES)
    q.update(text_analysis.QUERIES)
    q.update(dedup.QUERIES)
    q.update(similarity.QUERIES)
    q.update(layout.QUERIES)
    q.update(clustering.QUERIES)
    q.update(corpus.QUERIES)
    q.update(quantize.QUERIES)
    q.update(governance.QUERIES)
    q.update(graph.QUERIES)
    q.update(regression.QUERIES)
    # extraction cascade (fused + staged): full-oracle via the committed
    # golden TSV — the fixture rows are a prefix of the golden set
    q["extract_pages"] = _q_extract_pages
    q["extract_pages_staged"] = _q_extract_staged
    # full-oracle: real header decode vs the committed media golden TSV
    q["multimodal_meta"] = _q_multimodal_meta
    # the cascade's full-oracle row: checked against the COMMITTED golden TSV
    q["extract_golden_parity"] = _q_extract_golden_parity
    # P7 windowed metrics (streaming operator in batch mode), golden-oracled
    q["status_windowed"] = _q_windowed_quality
    return q


def oracle_sql() -> dict[str, str]:
    o: dict[str, str] = {}
    o.update(relational.ORACLES)
    o.update(text_analysis.ORACLES)
    o.update(dedup.ORACLES)
    o.update(similarity.ORACLES)
    o.update(layout.ORACLES)
    o.update(clustering.ORACLES)
    o.update(corpus.ORACLES)
    o.update(quantize.ORACLES)
    o.update(governance.ORACLES)
    o.update(graph.ORACLES)
    o.update(regression.ORACLES)
    o["extract_golden_parity"] = _EXTRACT_GOLDEN_SQL
    o["multimodal_meta"] = _MEDIA_META_SQL
    o["status_windowed"] = _WINDOWED_QUALITY_SQL
    prefix = f"""
SELECT url, digest, success, n_blocks
FROM read_csv('{_GOLDEN_TSV}', delim='\t', header=false,
              columns={{'url': 'VARCHAR', 'digest': 'VARCHAR',
                        'success': 'INTEGER', 'n_blocks': 'INTEGER'}})
WHERE CAST(regexp_extract(url, '/page/(\\d+)$', 1) AS BIGINT) < {_N_EXTRACT}
"""
    o["extract_pages"] = prefix
    o["extract_pages_staged"] = prefix
    return o
