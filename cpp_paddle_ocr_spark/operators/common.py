"""Shared helpers for the training-data pipeline operators.

Every operator here is written twice by design: once in the DataFrame API
(the engine) and once as ANSI SQL (the DuckDB oracle the driver runs). The
helpers below pin the cross-engine-deterministic primitives:

* ``h60(col)`` — 60-bit integer hash from the md5 hex prefix. md5 is
  byte-identical everywhere; 15 hex digits < 2^60 fits signed int64 in both
  engines (Spark ``conv(...,16,10)`` / DuckDB ``('0x'||...)::BIGINT``).
* ``tokens(col)`` — whitespace tokenization with empties filtered, identical
  under Spark ``split`` and DuckDB ``regexp_split_to_array``.
* float outputs are rounded to 6 dp on both sides: every remaining float is
  a ratio/fold of exact integer or float32-promoted doubles, so 6 dp is far
  beyond the cross-engine error bound (≈1e-12 from summation order).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def h60(col: Column | str) -> Column:
    """60-bit deterministic hash (Spark side)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def h60_sql(expr: str) -> str:
    """60-bit deterministic hash (DuckDB oracle side)."""
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


def h28(col: Column | str) -> Column:
    """28-bit hash — headroom for modular arithmetic without overflow."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 7), 16, 10).cast("long")


def h28_sql(expr: str) -> str:
    return f"(('0x' || substr(md5({expr}), 1, 7))::BIGINT)"


def tokens(col: Column | str) -> Column:
    """Whitespace tokens, empties removed (Spark side)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, r"\s+"), lambda t: t != "")


def tokens_sql(expr: str) -> str:
    return f"list_filter(regexp_split_to_array({expr}, '\\s+'), t -> t <> '')"
