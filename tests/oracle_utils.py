"""Driver-mimicking oracle comparison: Spark DataFrame vs DuckDB SQL.

Approximates the verify harness: same parquet tables, column names sorted,
order-insensitive multiset comparison of stringified values.
"""

from __future__ import annotations

import math

import duckdb

from cpp_paddle_ocr_spark.operators.common import TABLES


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6f}"
    try:  # Decimal
        import decimal

        if isinstance(v, decimal.Decimal):
            return f"{float(v):.6f}"
    except Exception:
        pass
    return str(v)


def compare(spark_df, con, sql: str) -> None:
    sdf = spark_df.toPandas()
    ddf = con.execute(sql).fetchdf()
    s_cols = sorted(sdf.columns)
    d_cols = sorted(ddf.columns)
    assert s_cols == d_cols, f"schema mismatch: {s_cols} vs {d_cols}"
    s_rows = sorted(
        tuple(_norm(v) for v in row) for row in sdf[s_cols].itertuples(index=False)
    )
    d_rows = sorted(
        tuple(_norm(v) for v in row) for row in ddf[d_cols].itertuples(index=False)
    )
    assert len(s_rows) == len(d_rows), f"row count {len(s_rows)} vs {len(d_rows)}"
    for i, (a, b) in enumerate(zip(s_rows, d_rows)):
        assert a == b, f"row {i}: spark={a} duckdb={b}"
