"""Layout/table stage as DataFrame operators (SURVEY.md §2.7 T1-T3).

Three mapInPandas fan-outs over the layout fixture pages — same Arrow
batching discipline as the extraction cascade; the kernels live in
``core.layout`` (pure, no Spark). Each operator has a committed-TSV oracle
(``scripts/gen_layout_golden.py``) mirroring the ``extract_golden_parity``
pattern: the TSV pins the values, DuckDB reads it, the driver hash-compares.

At 100 TB the plans are scan-shaped: one parquet/Iceberg scan, per-page
Python bounded by the canvas/step caps (TABLE_MAX_STEPS, LAYOUT_CANVAS),
zero shuffles — the fan-out emits far fewer rows than chars scanned.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from ..core.layout import detect_regions_page, extract_tables_page

TABLE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("table_id", T.IntegerType(), False),
        T.StructField("start", T.LongType(), False),
        T.StructField("end", T.LongType(), False),
        T.StructField("n_cells", T.IntegerType(), False),
        T.StructField("structure", T.StringType(), False),
        T.StructField("score", T.DoubleType(), False),
    ]
)

CELL_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("table_id", T.IntegerType(), False),
        T.StructField("cell_id", T.IntegerType(), False),
        T.StructField("start", T.LongType(), False),
        T.StructField("end", T.LongType(), False),
        T.StructField("text", T.StringType(), False),
    ]
)

REGION_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("label", T.StringType(), False),
        T.StructField("start", T.LongType(), False),
        T.StructField("end", T.LongType(), False),
        T.StructField("score", T.DoubleType(), False),
    ]
)


def _decode(blob) -> str | None:
    if blob is None:
        return None
    try:
        return bytes(blob).decode("utf-8")
    except UnicodeDecodeError:
        return None  # P9 policy: garbage pages emit no layout rows


def extract_tables(df: DataFrame) -> DataFrame:
    """T1/T2: one row per decoded table (structure + score)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in TABLE_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for url, blob in zip(pdf["url"], pdf["html"]):
                doc = _decode(blob)
                if doc is None:
                    continue
                for t in extract_tables_page(doc):
                    rows.append(
                        (url, t.table_id, t.start, t.end, len(t.cells),
                         t.structure, t.score)
                    )
            yield pd.DataFrame(rows, columns=cols)

    return df.select("url", "html").mapInPandas(fn, TABLE_SCHEMA)


def extract_table_cells(df: DataFrame) -> DataFrame:
    """T1: one row per decoded cell span."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in CELL_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for url, blob in zip(pdf["url"], pdf["html"]):
                doc = _decode(blob)
                if doc is None:
                    continue
                for t in extract_tables_page(doc):
                    for c in t.cells:
                        rows.append(
                            (url, t.table_id, c.cell_id, c.start, c.end, c.text)
                        )
            yield pd.DataFrame(rows, columns=cols)

    return df.select("url", "html").mapInPandas(fn, CELL_SCHEMA)


def detect_regions(df: DataFrame) -> DataFrame:
    """T3: one row per detected page region (picodet analog)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in REGION_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for url, blob in zip(pdf["url"], pdf["html"]):
                doc = _decode(blob)
                if doc is None:
                    continue
                for r in detect_regions_page(doc):
                    rows.append((url, r.label, r.start, r.end, r.score))
            yield pd.DataFrame(rows, columns=cols)

    return df.select("url", "html").mapInPandas(fn, REGION_SCHEMA)


# ---------------------------------------------------------------------------
# Driver queries + committed-TSV oracles
# ---------------------------------------------------------------------------

N_LAYOUT = 96  # keep in sync with scripts/gen_layout_golden.py

_GOLDEN_DIR = __import__("pathlib").Path(__file__).resolve().parents[2] / "tests" / "golden"


def _gen_layout_docs(spark: SparkSession) -> DataFrame:
    from ..sources.documents import generate_layout_docs

    return generate_layout_docs(spark, N_LAYOUT)


def _q_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    return extract_tables(_gen_layout_docs(spark))


def _q_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    return extract_table_cells(_gen_layout_docs(spark))


def _q_regions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return detect_regions(_gen_layout_docs(spark))


QUERIES = {
    "layout_tables": _q_tables,
    "layout_table_cells": _q_cells,
    "layout_regions": _q_regions,
}

ORACLES = {
    "layout_tables": f"""
SELECT url, table_id, start, "end", n_cells, structure, score
FROM read_csv('{_GOLDEN_DIR / "LAYOUT_TABLES.tsv"}', delim='\t', header=false,
              quote='', escape='',
              columns={{'url': 'VARCHAR', 'table_id': 'INTEGER',
                        'start': 'BIGINT', 'end': 'BIGINT',
                        'n_cells': 'INTEGER', 'structure': 'VARCHAR',
                        'score': 'DOUBLE'}})
""",
    "layout_table_cells": f"""
SELECT url, table_id, cell_id, start, "end", text
FROM read_csv('{_GOLDEN_DIR / "LAYOUT_CELLS.tsv"}', delim='\t', header=false,
              quote='', escape='', force_not_null=['text'],
              columns={{'url': 'VARCHAR', 'table_id': 'INTEGER',
                        'cell_id': 'INTEGER', 'start': 'BIGINT',
                        'end': 'BIGINT', 'text': 'VARCHAR'}})
""",
    "layout_regions": f"""
SELECT url, label, start, "end", score
FROM read_csv('{_GOLDEN_DIR / "LAYOUT_REGIONS.tsv"}', delim='\t', header=false,
              quote='', escape='',
              columns={{'url': 'VARCHAR', 'label': 'VARCHAR',
                        'start': 'BIGINT', 'end': 'BIGINT',
                        'score': 'DOUBLE'}})
""",
}
