"""Streaming corpus curation: the batch `corpus_keep` gates on a stream.

A live crawl doesn't wait for a batch job: pages arrive, get extracted,
gated, and deduplicated continuously. This operator chains the engine's
streaming-safe pieces into that pipeline:

    pages stream → extract_stream (mapInPandas cascade)
                 → success gate
                 → language + quality gates (stateless projections —
                   the SAME lang_cols()/quality_cols() the batch operator
                   and its DuckDB oracle use, applied to extracted_text)
                 → cross-batch exact dedup on the text fingerprint
                   (applyInPandasWithState, first-seen wins, optional TTL)

The aggregation-based batch gates (repetition stats, LSH near-dup
clusters) are deliberately NOT here: they need corpus-global state and
belong in the periodic batch pass over the accumulated table — the
standard lambda split. What CAN be decided per row or per key streams;
what needs the whole corpus batches.

Scale shape: stateless stages are per-row maps (no shuffle); the dedup
stage shuffles once on the fingerprint key and shards its state store by
that key across executors — same properties as `stateful.dedup_stream`,
with md5(text) instead of url as the identity.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.text_analysis import lang_cols, quality_cols

CURATED_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("pred_lang", T.StringType(), True),
        T.StructField("quality", T.DoubleType(), True),
        T.StructField("fp", T.StringType(), False),
    ]
)

_STATE_SCHEMA = T.StructType([T.StructField("seen", T.LongType(), False)])


def curate_stream(
    stream_df: DataFrame,
    lang: str = "en",
    min_quality: float = 0.4,
    ttl_ms: int | None = None,
) -> DataFrame:
    """Pages stream → curated, fingerprint-deduplicated text stream.

    Output: one row per FIRST sighting of each distinct extracted text
    that passes the gates — ``(url, text, pred_lang, quality, fp)``.
    ``ttl_ms`` bounds the dedup state store exactly as in
    ``stateful.dedup_stream``.
    """
    from .ingest import extract_stream

    extracted = extract_stream(stream_df)
    gated = (
        extracted.filter(F.col("success"))
        .select("url", F.col("extracted_text").alias("text"))
        .select("url", "text", *lang_cols(), *quality_cols())
        .filter(
            (F.col("pred_lang") == lang) & (F.col("quality") >= min_quality)
        )
        .select(
            "url",
            "text",
            "pred_lang",
            "quality",
            F.md5(F.col("text")).alias("fp"),
        )
    )

    def first_seen(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        seen = state.get[0] if state.exists else 0
        first_row = None
        for pdf in pdfs:
            if first_row is None and len(pdf) and seen == 0:
                first_row = pdf.iloc[[0]].copy()
            seen += len(pdf)
        state.update((seen,))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        if first_row is not None:
            yield first_row[["url", "text", "pred_lang", "quality", "fp"]]

    timeout_conf = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return gated.groupBy("fp").applyInPandasWithState(
        first_seen,
        outputStructType=CURATED_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout_conf,
    )
