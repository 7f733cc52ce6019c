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

from pyspark.sql import DataFrame, functions as F, types as T

from ..operators.corpus import KEEP_LANG, MIN_QUALITY
from ..operators.text_analysis import lang_cols, quality_cols
from .stateful import first_seen_stream

CURATED_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("pred_lang", T.StringType(), True),
        T.StructField("quality", T.DoubleType(), True),
        T.StructField("fp", T.StringType(), False),
    ]
)

def curate_stream(
    stream_df: DataFrame,
    lang: str = KEEP_LANG,
    min_quality: float = MIN_QUALITY,
    ttl_ms: int | None = None,
) -> DataFrame:
    """Pages stream → curated, fingerprint-deduplicated text stream.

    Output: one row per FIRST sighting of each distinct extracted text
    that passes the gates — ``(url, text, pred_lang, quality, fp)``.
    Gate defaults are IMPORTED from the batch ``corpus_keep`` constants so
    retuning the batch pipeline retunes the stream with it. ``ttl_ms``
    bounds the dedup state store exactly as in ``stateful.dedup_stream``
    (both are instantiations of ``first_seen_stream`` — one state
    machine, two keys).
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
    return first_seen_stream(
        gated,
        key_col="fp",
        out_cols=["url", "text", "pred_lang", "quality", "fp"],
        out_schema=CURATED_SCHEMA,
        ttl_ms=ttl_ms,
    )
