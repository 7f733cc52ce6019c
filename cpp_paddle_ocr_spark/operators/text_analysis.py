"""Text-analysis operators for large-scale training-data pipelines.

First-class engine components beyond the extraction cascade: language ID,
quality scoring, token counting, document fingerprinting — each over the
``documents`` table, each with a DuckDB oracle (``ORACLES``). All Spark
implementations are pure built-in ``pyspark.sql.functions`` (JVM-side,
whole-stage-codegen; zero Python in the hot path).

Scale notes: every query is a narrow per-row map + one hash aggregation —
at 100 TB they are scan-bound; no joins, no skew exposure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .common import h60, h60_sql, load, tokens, tokens_sql

# Small per-language stopword sets (deterministic heuristics, not models).
EN_STOPS = ["the", "a", "of", "to", "in", "and", "is", "that", "for", "with"]
DE_STOPS = ["der", "die", "das", "und", "ist", "ein", "eine", "zu", "mit", "von"]

_BPE_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


def _arr_lit(values: list[str]):
    return F.array(*[F.lit(v) for v in values])


def lang_id(df: DataFrame) -> DataFrame:
    """n-gram/stopword-heuristic language ID: count distinct stopword hits
    per language, argmax with a fixed tie rule (en beats de on ties)."""
    toks = tokens(F.lower(F.col("text")))
    en = F.size(F.array_intersect(toks, _arr_lit(EN_STOPS)))
    de = F.size(F.array_intersect(toks, _arr_lit(DE_STOPS)))
    return df.select(
        "doc_id",
        en.alias("en_hits"),
        de.alias("de_hits"),
        F.when(en + de == 0, F.lit("und"))
        .when(en >= de, F.lit("en"))
        .otherwise(F.lit("de"))
        .alias("pred_lang"),
    )


LANG_ID_SQL = f"""
SELECT doc_id,
       len(list_intersect({tokens_sql('lower(text)')},
           {EN_STOPS!r})) AS en_hits,
       len(list_intersect({tokens_sql('lower(text)')},
           {DE_STOPS!r})) AS de_hits,
       CASE WHEN len(list_intersect({tokens_sql('lower(text)')}, {EN_STOPS!r}))
             + len(list_intersect({tokens_sql('lower(text)')}, {DE_STOPS!r})) = 0
            THEN 'und'
            WHEN len(list_intersect({tokens_sql('lower(text)')}, {EN_STOPS!r}))
              >= len(list_intersect({tokens_sql('lower(text)')}, {DE_STOPS!r}))
            THEN 'en' ELSE 'de' END AS pred_lang
FROM documents
"""


def quality_score(df: DataFrame) -> DataFrame:
    """Length / punctuation / stopword ratios → composite quality score.

    All ratios are exact integer divisions promoted to double, so the
    composite rounds identically in both engines.
    """
    toks = tokens(F.col("text"))
    n_tok = F.size(toks)
    n_chars = F.length("text")
    n_punct = F.length("text") - F.length(
        F.regexp_replace(F.col("text"), "[^A-Za-z0-9\\s]", "")
    )
    n_stop = F.size(F.array_intersect(tokens(F.lower(F.col("text"))), _arr_lit(EN_STOPS)))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tok > 0, n_stop / n_tok).otherwise(F.lit(0.0))
    len_score = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    return df.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(
            0.5 * len_score + 0.3 * stop_ratio + 0.2 * (1.0 - punct_ratio), 6
        ).alias("quality"),
    )


QUALITY_SQL = f"""
WITH q AS (
  SELECT doc_id,
         len({tokens_sql('text')}) AS n_tokens,
         length(text) AS n_chars,
         length(text) - length(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g'))
           AS n_punct,
         len(list_intersect({tokens_sql('lower(text)')}, {EN_STOPS!r})) AS n_stop
  FROM documents
)
SELECT doc_id, n_tokens,
       round(CASE WHEN n_chars > 0 THEN n_punct / n_chars ELSE 0.0 END, 6)
         AS punct_ratio,
       round(CASE WHEN n_tokens > 0 THEN n_stop / n_tokens ELSE 0.0 END, 6)
         AS stopword_ratio,
       round(0.5 * least(n_tokens / 100.0, 1.0)
           + 0.3 * (CASE WHEN n_tokens > 0 THEN n_stop / n_tokens ELSE 0.0 END)
           + 0.2 * (1.0 - CASE WHEN n_chars > 0 THEN n_punct / n_chars ELSE 0.0 END),
           6) AS quality
FROM q
"""


def token_count(df: DataFrame) -> DataFrame:
    """Whitespace token count + BPE-ish regex piece count."""
    return df.select(
        "doc_id",
        F.size(tokens(F.col("text"))).alias("ws_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(_BPE_RE), 0)).alias(
            "bpe_pieces"
        ),
    )


TOKEN_COUNT_SQL = f"""
SELECT doc_id,
       len({tokens_sql('text')}) AS ws_tokens,
       len(regexp_extract_all(text, '{_BPE_RE}')) AS bpe_pieces
FROM documents
"""


def fingerprint(df: DataFrame) -> DataFrame:
    """Document fingerprints: md5 of whitespace-normalized text, plus a
    winnowing-style min-hash over all 16-char windows (rolling-hash analog)."""
    norm = F.regexp_replace(F.lower(F.col("text")), "\\s+", " ")
    win = F.expr(
        "array_min(transform(sequence(1, greatest(length(text) - 15, 1)), "
        "i -> cast(conv(substring(md5(substring(text, i, 16)), 1, 15), 16, 10)"
        " as bigint)))"
    )
    return df.select(
        "doc_id",
        F.md5(norm).alias("fp_md5"),
        win.alias("fp_winnow"),
    )


FINGERPRINT_SQL = f"""
SELECT d.doc_id,
       md5(regexp_replace(lower(any_value(d.text)), '\\s+', ' ', 'g')) AS fp_md5,
       min({h60_sql('substr(d.text, g.i, 16)')}) AS fp_winnow
FROM documents d,
     unnest(generate_series(1, greatest(length(d.text) - 15, 1))) g(i)
GROUP BY d.doc_id
"""


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lang_id(load(spark, sf_dir, "documents"))


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality_score(load(spark, sf_dir, "documents"))


def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return token_count(load(spark, sf_dir, "documents"))


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return fingerprint(load(spark, sf_dir, "documents"))


ORACLES = {
    "lang_id": LANG_ID_SQL,
    "quality_score": QUALITY_SQL,
    "token_count": TOKEN_COUNT_SQL,
    "fingerprint": FINGERPRINT_SQL,
}

QUERIES = {
    "lang_id": q_lang_id,
    "quality_score": q_quality_score,
    "token_count": q_token_count,
    "fingerprint": q_fingerprint,
}
