"""Repetition stats/removal (text_analysis.repetition_*).

Oracle parity for both driver entries runs in test_oracle_parity; here:
hand-computable fixtures and the degenerate shapes (single token, all-same
tokens) the fixture corpus never hits.
"""

from __future__ import annotations

import math
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from cpp_paddle_ocr_spark.operators.text_analysis import (  # noqa: E402
    repetition_filter,
    repetition_stats,
)


def _stats(spark, texts: list[str]) -> dict[int, dict]:
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    return {r["doc_id"]: r.asDict() for r in repetition_stats(df).collect()}


def test_hand_computed_doc(spark):
    # "a b a b c": bigrams [a b, b a, a b, b c] → top 2/4; trigrams
    # [a b a, b a b, a b c] all unique → dup 0; tokens a:2 b:2 c:1 n=5
    got = _stats(spark, ["a b a b c"])[0]
    assert got["n_tok"] == 5
    assert got["top_bigram_frac"] == 0.5
    assert got["dup_trigram_frac"] == 0.0
    h = math.log(5) - (2 * math.log(2) + 2 * math.log(2) + 0) / 5
    assert abs(got["token_entropy"] - round(h, 6)) < 1e-9


def test_degenerate_all_same_token(spark):
    # "x x x x": one distinct bigram/trigram → max repetition, zero entropy
    got = _stats(spark, ["x x x x"])[0]
    assert got["top_bigram_frac"] == 1.0
    assert got["dup_trigram_frac"] == 1.0
    assert got["token_entropy"] == 0.0


def test_single_token_doc(spark):
    # no bigrams/trigrams exist: fractions coalesce to 0.0 (nothing can
    # repeat), entropy is 0 — the doc is dropped by the ENTROPY gate, not
    # by implicit NULL comparisons (round-4 advice)
    got = _stats(spark, ["lonely"])[0]
    assert got["n_tok"] == 1
    assert got["top_bigram_frac"] == 0.0
    assert got["dup_trigram_frac"] == 0.0
    assert got["token_entropy"] == 0.0

    from cpp_paddle_ocr_spark.operators.text_analysis import repetition_filter

    df = spark.createDataFrame([(0, "lonely")], "doc_id bigint, text string")
    assert repetition_filter(df).count() == 0  # entropy gate still drops it


def test_filter_drops_repetitive_doc(spark):
    df = spark.createDataFrame(
        [(0, "spam " * 50), (1, " ".join(f"w{i}" for i in range(50)))],
        "doc_id bigint, text string",
    )
    kept = [r["doc_id"] for r in repetition_filter(df).collect()]
    assert kept == [1]


def test_chunk_documents_contract(spark):
    from cpp_paddle_ocr_spark.operators.text_analysis import chunk_documents

    # 80 tokens, chunk 32 overlap 8 -> starts 0,24,48: the chunk at 48
    # spans tokens 48..79, so ceil((n-overlap)/stride)=3 chunks cover all
    text = " ".join(f"w{i}" for i in range(80))
    df = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
    rows = sorted(
        chunk_documents(df).collect(), key=lambda r: r["chunk_idx"]
    )
    assert [r["tok_start"] for r in rows] == [0, 24, 48]
    assert [r["n_chunk_tokens"] for r in rows] == [32, 32, 32]
    # consecutive chunks overlap by 8 tokens
    first = rows[0]["chunk_text"].split()
    second = rows[1]["chunk_text"].split()
    assert first[24:] == second[:8]
    # every token is covered
    covered = set()
    for r in rows:
        covered.update(r["chunk_text"].split())
    assert len(covered) == 80


def test_chunk_documents_short_doc_single_chunk(spark):
    from cpp_paddle_ocr_spark.operators.text_analysis import chunk_documents

    df = spark.createDataFrame([(1, "a b c")], "doc_id bigint, text string")
    rows = chunk_documents(df).collect()
    assert len(rows) == 1
    assert rows[0]["n_chunk_tokens"] == 3
    assert rows[0]["chunk_text"] == "a b c"


def test_hash_sample_is_nested_and_deterministic(spark):
    from cpp_paddle_ocr_spark.operators.text_analysis import hash_sample

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    p5 = {r["doc_id"] for r in hash_sample(docs, 5).collect()}
    p10 = {r["doc_id"] for r in hash_sample(docs, 10).collect()}
    p10_again = {r["doc_id"] for r in hash_sample(docs, 10).collect()}
    assert p5 <= p10            # nested: 5% sample is inside the 10%
    assert p10 == p10_again     # deterministic across runs
    assert 0 < len(p10) < docs.count()


def test_mix_sample_rates_and_nesting(spark):
    """mix_sample: per-source keep decided by the doc's md5 bucket against
    that source's weight (verified against an independent hashlib
    recomputation); raising one source's weight only ADDS rows; absent
    sources are dropped."""
    import hashlib

    from cpp_paddle_ocr_spark.operators.text_analysis import mix_sample

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    w = {"src0": 100, "src1": 50, "src2": 10}
    out = {r.doc_id: r for r in mix_sample(docs, w).collect()}

    def bucket(doc_id: int) -> int:
        return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16) % 100

    exp = {
        r.doc_id
        for r in docs.select("doc_id", "source").collect()
        if r.source in w and bucket(r.doc_id) < w[r.source]
    }
    assert set(out) == exp and 0 < len(out) < docs.count()
    for r in out.values():
        assert r.bucket == bucket(r.doc_id)
        assert r.source in w  # whitelist: absent sources never appear
    # nesting per source: only src2 rows may be added by raising src2
    w2 = dict(w, src2=60)
    out2 = {r.doc_id: r.source for r in mix_sample(docs, w2).collect()}
    assert set(out) <= set(out2)
    assert {s for d, s in out2.items() if d not in out} == {"src2"}


def test_mix_weights_temperature_semantics(spark):
    """mix_weights: the biggest source pins weight_rel=1.0; lowering alpha
    raises every tail source's relative weight (temperature flattening);
    alpha=1 reproduces proportional token shares; temperature_sample keeps
    exactly the docs whose md5 bucket clears the derived keep_pct."""
    import hashlib

    from cpp_paddle_ocr_spark.operators.text_analysis import (
        mix_weights,
        temperature_sample,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    w_half = {r.source: r for r in mix_weights(docs, 0.5).collect()}
    w_prop = {r.source: r for r in mix_weights(docs, 1.0).collect()}
    big = max(w_half.values(), key=lambda r: r.n_tokens).source
    assert w_half[big].weight_rel == 1.0 == w_prop[big].weight_rel
    assert w_half[big].keep_pct == 100
    for s, r in w_half.items():
        if s == big:
            continue
        assert r.weight_rel > w_prop[s].weight_rel  # flattening lifts tails
        assert 0 < r.keep_pct <= 100
    # alpha=1 → weight_rel is the plain token ratio vs the biggest source
    max_tok = w_prop[big].n_tokens
    for s, r in w_prop.items():
        assert abs(r.weight_rel - round(r.n_tokens / max_tok, 6)) < 1e-9

    def bucket(doc_id: int) -> int:
        return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16) % 100

    kept = {r.doc_id: r for r in temperature_sample(docs, 0.5).collect()}
    exp = {
        r.doc_id
        for r in docs.select("doc_id", "source").collect()
        if bucket(r.doc_id) < w_half[r.source].keep_pct
    }
    assert set(kept) == exp and 0 < len(kept) < docs.count()


def test_pow_alpha_ladder_rejects_off_ladder(spark):
    import pytest as _pytest

    from cpp_paddle_ocr_spark.operators.text_analysis import _pow_alpha_expr

    assert _pow_alpha_expr("x", 1.0) == "x"
    assert _pow_alpha_expr("x", 0.25) == "sqrt(sqrt(x))"
    with _pytest.raises(ValueError):
        _pow_alpha_expr("x", 0.3)


def test_chunk_documents_null_text_no_rows(spark):
    from cpp_paddle_ocr_spark.operators.text_analysis import chunk_documents

    df = spark.createDataFrame(
        [(1, "a b c"), (2, None)], "doc_id bigint, text string"
    )
    assert [r["doc_id"] for r in chunk_documents(df).collect()] == [1]


def test_per_row_udf_matches_batch_stats(spark):
    """repetition_metrics_udf (the stateless streaming form) must agree
    row-for-row with the batch aggregation form on real fixture docs plus
    the degenerate shapes."""
    from cpp_paddle_ocr_spark.operators.text_analysis import (
        repetition_metrics_udf,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    extra = spark.createDataFrame(
        [
            (100001, "a b a b c"),
            (100002, "x x x x"),
            (100003, "lonely"),
            (100004, "spam " * 50),
        ],
        "doc_id bigint, text string",
    )
    df = docs.unionByName(extra)
    from cpp_paddle_ocr_spark.operators.text_analysis import repetition_stats

    batch = {r.doc_id: r for r in repetition_stats(df).collect()}
    perrow = df.withColumn("m", repetition_metrics_udf()(F.col("text"))).select(
        "doc_id", "m.*"
    )
    rows = perrow.collect()
    assert len(rows) == len(batch)  # fixture has no zero-token docs
    for r in rows:
        b = batch[r.doc_id]
        assert r.n_tok == b.n_tok, r.doc_id
        assert r.top_bigram_frac == b.top_bigram_frac, r.doc_id
        assert r.dup_trigram_frac == b.dup_trigram_frac, r.doc_id
        assert r.token_entropy == b.token_entropy, r.doc_id


def test_term_stats_hand_computed(spark):
    import math

    from cpp_paddle_ocr_spark.operators.text_analysis import term_stats

    df = spark.createDataFrame(
        [(0, "a b a"), (1, "b c"), (2, None)], "doc_id bigint, text string"
    )
    got = {r.tok: r for r in term_stats(df).collect()}
    assert set(got) == {"a", "b", "c"}
    assert (got["a"].tf, got["a"].doc_freq) == (2, 1)
    assert (got["b"].tf, got["b"].doc_freq) == (2, 2)
    assert (got["c"].tf, got["c"].doc_freq) == (1, 1)
    # N=3 includes the NULL-text doc (it contributes no tokens)
    assert got["a"].idf == round(math.log(3 / 1), 6)
    assert got["b"].idf == round(math.log(3 / 2), 6)


def test_vocab_topk_deterministic_order(spark):
    from cpp_paddle_ocr_spark.operators.text_analysis import vocab_topk

    df = spark.createDataFrame(
        [(0, "x x y z"), (1, "y x w")], "doc_id bigint, text string"
    )
    rows = sorted(vocab_topk(df, k=3).collect(), key=lambda r: r.vocab_id)
    # tf: x=3, y=2, w=1, z=1 -> ties broken token-ascending
    assert [(r.tok, r.tf, r.vocab_id) for r in rows] == [
        ("x", 3, 1),
        ("y", 2, 2),
        ("w", 1, 3),
    ]


def test_encode_documents_hand_computed(spark):
    from cpp_paddle_ocr_spark.operators.text_analysis import (
        encode_documents,
        vocab_topk,
    )

    df = spark.createDataFrame(
        [(0, "x x y z"), (1, "y x w"), (2, None)],
        "doc_id bigint, text string",
    )
    # self-trained vocab (k=2): x->1, y->2; z/w are OOV -> 0
    got = {r.doc_id: r for r in encode_documents(df, k=2).collect()}
    assert set(got) == {0, 1}  # NULL-text doc emits no row
    assert got[0].ids == [1, 1, 2, 0] and got[0].n_oov == 1
    assert got[1].ids == [2, 1, 0] and got[1].n_oov == 1
    assert (got[0].n_tokens, got[1].n_tokens) == (4, 3)
    # external vocab table (the trained-elsewhere form)
    ext = vocab_topk(spark.createDataFrame([(9, "w w z")], "doc_id bigint, text string"), k=2)
    got2 = {r.doc_id: r for r in encode_documents(df, vocab_df=ext).collect()}
    # ext vocab: w->1, z->2
    assert got2[0].ids == [0, 0, 0, 2]
    assert got2[1].ids == [0, 0, 1]


def test_encode_documents_partitioning_independent(spark):
    from cpp_paddle_ocr_spark.operators.text_analysis import encode_documents

    df = spark.createDataFrame(
        [(i, " ".join(f"t{(i * 7 + j) % 13}" for j in range(20))) for i in range(50)],
        "doc_id bigint, text string",
    )
    a = sorted((r.doc_id, r.ids) for r in encode_documents(df, k=5).collect())
    b = sorted(
        (r.doc_id, r.ids)
        for r in encode_documents(df.repartition(11), k=5).collect()
    )
    assert a == b
