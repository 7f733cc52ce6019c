"""Semantic tests for the round-5 curation additions: C4-style duplicate
span removal (``dedup.span_dedup``) and CCNet-style unigram-LM scoring
(``text_analysis.lm_score`` / ``lm_filter``). Oracle parity at sf0.001 is
covered by test_oracle_parity; these pin the hand-checkable semantics on
tiny constructed corpora."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from cpp_paddle_ocr_spark.operators.dedup import span_dedup
from cpp_paddle_ocr_spark.operators.text_analysis import lm_filter, lm_score


def _docs(spark, texts):
    return spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )


SPAN = "alpha beta gamma delta epsilon zeta eta theta"  # exactly w=8 tokens


def test_span_dedup_keeps_first_occurrence(spark):
    df = _docs(
        spark,
        [
            f"unique one two three {SPAN} tail0 tail1",
            f"other four five six {SPAN} tail2 tail3",
        ],
    )
    out = {r.doc_id: r for r in span_dedup(df).collect()}
    # doc 0 is the lexicographic-first occurrence: untouched
    assert out[0].n_removed == 0
    assert out[0].clean_text == f"unique one two three {SPAN} tail0 tail1"
    # doc 1 loses exactly the 8 shared-span tokens, order preserved
    assert out[1].n_removed == 8
    assert out[1].clean_text == "other four five six tail2 tail3"
    assert out[1].n_tokens == 14


def test_span_dedup_exact_duplicate_doc_empties(spark):
    text = f"{SPAN} iota kappa"  # 10 tokens, every position span-covered
    df = _docs(spark, [text, text])
    out = {r.doc_id: r for r in span_dedup(df).collect()}
    assert out[0].n_removed == 0 and out[0].clean_text == text
    assert out[1].n_removed == out[1].n_tokens == 10
    assert out[1].clean_text == ""


def test_span_dedup_short_and_null_docs(spark):
    df = spark.createDataFrame(
        [(0, "too short for any shingle"), (1, None)],
        "doc_id long, text string",
    )
    out = span_dedup(df).collect()
    # NULL text is excluded; sub-w docs pass through whole
    assert [r.doc_id for r in out] == [0]
    assert out[0].n_removed == 0
    assert out[0].clean_text == "too short for any shingle"


def test_span_dedup_zero_token_doc_emits_no_row(spark):
    # whitespace-only text: the round-5 posexplode form dropped it
    # implicitly (no exploded rows → no group); the round-6 array form
    # must keep that contract via its explicit size(arr) >= 1 filter
    df = spark.createDataFrame(
        [(0, "   \t  "), (1, "one real document here")],
        "doc_id long, text string",
    )
    out = span_dedup(df).collect()
    assert [r.doc_id for r in out] == [1]


def test_span_dedup_within_doc_repeat(spark):
    df = _docs(spark, [f"{SPAN} bridge {SPAN}"])
    out = span_dedup(df).collect()[0]
    # the second occurrence inside the SAME doc is the duplicate
    assert out.n_removed == 8
    assert out.clean_text == f"{SPAN} bridge"


def test_lm_score_bits_and_oov(spark):
    # 3 docs over a 3-token head + 1 rare token; k=2 puts 'rare' and
    # 'tail' out of vocabulary (floor p = 1/total_tf)
    df = _docs(spark, ["hot hot hot hot", "hot warm hot warm", "rare tail"])
    out = {r.doc_id: r for r in lm_score(df, k=2).collect()}
    total = 10  # 6 hot + 2 warm + rare + tail
    assert out[0].oov_frac == 0.0
    assert out[0].bits_per_token == round(-math.log2(6 / total), 6)
    assert out[1].bits_per_token == round(
        (-math.log2(6 / total) - math.log2(2 / total)) / 2, 6
    )
    assert out[2].oov_frac == 1.0
    assert out[2].bits_per_token == round(-math.log2(1 / total), 6)
    # model reuse: scoring NEW docs under the trained model
    model = (
        df.select(F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("tf"))
    )
    new = _docs(spark, ["hot unseen"])
    row = lm_score(new, model_df=model, k=2).collect()[0]
    assert row.oov_frac == 0.5
    assert row.bits_per_token == round(
        (-math.log2(6 / total) - math.log2(1 / total)) / 2, 6
    )


def test_lm_filter_drops_high_entropy_tail(spark):
    df = _docs(spark, ["hot hot hot hot hot hot", "rare1 rare2 rare3"])
    kept = lm_filter(df, max_bits=2.0).collect()
    assert [r.doc_id for r in kept] == [0]


def _py_span_dedup(texts: list[str], w: int) -> dict[int, tuple]:
    """Brute-force reference: hash every w-token window, first occurrence
    by (doc_id, start) keeps, all other occurrences' positions removed."""
    occ: dict[str, list[tuple[int, int]]] = {}
    toks = {i: t.split() for i, t in enumerate(texts)}
    for i, ts in toks.items():
        for s in range(len(ts) - w + 1):
            occ.setdefault(" ".join(ts[s : s + w]), []).append((i, s))
    covered: dict[int, set] = {i: set() for i in toks}
    for sites in occ.values():
        for d, s in sorted(sites)[1:]:
            covered[d].update(range(s, s + w))
    return {
        i: (
            len(ts),
            len(covered[i]),
            " ".join(t for p, t in enumerate(ts) if p not in covered[i]),
        )
        for i, ts in toks.items()
    }


def test_span_dedup_matches_reference_on_random_corpus(spark):
    """Randomized corpus with planted full/partial duplicates: the Spark
    operator must agree with the brute-force reference on every doc."""
    import random

    from cpp_paddle_ocr_spark.operators.dedup import SPAN_W

    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(9)]  # tiny vocab → organic repeats too
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(6, 40)))
        for _ in range(12)
    ]
    texts.append(texts[3])  # exact duplicate
    texts.append(texts[5] + " " + texts[7])  # concatenated duplicate spans
    df = _docs(spark, texts)
    exp = _py_span_dedup(texts, SPAN_W)
    got = {
        r.doc_id: (r.n_tokens, r.n_removed, r.clean_text)
        for r in span_dedup(df).collect()
    }
    assert got == exp


def test_lm_bits_col_matches_lm_score(spark):
    """The stateless literal-map form must reproduce lm_score's
    bits_per_token value-for-value under the same model."""
    from cpp_paddle_ocr_spark.operators.text_analysis import lm_bits_col

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(
        100
    )
    model_df = (
        df.select(F.explode(F.split("text", r"\s+")).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count("*").alias("tf"))
    )
    rows = model_df.collect()
    model = {r.tok: r.tf for r in rows}
    total = sum(model.values())
    batch = {
        r.doc_id: r.bits_per_token
        for r in lm_score(df, model_df=model_df).collect()
    }
    rowwise = {
        r.doc_id: r.b
        for r in df.filter(F.col("text").isNotNull())
        .select("doc_id", lm_bits_col(model, total, "text").alias("b"))
        .collect()
    }
    assert batch == rowwise


# --- winnowing ---------------------------------------------------------------


def _py_winnow(text: str, k: int, w: int) -> set[tuple[int, int]]:
    """Independent reference winnowing (Schleimer et al. fig. 5 semantics):
    min of each w-gram window, ties rightmost, 1-based gram positions."""
    import hashlib

    toks = text.split()
    grams = [
        int(hashlib.md5(" ".join(toks[i : i + k]).encode()).hexdigest()[:15], 16)
        for i in range(len(toks) - k + 1)
    ]
    if not grams:
        return set()
    n_w = max(len(grams) - w + 1, 1)
    out = set()
    for j in range(n_w):
        win = grams[j : j + w]
        m = min(win)
        pos = j + max(i for i, g in enumerate(win) if g == m)
        out.add((pos + 1, grams[pos]))
    return out


def test_winnow_sketch_matches_reference_impl(spark):
    import random

    from cpp_paddle_ocr_spark.operators.dedup import (
        WINNOW_K,
        WINNOW_W,
        winnow_sketch,
    )

    rng = random.Random(7)
    vocab = [f"t{i}" for i in range(12)]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(n)) for n in (3, 4, 6, 30, 80)
    ]
    df = _docs(spark, texts)
    got: dict[int, set] = {i: set() for i in range(len(texts))}
    for r in winnow_sketch(df).collect():
        got[r.doc_id].add((r.pos, r.gram_hash))
    for i, text in enumerate(texts):
        assert got[i] == _py_winnow(text, WINNOW_K, WINNOW_W), f"doc {i}"
    assert got[0] == set()  # 3 tokens < k: no grams
    assert len(got[1]) == 1  # single gram, single window


def test_winnow_shared_substring_guarantee(spark):
    # two docs sharing a (k + w - 1)-token run MUST share a print
    from cpp_paddle_ocr_spark.operators.dedup import winnow_sketch

    shared = "s1 s2 s3 s4 s5 s6 s7"  # k + w - 1 = 7 tokens
    df = _docs(
        spark,
        [f"a1 a2 a3 {shared} a4 a5", f"b1 b2 {shared} b3 b4 b5 b6"],
    )
    prints = {0: set(), 1: set()}
    for r in winnow_sketch(df).collect():
        prints[r.doc_id].add(r.gram_hash)
    assert prints[0] & prints[1]


def test_tfidf_topterms_hand_example(spark):
    import math

    from cpp_paddle_ocr_spark.operators.text_analysis import tfidf_topterms

    df = _docs(spark, ["apple apple banana", "banana cherry", "cherry date"])
    out = [
        (r.doc_id, r.rank, r.tok, r.tfidf)
        for r in tfidf_topterms(df, k=2).collect()
    ]
    idf = lambda d: math.log(3 / d)  # noqa: E731
    exp = [
        (0, 1, "apple", round(2 * idf(1), 6)),
        (0, 2, "banana", round(1 * idf(2), 6)),
        (1, 1, "banana", round(1 * idf(2), 6)),
        (1, 2, "cherry", round(1 * idf(2), 6)),  # tie → tok asc
        (2, 1, "date", round(1 * idf(1), 6)),
        (2, 2, "cherry", round(1 * idf(2), 6)),
    ]
    assert sorted(out) == sorted(exp)


def test_dedup_increment_flags_all_three_states(spark):
    """corpus-dup, within-increment dup (first-seen wins), fresh doc, and
    NULL-text rows (always kept, never dups of each other)."""
    from cpp_paddle_ocr_spark.operators.dedup import dedup_increment

    corpus = spark.createDataFrame(
        [(1, "already curated"), (2, "old news")],
        "doc_id bigint, text string",
    )
    inc = spark.createDataFrame(
        [
            (10, "already curated"),   # exact dup of corpus doc 1
            (11, "fresh content"),     # new -> keep
            (12, "fresh content"),     # within-increment dup of 11
            (13, None),                # null text -> keep
            (14, None),                # null text -> keep (NOT a dup of 13)
        ],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in dedup_increment(inc, corpus).collect()}
    assert out[10].dup_source == "corpus" and not out[10].keep
    assert out[11].dup_source is None and out[11].keep
    assert out[12].dup_source == "increment" and not out[12].keep
    for null_doc in (13, 14):
        assert out[null_doc].fp is None
        assert out[null_doc].dup_source is None and out[null_doc].keep
    assert len(out) == 5  # every increment row is flagged, none dropped


def test_dedup_increment_corpus_precedence_over_increment(spark):
    """A fingerprint present in BOTH the corpus and earlier in the
    increment reports 'corpus' (the stronger provenance)."""
    from cpp_paddle_ocr_spark.operators.dedup import dedup_increment

    corpus = spark.createDataFrame([(1, "x")], "doc_id bigint, text string")
    inc = spark.createDataFrame(
        [(10, "x"), (11, "x")], "doc_id bigint, text string"
    )
    out = {r.doc_id: r.dup_source for r in dedup_increment(inc, corpus).collect()}
    assert out == {10: "corpus", 11: "corpus"}


def test_neardup_increment_flags_near_and_exact(spark):
    """An increment doc whose text differs by one token from a corpus doc
    (Jaccard 10/11 > 0.8) is flagged; an unrelated doc and a NULL-text
    doc are kept; match_id is the smallest matching corpus doc_id."""
    from cpp_paddle_ocr_spark.operators.dedup import neardup_increment

    base = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    corpus = spark.createDataFrame(
        [(1, base), (2, base), (3, "completely different words here now")],
        "doc_id bigint, text string",
    )
    inc = spark.createDataFrame(
        [
            (10, base + " kilo"),        # near-dup of corpus 1 and 2
            (11, base),                  # exact dup -> match_id = min(1, 2)
            (12, "zulu yankee xray whiskey victor uniform tango sierra"),
            (13, None),                  # no signature -> keep
        ],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in neardup_increment(inc, corpus).collect()}
    assert out[11].match_id == 1 and not out[11].keep
    assert out[10].match_id == 1 and not out[10].keep
    assert out[12].match_id is None and out[12].keep
    assert out[13].match_id is None and out[13].keep
    assert len(out) == 4


def test_neardup_increment_overcap_anchor_degradation(spark):
    """With band_cap=1 an identical-text corpus family keeps only its
    anchor (min doc_id) per band key; the match still resolves, to the
    anchor — the bounded-recall skew degradation, never a k x k join."""
    from cpp_paddle_ocr_spark.operators.dedup import neardup_increment

    fam = "same boilerplate template page body tokens one two three four"
    corpus = spark.createDataFrame(
        [(i, fam) for i in range(5, 25)], "doc_id bigint, text string"
    )
    inc = spark.createDataFrame([(100, fam)], "doc_id bigint, text string")
    out = neardup_increment(inc, corpus, band_cap=1).collect()
    assert len(out) == 1
    assert out[0].match_id == 5 and not out[0].keep


def test_neardup_increment_bruteforce_recall_and_precision(spark):
    """Randomized (seeded) cross-check against brute-force token-Jaccard:
    every reported match must be a true >= 0.8 pair (precision 1.0 by the
    verify stage's construction), and LSH band recall over planted
    near-dups must clear the analytic floor (miss-all-4-bands at s=0.85
    is ~1.3%, so 15 plants virtually never lose more than 2)."""
    import random

    from cpp_paddle_ocr_spark.operators.dedup import (
        NEARDUP_VERIFY_PCT,
        neardup_increment,
    )

    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(400)]

    def doc():
        return " ".join(rng.sample(vocab, 12))

    corpus_rows = [(i, doc()) for i in range(60)]
    inc_rows = []
    planted = set()
    for j in range(40):
        did = 1000 + j
        if j < 15:  # near-copy of corpus doc j: replace one token
            toks = corpus_rows[j][1].split()
            toks[rng.randrange(12)] = f"x{j}"
            inc_rows.append((did, " ".join(toks)))
            planted.add(did)
        else:
            inc_rows.append((did, doc()))

    def jac(a, b):
        sa, sb = set(a.split()), set(b.split())
        return len(sa & sb) * 100 >= len(sa | sb) * NEARDUP_VERIFY_PCT

    true_matched = {
        did
        for did, t in inc_rows
        if any(jac(t, ct) for _, ct in corpus_rows)
    }
    corpus = spark.createDataFrame(corpus_rows, "doc_id bigint, text string")
    inc = spark.createDataFrame(inc_rows, "doc_id bigint, text string")
    flagged = {
        r.doc_id for r in neardup_increment(inc, corpus).collect() if not r.keep
    }
    assert flagged <= true_matched  # precision 1.0: verify stage is exact
    recall = len(flagged & true_matched) / len(true_matched)
    assert recall >= 0.8, (recall, len(true_matched))


def test_exact_corpus_dup_implies_neardup_flag(spark):
    """On the sf0.001 driver split (no over-cap band keys at this scale):
    every increment row dedup_increment flags as a 'corpus' EXACT dup must
    also be flagged by neardup_increment — identical text means identical
    signature, identical band keys, and Jaccard 1."""
    from cpp_paddle_ocr_spark.operators import dedup

    SF = "/root/testdata/sf0.001"
    exact = {
        r.doc_id
        for r in dedup.QUERIES["dedup_increment"](spark, SF).collect()
        if r.dup_source == "corpus"
    }
    assert exact, "driver split must overlap"
    near = {
        r.doc_id
        for r in dedup.QUERIES["dedup_neardup_increment"](spark, SF).collect()
        if not r.keep
    }
    assert exact <= near
