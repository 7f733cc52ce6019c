"""Behavior tests for the corpus-governance operators (domain capping,
decontamination, sequence packing, PII redaction). Cross-engine value parity
is covered by ``test_oracle_parity.py``; these pin the operator invariants
on crafted skew/PII/contamination fixtures the synthetic tables can't
express."""

from __future__ import annotations

import hashlib
import re

import pytest
from pyspark.sql import functions as F

from cpp_paddle_ocr_spark.operators.governance import (
    EMAIL_RE,
    IPV4_RE,
    PHONE_RE,
    decontaminate,
    domain_cap,
    pack_chunks,
    pii_scan_redact,
)


def _eval_bucket_py(doc_id: int) -> int:
    """Python mirror of the md5 eval-split bucket (h60 % 100)."""
    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16) % 100


def _doc(doc_id, text, lang="en", source="src0"):
    return (doc_id, text, lang, source, len(text) if text else 0)

_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


@pytest.fixture(scope="module")
def skewed_docs(spark):
    """3 domains with 150/40/10 docs; n_chars collides heavily so the
    doc_id tie-break is exercised."""
    rows = []
    did = 0
    for source, n in [("big.example", 150), ("mid.example", 40), ("tiny.example", 10)]:
        for i in range(n):
            text = "tok " * (10 + (i * 7) % 25)
            rows.append(_doc(did, text.strip(), source=source))
            did += 1
    return spark.createDataFrame(rows, _SCHEMA)


def test_domain_cap_matches_single_window(spark, skewed_docs):
    """The salted two-stage top-N must equal the naive single-window
    global top-N exactly (ranks included), for several salt widths."""
    rows = skewed_docs.select("doc_id", "source", "n_chars").collect()
    expected = {}
    by_src = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    for src, docs in by_src.items():
        docs.sort(key=lambda r: (-r.n_chars, r.doc_id))
        for rank, r in enumerate(docs[:15], start=1):
            expected[r.doc_id] = (src, r.n_chars, rank)
    for n_salts in (1, 4, 8):
        got = {
            r.doc_id: (r.source, r.n_chars, r.domain_rank)
            for r in domain_cap(skewed_docs, cap=15, n_salts=n_salts).collect()
        }
        assert got == expected, f"n_salts={n_salts}"


def test_domain_cap_bound(spark, skewed_docs):
    out = domain_cap(skewed_docs, cap=7).groupBy("source").count().collect()
    counts = {r.source: r["count"] for r in out}
    assert counts == {"big.example": 7, "mid.example": 7, "tiny.example": 7}


def test_decontaminate_planted_overlap(spark):
    """A train doc sharing a trigram with an eval doc is flagged with the
    exact hit count; a disjoint train doc is absent."""
    eval_id = next(i for i in range(1000) if _eval_bucket_py(i) < 5)
    train_ids = [i for i in range(1000) if _eval_bucket_py(i) >= 5][:2]
    docs = spark.createDataFrame(
        [
            _doc(eval_id, "alpha beta gamma delta"),
            # shares the shingles 'alpha beta gamma' and 'beta gamma delta'
            _doc(train_ids[0], "zz alpha beta gamma delta yy"),
            _doc(train_ids[1], "uu vv ww xx"),
        ],
        _SCHEMA,
    )
    out = {r.doc_id: r for r in decontaminate(docs).collect()}
    assert set(out) == {train_ids[0]}
    hit = out[train_ids[0]]
    assert hit.n_hits == 2 and hit.n_shingles == 4
    assert hit.hit_frac == 0.5


def test_decontaminate_eval_df_path(spark):
    """Production form: eval shingles come from a separate benchmark
    table; the big side is scanned once (no self-split re-scan) and no
    hash-bucket exclusion applies."""
    train = spark.createDataFrame(
        [
            _doc(10, "zz alpha beta gamma delta yy"),
            _doc(11, "uu vv ww xx"),
        ],
        _SCHEMA,
    )
    bench = spark.createDataFrame(
        [_doc(900, "alpha beta gamma delta")], _SCHEMA
    )
    out = {r.doc_id: r for r in decontaminate(train, eval_df=bench).collect()}
    assert set(out) == {10}
    assert out[10].n_hits == 2 and out[10].n_shingles == 4
    # plan: the train side appears once (the self-split form needs two)
    plan = (
        decontaminate(train, eval_df=bench)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert plan.count("LogicalRDD") == 2  # one per table, not three


def test_pack_chunks_invariants(spark, skewed_docs):
    budget, chunk = 48, 32
    ch = pack_chunks(skewed_docs, chunk_tokens=chunk, budget=budget).collect()
    n_chunks_in = sum(
        -(-len(r.text.split()) // chunk) for r in skewed_docs.collect()
    )
    assert len(ch) == n_chunks_in  # every chunk assigned exactly once
    per_seq = {}
    per_bucket = {}
    for r in ch:
        assert 0 <= r.tok_offset < budget
        per_seq.setdefault((r.bucket, r.seq_id), 0)
        per_seq[(r.bucket, r.seq_id)] += r.n_chunk_tokens
        per_bucket.setdefault(r.bucket, set()).add(r.seq_id)
    # a chunk starting before the boundary may straddle it: per-sequence
    # total is bounded by budget + chunk − 1, and sequences are contiguous
    for total in per_seq.values():
        assert total <= budget + chunk - 1
    for seqs in per_bucket.values():
        assert seqs == set(range(max(seqs) + 1))


def test_pack_chunks_partitioning_independent(spark, skewed_docs):
    a = sorted(map(tuple, pack_chunks(skewed_docs).collect()))
    b = sorted(map(tuple, pack_chunks(skewed_docs.repartition(7)).collect()))
    assert a == b


def test_pii_redact_planted(spark):
    docs = spark.createDataFrame(
        [
            _doc(0, "mail a.user+tag@corp.example.org and b@x.io now"),
            _doc(1, "host 192.168.0.1 peer 10.255.3.77"),
            _doc(2, "dial +1 555-010-0042 ok"),
            _doc(3, "clean text with no identifiers at all"),
        ],
        _SCHEMA,
    )
    out = {r.doc_id: r for r in pii_scan_redact(docs).collect()}
    assert (out[0].n_emails, out[0].n_ips, out[0].n_phones) == (2, 0, 0)
    assert (out[1].n_emails, out[1].n_ips, out[1].n_phones) == (0, 2, 0)
    assert (out[2].n_emails, out[2].n_ips, out[2].n_phones) == (0, 0, 1)
    assert (out[3].n_emails, out[3].n_ips, out[3].n_phones) == (0, 0, 0)
    assert out[0].redacted == "mail <EMAIL> and <EMAIL> now"
    assert out[1].redacted == "host <IP> peer <IP>"
    assert out[2].redacted == "dial <PHONE> ok"
    assert out[3].redacted == "clean text with no identifiers at all"
    for r in out.values():
        for pat in (EMAIL_RE, IPV4_RE, PHONE_RE):
            assert not re.search(pat, r.redacted)


def test_pii_null_text_row(spark):
    docs = spark.createDataFrame([(5, None, "en", "s", 0)], _SCHEMA)
    out = pii_scan_redact(docs).collect()
    assert len(out) == 1 and out[0].redacted is None


def test_corpus_keep_domain_budget(spark):
    """corpus_keep(domain_cap_n=k) == the uncapped survivors ranked per
    domain and cut at k, with the exact rank attached."""
    from cpp_paddle_ocr_spark.operators.common import load
    from cpp_paddle_ocr_spark.operators.corpus import corpus_keep

    docs = load(spark, "/root/testdata/sf0.001", "documents")
    base = {r.doc_id: r for r in corpus_keep(docs).collect()}
    capped = {r.doc_id: r for r in corpus_keep(docs, domain_cap_n=3).collect()}
    assert set(capped) <= set(base)
    # reconstruct the expected cap from the uncapped survivors
    src = {
        r.doc_id: (r.source, r.n_chars)
        for r in docs.select("doc_id", "source", "n_chars").collect()
    }
    by_domain = {}
    for did in base:
        by_domain.setdefault(src[did][0], []).append(did)
    expected = {}
    for domain, ids in by_domain.items():
        ids.sort(key=lambda d: (-src[d][1], d))
        for rank, d in enumerate(ids[:3], start=1):
            expected[d] = rank
    assert {d: r.domain_rank for d, r in capped.items()} == expected
    # audit columns preserved alongside the new rank
    any_row = next(iter(capped.values()))
    assert {"pred_lang", "quality", "cluster_id", "domain_rank"} <= set(
        any_row.asDict()
    )


def test_corpus_keep_lm_gate(spark):
    """corpus_keep(lm_max_bits=cut) == the ungated survivors intersected
    with lm_score <= cut, with the exact bits attached."""
    from cpp_paddle_ocr_spark.operators.common import load
    from cpp_paddle_ocr_spark.operators.corpus import corpus_keep
    from cpp_paddle_ocr_spark.operators.text_analysis import lm_score

    docs = load(spark, "/root/testdata/sf0.001", "documents")
    base = {r.doc_id for r in corpus_keep(docs).collect()}
    bits = {
        r.doc_id: r.bits_per_token for r in lm_score(docs).collect()
    }
    surviving = sorted(bits[d] for d in base)
    cut = surviving[len(surviving) // 2]  # median: gate must drop SOME
    gated = {r.doc_id: r for r in corpus_keep(docs, lm_max_bits=cut).collect()}
    assert set(gated) == {d for d in base if bits[d] <= cut}
    assert 0 < len(gated) < len(base)
    for did, r in gated.items():
        assert r.bits_per_token == bits[did]


def test_corpus_stats_report_card(spark):
    """Null-text rows count in n_docs/n_null_text but contribute no tokens
    or quality; doc shares sum to 1; hand-checked group values."""
    from cpp_paddle_ocr_spark.operators.corpus import corpus_stats

    df = spark.createDataFrame(
        [
            (1, "a b c", "en", "s1"),
            (2, "d e", "en", "s1"),
            (3, None, "en", "s1"),
            (4, "x", "de", "s2"),
        ],
        "doc_id bigint, text string, lang string, source string",
    )
    out = {(r.source, r.lang): r for r in corpus_stats(df).collect()}
    s1 = out[("s1", "en")]
    assert s1.n_docs == 3 and s1.n_null_text == 1
    assert s1.n_tokens == 5  # 3 + 2, null text adds none
    assert abs(s1.avg_doc_tokens - round(5 / 3, 6)) < 1e-9
    assert s1.avg_quality is not None  # averaged over the 2 non-null texts
    assert abs(s1.doc_share - 0.75) < 1e-9
    s2 = out[("s2", "de")]
    assert s2.n_docs == 1 and s2.n_null_text == 0 and s2.n_tokens == 1
    assert abs(sum(r.doc_share for r in out.values()) - 1.0) < 1e-6


def test_canonical_url_hand_examples(spark):
    """Every canonicalization rule on explicit expected strings: case,
    www, userinfo, default vs non-default ports, trailing slash, empty
    path, tracking params, param sorting, fragments, NULL and garbage."""
    from cpp_paddle_ocr_spark.operators.governance import url_canonicalize

    cases = [
        (
            "HTTP://user:pw@WWW.Example.COM:80/a/b/?utm_source=x&b=2&a=1#frag",
            "http://example.com/a/b?a=1&b=2",
        ),
        ("https://example.com:443/", "https://example.com/"),
        ("https://example.com", "https://example.com/"),
        ("https://example.com:80/x", "https://example.com:80/x"),
        ("http://Example.com:8080/X/", "http://example.com:8080/X"),
        ("http://a.com/p?gclid=1&fbclid=2&utm_medium=m", "http://a.com/p"),
        ("http://a.com/p?z=1&y=2&z=0", "http://a.com/p?y=2&z=0&z=1"),
        ("not a url at all", None),
        (None, None),
    ]
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(cases)], "i int, url string"
    )
    got = {r.i: r.canonical_url for r in url_canonicalize(df).collect()}
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (cases[i][0], got[i], want)


def test_canonical_url_unifies_spellings(spark):
    """Distinct spellings of one resource collapse to one canonical key —
    the property URL-keyed dedup/budget operators rely on."""
    from cpp_paddle_ocr_spark.operators.governance import url_canonicalize

    spellings = [
        "http://www.site.org/page",
        "HTTP://SITE.org:80/page/",
        "http://site.org/page?utm_campaign=c",
        "http://site.org/page#top",
    ]
    df = spark.createDataFrame([(u,) for u in spellings], "url string")
    canon = {r.canonical_url for r in url_canonicalize(df).collect()}
    assert canon == {"http://site.org/page"}
