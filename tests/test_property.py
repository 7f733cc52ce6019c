"""Property-based robustness: arbitrary bytes/markup must never crash the
core, and every structural invariant must hold (P9 error-row policy — a
poisoned page must not fail the partition, ``src/ocr_worker.cpp:192-206``)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from cpp_paddle_ocr_spark.core.decode import recognize_spans
from cpp_paddle_ocr_spark.core.detect import detect_page
from cpp_paddle_ocr_spark.core.html_parse import parse_blocks
from cpp_paddle_ocr_spark.core.pipeline import extract_one

html_ish = st.text(
    alphabet=st.sampled_from(list("<>/ab cp=\"'&;!-\n\tdiv" "日ä\x00\x7f​")),
    max_size=400,
)


@settings(max_examples=120, deadline=None)
@given(html_ish)
def test_parser_never_crashes_and_offsets_valid(doc):
    blocks = parse_blocks(doc)
    for b in blocks:
        for s, e in b.segments:
            assert 0 <= s <= e <= len(doc)
        assert b.text(doc) == "".join(doc[s:e] for s, e in b.segments)


@settings(max_examples=80, deadline=None)
@given(html_ish)
def test_detect_invariants(doc):
    spans = detect_page(doc, parse_blocks(doc))
    seen = sorted((s.start, s.end) for s in spans)
    for (s1, e1), (s2, e2) in zip(seen, seen[1:]):
        assert e1 <= s2, "spans must be disjoint"
    for s in spans:
        assert 0 <= s.start < s.end <= len(doc)
        assert 0.0 < s.score < 1.0


@settings(max_examples=80, deadline=None)
@given(st.binary(max_size=300))
def test_pipeline_never_raises_on_garbage_bytes(blob):
    row = extract_one("u", blob)
    assert isinstance(row["success"], (bool,)) or row["success"] in (0, 1)
    assert row["extracted_text"] is not None


@settings(max_examples=60, deadline=None)
@given(st.lists(st.text(max_size=60), max_size=25))
def test_decode_deterministic_and_order_preserving(texts):
    a = recognize_spans(texts)
    b = recognize_spans(texts)
    assert a == b
    # processing reversed input and reversing back gives identical results
    c = list(reversed(recognize_spans(list(reversed(texts)))))
    assert c == a


@settings(max_examples=80, deadline=None)
@given(st.text(max_size=400))
def test_layout_kernels_never_raise_on_arbitrary_text(doc):
    # P9 discipline for the T1-T3 stage: malformed/hostile html must never
    # crash a task; outputs stay within document bounds
    from cpp_paddle_ocr_spark.core.layout import (
        detect_regions_page,
        extract_tables_page,
    )

    for t in extract_tables_page(doc):
        assert 0 <= t.start <= t.end <= len(doc)
        for c in t.cells:
            assert 0 <= c.start <= c.end <= len(doc)
        assert t.score == -1.0 or 0.0 < t.score < 1.0
    for r in detect_regions_page(doc):
        assert 0 <= r.start <= r.end <= len(doc)


@settings(max_examples=60, deadline=None)
@given(st.text(alphabet="<>tdrableh /ob", max_size=200))
def test_layout_tag_soup_never_raises(doc):
    # adversarial tag soup: fragments of table markup in random order
    from cpp_paddle_ocr_spark.core.layout import extract_tables_page

    for t in extract_tables_page(doc):
        assert isinstance(t.structure, str)
