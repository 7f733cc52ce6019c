"""Coverage for the smaller inventory items: S2 base64 source, S8 debug
sink, D10 slow score mode."""

from __future__ import annotations

import base64

from cpp_paddle_ocr_spark.core.detect import detect_page
from cpp_paddle_ocr_spark.core.html_parse import parse_blocks
from cpp_paddle_ocr_spark.operators.debug import dump_sample
from cpp_paddle_ocr_spark.operators.extract import extract
from cpp_paddle_ocr_spark.sources.documents import from_base64, generate_documents


def test_from_base64_roundtrip(spark):
    html = b"<html><body><p>Base sixty four payload decodes fine here.</p></body></html>"
    df = spark.createDataFrame(
        [("u1", base64.b64encode(html).decode())], "url string, html_b64 string"
    )
    out = extract(from_base64(df)).collect()
    assert out[0].success and "payload decodes fine" in out[0].extracted_text


def test_debug_dump_sample(spark, tmp_path):
    docs = generate_documents(spark, 12, oversize_max=500_000)
    path = dump_sample(extract(docs), str(tmp_path / "report.html"), n=6)
    content = open(path, encoding="utf-8").read()
    assert "extraction sample" in content and "host" in content


def test_slow_score_mode_is_weighted_mean():
    doc = "<p>Short words then averylongtokenindeedhere follows normally.</p>"
    blocks = parse_blocks(doc)
    fast = detect_page(doc, blocks, score_mode="fast")
    slow = detect_page(doc, blocks, score_mode="slow")
    assert fast and slow
    assert fast[0].text == slow[0].text  # same span geometry
    assert fast[0].score != slow[0].score  # weighting differs


def test_default_mode_is_fast():
    from cpp_paddle_ocr_spark.config import DET_SCORE_MODE

    assert DET_SCORE_MODE == "fast"  # the live config, src/ocr_worker.cpp:32


def test_rotate_crop_span_facility():
    # C2 GetRotateCropImage transplant (lib-only, like the reference:
    # provided and tested, never called by the live worker path)
    from cpp_paddle_ocr_spark.core.crop import crop_span, rotate_crop_span

    doc = "abcdef"
    assert crop_span(doc, -5, 3) == "abc"  # C3 zero-pad clamping
    assert crop_span(doc, 4, 99) == "ef"
    # skewed multi-line crop re-flows to one upright line
    assert rotate_crop_span("x\nhello\nworld y\nz", 2, 13) == "hello world"
    # vertical text (lines >= 1.5x widest line) rotates upright: joined
    vertical = "数\n据\n引\n擎"
    assert rotate_crop_span(vertical, 0, len(vertical)) == "数据引擎"
    # near-square crop is NOT rotated
    sq = "ab\ncd"
    assert rotate_crop_span(sq, 0, len(sq)) == "ab cd"
    assert rotate_crop_span("", 0, 0) == ""
