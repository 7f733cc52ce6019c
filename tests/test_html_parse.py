"""Unit tests: candidate-block proposal (SURVEY.md §2 D7/O5 analogs)."""

from __future__ import annotations

from cpp_paddle_ocr_spark.core.html_parse import Block, parse_blocks


def texts(doc: str) -> list[str]:
    return [b.text(doc) for b in parse_blocks(doc)]


def test_simple_paragraphs_become_blocks():
    doc = "<html><body><p>alpha one</p><p>beta two</p></body></html>"
    assert texts(doc) == ["alpha one", "beta two"]


def test_inline_tags_do_not_split_blocks():
    doc = "<p>hello <b>bold</b> world</p>"
    assert texts(doc) == ["hello bold world"]


def test_script_style_head_skipped():
    doc = (
        "<head><title>t</title><style>p{}</style></head>"
        "<body><script>var x='<p>fake</p>';</script><p>real</p></body>"
    )
    out = texts(doc)
    assert "real" in out
    assert not any("fake" in t or "var x" in t or "p{}" in t for t in out)


def test_comments_and_cdata_ignored():
    doc = "<p>a</p><!-- <p>ghost</p> --><p>b</p>"
    assert texts(doc) == ["a", "b"]


def test_br_splits_blocks():
    doc = "<p>line one<br>line two</p>"
    assert texts(doc) == ["line one", "line two"]


def test_offsets_point_into_source():
    doc = "<div>abc</div><div>defgh</div>"
    blocks = parse_blocks(doc)
    for b in blocks:
        assert doc[b.start : b.end] == b.text(doc)


def test_link_segments_flagged():
    doc = '<p>pre <a href="/x">link text</a> post</p>'
    (b,) = parse_blocks(doc)
    flags = {doc[s:e]: lk for (s, e), lk in zip(b.segments, b.seg_link)}
    assert flags["link text"] is True
    assert flags["pre "] is False


def test_hint_tag_ancestor():
    doc = "<nav><ul><li>HOME</li><li>NEWS</li></ul></nav><p>content</p>"
    blocks = parse_blocks(doc)
    by_text = {b.text(doc): b.hint for b in blocks}
    assert by_text["HOME"] is True
    assert by_text["content"] is False


def test_hint_class_attr():
    doc = '<div class="sidebar"><p>promo stuff</p></div><p>art</p>'
    blocks = parse_blocks(doc)
    by_text = {b.text(doc): b.hint for b in blocks}
    assert by_text["promo stuff"] is True
    assert by_text["art"] is False


def test_candidate_cap():
    # O5: at most MAX_CANDIDATES blocks per page (src/postprocess_op.cpp:260)
    doc = "".join(f"<p>block {i}</p>" for i in range(1500))
    assert len(parse_blocks(doc)) == 1000


def test_malformed_html_never_raises():
    for doc in [
        "<p>unclosed",
        "</div></div>text",
        "<p <b attr='broken>txt</p>",
        "<<<>>><p>x</p>",
        "<a><a><a>deep</a>",
        "<!-- unterminated comment <p>y</p>",
    ]:
        parse_blocks(doc)  # must not raise


def test_block_ids_sequential_document_order():
    doc = "<p>a</p><div>b</div><h1>c</h1>"
    blocks = parse_blocks(doc)
    assert [b.block_id for b in blocks] == [0, 1, 2]
    assert [b.start for b in blocks] == sorted(b.start for b in blocks)


def test_tokenizer_edge_tags_round6():
    """Round-6 pin for the fused tag tokenizer: whitespace-after-slash
    closes, nameless/doctype/PI tags, self-closed <a/>, and an UPPERCASE
    CLASS hint (the '=' precheck must stay case-insensitive-safe)."""
    # '</ div>' IS a valid close (the old _TAG_NAME_RE allowed '\\s*');
    # '< p>' opens p; '<3>' and '<?xml?>' are nameless -> ignored as tags
    blocks = parse_blocks("< p>one</ p><3>two<?xml v='1'?></p>")
    assert [b.text("< p>one</ p><3>two<?xml v='1'?></p>") for b in blocks] == [
        "one",
        "two",
    ]
    # <!DOCTYPE ...> ignored; text flows into the body block
    blocks = parse_blocks("<!DOCTYPE html><p>x</p>")
    assert len(blocks) == 1 and blocks[0].segments == [(15 + 3, 15 + 4)]
    # self-closed <a/> does not open a link region
    doc = "<p><a/>plain</p>"
    (b,) = parse_blocks(doc)
    assert b.seg_link == [False]
    # unclosed <a> does
    doc2 = "<p><a>linked</p>"
    (b2,) = parse_blocks(doc2)
    assert b2.seg_link == [True]
    # uppercase attribute name still hints
    doc3 = "<div CLASS='footer'>f</div><p>c</p>"
    b3 = parse_blocks(doc3)
    assert [blk.hint for blk in b3] == [True, False]
