"""Layout/table stage (T1-T3): kernel contracts + Spark-vs-golden parity."""

from __future__ import annotations

import pathlib

import pytest

from cpp_paddle_ocr_spark.core.layout import (
    LAYOUT_LABELS,
    TABLE_LABELS,
    TABLE_MAX_LEN,
    decode_table,
    detect_regions_page,
    extract_tables_page,
    find_table_regions,
    table_resize_pad,
)
from cpp_paddle_ocr_spark.fixtures import layout_page

GOLDEN = pathlib.Path(__file__).parent / "golden"


# ---------------------------------------------------------------------------
# pure-kernel contracts
# ---------------------------------------------------------------------------


def test_find_table_regions_outermost_and_unclosed():
    doc = "<p>x</p><table><tr><td><table><tr><td>i</td></tr></table></td></tr></table><p>y</p>"
    regions = find_table_regions(doc)
    assert len(regions) == 1  # nested table folded into the outer region
    lo, hi = regions[0]
    assert doc[lo:].startswith("<table") and doc[:hi].endswith("</table>")
    # unclosed → runs to end of document
    doc2 = "<p>a</p><table><tbody><tr><td>dangling"
    (lo2, hi2), = find_table_regions(doc2)
    assert hi2 == len(doc2)


def test_decode_table_reference_mechanics():
    # merged <td></td> label for attr-less cells (no separate close step),
    # "<td" label for attribute-bearing opens (close IS a step), score = avg
    # per-step score, cells only at cell-open labels
    doc = '<table><tbody><tr><td colspan="2">a b</td><td>cd</td><td></td></tr></tbody></table>'
    t = decode_table(doc, 0, len(doc))
    assert t.structure == "<tbody><tr><td</td><td></td><td></td></tr></tbody>"
    assert len(t.cells) == 3
    assert [c.text for c in t.cells] == ["a b", "cd", ""]
    assert 0.85 <= t.score < 1.0
    # every label the tokenizer can emit is in the post-merge label list
    for lbl in ("<thead>", "</thead>", "<tbody>", "</tbody>", "<tr>",
                "</tr>", "<td", "</td>", "<td></td>"):
        assert lbl in TABLE_LABELS, lbl
    assert "<td>" not in TABLE_LABELS  # merge_no_span_structure erased it


def test_decode_table_empty_is_score_minus_one():
    doc = "<table></table>"
    t = decode_table(doc, 0, len(doc))
    assert t.cells == [] and t.score == -1.0  # no boxes → -1 (:445-447)


def test_table_resize_pad():
    import numpy as np

    short = np.arange(10, dtype=np.int8)
    out = table_resize_pad(short)
    assert out.shape == (TABLE_MAX_LEN,)
    assert (out[:10] == short).all() and (out[10:] == 0).all()
    long = np.arange(1000, dtype=np.int64)
    out2 = table_resize_pad(long)
    assert out2.shape == (TABLE_MAX_LEN,)
    assert out2[0] == 0 and out2[-1] >= 995  # ratio-preserving sample


def test_detect_regions_labels_and_bounds():
    for i in range(24):
        row = layout_page(i)
        doc = row["html"].decode()
        for r in detect_regions_page(doc):
            assert r.label in LAYOUT_LABELS
            assert 0 <= r.start <= r.end <= len(doc)
            assert 0.4 < r.score <= 1.0
    assert detect_regions_page("") == []


def test_detect_regions_finds_planted_regions():
    # family b=0 plants header+nav+table+footer; detector must report each
    row = layout_page(0)
    labels = {r.label for r in detect_regions_page(row["html"].decode())}
    assert {"header", "nav", "table", "footer"} <= labels
    # family b=6 plants a figure and no nav/table
    row6 = layout_page(6)
    labels6 = {r.label for r in detect_regions_page(row6["html"].decode())}
    assert "figure" in labels6 and "nav" not in labels6


def test_region_nms_one_box_per_planted_region():
    # the scale-assignment gate + NMS must collapse multi-stride duplicates
    row = layout_page(0)
    regions = detect_regions_page(row["html"].decode())
    per = {}
    for r in regions:
        per.setdefault(r.label, []).append(r)
    for label, boxes in per.items():
        assert len(boxes) == 1, (label, boxes)


def test_kernels_deterministic():
    a = [
        (t.structure, t.score, tuple((c.start, c.end) for c in t.cells))
        for i in range(12)
        for t in extract_tables_page(layout_page(i)["html"].decode())
    ]
    b = [
        (t.structure, t.score, tuple((c.start, c.end) for c in t.cells))
        for i in range(12)
        for t in extract_tables_page(layout_page(i)["html"].decode())
    ]
    assert a == b


# ---------------------------------------------------------------------------
# Spark operators vs committed goldens
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def layout_docs(spark):
    from cpp_paddle_ocr_spark.sources.documents import generate_layout_docs

    return generate_layout_docs(spark, 96).cache()


def _read_tsv(name: str, n_cols: int) -> set[tuple]:
    out = set()
    for line in (GOLDEN / name).read_text(encoding="utf-8").splitlines():
        parts = line.split("\t")
        assert len(parts) == n_cols, line
        out.add(tuple(parts))
    return out


def test_spark_tables_match_golden(spark, layout_docs):
    from cpp_paddle_ocr_spark.operators.layout import extract_tables

    got = {
        (r.url, str(r.table_id), str(r.start), str(r.end), str(r.n_cells),
         r.structure, repr(r.score))
        for r in extract_tables(layout_docs).collect()
    }
    assert got == _read_tsv("LAYOUT_TABLES.tsv", 7)


def test_spark_cells_match_golden(spark, layout_docs):
    from cpp_paddle_ocr_spark.operators.layout import extract_table_cells

    got = {
        (r.url, str(r.table_id), str(r.cell_id), str(r.start), str(r.end), r.text)
        for r in extract_table_cells(layout_docs).collect()
    }
    assert got == _read_tsv("LAYOUT_CELLS.tsv", 6)


def test_spark_regions_match_golden(spark, layout_docs):
    from cpp_paddle_ocr_spark.operators.layout import detect_regions

    got = {
        (r.url, r.label, str(r.start), str(r.end), repr(r.score))
        for r in detect_regions(layout_docs).collect()
    }
    assert got == _read_tsv("LAYOUT_REGIONS.tsv", 5)


def test_nested_table_outer_decode_not_truncated():
    # round-3 review: a nested table's </table> must not act as the outer
    # decode's end token — trailing outer cells would be silently dropped
    doc = (
        "<table><tr><td><table><tr><td>inner</td></tr></table></td>"
        "<td>IMPORTANT</td></tr></table>"
    )
    t = decode_table(doc, 0, len(doc))
    texts = [c.text for c in t.cells]
    assert "IMPORTANT" in texts
    assert t.structure.endswith("</tr>")  # outer closing structure decoded


def test_cell_offsets_are_exact_tag_positions():
    # round-3 review: the normalize/denormalize roundtrip used to truncate
    # the last char of some cells; offsets must slice the doc exactly
    doc = "<table><tbody><tr><td>in</td><td>exact text</td></tr></tbody></table>"
    t = decode_table(doc, 0, len(doc))
    assert [c.text for c in t.cells] == ["in", "exact text"]
    for c in t.cells:
        inner = doc[c.start : c.end]
        assert inner in ("in", "exact text")


# ---------------------------------------------------------------------------
# Composed flagship surface (round-3 verdict next-steps #7)
# ---------------------------------------------------------------------------


def test_extract_with_layout_equals_separate_operators(spark):
    from cpp_paddle_ocr_spark.operators.extract import extract
    from cpp_paddle_ocr_spark.operators.layout import (
        detect_regions,
        extract_tables,
        extract_with_layout,
    )
    from cpp_paddle_ocr_spark.sources.documents import generate_layout_docs

    docs = generate_layout_docs(spark, 24).cache()
    fused = extract_with_layout(docs).collect()
    base = {r.url: r for r in extract(docs).collect()}
    sep_tables: dict[str, list] = {}
    for r in extract_tables(docs).collect():
        sep_tables.setdefault(r.url, []).append(
            (r.table_id, r.start, r.end, r.n_cells, r.structure, r.score)
        )
    sep_regions: dict[str, list] = {}
    for r in detect_regions(docs).collect():
        sep_regions.setdefault(r.url, []).append(
            (r.label, r.start, r.end, r.score)
        )
    assert len(fused) == 24
    for row in fused:
        b = base[row.url]
        # cascade columns byte-identical to the plain extract operator
        assert (row.success, row.error, row.n_blocks, row.extracted_text) == (
            b.success, b.error, b.n_blocks, b.extracted_text
        ), row.url
        assert [tuple(s) for s in row.spans] == [tuple(s) for s in b.spans]
        # layout arrays identical to the standalone fan-out operators
        got_t = [
            (t.table_id, t.start, t.end, t.n_cells, t.structure, t.score)
            for t in row.tables
        ]
        assert got_t == sep_tables.get(row.url, []), row.url
        got_r = [(g.label, g.start, g.end, g.score) for g in row.regions]
        assert got_r == sep_regions.get(row.url, []), row.url
    docs.unpersist()


def test_extract_with_layout_single_scan_no_shuffle(spark, tmp_path):
    # the composed operator must keep extract's plan shape: ONE source scan,
    # no Exchange (shuffle) anywhere
    from cpp_paddle_ocr_spark.operators.layout import extract_with_layout
    from cpp_paddle_ocr_spark.sources.documents import generate_layout_docs

    p = str(tmp_path / "ldocs")
    generate_layout_docs(spark, 8).write.parquet(p)
    docs = spark.read.parquet(p)
    plan = (
        extract_with_layout(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Scan parquet") == 1
    assert "Exchange" not in plan


def test_extract_with_layout_guard_rows_have_empty_layout(spark):
    from cpp_paddle_ocr_spark.operators.layout import extract_with_layout

    rows = [
        ("u-empty", None),
        ("u-bad", b"\xff\xfe\xff\xff garbage \xff"),
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    out = {r.url: r for r in extract_with_layout(df).collect()}
    assert not out["u-empty"].success and out["u-empty"].tables == []
    assert not out["u-bad"].success and out["u-bad"].regions == []


def test_region_run_touching_canvas_edges_round6():
    """Round-6 pin for the precomputed run-bound lookup: coverage runs that
    touch index 0 and the canvas end must yield the same extents the old
    char-by-char walk produced (run_end stops at canvas_len-1)."""
    from cpp_paddle_ocr_spark.core.layout import detect_regions_page

    # figure marker at the very start, footer running to the very end
    doc = "<img src=x>" + ("body text " * 30) + "<footer>tail</footer>"
    boxes = detect_regions_page(doc)
    labels = {b.label for b in boxes}
    assert "figure" in labels and "footer" in labels
    for b in boxes:
        assert 0 <= b.start <= b.end <= len(doc)
    foot = [b for b in boxes if b.label == "footer"]
    assert foot and max(b.end for b in foot) >= len(doc) - 2
