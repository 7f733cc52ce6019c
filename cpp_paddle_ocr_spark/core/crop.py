"""C2 — ``GetRotateCropImage`` transplant (``src/utility.cpp:137-190``).

Library-only in the reference: the live worker uses the axis-aligned
bounding crop (C1, ``src/ocr_worker.cpp:243-259``), never the perspective
warp. This module is the same LIB surface transplanted to 1-D, matching
that disposition — provided, tested, and not called by the live pipeline.

The 2-D operator does three things; each has a direct 1-D analog:

1. bounding-rect crop clamped to the image (``:144-152``) →
   ``crop_span``: slice ``[start, end)`` clamped to ``[0, len)`` (the
   zero-pad tolerance of C3, ``src/utility.cpp:291-313``);
2. perspective-warp the quad to an upright rect (``:159-180``) →
   re-flow the cropped text into a single "upright" line: hard line
   breaks inside the crop are layout artifacts (the skewed quad), so they
   collapse to single spaces;
3. the h ≥ 1.5·w auto-rotate (``:183-189``: transpose + flip) →
   VERTICAL text detection: when the crop is "taller than wide" — its
   line count ≥ 1.5× its widest line (one-or-two chars per line, the
   vertical CJK / styled-marquee case) — the lines are read top-to-bottom
   as a single run, i.e. the block is rotated upright by joining lines
   with no separator instead of a space.
"""

from __future__ import annotations

#: The reference's rotate threshold (``:183``).
ROTATE_RATIO = 1.5


def crop_span(doc: str, start: int, end: int) -> str:
    """C3-tolerant slice: out-of-bounds offsets clamp instead of raising."""
    return doc[max(0, start) : max(0, min(end, len(doc)))]


def rotate_crop_span(doc: str, start: int, end: int) -> str:
    """1-D ``GetRotateCropImage``: crop + upright re-flow + auto-rotate."""
    crop = crop_span(doc, start, end)
    lines = [ln.strip() for ln in crop.splitlines()]
    lines = [ln for ln in lines if ln]
    if not lines:
        return crop.strip()
    height = len(lines)  # dst_img.rows analog
    width = max(len(ln) for ln in lines)  # dst_img.cols analog
    if float(height) >= float(width) * ROTATE_RATIO:
        # vertical text: transpose+flip == read the column top-to-bottom
        return "".join(lines)
    return " ".join(lines)
