"""Ordering + overlap utilities (SURVEY.md §2.6).

O1 — reading-order sort: the reference ships ``sort_boxes``
(``src/utility.cpp:315-327``) sorting by (y, x) with a ±10px same-row
tolerance, but the live worker never calls it (boxes stay in findContours
order). The north rule requires document-order output, so we promote the sort
to live: in 1-D the tolerance is unnecessary — sort key is ``(start,
block_id)``, which is total and deterministic.

O2 — overlap: ``iou_1d`` lives in ``core.detect`` (used by NMS); re-exported
here for the operator inventory.
"""

from __future__ import annotations

from .detect import Span, iou_1d  # noqa: F401  (O2 re-export)


def sort_spans(spans: list[Span]) -> list[Span]:
    """Document-order sort (O1): by (start, block_id), total order."""
    return sorted(spans, key=lambda s: (s.start, s.block_id))
