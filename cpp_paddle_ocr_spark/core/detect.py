"""Stage 1 — det: candidate-span detection over parsed blocks.

Faithful 1-D transplant of the reference's DB detection post-process chain
(SURVEY.md §2.2):

* per-token content score = the "probability map" (D4, ``src/ocr_det.cpp:116-133``),
  a vectorized sigmoid over normalized token features (D2 ``Normalize``,
  ``src/preprocess_op.cpp:40-55``) — one float64 matmul per page;
* bitmap = ``score >= DET_DB_THRESH`` (D5, ``src/ocr_det.cpp:140-154``);
* candidate spans = maximal runs of above-threshold tokens inside one block —
  the connected-component / ``findContours`` analog (D7,
  ``src/postprocess_op.cpp:255-331``), emitted in document order;
* drop spans shorter than 3 chars pre-unclip (D8 ``ssid < 3``,
  ``src/postprocess_op.cpp:287-289``);
* span score = mean token score over the span ("fast" bbox-mask mode D9,
  ``src/postprocess_op.cpp:216-253``, selected at ``src/ocr_worker.cpp:32``);
* drop spans with ``score < DET_BOX_THRESH`` (D11, ``src/postprocess_op.cpp:298-299``);
* unclip: widen by ``UNCLIP_TOKENS`` tokens each side, expanding into
  background tokens only — clamped at neighboring qualifying runs and block
  bounds (D12, ``src/postprocess_op.cpp:20-72`` with ratio 1.8);
* clamp + drop spans shorter than 5 chars post-unclip (D14,
  ``src/postprocess_op.cpp:333-362``);
* NMS: greedy best-first suppression at IoU > 0.5 (O3,
  ``src/postprocess_op.cpp:559-588`` — lib-only in the reference, promoted to
  live per the north rule). Spans are constructed disjoint, so the sorted
  no-overlap fast path exits in O(n log n) on real pages;
* per-page span cap ``MAX_CANDIDATES`` (O5, ``src/postprocess_op.cpp:260``).

All numeric work is vectorized at PAGE level (one feature matrix and one
matmul per page), mirroring the reference's one-model-pass-per-image shape.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..config import (
    DET_BOX_THRESH,
    DET_DB_THRESH,
    DET_SCORE_MODE,
    MAX_CANDIDATES,
    MIN_SPAN_CHARS,
    MIN_SPAN_CHARS_PRE,
    NMS_IOU_THRESH,
    UNCLIP_TOKENS,
)
from ..weights import DET_B, DET_MEAN, DET_SCALE, DET_W, STOPWORDS
from .html_parse import Block

# Stopword membership, vectorized: every stopword is ≤ _STOP_MAXLEN chars of
# pure a-z, so a token can be packed into an int64 (5 bits per char) and
# matched with one sorted np.isin — no per-token Python in the det kernel.
_STOP_MAXLEN = max(len(w) for w in STOPWORDS)
assert all(len(w) <= 12 and w.isascii() and w.islower() and w.isalpha() for w in STOPWORDS)


def _pack_word(w: str) -> int:
    v = 0
    for ch in w:
        v = (v << 5) | (ord(ch) - 96)  # a=1 .. z=26
    return v


_STOPWORDS_PACKED = np.sort(
    np.fromiter((_pack_word(w) for w in STOPWORDS), np.int64, len(STOPWORDS))
)

# Whitespace lookup table (fixed set → deterministic tokenization everywhere):
# ASCII \t..\r, space, NBSP, U+1680, U+2000-200B, U+2028/29/2F, U+205F, U+3000.
_WS_TABLE = np.zeros(0x3001, dtype=bool)
_WS_TABLE[[9, 10, 11, 12, 13, 32, 160, 0x1680, 0x2028, 0x2029, 0x202F, 0x205F, 0x3000]] = True
_WS_TABLE[0x2000 : 0x200C] = True


@dataclass
class Span:
    """A detected candidate span (the quad-box analog, SURVEY.md §1.3)."""

    block_id: int
    start: int  # char offset into the decoded document
    end: int
    text: str  # raw slice of the block text (entities still encoded)
    score: float  # det score (mean token prob)


def codepoints(text: str) -> np.ndarray:
    """Text → uint32 codepoint array (the raster of the 1-D 'image')."""
    if not text:
        return np.empty(0, dtype=np.uint32)
    return np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32)


def ws_mask(cp: np.ndarray) -> np.ndarray:
    # Codepoints above the table (CJK ideographs, Hangul, emoji, SMP) are
    # never whitespace → gather through a known-False index (0x21, '!'),
    # mirroring core/decode.py::_drop_mask. (An earlier clamp to 0x3000 —
    # ideographic space, True — silently classified ALL such text as
    # whitespace, destroying non-Latin content end-to-end.)
    return _WS_TABLE[np.where(cp > 0x3000, 0x21, cp)]


def _token_runs(mask_nonws: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Maximal runs of True → (starts, ends), vectorized."""
    if mask_nonws.size == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    padded = np.concatenate(([False], mask_nonws, [False]))
    d = np.diff(padded.astype(np.int8))
    return np.where(d == 1)[0], np.where(d == -1)[0]


def _sigmoid(x: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-x))


def score_tokens(feats: np.ndarray) -> np.ndarray:
    """The det model forward (D4): normalized features → token prob map."""
    norm = (feats - DET_MEAN) * DET_SCALE
    return _sigmoid(norm @ DET_W + DET_B)


def iou_1d(s1: int, e1: int, s2: int, e2: int) -> float:
    """1-D IoU of two char spans (O2, ``src/utility.cpp:378-424``)."""
    inter = max(0, min(e1, e2) - max(s1, s2))
    union = (e1 - s1) + (e2 - s2) - inter
    return inter / union if union > 0 else 0.0


def nms(spans: list[Span], thresh: float = NMS_IOU_THRESH) -> list[Span]:
    """Greedy best-first NMS (O3, ``src/postprocess_op.cpp:559-588``).

    Fast path: if no pair overlaps at all (the common case — spans are built
    disjoint), return unchanged after one sorted sweep. Otherwise run the
    exact greedy suppression with a vectorized inner loop.
    """
    n = len(spans)
    if n <= 1:
        return spans
    starts = np.fromiter((s.start for s in spans), np.int64, n)
    ends = np.fromiter((s.end for s in spans), np.int64, n)
    by_start = np.argsort(starts, kind="stable")
    if np.all(starts[by_start][1:] >= ends[by_start][:-1]):
        return spans  # disjoint — nothing to suppress
    scores = np.fromiter((s.score for s in spans), np.float64, n)
    # sort by score desc, stable (ties keep emission order)
    order = np.lexsort((np.arange(n), -scores))
    alive = np.ones(n, dtype=bool)
    lengths = ends - starts
    for i in order:
        if not alive[i]:
            continue
        inter = np.clip(
            np.minimum(ends, ends[i]) - np.maximum(starts, starts[i]), 0, None
        )
        union = lengths + lengths[i] - inter
        iou = np.where(union > 0, inter / np.maximum(union, 1), 0.0)
        kill = alive & (iou > thresh)
        kill[i] = False
        # only suppress strictly-lower-priority spans
        lower = np.zeros(n, dtype=bool)
        lower[order[np.where(order == i)[0][0] + 1 :]] = True
        alive &= ~(kill & lower)
    return [s for s, a in zip(spans, alive) if a]


def _page_arrays(
    doc: str, blocks: list[Block]
) -> tuple[str, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Concatenate all block texts into page-level char arrays.

    Returns (page_str, doc_off, link, hint, block_id) per char; blocks are
    separated by a single '\\n' marker char (block_id -1) so token runs can
    never cross a block boundary.
    """
    # int32 everywhere: offsets index the truncated doc (< MAX_DOC_CHARS) and
    # block ids are < MAX_CANDIDATES — the extraction kernel is memory-
    # bandwidth-bound at high core counts, so element width matters
    texts: list[str] = []
    offs: list[np.ndarray] = []
    links: list[np.ndarray] = []
    hints: list[np.ndarray] = []
    bids: list[np.ndarray] = []
    sep_off = np.array([-1], dtype=np.int32)
    sep_f = np.array([False])
    sep_b = np.array([-1], dtype=np.int32)
    for bi, block in enumerate(blocks):
        if bi > 0:
            texts.append("\n")
            offs.append(sep_off)
            links.append(sep_f)
            hints.append(sep_f)
            bids.append(sep_b)
        n_chars = 0
        for (s, e), lk in zip(block.segments, block.seg_link):
            texts.append(doc[s:e])
            offs.append(np.arange(s, e, dtype=np.int32))
            links.append(np.full(e - s, bool(lk)))
            n_chars += e - s
        hints.append(np.full(n_chars, bool(block.hint)))
        bids.append(np.full(n_chars, block.block_id, dtype=np.int32))
    if not texts:
        z = np.empty(0, np.int32)
        return "", z, np.empty(0, bool), np.empty(0, bool), z
    return (
        "".join(texts),
        np.concatenate(offs),
        np.concatenate(links),
        np.concatenate(hints),
        np.concatenate(bids),
    )


def detect_page(
    doc: str, blocks: list[Block], score_mode: str = DET_SCORE_MODE
) -> list[Span]:
    """Run the full det chain on one parsed page → candidate spans.

    ``score_mode``: "fast" = mean token prob (D9, the live config); "slow" =
    char-length-weighted mean (D10 ``PolygonScoreAcc`` analog — the exact
    integral over the span instead of the bbox-mask approximation).
    """
    page, doc_off, link, hint, bid = _page_arrays(doc, blocks)
    cp = codepoints(page)
    if cp.size == 0:
        return []
    ws = ws_mask(cp)
    tstarts, tends = _token_runs(~ws)
    n = tstarts.size
    if n == 0:
        return []

    # --- per-token features, one vectorized pass per page (D2/D3/D4) -------
    lower = (cp >= 97) & (cp <= 122)
    upper = (cp >= 65) & (cp <= 90)
    alpha = lower | upper | ((cp >= 128) & ~ws)
    digit = (cp >= 48) & (cp <= 57)
    punct = (cp < 128) & ~alpha & ~digit & ~ws

    def seg_sum(ind: np.ndarray) -> np.ndarray:
        # astype before cumsum: the bool→int64 cumsum path is pathologically
        # slow on large arrays (see core/decode.py)
        c = np.concatenate(([0], np.cumsum(ind.astype(np.int64))))
        return (c[tends] - c[tstarts]).astype(np.float64)

    tok_len = (tends - tstarts).astype(np.float64)
    feats = np.empty((n, 8), dtype=np.float64)
    feats[:, 0] = np.minimum(tok_len, 20.0) / 20.0
    feats[:, 1] = seg_sum(alpha) / tok_len
    feats[:, 2] = seg_sum(digit) / tok_len
    feats[:, 3] = seg_sum(punct) / tok_len
    # stopword flag, fully vectorized (semantically identical to
    # `page[s:e].lower() in STOPWORDS`): only tokens of ≤ _STOP_MAXLEN pure
    # case-folded a-z chars can match, and those pack into one int64 each
    folded = np.where(upper, cp + 32, cp)
    lower_alpha = (folded >= 97) & (folded <= 122)
    eligible = (tok_len <= _STOP_MAXLEN) & (seg_sum(lower_alpha) == tok_len)
    packed = np.zeros(n, dtype=np.int64)
    tok_len_i = tends - tstarts
    last = cp.size - 1
    for k in range(_STOP_MAXLEN):
        has_k = tok_len_i > k
        ck = folded[np.minimum(tstarts + k, last)].astype(np.int64) - 96
        packed = np.where(has_k, (packed << 5) | np.clip(ck, 0, 31), packed)
    feats[:, 4] = np.where(
        eligible & np.isin(packed, _STOPWORDS_PACKED), 1.0, 0.0
    )
    feats[:, 5] = seg_sum(upper) / tok_len
    feats[:, 6] = seg_sum(link) > 0
    feats[:, 7] = seg_sum(hint) > 0
    probs = score_tokens(feats)

    # --- bitmap → runs (D5/D7); a block change also breaks a run -----------
    bitmap = probs >= DET_DB_THRESH
    tok_block = bid[tstarts]
    new_run = bitmap & np.concatenate(
        ([True], (~bitmap[:-1]) | (tok_block[1:] != tok_block[:-1]))
    )
    end_run = bitmap & np.concatenate(
        ((~bitmap[1:]) | (tok_block[1:] != tok_block[:-1]), [True])
    )
    rstarts = np.where(new_run)[0]
    rends = np.where(end_run)[0] + 1

    # cumulative prob sums for O(1) run means (D9 fast / D10 slow modes)
    if score_mode == "slow":
        cprob = np.concatenate(([0.0], np.cumsum(probs * tok_len)))
        cw = np.concatenate(([0.0], np.cumsum(tok_len)))
    else:
        cprob = np.concatenate(([0.0], np.cumsum(probs)))
        cw = None

    # --- first pass: qualifying runs (D8 pre-size + D11 score filters) -----
    runs: list[tuple[int, int, float]] = []
    for rs, re_ in zip(rstarts.tolist(), rends.tolist()):
        cs, ce = int(tstarts[rs]), int(tends[re_ - 1])
        if ce - cs < MIN_SPAN_CHARS_PRE:  # D8 ssid<3
            continue
        if cw is not None:  # D10: char-weighted exact integral
            score = (cprob[re_] - cprob[rs]) / (cw[re_] - cw[rs])
        else:  # D9: plain token mean (live config)
            score = (cprob[re_] - cprob[rs]) / (re_ - rs)
        if score < DET_BOX_THRESH:  # D11
            continue
        runs.append((rs, re_, float(score)))
        if len(runs) >= MAX_CANDIDATES:
            break

    # block token bounds for unclip clamping
    blk_first = np.concatenate(([True], tok_block[1:] != tok_block[:-1]))
    blk_last = np.concatenate((tok_block[1:] != tok_block[:-1], [True]))
    idx = np.arange(n)
    blk_start_of = np.maximum.accumulate(
        np.where(blk_first, idx, 0)
    )  # first token index of each token's block
    blk_end_of = np.flip(
        np.minimum.accumulate(np.flip(np.where(blk_last, idx, n - 1)))
    )  # last token index of each token's block

    # --- second pass: D12 unclip into background only, D14 min-size --------
    spans: list[Span] = []
    prev_ue = -1
    prev_block = -1
    for k, (rs, re_, score) in enumerate(runs):
        b = int(tok_block[rs])
        lo = int(blk_start_of[rs])
        hi = int(blk_end_of[rs]) + 1
        left_clamp = prev_ue if prev_block == b else lo
        us = max(rs - UNCLIP_TOKENS, left_clamp, lo)
        if k + 1 < len(runs) and int(tok_block[runs[k + 1][0]]) == b:
            right_clamp = runs[k + 1][0]
        else:
            right_clamp = hi
        ue = min(re_ + UNCLIP_TOKENS, right_clamp, hi)
        prev_ue, prev_block = ue, b
        cs, ce = int(tstarts[us]), int(tends[ue - 1])
        if ce - cs < MIN_SPAN_CHARS:  # D14 post-unclip minimum
            continue
        spans.append(
            Span(
                block_id=b,
                start=int(doc_off[cs]),
                end=int(doc_off[ce - 1]) + 1,
                text=page[cs:ce],
                score=score,
            )
        )
    return nms(spans)
