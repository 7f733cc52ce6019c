"""Stage 2 — cls: content-vs-boilerplate span classification.

Transplant of the 0°/180° orientation classifier (SURVEY.md §2.4):

* K1 ``ClsResizeImg``: each span's text is mapped to a fixed-width
  char-class code vector of width ``CLS_FEAT_W`` (= the {3,48,192} input
  shape, ``src/ocr_cls.cpp:35``), truncating longer spans;
* K2 zero-pad right (``src/ocr_cls.cpp:52-56``);
* K3 batched forward in batches of ``CLS_BATCH`` = 8 (``src/ocr_cls.cpp:36-87``,
  batch size tuned at ``src/ocr_worker.cpp:47``) — float64 matmul + softmax;
* K4 argmax + max-score (``src/ocr_cls.cpp:88-99``);
* K5 QUIRK: the live path acts on ``label == 1`` alone and never consults
  ``cls_thresh=0.98`` (``src/ocr_worker.cpp:276-281`` vs ``:45``); we
  replicate that — label 1 ⇒ span dropped regardless of score (dropping is
  our analog of rotate-180: the "upside-down" class is boilerplate).
"""

from __future__ import annotations

import numpy as np

from ..config import CLS_BATCH, CLS_FEAT_W, CLS_SOFTMAX_MODE
from ..weights import CLS_B, CLS_CLASS_LOGITS, CLS_W
from .activations import softmax_rows
from .detect import _WS_TABLE, codepoints

_SEP_CP = np.array([ord(c) for c in "|·•›»/"], dtype=np.uint32)
# Full-codepoint-domain lookup (CLAUDE.md #4c: size the table to the index
# domain instead of clamping — and unlike np.isin, a plain gather). The
# whole K1 class-code mapping is baked into ONE int8 table so encoding is
# a single gather instead of five masked assignments over the batch
# (byte-identical: the table entries reproduce the old assignment order —
# lower/upper/digit, ws overriding none of them, separator overriding all).
_CODE_TABLE = np.full(0x110000, 5, dtype=np.int8)
_CODE_TABLE[97:123] = 1
_CODE_TABLE[65:91] = 2
_CODE_TABLE[48:58] = 3
_CODE_TABLE[_WS_TABLE] = 4
_CODE_TABLE[_SEP_CP] = 6


def encode_char_classes(texts: list[str]) -> np.ndarray:
    """Span texts → (n, CLS_FEAT_W) int8 char-class codes, zero-padded.

    Codes: 0 pad, 1 lower, 2 upper, 3 digit, 4 space, 5 punct/other,
    6 pipe/bullet separator (``| · • › » /``) — the separator class is the
    telltale of link-bar boilerplate. Classes use ASCII ranges (vectorized);
    non-ASCII letters fall into class 5, a documented simplification of K1's
    channel mapping — deterministic on both the golden and Spark paths.
    """
    n = len(texts)
    out = np.zeros((n, CLS_FEAT_W), dtype=np.int8)
    if n == 0:
        return out
    clipped = [t[:CLS_FEAT_W] for t in texts]
    lens = np.array([len(t) for t in clipped], dtype=np.int64)
    cp = codepoints("".join(clipped))
    if cp.size == 0:
        return out
    codes = _CODE_TABLE[cp]
    rows = np.repeat(np.arange(n), lens)
    starts = np.concatenate(([0], np.cumsum(lens[:-1])))
    cols = np.arange(cp.size) - np.repeat(starts, lens)
    out[rows, cols] = codes
    return out


def _softmax(x: np.ndarray, mode: str = CLS_SOFTMAX_MODE) -> np.ndarray:
    """Softmax; exact ``np.exp`` by default (documented deviation X7), with
    the reference's ``fast_exp`` bit-trick (``src/utility.cpp:350-357``)
    available as the ``mode="fast_exp"`` parity knob (``core/activations``)."""
    return softmax_rows(x, mode)


def classify_spans(
    texts: list[str], softmax_mode: str = CLS_SOFTMAX_MODE
) -> tuple[np.ndarray, np.ndarray]:
    """Batched cls forward → (labels int64, scores float64).

    label 0 = content, 1 = boilerplate (the 180° class).
    """
    n = len(texts)
    labels = np.zeros(n, dtype=np.int64)
    scores = np.ones(n, dtype=np.float64)
    if n == 0:
        return labels, scores
    codes = encode_char_classes(texts)
    # K3 batches of CLS_BATCH (src/ocr_cls.cpp:36-87), full batches stacked
    # into ONE 3-D matmul: np.matmul over a (nb, 8, 192) stack runs the
    # identical per-slice (8,192)@(192,2) gemm, and the class-logit
    # reduction's inner loop is the same per row — verified bitwise equal
    # to the per-batch loop (test_classify batched-equality pin). The
    # per-8-rows Python/numpy dispatch overhead was ~14% of kernel time.
    nfull = (n // CLS_BATCH) * CLS_BATCH
    if nfull:
        stack = codes[:nfull].reshape(-1, CLS_BATCH, CLS_FEAT_W)
        x = stack.astype(np.float64) / 6.0  # normalize codes to [0,1]
        logits = np.matmul(x, CLS_W) + CLS_B
        # structured per-class contribution via lookup (see weights.py)
        logits = logits + CLS_CLASS_LOGITS[stack].sum(axis=2)
        probs = _softmax(logits.reshape(nfull, -1), softmax_mode)
        labels[:nfull] = probs.argmax(axis=1)
        scores[:nfull] = probs.max(axis=1)
    for beg in range(nfull, n, CLS_BATCH):  # trailing partial batch
        batch = codes[beg : beg + CLS_BATCH]
        x = batch.astype(np.float64) / 6.0
        logits = x @ CLS_W + CLS_B
        logits = logits + CLS_CLASS_LOGITS[batch].sum(axis=1)
        probs = _softmax(logits, softmax_mode)
        labels[beg : beg + CLS_BATCH] = probs.argmax(axis=1)
        scores[beg : beg + CLS_BATCH] = probs.max(axis=1)
    return labels, scores
