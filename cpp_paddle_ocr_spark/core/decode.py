"""Stage 3 — rec: span text recognition with greedy CTC decode semantics.

Transplant of the CRNN recognizer (SURVEY.md §2.5). The "glyph sequence" of a
span is its raw HTML slice; recognition = entity decoding + whitespace
normalization, expressed through the reference's exact CTC machinery so the
collapse rules are the live semantics (``src/ocr_rec.cpp:96-128``):

* R1 width-ratio argsort: spans sorted by sequence length ascending before
  batching (``src/ocr_rec.cpp:35-40``, ``src/utility.cpp:192-203``) — the
  pad-minimizing skew trick, preserved verbatim;
* R4 batches of ``REC_BATCH`` = 16 (``src/ocr_rec.cpp:42-94``,
  ``src/ocr_worker.cpp:60``);
* R2 dynamic width: pad each batch only to its own longest sequence
  (``max_wh_ratio``, ``src/ocr_rec.cpp:49-55``);
* R6 vocab: blank ``"#"`` prepended, ``" "`` appended
  (``include/paddle_ocr/ocr_rec.h:82-84``) — here the vocab is built
  per batch from the observed codepoints (sorted → deterministic);
* R5 greedy decode: keep timestep iff ``sym != blank`` and
  ``sym != previous timestep's sym`` (repeat collapse); confidence = mean of
  kept max-probs; zero kept timesteps ⇒ NaN ⇒ span skipped, slot keeps the
  preallocated empty text (``src/ocr_rec.cpp:115-125``,
  ``src/ocr_worker.cpp:286-287``);
* R7 scatter: results written back at the original indices
  (``src/ocr_rec.cpp:126-127``) — restores document order.

Timestep encoding (the "model forward" stand-in): for each char of the
entity-decoded span text — whitespace → the space symbol (consecutive
whitespace collapses via the repeat rule); control/zero-width chars → blank
(dropped); any other char → its symbol followed by one blank (so genuine
repeated letters survive collapse, exactly like a real CTC emission).
Output is therefore **batch-composition independent**: grouping spans into
different batches cannot change texts or scores (byte-identity across
partitionings, SURVEY.md §7 hard part 1).
"""

from __future__ import annotations

import html as _html

import numpy as np

from ..config import REC_BATCH
from ..weights import rec_timestep_probs
from .detect import codepoints, ws_mask

# codepoints that emit a blank (dropped): C0/C1 controls, soft hyphen,
# zero-width & directional marks, BOM. \t \n \v \f \r (9-13) stay whitespace;
# zero-width chars (incl. U+200B) are drops, taking precedence over ws.
# Lookup table covering the FULL codepoint range (1.1 MB of bools): a plain
# gather with no clamping `where` — the windowed 0xFF00 table needed a
# per-char `np.where(cp < 0xFF00, cp, 0x20)` that allocated two extra
# multi-MB temporaries per batch and measured ~2x slower.
_DROP_TABLE = np.zeros(0x110000, dtype=bool)
_DROP_TABLE[:32] = True
_DROP_TABLE[9:14] = False
_DROP_TABLE[0x7F] = True
_DROP_TABLE[0xAD] = True
_DROP_TABLE[0x200B:0x2010] = True
_DROP_TABLE[0xFEFF] = True


def _drop_mask(cp: np.ndarray) -> np.ndarray:
    return _DROP_TABLE[cp]


def encode_timesteps(text: str) -> np.ndarray:
    """Entity-decoded span text → uint32 codepoint timestep sequence.

    0 marks a blank timestep. Whitespace → 32 (single space symbol, no
    trailing blank); droppable chars → blank; other chars → char + blank.
    """
    decoded = _html.unescape(text)
    cp = codepoints(decoded)
    if cp.size == 0:
        return np.zeros(0, dtype=np.uint32)
    drop = _drop_mask(cp)
    ws = ws_mask(cp) & ~drop  # drops win over ws (e.g. U+200B)
    sym = cp.copy()
    sym[ws] = 32
    sym[drop] = 0
    # interleave a blank after every non-whitespace, non-dropped symbol
    emit_blank = ~ws & ~drop
    total = cp.size + int(emit_blank.sum())
    out = np.zeros(total, dtype=np.uint32)
    pos = np.arange(cp.size, dtype=np.int64) + np.cumsum(
        np.concatenate(([0], emit_blank[:-1].astype(np.int64)))
    )
    out[pos] = sym
    return out


def ctc_greedy_batch(seqs: list[np.ndarray]) -> list[tuple[str, float]]:
    """Decode one already-formed batch (R2/R5): dynamic-width pad + collapse."""
    b = len(seqs)
    if b == 0:
        return []
    width = max((s.size for s in seqs), default=0)
    if width == 0:
        return [("", 0.0)] * b
    mat = np.zeros((b, width), dtype=np.uint32)  # pad with blank (R2)
    for i, s in enumerate(seqs):
        mat[i, : s.size] = s
    keep = mat != 0
    keep[:, 1:] &= mat[:, 1:] != mat[:, :-1]  # repeat collapse (R5)
    # One 2-D boolean select per batch instead of per-row fancy indexing:
    # mat[keep] concatenates the kept elements in row-major order, so
    # per-row results are contiguous slices. The whole batch is
    # utf-32-decoded once (C-speed) and sliced by cumulative keep counts.
    # Probs are computed on the SELECTED elements only (elementwise
    # deterministic hash — same values as selecting from a full-matrix
    # computation, minus the wasted work on pads/collapsed timesteps).
    # Bit-identity of the confidence: probs[i, k].mean() is
    # umr_sum(contiguous float64)/n, and np.add.reduce over the identical
    # contiguous slice runs the same pairwise tree — same bytes out.
    counts = np.count_nonzero(keep, axis=1)
    msel = mat[keep]
    sel_text = msel.tobytes().decode("utf-32-le")
    psel = rec_timestep_probs(msel)
    bounds = np.concatenate(([0], np.cumsum(counts)))
    out: list[tuple[str, float]] = []
    for i in range(b):
        a, c = int(bounds[i]), int(bounds[i + 1])
        if a == c:
            out.append(("", 0.0))  # NaN-skip ⇒ preallocated default (R5)
            continue
        out.append(
            (sel_text[a:c], float(np.add.reduce(psel[a:c]) / (c - a)))
        )
    return out


def encode_timesteps_many(texts: list[str]) -> list[np.ndarray]:
    """Batch form of ``encode_timesteps``: one global codepoint/mask pass
    over the concatenation of all span texts, then per-span slicing.

    Identical output to mapping ``encode_timesteps`` (tested); ~3× faster on
    block-heavy pages where thousands of small spans would each pay the
    utf-32 encode + mask setup.
    """
    decoded = [_html.unescape(t) if "&" in t else t for t in texts]
    lens = np.fromiter((len(t) for t in decoded), np.int64, len(decoded))
    cp = codepoints("".join(decoded))
    if cp.size == 0:
        return [np.zeros(0, dtype=np.uint32) for _ in texts]
    drop = _drop_mask(cp)
    ws = ws_mask(cp) & ~drop
    sym = cp.copy()
    sym[ws] = 32
    sym[drop] = 0
    emit_blank = ~ws & ~drop
    # E[i] = number of blanks emitted before global index i (exclusive).
    # add.accumulate with an EXPLICIT int32 dtype: np.cumsum on bool/int32
    # input takes a buffered-cast loop measuring 3-30x slower on multi-MB
    # arrays; int32 suffices (batch text is bounded by the 64 MB extract
    # byte budget) and halves the rec stage's dominant per-char traffic.
    # The int8 VIEW of the bool mask (free — same bytes) shaves another
    # ~1.5x off the accumulate: the bool→int32 ufunc loop is slower than
    # the int8→int32 one (measured 8.8 → 5.8 ms on 2M chars).
    e_incl = np.add.accumulate(emit_blank.view(np.int8), dtype=np.int32)
    e_excl = e_incl - emit_blank
    bounds = np.concatenate(([0], np.cumsum(lens)))
    # gidx[i] = i + e_excl[i]: char i's output slot, up to a per-span shift.
    # For span [a, b) the in-span positions are gidx[a:b] - gidx[a] — one
    # vector subtract per span instead of an arange + two adds (the arange
    # alone was ~20k calls per 300-doc batch in the round-6 profile).
    gidx = np.arange(cp.size, dtype=np.int32) + e_excl
    # NOTE: a fully-vectorized whole-batch construction (one flat buffer +
    # global scatter) was tried and measured ~70x SLOWER on the few-big-
    # spans regime the 2 MB oversized pages produce (giant int64 index
    # temporaries vs this loop's cache-resident per-span arrays), while
    # winning only ~4x on the 40k-tiny-spans regime. The loop stays.
    out: list[np.ndarray] = []
    for k in range(len(texts)):
        a, b = int(bounds[k]), int(bounds[k + 1])
        L = b - a
        if L == 0:
            out.append(np.zeros(0, dtype=np.uint32))
            continue
        total = L + int(e_incl[b - 1] - e_excl[a])
        seq = np.zeros(total, dtype=np.uint32)
        pos = gidx[a:b] - gidx[a]
        seq[pos] = sym[a:b]
        out.append(seq)
    return out


def recognize_spans(texts: list[str]) -> list[tuple[str, float]]:
    """Full rec stage over a list of span texts (any number of pages).

    Length-sort (R1) → batches of REC_BATCH (R4) → CTC decode (R5) →
    scatter back to original order (R7).
    """
    n = len(texts)
    if n == 0:
        return []
    seqs = encode_timesteps_many(texts)
    order = sorted(range(n), key=lambda i: (seqs[i].size, i))  # R1, stable
    results: list[tuple[str, float]] = [("", 0.0)] * n  # preallocation
    for beg in range(0, n, REC_BATCH):  # R4
        idx = order[beg : beg + REC_BATCH]
        decoded = ctc_greedy_batch([seqs[i] for i in idx])
        for i, r in zip(idx, decoded):  # R7 scatter
            results[i] = r
    return results
