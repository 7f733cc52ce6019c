"""Round-6 session-3 pins: the precomputed full-domain kernel tables must
equal, entry for entry, the predicate/formula chains they replaced — over
the ENTIRE codepoint domain, so no input can ever reach a differing entry.
"""

from __future__ import annotations

import numpy as np

from cpp_paddle_ocr_spark.core import classify as C
from cpp_paddle_ocr_spark.core import detect as D
from cpp_paddle_ocr_spark import weights as W

ALL_CP = np.arange(0x110000, dtype=np.uint32)


def test_det_class_table_equals_predicate_chain():
    cp = ALL_CP
    ws = D._WS_TABLE[cp]
    upper = (cp >= 65) & (cp <= 90)
    letter = upper | ((cp >= 97) & (cp <= 122))
    digit = (cp >= 48) & (cp <= 57)
    punct = (cp < 128) & ~letter & ~digit & ~ws
    cls = D._CLS_TABLE[cp]
    assert np.array_equal(cls == D._CLS_WS, ws)
    assert np.array_equal(cls == D._CLS_UPPER, upper)
    assert np.array_equal((cls == D._CLS_UPPER) | (cls == D._CLS_LOWER), letter)
    assert np.array_equal(cls == D._CLS_DIGIT, digit)
    assert np.array_equal(cls == D._CLS_PUNCT, punct)


def test_cls_code_table_equals_masked_assignment_chain():
    cp = ALL_CP
    codes = np.full(cp.size, 5, dtype=np.int8)
    codes[(cp >= 97) & (cp <= 122)] = 1
    codes[(cp >= 65) & (cp <= 90)] = 2
    codes[(cp >= 48) & (cp <= 57)] = 3
    codes[D._WS_TABLE[cp]] = 4
    sep = np.zeros(cp.size, dtype=bool)
    sep[C._SEP_CP] = True
    codes[sep] = 6
    assert np.array_equal(C._CODE_TABLE[cp], codes)


def test_rec_prob_table_equals_hash_formula():
    cp = ALL_CP
    h = (cp.astype(np.uint64) * W._REC_PRIME) % np.uint64(1000)
    expect = 0.75 + 0.25 * (h.astype(np.float64) / 1000.0)
    got = W.rec_timestep_probs(cp)
    # bit-identity, not closeness: the table feeds the golden confidences
    assert np.array_equal(got, expect)


def test_eligible_compressed_stopword_pack_matches_literal_lookup():
    # adversarial page: uppercase stopwords, 13-char (too-long) words,
    # non-ASCII letters, digits glued to letters, clamped-tail tokens
    from cpp_paddle_ocr_spark.weights import STOPWORDS

    page = (
        "THE the ThE and AND consideration considerations 数据 café "
        "a1 1a of. IN to with WITH zzzz Öl i I a"
    )
    cp = D.codepoints(page)
    cls = D._CLS_TABLE[cp]
    ws = cls == D._CLS_WS
    ts, te = D._token_runs(~ws)
    tok_len = (te - ts).astype(np.float64)
    letter = (cls == D._CLS_UPPER) | (cls == D._CLS_LOWER)
    csum = np.concatenate(([0], np.cumsum(letter.astype(np.int64))))
    eligible = (tok_len <= D._STOP_MAXLEN) & ((csum[te] - csum[ts]) == tok_len)
    # the shipped compressed pack (mirrors detect_page's loop)
    got = np.zeros(ts.size)
    el = np.nonzero(eligible)[0]
    ts_el = ts[el]
    len_el = (te[el] - ts_el).astype(np.int64)
    packed = np.zeros(el.size, dtype=np.int64)
    last = cp.size - 1
    for k in range(int(len_el.max())):
        has_k = len_el > k
        ck = (cp[np.minimum(ts_el + k, last)] | 32).astype(np.int64) - 96
        packed = np.where(has_k, (packed << 5) | ck, packed)
    j = np.minimum(
        D._STOPWORDS_PACKED.searchsorted(packed), D._STOPWORDS_PACKED.size - 1
    )
    got[el[D._STOPWORDS_PACKED[j] == packed]] = 1.0
    expected = [
        1.0 if page[s:e].lower() in STOPWORDS else 0.0
        for s, e in zip(ts.tolist(), te.tolist())
    ]
    assert got.tolist() == expected
