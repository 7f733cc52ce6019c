"""Unit tests: cls stage (SURVEY.md §2.4 K1-K5)."""

from __future__ import annotations

import numpy as np

from cpp_paddle_ocr_spark.config import CLS_FEAT_W
from cpp_paddle_ocr_spark.core.classify import classify_spans, encode_char_classes

PROSE = [
    "This is an ordinary readable sentence with several common words.",
    "Viwi forici mohu cirica nuga dola dafeho pawado zica pini lucetusi.",
    "The committee approved the proposal after a lengthy discussion period.",
]
BOILER = [
    "READ MORE | SUBSCRIBE NOW | FOLLOW US",
    "SHARE THIS | TWEET | PIN IT",
    "TRENDING NOW | MOST READ | EDITOR PICKS",
    "SIGN UP TODAY | FREE TRIAL | JOIN NOW",
]


def test_prose_is_content():
    labels, scores = classify_spans(PROSE)
    assert labels.tolist() == [0, 0, 0]
    assert (scores > 0.5).all()


def test_boilerplate_is_label_1():
    labels, _ = classify_spans(BOILER)
    assert labels.tolist() == [1, 1, 1, 1]


def test_label_decides_regardless_of_score():
    # K5 quirk: cls_thresh=0.98 configured but never consulted on the live
    # path (src/ocr_worker.cpp:276-281 vs :45): even low-confidence label-1
    # results are acted upon. Verify our scores ARE below 0.98 yet label
    # still decides.
    labels, scores = classify_spans(BOILER)
    assert (labels == 1).all()
    assert (scores < 0.98).any(), "quirk is only meaningful if scores dip below cls_thresh"


def test_encode_shape_and_padding():
    codes = encode_char_classes(["ab", "X" * 500])
    assert codes.shape == (2, CLS_FEAT_W)
    assert codes[0, 0] == 1 and codes[0, 1] == 1 and codes[0, 2] == 0  # K2 pad
    assert (codes[1] == 2).all()  # truncated to width (K1)


def test_encode_classes():
    codes = encode_char_classes(["aA1 .|"])[0]
    assert codes[:6].tolist() == [1, 2, 3, 4, 5, 6]


def test_batching_does_not_change_results():
    # K3 batches of 8: results must not depend on batch boundaries
    texts = (PROSE + BOILER) * 3  # 21 spans -> 3 batches
    l1, s1 = classify_spans(texts)
    l2, s2 = classify_spans(texts[:8])
    assert l1[:8].tolist() == l2.tolist()
    assert np.array_equal(s1[:8], s2)


def test_empty_input():
    labels, scores = classify_spans([])
    assert labels.size == 0 and scores.size == 0


def test_fast_exp_softmax_parity_knob():
    # K6/X7: the Schraudolph fast_exp knob approximates exact softmax within
    # its documented ~3-4% and never changes the argmax on batch logits
    import numpy as np

    from cpp_paddle_ocr_spark.core.activations import fast_exp
    from cpp_paddle_ocr_spark.core.classify import classify_spans

    x = np.linspace(-30.0, 0.0, 301)
    rel = np.abs(fast_exp(x) - np.exp(x)) / np.exp(x)
    assert rel.max() < 0.05  # Schraudolph worst-case ~4.4%
    texts = ["Plain prose sentence with ordinary words", "HOME | NEWS | SPORTS",
             "Another normal paragraph of text here", "SIGN UP TODAY | FREE TRIAL"]
    l_exact, s_exact = classify_spans(texts, softmax_mode="exact")
    l_fast, s_fast = classify_spans(texts, softmax_mode="fast_exp")
    assert (l_exact == l_fast).all()
    assert np.abs(s_exact - s_fast).max() < 0.02


def test_fast_exp_large_positive_stays_finite():
    # ADVICE r3: unshifted logits (x > ~88) must clamp to max-finite
    # float32, never view as 0xFFFFFFFF = NaN
    import numpy as np

    from cpp_paddle_ocr_spark.core.activations import fast_exp

    out = fast_exp(np.array([100.0, 1000.0, 1e6]))
    assert np.all(np.isfinite(out))
    assert np.all(out > 0)


def test_stacked_batches_match_per_batch_reference():
    """Round-6 pin: the 3-D stacked-matmul fast path is bit-identical
    (labels AND score bits) to the per-CLS_BATCH loop it replaced, in both
    softmax modes — including a trailing partial batch."""
    import random

    from cpp_paddle_ocr_spark.config import CLS_BATCH
    from cpp_paddle_ocr_spark.core.activations import softmax_rows
    from cpp_paddle_ocr_spark.weights import CLS_B, CLS_CLASS_LOGITS, CLS_W

    rnd = random.Random(7)
    chars = "abc DEF 123 |·•›»/ .,;:!? 中文 😀 \t\n"
    texts = [
        "".join(rnd.choice(chars) for _ in range(rnd.randint(0, 250)))
        for _ in range(CLS_BATCH * 3 + 5)  # forces a partial tail batch
    ]
    codes = encode_char_classes(texts)
    for mode in ("exact", "fast_exp"):
        labels, scores = classify_spans(texts, mode)
        for beg in range(0, len(texts), CLS_BATCH):
            batch = codes[beg : beg + CLS_BATCH]
            x = batch.astype(np.float64) / 6.0
            logits = x @ CLS_W + CLS_B
            logits = logits + CLS_CLASS_LOGITS[batch].sum(axis=1)
            probs = softmax_rows(logits, mode)
            want_l = probs.argmax(axis=1)
            want_s = probs.max(axis=1)
            assert (labels[beg : beg + CLS_BATCH] == want_l).all()
            assert (
                scores[beg : beg + CLS_BATCH].tobytes() == want_s.tobytes()
            )
