"""Unit tests: rec stage CTC semantics (SURVEY.md §2.5 R1-R8)."""

from __future__ import annotations

import random

import numpy as np
import pytest

from cpp_paddle_ocr_spark.core.decode import (
    ctc_greedy_batch,
    encode_timesteps,
    recognize_spans,
)


def decode_one(text: str) -> tuple[str, float]:
    return recognize_spans([text])[0]


def test_identity_on_clean_text():
    t, score = decode_one("hello world")
    assert t == "hello world"
    assert 0.75 <= score < 1.0


def test_whitespace_collapse():
    # consecutive whitespace = repeated space symbol -> collapsed (R5)
    assert decode_one("a  b\t\nc \t d")[0] == "a b c d"


def test_repeat_letters_survive():
    # blanks interleaved after non-ws symbols: genuine repeats preserved
    assert decode_one("aa bb  cc")[0] == "aa bb cc"


def test_entities_decoded():
    assert decode_one("fish &amp; chips")[0] == "fish & chips"
    assert decode_one("x&nbsp;&nbsp;y")[0] == "x y"  # nbsp -> ws -> collapse
    assert decode_one("&lt;tag&gt;")[0] == "<tag>"


def test_control_chars_dropped():
    assert decode_one("a\x00\x01b​c­d")[0] == "abcd"


def test_empty_and_all_dropped_spans():
    # zero kept timesteps => NaN-skip => preallocated ("", 0.0) (R5)
    assert decode_one("")[0] == ""
    assert decode_one("\x00\x01") == ("", 0.0)


def test_confidence_is_mean_of_kept_probs():
    t, score = decode_one("ab")
    from cpp_paddle_ocr_spark.weights import rec_timestep_probs

    expect = rec_timestep_probs(np.array([ord("a"), ord("b")], np.uint32)).mean()
    assert score == pytest.approx(float(expect))


def test_batch_composition_independence():
    # grouping spans into different batches must not change any result
    # (byte-identity across partitionings, SURVEY.md §7 hard part 1)
    rng = random.Random(7)
    texts = [
        "".join(rng.choice("ab c&;x  YZ\té") for _ in range(rng.randint(0, 40)))
        for _ in range(100)
    ]
    ref = recognize_spans(texts)
    for trial in range(3):
        rng.shuffle(texts_idx := list(range(len(texts))))
        # decode in shuffled order, then unshuffle
        shuffled = [texts[i] for i in texts_idx]
        got = recognize_spans(shuffled)
        back = [None] * len(texts)
        for pos, i in enumerate(texts_idx):
            back[i] = got[pos]
        assert back == ref


def test_length_sort_scatter_back_roundtrip():
    # R1 + R7: output order == input order even though processing is sorted
    texts = ["dddd", "a", "ccc", "bb", ""]
    out = recognize_spans(texts)
    assert [t for t, _ in out] == ["dddd", "a", "ccc", "bb", ""]


def test_dynamic_batch_width():
    # R2: batch is padded to its own max only; decoding stays correct
    seqs = [encode_timesteps(t) for t in ["a", "abcdef"]]
    out = ctc_greedy_batch(seqs)
    assert [t for t, _ in out] == ["a", "abcdef"]


def test_encode_interleaves_blanks():
    seq = encode_timesteps("ab")
    # a, blank, b, blank
    assert seq.tolist() == [ord("a"), 0, ord("b"), 0]
    seq = encode_timesteps("a b")
    assert seq.tolist() == [ord("a"), 0, 32, ord("b"), 0]


def test_batched_select_matches_per_row_reference():
    """Round-6 pin: ctc_greedy_batch's one-2D-select form is bit-identical
    (text AND confidence bits) to the per-row boolean-index reference it
    replaced — np.add.reduce over the contiguous row slice must run the
    same pairwise tree as probs[i, k].mean()."""
    from cpp_paddle_ocr_spark.weights import rec_timestep_probs

    rng = np.random.RandomState(0)
    for trial in range(40):
        seqs = [
            rng.choice(
                [0, 32, 97, 98, 98, 0x4E2D, 0x1F600], size=rng.randint(0, 400)
            ).astype(np.uint32)
            for _ in range(rng.randint(1, 17))
        ]
        got = ctc_greedy_batch(seqs)
        width = max((s.size for s in seqs), default=0)
        if width == 0:
            assert got == [("", 0.0)] * len(seqs)
            continue
        mat = np.zeros((len(seqs), width), dtype=np.uint32)
        for i, s in enumerate(seqs):
            mat[i, : s.size] = s
        probs = rec_timestep_probs(mat)
        keep = mat != 0
        keep[:, 1:] &= mat[:, 1:] != mat[:, :-1]
        for i, (text, conf) in enumerate(got):
            k = keep[i]
            if not k.any():
                assert (text, conf) == ("", 0.0)
                continue
            assert text == mat[i, k].tobytes().decode("utf-32-le")
            want = float(probs[i, k].mean())
            assert np.float64(conf).tobytes() == np.float64(want).tobytes()
