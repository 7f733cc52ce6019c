"""Softmax variants shared by the cls and layout stages.

The reference's ``activation_function_softmax`` (``src/utility.cpp:
359-376``) computes exp via ``fast_exp`` (``:350-357``) — the Schraudolph
bit-trick: reinterpret ``(1<<23)*(x/ln2 + 126.93490512)`` as an IEEE-754
float32. Its only live consumer is the Picodet layout path
(``disPred2Bbox``, ``src/postprocess_op.cpp:538-547``), so our layout
distance decode uses ``mode="fast_exp"`` by default (bit-faithful
transplant), while the cls stage keeps exact ``np.exp`` by default — the
documented X7 deviation — with the fast_exp knob available for parity runs.
"""

from __future__ import annotations

import numpy as np

_LOG2E = 1.4426950409  # double literal, as in the C source
_BIAS = np.float32(126.93490512)  # float literal ("f" suffix in the C source)


def fast_exp(x: np.ndarray) -> np.ndarray:
    """Vectorized Schraudolph exp approximation, bit-identical to the
    reference's float32 union trick for in-range inputs (softmax feeds it
    ``x - max(x) <= 0``; below ~-87.3 the C version's float→uint32 cast is
    UB — we clamp there, which maps to a subnormal/zero result)."""
    y = (1 << 23) * (_LOG2E * x.astype(np.float64) + np.float64(_BIAS))
    # upper clamp is max FINITE float32 (0x7F7FFFFF), not uint32 max: a
    # large positive input (x > ~88) would otherwise view as 0xFFFFFFFF =
    # NaN and poison the softmax. Softmax callers feed x - max(x) <= 0
    # (where y < 2^30, untouched by either clamp), so this only hardens
    # the unshifted-logits case.
    bits = np.clip(y, 0, 0x7F7FFFFF).astype(np.uint32)
    return bits.view(np.float32).astype(np.float64)


def softmax_1d(x: np.ndarray, mode: str = "exact") -> np.ndarray:
    """Reference softmax over one vector: subtract max, exp, normalize."""
    shifted = x - x.max()
    e = fast_exp(shifted) if mode == "fast_exp" else np.exp(shifted)
    return e / e.sum()


def softmax_rows(x: np.ndarray, mode: str = "exact") -> np.ndarray:
    """Row-wise softmax over a 2-D batch (the K3/K6 shape)."""
    shifted = x - x.max(axis=1, keepdims=True)
    e = fast_exp(shifted) if mode == "fast_exp" else np.exp(shifted)
    return e / e.sum(axis=1, keepdims=True)
