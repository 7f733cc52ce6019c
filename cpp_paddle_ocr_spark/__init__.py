"""cpp-paddle-ocr-spark: PySpark-native web-content extraction engine.

This import runs inside every Spark Python worker before NumPy is loaded, so
the thread-pool pinning below takes effect even when the engine runs under a
session we didn't configure (e.g. the verify driver's). N workers × N BLAS
threads oversubscribes the host quadratically — our kernels are small vector
ops where the pool is pure overhead (measured 653 → 1460 docs/s at
local[32]; see BENCH/BASELINE.md and session.py).
"""

import os as _os

for _var in (
    "OMP_NUM_THREADS",
    "OPENBLAS_NUM_THREADS",
    "MKL_NUM_THREADS",
    "NUMEXPR_NUM_THREADS",
    "VECLIB_MAXIMUM_THREADS",
):
    _os.environ.setdefault(_var, "1")
