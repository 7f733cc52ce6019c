"""Pure-Python core: the three-stage cascade over pandas/NumPy batches.

This package has no Spark dependency; it is both the executor-side payload of
the Spark UDFs and the single-threaded "reference extractor" that produces the
committed golden outputs (SURVEY.md §7 steps 2-3, mirroring the reference's
direct-worker test path, tests/test_ocr_worker.cpp:107-117).
"""
