"""Round-6 parallelism-floor pins (common.load).

The driver's sf tables are one parquet file with one row group, so without
the floor every scan-shaped query computes on 1-2 tasks (BASELINE.md #19).
These tests pin the floor's firing condition, its key shape (single-id
xxhash64 — NOT round-robin, NOT all-columns; both variants regressed, see
BASELINE.md #19), and the corpus_stats opt-out that protects the
summation-order-sensitive float average (BASELINE.md #20).
"""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from cpp_paddle_ocr_spark.operators.common import load

SF = "/root/testdata/sf0.001"


def test_single_file_table_is_rebalanced_to_parallelism(spark):
    df = load(spark, SF, "documents")
    assert (
        df.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    )


def test_rebalance_key_is_single_id_hash(spark):
    plan = load(spark, SF, "documents")._jdf.queryExecution().executedPlan().toString()
    # deterministic single-column hash key: retry-safe (guide §2.5), no
    # round-robin local sort, and column pruning survives because the
    # exchange references only the leading id column
    assert "xxhash64(doc_id" in plan
    assert "RoundRobinPartitioning" not in plan


def test_rebalance_opt_out_keeps_scan_partitioning(spark):
    df = load(spark, SF, "documents", rebalance=False)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_rebalance_preserves_column_pruning(spark):
    # an all-column hash key would drag every column into the ReadSchema
    # (the regression test_corpus_keep_no_cartesian_and_prunes_scan caught
    # in round 6); the single-id key must leave pruning intact
    df = load(spark, SF, "documents").select("doc_id", "n_chars")
    plan = df._jdf.queryExecution().executedPlan().toString()
    rs = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "text" not in rs and "lang" not in rs, rs
