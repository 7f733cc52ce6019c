"""Checkpointed extraction job: per-partition lineage + resume (north rule).

The reference keeps atomic service counters (total/successful requests,
processing time — ``include/paddle_ocr/ocr_ipc_service.h:91-93``,
``src/ocr_ipc_service.cpp:438-448``). At 100 TB that becomes durable state:

* pages are assigned to ``n_buckets`` deterministic **lineage buckets** by
  ``pmod(xxhash64(url), n_buckets)`` — the unit of commit/retry;
* buckets are processed in ``n_groups`` commit groups; after each group the
  output is durably written (dynamic partition overwrite on ``bucket``) and a
  lineage row per bucket is appended — only then is the bucket "committed";
* on restart the job anti-joins the lineage table and processes only
  uncommitted buckets. Partial files from a crashed group sit in partition
  dirs that get dynamically overwritten on retry, so retries are idempotent:
  re-extraction of a bucket is byte-identical (core is deterministic) and
  replaces, never duplicates.

This gives resume-from-checkpoint with at-least-once work and exactly-once
visible results — the Spark-native warm-restart analog of the reference's
long-lived worker pool (``tests/test_ocr_worker.cpp:460-565``).
"""

from __future__ import annotations

import time
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

from .config import LINEAGE_BUCKETS
from .operators.extract import extract
from .schemas import LINEAGE_SCHEMA


class SimulatedFailure(RuntimeError):
    """Raised by the fault-injection hook in tests."""


def _bucket_col(n_buckets: int):
    return F.pmod(F.xxhash64(F.col("url")), F.lit(n_buckets)).cast("int")


def completed_buckets(spark: SparkSession, out_dir: str, run_id: str) -> set[int]:
    try:
        lin = spark.read.schema(LINEAGE_SCHEMA).parquet(f"{out_dir}/_lineage")
    except Exception:
        return set()
    rows = lin.filter(F.col("run_id") == run_id).select("bucket").distinct().collect()
    return {r.bucket for r in rows}


def read_lineage(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.schema(LINEAGE_SCHEMA).parquet(f"{out_dir}/_lineage")


def run_extract_job(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    run_id: str | None = None,
    n_buckets: int = LINEAGE_BUCKETS,
    n_groups: int = 8,
    num_partitions: int | None = None,
    metrics: dict | None = None,
    fail_after_group: int | None = None,
) -> str:
    """Extract ``docs`` into ``{out_dir}/extracted`` with resume support.

    Returns the ``run_id`` (pass it back in to resume after a failure).
    """
    run_id = run_id or uuid.uuid4().hex[:12]
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    done = completed_buckets(spark, out_dir, run_id)
    todo = [b for b in range(n_buckets) if b not in done]
    if not todo:
        return run_id

    group_size = max(1, -(-len(todo) // n_groups))
    docs_b = docs.withColumn("_bucket", _bucket_col(n_buckets))

    for g in range(0, len(todo), group_size):
        chunk = todo[g : g + group_size]
        t0 = time.perf_counter()
        sub = docs_b.filter(F.col("_bucket").isin(chunk)).drop("_bucket")
        out = extract(sub, num_partitions=num_partitions, metrics=metrics)
        out = out.withColumn("bucket", _bucket_col(n_buckets))
        out.write.mode("overwrite").partitionBy("bucket").parquet(
            f"{out_dir}/extracted"
        )
        wall_ms = (time.perf_counter() - t0) * 1000.0
        stats = (
            spark.read.parquet(f"{out_dir}/extracted")
            .filter(F.col("bucket").isin(chunk))
            .groupBy("bucket")
            .agg(
                F.count("*").alias("n_pages"),
                F.sum(F.col("success").cast("long")).alias("n_ok"),
                F.sum(F.col("n_blocks").cast("long")).alias("n_blocks"),
            )
            .select(
                F.lit(run_id).alias("run_id"),
                F.col("bucket"),
                F.col("n_pages"),
                F.col("n_ok"),
                F.col("n_blocks"),
                F.lit(wall_ms).alias("wall_ms"),
                F.current_timestamp().alias("committed_at"),
            )
        )
        # buckets with zero pages still need a lineage row to be "committed"
        empty = spark.createDataFrame(
            [
                (run_id, b, 0, 0, 0, wall_ms)
                for b in chunk
            ],
            "run_id string, bucket int, n_pages long, n_ok long, n_blocks long, wall_ms double",
        ).withColumn("committed_at", F.current_timestamp())
        lineage = stats.unionByName(empty.join(stats, "bucket", "left_anti"))
        lineage.write.mode("append").parquet(f"{out_dir}/_lineage")
        if fail_after_group is not None and g // group_size >= fail_after_group:
            raise SimulatedFailure(
                f"injected failure after commit group {g // group_size}"
            )
    return run_id


def read_extracted(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(f"{out_dir}/extracted")
