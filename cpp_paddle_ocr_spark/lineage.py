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


def _child_target(out_dir: str, name: str) -> str:
    """Child sink target: ``{out_dir}/{name}`` for paths, ``{out_dir}_{name}``
    for Iceberg table identifiers (dotted names can't nest a path)."""
    if "/" in out_dir or "\\" in out_dir:
        return f"{out_dir}/{name}"
    return f"{out_dir}_{name}"


def completed_buckets(spark: SparkSession, out_dir: str, run_id: str) -> set[int]:
    try:
        lin = read_lineage(spark, out_dir)
    except Exception:
        return set()
    rows = lin.filter(F.col("run_id") == run_id).select("bucket").distinct().collect()
    return {r.bucket for r in rows}


def read_lineage(spark: SparkSession, out_dir: str) -> DataFrame:
    t = _child_target(out_dir, "_lineage")
    if "/" in t:
        return spark.read.schema(LINEAGE_SCHEMA).parquet(t)
    return spark.read.table(t)


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

    # ONE source scan for the whole job: extract every uncommitted bucket in
    # a single pass and spool the (far smaller) extraction output to executor
    # storage; the commit-group loop below then writes + commits lineage from
    # the cache. The earlier per-group design filtered the SOURCE per group —
    # n_groups full scans of the input (8 × 100 TB at scale) plus a re-read
    # of the just-written output for stats.
    from pyspark.storagelevel import StorageLevel

    docs_b = docs.withColumn("_bucket", _bucket_col(n_buckets))
    if len(todo) < n_buckets:  # resume: only uncommitted buckets
        docs_b = docs_b.filter(F.col("_bucket").isin(todo))
    out_all = extract(
        docs_b.drop("_bucket"), num_partitions=num_partitions, metrics=metrics
    ).withColumn("bucket", _bucket_col(n_buckets))
    out_all.persist(StorageLevel.MEMORY_AND_DISK)

    try:
        for g in range(0, len(todo), group_size):
            chunk = todo[g : g + group_size]
            t0 = time.perf_counter()
            part = out_all.filter(F.col("bucket").isin(chunk))
            # Iceberg overwritePartitions when out_dir is a table identifier
            # (atomic metadata swap, one snapshot per commit group); dynamic
            # partition overwrite on the parquet path fallback
            from .iceberg import overwrite_result_partitions

            overwrite_result_partitions(part, _child_target(out_dir, "extracted"))
            wall_ms = (time.perf_counter() - t0) * 1000.0
            # per-bucket stats straight from the cached output — no re-read
            stats = (
                part.groupBy("bucket")
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
            t = _child_target(out_dir, "_lineage")
            if "/" in t:
                lineage.write.mode("append").parquet(t)
            else:  # Iceberg: append creates-or-appends the lineage table
                lineage.write.mode("append").saveAsTable(t)
            if fail_after_group is not None and g // group_size >= fail_after_group:
                raise SimulatedFailure(
                    f"injected failure after commit group {g // group_size}"
                )
    finally:
        out_all.unpersist()
    return run_id


def read_extracted(spark: SparkSession, out_dir: str) -> DataFrame:
    t = _child_target(out_dir, "extracted")
    if "/" in t:
        return spark.read.parquet(t)
    return spark.read.table(t)
