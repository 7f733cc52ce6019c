"""SparkSession factory with the engine's tuned configuration.

The analog of engine bring-up (SURVEY.md §3.2): where the reference
configures MKLDNN/IR-optim/zero-copy per predictor
(``src/ocr_det.cpp:64-87``), we configure Arrow batching, AQE and shuffle
sizing once per session.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Pages per Arrow record batch — the engine's master batch knob (X3): plays
#: the role of ``rec_batch_num``/``cls_batch_num`` at the page level. 32 keeps
#: worst-case batch bytes bounded (32 × 8 MiB cap = 256 MiB) while amortizing
#: the JVM→Python Arrow channel.
ARROW_BATCH_ROWS = 32


#: BLAS/OpenMP pools inside Python workers oversubscribe the box: N workers ×
#: N BLAS threads = N² runnable threads. Our numeric kernels are small
#: elementwise/matmul ops where the pool is pure overhead — pinning to 1
#: measured 653 → 1460 docs/s at local[32] (BENCH/BASELINE.md).
_THREAD_VARS = (
    "OMP_NUM_THREADS",
    "OPENBLAS_NUM_THREADS",
    "MKL_NUM_THREADS",
    "NUMEXPR_NUM_THREADS",
    "VECLIB_MAXIMUM_THREADS",
)


def get_spark(
    app_name: str = "cpp-paddle-ocr-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    for var in _THREAD_VARS:
        os.environ.setdefault(var, "1")  # local mode: workers inherit
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(
        os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    )
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        # pin the session timezone: event-time windows (F.window) align to
        # the UTC epoch, so an unpinned host tz with a non-whole-hour offset
        # would shift window boundaries and formatted timestamps
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            str(ARROW_BATCH_ROWS),
        )
        # python worker reuse keeps per-executor model weights warm (X4)
        .config("spark.python.worker.reuse", "true")
        .config("spark.sql.files.maxPartitionBytes", "128m")
        # fat binary rows: the default 4096-row columnar reader batch holds
        # GBs of html per in-flight batch and GC-thrashes the executor —
        # 128 rows ≈ 4 MB typical / 256 MB worst-case (measured 5x at
        # local[32], BENCH/BASELINE.md)
        .config("spark.sql.parquet.columnarReaderBatchSize", "128")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"))
        # G1's humongous-allocation handling collapses under the 2 MB html
        # byte-array churn (measured 600+ s of GC per 20k-page job);
        # throughput-oriented ParallelGC fits this batch workload: ~3× and
        # far lower variance (BENCH/BASELINE.md)
        .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
        .config("spark.executor.extraJavaOptions", "-XX:+UseParallelGC")
        # task-side commit (v2): the v1 driver-side sequential rename of every
        # task directory is a serial tail that grows with partition count
        .config(
            "spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2"
        )
    )
    for var in _THREAD_VARS:  # cluster mode: ship to executors too
        b = b.config(f"spark.executorEnv.{var}", "1")
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
