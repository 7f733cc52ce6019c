"""Production extraction job entry (SURVEY.md §3.1 Spark-native equivalent).

Usage:
    spark-submit --py-files engine.zip jobs/extract_job.py \
        --input /path/to/documents_parquet_or_iceberg_table \
        --output /path/to/out_dir \
        [--run-id RID] [--buckets 64] [--groups 8] [--partitions P] \
        [--generate N]          # generate a fixture table instead of reading

Build engine.zip with scripts/make_pyfiles.sh. The job is resumable: rerun
with the same --run-id and --output after a failure and only uncommitted
lineage buckets are processed (cpp_paddle_ocr_spark.lineage).
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str]) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", default=None)
    p.add_argument("--output", required=True)
    p.add_argument("--run-id", default=None)
    p.add_argument("--buckets", type=int, default=64)
    p.add_argument("--groups", type=int, default=8)
    p.add_argument("--partitions", type=int, default=None)
    p.add_argument("--generate", type=int, default=None)
    p.add_argument(
        "--status",
        action="store_true",
        help="print lineage/metrics summary for --output and exit "
        "(the 'status' verb of the reference's request router P5, "
        "src/ocr_ipc_service.cpp:438-448)",
    )
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    from cpp_paddle_ocr_spark.lineage import run_extract_job
    from cpp_paddle_ocr_spark.operators.extract import make_metrics
    from cpp_paddle_ocr_spark.sources.documents import (
        generate_documents,
        read_documents,
    )

    # don't tear down a session this entry didn't create (in-process
    # callers — tests, notebooks — own their session's lifecycle)
    owns_session = SparkSession.getActiveSession() is None
    spark = SparkSession.builder.appName("extract-job").getOrCreate()
    if args.status:
        from pyspark.sql import functions as F

        from cpp_paddle_ocr_spark.lineage import read_lineage

        lin = read_lineage(spark, args.output)
        summary = lin.groupBy("run_id").agg(
            F.countDistinct("bucket").alias("buckets"),
            F.sum("n_pages").alias("n_pages"),
            F.sum("n_ok").alias("n_ok"),
            F.sum("n_blocks").alias("n_blocks"),
            F.max("committed_at").alias("last_commit"),
        )
        summary.show(truncate=False)
        if owns_session:
            spark.stop()
        return

    source_table = None
    if args.generate:
        docs = generate_documents(spark, args.generate)
    elif args.input:
        docs = read_documents(spark, args.input)
        from cpp_paddle_ocr_spark.iceberg import _is_table_ident

        if _is_table_ident(args.input):
            # Iceberg source: lineage uses per-commit-group pruned scans on
            # the table's own bucket transform instead of persisting the
            # full extraction output (lineage.run_extract_job docstring)
            source_table = args.input
    else:
        p.error("one of --input / --generate is required")

    metrics = make_metrics(spark)
    run_id = run_extract_job(
        spark,
        docs,
        args.output,
        run_id=args.run_id,
        n_buckets=args.buckets,
        n_groups=args.groups,
        num_partitions=args.partitions,
        metrics=metrics,
        source_table=source_table,
    )
    print(
        f"run_id={run_id} "
        + " ".join(f"{k}={v.value}" for k, v in metrics.items())
    )
    if owns_session:
        spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
