"""Scratch experiment harness for the scaling investigation (round 2).

Runs ONE leg per invocation (taskset-pinned by the caller):
    python scripts/exp_scaling.py --mode local --cores 8 [--shuffle]
    python scripts/exp_scaling.py --mode cluster --execs 8 --cores-per 4 [--shuffle]

Prints RATE <docs/s> after a full warmup pass and best-of-2 timed passes.
Uses the 128-file fixture (finer task granularity than the 32-file one).
"""

from __future__ import annotations

import argparse
import pathlib
import shutil
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

N_DOCS = 60_000
FIXTURE = ROOT / ".benchdata" / f"docs_n{N_DOCS}_o2000000_f512"


def ensure_fixture() -> None:
    if (FIXTURE / "_SUCCESS").exists():
        return
    from cpp_paddle_ocr_spark.session import get_spark
    from cpp_paddle_ocr_spark.sources.documents import generate_documents

    spark = get_spark(app_name="gen", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    generate_documents(spark, N_DOCS, oversize_max=2_000_000, num_partitions=128) \
        .write.mode("overwrite").parquet(str(FIXTURE))
    spark.stop()


def leg(args) -> None:
    args.exec_mem_mb = int(args.exec_mem.rstrip("g")) * 1024 + 1024
    from cpp_paddle_ocr_spark.operators.extract import extract
    from cpp_paddle_ocr_spark.session import get_spark

    if args.mode == "cluster":
        total = args.execs * args.cores_per
        master = f"local-cluster[{args.execs},{args.cores_per},{args.exec_mem_mb}]"
        extra = {
            "spark.ui.enabled": "false",
            "spark.executor.memory": args.exec_mem,
            "spark.sql.parquet.columnarReaderBatchSize": str(args.reader_batch),
            "spark.sql.files.maxPartitionBytes": args.max_part,
            "spark.sql.files.openCostInBytes": "1m",
            # each executor JVM sees the whole machine; bound its service
            # threads to its share of the pin
            "spark.executor.extraJavaOptions": (
                f"-XX:+UseParallelGC -XX:ParallelGCThreads={args.cores_per} "
                f"-XX:ActiveProcessorCount={args.cores_per}"
            ),
        }
    else:
        total = args.cores
        master = f"local[{total}]"
        extra = {"spark.ui.enabled": "false"}
    if args.eventlog:
        import os
        os.makedirs(args.eventlog, exist_ok=True)
        extra["spark.eventLog.enabled"] = "true"
        extra["spark.eventLog.dir"] = args.eventlog
    if args.malloc_tune:
        # numpy buffers >128KB are mmap-backed by default: every free is a
        # munmap -> TLB-shootdown IPI across all pinned cores. Keep frees in
        # the heap instead.
        extra["spark.executorEnv.MALLOC_MMAP_THRESHOLD_"] = "1073741824"
        extra["spark.executorEnv.MALLOC_TRIM_THRESHOLD_"] = "268435456"
        extra["spark.executorEnv.MALLOC_TOP_PAD_"] = "134217728"
        import os
        os.environ["MALLOC_MMAP_THRESHOLD_"] = "1073741824"
        os.environ["MALLOC_TRIM_THRESHOLD_"] = "268435456"
    spark = get_spark(
        app_name=f"exp-{args.mode}-{total}",
        master=master,
        shuffle_partitions=total,
        extra_conf=extra,
    )
    spark.sparkContext.setLogLevel("ERROR")
    if args.mode == "cluster":
        import zipfile

        zp = ROOT / "engine.zip"
        zp.unlink(missing_ok=True)  # ALWAYS rebuild: a stale zip silently
        if not zp.exists():         # ships an old kernel to the executors
            with zipfile.ZipFile(zp, "w", zipfile.ZIP_DEFLATED) as z:
                for p in sorted(ROOT.glob("cpp_paddle_ocr_spark/**/*.py")):
                    z.write(p, p.relative_to(ROOT).as_posix())
        spark.sparkContext.addPyFile(str(zp))
    docs = spark.read.parquet(str(FIXTURE))
    nparts = total * 2 if args.shuffle else None

    def one(tag: str) -> float:
        out = str(ROOT / ".benchdata" / f"exp_{args.mode}_{total}_{tag}")
        shutil.rmtree(out, ignore_errors=True)
        t0 = time.perf_counter()
        if args.action == "count":
            n = extract(docs, num_partitions=nparts).count()
            dt = time.perf_counter() - t0
        else:
            extract(docs, num_partitions=nparts).write.mode("overwrite").parquet(out)
            dt = time.perf_counter() - t0
            n = spark.read.parquet(out).count()
        shutil.rmtree(out, ignore_errors=True)
        return n / dt

    one("warm")
    best = max(one("t1"), one("t2"))
    print(f"RATE {best:.2f}", flush=True)
    spark.stop()


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--mode", choices=["local", "cluster"], required=True)
    p.add_argument("--cores", type=int, default=8)
    p.add_argument("--execs", type=int, default=2)
    p.add_argument("--cores-per", type=int, default=4)
    p.add_argument("--shuffle", action="store_true")
    p.add_argument("--action", choices=["write", "count"], default="write")
    p.add_argument("--exec-mem", default="5g")
    p.add_argument("--reader-batch", type=int, default=128)
    p.add_argument("--max-part", default="128m")
    p.add_argument("--malloc-tune", action="store_true")
    p.add_argument("--eventlog", default=None)
    p.add_argument("--gen-only", action="store_true")
    args = p.parse_args()
    ensure_fixture()
    if not args.gen_only:
        leg(args)


if __name__ == "__main__":
    main()
