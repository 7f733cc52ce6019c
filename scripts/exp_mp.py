"""Pure-Python multiprocessing scaling probe (no Spark, no JVM).

Measures the extraction KERNEL's N-vs-4N core scaling in isolation:
fork N workers pinned by the caller's taskset, each extracts an equal shard
of the 60k-doc fixture. Fast (~30 s/point) and JVM-noise-free — used to
attribute the Spark legs' efficiency gap between kernel memory contention
and Spark overhead.

    taskset -c 0-31 python scripts/exp_mp.py --procs 32 [--malloc-tune]
"""

from __future__ import annotations

import argparse
import multiprocessing as mp
import os
import pathlib
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

FIXTURE = ROOT / ".benchdata" / "docs_n60000_o2000000_f512"

def _work(files) -> int:
    # each worker reads its OWN parquet files (no COW-shared parent heap —
    # refcount writes on shared objects force page copies and skew timing)
    import pyarrow.parquet as pq

    from cpp_paddle_ocr_spark.core.pipeline import extract_batch

    total = 0
    for f in files:
        t = pq.read_table(f, columns=["url", "html"])
        out = extract_batch(
            t.column("url").to_pylist(), t.column("html").to_pylist()
        )
        total += len(out)
    return total


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--procs", type=int, required=True)
    p.add_argument("--malloc-tune", action="store_true")
    p.add_argument("--repeats", type=int, default=3)
    args = p.parse_args()
    if args.malloc_tune:
        os.environ["MALLOC_MMAP_THRESHOLD_"] = "1073741824"
        os.environ["MALLOC_TRIM_THRESHOLD_"] = "268435456"
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ[var] = "1"

    files = sorted(str(f) for f in FIXTURE.glob("*.parquet"))
    # 4 files per task -> 128 tasks, matching the Spark legs' granularity
    shards = [files[i : i + 4] for i in range(0, len(files), 4)]

    rates = []
    ctx = mp.get_context("fork")
    with ctx.Pool(args.procs) as pool:
        pool.map(_work, shards)  # full warmup pass (page cache + imports)
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            total = sum(pool.map(_work, shards))
            rates.append(total / (time.perf_counter() - t0))
    rates.sort()
    print(
        f"PROCS {args.procs} median {rates[len(rates) // 2]:.1f} "
        f"best {rates[-1]:.1f} all {[round(r, 1) for r in rates]}",
        flush=True,
    )


if __name__ == "__main__":
    main()
