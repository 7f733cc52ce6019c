"""N-vs-4N scaling-efficiency harness (north rule; BASELINE.md target ≥0.8).

No real cluster in this sandbox, so per the driver instruction the
two-cluster-size criterion is evidenced by running the IDENTICAL extraction
job at two parallelism levels — local[N] and local[4N] (default 8 → 32) —
on the same input, reporting throughput at both plus
``efficiency = (docs/s at 4N) / (4 × docs/s at N)``.

Methodology: one warmup pass (JIT + page cache) before either timed run, so
both measurements are warm; fresh SparkContext per level (sessions stopped
between); same fixture parquet, same code path as bench.py.

Writes BENCH/scaling.json and refreshes the results table in
BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import pathlib
import shutil
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

from cpp_paddle_ocr_spark.operators.extract import extract  # noqa: E402
from cpp_paddle_ocr_spark.session import get_spark  # noqa: E402
from cpp_paddle_ocr_spark.sources.documents import write_documents_parquet  # noqa: E402

N_DOCS = 20_000
OVERSIZE_MAX = 2_000_000
N_SMALL = 8
N_BIG = 32


def run_once(master_cores: int, fixture: str, warmup: bool = False) -> float:
    spark = get_spark(
        app_name=f"scaling-{master_cores}",
        master=f"local[{master_cores}]",
        shuffle_partitions=master_cores,
    )
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = str(ROOT / ".benchdata" / f"scaling_out_{master_cores}")
    shutil.rmtree(out_dir, ignore_errors=True)
    docs = spark.read.parquet(fixture)
    if warmup:
        docs = docs.limit(2000)
    t0 = time.perf_counter()
    extract(docs, num_partitions=master_cores * 2).write.mode("overwrite").parquet(
        out_dir
    )
    dt = time.perf_counter() - t0
    n = spark.read.parquet(out_dir).count()
    spark.stop()
    shutil.rmtree(out_dir, ignore_errors=True)
    return n / dt


def main() -> None:
    spark = get_spark(app_name="scaling-gen", master=f"local[{N_BIG}]")
    spark.sparkContext.setLogLevel("ERROR")
    fixture = str(ROOT / ".benchdata" / f"docs_n{N_DOCS}_o{OVERSIZE_MAX}")
    if not (pathlib.Path(fixture) / "_SUCCESS").exists():
        write_documents_parquet(spark, fixture, N_DOCS, oversize_max=OVERSIZE_MAX)
    spark.stop()

    run_once(N_SMALL, fixture, warmup=True)  # JIT + page-cache warmup

    rate_small = run_once(N_SMALL, fixture)
    rate_big = run_once(N_BIG, fixture)
    eff = (rate_big / rate_small) / (N_BIG / N_SMALL)

    result = {
        "n_docs": N_DOCS,
        "cores_small": N_SMALL,
        "cores_big": N_BIG,
        "docs_per_sec_small": round(rate_small, 2),
        "docs_per_sec_big": round(rate_big, 2),
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    bench_dir = ROOT / "BENCH"
    bench_dir.mkdir(exist_ok=True)
    (bench_dir / "scaling.json").write_text(json.dumps(result, indent=2))
    print(json.dumps(result))


if __name__ == "__main__":
    main()
