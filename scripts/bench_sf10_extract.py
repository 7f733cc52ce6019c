"""Second measured decade for the HEADLINE only: 200k vs 2M docs.

BENCH/sf1.json covers sf0.1→sf1 for every operator; this script extends
the extraction pipeline — the north-rule metric — one more decade
(sf1→sf10, 2,000,000 synthetic pages ≈ 16 GB html) so the headline's
scaling exponent is measured across TWO decades, 20k → 2M docs.

Same methodology: interleaved (small, big) leg pairs in one session,
median of per-pair ratios (ratio ≤ 10 = at-worst-linear). Output appended
into BENCH/sf10_extract.json.

Usage: python scripts/bench_sf10_extract.py [n_pairs=2]
"""

from __future__ import annotations

import json
import pathlib
import shutil
import statistics
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

from cpp_paddle_ocr_spark.operators.extract import extract  # noqa: E402
from cpp_paddle_ocr_spark.session import get_spark  # noqa: E402

N_SMALL = 200_000
N_BIG = 2_000_000


def _leg(spark, fixture: str) -> tuple[float, int]:
    out = str(ROOT / ".benchdata" / "out_sf10")
    shutil.rmtree(out, ignore_errors=True)
    docs = spark.read.parquet(fixture)
    t0 = time.perf_counter()
    extract(docs).write.mode("overwrite").parquet(out)
    dt = time.perf_counter() - t0
    n = spark.read.parquet(out).count()
    return dt, n


def main() -> None:
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    import bench as benchmod

    spark = get_spark(app_name="bench_sf10")
    spark.sparkContext.setLogLevel("ERROR")
    fix_small = benchmod.ensure_fixture(spark, N_SMALL)
    fix_big = benchmod.ensure_fixture(spark, N_BIG)

    pairs = []
    for i in range(n_pairs):
        t_s, n_s = _leg(spark, fix_small)
        t_b, n_b = _leg(spark, fix_big)
        pairs.append(
            {
                "small_s": round(t_s, 2),
                "big_s": round(t_b, 2),
                "small_docs_per_sec": round(n_s / t_s, 1),
                "big_docs_per_sec": round(n_b / t_b, 1),
                "ratio": round(t_b / t_s, 3),
            }
        )
        print(f"pair {i}: {pairs[-1]}", flush=True)

    out = {
        "metric": "extract decade 2: 200k vs 2M docs, paired wall-time ratio",
        "linear_bound": 10.0,
        "ratio_median": round(
            statistics.median(p["ratio"] for p in pairs), 3
        ),
        "pairs": pairs,
    }
    (ROOT / "BENCH" / "sf10_extract.json").write_text(json.dumps(out, indent=1))
    print("wrote BENCH/sf10_extract.json")
    spark.stop()


if __name__ == "__main__":
    main()
