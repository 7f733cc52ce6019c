"""Single-thread pure-kernel throughput (no Spark, no JVM).

The per-core anchor behind BENCH/BASELINE.md's docs/s/core claims: runs the
pure cascade (`core.pipeline.extract_batch`) over the deterministic fixture
mix on ONE pinned core, best-of-N with a full warmup pass. Use taskset and
an idle machine; this host's per-core capacity drifts ±25% on minute scales
(CLAUDE.md #6), so single passes are meaningless — the script prints every
pass and the best.

    taskset -c 0 python scripts/bench_kernel.py [n_docs] [passes]
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

from cpp_paddle_ocr_spark.core.pipeline import extract_batch  # noqa: E402
from cpp_paddle_ocr_spark.fixtures import page  # noqa: E402

OVERSIZE_MAX = 2_000_000


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 600
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    rows = [page(i, OVERSIZE_MAX) for i in range(n)]
    urls = [r["url"] for r in rows]
    htmls = [r["html"] for r in rows]
    extract_batch(urls, htmls)  # FULL warmup pass (CLAUDE.md perf rule #6)
    rates = []
    for _ in range(passes):
        t0 = time.perf_counter()
        extract_batch(urls, htmls)
        rates.append(n / (time.perf_counter() - t0))
    print(
        json.dumps(
            {
                "metric": "pure-kernel docs/sec, single thread",
                "n_docs": n,
                "passes": [round(r, 1) for r in rates],
                "best": round(max(rates), 1),
                "oversize_max": OVERSIZE_MAX,
            }
        )
    )


if __name__ == "__main__":
    main()
