"""Partitioning strategy: the pool-dispatch analog (SURVEY.md §2.8 P2, X10).

The reference dispatches requests idle-first/round-robin across workers
(``src/cpu_worker_pool.cpp:43-56``) and rejects oversized requests at the
1 MB pipe buffer (``src/ocr_ipc_service.cpp:222-239``). At 100 TB the
equivalents are:

* **url-hash + salt partitioning** — ``xxhash64(url)`` spreads pages
  uniformly; the explicit salt term keeps the layout uniform even when a
  single mega-host dominates the crawl *and* someone partitions or buckets by
  host upstream (north-rule requirement). Salt = ``xxhash64(url, SALT_SEED) %
  SALT_BUCKETS`` so it is deterministic, not random — retries produce the
  same layout (required for resume idempotence).
* **size routing** — pages above ``OVERSIZE_ROUTE_BYTES`` go to their own
  range partitions ordered by length, so one 8 MiB page never sits in an
  Arrow batch with 31 others (X2's global form: size-homogeneous batches via
  ``repartitionByRange(length(html))``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..config import OVERSIZE_ROUTE_BYTES, SALT_BUCKETS

SALT_SEED = 0x5A17


def salted_url_partitioning(
    df: DataFrame, num_partitions: int, salt_buckets: int = SALT_BUCKETS
) -> DataFrame:
    """Repartition by (host-hash, salt): uniform layout under host skew."""
    host = F.parse_url(F.col("url"), F.lit("HOST"))
    salt = F.pmod(F.xxhash64(F.col("url"), F.lit(SALT_SEED)), F.lit(salt_buckets))
    return df.repartition(num_partitions, F.xxhash64(host), salt)


def size_routed_repartition(
    df: DataFrame,
    num_partitions: int,
    threshold_bytes: int = OVERSIZE_ROUTE_BYTES,
) -> DataFrame:
    """Small pages → salted hash layout; big pages → range layout by size.

    Returns one DataFrame (union) whose partitioning keeps Arrow batches
    size-homogeneous. Both branches are narrow scans of the same source; AQE
    coalesces the small-side shuffle if the input is tiny.
    """
    size = F.length(F.col("html"))
    small = df.filter((size <= threshold_bytes) | size.isNull())
    big = df.filter(size > threshold_bytes)
    small_p = salted_url_partitioning(small, num_partitions)
    # oversized pages: few per crawl → a handful of range partitions sorted by
    # size so the largest pages share a batch only with similarly-large ones
    big_p = big.repartitionByRange(
        max(2, num_partitions // 8), F.length(F.col("html"))
    )
    return small_p.unionByName(big_p)
