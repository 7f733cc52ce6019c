"""Synthesize an sf1 directory (10x sf0.1) for the order-of-magnitude bench.

The driver ships sf{0.001,0.01,0.1} only; every 100-TB-scale argument in
BENCH/BASELINE.md was extrapolated from sf0.1. This script manufactures a
deterministic sf1 (documents 50k, embeddings 20k, events 1M) from the
read-only sf0.1 parquet so ``SPARK_GRAFT_SF_DIR=.benchdata/sf1 python
bench.py`` measures one real decade of scaling. No external data; seeded
NumPy only.

Decorrelation contract (what makes the decade measurement honest): naive
10x replication would make every doc a 10-way exact/near duplicate, so
dedup pair counts would grow quadratically in copies and the decade would
look superlinear for DATA reasons, not engine reasons. Instead each copy k
is transformed so that:

* documents — every whitespace token gets a per-copy suffix (``~k``):
  within-copy duplicate structure is preserved exactly (same rewrite both
  sides), cross-copy shingle/simhash/minhash collisions are destroyed.
  doc_id shifted by k*10^7; n_chars recomputed from the rewritten text.
* embeddings — per-copy seeded dimension permutation + sign flips (an
  orthogonal transform): norms and within-copy pairwise cosines preserved
  EXACTLY, cross-copy similarities decorrelated. vec_id shifted by k*10^7
  (copy 0 unchanged, so query_vec_id=0 still exists).
* events — event_id/user_id shifted per copy: group count x10, per-group
  size distribution unchanged, so window/IoU work scales linearly.
* orders/customer — fact and customer keys shifted per copy (the
  o_custkey shift matches the customer shift, so join selectivity per
  order is unchanged); nation stays the FIXED 25-row dimension — at
  scale, facts grow and broadcast dimensions do not.

Usage:  python scripts/gen_sf1.py  [copies=10]
Writes: .benchdata/sf1/{documents,embeddings,events,orders,customer,nation}.parquet
"""

from __future__ import annotations

import pathlib
import sys

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from cpp_paddle_ocr_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
DST = ROOT / ".benchdata" / "sf1"
ID_STRIDE = 10_000_000


def scale_documents(spark, copies: int) -> DataFrame:
    base = spark.read.parquet(f"{SRC}/documents.parquet")
    parts = []
    for k in range(copies):
        if k == 0:
            parts.append(base)
            continue
        # suffix every token: kills cross-copy shingle collisions while
        # preserving token count and within-copy duplicate structure
        rewritten = base.select(
            (F.col("doc_id") + F.lit(k * ID_STRIDE)).alias("doc_id"),
            F.regexp_replace(F.col("text"), r"(\S+)", f"$1~{k}").alias("text"),
            "lang",
            "source",
        ).withColumn("n_chars", F.length("text"))
        parts.append(rewritten.select("doc_id", "text", "lang", "source", "n_chars"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def scale_embeddings(spark, copies: int) -> DataFrame:
    import pandas as pd

    base = spark.read.parquet(f"{SRC}/embeddings.parquet").toPandas()
    dim = len(base["embedding"].iloc[0])
    mat = np.array(base["embedding"].tolist(), dtype=np.float32)
    frames = [base]
    for k in range(1, copies):
        rng = np.random.default_rng(1000 + k)
        perm = rng.permutation(dim)
        signs = rng.choice(np.array([-1.0, 1.0], dtype=np.float32), size=dim)
        xmat = mat[:, perm] * signs[None, :]
        frames.append(
            pd.DataFrame(
                {
                    "vec_id": base["vec_id"] + k * ID_STRIDE,
                    "embedding": list(xmat),
                    "label": base["label"],
                }
            )
        )
    allf = pd.concat(frames, ignore_index=True)
    allf["embedding"] = allf["embedding"].apply(
        lambda v: np.asarray(v, dtype=np.float32).tolist()
    )
    return spark.createDataFrame(allf, "vec_id bigint, embedding array<float>, label int")


def scale_events(spark, copies: int) -> DataFrame:
    base = spark.read.parquet(f"{SRC}/events.parquet")
    parts = [base]
    for k in range(1, copies):
        parts.append(
            base.select(
                (F.col("event_id") + F.lit(k * ID_STRIDE)).alias("event_id"),
                "ts",
                (F.col("user_id") + F.lit(k * ID_STRIDE)).alias("user_id"),
                "event_type",
                "value",
                "props",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def scale_orders(spark, copies: int) -> DataFrame:
    base = spark.read.parquet(f"{SRC}/orders.parquet")
    parts = [base]
    for k in range(1, copies):
        parts.append(
            base.select(
                (F.col("o_orderkey") + F.lit(k * ID_STRIDE)).alias("o_orderkey"),
                (F.col("o_custkey") + F.lit(k * ID_STRIDE)).alias("o_custkey"),
                "o_orderstatus",
                "o_totalprice",
                "o_orderdate",
                "o_orderpriority",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def scale_customer(spark, copies: int) -> DataFrame:
    base = spark.read.parquet(f"{SRC}/customer.parquet")
    parts = [base]
    for k in range(1, copies):
        parts.append(
            base.select(
                (F.col("c_custkey") + F.lit(k * ID_STRIDE)).alias("c_custkey"),
                "c_name",
                "c_nationkey",
                "c_acctbal",
                "c_mktsegment",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def generate_sf1(spark, copies: int = 10) -> None:
    """Write the sf1 tables under .benchdata/sf1 using an existing
    session (also called from bench_sf1_pairs when the dir is absent)."""
    DST.mkdir(parents=True, exist_ok=True)
    scale_documents(spark, copies).repartition(32).write.mode("overwrite").parquet(
        str(DST / "documents.parquet")
    )
    scale_embeddings(spark, copies).repartition(32).write.mode("overwrite").parquet(
        str(DST / "embeddings.parquet")
    )
    scale_events(spark, copies).repartition(32).write.mode("overwrite").parquet(
        str(DST / "events.parquet")
    )
    scale_orders(spark, copies).repartition(8).write.mode("overwrite").parquet(
        str(DST / "orders.parquet")
    )
    scale_customer(spark, copies).repartition(8).write.mode("overwrite").parquet(
        str(DST / "customer.parquet")
    )
    # fixed broadcast dimension: copied, not scaled
    spark.read.parquet(f"{SRC}/nation.parquet").write.mode("overwrite").parquet(
        str(DST / "nation.parquet")
    )


def main() -> None:
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark(app_name="gen_sf1")
    spark.sparkContext.setLogLevel("ERROR")
    generate_sf1(spark, copies)
    for t in ("documents", "embeddings", "events", "orders", "customer", "nation"):
        n = spark.read.parquet(str(DST / f"{t}.parquet")).count()
        print(t, n)
    spark.stop()


if __name__ == "__main__":
    main()
