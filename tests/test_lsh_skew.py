"""LSH skew-bomb regression: a k-duplicate cluster must emit O(k) pairs per
band/bucket, not O(k²), once the per-key member cap engages (the classic
production failure mode on duplicate-heavy crawls)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cpp_paddle_ocr_spark.operators.dedup import lsh_candidate_pairs
from cpp_paddle_ocr_spark.operators.similarity import lsh_neardup_pairs

N_CLUSTER = 1000


def test_lsh_candidate_pairs_bounded_on_duplicate_cluster(spark):
    # 1000 identical documents: every band key has 1000 members → uncapped
    # output would be 4 * C(1000,2) ≈ 2M rows through one shuffle partition
    docs = spark.range(N_CLUSTER).select(
        F.col("id").alias("doc_id"),
        F.lit("the quick brown fox jumps over the lazy dog again").alias("text"),
    )
    pairs = lsh_candidate_pairs(docs, band_cap=64)
    n = pairs.count()
    # anchor-star: every non-anchor doc pairs with doc 0, once per band,
    # dedup'd → exactly k-1 pairs
    assert n == N_CLUSTER - 1
    # and the star keeps the cluster connected: every doc reachable from 0
    assert pairs.filter(F.col("doc_a") == 0).count() == N_CLUSTER - 1


def test_lsh_candidate_pairs_cap_inert_below_threshold(spark):
    # under the cap the dense self-join semantics are unchanged
    docs = spark.range(10).select(
        F.col("id").alias("doc_id"),
        F.lit("some shared duplicate text body here").alias("text"),
    )
    assert lsh_candidate_pairs(docs, band_cap=64).count() == 10 * 9 // 2


def test_lsh_neardup_pairs_bounded_on_duplicate_cluster(spark):
    # 500 identical embeddings land in one LSH bucket; with the cap the
    # bucket degrades to anchor-star cosine checks
    emb = [float(i % 7) + 1.0 for i in range(64)]
    vecs = spark.range(500).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.lit(v) for v in emb]).alias("embedding"),
    )
    pairs = lsh_neardup_pairs(vecs, thresh=0.9, bucket_cap=100)
    rows = pairs.collect()
    assert len(rows) == 499
    assert all(r.vec_a == 0 and abs(r.cosine - 1.0) < 1e-9 for r in rows)


def test_knn_join_bounded_on_duplicate_cluster(spark):
    # 500 identical embeddings in one bucket with a low cap: the star
    # degradation must hold for the kNN join too — each non-anchor row ranks
    # against the anchor only (1 neighbor), the anchor gets its full top-k;
    # total candidate pairs stay O(n), never n²
    from cpp_paddle_ocr_spark.operators.similarity import knn_join

    emb = [float(i % 7) + 1.0 for i in range(64)]
    vecs = spark.range(500).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.lit(v) for v in emb]).alias("embedding"),
    )
    rows = knn_join(vecs, k=5, bucket_cap=100).collect()
    anchor_rows = [r for r in rows if r.vec_id == 0]
    member_rows = [r for r in rows if r.vec_id != 0]
    assert len(anchor_rows) == 5  # anchor ranks all members, keeps top-k
    assert len(member_rows) == 499  # each member: exactly the anchor
    assert all(r.neighbor_id == 0 and r.knn_rank == 1 for r in member_rows)
    assert all(abs(r.cosine - 1.0) < 1e-9 for r in rows)
