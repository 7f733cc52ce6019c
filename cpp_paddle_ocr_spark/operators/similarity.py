"""Similarity search over an embedding column (``array<float>``).

* ``cosine_topk`` — brute-force exact top-k: the correctness baseline.
  Cosines are computed with a sequential ``aggregate`` fold (deterministic
  summation order), rounded to 6 dp BEFORE ranking so cross-engine ties
  resolve identically (tie-break: ``vec_id`` ascending).
* ``lsh_bucketed_ann`` — the scale path: 8 deterministic random-hyperplane
  sign bits → bucket id; candidates = query's bucket only (a broadcast-able
  bucket join instead of an n² cross join). At 10^12 rows the bucket join
  shuffles ~n/256 candidates per query instead of n.

Both use the reference's cascade discipline: cheap filter first (bucket),
exact scoring only on survivors — the det→rec shape applied to ANN.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .common import load

TOPK = 10
N_PLANES = 8
DIM = 64


def _dot_expr(a: str, b: str) -> str:
    return f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v)"


def _norm_expr(a: str) -> str:
    return f"sqrt(aggregate({a}, 0.0D, (acc, v) -> acc + v * v))"


def cosine_topk(
    df: DataFrame, query_vec_id: int = 0, k: int = TOPK
) -> DataFrame:
    """Exact top-k by cosine against the embedding of ``query_vec_id``."""
    e = df.select("vec_id", F.col("embedding").cast("array<double>").alias("emb"))
    q = e.filter(F.col("vec_id") == query_vec_id).select(
        F.col("emb").alias("qemb")
    )
    scored = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != query_vec_id)
        .select(
            "vec_id",
            F.round(
                F.expr(_dot_expr("emb", "qemb"))
                / (F.expr(_norm_expr("emb")) * F.expr(_norm_expr("qemb"))),
                6,
            ).alias("cosine"),
        )
    )
    return scored.orderBy(F.col("cosine").desc(), F.col("vec_id").asc()).limit(k)


COSINE_TOPK_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
q AS (SELECT emb AS qemb FROM e WHERE vec_id = 0)
SELECT e.vec_id,
       round(list_dot_product(e.emb, q.qemb)
             / (sqrt(list_dot_product(e.emb, e.emb))
                * sqrt(list_dot_product(q.qemb, q.qemb))), 6) AS cosine
FROM e, q
WHERE e.vec_id <> 0
ORDER BY cosine DESC, e.vec_id ASC
LIMIT {TOPK}
"""


def _plane_dot(emb: str, j: int) -> str:
    """Signed sum for hyperplane j: weight(i) = +1 if (i*31 + j*17) even."""
    return (
        f"aggregate(sequence(0, {DIM - 1}), 0.0D, (acc, i) -> acc + "
        f"element_at({emb}, i + 1) * (CASE WHEN pmod(i * 31 + {j} * 17, 2) = 0 "
        f"THEN 1.0D ELSE -1.0D END))"
    )


def _bucket_col(emb: str):
    value = None
    for j in range(N_PLANES):
        bit = F.when(F.expr(_plane_dot(emb, j)) > 0, F.lit(1 << j)).otherwise(
            F.lit(0)
        )
        value = bit if value is None else value + bit
    return value.cast("int")


def lsh_bucketed_ann(
    df: DataFrame, query_vec_id: int = 0, k: int = TOPK
) -> DataFrame:
    """ANN: exact cosine ranking restricted to the query's LSH bucket."""
    e = df.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    ).withColumn("bucket", _bucket_col("emb"))
    q = e.filter(F.col("vec_id") == query_vec_id).select(
        F.col("emb").alias("qemb"), F.col("bucket").alias("qbucket")
    )
    cands = (
        e.join(
            F.broadcast(q), F.col("bucket") == F.col("qbucket")
        )  # bucket-equality join: the LSH prune
        .filter(F.col("vec_id") != query_vec_id)
        .select(
            "vec_id",
            "bucket",
            F.round(
                F.expr(_dot_expr("emb", "qemb"))
                / (F.expr(_norm_expr("emb")) * F.expr(_norm_expr("qemb"))),
                6,
            ).alias("cosine"),
        )
    )
    return cands.orderBy(F.col("cosine").desc(), F.col("vec_id").asc()).limit(k)


def _plane_dot_sql(emb: str, j: int) -> str:
    return (
        f"list_sum(list_transform(generate_series(0, {DIM - 1}), i -> "
        f"{emb}[i + 1] * (CASE WHEN (i * 31 + {j} * 17) % 2 = 0 "
        f"THEN 1.0 ELSE -1.0 END)))"
    )


def _bucket_sql(emb: str) -> str:
    return " + ".join(
        f"(CASE WHEN {_plane_dot_sql(emb, j)} > 0 THEN {1 << j} ELSE 0 END)"
        for j in range(N_PLANES)
    )


LSH_ANN_SQL = f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS emb,
         ({_bucket_sql('(embedding::DOUBLE[])')}) AS bucket
  FROM embeddings
),
q AS (SELECT emb AS qemb, bucket AS qbucket FROM e WHERE vec_id = 0)
SELECT e.vec_id, e.bucket,
       round(list_dot_product(e.emb, q.qemb)
             / (sqrt(list_dot_product(e.emb, e.emb))
                * sqrt(list_dot_product(q.qemb, q.qemb))), 6) AS cosine
FROM e, q
WHERE e.bucket = q.qbucket AND e.vec_id <> 0
ORDER BY cosine DESC, e.vec_id ASC
LIMIT {TOPK}
"""


#: Per-bucket member cap for the full-table near-dup self-join: a bucket
#: with more members than this (a duplicate-heavy crawl puts a k-identical
#: cluster into ONE bucket → k² join rows on one shuffle partition) degrades
#: to anchor-star pairs — each member is cosine-verified against the
#: bucket's min vec_id only, O(k) output. Union-find over the star still
#: recovers the duplicate cluster; member↔member pairs inside over-cap
#: buckets are the traded-away recall.
BUCKET_CAP = 1024


def lsh_neardup_pairs(
    df: DataFrame, thresh: float = 0.9, bucket_cap: int = BUCKET_CAP
) -> DataFrame:
    """Full-table embedding near-dup at scale: bucket self-join + exact
    cosine verify — the production path behind
    ``dedup.embedding_neardup_pairs`` (whose brute-force window is the
    correctness baseline).

    Scale shape: the shuffle key is the 8-bit LSH bucket (≈n/256 rows per
    bucket), so the join explodes per-bucket, never n². Recall is bounded by
    the hyperplane count: near-identical vectors (cosine ≥ 0.9) land in the
    same bucket with high probability; increase ``N_PLANES`` bands for
    higher recall in exchange for candidate volume. Buckets over
    ``bucket_cap`` members emit anchor-star pairs only (see BUCKET_CAP).
    """
    from pyspark.sql import Window

    w = Window.partitionBy("bucket")
    e = (
        df.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("emb")
        )
        .withColumn("bucket", _bucket_col("emb"))
        .withColumn("n_bucket", F.count("*").over(w))
        .withColumn("anchor", F.min("vec_id").over(w))
    )

    def scored(pairs: DataFrame) -> DataFrame:
        return pairs.select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round(
                F.expr(_dot_expr("a.emb", "b.emb"))
                / (F.expr(_norm_expr("a.emb")) * F.expr(_norm_expr("b.emb"))),
                6,
            ).alias("cosine"),
        ).filter(F.col("cosine") >= thresh)

    small = e.filter(F.col("n_bucket") <= bucket_cap)
    dense = scored(
        small.alias("a").join(
            small.alias("b"),
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
    )
    big = e.filter(F.col("n_bucket") > bucket_cap)
    star = scored(
        big.filter(F.col("vec_id") == F.col("anchor"))
        .alias("a")
        .join(
            big.filter(F.col("vec_id") != F.col("anchor")).alias("b"),
            F.col("a.bucket") == F.col("b.bucket"),
        )
    )
    return dense.unionByName(star)


def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cosine_topk(load(spark, sf_dir, "embeddings"))


def q_lsh_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lsh_bucketed_ann(load(spark, sf_dir, "embeddings"))


QUERIES = {
    "sim_cosine_topk": q_cosine_topk,
    "sim_lsh_ann": q_lsh_ann,
}

ORACLES = {
    "sim_cosine_topk": COSINE_TOPK_SQL,
    "sim_lsh_ann": LSH_ANN_SQL,
}


# ---------------------------------------------------------------------------
# IVF ANN — the brief's named alternative to the LSH bucket path: a coarse
# quantizer partitions vectors into N_CENTROIDS inverted lists; a query
# probes its NPROBE nearest lists and exact-ranks only those candidates.
# Centroids are CLOSED-FORM deterministic (component (j,i) =
# ((i*31 + j*57) mod 17 - 8) / 8), so the assignment is reproducible in any
# engine with no trained artifact — the weights-as-code discipline of
# weights.py applied to the quantizer. At 10^12 rows the scale shape is:
# list assignment is a map over the scan, the probe join broadcasts NPROBE
# list ids, and exact scoring touches ~NPROBE/N_CENTROIDS of the table.
# ---------------------------------------------------------------------------

N_CENTROIDS = 16
NPROBE = 4


def _centroid_dot(emb: str, j: int) -> str:
    """dot(emb, centroid_j) with the closed-form centroid component.

    JVM-side sequential fold so the DuckDB oracle reproduces the exact
    float sums (same summation order). At production scale the assignment
    would be a vectorized pandas-UDF matmul (n×DIM @ DIM×N_CENTROIDS, one
    Arrow batch per task) — ~10-100× less per-row expression work — at the
    cost of SIMD/pairwise summation order, which breaks bit-parity with a
    sequential-fold oracle; the oracle-checked form stays the fold."""
    return (
        f"aggregate(sequence(0, {DIM - 1}), 0.0D, (acc, i) -> acc + "
        f"element_at({emb}, i + 1) * "
        f"((CAST(pmod(i * 31 + {j} * 57, 17) AS DOUBLE) - 8.0D) / 8.0D))"
    )


def ivf_topk(df: DataFrame, query_vec_id: int = 0, k: int = TOPK) -> DataFrame:
    """IVF ANN: spherical assignment (argmax centroid dot), NPROBE-list
    probe, exact cosine rank over the probed candidates."""
    e = (
        df.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("emb")
        )
        .withColumn(
            "scores",
            F.array(*[F.expr(_centroid_dot("emb", j)) for j in range(N_CENTROIDS)]),
        )
        .withColumn(
            "list_id",
            (F.expr("array_position(scores, array_max(scores))") - 1).cast("int"),
        )
    )
    q = e.filter(F.col("vec_id") == query_vec_id)
    probes = (
        q.select(F.posexplode("scores").alias("list_id", "s"))
        .orderBy(F.col("s").desc(), F.col("list_id").asc())
        .limit(NPROBE)
        .select(F.col("list_id").cast("int").alias("list_id"))
    )
    qemb = q.select(F.col("emb").alias("qemb"))
    cands = (
        e.join(F.broadcast(probes), "list_id")  # the inverted-list probe
        .crossJoin(F.broadcast(qemb))
        .filter(F.col("vec_id") != query_vec_id)
        .select(
            "vec_id",
            "list_id",
            F.round(
                F.expr(_dot_expr("emb", "qemb"))
                / (F.expr(_norm_expr("emb")) * F.expr(_norm_expr("qemb"))),
                6,
            ).alias("cosine"),
        )
    )
    return cands.orderBy(F.col("cosine").desc(), F.col("vec_id").asc()).limit(k)


_CENTROID_DOT_SQL = (
    "list_sum(list_transform(generate_series(0, {dmax}), i -> "
    "emb[i + 1] * ((CAST((i * 31 + {j} * 57) % 17 AS DOUBLE) - 8.0) / 8.0)))"
)

IVF_ANN_SQL = f"""
WITH e0 AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
e1 AS (
  SELECT vec_id, emb,
         list_transform(generate_series(0, {N_CENTROIDS - 1}), j ->
           list_sum(list_transform(generate_series(0, {DIM - 1}), i ->
             emb[i + 1] * ((CAST((i * 31 + j * 57) % 17 AS DOUBLE) - 8.0) / 8.0)
           ))) AS scores
  FROM e0
),
e AS (
  SELECT vec_id, emb, scores,
         CAST(list_indexof(scores, list_max(scores)) - 1 AS INT) AS list_id
  FROM e1
),
probes AS (
  SELECT CAST(j - 1 AS INT) AS list_id
  FROM (SELECT unnest(scores) AS s,
               generate_subscripts(scores, 1) AS j
        FROM e WHERE vec_id = 0)
  ORDER BY s DESC, j ASC
  LIMIT {NPROBE}
),
q AS (SELECT emb AS qemb FROM e WHERE vec_id = 0)
SELECT e.vec_id, e.list_id,
       round(list_dot_product(e.emb, q.qemb)
             / (sqrt(list_dot_product(e.emb, e.emb))
                * sqrt(list_dot_product(q.qemb, q.qemb))), 6) AS cosine
FROM e JOIN probes USING (list_id), q
WHERE e.vec_id <> 0
ORDER BY cosine DESC, e.vec_id ASC
LIMIT {TOPK}
"""


def q_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ivf_topk(load(spark, sf_dir, "embeddings"))


QUERIES["sim_ivf_ann"] = q_ivf_ann
ORACLES["sim_ivf_ann"] = IVF_ANN_SQL
