"""Similarity/dedup operator semantics beyond the oracle checks."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cpp_paddle_ocr_spark.operators.dedup import embedding_neardup_pairs
from cpp_paddle_ocr_spark.operators.similarity import (
    cosine_topk,
    lsh_bucketed_ann,
    lsh_neardup_pairs,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def test_lsh_neardup_subset_of_bruteforce(spark, embeddings):
    # every LSH-found pair must be a true near-dup pair (precision = 1:
    # exact cosine verify runs on candidates); recall bounded by bucketing
    brute = {
        (r.vec_a, r.vec_b): r.cosine
        for r in embedding_neardup_pairs(embeddings, vec_cap=10**9, thresh=0.9).collect()
    }
    lsh = {
        (r.vec_a, r.vec_b): r.cosine
        for r in lsh_neardup_pairs(embeddings, thresh=0.9).collect()
    }
    assert set(lsh) <= set(brute)
    for k, v in lsh.items():
        assert brute[k] == v
    if brute:
        recall = len(lsh) / len(brute)
        assert recall > 0.3, f"LSH recall collapsed: {recall}"


def test_ann_topk_contains_bucket_hits(spark, embeddings):
    exact = [r.vec_id for r in cosine_topk(embeddings).collect()]
    approx = [r.vec_id for r in lsh_bucketed_ann(embeddings).collect()]
    assert len(exact) == 10
    # ANN results are ranked by the same exact cosine, restricted to the
    # query bucket: every ANN hit that IS in the exact top-10 must appear in
    # the same relative order
    common = [v for v in exact if v in set(approx)]
    assert [v for v in approx if v in set(exact)] == common


def test_ann_broadcast_no_full_shuffle(spark, embeddings):
    plan = lsh_bucketed_ann(embeddings)._jdf.queryExecution().executedPlan().toString()
    assert "Broadcast" in plan


def test_ivf_probe_covers_query_list_and_ranks_exact(spark, embeddings):
    from cpp_paddle_ocr_spark.operators.similarity import NPROBE, ivf_topk

    exact = [r.vec_id for r in cosine_topk(embeddings).collect()]
    ivf = ivf_topk(embeddings).collect()
    assert len(ivf) == 10
    # candidates come from at most NPROBE inverted lists
    assert len({r.list_id for r in ivf}) <= NPROBE
    # exact-cosine ranking on the probed subset: relative order of any hits
    # shared with the exact top-10 is preserved
    ids = [r.vec_id for r in ivf]
    common = [v for v in exact if v in set(ids)]
    assert [v for v in ids if v in set(exact)] == common
    # deterministic across runs
    again = [(r.vec_id, r.list_id, r.cosine) for r in ivf_topk(embeddings).collect()]
    assert again == [(r.vec_id, r.list_id, r.cosine) for r in ivf]


def test_ivf_probe_is_broadcast(spark, embeddings):
    # the fold (oracle) path keeps the broadcast probe join; the batched
    # production path has NO join at all (asserted separately below)
    from cpp_paddle_ocr_spark.operators.similarity import ivf_topk

    plan = (
        ivf_topk(embeddings, assign="fold")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Broadcast" in plan


def test_ivf_assign_fold_vs_batched_agree(spark, embeddings):
    # round-3 verdict #1: the production batched-matmul assignment must agree
    # with the oracle-pinned sequential fold on argmax for every fixture row.
    # Ties are the only divergence risk; the closed-form centroids make exact
    # ties measure-zero — assert both (no ties, identical assignment).
    import numpy as np

    from cpp_paddle_ocr_spark.operators.similarity import (
        N_CENTROIDS,
        _centroid_dot,
        _centroid_matrix,
        ivf_scores_batched,
    )

    e = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    fold = e.select(
        "vec_id",
        F.array(
            *[F.expr(_centroid_dot("emb", j)) for j in range(N_CENTROIDS)]
        ).alias("scores"),
    )
    fold_rows = {r.vec_id: list(r.scores) for r in fold.collect()}
    batched = e.select("vec_id", ivf_scores_batched()(F.col("emb")).alias("scores"))
    bat_rows = {r.vec_id: list(r.scores) for r in batched.collect()}
    assert set(fold_rows) == set(bat_rows)
    for vid, fs in fold_rows.items():
        fa = np.asarray(fs)
        ba = np.asarray(bat_rows[vid])
        # no exact ties at the top in either scoring
        assert np.sum(fa == fa.max()) == 1, vid
        assert np.sum(ba == ba.max()) == 1, vid
        assert int(fa.argmax()) == int(ba.argmax()), vid
        # scores agree to float tolerance (only summation order differs)
        assert np.allclose(fa, ba, rtol=1e-12, atol=1e-9), vid


def test_ivf_topk_batched_default_matches_fold(spark, embeddings):
    from cpp_paddle_ocr_spark.operators.similarity import ivf_topk

    got_b = [(r.vec_id, r.list_id, r.cosine) for r in ivf_topk(embeddings).collect()]
    got_f = [
        (r.vec_id, r.list_id, r.cosine)
        for r in ivf_topk(embeddings, assign="fold").collect()
    ]
    assert got_b == got_f
    assert len(got_b) == 10


def test_knn_join_matches_per_bucket_bruteforce(spark, embeddings):
    # every row's reported neighbors must be exactly the top-k by rounded
    # cosine among its bucket peers (tie-break neighbor_id asc) — verified
    # against an independent NumPy recomputation
    import numpy as np

    from cpp_paddle_ocr_spark.operators.similarity import (
        _bucket_col,
        knn_join,
    )

    got = {}
    for r in knn_join(embeddings, k=3).collect():
        got.setdefault(r.vec_id, []).append((r.knn_rank, r.neighbor_id, r.cosine))
    e = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    ).withColumn("bucket", _bucket_col("emb"))
    rows = e.collect()
    by_bucket: dict[int, list] = {}
    for r in rows:
        by_bucket.setdefault(r.bucket, []).append(
            (r.vec_id, np.asarray(r.emb, dtype=np.float64))
        )
    exp = {}
    for members in by_bucket.values():
        for vid, v in members:
            cands = []
            for nid, u in members:
                if nid == vid:
                    continue
                c = round(
                    float(v @ u)
                    / (float(np.sqrt(v @ v)) * float(np.sqrt(u @ u))),
                    6,
                )
                cands.append((-c, nid))
            cands.sort()
            if cands:
                exp[vid] = [
                    (i + 1, nid, -negc)
                    for i, (negc, nid) in enumerate(cands[:3])
                ]
    assert set(got) == set(exp)
    mismatches = 0
    for vid in exp:
        if sorted(got[vid]) != exp[vid]:
            mismatches += 1
    # float summation order (numpy pairwise vs Spark fold) may flip a 6-dp
    # rounding at the exact .5 boundary — allow none in practice
    assert mismatches == 0


def test_knn_join_rank_contract(spark, embeddings):
    from cpp_paddle_ocr_spark.operators.similarity import knn_join

    out = knn_join(embeddings, k=4)
    bad = (
        out.groupBy("vec_id")
        .agg(
            F.count("*").alias("n"),
            F.max("knn_rank").alias("mx"),
            F.countDistinct("knn_rank").alias("dr"),
            F.countDistinct("neighbor_id").alias("dn"),
        )
        .filter(
            (F.col("n") > 4)
            | (F.col("mx") != F.col("n"))
            | (F.col("dr") != F.col("n"))
            | (F.col("dn") != F.col("n"))
        )
        .count()
    )
    assert bad == 0
    # no self-neighbors
    assert out.filter(F.col("vec_id") == F.col("neighbor_id")).count() == 0


def test_knn_join_ivf_method_runs_and_is_deterministic(spark, embeddings):
    from cpp_paddle_ocr_spark.operators.similarity import knn_join

    a = sorted(map(tuple, knn_join(embeddings, k=3, method="ivf").collect()))
    b = sorted(map(tuple, knn_join(embeddings, k=3, method="ivf").collect()))
    assert a == b and len(a) > 0


def test_knn_join_engines_agree(spark, embeddings):
    # the per-bucket matmul engine and the oracle-pinned expression engine
    # must produce identical rows (both round half-up at 6 dp; bucket
    # membership is the deterministic unrolled plane-dot either way)
    from cpp_paddle_ocr_spark.operators.similarity import knn_join

    b = sorted(map(tuple, knn_join(embeddings, k=4).collect()))
    e = sorted(map(tuple, knn_join(embeddings, k=4, engine="expr").collect()))
    assert b == e and len(b) > 0


def test_ivf_topk_batched_plan_has_no_join(spark, embeddings):
    # the production single-query IVF resolves probes driver-side: the plan
    # must be a filtered scan + sort, with no join operator at all
    from cpp_paddle_ocr_spark.operators.similarity import ivf_topk

    plan = ivf_topk(embeddings)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan


def test_ivf_topk_missing_query_id_empty_both_engines(spark, embeddings):
    from cpp_paddle_ocr_spark.operators.similarity import ivf_topk

    for assign in ("batched", "fold"):
        out = ivf_topk(embeddings, query_vec_id=10_000_000, assign=assign)
        assert out.count() == 0, assign
        assert [f.name for f in out.schema.fields] == [
            "vec_id", "list_id", "cosine",
        ], assign


def test_round_half_up_6_matches_shortest_repr_decimal():
    """The gold semantics (Spark F.round == BigDecimal.valueOf HALF_UP ==
    Decimal(repr(x)) HALF_UP) must hold INCLUDING at representation
    boundaries where the vectorized floor(|x|*1e6+0.5) form can land on
    the wrong side."""
    import decimal

    import numpy as np

    from cpp_paddle_ocr_spark.operators.similarity import _round_half_up_6

    q = decimal.Decimal("0.000001")

    def gold(v: float) -> float:
        return float(
            decimal.Decimal(repr(v)).quantize(
                q, rounding=decimal.ROUND_HALF_UP
            )
        )

    # boundary-adjacent doubles (nearest doubles to k.5e-6 values) plus a
    # deterministic sweep of ordinary values
    vals = [0.1234565, -0.1234565, 0.9999995, -0.9999995, 0.0000005]
    vals += [np.nextafter(v, 0.0) for v in vals]
    vals += [np.nextafter(v, 1.0) for v in vals[:5]]
    rng = np.random.default_rng(7)
    vals += list(rng.uniform(-1, 1, 500))
    arr = np.asarray(vals, dtype=np.float64)
    got = _round_half_up_6(arr)
    for v, g in zip(vals, got):
        assert g == gold(float(v)), (v, g, gold(float(v)))


def test_knn_group_kernel_tripwire_rejects_over_cap_group():
    """Round-4 verdict #1: over-cap keys must be ROUTED around the pandas
    kernel, never materialized into it. The kernel enforces that invariant
    with a hard raise — so the skew test (500 identical vectors, cap 100,
    batched engine) passing IS proof no over-cap group was materialized."""
    import numpy as np
    import pandas as pd
    import pytest as _pytest

    from cpp_paddle_ocr_spark.operators.similarity import _knn_group_fn

    fn = _knn_group_fn(k=5, bucket_cap=100)
    emb = [float(i % 7) + 1.0 for i in range(64)]
    pdf = pd.DataFrame(
        {"key": 1, "vec_id": np.arange(101), "emb": [emb] * 101}
    )
    with _pytest.raises(RuntimeError, match="over-cap routing"):
        fn(pdf)
    # at the cap the kernel is the right arm and must work
    out = fn(pdf.iloc[:100])
    assert set(out["knn_rank"]) == {1, 2, 3, 4, 5}


def test_lsh_multiprobe_recall_two_widths(spark, embeddings):
    """Round-4 verdict #2: bucket geometry is a parameter. At a finer hash
    (12 planes = 4096 buckets) the single-bucket candidate pool shrinks, and
    multi-probe (1-bit-flip neighbor buckets by smallest hyperplane margin)
    must recover at least the single-bucket recall vs exact brute force —
    candidates are a superset, and exact top-k of a superset pool can only
    gain true-top-k members."""
    truth = {r.vec_id for r in cosine_topk(embeddings, k=10).collect()}

    def recall(n_planes: int, multiprobe: int) -> float:
        got = {
            r.vec_id
            for r in lsh_bucketed_ann(
                embeddings, n_planes=n_planes, multiprobe=multiprobe
            ).collect()
        }
        return len(got & truth) / len(truth)

    for width in (8, 12):
        single = recall(width, 0)
        multi = recall(width, 4)
        assert multi >= single, (width, single, multi)


def test_ivf_query_vec_bypasses_plan_time_lookup(spark, embeddings):
    """With query_vec supplied, building the batched IVF plan must launch
    no lookup job (round-4 nit #3): .head() is monkeypatched to raise, so
    any plan-time scan would fail loudly."""
    from pyspark.sql import DataFrame

    from cpp_paddle_ocr_spark.operators.similarity import ivf_topk

    qvec = [float(v) for v in embeddings.filter(F.col("vec_id") == 0).head().embedding]
    baseline = ivf_topk(embeddings).collect()

    orig_head = DataFrame.head
    def boom(self, n=None):  # noqa: ANN001
        raise AssertionError("plan-time .head() scan with query_vec supplied")

    DataFrame.head = boom
    try:
        out = ivf_topk(embeddings, query_vec=qvec)
    finally:
        DataFrame.head = orig_head
    assert out.collect() == baseline


def test_knn_join_engines_agree_at_nondefault_width(spark, embeddings):
    """The geometry parameterization must hold beyond the oracle default:
    at 12 planes (4096 buckets) both engines still produce the identical
    (vec_id, neighbor_id, cosine, knn_rank) set."""
    from cpp_paddle_ocr_spark.operators.similarity import knn_join

    def rows(engine):
        return {
            (r.vec_id, r.neighbor_id, r.cosine, r.knn_rank)
            for r in knn_join(embeddings, engine=engine, n_planes=12).collect()
        }

    got_b = rows("batched")
    got_e = rows("expr")
    assert got_b == got_e
    assert got_b  # 12-plane bucketing still yields candidate pairs here


def _knn_pairs(df):
    return {(r.vec_id, r.neighbor_id) for r in df.collect()}


def test_knn_join_multi_table_recall(spark, embeddings):
    """Multi-table LSH (the classic L-hash-tables recall lever): per-table
    top-k union contains the global top-k over the candidate union, so at a
    fine 12-plane hash adding tables must not lose — and should gain —
    recall vs exact per-row kNN."""
    from pyspark.sql import functions as F

    from cpp_paddle_ocr_spark.operators.similarity import (
        _knn_one_table,
        knn_join,
    )

    # exact ground truth: every row in ONE dense bucket (cap >> n)
    e = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    ).withColumn("key", F.lit(0))
    truth = _knn_pairs(_knn_one_table(e, 5, 10**9, "batched"))

    one = _knn_pairs(knn_join(embeddings, n_planes=12, n_tables=1))
    three = _knn_pairs(knn_join(embeddings, n_planes=12, n_tables=3))
    r1 = len(one & truth) / len(truth)
    r3 = len(three & truth) / len(truth)
    # STRICT gain: with the fixed (non-degenerate) plane family, extra
    # tables probe genuinely different bucketings — pre-round-5 this
    # assertion would fail, since every table hashed identically
    assert r3 > r1, (r1, r3)


def test_knn_join_multi_table_engines_agree(spark, embeddings):
    from cpp_paddle_ocr_spark.operators.similarity import knn_join

    def rows(engine):
        return {
            (r.vec_id, r.neighbor_id, r.cosine, r.knn_rank)
            for r in knn_join(
                embeddings, engine=engine, n_planes=12, n_tables=2
            ).collect()
        }

    assert rows("batched") == rows("expr")


def test_auto_n_planes_formula():
    import math

    from cpp_paddle_ocr_spark.operators.similarity import (
        N_PLANES,
        auto_n_planes,
    )

    # small corpus: sizes DOWN (the whole table fits one bucket's budget)
    assert auto_n_planes(500, 1024) == 1
    assert auto_n_planes(0, 1024) == N_PLANES  # unknown size: oracle default
    big = auto_n_planes(10**12, 1024)
    assert big == math.ceil(math.log2(10**12 / 1024))  # ≈30: 2^30 buckets
    assert auto_n_planes(10**12, 1024) > auto_n_planes(10**9, 1024)
    # occupancy tracks the cap: n/2^planes stays within [cap/2, cap]-ish
    for n in (10**4, 10**6, 10**9):
        p = auto_n_planes(n, 1024)
        assert n / 2**p <= 1024


def test_knn_join_auto_planes_resolves_from_count(spark, embeddings):
    """n_planes='auto' sizes geometry from the corpus row count: results
    equal passing the resolved integer explicitly (pins the resolution
    mechanism; on the small fixture auto sizes DOWN to a coarser hash than
    the 8-plane oracle default, trading pruning for recall)."""
    from cpp_paddle_ocr_spark.operators.similarity import (
        auto_n_planes,
        BUCKET_CAP,
        knn_join,
    )

    resolved = auto_n_planes(embeddings.count(), BUCKET_CAP)
    base = {
        (r.vec_id, r.neighbor_id, r.cosine, r.knn_rank)
        for r in knn_join(embeddings, n_planes=resolved).collect()
    }
    auto = {
        (r.vec_id, r.neighbor_id, r.cosine, r.knn_rank)
        for r in knn_join(embeddings, n_planes="auto").collect()
    }
    assert auto == base


def test_knn_join_ivf_nprobe_recall(spark, embeddings):
    """Per-row IVF multi-probe: probing each row's top-2 lists can only
    widen the candidate union, so recall vs exact kNN must not drop."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from cpp_paddle_ocr_spark.operators.similarity import (
        _knn_one_table,
        knn_join,
    )

    e = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    ).withColumn("key", F.lit(0))
    truth = _knn_pairs(_knn_one_table(e, 5, 10**9, "batched"))

    p1 = _knn_pairs(knn_join(embeddings, method="ivf", nprobe=1))
    p2 = _knn_pairs(knn_join(embeddings, method="ivf", nprobe=2))
    r1 = len(p1 & truth) / len(truth)
    r2 = len(p2 & truth) / len(truth)
    assert r2 >= r1, (r1, r2)
    assert r2 > 0

    with _pytest.raises(ValueError, match="nprobe"):
        knn_join(embeddings, method="lsh", nprobe=2)
    with _pytest.raises(ValueError, match="nprobe"):
        knn_join(embeddings, method="ivf", nprobe=0)


def test_lsh_neardup_multi_table_superset(spark, embeddings):
    """With no over-cap buckets, table 0's pair set is contained in the
    multi-table union, and extra tables can only add verified pairs (every
    emitted pair is exact-cosine-checked, so precision stays 1)."""
    from cpp_paddle_ocr_spark.operators.similarity import lsh_neardup_pairs

    thresh = 0.3  # fixture embeddings are decorrelated; 0.9 yields no pairs
    one = {
        (r.vec_a, r.vec_b)
        for r in lsh_neardup_pairs(embeddings, thresh=thresh, n_planes=12).collect()
    }
    many = {
        (r.vec_a, r.vec_b)
        for r in lsh_neardup_pairs(
            embeddings, thresh=thresh, n_planes=12, n_tables=3
        ).collect()
    }
    assert one <= many
    assert len(many) >= len(one)


def test_plane_family_carries_independent_bits(spark, embeddings):
    """Round-5 regression: the original sign form (i*31 + j*17) % 2 is the
    parity of i+j — ONE hyperplane and its negation for every j, i.e. 2
    occupied buckets at any n_planes, silently nullifying the n_planes /
    multi-table / multi-probe levers. Pin that every plane is distinct,
    none is another's negation, and real data spreads over many buckets."""
    from pyspark.sql import functions as F

    from cpp_paddle_ocr_spark.operators.similarity import (
        DIM,
        _bucket_col,
        _plane_sign,
    )

    pats = [tuple(_plane_sign(i, j) for i in range(DIM)) for j in range(16)]
    assert len(set(pats)) == 16
    negs = {tuple(not b for b in p) for p in pats}
    assert not (set(pats) & negs)
    e = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    ).withColumn("key", _bucket_col("emb", 8))
    n_keys = e.select("key").distinct().count()
    assert n_keys > 10, f"bucket space degenerate: {n_keys} occupied buckets"
