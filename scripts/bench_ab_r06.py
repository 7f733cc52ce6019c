"""Round-6 A/B harness: old vs new operator implementations, ONE session,
interleaved (old, new) leg pairs, median of per-pair ratios (the repo's
paired-legs methodology — single measurements are worthless on this host,
CLAUDE.md #6).

The OLD forms are copied verbatim from the round-5 tree (git cb30559) so
both plans execute in the same JVM/session back-to-back. Each leg is a
noop-sink write (guide §1.4). Also asserts old and new produce IDENTICAL
rows before timing — an A/B between non-equivalent plans is meaningless.

Usage: python scripts/bench_ab_r06.py [sf_dir] [pairs] [query ...]
"""

from __future__ import annotations

import pathlib
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from cpp_paddle_ocr_spark.operators import (  # noqa: E402
    dedup,
    governance,
    graph,
    text_analysis,
)
from cpp_paddle_ocr_spark.operators.common import load, tokens  # noqa: E402
from cpp_paddle_ocr_spark.session import get_spark  # noqa: E402


# --- OLD implementations (round-5 tree, verbatim shapes) ---------------------


def old_fingerprint(df: DataFrame) -> DataFrame:
    norm = F.regexp_replace(F.lower(F.col("text")), "\\s+", " ")
    win = F.expr(
        "array_min(transform(sequence(1, greatest(length(text) - 15, 1)), "
        "i -> cast(conv(substring(md5(substring(text, i, 16)), 1, 15), 16, 10)"
        " as bigint)))"
    )
    return df.select(
        "doc_id",
        F.md5(norm).alias("fp_md5"),
        win.alias("fp_winnow"),
    )


def old_span_dedup(df: DataFrame, w: int = dedup.SPAN_W) -> DataFrame:
    base = df.filter(F.col("text").isNotNull()).select(
        "doc_id", tokens(F.col("text")).alias("arr")
    )
    toks = base.select(
        "doc_id", F.posexplode("arr").alias("pos0", "tok")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "tok")
    sh = (
        base.filter(F.size("arr") >= w)
        .select(
            "doc_id",
            "arr",
            F.explode(
                F.sequence(F.lit(1), F.size("arr") - (w - 1))
            ).alias("start"),
        )
        .select(
            "doc_id",
            "start",
            F.md5(F.concat_ws(" ", F.slice("arr", F.col("start"), w))).alias(
                "h"
            ),
        )
    )
    keepers = sh.groupBy("h").agg(
        F.count("*").alias("c"),
        F.min(F.struct("doc_id", "start")).alias("k"),
    )
    dups = (
        sh.join(keepers, "h")
        .filter(
            (F.col("c") > 1)
            & ~(
                (F.col("doc_id") == F.col("k.doc_id"))
                & (F.col("start") == F.col("k.start"))
            )
        )
        .select("doc_id", "start")
    )
    covered = dups.select(
        "doc_id",
        F.explode(
            F.sequence(F.col("start"), F.col("start") + (w - 1))
        ).alias("pos"),
    ).distinct()
    marked = toks.join(
        covered.withColumn("cov", F.lit(1)), ["doc_id", "pos"], "left"
    )
    kept_struct = F.when(F.col("cov").isNull(), F.struct("pos", "tok"))
    return marked.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.sum(F.coalesce(F.col("cov"), F.lit(0))).alias("n_removed"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(kept_struct)), lambda x: x.tok
            ),
        ).alias("clean_text"),
    )


def _old_shingled(df: DataFrame, shingle: int) -> DataFrame:
    return (
        df.filter(F.col("text").isNotNull())
        .select("doc_id", tokens(F.col("text")).alias("t"))
        .select(
            "doc_id",
            F.explode(
                F.expr(governance._shingle_expr(shingle))
            ).alias("shingle"),
        )
        .distinct()
    )


def old_decontaminate(
    df: DataFrame,
    shingle: int = governance.SHINGLE,
    eval_pct: int = governance.EVAL_PCT,
) -> DataFrame:
    shingled = _old_shingled(df, shingle)
    bucket = governance._eval_bucket(F.col("doc_id"))
    eval_shingles = (
        shingled.filter(bucket < eval_pct)
        .select("shingle")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    train = shingled.filter(bucket >= eval_pct)
    return governance._contamination_agg(train, eval_shingles)


def old_neardup_increment(
    new_df: DataFrame,
    corpus_df: DataFrame,
    band_cap: int = dedup.BAND_KEY_CAP,
    verify_pct: int = dedup.NEARDUP_VERIFY_PCT,
) -> DataFrame:
    from pyspark.sql import Window

    inc_bands = dedup.minhash_signatures(new_df).select(
        "doc_id", F.explode(dedup._band_keys_col()).alias("band_key")
    )
    cor_bands = dedup.minhash_signatures(corpus_df).select(
        F.col("doc_id").alias("corpus_id"),
        F.explode(dedup._band_keys_col()).alias("band_key"),
    )
    w = Window.partitionBy("band_key")
    cor_kept = (
        cor_bands.select(
            "corpus_id",
            "band_key",
            F.count("*").over(w).alias("n_key"),
            F.min("corpus_id").over(w).alias("anchor"),
        )
        .filter(
            (F.col("n_key") <= band_cap) | (F.col("corpus_id") == F.col("anchor"))
        )
        .select("corpus_id", "band_key")
    )
    cand = (
        inc_bands.join(cor_kept, "band_key")
        .select("doc_id", "corpus_id")
        .distinct()
    )
    inc_toks = new_df.select(
        "doc_id", F.array_distinct(tokens(F.col("text"))).alias("ta")
    )
    cor_toks = corpus_df.select(
        F.col("doc_id").alias("corpus_id"),
        F.array_distinct(tokens(F.col("text"))).alias("tb"),
    )
    inter = F.size(F.array_intersect(F.col("ta"), F.col("tb")))
    union = F.size(F.col("ta")) + F.size(F.col("tb")) - inter
    matches = (
        cand.join(inc_toks, "doc_id")
        .join(cor_toks, "corpus_id")
        .filter(inter * 100 >= union * verify_pct)
        .groupBy("doc_id")
        .agg(F.min("corpus_id").alias("match_id"))
    )
    return (
        new_df.select("doc_id")
        .join(matches, "doc_id", "left")
        .select(
            "doc_id", "match_id", F.col("match_id").isNull().alias("keep")
        )
    )


def old_pagerank(
    edges: DataFrame,
    iters: int = graph.PR_ITERS,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    ).localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    outdeg = e.groupBy("src").agg(F.count("*").alias("deg"))
    weighted = e.join(outdeg, "src").localCheckpoint(eager=True)
    ranks = nodes.withColumn("rank", F.lit(graph.PR_SCALE).cast("long"))
    for _ in range(iters):
        contrib = (
            weighted.join(ranks, weighted.src == ranks.node)
            .select(
                "dst",
                F.expr(
                    f"({graph.PR_DAMP_PCT} * rank) div (100 * deg)"
                ).alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            nodes.join(contrib, nodes.node == contrib.dst, "left")
            .select(
                "node",
                (F.lit(graph.PR_BASE) + F.coalesce(F.col("s"), F.lit(0)))
                .cast("long")
                .alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks


# --- pair registry -----------------------------------------------------------


def _inc_split(spark, sf_dir):
    from cpp_paddle_ocr_spark.operators.common import h60

    docs = load(spark, sf_dir, "documents")
    bucket = F.pmod(h60(F.col("doc_id").cast("string")), F.lit(100))
    return docs.filter(bucket >= 40), docs.filter(bucket < 60)


PAIRS = {
    "fingerprint": (
        lambda s, d: old_fingerprint(load(s, d, "documents")),
        lambda s, d: text_analysis.fingerprint(load(s, d, "documents")),
    ),
    "dedup_spans": (
        lambda s, d: old_span_dedup(load(s, d, "documents")),
        lambda s, d: dedup.span_dedup(load(s, d, "documents")),
    ),
    "decontaminate": (
        lambda s, d: old_decontaminate(load(s, d, "documents")),
        lambda s, d: governance.decontaminate(load(s, d, "documents")),
    ),
    "dedup_neardup_increment": (
        lambda s, d: old_neardup_increment(*_inc_split(s, d)),
        lambda s, d: dedup.neardup_increment(*_inc_split(s, d)),
    ),
    "graph_pagerank": (
        lambda s, d: old_pagerank(graph.crawl_edges(load(s, d, "events"))),
        lambda s, d: graph.pagerank(graph.crawl_edges(load(s, d, "events"))),
    ),
}


def noop(fn, spark, sf_dir) -> float:
    """Timed region includes DataFrame CONSTRUCTION (eager localCheckpoints
    run plan-time jobs there — bench.py times them, so must we)."""
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def rows_equal(a: DataFrame, b: DataFrame) -> bool:
    # names + types only: Spark nullability is plan-shape-dependent and the
    # driver's oracle compare (pandas vs DuckDB) never sees it
    sa = [(f.name, f.dataType) for f in a.schema.fields]
    sb = [(f.name, f.dataType) for f in b.schema.fields]
    if sa != sb:
        print(f"  SCHEMA MISMATCH:\n  old={sa}\n  new={sb}")
        return False
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    if ra != rb:
        n = sum(1 for x, y in zip(ra, rb) if x != y)
        print(f"  ROW MISMATCH: {len(ra)} vs {len(rb)} rows, {n} differing")
        for x, y in list(zip(ra, rb))[:50]:
            if x != y:
                print(f"   old={x}\n   new={y}")
                break
        return False
    return True


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    names = sys.argv[3:] or list(PAIRS)
    spark = get_spark(app_name="ab_r06")
    spark.sparkContext.setLogLevel("ERROR")
    results = {}
    for name in names:
        old_fn, new_fn = PAIRS[name]
        print(f"== {name} ==", flush=True)
        spark.sparkContext.setJobDescription(f"{name}: equivalence")
        if not rows_equal(old_fn(spark, sf_dir), new_fn(spark, sf_dir)):
            print(f"  {name}: NOT EQUIVALENT — skipping timing")
            results[name] = None
            continue
        # warmup both
        spark.sparkContext.setJobDescription(f"{name}: warmup")
        noop(old_fn, spark, sf_dir)
        noop(new_fn, spark, sf_dir)
        ratios, olds, news = [], [], []
        for i in range(n_pairs):
            spark.sparkContext.setJobDescription(f"{name}: old leg {i}")
            t_old = noop(old_fn, spark, sf_dir)
            spark.sparkContext.setJobDescription(f"{name}: new leg {i}")
            t_new = noop(new_fn, spark, sf_dir)
            ratios.append(t_new / t_old)
            olds.append(t_old)
            news.append(t_new)
            print(
                f"  pair {i}: old={t_old:.3f}s new={t_new:.3f}s "
                f"ratio={t_new / t_old:.3f}",
                flush=True,
            )
        med = sorted(ratios)[len(ratios) // 2]
        results[name] = {
            "old": [round(x, 3) for x in olds],
            "new": [round(x, 3) for x in news],
            "median_ratio": round(med, 3),
        }
        print(f"  {name}: median new/old = {med:.3f}")
    print(results)
    spark.stop()


if __name__ == "__main__":
    main()
