"""Paired sf0.1 ↔ sf1 scaling measurement → BENCH/sf1.json.

One decade of measured input scaling (10x rows per table, gen_sf1.py) for
every benched operator query plus the extract headline. Methodology per
BENCH/BASELINE.md: this host's capacity drifts 2x+ on minute scales, so
isolated per-sf numbers are meaningless — each query runs as interleaved
(sf0.1, sf1) leg PAIRS within one session, and the statistic is the MEDIAN
of per-pair time ratios. A ratio ≤ 10 means the decade costs no more than
the data grew (sublinear/linear); the per-query scaling exponent is
log10(ratio).

Extract runs 2 pairs (costly); operator queries 3 pairs. Everything shares
one JVM — within-session pairing controls JIT state and host drift better
than fresh JVMs would control anything here, and it is the ratio we are
after, not the absolute time (the absolute headline lives in bench.py).

Usage: python scripts/bench_sf1_pairs.py   (requires .benchdata/sf1 from
gen_sf1.py and the 20k/200k extract fixtures from prior bench.py runs —
both are built automatically if absent)
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

from cpp_paddle_ocr_spark.operators import (  # noqa: E402
    clustering,
    corpus,
    dedup,
    governance,
    graph,
    quantize,
    regression,
    relational,
    similarity,
    text_analysis,
)
from cpp_paddle_ocr_spark.operators.extract import extract  # noqa: E402
from cpp_paddle_ocr_spark.session import get_spark  # noqa: E402

SF_SMALL = "/root/testdata/sf0.1"
SF_BIG = str(ROOT / ".benchdata" / "sf1")

#: pass query names as argv to run a subset (results merge into sf1.json)
QUERY_SET = [
    ("dedup_exact", dedup.QUERIES["dedup_exact"]),
    ("dedup_simhash", dedup.QUERIES["dedup_simhash"]),
    ("dedup_minhash", dedup.QUERIES["dedup_minhash"]),
    ("dedup_lsh_pairs", dedup.QUERIES["dedup_lsh_pairs"]),
    ("dedup_spans", dedup.QUERIES["dedup_spans"]),
    ("winnow_sketch", dedup.QUERIES["winnow_sketch"]),
    ("dedup_clusters", clustering.QUERIES["dedup_clusters"]),
    ("sim_cosine_topk", similarity.QUERIES["sim_cosine_topk"]),
    ("sim_lsh_ann", similarity.QUERIES["sim_lsh_ann"]),
    ("sim_ivf_ann", similarity.q_ivf_ann_batched),
    ("sim_knn_join", similarity.q_knn_join_batched),
    ("sim_semantic_clusters", clustering.q_semantic_clusters_batched),
    ("lang_id", text_analysis.QUERIES["lang_id"]),
    ("quality_score", text_analysis.QUERIES["quality_score"]),
    ("token_count", text_analysis.QUERIES["token_count"]),
    ("fingerprint", text_analysis.QUERIES["fingerprint"]),
    ("corpus_keep", corpus.QUERIES["corpus_keep"]),
    ("repetition_stats", text_analysis.QUERIES["repetition_stats"]),
    ("chunk_documents", text_analysis.QUERIES["chunk_documents"]),
    ("hash_sample", text_analysis.QUERIES["hash_sample"]),
    ("status_agg", relational.QUERIES["status_agg"]),
    ("overlap_iou", relational.QUERIES["overlap_iou"]),
    ("term_stats", text_analysis.QUERIES["term_stats"]),
    ("vocab_topk", text_analysis.QUERIES["vocab_topk"]),
    ("lm_score", text_analysis.QUERIES["lm_score"]),
    ("tfidf_topterms", text_analysis.QUERIES["tfidf_topterms"]),
    ("emb_quantize_report", quantize.QUERIES["emb_quantize_report"]),
    ("sim_knn_multitable", similarity.q_knn_join_multitable_batched),
    ("domain_stats", governance.QUERIES["domain_stats"]),
    ("domain_cap", governance.QUERIES["domain_cap"]),
    ("decontaminate", governance.QUERIES["decontaminate"]),
    ("pack_chunks", governance.QUERIES["pack_chunks"]),
    ("pii_redact", governance.QUERIES["pii_redact"]),
    ("url_canonical", governance.QUERIES["url_canonical"]),
    ("graph_pagerank", graph.QUERIES["graph_pagerank"]),
    ("crawl_schedule", graph.QUERIES["crawl_schedule"]),
    ("revisit_latest", relational.QUERIES["revisit_latest"]),
    ("quality_fit", regression.QUERIES["quality_fit"]),
    ("quality_fit_predict", regression.QUERIES["quality_fit_predict"]),
    ("temperature_sample", text_analysis.QUERIES["temperature_sample"]),
    ("dedup_increment", dedup.QUERIES["dedup_increment"]),
    ("dedup_neardup_increment", dedup.QUERIES["dedup_neardup_increment"]),
    ("corpus_stats", corpus.QUERIES["corpus_stats"]),
    # sf-dependent remainder of the bench surface (the fixed-fixture legs —
    # staged extract, media meta, layout — have no input decade to measure)
    ("broadcast_join_agg", relational.QUERIES["broadcast_join_agg"]),
    ("doc_order_sort", relational.QUERIES["doc_order_sort"]),
    ("threshold_filter", relational.QUERIES["threshold_filter"]),
    ("topk_per_group", relational.QUERIES["topk_per_group"]),
    ("window_dedup", relational.QUERIES["window_dedup"]),
    ("dedup_ngram_jaccard", dedup.QUERIES["dedup_ngram_jaccard"]),
    ("dedup_embedding_neardup", dedup.QUERIES["dedup_embedding_neardup"]),
    ("mix_weights", text_analysis.QUERIES["mix_weights"]),
    ("lm_filter", text_analysis.QUERIES["lm_filter"]),
]

N_PAIRS = 3
N_EXTRACT_PAIRS = 2


def _run(fn, spark, sf_dir: str) -> float:
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def _extract_leg(spark, fixture: str) -> float:
    out = str(ROOT / ".benchdata" / "out_pairs")
    shutil.rmtree(out, ignore_errors=True)
    docs = spark.read.parquet(fixture)
    t0 = time.perf_counter()
    extract(docs).write.mode("overwrite").parquet(out)
    return time.perf_counter() - t0


def main() -> None:
    import bench as benchmod

    subset = set(sys.argv[1:])
    unknown = subset - {n for n, _ in QUERY_SET}
    if unknown:
        # fail BEFORE get_spark/fixture work: a typo'd name would otherwise
        # burn minutes, measure nothing, and still rewrite sf1.json
        raise SystemExit(f"unknown query names: {sorted(unknown)}")
    query_set = (
        [(n, f) for n, f in QUERY_SET if n in subset] if subset else QUERY_SET
    )

    spark = get_spark(app_name="bench_sf1_pairs")
    spark.sparkContext.setLogLevel("ERROR")

    fix_small = benchmod.ensure_fixture(spark, 20_000)
    fix_big = benchmod.ensure_fixture(spark, 200_000)
    # all three markers: a partially generated dir (interrupted gen_sf1)
    # must be repaired, not trusted 45 minutes into the measurement loop
    if not all(
        pathlib.Path(SF_BIG, f"{t}.parquet", "_SUCCESS").exists()
        for t in ("documents", "embeddings", "events", "orders", "customer", "nation")
    ):
        import gen_sf1

        gen_sf1.generate_sf1(spark)

    results: dict[str, dict] = {}

    # warmup: one throwaway leg of each query at BOTH scales — sf0.1-only
    # warmup left the sf1 partition count's python-worker spinup (~5 s,
    # CLAUDE.md #12) inside the first measured sf1 leg (the round-4
    # sim_ivf_ann 9.88 cold-leg artifact)
    for name, fn in query_set:
        _run(fn, spark, SF_SMALL)
        _run(fn, spark, SF_BIG)

    for name, fn in query_set:
        pairs = []
        for _ in range(N_PAIRS):
            t_small = _run(fn, spark, SF_SMALL)
            t_big = _run(fn, spark, SF_BIG)
            pairs.append((round(t_small, 3), round(t_big, 3)))
        ratios = [b / s for s, b in pairs]
        results[name] = {
            "pairs_s": pairs,
            "ratio_median": round(statistics.median(ratios), 3),
        }
        print(name, results[name], flush=True)

    if not subset:  # extract legs only in full runs (too costly per subset)
        pairs = []
        for _ in range(N_EXTRACT_PAIRS):
            t_small = _extract_leg(spark, fix_small)
            t_big = _extract_leg(spark, fix_big)
            pairs.append((round(t_small, 3), round(t_big, 3)))
        ratios = [b / s for s, b in pairs]
        results["extract_pipeline"] = {
            "pairs_s": pairs,
            "ratio_median": round(statistics.median(ratios), 3),
        }
        print("extract_pipeline", results["extract_pipeline"], flush=True)

    target = ROOT / "BENCH" / "sf1.json"
    partial = False
    if subset and target.exists():
        prior = json.loads(target.read_text())
        prior["queries"].update(results)
        results = prior["queries"]
    elif subset:
        partial = True  # no prior file to merge into: say so in the output
    out = {
        "metric": "sf0.1->sf1 paired wall-time ratio (10x input rows)",
        "method": (
            f"interleaved (sf0.1, sf1) leg pairs in one session, median of "
            f"per-pair ratios; {N_PAIRS} pairs/query, {N_EXTRACT_PAIRS} "
            f"extract pairs (20k vs 200k docs); warmup leg per query"
        ),
        "linear_bound": 10.0,
        "queries": results,
    }
    if partial:
        out["partial"] = sorted(subset)
    (ROOT / "BENCH" / "sf1.json").write_text(json.dumps(out, indent=1))
    print("wrote BENCH/sf1.json")
    spark.stop()


if __name__ == "__main__":
    main()
