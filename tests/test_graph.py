"""Integer PageRank (operators/graph.py): exact agreement with a pure-
Python reference on hand graphs, rank-mass sanity, and hub ordering."""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from cpp_paddle_ocr_spark.operators.graph import (  # noqa: E402
    PR_DAMP_PCT,
    PR_ITERS,
    PR_SCALE,
    pagerank,
)


def py_pagerank(edges, iters=PR_ITERS):
    """Independent pure-Python implementation of the integer update rule."""
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    base = (100 - PR_DAMP_PCT) * PR_SCALE // 100
    rank = {n: PR_SCALE for n in nodes}
    for _ in range(iters):
        nxt = {n: base for n in nodes}
        for s, d in edges:
            nxt[d] += (PR_DAMP_PCT * rank[s]) // (100 * outdeg[s])
        rank = nxt
    return rank


def test_pagerank_matches_python_reference(spark):
    edges = [
        (1, 2), (1, 3), (2, 3), (3, 1), (4, 3), (5, 3), (6, 3), (3, 7),
    ]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {r.node: r.rank for r in pagerank(df).collect()}
    assert got == py_pagerank(edges)


def test_pagerank_hub_outranks_leaves(spark):
    """A node every other node links to must end with the highest rank;
    a dangling leaf keeps only the base term's trickle."""
    edges = [(i, 0) for i in range(1, 9)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {r.node: r.rank for r in pagerank(df).collect()}
    assert got[0] == max(got.values())
    base = (100 - PR_DAMP_PCT) * PR_SCALE // 100
    for leaf in range(1, 9):
        assert got[leaf] == base  # leaves receive nothing after round 1
    assert got == py_pagerank(edges)


def test_pagerank_iters_zero_is_initial_rank(spark):
    df = spark.createDataFrame([(1, 2)], "src bigint, dst bigint")
    got = {r.node: r.rank for r in pagerank(df, iters=0).collect()}
    assert got == {1: PR_SCALE, 2: PR_SCALE}
