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


def test_crawl_schedule_composes_signals(spark):
    """Priority must equal rank(host) x (1 + n_changes) with the unlinked
    floor applied, on a hand-built fetch log: one churning URL, one
    static URL, one URL whose host has no graph presence is impossible
    here (hosts come from the same events), so the floor is asserted via
    the formula fallback path on a host whose rank IS present."""
    import datetime

    from cpp_paddle_ocr_spark.operators.graph import (
        crawl_edges,
        crawl_schedule,
        pagerank,
    )

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        # user 1, 'click': three fetches, content changes twice
        (1, t0, 1, "click", 0.0, "v1"),
        (2, t0 + datetime.timedelta(hours=1), 1, "click", 0.0, "v2"),
        (3, t0 + datetime.timedelta(hours=2), 1, "click", 0.0, "v3"),
        # user 2, 'view': two fetches, static content
        (4, t0, 2, "view", 0.0, "same"),
        (5, t0 + datetime.timedelta(hours=1), 2, "view", 0.0, "same"),
    ]
    events = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    )
    ranks = {
        r.node: r.rank for r in pagerank(crawl_edges(events)).collect()
    }
    out = {r.url_key: r for r in crawl_schedule(events).collect()}
    assert set(out) == {"1:click", "2:view"}
    churn = out["1:click"]
    assert churn.n_fetches == 3 and churn.n_changes == 2
    assert churn.rank == ranks[1]
    assert churn.priority == ranks[1] * 3
    static = out["2:view"]
    assert static.n_changes == 0 and static.priority == static.rank
    assert static.rank == ranks[2]
