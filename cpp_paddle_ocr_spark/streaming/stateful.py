"""Custom stateful streaming operator: cross-batch first-seen URL dedup.

The batch engine's ``dedup_exact`` is a hash-groupBy; its streaming analog
needs per-key STATE that survives micro-batches — a re-crawled url arriving
three epochs later must still be recognized as a duplicate. This is the
``applyInPandasWithState`` shape (Arrow-batched grouped state, the
"custom stateful operator" path of Structured Streaming): state key = url,
state value = how many times seen; a row is emitted only on first sight.

Reference lineage: the service dedups nothing (every request is processed),
but its per-worker FIFO + atomic counters (``src/ocr_ipc_service.cpp:
438-448``) are the same shape — keyed mutable state advanced per request.
Here the key is the url and the state store is Spark's checkpointed one,
so the dedup survives restarts exactly like the batch lineage/resume path.

Scale shape at 10^12 rows: state is partitioned by the groupBy key (url),
i.e. sharded across executors by hash — no single-node state bottleneck;
per-key state is one long. The store is bounded via ``ttl_ms``
(``GroupStateTimeout.ProcessingTimeTimeout``): expiry removes the key, so
re-crawls after the TTL re-emit — store size traded against long-horizon
dedup recall.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DEDUP_OUT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("n_seen_before", T.LongType(), False),
    ]
)

_STATE_SCHEMA = T.StructType([T.StructField("seen", T.LongType(), False)])


def first_seen_stream(
    df: DataFrame,
    key_col: str,
    out_cols: list[str],
    out_schema: T.StructType,
    ttl_ms: int | None = None,
    extra_cols: dict[str, object] | None = None,
) -> DataFrame:
    """Generic cross-batch first-seen filter: one output row per distinct
    ``key_col`` value across ALL micro-batches; later sightings (same
    batch or later) are absorbed into state.

    The delicate stateful semantics (timeout expiry removes the key and
    emits nothing; the timeout re-arms on EVERY sighting; seen-count
    survives batches) live in exactly one place — `dedup_stream` and
    `curation.curate_stream` are both instantiations of this.

    ``ttl_ms`` bounds the state store for unbounded crawls via
    ``ProcessingTimeTimeout``: expiry removes the key, so a re-sighting
    after the TTL is emitted again — store size traded against
    long-horizon dedup recall. ``None`` keeps state forever.
    """

    def first_seen(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()  # TTL expiry: forget the key, emit nothing
            return
        seen = state.get[0] if state.exists else 0
        first_row = None
        for pdf in pdfs:
            if first_row is None and len(pdf) and seen == 0:
                first_row = pdf.iloc[[0]].copy()
            seen += len(pdf)
        state.update((seen,))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)  # re-arm on every sighting
        if first_row is not None:
            for name, value in (extra_cols or {}).items():
                first_row[name] = value
            yield first_row[out_cols]

    timeout_conf = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return df.groupBy(key_col).applyInPandasWithState(
        first_seen,
        outputStructType=out_schema,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout_conf,
    )


def dedup_stream(stream_df: DataFrame, ttl_ms: int | None = None) -> DataFrame:
    """First-seen filter over a streaming (url, html, ...) DataFrame —
    the url-keyed instantiation of ``first_seen_stream`` (see there for
    the state/TTL semantics)."""
    return first_seen_stream(
        stream_df.select("url", "html"),
        key_col="url",
        out_cols=["url", "html", "n_seen_before"],
        out_schema=DEDUP_OUT_SCHEMA,
        ttl_ms=ttl_ms,
        extra_cols={"n_seen_before": 0},
    )
