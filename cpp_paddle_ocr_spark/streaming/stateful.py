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


def dedup_stream(stream_df: DataFrame, ttl_ms: int | None = None) -> DataFrame:
    """First-seen filter over a streaming (url, html, ...) DataFrame.

    Exactly one output row per distinct url across ALL micro-batches; later
    sightings (same batch or later batches) are absorbed into state. Output
    mode must be ``append``/``update``.

    ``ttl_ms`` bounds the state store for unbounded crawls: each key arms a
    processing-time timeout on every sighting; when it fires the key's
    state is REMOVED, so a url re-crawled after the TTL is emitted again —
    the explicit trade between store size and long-horizon dedup recall.
    ``None`` keeps state forever (exact dedup, unbounded store).
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
            first_row["n_seen_before"] = 0
            yield first_row[["url", "html", "n_seen_before"]]

    timeout_conf = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return (
        stream_df.select("url", "html")
        .groupBy("url")
        .applyInPandasWithState(
            first_seen,
            outputStructType=DEDUP_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=timeout_conf,
        )
    )
