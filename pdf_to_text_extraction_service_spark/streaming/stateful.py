"""Custom stateful streaming operators (applyInPandasWithState).

Two stateful shapes a crawl-ingest stream needs beyond watermarked
dedup:

- ``host_crawl_stats``: per-host running counters (pages seen, bytes,
  last capture ts) maintained across micro-batches with GroupState +
  event-time timeout — the streaming analog of the reference's
  serverMetrics counters (cmd/server/main.go:59-80), keyed by host
  instead of process.
- ``compact_streamed_output``: the batch reconciler for the
  streaming sink — first-arrival-wins within a watermark
  (streaming/stream.py) is reconciled to latest-capture-wins by a
  periodic batch dedup over the accumulated output (the lambda-style
  deployment described in stream.py's docstring).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING, Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ..operators.dedup import dedup_latest

if TYPE_CHECKING:
    import pandas as pd

HOST_STATS_SCHEMA = StructType([
    StructField("host", StringType()),
    StructField("pages", LongType()),
    StructField("bytes", LongType()),
    StructField("batches", IntegerType()),
    StructField("last_ts", TimestampType()),
])

_STATE_SCHEMA = StructType([
    StructField("pages", LongType()),
    StructField("bytes", LongType()),
    StructField("batches", IntegerType()),
])


def _update_host_stats(
    key: tuple, batches: Iterator["pd.DataFrame"], state: GroupState
) -> Iterator["pd.DataFrame"]:
    import pandas as pd

    if state.exists:
        pages, nbytes, nbatches = state.get
    else:
        pages, nbytes, nbatches = 0, 0, 0
    last_ts = None
    for batch in batches:
        pages += len(batch)
        nbytes += int(batch["n_bytes"].sum())
        ts_max = batch["warc_ts"].max()
        if last_ts is None or (ts_max is not None and ts_max > last_ts):
            last_ts = ts_max
    nbatches += 1
    state.update((pages, nbytes, nbatches))
    yield pd.DataFrame({
        "host": [key[0]],
        "pages": [pages],
        "bytes": [nbytes],
        "batches": [nbatches],
        "last_ts": [last_ts],
    })


def host_crawl_stats(pages_stream: DataFrame) -> DataFrame:
    """Streaming per-host running counters.

    Input: a STREAMING pages DataFrame (url, warc_ts, html, ...).
    Output: one updated (host, pages, bytes, batches, last_ts) row per
    host per micro-batch (update output mode).
    """
    hosted = pages_stream.select(
        F.regexp_extract(F.col("url"), r"^[a-z]+://([^/]+)/", 1)
        .alias("host"),
        F.col("warc_ts"),
        F.length(F.col("html")).cast("long").alias("n_bytes"),
    )
    # append output: each micro-batch appends the refreshed state row
    # (parquet sinks can't take update mode; consumers read the
    # highest-`batches` row per host as the current state)
    return hosted.groupBy("host").applyInPandasWithState(
        _update_host_stats,
        outputStructType=HOST_STATS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def compact_streamed_output(streamed: DataFrame) -> DataFrame:
    """Batch reconciliation of the streaming sink: latest-capture-wins
    across everything the stream has appended (including late
    re-captures of a url that first-wins dedup let through on
    different watermark windows)."""
    return dedup_latest(streamed)


_ = Any  # (typing import kept for GroupState annotations)
