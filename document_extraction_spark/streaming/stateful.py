"""Custom stateful streaming operator: per-conversation running statistics
via ``applyInPandasWithState`` (SURVEY.md §2.3 "custom stateful operators").

Tracks, per ``conv_id``: turns seen, bytes seen, max ``turn_idx`` — the
streaming analogue of the batch lineage metrics. State times out after
``STATE_TTL_MS`` of event inactivity (processing-time timeout keeps the
state store bounded at 10^12-turn scale: finished conversations age out)."""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_turns", T.LongType()),
        T.StructField("bytes_seen", T.LongType()),
        T.StructField("max_turn_idx", T.IntegerType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("n_turns", T.LongType()),
        T.StructField("bytes_seen", T.LongType()),
        T.StructField("max_turn_idx", T.IntegerType()),
    ]
)

STATE_TTL_MS = 60 * 60 * 1000  # 1h inactivity -> state eviction


def _update(
    key: tuple[str], pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (conv_id,) = key
    if state.hasTimedOut:
        # idle conversation: evict (bounds the state store at 10^12-turn
        # scale) and emit nothing — no re-arm, no duplicate output row
        state.remove()
        return
    n_turns, bytes_seen, max_idx = (
        state.get if state.exists else (0, 0, -1)
    )
    for pdf in pdfs:
        n_turns += len(pdf)
        # utf-8 byte count, matching the batch pipeline's bytes_in metric
        bytes_seen += int(pdf["text"].fillna("").str.encode("utf-8").str.len().sum())
        if len(pdf):
            max_idx = max(max_idx, int(pdf["turn_idx"].max()))
    state.update((n_turns, bytes_seen, max_idx))
    state.setTimeoutDuration(STATE_TTL_MS)
    yield pd.DataFrame(
        {
            "conv_id": [conv_id],
            "n_turns": [n_turns],
            "bytes_seen": [bytes_seen],
            "max_turn_idx": [max_idx],
        }
    )


def conversation_stats_stream(sdf: DataFrame) -> DataFrame:
    """Streaming per-conversation running stats (update mode)."""
    from document_extraction_spark.session import ensure_worker_package

    ensure_worker_package(sdf.sparkSession)
    return (
        sdf.select("conv_id", "turn_idx", "text")
        .groupBy("conv_id")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
