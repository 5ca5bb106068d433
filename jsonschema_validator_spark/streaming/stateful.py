"""Custom stateful streaming operator: conversation completeness via
``applyInPandasWithState``.

A conversation is only checkable once it stops growing — a batch
engine sees the whole table, a stream never does. This operator keeps
per-``conv_id`` state (turn count, min/max turn index, last event time)
and emits ONE completeness verdict per conversation when its group
times out: no new turns arrived before the event-time watermark passed
``idle_timeout`` beyond the conversation's last activity.

Verdict fields mirror the batch ordering/density semantics
(operators/ordering.py `density`): has_root (min turn == 0) and dense
(max - min + 1 == n, duplicate-free approximation bounded state can
afford — exact per-turn dedup belongs to streaming_dedup upstream).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "conv_id string, n_turns long, min_turn long, max_turn long, "
    "has_root boolean, dense boolean"
)
STATE_SCHEMA = "n long, mn long, mx long, last_ms long"


def _step(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    idle_ms: int,
) -> Iterable[pd.DataFrame]:
    (conv_id,) = key
    if state.hasTimedOut:
        n, mn, mx, _ = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "conv_id": [conv_id],
                "n_turns": [n],
                "min_turn": [mn],
                "max_turn": [mx],
                "has_root": [mn == 0],
                "dense": [mx - mn + 1 == n],
            }
        )
        return
    n, mn, mx, last_ms = state.get if state.exists else (0, None, None, 0)
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        t = pdf["turn_idx"]
        n += len(pdf)
        mn = int(t.min()) if mn is None else min(mn, int(t.min()))
        mx = int(t.max()) if mx is None else max(mx, int(t.max()))
        last_ms = max(last_ms, int(pdf["ts"].max().value // 1_000_000))
    state.update((n, mn, mx, last_ms))
    # fire once the watermark passes last activity + idle_timeout
    state.setTimeoutTimestamp(last_ms + idle_ms)
    return
    yield  # pragma: no cover — make this a generator


def conversation_completeness(
    stream_df: DataFrame,
    idle_timeout: str = "1 hour",
    watermark: str = "2 hours",
    group: str = "conv_id",
    order: str = "turn_idx",
    ts_col: str = "ts",
) -> DataFrame:
    """Emit one completeness verdict per conversation once it has been
    idle past ``idle_timeout`` (by event time). Bounded state: one small
    tuple per in-flight conversation; closed conversations leave state."""
    unit_ms = {"second": 1_000, "minute": 60_000, "hour": 3_600_000, "day": 86_400_000}
    qty, unit = idle_timeout.split()
    idle_ms = int(qty) * unit_ms[unit.rstrip("s")]

    def fn(key, pdfs, state):
        return _step(key, pdfs, state, idle_ms)

    src = (
        stream_df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        .withWatermark(ts_col, watermark)
        .select(group, order, ts_col)
    )
    return src.groupBy(group).applyInPandasWithState(
        fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
