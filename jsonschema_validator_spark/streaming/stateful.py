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
    # fire once the watermark passes last activity + idle_timeout.
    # Clamp to just past the CURRENT watermark: when late-but-in-window
    # rows arrive after the watermark has already passed last+idle
    # (batch-timing dependent), Spark rejects a timestamp <= watermark
    # outright — the clamp means "this conversation is already idle,
    # time it out at the next batch", which is the same verdict one
    # batch earlier rather than a query-killing exception.
    wm = state.getCurrentWatermarkMs()
    state.setTimeoutTimestamp(max(last_ms + idle_ms, wm + 1))
    return
    yield  # pragma: no cover — make this a generator


TRANSITION_OUTPUT = (
    "conv_id string, turn_idx long, prev_role string, role string"
)
TRANSITION_STATE = "last_turn long, last_role string"


def _transition_step(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    allowed: frozenset,
) -> Iterable[pd.DataFrame]:
    (conv_id,) = key
    last_turn, last_role = state.get if state.exists else (None, None)
    frames = [p for p in pdfs if len(p)]
    if not frames:
        return
    pdf = pd.concat(frames, ignore_index=True)
    pdf = pdf.sort_values("turn_idx", ignore_index=True)
    prev = pdf["role"].shift(1)
    if last_role is not None:
        prev.iloc[0] = last_role
    edges = prev.fillna("\x02") + "\x01" + pdf["role"]
    bad = pdf[~edges.isin(allowed)]
    state.update((int(pdf["turn_idx"].iloc[-1]), str(pdf["role"].iloc[-1])))
    if len(bad):
        yield pd.DataFrame(
            {
                "conv_id": conv_id,
                "turn_idx": bad["turn_idx"].astype("int64"),
                "prev_role": prev[bad.index].where(prev[bad.index].notna(), None),
                "role": bad["role"],
            }
        )


def transition_screen(
    stream_df: DataFrame,
    allowed: list[tuple[str | None, str]],
) -> DataFrame:
    """Streaming allowed-transition screen — the stateful twin of the
    batch ``operators/conversation.transition_violations``: per
    conversation, every (previous role -> role) step outside ``allowed``
    is emitted as a violation row AS TURNS ARRIVE, with the last
    (turn, role) carried in ``applyInPandasWithState`` state so edges
    spanning micro-batch boundaries are screened exactly like
    within-batch edges (pinned output-identical to the batch operator
    in tests/test_streaming.py).

    Input columns: ``conv_id string, turn_idx numeric, role string``.
    Contract: each conversation's turns arrive in ``turn_idx`` order
    ACROSS batches (within a batch the step sorts); out-of-order
    cross-batch arrival is the caller's watermark/reorder department.
    State is one (long, string) tuple per conversation ever seen — for
    unbounded streams compose with an event-time timeout purge (the
    ``conversation_completeness`` pattern); kept timeout-free here so a
    quiet conversation can never fake a fresh conversation-start edge.
    """
    edges = frozenset(
        (p if p is not None else "\x02") + "\x01" + c for p, c in allowed
    )

    def fn(key, pdfs, state):
        return _transition_step(key, pdfs, state, edges)

    return (
        stream_df.select("conv_id", "turn_idx", "role")
        .groupBy("conv_id")
        .applyInPandasWithState(
            fn,
            outputStructType=TRANSITION_OUTPUT,
            stateStructType=TRANSITION_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


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


LOOP_OUTPUT = "conv_id string, run_start long, run_len long"
LOOP_STATE = "run_start long, run_len long, last_hash long, last_ms long"


def _loop_step(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    min_run: int,
    idle_ms: int,
) -> Iterable[pd.DataFrame]:
    import numpy as np

    (conv_id,) = key
    if state.hasTimedOut:
        run_start, run_len, _last_hash, _last_ms = state.get
        state.remove()
        if run_len >= min_run:
            yield pd.DataFrame(
                {"conv_id": [conv_id], "run_start": [run_start], "run_len": [run_len]}
            )
        return
    frames = [p for p in pdfs if len(p)]
    if not frames:
        return
    pdf = pd.concat(frames, ignore_index=True).sort_values(
        "turn_idx", ignore_index=True
    )
    h = pdf["h"].to_numpy(dtype=np.int64)
    t = pdf["turn_idx"].to_numpy(dtype=np.int64)
    if state.exists:
        run_start, run_len, last_hash, last_ms = state.get
    else:
        run_start, run_len, last_hash, last_ms = None, 0, None, 0

    # run boundaries: a row starts a new run iff its hash differs from
    # its predecessor (the carried last_hash for row 0). Iterate
    # SEGMENTS, not rows — a batch has as many segments as distinct
    # adjacent values; everything between is vectorized numpy.
    change = np.empty(len(h), dtype=bool)
    change[0] = last_hash is None or h[0] != last_hash
    change[1:] = h[1:] != h[:-1]
    starts = np.flatnonzero(change)
    out_starts, out_lens = [], []
    if starts.size == 0:
        # the whole batch extends the carried run: identity unchanged
        run_len += len(h)
    else:
        if change[0]:
            # carried run broken by the batch's first row
            if run_len >= min_run:
                out_starts.append(run_start)
                out_lens.append(run_len)
        else:
            # rows [0, starts[0]) extend the carry, then it breaks
            run_len += int(starts[0])
            if run_len >= min_run:
                out_starts.append(run_start)
                out_lens.append(run_len)
        segs = list(zip(starts, list(starts[1:]) + [len(h)]))
        for idx, (s, e) in enumerate(segs):
            if idx < len(segs) - 1:
                # closed within this batch by its successor segment
                if e - s >= min_run:
                    out_starts.append(int(t[s]))
                    out_lens.append(int(e - s))
            else:
                # the open tail becomes the new carried run
                run_start, run_len, last_hash = int(t[s]), int(e - s), int(h[s])
    last_ms = max(last_ms, int(pdf["ts"].max().value // 1_000_000))
    state.update((run_start, int(run_len), last_hash, last_ms))
    wm = state.getCurrentWatermarkMs()
    state.setTimeoutTimestamp(max(last_ms + idle_ms, wm + 1))
    if out_starts:
        yield pd.DataFrame(
            {
                "conv_id": conv_id,
                "run_start": pd.array(out_starts, dtype="int64"),
                "run_len": pd.array(out_lens, dtype="int64"),
            }
        )


def loop_screen(
    stream_df: DataFrame,
    min_run: int = 3,
    idle_timeout: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming agent-loop screen — the stateful twin of the batch
    ``operators/conversation.repeated_turn_runs``: maximal runs of
    consecutive identical turn content, detected AS TURNS ARRIVE, with
    (run_start, run_len, last_hash) carried in state so a loop spanning
    micro-batch boundaries is measured exactly like a within-batch one.
    A broken run emits immediately; an open run emits when the
    conversation goes idle past ``idle_timeout`` by event time (state
    removed — bounded by in-flight conversations).

    Input columns: ``conv_id string, turn_idx numeric, h long
    (xxhash64 of the turn content — hash UPSTREAM so the payload never
    enters the state store), ts timestamp``. Same in-order-across-
    batches contract as transition_screen.
    """
    unit_ms = {"second": 1_000, "minute": 60_000, "hour": 3_600_000, "day": 86_400_000}
    qty, unit = idle_timeout.split()
    idle_ms = int(qty) * unit_ms[unit.rstrip("s")]

    def fn(key, pdfs, state):
        return _loop_step(key, pdfs, state, min_run, idle_ms)

    src = (
        stream_df.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .select("conv_id", "turn_idx", "h", "ts")
    )
    return src.groupBy("conv_id").applyInPandasWithState(
        fn,
        outputStructType=LOOP_OUTPUT,
        stateStructType=LOOP_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
