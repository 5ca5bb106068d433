"""Gap-based sessionization — assign events to sessions separated by
inactivity gaps (the batch analog of Structured Streaming's
``session_window``; for streams use
``F.session_window(ts, gap)`` directly, same semantics).

Scale notes: ONE shuffle by the session key (the window partition), and
every downstream per-session aggregate reuses that partitioning. The
key is the user/conversation id — high cardinality, so the window shard
per key is bounded by one entity's events (the input_hint's
conversation-scoped layout); for per-row attribution over a pathological
whale entity see the duplicate_rows_join pattern (bench.py skew
section). Timestamp math is exact integer microseconds (unix_micros),
no float drift."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F



def _micros(ts: str):
    """Exact integer microseconds. Parquet TIMESTAMP_NTZ casts through
    the session timezone; the fixed offset cancels in every gap/duration
    difference, and absolute values are only compared to each other."""
    return F.unix_micros(F.col(ts).cast("timestamp"))

def sessionize(
    df: DataFrame,
    entity: str = "user_id",
    ts: str = "ts",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Adds ``session_idx`` (0-based per entity, ordered by ts): a new
    session starts when the gap since the previous event exceeds
    ``gap_seconds``. Ties on ts break by the full ordering of the
    window (stable given distinct ts per entity)."""
    w = Window.partitionBy(entity).orderBy(ts)
    prev_us = F.lag(_micros(ts)).over(w)
    new_session = (
        prev_us.isNull()
        | (_micros(ts) - prev_us > gap_seconds * 1_000_000)
    ).cast("long")
    running = Window.partitionBy(entity).orderBy(ts).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return df.withColumn("session_idx", F.sum(new_session).over(running) - 1)


def session_stats(
    df: DataFrame,
    entity: str = "user_id",
    ts: str = "ts",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Per-session rollup: (entity, session_idx, n_events,
    session_start, session_end, duration_secs)."""
    s = sessionize(df, entity, ts, gap_seconds)
    return s.groupBy(entity, "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts).alias("session_start"),
        F.max(ts).alias("session_end"),
        (
            (F.unix_micros(F.max(ts).cast("timestamp")) - F.unix_micros(F.min(ts).cast("timestamp"))) / 1_000_000.0
        ).alias("duration_secs"),
    )
