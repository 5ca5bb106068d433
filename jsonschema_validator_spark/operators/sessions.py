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


def funnel(
    df: DataFrame,
    group: str,
    ts: str,
    steps: dict,
    within_seconds: int | None = None,
) -> DataFrame:
    """Ordered funnel conversion: for each group (user / session /
    conversation), step i counts only if it happens AT-OR-AFTER the
    group's first occurrence of step i-1 — the "clicked, then
    purchased, then signed up" product question, and for transcript
    tables the "tool call, then tool result, then assistant reply"
    protocol screen. ``steps`` maps step name -> boolean Column.

    Shape: the input projects down to (group, ts, one flag per step)
    once; each stage is a groupBy(group) min-aggregate (partial+final,
    skew-immune — no window over raw rows, no whale-group sort) plus an
    equi-join of the O(groups) timestamp relation back on. k steps cost
    k tiny-relation joins over the SAME projected frame; Catalyst reuses
    the scan via its exchange, and the alternative single-pass
    (collect_list per group, fold in order) puts a whale group's whole
    event list in one reducer — the skew study says don't.

    ``within_seconds`` adds a conversion window: step i must land
    within that many seconds of step i-1's timestamp (inclusive), the
    standard product-analytics attribution cutoff. Time arithmetic is
    exact integer microseconds — engine-portable, no float boundary.

    Output: one row per step (step_idx, step, n_reached,
    conversion_from_prev, conversion_from_first).
    """
    names = list(steps)
    proj = df.select(
        F.col(group).alias("__g"),
        F.unix_micros(F.col(ts).cast("timestamp")).alias("__ts"),
        *[
            F.coalesce(cond, F.lit(False)).alias(f"__s{i}")
            for i, cond in enumerate(steps.values())
        ],
    )
    reached = proj.filter(F.col("__s0")).groupBy("__g").agg(
        F.min("__ts").alias("__t0")
    )
    for i in range(1, len(names)):
        nxt = (
            proj.join(reached, "__g")
            .filter(
                F.col(f"__s{i}")
                & (F.col("__ts") >= F.col(f"__t{i-1}"))
                & (
                    F.lit(True)
                    if within_seconds is None
                    else F.col("__ts")
                    <= F.col(f"__t{i-1}") + F.lit(int(within_seconds) * 1_000_000)
                )
            )
            .groupBy("__g")
            .agg(
                *[F.first(f"__t{j}").alias(f"__t{j}") for j in range(i)],
                F.min("__ts").alias(f"__t{i}"),
            )
        )
        # left join keeps groups that stalled at an earlier step
        reached = reached.join(nxt.select("__g", f"__t{i}"), "__g", "left")
    counts = reached.agg(
        *[
            F.count(F.col(f"__t{i}")).alias(f"__n{i}")
            for i in range(len(names))
        ]
    )
    spark = df.sparkSession
    rows = None
    for i, name in enumerate(names):
        r = counts.select(
            F.lit(i).alias("step_idx"),
            F.lit(name).alias("step"),
            F.col(f"__n{i}").alias("n_reached"),
            F.try_divide(
                F.col(f"__n{i}"), F.col(f"__n{i-1}") if i else F.col("__n0")
            ).alias("conversion_from_prev"),
            F.try_divide(F.col(f"__n{i}"), F.col("__n0")).alias(
                "conversion_from_first"
            ),
        )
        rows = r if rows is None else rows.unionByName(r)
    return rows


def cohort_retention(
    df: DataFrame,
    entity: str = "user_id",
    ts: str = "ts",
    unit_days: int = 7,
) -> DataFrame:
    """Cohort retention triangle: entities are cohorted by their
    first-active period (``floor(days_since_epoch / unit_days)``) and
    counted at every period offset they return in. Returns
    (cohort, offset, n_active, cohort_size, retention) — offset 0 is the
    cohort itself (retention 1.0 by construction).

    Scale: ONE shuffle on the entity key does all the per-entity work —
    ``groupBy(entity).agg(min(period), collect_set(period))`` — because
    the distinct-period set per entity is bounded by the calendar length
    (periods), not by event count, so the collected set stays tiny even
    for whale entities at 10^12 rows. The (cohort, offset) rollup and
    the offset-0 size join then run on a relation whose cardinality is
    O(cohorts * offsets), independent of input size. NULL entities are
    excluded (they are not a trackable cohort member).
    """
    day = F.datediff(F.col(ts).cast("date"), F.lit("1970-01-01").cast("date"))
    period = F.floor(day / F.lit(float(unit_days))).cast("long")
    per_entity = (
        df.filter(F.col(entity).isNotNull() & F.col(ts).isNotNull())
        .select(F.col(entity).alias("__e"), period.alias("__p"))
        .groupBy("__e")
        .agg(F.min("__p").alias("cohort"), F.collect_set("__p").alias("__ps"))
    )
    active = per_entity.select(
        "cohort", F.explode("__ps").alias("__p")
    ).select("cohort", (F.col("__p") - F.col("cohort")).alias("offset"))
    counts = active.groupBy("cohort", "offset").agg(
        F.count(F.lit(1)).alias("n_active")
    )
    sizes = counts.filter(F.col("offset") == 0).select(
        "cohort", F.col("n_active").alias("cohort_size")
    )
    return (
        counts.join(F.broadcast(sizes), "cohort")
        .select(
            "cohort",
            "offset",
            "n_active",
            "cohort_size",
            F.round(F.col("n_active") / F.col("cohort_size"), 6).alias("retention"),
        )
    )


def rfm_segments(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    value_col: str,
    n_tiles: int = 5,
) -> DataFrame:
    """RFM (recency / frequency / monetary) quantile segmentation —
    the classic behavioral-cohort operator: each user scores 1..n per
    dimension by quantile rank (n = best: most recent, most frequent,
    highest spend) and the concatenated code ("555" whales, "155"
    lapsed-but-valuable) drives retention/sampling decisions the raw
    aggregates can't express uniformly across differently-scaled
    dimensions.

    One aggregation reduces rows to the O(users) relation; the three
    ntile windows run over THAT relation only, each ordered by
    (metric, user id) so tie scores are deterministic across runs and
    engines. The windows are global by construction (quantiles are
    corpus-wide) — at whale user counts swap ntile for precomputed
    approx-quantile cutpoints; at the usual "users << events" scale
    the reduced relation is small. NULL users excluded; NULL values
    count 0 toward monetary. Returns (user, recency_us, frequency,
    monetary, r, f, m, segment).
    """
    from pyspark.sql import Window

    agg = (
        df.filter(F.col(user_col).isNotNull())
        .groupBy(F.col(user_col).alias("user"))
        .agg(
            F.max(F.unix_micros(F.col(ts_col).cast("timestamp"))).alias(
                "recency_us"
            ),
            F.count(F.lit(1)).alias("frequency"),
            F.round(
                F.coalesce(F.sum(F.col(value_col).cast("double")), F.lit(0.0)),
                6,
            ).alias("monetary"),
        )
    )
    w_r = Window.orderBy("recency_us", "user")
    w_f = Window.orderBy("frequency", "user")
    w_m = Window.orderBy("monetary", "user")
    scored = (
        agg.withColumn("r", F.ntile(n_tiles).over(w_r))
        .withColumn("f", F.ntile(n_tiles).over(w_f))
        .withColumn("m", F.ntile(n_tiles).over(w_m))
    )
    return scored.withColumn(
        "segment", F.concat_ws("", F.col("r"), F.col("f"), F.col("m"))
    )
