"""As-of (most-recent-at-or-before) join — the temporal enrichment
operator Spark's built-in join set lacks: for each left row, attach the
right row with the greatest right-time <= left-time within the same
key. The classic "which promotion/price/model-version was live when
this event happened" lookup.

Spark-first construction (no Pandas, no per-row Python): UNION the two
sides into one relation tagged (key, t, side), sort-partition it once
on the key, and carry the latest right payload forward with
last(ignorenulls=True) over rows-unbounded-preceding — i.e. exactly the
single sort-merge pass a native as-of join would do. One exchange, one
sort; the right payload rides as a struct so the window state is one
value regardless of payload width.

Skew note: a whale key sorts in one task (the same bound as any
sort-merge as-of). If one key dominates, pre-split by coarse time range
(salt on floor(t / W), run the join per slice with the previous slice's
last right row appended) — documented, not defaulted, because event
streams keyed by user/conversation are rarely whale-skewed the way
group-bys are.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str | list[str],
    point_time: str,
    start: str,
    end: str,
    granule_seconds: int = 3600,
    max_granules: int = 1 << 14,
) -> DataFrame:
    """Interval-containment join: every (point, interval) pair with the
    same key(s) and ``start <= point_time <= end`` (both ends
    inclusive, like SQL BETWEEN). The "which events fell inside this
    incident / promotion / maintenance window" join.

    Spark-first construction: a raw theta-join (`ON key AND t BETWEEN
    s AND e`) sort-merges on the key alone and post-filters, so a hot
    key generates |points_k| x |intervals_k| candidate pairs before the
    range predicate prunes — per-key quadratic, the classic range-join
    melt. Here time is bucketed into fixed granules: each interval
    explodes to the granules it covers (span/granule + 1 rows, bounded
    by ``max_granules`` — enforced DISTRIBUTED via a per-row assert, no
    driver action), each point maps to exactly ONE granule, and the
    join becomes a pure equi-join on (keys..., granule) + residual
    BETWEEN. Candidate pairs are only temporal neighbors; AQE can
    split a still-hot (key, granule). A (point, interval) pair meets in
    exactly one granule — the point's own — so no distinct/dedup pass
    is needed after the join.

    ``granule_seconds`` trades interval duplication (long intervals ->
    many granule rows) against candidate density (coarse granules ->
    more non-matching pairs surviving to the residual filter); set it
    near the typical interval length. Inner join: non-contained points
    drop. NULL keys / NULL or inverted bounds match nothing.
    ``intervals``' non-key columns (including ``start``/``end``) become
    the attached payload and must not collide with point column names.
    """
    keys = [on] if isinstance(on, str) else list(on)
    payload = [c for c in intervals.columns if c not in keys]
    clash = set(payload) & set(points.columns)
    if clash:
        raise ValueError(
            f"interval payload columns collide with points: {sorted(clash)} — "
            "alias the interval side's columns first"
        )
    reserved = {"__g", "__iv"} & set(points.columns)
    if reserved:
        raise ValueError(
            f"points contains reserved range_join columns: {sorted(reserved)} — "
            "rename them first"
        )
    gus = int(granule_seconds) * 1_000_000

    def _micros(c: str):
        # unix_micros rejects TIMESTAMP_NTZ (parquet default); the cast
        # is a fixed session-tz reinterpretation — engine-internal only,
        # the granule index never leaves the plan
        return F.unix_micros(F.col(c).cast("timestamp"))

    key_ok = F.lit(True)
    for k in keys:
        key_ok = key_ok & F.col(k).isNotNull()
    g_start = F.floor(_micros(start) / F.lit(gus))
    g_end = F.floor(_micros(end) / F.lit(gus))
    iv = (
        intervals.filter(
            key_ok
            & F.col(start).isNotNull()
            & F.col(end).isNotNull()
            & (F.col(start) <= F.col(end))
        )
        .select(
            *keys,
            F.struct(*[F.col(c) for c in payload]).alias("__iv"),
            F.explode(
                F.sequence(
                    g_start,
                    # distributed span guard: a single over-long interval
                    # fails the job loudly instead of OOMing an executor
                    F.when(
                        g_end - g_start < max_granules, g_end
                    ).otherwise(
                        F.raise_error(
                            F.concat(
                                F.lit(
                                    "range_join: interval span exceeds "
                                    f"max_granules={max_granules} at "
                                    f"granule_seconds={granule_seconds}; "
                                    "raise granule_seconds or max_granules"
                                )
                            )
                        ).cast("long")
                    ),
                )
            ).alias("__g"),
        )
    )
    p2 = points.withColumn(
        "__g", F.floor(F.unix_micros(F.col(point_time).cast("timestamp")) / F.lit(gus))
    )
    joined = p2.join(iv, [*keys, "__g"]).filter(
        (F.col(point_time) >= F.col("__iv")[start])
        & (F.col(point_time) <= F.col("__iv")[end])
    )
    return joined.select(
        *points.columns, *[F.col("__iv")[c].alias(c) for c in payload]
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_time: str,
    right_time: str,
) -> DataFrame:
    """Backward as-of LEFT join: every left row, plus the right row with
    the greatest ``right_time`` <= ``left_time`` for the same key(s)
    (NULL payload when none exists — rows never drop).

    ``right``'s non-key columns (including ``right_time``) become the
    attached payload and must not collide with left column names —
    alias them first (e.g. ``ts`` -> ``purchase_ts``). For deterministic
    output, ``right`` must be unique per (key, right_time): pre-reduce
    duplicates (e.g. max id per key+time), otherwise which same-time row
    wins depends on sort-tie order.

    Ties at equal time are INCLUSIVE: a right row at exactly
    ``left_time`` matches (right sorts before left at the same
    timestamp). Left rows with NULL time match nothing; right rows with
    NULL time are dropped (can never match). NULL join keys follow SQL
    equi-join semantics: they never match each other — right NULL-key
    rows are dropped, left NULL-key rows pass through unmatched.
    """
    keys = [on] if isinstance(on, str) else list(on)
    payload = [c for c in right.columns if c not in keys]
    clash = set(payload) & set(left.columns)
    if clash:
        raise ValueError(
            f"right payload columns collide with left: {sorted(clash)} — "
            "alias the right side's columns first"
        )
    reserved = {"__t", "__side", "__rv", "__m"} & set(left.columns)
    if reserved:
        raise ValueError(
            f"left contains reserved asof_join columns: {sorted(reserved)} — "
            "rename them first"
        )

    # SQL equi-join semantics: a NULL key matches nothing, so right rows
    # with any NULL key are dropped (a left NULL-key row then sits alone
    # in its window partition and stays unmatched, as a LEFT join would)
    right_key_ok = F.lit(True)
    for k in keys:
        right_key_ok = right_key_ok & F.col(k).isNotNull()
    r2 = right.filter(right_key_ok & F.col(right_time).isNotNull()).select(
        *keys,
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        F.struct(*[F.col(c) for c in payload]).alias("__rv"),
    )
    l2 = left.select(
        *left.columns,
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),
    )
    u = l2.unionByName(r2, allowMissingColumns=True)
    # right (side 0) sorts before left (side 1) at equal __t -> inclusive
    w = (
        Window.partitionBy(*keys)
        .orderBy("__t", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn("__m", F.last("__rv", ignorenulls=True).over(w))
    return matched.filter(F.col("__side") == 1).select(
        *left.columns, *[F.col("__m")[c].alias(c) for c in payload]
    )
