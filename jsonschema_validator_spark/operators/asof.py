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
