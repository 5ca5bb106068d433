"""Snapshot MERGE (upsert/delete) without a table-format engine.

Training corpora are not append-only: documents get re-crawled
(update), taken down (delete), and discovered (insert). Lakehouse
engines spell this MERGE INTO; this operator is the same semantics as
one full-outer equi-join on the key, pure DataFrame algebra, so it
runs on plain parquet snapshots and composes with the repo's
exactly-once sink (plans/runner.py dynamic partition overwrite — at
100 TB, join the changed keys' partition values first and rewrite ONLY
touched partitions, leaving the rest of the snapshot untouched).

Scale shape: one equi-join on the key. Changes are typically orders of
magnitude smaller than the base — AQE picks a broadcast or
shuffled-hash join from the actual size; a whale key cannot exist
(both sides are unique per key by contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OPS = ("upsert", "delete")


def merge_upsert(
    base: DataFrame, changes: DataFrame, key_col: str, op_col: str = "op"
) -> DataFrame:
    """Apply a change set to a snapshot: ``op='upsert'`` replaces the
    base row (or inserts when the key is new), ``op='delete'`` removes
    it (a no-op for unknown keys). Any other op value fails the job
    loudly (distributed raise — no silent row drops).

    Contract: ``changes`` must be unique per key (pre-reduce a CDC
    stream to its latest change per key first — e.g. max-sequence);
    duplicate change keys would make the join fan out and the winner
    nondeterministic. ``changes`` carries the base columns plus
    ``op_col``. NULL keys on the change side match nothing (SQL
    semantics) and are dropped; NULL-key base rows pass through.
    """
    cols = [c for c in base.columns]
    missing = set(cols) - set(changes.columns)
    if missing:
        raise ValueError(f"changes missing base columns: {sorted(missing)}")
    ch = changes.filter(F.col(key_col).isNotNull()).select(
        F.col(key_col).alias("__k"),
        F.when(F.col(op_col).isin(*OPS), F.col(op_col))
        .otherwise(
            F.raise_error(
                F.concat_ws(
                    " ", F.lit("merge_upsert: unknown op"), F.col(op_col).cast("string")
                )
            )
        )
        .alias("__op"),
        F.struct(*[F.col(c) for c in cols]).alias("__new"),
    )
    joined = base.join(ch, base[key_col] == ch["__k"], "full_outer")
    return (
        joined
        # delete rows vanish; unmatched change rows must be upserts
        .filter(F.col("__op").isNull() | (F.col("__op") == "upsert"))
        .select(
            *[
                F.when(F.col("__op") == "upsert", F.col("__new")[c])
                .otherwise(F.col(c))
                .alias(c)
                for c in cols
            ]
        )
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str | list[str],
    compare: list[str],
) -> DataFrame:
    """Row-level diff between two table versions (the audit view behind
    snapdir/Iceberg snapshot lineage — sources/tables.read_table pins
    the versions, this explains what changed between them):
    (key..., change) with change in {'added', 'removed', 'changed'};
    unchanged rows are dropped. Change detection hashes the compared
    columns (xxhash64 over the per-column SAFE-cast strings — one hash arg
    per column, so no concatenation ambiguity), so wide rows compare
    as one long, and the full
    outer join shuffles only (key, hash) — never payloads. NULL compare
    values hash via a sentinel so NULL != '' and NULL-to-value edits
    count as changes."""
    keys = [key] if isinstance(key, str) else list(key)

    def slim(df: DataFrame, tag: str) -> DataFrame:
        h = F.xxhash64(
            *[F.coalesce(F.col(c).cast("string"), F.lit("\x00null")) for c in compare]
        )
        return df.select(*keys, h.alias(f"__h_{tag}"), F.lit(True).alias(f"__in_{tag}"))

    j = slim(old, "old").join(slim(new, "new"), keys, "full_outer")
    change = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(F.col("__h_old") != F.col("__h_new"), F.lit("changed"))
    )
    return j.select(*keys, change.alias("change")).filter(F.col("change").isNotNull())


def snapshot_diff_summary(
    old: DataFrame, new: DataFrame, key: str | list[str], compare: list[str]
) -> DataFrame:
    """(change, n) rollup of snapshot_diff — the one-line answer to
    'what did this commit do to the table'."""
    return (
        snapshot_diff(old, new, key, compare)
        .groupBy("change")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("change")
    )


def scd2_intervals(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_cols: list[str],
) -> DataFrame:
    """Slowly-changing-dimension type-2 construction: turn an
    append-only change log (key, ts, attributes...) into validity
    intervals — the warehouse step between event capture and
    point-in-time joins (asof_join consumes exactly this shape).
    Consecutive records whose tracked attributes are UNCHANGED are
    collapsed first (no-op updates must not split intervals — the
    classic SCD2 bug that multiplies the dimension by the update
    frequency), then each surviving change opens an interval closed by
    the next one; the last interval per key is open (valid_to NULL,
    is_current true).

    Change detection is null-safe per attribute (NULL -> value and
    value -> NULL are real changes; NULL -> NULL is not). Ordering is
    (ts, attributes) per key so exact duplicates collapse
    deterministically; NULL keys or timestamps are excluded.
    valid_from/valid_to are integer epoch microseconds — exact and
    engine-portable where formatted fractional timestamps are not.
    One window pass per step over pre-projected columns. Returns
    (key, value_cols..., valid_from, valid_to, is_current).
    """
    from pyspark.sql import Window

    d = df.filter(
        F.col(key_col).isNotNull() & F.col(ts_col).isNotNull()
    ).select(
        F.col(key_col).alias("__k"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("__ts"),
        *[F.col(c) for c in value_cols],
    )
    w = Window.partitionBy("__k").orderBy("__ts", *value_cols)
    changed = F.lit(False)
    for c in value_cols:
        changed = changed | ~F.col(c).eqNullSafe(F.lag(c).over(w))
    first = F.lag("__ts").over(w).isNull()
    steps = d.withColumn("__chg", first | changed).filter(F.col("__chg"))
    w2 = Window.partitionBy("__k").orderBy("__ts", *value_cols)
    nxt = F.lead("__ts").over(w2)
    return steps.select(
        F.col("__k").alias(key_col),
        *value_cols,
        F.col("__ts").alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )
