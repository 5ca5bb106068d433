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
