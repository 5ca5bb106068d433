"""Row-level parity between two tables keyed by (conv_id, turn_idx) —
the `input_hint` invariant: per-turn text equality under stable
(conv_id, turn_idx) ordering. Generalized to any key/column set.

One full-outer join on the keys, comparing xxhash64 of each payload
column (hash compare: the join never moves the payload bytes twice,
and at 10^12 turns the shuffle carries 8-byte hashes, not text).
SURVEY.md §2.4 "Per-turn text equality vs oracle"."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def row_parity(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    columns: list[str],
) -> DataFrame:
    """Per-key parity rows: (keys..., status, differing_columns) where
    status in {'ok', 'differs', 'left_only', 'right_only'}.

    Keys are assumed unique per side (dedupe first if not — a duplicate
    key would fan out the join)."""
    lh = left.select(
        *keys, *[F.xxhash64(F.col(c)).alias(f"__l_{c}") for c in columns],
        F.lit(1).alias("__l"),
    )
    rh = right.select(
        *keys, *[F.xxhash64(F.col(c)).alias(f"__r_{c}") for c in columns],
        F.lit(1).alias("__r"),
    )
    j = lh.join(rh, keys, "full_outer")
    diff_cols = F.array_compact(
        F.array(
            *[
                F.when(
                    ~F.col(f"__l_{c}").eqNullSafe(F.col(f"__r_{c}")), F.lit(c)
                )
                for c in columns
            ]
        )
    )
    status = (
        F.when(F.col("__l").isNull(), F.lit("right_only"))
        .when(F.col("__r").isNull(), F.lit("left_only"))
        .when(F.size(diff_cols) > 0, F.lit("differs"))
        .otherwise(F.lit("ok"))
    )
    return j.select(
        *keys,
        status.alias("status"),
        F.when(status == "differs", F.array_join(diff_cols, ","))
        .otherwise(F.lit(""))
        .alias("differing_columns"),
    )


def parity_summary(parity: DataFrame) -> DataFrame:
    """(status, n) counts from a row_parity frame — the one-line verdict
    ('all ok' means the row-level invariant holds)."""
    return parity.groupBy("status").agg(F.count(F.lit(1)).alias("n"))
