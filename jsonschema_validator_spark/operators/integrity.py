"""Referential-integrity checks — the table-scale generalization of
`$ref` resolution-must-succeed (/root/reference/src/keywords/ref_.rs:43:
a fetch failure at compile is an error; here a dangling key at runtime is
a violation row). SURVEY.md §2.4."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def orphans(child: DataFrame, parent: DataFrame, on: str | list[str]) -> DataFrame:
    """Child rows whose key has no parent (left_anti join; Catalyst
    broadcasts the smaller side under AQE)."""
    on = [on] if isinstance(on, str) else on
    return child.join(parent.select(*on).distinct(), on, "left_anti")


def childless(parent: DataFrame, child: DataFrame, on: str | list[str]) -> DataFrame:
    """Parent rows with no children (reverse anti join)."""
    on = [on] if isinstance(on, str) else on
    return parent.join(child.select(*on).distinct(), on, "left_anti")


def conversation_orphans(df: DataFrame, group: str = "conv_id", order: str = "turn_idx") -> DataFrame:
    """Conversations with no turn 0 — the transcripts-native RI rule
    (FIXTURES.md V2): every conv_id group must contain its root turn.
    One aggregation, no join: (group, first_turn)."""
    return (
        df.groupBy(group)
        .agg(F.min(order).alias("first_turn"), F.count(F.lit(1)).alias("n_turns"))
        .filter(F.col("first_turn") != 0)
    )
