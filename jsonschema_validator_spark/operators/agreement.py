"""Inter-annotator agreement — the label-QA gate in front of any
supervised / preference training set: raw percent agreement rewards
raters who both spam the majority class, Cohen's kappa corrects for
exactly that chance agreement, so a kappa floor is the contract you put
on a labeling vendor.

Reference parity note: the reference validator (macisamuele/
jsonschema-validator) has no agreement operators — this belongs to the
training-data-pipeline surface the engine adds on top of keyword
validation (same tier as dedup/sampling/quality in SURVEY.md §2).

Scale: ONE shuffle — ``groupBy(group, a, b).count()`` — reduces the raw
table to the O(groups x k^2) confusion relation; percent agreement,
per-rater marginals, and the chance-agreement dot product are all
derived from that aggregate (never a second corpus pass), so the
operator's cost is one map-side-combinable count at any input size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cohen_kappa(
    df: DataFrame,
    rater_a: str,
    rater_b: str,
    group: str | None = None,
) -> DataFrame:
    """Per-group Cohen's kappa between two categorical label columns.

    Returns (group?, n, po, pe, kappa) where po is observed agreement,
    pe the chance agreement implied by the two raters' marginals, and
    kappa = (po - pe) / (1 - pe). Rows where EITHER label is NULL are
    excluded (an unlabeled item is not a rating, and counting it as a
    sentinel category would manufacture agreement); degenerate groups
    where pe = 1 (both raters constant) yield NULL kappa via
    try_divide rather than a division error.
    """
    gcols = [group] if group else []
    labeled = df.filter(
        F.col(rater_a).isNotNull() & F.col(rater_b).isNotNull()
    )
    cm = labeled.groupBy(
        *gcols,
        F.col(rater_a).cast("string").alias("__a"),
        F.col(rater_b).cast("string").alias("__b"),
    ).agg(F.count(F.lit(1)).alias("__n"))

    # everything below runs on the O(groups x k^2) confusion relation
    totals = cm.groupBy(*gcols).agg(
        F.sum("__n").alias("n"),
        F.sum(F.when(F.col("__a") == F.col("__b"), F.col("__n")).otherwise(0)).alias(
            "__agree"
        ),
    )
    marg_a = cm.groupBy(*gcols, F.col("__a").alias("__c")).agg(
        F.sum("__n").alias("__na")
    )
    marg_b = cm.groupBy(*gcols, F.col("__b").alias("__c")).agg(
        F.sum("__n").alias("__nb")
    )
    chance = (
        marg_a.join(marg_b, [*gcols, "__c"])
        .groupBy(*gcols)
        .agg(F.sum(F.col("__na").cast("double") * F.col("__nb")).alias("__dot"))
    )
    joined = totals.join(chance, gcols) if gcols else totals.crossJoin(chance)
    po = F.col("__agree").cast("double") / F.col("n")
    pe = F.col("__dot") / (F.col("n").cast("double") * F.col("n"))
    return joined.select(
        *gcols,
        "n",
        F.round(po, 6).alias("po"),
        F.round(pe, 6).alias("pe"),
        F.round(F.try_divide(po - pe, F.lit(1.0) - pe), 6).alias("kappa"),
    )
