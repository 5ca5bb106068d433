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


def fleiss_kappa(
    df: DataFrame,
    item: str,
    label: str,
    n_raters: int,
    group: str | None = None,
) -> DataFrame:
    """Per-group Fleiss' kappa over one-row-per-RATING input
    (item, label) — the m-rater generalization of Cohen's kappa for
    labeling pools where each item is rated by ``n_raters`` annotators
    (not necessarily the same ones, which is exactly Fleiss' setting).

    Items whose rating count differs from ``n_raters`` are EXCLUDED and
    counted in n_excluded — Fleiss' P_i is undefined off the fixed-n
    design, and silently mixing counts would skew chance agreement.
    NULL labels are dropped first (an abstention is not a rating), so
    an item with an abstaining rater lands in n_excluded. Degenerate
    groups (all raters unanimous on one category everywhere -> pe = 1)
    yield NULL kappa via try_divide.

    Scale: ONE shuffle to the (group, item, label) count relation;
    P_i, the category marginals p_j, and kappa are all rollups of that
    aggregate. Returns (group?, n_items, n_excluded, pbar, pe, kappa).
    """
    gcols = [group] if group else []
    rated = df.filter(F.col(label).isNotNull())
    c = rated.groupBy(
        *gcols, F.col(item).alias("__i"), F.col(label).cast("string").alias("__l")
    ).agg(F.count(F.lit(1)).alias("__n"))
    per_item = c.groupBy(*gcols, "__i").agg(
        F.sum("__n").alias("__ni"),
        F.sum(F.col("__n") * F.col("__n")).alias("__sq"),
    )
    n = float(n_raters)
    kept = per_item.filter(F.col("__ni") == n_raters).withColumn(
        "__pi", (F.col("__sq") - n) / (n * (n - 1.0))
    )
    pbar = kept.groupBy(*gcols).agg(
        F.count(F.lit(1)).alias("n_items"), F.avg("__pi").alias("__pbar")
    )
    excluded = per_item.filter(F.col("__ni") != n_raters).groupBy(*gcols).agg(
        F.count(F.lit(1)).alias("n_excluded")
    )
    # category marginals over KEPT items only (the design Fleiss assumes)
    kept_counts = c.join(
        kept.select(*gcols, "__i"), [*gcols, "__i"]
    )
    pj = kept_counts.groupBy(*gcols, "__l").agg(F.sum("__n").alias("__cj"))
    pe = pj.groupBy(*gcols).agg(
        F.sum(F.col("__cj") * F.col("__cj")).alias("__sqj"),
        F.sum("__cj").alias("__tot"),
    )
    if gcols:
        joined = pbar.join(pe, gcols).join(excluded, gcols, "left")
    else:
        joined = pbar.crossJoin(pe).join(excluded, F.lit(True), "left")
    pe_col = F.col("__sqj") / (F.col("__tot").cast("double") * F.col("__tot"))
    return joined.select(
        *gcols,
        "n_items",
        F.coalesce(F.col("n_excluded"), F.lit(0)).alias("n_excluded"),
        F.round("__pbar", 6).alias("pbar"),
        F.round(pe_col, 6).alias("pe"),
        F.round(
            F.try_divide(F.col("__pbar") - pe_col, F.lit(1.0) - pe_col), 6
        ).alias("kappa"),
    )
