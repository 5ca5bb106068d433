"""Privacy screens over quasi-identifier combinations — k-anonymity
(every quasi-identifier combination must be shared by >= k rows, else
the rows are re-identifiable) and l-diversity (each combination must
also span >= l distinct sensitive values, else membership alone leaks
the sensitive attribute). The release-gate companion to the PII text
scrubber (operators/pii.py): pii.py removes identifiers from
payloads, these screens verify the structured columns don't
re-identify anyway.

Reference parity note: outside the reference validator's scope
(macisamuele/jsonschema-validator validates keywords); this is the
validation tier of SURVEY.md §2.

Scale shape: ONE groupBy over the quasi-identifier tuple per screen —
count plus (for diversity) count(DISTINCT sensitive) in the same
aggregation; no windows, no joins. NULL quasi-identifier values are a
real (and maximally common) equivalence class, so they group as
values via a null-safe struct key rather than being dropped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def k_anonymity(
    df: DataFrame,
    quasi: list[str],
    k: int = 5,
    sensitive: str | None = None,
    l: int = 2,
) -> DataFrame:
    """Equivalence-class audit over the ``quasi`` column tuple.

    Returns one row per quasi-identifier combination: the quasi
    columns themselves, ``class_size``, ``k_violation`` (class_size
    < k), and — when ``sensitive`` is given — ``n_sensitive``
    (distinct non-NULL sensitive values) and ``l_violation``
    (n_sensitive < l). A released table is k-anonymous iff no
    k_violation row exists; ``summary=`` that check is one more
    aggregation over this output. NULL quasi values form real
    equivalence classes (groupBy already treats NULL as a group);
    NULL sensitive values carry no signal and don't count toward
    diversity.
    """
    if not quasi:
        raise ValueError("quasi must name at least one column")
    if k < 1 or (sensitive is not None and l < 1):
        raise ValueError("k and l must be >= 1")
    aggs = [F.count(F.lit(1)).alias("class_size")]
    if sensitive is not None:
        aggs.append(F.countDistinct(F.col(sensitive)).alias("n_sensitive"))
    out = df.groupBy(*quasi).agg(*aggs)
    out = out.withColumn("k_violation", F.col("class_size") < k)
    if sensitive is not None:
        out = out.withColumn("l_violation", F.col("n_sensitive") < l)
    return out


def k_anonymity_summary(
    df: DataFrame,
    quasi: list[str],
    k: int = 5,
    sensitive: str | None = None,
    l: int = 2,
) -> DataFrame:
    """One-row rollup of :func:`k_anonymity`: n_classes, n_rows,
    min_class_size, n_k_violations (classes), rows_at_risk (rows in
    violating classes), and with ``sensitive`` n_l_violations — the
    release-gate verdict columns."""
    classes = k_anonymity(df, quasi, k=k, sensitive=sensitive, l=l)
    aggs = [
        F.count(F.lit(1)).alias("n_classes"),
        F.sum("class_size").alias("n_rows"),
        F.min("class_size").alias("min_class_size"),
        F.sum(F.col("k_violation").cast("long")).alias("n_k_violations"),
        F.sum(F.when(F.col("k_violation"), F.col("class_size")).otherwise(0)).alias(
            "rows_at_risk"
        ),
    ]
    if sensitive is not None:
        aggs.append(F.sum(F.col("l_violation").cast("long")).alias("n_l_violations"))
    return classes.agg(*aggs)
