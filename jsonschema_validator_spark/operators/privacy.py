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

import math

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


def t_closeness(
    df: DataFrame,
    quasi: list[str],
    sensitive: str,
    t: float = 0.2,
    ordered: bool = True,
) -> DataFrame:
    """t-closeness audit: each quasi-identifier equivalence class's
    sensitive-value distribution must sit within Earth-Mover's
    Distance ``t`` of the GLOBAL sensitive distribution (Li, Li &
    Venkatasubramanian, ICDE 2007 — the screen l-diversity misses:
    a class can span many distinct values yet still skew revealingly
    toward one).

    For an ordered attribute the 1-D EMD with unit ground distance is
    sum_i |cumsum(p - q)_i| / (m - 1) over the m-value global support;
    ``ordered=False`` uses the variational distance sum|p - q| / 2
    (equal ground distances). Both are exact ratios of integer counts.

    Scale shape: ONE groupBy to the (class, value) count relation,
    densified against the O(m) global support by a cross join of the
    class relation with the value relation (classes x m rows — never
    data rows); cumulative sums ride a window over that reduced
    relation. NULL sensitive values are excluded from both
    distributions (they carry no closeness signal); NULL quasi values
    form real classes. Returns one row per class: quasi columns +
    (class_size, emd, t_violation).
    """
    if not quasi:
        raise ValueError("quasi must name at least one column")
    key = F.struct(*[F.col(c) for c in quasi]).alias("__qi")
    d = df.filter(F.col(sensitive).isNotNull()).select(
        key, F.col(sensitive).alias("__v")
    )
    cell = d.groupBy("__qi", "__v").agg(F.count(F.lit(1)).alias("c"))
    per_class = cell.groupBy("__qi").agg(F.sum("c").alias("n_class"))
    per_value = cell.groupBy("__v").agg(F.sum("c").alias("n_value"))
    total = per_value.agg(F.sum("n_value").alias("n_total"))
    grid = per_class.crossJoin(per_value.crossJoin(total))
    dense = grid.join(cell, ["__qi", "__v"], "left").select(
        "__qi",
        "__v",
        "n_class",
        (F.coalesce(F.col("c"), F.lit(0)) / F.col("n_class")).alias("p"),
        (F.col("n_value") / F.col("n_total")).alias("q"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("__qi").orderBy("__v")
    m = Window.partitionBy("__qi")
    if ordered:
        # greatest(..., 1) so a single-value support (EMD trivially 0)
        # can't divide by zero under ANSI mode
        emd = F.sum(F.abs(F.sum(F.col("p") - F.col("q")).over(w))).over(m) / (
            F.greatest(F.count(F.lit(1)).over(m) - 1, F.lit(1))
        )
    else:
        emd = F.sum(F.abs(F.col("p") - F.col("q"))).over(m) / 2
    scored = dense.select(
        "__qi", "n_class", emd.alias("emd")
    ).dropDuplicates(["__qi"])
    out = scored.select(
        *[F.col("__qi").getField(c).alias(c) for c in quasi],
        F.col("n_class").cast("long").alias("class_size"),
        F.round("emd", 6).alias("emd"),
        (F.col("emd") > t).alias("t_violation"),
    )
    return out


def entropy_l_diversity(
    df: DataFrame,
    quasi: list[str],
    sensitive: str,
    l: float = 2.0,
) -> DataFrame:
    """Entropy l-diversity audit (Machanavajjhala et al., ICDE 2006):
    each quasi-identifier equivalence class must satisfy
    H(sensitive | class) >= log2(l) — the screen DISTINCT-count
    l-diversity (k_anonymity's ``l_violation``) misses: a class with
    l distinct sensitive values, 99% of them one value, passes the
    distinct count yet leaks that value with near-certainty; its
    entropy is near zero and fails here. Sits between the distinct
    count and t_closeness (which additionally compares against the
    GLOBAL distribution).

    Scale shape: ONE shuffle to the (class, sensitive) count relation;
    the entropy is a second aggregation over that reduced relation
    (O(classes x values) rows, never data rows). NULL sensitive values
    carry no signal and are excluded from the entropy (counted in
    class_size but not n_sensitive — same convention as k_anonymity);
    NULL quasi values form real classes.

    Returns one row per class: quasi columns, class_size, n_sensitive
    (distinct non-NULL), entropy_bits, effective_l (2^H — the "number
    of equally-likely values the class behaves as"), l_violation.
    """
    if not quasi:
        raise ValueError("quasi must name at least one column")
    if l < 1:
        raise ValueError("l must be >= 1")
    counts = (
        df.groupBy(
            F.struct(*[F.col(c) for c in quasi]).alias("__qi"),
        )
        .agg(F.count(F.lit(1)).alias("class_size"))
    )
    vals = (
        df.filter(F.col(sensitive).isNotNull())
        .groupBy(
            F.struct(*[F.col(c) for c in quasi]).alias("__qi"),
            F.col(sensitive).alias("__v"),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
    )
    ent = vals.groupBy("__qi").agg(
        F.count(F.lit(1)).cast("long").alias("n_sensitive"),
        F.sum("c").alias("__tot"),
        F.sum(F.col("c") * F.log2("c")).alias("__clogc"),
    )
    # H = log2(tot) - sum(c log2 c)/tot  (exact regrouping, one pass)
    h = F.log2("__tot") - F.col("__clogc") / F.col("__tot")
    scored = counts.join(ent, "__qi", "left")
    return scored.select(
        *[F.col("__qi").getField(c).alias(c) for c in quasi],
        F.col("class_size").cast("long").alias("class_size"),
        F.coalesce(F.col("n_sensitive"), F.lit(0)).alias("n_sensitive"),
        F.round(h, 6).alias("entropy_bits"),
        F.round(F.pow(F.lit(2.0), h), 6).alias("effective_l"),
        F.coalesce(h < math.log2(l), F.lit(True)).alias("l_violation"),
    )
