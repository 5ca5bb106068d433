"""Root-cause screens: which single condition best explains a failure
flag. The first question after any validity/outlier screen fires is
"what separates the bad rows from the good ones?" — this module
answers the one-split version of it exactly.

decision_stump: the CART root node, evaluated exhaustively over a
caller-pinned threshold grid in ONE aggregation — for each candidate
threshold t of a numeric feature, the information gain of splitting
rows at feature <= t against a boolean label. No tree library, no
iteration, no sampling: with G candidates the whole screen is 2G + 2
conditional sums (map-side combinable), so it runs unchanged at
10^12 rows. The grid is explicit (caller-pinned, like every critical
constant in this engine) rather than derived from data quantiles:
the two engines of the oracle contract would have to agree on
quantile interpolation, and a fixed grid makes the scan reproducible
across runs and engines by construction.

Reference provenance: /root/reference (Rust skeleton) has no
diagnostics layer; extends SURVEY §2.4's violation-triage family
(api.validate_many supplies the label in the contract query).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def decision_stump(
    df: DataFrame,
    label: str,
    feature: str,
    thresholds: list[float],
    group: str | None = None,
    min_side: int = 1,
) -> DataFrame:
    """Exhaustive single-split search: for each candidate threshold t,
    split rows into feature <= t / feature > t and score the split by
    information gain on the boolean ``label``:

        gain(t) = H(pos/n) - (n_le/n) H_le - (n_gt/n) H_gt

    (binary entropy in bits). Emits every candidate with its side
    sizes, per-side positive rates, and gain, plus ``best`` marking
    the highest-gain candidate (ties broken toward the smallest
    threshold, decided on the ROUNDED gain so the flag is stable
    across engines and runs). A best gain near 0 says the feature
    doesn't explain the label at any cut — as informative as a
    strong split.

    Rows with NULL label or NULL feature are excluded (complete-case,
    stated). Candidates that put fewer than ``min_side`` rows on
    either side emit NULL gain (no meaningful split). One aggregation
    total; all scoring algebra on the O(groups) aggregate.

    Returns (group?, threshold, n_le, n_gt, pos_rate_le, pos_rate_gt,
    info_gain, best).
    """
    if not thresholds:
        raise ValueError("thresholds must be non-empty")
    ts = sorted(float(t) for t in thresholds)
    y = F.col(label).cast("boolean")
    x = F.col(feature).cast("double")
    base = df.filter(y.isNotNull() & x.isNotNull()).select(
        *([F.col(group).alias("g")] if group else []),
        y.cast("int").alias("y"),
        x.alias("x"),
    )
    aggs = [
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("y").cast("double").alias("pos"),
    ]
    for i, t in enumerate(ts):
        le = F.col("x") <= t
        aggs.append(F.sum(F.when(le, 1).otherwise(0)).cast("double").alias(f"nl{i}"))
        aggs.append(
            F.sum(F.when(le, F.col("y")).otherwise(0)).cast("double").alias(f"pl{i}")
        )
    agg = base.groupBy(*([F.col("g")] if group else [])).agg(*aggs)

    def _h(p):
        # binary entropy with 0 log 0 = 0
        return -(
            F.when((p > 0) & (p < 1), p * F.log2(p)).otherwise(0.0)
            + F.when((p > 0) & (p < 1), (1 - p) * F.log2(1 - p)).otherwise(0.0)
        )

    n = F.col("n")
    h_parent = _h(F.col("pos") / n)
    rows = []
    for i, t in enumerate(ts):
        nl = F.col(f"nl{i}")
        ng = n - nl
        pl = F.col(f"pl{i}")
        pg = F.col("pos") - pl
        ok = (nl >= min_side) & (ng >= min_side)
        gain = F.when(
            ok,
            h_parent - (nl / n) * _h(pl / nl) - (ng / n) * _h(pg / ng),
        )
        rows.append(
            F.struct(
                F.lit(t).alias("threshold"),
                nl.cast("long").alias("n_le"),
                ng.cast("long").alias("n_gt"),
                F.when(nl > 0, F.round(pl / nl, 6)).alias("pos_rate_le"),
                F.when(ng > 0, F.round(pg / ng, 6)).alias("pos_rate_gt"),
                F.round(gain, 6).alias("info_gain"),
            )
        )
    long = agg.select(
        *([F.col("g")] if group else []),
        F.explode(F.array(*rows)).alias("c"),
    ).select(*([F.col("g")] if group else []), "c.*")
    from pyspark.sql import Window as W

    part = W.partitionBy(*(["g"] if group else []))
    best_gain = F.max("info_gain").over(part)
    best_t = F.min(
        F.when(F.col("info_gain") == best_gain, F.col("threshold"))
    ).over(part)
    out_cols = []
    if group:
        out_cols.append(F.col("g").alias(group))
    out_cols += [
        "threshold",
        "n_le",
        "n_gt",
        "pos_rate_le",
        "pos_rate_gt",
        "info_gain",
        (
            F.col("info_gain").isNotNull()
            & (F.col("threshold") == best_t)
        ).alias("best"),
    ]
    return long.select(*out_cols)
