"""CUSUM change-point screening over per-group time series — the
volume/level-shift detector that complements operators/anomaly.py's
pointwise median/MAD screen: MAD flags isolated spikes, CUSUM
accumulates small sustained drifts (the classic Page 1954 statistic)
that no single point would flag.

Scale shape: the raw table is reduced FIRST by one (group, day)
aggregation — that is the only full-data shuffle; the recurrence then
runs per group over the tiny aggregated series (O(days) rows) inside
one Arrow-batched applyInPandas, so state is O(1) per group and groups
distribute freely. No per-row Python ever touches the raw table
(input_hint contract).

The recurrence s_i = max(0, s_{i-1} + (x_i - mu - k*sd)) is inherently
sequential per group — exactly the applyInPandas escape hatch SURVEY
§2.5 reserves for state Spark's window algebra can't express (a
running max-reset is not a window function). The oracle replays it
with a recursive CTE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cusum_screen(
    df: DataFrame,
    group: str,
    ts: str,
    value: str,
    k_sigma: float = 0.5,
    h_sigma: float = 4.0,
) -> DataFrame:
    """One-sided (upward) CUSUM per group over daily means:
    (group, day, x, cusum, flag). mu/sd are the group's own series
    mean / sample stddev (self-referencing control limits — the
    screening convention when no reference window is given);
    flag = cusum > h_sigma * sd."""
    import pandas as pd

    daily = (
        df.groupBy(F.col(group).alias("g"), F.date_format(F.date_trunc("day", F.col(ts)), "yyyy-MM-dd").alias("day"))
        .agg(F.avg(F.col(value)).alias("x"))
    )
    params = daily.groupBy("g").agg(
        F.avg("x").alias("mu"), F.stddev_samp("x").alias("sd")
    )
    series = daily.join(params, "g")

    def _run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("day").reset_index(drop=True)
        mu = pdf["mu"].iloc[0]
        sd = pdf["sd"].iloc[0]
        sd = 0.0 if pd.isna(sd) else sd
        slack = mu + k_sigma * sd
        s, out = 0.0, []
        for x in pdf["x"]:
            s = max(0.0, s + (x - slack))
            out.append(s)
        pdf["cusum"] = out
        pdf["flag"] = pdf["cusum"] > h_sigma * sd
        return pdf[["g", "day", "x", "cusum", "flag"]]

    return (
        series.groupBy("g")
        .applyInPandas(_run, schema="g string, day string, x double, cusum double, flag boolean")
        .select(
            F.col("g").alias(group),
            "day",
            F.round("x", 6).alias("x"),
            F.round("cusum", 6).alias("cusum"),
            "flag",
        )
    )


def best_split(
    df: DataFrame,
    group: str,
    ts: str,
    value: str | None = None,
) -> DataFrame:
    """Exact single-changepoint locator per group (one step of binary
    segmentation): the day that best splits the daily series into two
    constant-mean segments, by maximum SSE reduction — where
    cusum_screen says "a sustained shift happened", this says WHEN and
    by HOW MUCH (left mean, right mean, and the fraction of variance
    one break explains, which is the evidence the break is real and
    not noise chasing).

    For split after position k: SSE_k = SST - n_l*(m_l - m)^2
    - n_r*(m_r - m)^2; all candidate splits evaluate from ONE pair of
    prefix-sum windows over the O(days) daily relation — no per-split
    scan, exact arithmetic. The last day cannot split (no right
    segment), so single-day groups emit no row; zero-variance groups
    return NULL split_day / explained (no break exists to locate).
    Returns (part, n_days, split_day, mean_left,
    mean_right, shift, explained), floats rounded to 6; ties on
    explained break to the EARLIEST day (struct-min over (-gain, day)
    reversed: max over (gain, day DESC)... earliest = min day among
    max gain, pinned in the test).
    """
    from pyspark.sql import Window

    val = F.count(F.lit(1)).cast("double") if value is None else F.avg(F.col(value))
    daily = (
        df.groupBy(
            F.col(group).alias("g"),
            F.date_format(F.date_trunc("day", F.col(ts)), "yyyy-MM-dd").alias(
                "day"
            ),
        ).agg(val.alias("x"))
    )
    w = Window.partitionBy("g").orderBy("day").rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_all = Window.partitionBy("g")
    pre = (
        daily.withColumn("__cs", F.sum("x").over(w))
        .withColumn("__k", F.row_number().over(Window.partitionBy("g").orderBy("day")))
        .withColumn("__n", F.count(F.lit(1)).over(w_all))
        .withColumn("__ts", F.sum("x").over(w_all))
        .withColumn("__tss", F.sum(F.col("x") * F.col("x")).over(w_all))
    )
    k = F.col("__k").cast("double")
    n = F.col("__n").cast("double")
    m = F.col("__ts") / n
    ml = F.col("__cs") / k
    mr = (F.col("__ts") - F.col("__cs")) / (n - k)
    gain = k * (ml - m) * (ml - m) + (n - k) * (mr - m) * (mr - m)
    sst = F.col("__tss") - F.col("__ts") * F.col("__ts") / n
    cand = pre.filter(F.col("__k") < F.col("__n")).select(
        "g",
        "day",
        F.col("__n").alias("n_days"),
        ml.alias("__ml"),
        mr.alias("__mr"),
        gain.alias("__gain"),
        sst.alias("__sst"),
    )
    # earliest day among max-gain ties: max over (gain, negated-day
    # ordering) is awkward for strings, so rank explicitly
    w_rank = Window.partitionBy("g").orderBy(F.desc("__gain"), F.col("day"))
    best = cand.withColumn("__r", F.row_number().over(w_rank)).filter(
        F.col("__r") == 1
    )
    explained = F.when(F.col("__sst") > 0, F.col("__gain") / F.col("__sst"))
    return best.select(
        F.col("g").alias("part"),
        "n_days",
        F.when(F.col("__sst") > 0, F.col("day")).alias("split_day"),
        F.round("__ml", 6).alias("mean_left"),
        F.round("__mr", 6).alias("mean_right"),
        # shift rounds the UNROUNDED difference — rounding the means
        # first can disagree with the oracle in the 6th decimal
        F.round(F.col("__mr") - F.col("__ml"), 6).alias("shift"),
        F.round(explained, 6).alias("explained"),
    )
