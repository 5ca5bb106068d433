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
