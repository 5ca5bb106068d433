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

from pyspark.sql import DataFrame, Window
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


def sprt_binomial(
    df: DataFrame,
    order_col: str,
    k_col: str,
    n_col: str,
    p0: float,
    p1: float,
    alpha: float = 0.05,
    beta: float = 0.05,
) -> DataFrame:
    """Wald's sequential probability ratio test on a batched Bernoulli
    stream — the early-stopping quality gate: instead of fixing a
    sample size up front, accumulate the binomial log-likelihood ratio
    of H1: p = p1 against H0: p = p0 over the ORDERED batches (k
    passes of n trials per step) and stop the moment the evidence
    crosses either Wald boundary

        upper = ln((1 - beta) / alpha)   -> accept H1
        lower = ln(beta / (1 - alpha))   -> accept H0

    which on average decides with far fewer rows than the fixed-n test
    — the point of a VALIDATION gate over a 10^12-row table: stop
    scanning when the verdict is already certain.

    Each step adds k ln(p1/p0) + (n - k) ln((1-p1)/(1-p0)); the
    cumulative LLR is a window over the already-reduced O(steps)
    relation (batched form — per-row SPRT at raw scale is the same
    algebra with n = 1). The DECISION is the first boundary crossing
    in order; later wandering back inside the bands is ignored, per
    Wald. Returns one row: (n_steps, trials, passes, llr_final,
    upper, lower, decision, step_at_decision) where decision is
    'accept_h1' / 'accept_h0' / 'continue' and step_at_decision is
    the 1-based step index (NULL when 'continue').
    """
    import math

    la = math.log(p1 / p0)
    lb = math.log((1.0 - p1) / (1.0 - p0))
    upper = math.log((1.0 - beta) / alpha)
    lower = math.log(beta / (1.0 - alpha))
    d = df.filter(
        F.col(order_col).isNotNull()
        & F.col(k_col).isNotNull()
        & F.col(n_col).isNotNull()
    ).select(
        F.col(order_col).alias("__o"),
        F.col(k_col).cast("double").alias("__k"),
        F.col(n_col).cast("double").alias("__n"),
    )
    w = Window.partitionBy(F.lit(1)).orderBy("__o")
    stepped = d.select(
        "__k",
        "__n",
        F.row_number().over(w).alias("__step"),
        F.sum(
            F.col("__k") * la + (F.col("__n") - F.col("__k")) * lb
        ).over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("__llr"),
    )
    agg = stepped.agg(
        F.count(F.lit(1)).alias("n_steps"),
        F.sum("__n").cast("long").alias("trials"),
        F.sum("__k").cast("long").alias("passes"),
        F.max(F.struct("__step", "__llr")).alias("__last"),
        F.min(F.when(F.col("__llr") >= upper, F.col("__step"))).alias("__up"),
        F.min(F.when(F.col("__llr") <= lower, F.col("__step"))).alias("__dn"),
    )
    up, dn = F.col("__up"), F.col("__dn")
    first = F.least(F.coalesce(up, F.lit(2**31)), F.coalesce(dn, F.lit(2**31)))
    decided = up.isNotNull() | dn.isNotNull()
    decision = F.when(~decided, F.lit("continue")).otherwise(
        F.when(
            F.coalesce(up, F.lit(2**31)) <= F.coalesce(dn, F.lit(2**31)),
            F.lit("accept_h1"),
        ).otherwise(F.lit("accept_h0"))
    )
    return agg.select(
        "n_steps",
        "trials",
        "passes",
        F.round(F.col("__last.__llr"), 6).alias("llr_final"),
        F.round(F.lit(upper), 6).alias("upper"),
        F.round(F.lit(lower), 6).alias("lower"),
        decision.alias("decision"),
        F.when(decided, first).cast("long").alias("step_at_decision"),
    )


def page_hinkley(
    df: DataFrame,
    order_col: str,
    value_col: str,
    delta: float = 0.0,
    lam: float = 10.0,
) -> DataFrame:
    """Page-Hinkley mean-shift monitor on an ORDERED series — the
    running-mean sibling of cusum_screen: CUSUM accumulates deviations
    from a FIXED reference mean, while Page-Hinkley tracks deviations
    from the RUNNING mean x_bar_t, so it needs no calibration pass and
    adapts as the level estimate sharpens:

        m_t  = sum_{s<=t} (x_s - x_bar_s - delta)
        PH_t = m_t - min_{s<=t} m_s          (alarm when PH_t > lam)

    delta is the slack (drift magnitude considered benign), lam the
    alarm threshold in value units.

    Scale: the caller passes the already-reduced series (one row per
    day); running mean, cumsum and running min are three windows over
    that O(series) relation. Returns one row per step: (order, x,
    run_mean, m_t, ph, alarm), floats rounded to 6, ordered by order.
    """
    d = df.filter(
        F.col(order_col).isNotNull() & F.col(value_col).isNotNull()
    ).select(F.col(order_col).alias("order"), F.col(value_col).cast("double").alias("x"))
    w = Window.partitionBy(F.lit(1)).orderBy("order")
    upto = w.rowsBetween(Window.unboundedPreceding, 0)
    run_mean = F.avg("x").over(upto)
    staged = d.withColumn("run_mean", run_mean).withColumn(
        "__dev", F.col("x") - F.col("run_mean") - F.lit(delta)
    )
    m_t = F.sum("__dev").over(upto)
    staged = staged.withColumn("m_t", m_t).withColumn(
        "__mmin", F.min("m_t").over(upto)
    )
    ph = F.col("m_t") - F.col("__mmin")
    return staged.select(
        "order",
        F.round("x", 6).alias("x"),
        F.round("run_mean", 6).alias("run_mean"),
        F.round("m_t", 6).alias("m_t"),
        (F.round(ph, 6) + 0.0).alias("ph"),
        (ph > lam).alias("alarm"),
    ).orderBy("order")
