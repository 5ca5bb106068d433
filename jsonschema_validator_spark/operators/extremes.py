"""Extreme-value and randomness screens over per-group daily series:
Gumbel return levels (what daily peak to provision for), the record
count test and the turning point test (two distribution-free i.i.d.
screens with exact null moments).

Positioning: the engine's existing tail machinery asks "how heavy is
the tail" (hill_tail_events) and "is this point an outlier"
(Grubbs/MAD); Gumbel return levels answer the CAPACITY question — the
level exceeded once per T periods — which no quantile of the observed
sample can answer beyond its own horizon. The records and turning
point tests are the cheapest honest i.i.d. checks: their null
expectations are exact combinatorial facts (no distributional
assumption at all), so they screen the premise every i.i.d.-assuming
test in this engine rests on, from the opposite direction than
acf_ljung_box (which needs regular spacing and moments).

Scale shape: every screen reduces the raw table to the per-(group,
day) relation in one shuffle; the window passes (running max, lag
neighbors) run over that O(groups x days) relation only, partitioned
by group. Method-of-moments fits are aggregations; no iteration, no
UDF, no driver-side math beyond constants.

Reference provenance: /root/reference (Rust skeleton) has no stats
layer; extends SURVEY §2.4's drift/anomaly family.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .timeseries import _daily


def gumbel_return_levels(
    df: DataFrame,
    group: str,
    ts: str,
    value: str,
    return_periods: tuple = (30, 90, 365),
    min_days: int = 10,
) -> DataFrame:
    """Gumbel (EV-I) fit to the per-day MAXIMA by method of moments,
    with return levels — "the daily peak exceeded on average once per
    T days":

        beta = s * sqrt(6) / pi,   mu = m - gamma * beta
        x_T = mu - beta * ln(-ln(1 - 1/T))

    (m, s the mean and sample sd of the daily maxima; gamma the
    Euler-Mascheroni constant 0.5772...). Method of moments keeps the
    fit one aggregation — ML needs iteration — and is the standard
    first-cut EVT estimate; the Gumbel domain assumes a light-ish
    upper tail, so read hill_tail_events first (a tail index < 2
    means Frechet territory and these levels UNDERSTATE — stated, not
    hidden).

    Returns one row per (group, return_period): (group, n_days,
    max_mean, max_sd, mu, beta, return_period, return_level). Groups
    with < min_days days or zero variance emit nothing.
    """
    daily = _daily(df, group, ts, F.max(F.col(value).cast("double")))
    agg = daily.groupBy("g").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.avg("x").alias("m"),
        F.stddev_samp("x").alias("s"),
    )
    euler = 0.5772156649015329
    beta = F.col("s") * math.sqrt(6.0) / math.pi
    mu = F.col("m") - euler * beta
    periods = F.array(*[F.lit(int(t)) for t in return_periods])
    fitted = (
        agg.filter((F.col("n_days") >= min_days) & (F.col("s") > 0))
        .select(
            "g",
            "n_days",
            F.col("m").alias("mm"),
            F.col("s").alias("ss"),
            mu.alias("mu"),
            beta.alias("beta"),
            F.explode(periods).alias("return_period"),
        )
    )
    t = F.col("return_period").cast("double")
    level = F.col("mu") - F.col("beta") * F.log(-F.log(1.0 - 1.0 / t))
    return fitted.select(
        F.col("g").alias(group),
        "n_days",
        F.round("mm", 6).alias("max_mean"),
        F.round("ss", 6).alias("max_sd"),
        F.round("mu", 6).alias("mu"),
        F.round("beta", 6).alias("beta"),
        "return_period",
        F.round(level, 6).alias("return_level"),
    )


def record_count_test(
    df: DataFrame,
    group: str,
    ts: str,
    value: str | None = None,
    z_crit: float = 1.96,
) -> DataFrame:
    """Record count i.i.d. screen per group: count the days whose
    value strictly exceeds EVERY previous day (upper records) and the
    days strictly below every previous day (lower records); day 1 is
    both. Under exchangeability EACH count's moments are exact
    combinatorial facts — P(day i sets a record) = 1/i, independent
    across i:

        E[R] = H_n = sum 1/i,    Var[R] = sum (1/i - 1/i^2)

    An excess of UPPER records is an upward trend (each new level
    keeps breaking the ceiling); an excess of LOWER records a downward
    one — a one-sided z per side, because a downward trend barely
    depresses the upper count below its already-tiny H_n (the
    asymmetry that makes the single-count version nearly blind to
    declines). No moments, no distributional assumption, no spacing
    convention — the purest trend screen in the engine, and a premise
    check for every i.i.d.-assuming test. Ties do NOT break records
    (strict inequalities, stated); the two counts are dependent under
    the null, so the verdict applies each one-sided test marginally.

    One shuffle to the daily-mean relation (daily counts when
    ``value`` is None); one running-max/min window per group over it.
    Returns (group, n_days, n_records_up, n_records_low, expected,
    sd, z_up, z_low, verdict) with verdict in {trending_up,
    trending_down, both_tails, consistent_with_iid}.
    """
    val = (
        F.count(F.lit(1)).cast("double") if value is None else F.avg(F.col(value))
    )
    daily = _daily(df, group, ts, val)
    w = (
        Window.partitionBy("g")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_max = F.max("x").over(w)
    prev_min = F.min("x").over(w)
    rec = daily.select(
        "g",
        (prev_max.isNull() | (F.col("x") > prev_max)).cast("int").alias("ru"),
        (prev_min.isNull() | (F.col("x") < prev_min)).cast("int").alias("rl"),
    )
    agg = rec.groupBy("g").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("ru").cast("long").alias("n_records_up"),
        F.sum("rl").cast("long").alias("n_records_low"),
    )
    # H_n and the variance sum are functions of n_days alone; build
    # them as a tiny broadcast relation instead of a per-row UDF
    spark = df.sparkSession
    max_n = 10000  # daily series cap: 27 years of days
    harm = spark.range(1, max_n + 1).select(
        F.col("id").alias("n_days_h"),
        F.sum(1.0 / F.col("id"))
        .over(Window.orderBy("id").rowsBetween(Window.unboundedPreceding, 0))
        .alias("h_n"),
        F.sum(1.0 / F.col("id") - 1.0 / (F.col("id") * F.col("id")))
        .over(Window.orderBy("id").rowsBetween(Window.unboundedPreceding, 0))
        .alias("v_n"),
    )
    joined = agg.join(
        F.broadcast(harm), agg.n_days == harm.n_days_h, "left"
    )
    z_up = F.when(
        F.col("v_n") > 0,
        (F.col("n_records_up") - F.col("h_n")) / F.sqrt(F.col("v_n")),
    )
    z_low = F.when(
        F.col("v_n") > 0,
        (F.col("n_records_low") - F.col("h_n")) / F.sqrt(F.col("v_n")),
    )
    up = z_up > z_crit
    low = z_low > z_crit
    return joined.select(
        F.col("g").alias(group),
        "n_days",
        "n_records_up",
        "n_records_low",
        F.round("h_n", 6).alias("expected"),
        F.round(F.sqrt("v_n"), 6).alias("sd"),
        F.round(z_up, 6).alias("z_up"),
        F.round(z_low, 6).alias("z_low"),
        # a series past the harmonic-table cap has NULL h_n — say
        # "undetermined" loudly rather than defaulting to the null
        # verdict with no test actually performed
        F.when(F.col("h_n").isNull(), F.lit("undetermined"))
        .when(up & low, F.lit("both_tails"))
        .when(up, F.lit("trending_up"))
        .when(low, F.lit("trending_down"))
        .otherwise(F.lit("consistent_with_iid"))
        .alias("verdict"),
    )


def turning_point_test(
    df: DataFrame,
    group: str,
    ts: str,
    value: str | None = None,
    z_crit: float = 1.96,
) -> DataFrame:
    """Turning point i.i.d. screen per group: count the interior days
    that are a strict local max or min of the daily series. Under
    i.i.d. the exact null moments are combinatorial:

        E[T] = 2 (n - 2) / 3,    Var[T] = (16 n - 29) / 90

    TOO FEW turning points means momentum (trend or positive
    autocorrelation — the series keeps going the way it was going);
    TOO MANY means rapid alternation (negative autocorrelation, e.g.
    a correction/overshoot loop). The complement of the record test:
    records see level trends, turning points see local roughness.
    Plateau days (ties with a neighbor) are not turning points
    (strict inequalities, stated).

    One shuffle to the daily relation; one lag/lead window per group.
    Returns (group, n_days, n_turning, expected, sd, z, verdict) with
    verdict in {momentum, alternating, consistent_with_iid}.
    """
    val = (
        F.count(F.lit(1)).cast("double") if value is None else F.avg(F.col(value))
    )
    daily = _daily(df, group, ts, val)
    w = Window.partitionBy("g").orderBy("day")
    prev = F.lag("x").over(w)
    nxt = F.lead("x").over(w)
    tp = (
        prev.isNotNull()
        & nxt.isNotNull()
        & (
            ((F.col("x") > prev) & (F.col("x") > nxt))
            | ((F.col("x") < prev) & (F.col("x") < nxt))
        )
    ).cast("int")
    agg = daily.select("g", tp.alias("t")).groupBy("g").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("t").cast("long").alias("n_turning"),
    )
    n = F.col("n_days").cast("double")
    exp = 2.0 * (n - 2.0) / 3.0
    var = (16.0 * n - 29.0) / 90.0
    z = F.when(var > 0, (F.col("n_turning") - exp) / F.sqrt(var))
    return agg.filter(F.col("n_days") >= 3).select(
        F.col("g").alias(group),
        "n_days",
        "n_turning",
        F.round(exp, 6).alias("expected"),
        F.round(F.sqrt(var), 6).alias("sd"),
        F.round(z, 6).alias("z"),
        F.when(z < -z_crit, F.lit("momentum"))
        .when(z > z_crit, F.lit("alternating"))
        .otherwise(F.lit("consistent_with_iid"))
        .alias("verdict"),
    )
