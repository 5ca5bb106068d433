"""Normal-theory distribution-shape screens: Jarque-Bera normality,
Bartlett variance homogeneity, Grubbs max-outlier.

These are the parametric complements of screens the engine already
ships: Brown-Forsythe (operators/stats.brown_forsythe) tests the same
variance-homogeneity null as Bartlett but is robust to non-normality,
while Bartlett is the more powerful choice WHEN normality holds —
which is exactly what jarque_bera_screen certifies first. Grubbs is
the normal-theory single-outlier test beside the distribution-free
median/MAD screen (operators/anomaly.robust_outliers): MAD flags by
robust spread, Grubbs asks whether the single most extreme point is
surprising under a fitted Gaussian.

Scale shape: every screen is ONE groupBy aggregation over raw-moment
sums (map-side combinable, no window, no second scan); the test
algebra runs on the O(groups) aggregate. Central moments come from
raw power sums (sum x, sum x^2, sum x^3, sum x^4), so a single fused
pass suffices even at 10^12 rows. Critical values are caller-pinned
constants (a Column plan cannot invert a chi-square or t CDF), same
contract as operators/timeseries.acf_ljung_box and pairwise_welch.

Reference provenance: the reference validator (/root/reference, Rust
skeleton) has no statistics layer; these extend SURVEY §2.4's
engine-level dataset checks (drift/anomaly family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# chi-square 95% critical values, df 1..10 (pinned: plans cannot
# invert the CDF; public table values)
_CHI2_95 = [3.841, 5.991, 7.815, 9.488, 11.070, 12.592, 14.067,
            15.507, 16.919, 18.307]


def power_sums(df: DataFrame, group: str, value: str) -> DataFrame:
    """The ADDITIVE (g, n, s1..s4) power-sum relation behind
    jarque_bera_screen — exposed separately because it is MERGEABLE:
    partials from any row partitioning (or any sequence of streaming
    micro-batches) sum to the same moments, so batch and incremental
    JB share one assembly and one oracle (the same contract as
    similarity.moment_partials for the MMD family)."""
    x = F.col(value).cast("double")
    return (
        df.filter(x.isNotNull())
        .groupBy(F.col(group).alias("g"))
        .agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.sum(x).alias("s1"),
            F.sum(x * x).alias("s2"),
            F.sum(x * x * x).alias("s3"),
            F.sum(x * x * x * x).alias("s4"),
        )
    )


def _central_moments(agg: DataFrame):
    """(n, mean, m2, m3, m4) column exprs over a power-sum relation.

    m_k are the biased (1/n) central moments, derived from raw sums by
    the binomial expansion — the only formulation that stays a single
    map-side-combinable aggregation.
    """
    n = F.col("n")
    mu = F.col("s1") / n
    m2 = F.col("s2") / n - mu * mu
    m3 = F.col("s3") / n - 3 * mu * F.col("s2") / n + 2 * mu * mu * mu
    m4 = (
        F.col("s4") / n
        - 4 * mu * F.col("s3") / n
        + 6 * mu * mu * F.col("s2") / n
        - 3 * mu * mu * mu * mu
    )
    return agg, n, mu, m2, m3, m4


def jb_from_power_sums(
    parts: DataFrame, group: str, min_n: int = 8
) -> DataFrame:
    """Assemble the Jarque-Bera result from a (g, n, s1..s4) power-sum
    relation — fresh from :func:`power_sums` or re-read from a
    streaming sink (extra columns like batch_id are ignored; partials
    for the same g are summed, which is the identity when the relation
    is already one row per group)."""
    merged = parts.groupBy("g").agg(
        F.sum("n").alias("n"),
        F.sum("s1").alias("s1"),
        F.sum("s2").alias("s2"),
        F.sum("s3").alias("s3"),
        F.sum("s4").alias("s4"),
    )
    agg, n, mu, m2, m3, m4 = _central_moments(merged)
    skew = m3 / F.pow(m2, 1.5)
    kurt = m4 / (m2 * m2) - 3.0
    jb = n / 6.0 * (skew * skew + kurt * kurt / 4.0)
    return (
        agg.filter((n >= min_n) & (m2 > 0))
        .select(
            F.col("g").alias(group),
            n.cast("long").alias("n"),
            F.round(skew, 6).alias("skewness"),
            F.round(kurt, 6).alias("kurtosis_excess"),
            F.round(jb, 6).alias("jb_stat"),
            F.lit(_CHI2_95[1]).alias("jb_crit_95"),
            (jb > _CHI2_95[1]).alias("reject"),
        )
    )


def jarque_bera_screen(
    df: DataFrame, group: str, value: str, min_n: int = 8
) -> DataFrame:
    """Jarque-Bera normality test per group: JB = n/6 (S^2 + K^2/4)
    with S = m3/m2^1.5 (skewness) and K = m4/m2^2 - 3 (excess
    kurtosis), compared to the chi-square(2) 95% critical 5.991.

    This is the gate in front of every normal-theory screen downstream
    (Bartlett, Grubbs, Welch's premises at small n): a group that
    rejects here should be routed to the robust twins instead. Groups
    with n < min_n or zero variance emit no row (JB's chi-square
    approximation is meaningless there).

    Returns (group, n, skewness, kurtosis_excess, jb_stat, jb_crit_95,
    reject). One raw-table aggregation (power_sums) plus an O(groups)
    assembly; the split into additive partials + assembly is what the
    streaming twin reuses.
    """
    return jb_from_power_sums(power_sums(df, group, value), group, min_n)


def bartlett_test(
    df: DataFrame, group: str, value: str, min_n: int = 2
) -> DataFrame:
    """Bartlett's test of equal variances across ALL groups (one
    global verdict row, like operators/stats.brown_forsythe's
    one-way layout):

        T = [ (N-k) ln sp^2 - sum_i (n_i-1) ln s_i^2 ] / C
        C = 1 + ( sum_i 1/(n_i-1) - 1/(N-k) ) / (3 (k-1))

    with sp^2 the pooled variance. T ~ chi-square(k-1) under the null;
    the critical value is read from the pinned df 1..10 table (more
    than 11 groups raises — pin more constants at the call site).
    Bartlett is MORE powerful than Brown-Forsythe under normality and
    anticonservative under heavy tails — run jarque_bera_screen first;
    a disagreement between the two IS the signal that tails are heavy.

    Two chained aggregations, both over reduced relations: raw ->
    per-group (n_i, s_i^2), then per-group -> one row. Groups with
    n_i < max(min_n, 2) or zero variance are excluded from the test
    (ln s^2 undefined) and counted in n_groups_excluded.

    Returns one row: (k, n_total, pooled_var, t_stat, t_crit_95,
    reject, n_groups_excluded).
    """
    x = F.col(value).cast("double")
    per = (
        df.filter(x.isNotNull())
        .groupBy(F.col(group).alias("g"))
        .agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.var_samp(x).alias("v"),
        )
    )
    ok = (F.col("n") >= max(min_n, 2)) & (F.col("v") > 0)
    crit_arr = F.array(*[F.lit(c) for c in _CHI2_95])
    out = per.agg(
        F.sum(F.when(ok, 1).otherwise(0)).cast("long").alias("k"),
        F.sum(F.when(~ok, 1).otherwise(0)).cast("long").alias(
            "n_groups_excluded"
        ),
        F.sum(F.when(ok, F.col("n")).otherwise(0.0)).alias("n_tot"),
        F.sum(F.when(ok, (F.col("n") - 1) * F.col("v")).otherwise(0.0)).alias(
            "ss"
        ),
        F.sum(
            F.when(ok, (F.col("n") - 1) * F.log(F.col("v"))).otherwise(0.0)
        ).alias("sumlog"),
        F.sum(F.when(ok, 1.0 / (F.col("n") - 1)).otherwise(0.0)).alias(
            "suminv"
        ),
    )
    k = F.col("k").cast("double")
    dof = F.col("n_tot") - k
    sp2 = F.col("ss") / dof
    c = 1.0 + (F.col("suminv") - 1.0 / dof) / (3.0 * (k - 1.0))
    t = (dof * F.log(sp2) - F.col("sumlog")) / c
    crit = F.element_at(crit_arr, (F.col("k") - 1).cast("int"))
    return out.filter(F.col("k") >= 2).select(
        F.col("k").cast("long").alias("k"),
        F.col("n_tot").cast("long").alias("n_total"),
        F.round(sp2, 6).alias("pooled_var"),
        F.round(t, 6).alias("t_stat"),
        crit.alias("t_crit_95"),
        (t > crit).alias("reject"),
        "n_groups_excluded",
    )


def grubbs_screen(
    df: DataFrame,
    group: str,
    value: str,
    crit: float,
    min_n: int = 8,
) -> DataFrame:
    """Grubbs' max-outlier statistic per group:
    G = max_i |x_i - mean| / sd (sample sd), with the offending value
    attributed. ``crit`` is the caller-pinned critical value for the
    group sizes in play (G's null distribution depends on n through a
    t quantile a Column plan cannot evaluate — same pinned-constant
    contract as pairwise_welch's Bonferroni critical; callers document
    the (alpha, n) the pin was computed for).

    Against anomaly.robust_outliers: MAD screens EVERY row by robust
    spread; Grubbs asks one sharper question — is the single worst
    point consistent with the fitted Gaussian? — and is the standard
    lab-protocol test when at most one outlier is expected.

    One aggregation computes (n, mean, sd, max, min) per group; G and
    the attributed extreme are pure algebra on that O(groups) relation
    (the max-deviation point is necessarily the max or the min, so no
    second scan and no argmax window over the raw table is needed).

    Returns (group, n, mean, sd, extreme_value, g_stat, g_crit,
    reject).
    """
    x = F.col(value).cast("double")
    agg = (
        df.filter(x.isNotNull())
        .groupBy(F.col(group).alias("g"))
        .agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.avg(x).alias("mu"),
            F.stddev_samp(x).alias("sd"),
            F.max(x).alias("mx"),
            F.min(x).alias("mn"),
        )
    )
    dev_hi = F.col("mx") - F.col("mu")
    dev_lo = F.col("mu") - F.col("mn")
    extreme = F.when(dev_hi >= dev_lo, F.col("mx")).otherwise(F.col("mn"))
    g = F.greatest(dev_hi, dev_lo) / F.col("sd")
    return (
        agg.filter((F.col("n") >= min_n) & (F.col("sd") > 0))
        .select(
            F.col("g").alias(group),
            F.col("n").cast("long").alias("n"),
            F.round("mu", 6).alias("mean"),
            F.round("sd", 6).alias("sd"),
            F.round(extreme, 6).alias("extreme_value"),
            F.round(g, 6).alias("g_stat"),
            F.lit(crit).alias("g_crit"),
            (g > crit).alias("reject"),
        )
    )


def yuen_trimmed_test(
    df: DataFrame,
    group: str,
    arm: str,
    value: str,
    control,
    treatment,
    trim: float = 0.2,
    t_crit: float = 1.96,
    min_n: int = 10,
) -> DataFrame:
    """Yuen's trimmed-mean two-sample test (Yuen 1974) per group — the
    ROBUST arm-comparison to run when jarque_bera_screen rejects and
    Welch's premises fail: trim the top and bottom ``trim`` fraction
    of each arm (by order statistics, not by sigma — no normality
    assumption), compare trimmed means, and standard-error them with
    the WINSORIZED variance (the variance of the sample with the
    trimmed tails clamped to the cut values — trimming alone would
    understate the error):

        g = floor(trim * n),  h = n - 2g   (effective sample size)
        d = s_w^2 (n - 1) / (h (h - 1))
        t = (tm_treat - tm_ctrl) / sqrt(d_t + d_c)

    ``t_crit`` is the caller-pinned critical value (the Yuen df is a
    Welch-style fraction a Column plan cannot invert a t CDF for; the
    asymptotic 1.96 default is documented). A heavy-tail-driven
    "significant" Welch lift that is NOT significant here was a tail
    artifact, not a level shift.

    Scale shape: one rank window per (group, arm) — the single
    raw-table shuffle — then two aggregations that reuse the same
    partitioning (kept-range stats, then winsorized sums after an
    O(groups x arms) bounds broadcast). Tie permutations at the cut
    do not affect any output (equal values clamp to themselves).
    Returns (group, n_control, n_treatment, h_control, h_treatment,
    trimmed_mean_control, trimmed_mean_treatment, lift_trimmed,
    t_stat, t_crit, reject).
    """
    if not 0.0 <= trim < 0.5:
        raise ValueError("trim must be in [0, 0.5)")
    x = F.col(value).cast("double")
    a = F.col(arm).cast("string")
    base = df.filter(
        x.isNotNull() & a.isin([str(control), str(treatment)])
    ).select(
        F.col(group).alias("g"),
        (a == str(treatment)).cast("int").alias("t"),
        x.alias("x"),
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("g", "t").orderBy("x")
    nw = W.partitionBy("g", "t")
    ranked = base.select(
        "g",
        "t",
        "x",
        F.row_number().over(w).alias("r"),
        F.count(F.lit(1)).over(nw).alias("n"),
    ).withColumn("cut", F.floor(F.lit(trim) * F.col("n")))
    kept = ranked.filter(
        (F.col("r") > F.col("cut")) & (F.col("r") <= F.col("n") - F.col("cut"))
    )
    bounds = kept.groupBy("g", "t").agg(
        F.max("n").alias("n"),
        F.count(F.lit(1)).alias("h"),
        F.avg("x").alias("tm"),
        F.min("x").alias("lo"),
        F.max("x").alias("hi"),
    )
    clamped = ranked.join(F.broadcast(bounds.select("g", "t", "lo", "hi")), ["g", "t"]).select(
        "g", "t", F.greatest(F.least(F.col("x"), F.col("hi")), F.col("lo")).alias("c")
    )
    wins = clamped.groupBy("g", "t").agg(
        F.sum("c").alias("sc"), F.sum(F.col("c") * F.col("c")).alias("scc")
    )
    per = bounds.join(wins, ["g", "t"])
    n = F.col("n").cast("double")
    h = F.col("h").cast("double")
    wm = F.col("sc") / n
    sw2 = (F.col("scc") - n * wm * wm) / (n - 1.0)
    d = sw2 * (n - 1.0) / (h * (h - 1.0))
    per = per.select("g", "t", "n", "h", "tm", d.alias("d"))
    piv = per.groupBy("g").agg(
        F.max(F.when(F.col("t") == 0, F.col("n"))).alias("n_c"),
        F.max(F.when(F.col("t") == 1, F.col("n"))).alias("n_t"),
        F.max(F.when(F.col("t") == 0, F.col("h"))).alias("h_c"),
        F.max(F.when(F.col("t") == 1, F.col("h"))).alias("h_t"),
        F.max(F.when(F.col("t") == 0, F.col("tm"))).alias("tm_c"),
        F.max(F.when(F.col("t") == 1, F.col("tm"))).alias("tm_t"),
        F.max(F.when(F.col("t") == 0, F.col("d"))).alias("d_c"),
        F.max(F.when(F.col("t") == 1, F.col("d"))).alias("d_t"),
    )
    tstat = (F.col("tm_t") - F.col("tm_c")) / F.sqrt(F.col("d_t") + F.col("d_c"))
    return (
        piv.filter(
            (F.col("n_c") >= min_n)
            & (F.col("n_t") >= min_n)
            & (F.col("h_c") > 1)
            & (F.col("h_t") > 1)
            & ((F.col("d_t") + F.col("d_c")) > 0)
        )
        .select(
            F.col("g").alias(group),
            F.col("n_c").cast("long").alias("n_control"),
            F.col("n_t").cast("long").alias("n_treatment"),
            F.col("h_c").cast("long").alias("h_control"),
            F.col("h_t").cast("long").alias("h_treatment"),
            F.round("tm_c", 6).alias("trimmed_mean_control"),
            F.round("tm_t", 6).alias("trimmed_mean_treatment"),
            F.round(F.col("tm_t") - F.col("tm_c"), 6).alias("lift_trimmed"),
            F.round(tstat, 6).alias("t_stat"),
            F.lit(t_crit).alias("t_crit"),
            (F.abs(tstat) > t_crit).alias("reject"),
        )
    )
