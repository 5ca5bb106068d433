"""Spectral / serial-structure screens: partial autocorrelation via
Yule-Walker determinants, a candidate-period periodogram with Fisher's
g concentration ratio, and the effective rank (participation ratio) of
an embedding covariance spectrum.

Positioning against what the engine already ships: acf_ljung_box
(operators/timeseries.py) answers "is there ANY serial dependence";
pacf_yw answers the next diagnostic question — at what AR ORDER does
the direct dependence stop (ACF of an AR(1) decays forever, its PACF
cuts off after lag 1); periodogram_screen answers "at WHICH period is
the energy" when seasonal_strength's fixed-period decomposition can't
be run because the period is unknown; effective_rank extends
gram_spectrum's top-eigenvalue anisotropy share with a whole-spectrum
summary that needs NO power iteration — the participation ratio
tr(C)^2 / tr(C^2) is closed-form in the covariance entries.

Scale shape: the time-series screens reduce the raw table to a
per-(group, day) relation in one shuffle and run all remaining algebra
on that O(groups x days) series; the embedding screen is one
Arrow-batched partial-outer-product pass (d^2 + d + 1 rows per batch,
reusing similarity.moment_partials) — no pairwise matrix, no
driver-side linear algebra beyond O(d^2).

Reference provenance: /root/reference (Rust skeleton) has no stats
layer; these extend SURVEY §2.4's drift/anomaly family.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .timeseries import acf_ljung_box


def pacf_yw(
    df: DataFrame,
    group: str = "event_type",
    ts: str = "ts",
    value: str | None = None,
) -> DataFrame:
    """Partial autocorrelation at lags 1..3 per group, by Yule-Walker
    closed form over the sample ACF (daily counts when ``value`` is
    None, else daily means — same series contract as acf_ljung_box,
    whose r_k this reuses):

        phi_11 = r1
        phi_22 = (r2 - r1^2) / (1 - r1^2)
        phi_33 = (r3 - 2 r1 r2 - r1^2 r3 + r1 r2^2 + r1^3)
                 / (1 - 2 r1^2 - r2^2 + 2 r1^2 r2)

    (Cramer's rule on the order-2 and order-3 Toeplitz Yule-Walker
    systems — the Durbin-Levinson recursion unrolled, which keeps the
    whole screen a Column plan instead of a per-group UDF.) The
    +-2/sqrt(n) white-noise band gives the significance flag; the AR
    order suggestion is the highest significant lag. Lags beyond 3
    need the recursion proper — out of closed-form scope, documented
    here rather than hidden.

    Groups whose series is too short for a lag (r_k missing) emit NULL
    pacf for that lag. Returns (group, n_days, lag, pacf, band,
    significant).
    """
    acf = acf_ljung_box(df, group=group, ts=ts, value=value, max_lag=3)
    piv = acf.groupBy(group, "n_days").agg(
        F.max(F.when(F.col("lag") == 1, F.col("r"))).alias("r1"),
        F.max(F.when(F.col("lag") == 2, F.col("r"))).alias("r2"),
        F.max(F.when(F.col("lag") == 3, F.col("r"))).alias("r3"),
    )
    r1, r2, r3 = F.col("r1"), F.col("r2"), F.col("r3")
    p1 = r1
    den2 = 1.0 - r1 * r1
    p2 = F.when(F.abs(den2) > 1e-12, (r2 - r1 * r1) / den2)
    den3 = 1.0 - 2.0 * r1 * r1 - r2 * r2 + 2.0 * r1 * r1 * r2
    num3 = r3 - 2.0 * r1 * r2 - r1 * r1 * r3 + r1 * r2 * r2 + r1 * r1 * r1
    p3 = F.when(F.abs(den3) > 1e-12, num3 / den3)
    long = piv.select(
        group,
        "n_days",
        F.posexplode(F.array(p1, p2, p3)).alias("k0", "pacf"),
    ).select(
        group,
        "n_days",
        (F.col("k0") + 1).alias("lag"),
        F.round("pacf", 6).alias("pacf"),
    )
    band = 2.0 / F.sqrt(F.col("n_days").cast("double"))
    return long.filter(F.col("pacf").isNotNull()).select(
        group,
        "n_days",
        "lag",
        "pacf",
        F.round(band, 6).alias("band"),
        (F.abs(F.col("pacf")) > band).alias("significant"),
    )


def periodogram_screen(
    df: DataFrame,
    group: str = "event_type",
    ts: str = "ts",
    value: str | None = None,
    periods: tuple = (2, 3, 7),
    min_days: int = 8,
) -> DataFrame:
    """Discrete-Fourier power of the demeaned daily series at a small
    set of CANDIDATE periods, plus Fisher's g concentration ratio
    (max power / total candidate power) and the dominant-period flag.
    This is the period-DISCOVERY screen: seasonal_strength assumes you
    know the period; this ranks candidates when you don't, and a g
    near 1/len(periods) says no candidate dominates (no seasonality at
    these periods).

        A_p = sum_t d_t cos(2 pi t / p),  B_p = sum_t d_t sin(.)
        power_p = 2 (A_p^2 + B_p^2) / n      (d_t demeaned, t = 0..n-1)

    The day index t is the observed-day rank (gap days are not
    imputed — same regular-spacing convention as acf_ljung_box, stated
    rather than hidden). One raw-table shuffle into the daily
    relation; the trig sums are one aggregation over it; everything
    after runs on O(groups x periods) rows. Returns (group, n_days,
    period, power, power_share, fisher_g, dominant).
    """
    val = (
        F.count(F.lit(1)).cast("double")
        if value is None
        else F.avg(F.col(value))
    )
    daily = (
        df.groupBy(
            F.col(group).alias("g"),
            F.date_format(F.date_trunc("day", F.col(ts)), "yyyy-MM-dd").alias(
                "day"
            ),
        )
        .agg(val.alias("x"))
    )
    means = daily.groupBy("g").agg(
        F.avg("x").alias("mu"), F.count(F.lit(1)).alias("n_days")
    )
    w = Window.partitionBy("g").orderBy("day")
    t = (F.row_number().over(w) - 1).cast("double")
    dev = F.col("x") - F.col("mu")
    indexed = daily.join(means, "g").select(
        "g", "n_days", t.alias("t"), dev.alias("d")
    )
    aggs = []
    for p in periods:
        ang = 2.0 * math.pi / float(p) * F.col("t")
        aggs.append(F.sum(F.col("d") * F.cos(ang)).alias(f"a{p}"))
        aggs.append(F.sum(F.col("d") * F.sin(ang)).alias(f"b{p}"))
    sums = indexed.groupBy("g", "n_days").agg(*aggs)
    n = F.col("n_days").cast("double")
    powers = F.array(
        *[
            (
                2.0
                * (
                    F.col(f"a{p}") * F.col(f"a{p}")
                    + F.col(f"b{p}") * F.col(f"b{p}")
                )
                / n
            )
            for p in periods
        ]
    )
    period_arr = F.array(*[F.lit(int(p)) for p in periods])
    long = (
        sums.filter(F.col("n_days") >= min_days)
        .select(
            "g",
            "n_days",
            F.aggregate(
                powers, F.lit(0.0), lambda acc, x: acc + x
            ).alias("total"),
            F.array_max(powers).alias("pmax"),
            F.posexplode(powers).alias("k0", "power"),
        )
        .select(
            F.col("g").alias(group),
            "n_days",
            F.element_at(period_arr, F.col("k0") + 1).alias("period"),
            F.round("power", 6).alias("power"),
            F.when(
                F.col("total") > 0, F.round(F.col("power") / F.col("total"), 6)
            ).alias("power_share"),
            F.when(
                F.col("total") > 0, F.round(F.col("pmax") / F.col("total"), 6)
            ).alias("fisher_g"),
            (
                (F.col("total") > 0) & (F.col("power") == F.col("pmax"))
            ).alias("dominant"),
        )
    )
    return long


def effective_rank(
    df: DataFrame, vec_col: str, collapse_ratio: float = 0.25
) -> DataFrame:
    """Participation ratio (effective rank) of the embedding
    covariance spectrum, in closed form — no eigendecomposition, no
    power iteration:

        PR = tr(C)^2 / tr(C^2)
           = (sum_i lambda_i)^2 / sum_i lambda_i^2

    PR is d when the spectrum is flat (isotropic — healthy for
    retrieval) and 1 when one direction carries everything (collapsed
    — e.g. an un-centered corpus or a dead encoder). gram_spectrum
    reports the TOP eigenvalue's share via power iteration;
    PR summarizes the WHOLE spectrum and is exact, because both traces
    are polynomial in the covariance entries: tr(C) = sum_i C_ii and
    tr(C^2) = ||C||_F^2 with C = M/n - mu mu^T assembled from the
    mergeable (i, j, v) moment partials (similarity.moment_partials —
    one Arrow-batched pass, d^2 + d + 1 rows per batch, float64
    widening so an oracle summing the same products agrees).

    Flags collapse when PR / d < collapse_ratio. Returns one row:
    (n_vectors, dim, trace, frob2, effective_rank, rank_ratio,
    collapsed).
    """
    from .similarity import moment_partials

    tagged = df.withColumn("__one", F.lit("a"))
    parts = moment_partials(tagged, vec_col, "__one", "a", "a")
    # the O(d^2) sums relation feeds FOUR branches (n, mu twice,
    # second moments); localCheckpoint truncates the lineage so the
    # Arrow outer-product pass scans the raw table exactly once — the
    # diamond-plan convention of seasonal_strength/cochrane_orcutt
    sums = (
        parts.groupBy("i", "j")
        .agg(F.sum("v").alias("v"))
        .localCheckpoint(eager=True)
    )
    n_row = sums.filter((F.col("i") == -1) & (F.col("j") == -1)).select(
        F.col("v").alias("__n")
    )
    mu = sums.filter((F.col("i") >= 0) & (F.col("j") == -1)).select(
        F.col("i").alias("mi"), F.col("v").alias("ms")
    )
    second = sums.filter(F.col("j") >= 0)
    cov = (
        second.crossJoin(F.broadcast(n_row))
        .join(F.broadcast(mu).withColumnRenamed("mi", "i").withColumnRenamed("ms", "si"), "i")
        .join(F.broadcast(mu).withColumnRenamed("mi", "j").withColumnRenamed("ms", "sj"), "j")
        .select(
            "i",
            "j",
            (
                F.col("v") / F.col("__n")
                - (F.col("si") / F.col("__n")) * (F.col("sj") / F.col("__n"))
            ).alias("c"),
            "__n",
        )
    )
    agg = cov.agg(
        F.max("__n").alias("n"),
        (F.max("i") + 1).alias("dim"),
        F.sum(F.when(F.col("i") == F.col("j"), F.col("c"))).alias("tr"),
        F.sum(F.col("c") * F.col("c")).alias("fr2"),
    )
    pr = F.col("tr") * F.col("tr") / F.col("fr2")
    return agg.select(
        F.col("n").cast("long").alias("n_vectors"),
        F.col("dim").cast("int").alias("dim"),
        F.round("tr", 6).alias("trace"),
        F.round("fr2", 6).alias("frob2"),
        F.round(pr, 6).alias("effective_rank"),
        F.round(pr / F.col("dim"), 6).alias("rank_ratio"),
        (pr / F.col("dim") < collapse_ratio).alias("collapsed"),
    )
