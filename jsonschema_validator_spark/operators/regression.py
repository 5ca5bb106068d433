"""Two-regressor ordinary least squares in closed form — Cramer's rule
on the centered normal equations — plus the collinearity (VIF) and
inference outputs a screen needs to be honest.

Positioning: the engine's regression surface so far is SIMPLE (one
regressor): cooks_distance (operators/stats.py), durbin_watson /
cochrane_orcutt (operators/timeseries.py) all fit y ~ x. The first
real question beyond that — "does x1 still matter once x2 is held
fixed?" — needs two regressors, and two is exactly the order where
the normal equations still solve by 2x2 Cramer on centered sums, so
the WHOLE fit stays a single map-side-combinable aggregation (ten
power/product sums) with no matrix library, no iteration, no UDF.
Three or more regressors need a linear solver — out of closed-form
scope by design; this module says so rather than hiding it.

    b1 = (S22 S1y - S12 S2y) / D,  b2 = (S11 S2y - S12 S1y) / D
    D  = S11 S22 - S12^2           (centered sums of squares/products)
    b0 = ybar - b1 x1bar - b2 x2bar

Inference: s^2 = SSE / (n - 3); se(b1) = sqrt(s^2 S22 / D),
se(b2) = sqrt(s^2 S11 / D) — the classical (X'X)^-1 diagonal, which
for the 2x2 centered system is again closed form. t critical is
caller-pinned (default 1.96, the asymptotic 5% two-sided value; a
Column plan cannot invert the t CDF — same pinned-constant contract
as pairwise_welch). VIF = 1 / (1 - r12^2) applies to both slopes in
the two-regressor case.

Scale shape: one groupBy aggregation over the raw table (map-side
combinable power sums); all remaining algebra on the O(groups)
aggregate. NULL in any of (y, x1, x2) drops the row from the fit
(complete-case, stated).

Reference provenance: /root/reference (Rust skeleton) has no stats
layer; extends SURVEY §2.4's engine-level checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ols2(
    df: DataFrame,
    y: str,
    x1: str,
    x2: str,
    group: str | None = None,
    t_crit: float = 1.96,
    min_n: int = 8,
) -> DataFrame:
    """Fit y ~ b0 + b1*x1 + b2*x2 per group (one global row when
    ``group`` is None). Returns (group?, n, b0, b1, b2, se_b1, se_b2,
    t_b1, t_b2, sig_b1, sig_b2, r2, adj_r2, vif, collinear) — with
    NULL slopes when the design is singular (D ~ 0: x1, x2 perfectly
    collinear or constant) and `collinear` True when VIF > 10 (the
    standard rule-of-thumb cutoff, at which point the individual
    slopes stop being interpretable even though the fit is fine).
    """
    cy = F.col(y).cast("double")
    c1 = F.col(x1).cast("double")
    c2 = F.col(x2).cast("double")
    base = df.filter(cy.isNotNull() & c1.isNotNull() & c2.isNotNull())
    keys = [F.col(group).alias("g")] if group else []
    agg = base.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(c1).alias("sx1"),
        F.sum(c2).alias("sx2"),
        F.sum(cy).alias("sy"),
        F.sum(c1 * c1).alias("sx11"),
        F.sum(c2 * c2).alias("sx22"),
        F.sum(c1 * c2).alias("sx12"),
        F.sum(c1 * cy).alias("sx1y"),
        F.sum(c2 * cy).alias("sx2y"),
        F.sum(cy * cy).alias("syy"),
    )
    n = F.col("n")
    m1 = F.col("sx1") / n
    m2 = F.col("sx2") / n
    my = F.col("sy") / n
    s11 = F.col("sx11") - n * m1 * m1
    s22 = F.col("sx22") - n * m2 * m2
    s12 = F.col("sx12") - n * m1 * m2
    s1y = F.col("sx1y") - n * m1 * my
    s2y = F.col("sx2y") - n * m2 * my
    syy = F.col("syy") - n * my * my
    d = s11 * s22 - s12 * s12
    ok = (F.abs(d) > 1e-12) & (syy > 0)
    b1 = F.when(ok, (s22 * s1y - s12 * s2y) / d)
    b2 = F.when(ok, (s11 * s2y - s12 * s1y) / d)
    b0 = F.when(ok, my - b1 * m1 - b2 * m2)
    ssr = b1 * s1y + b2 * s2y
    sse = syy - ssr
    r2 = ssr / syy
    adj = 1.0 - (1.0 - r2) * (n - 1.0) / (n - 3.0)
    s2 = sse / (n - 3.0)
    se1 = F.sqrt(s2 * s22 / d)
    se2 = F.sqrt(s2 * s11 / d)
    t1 = b1 / se1
    t2 = b2 / se2
    r12sq = F.when((s11 > 0) & (s22 > 0), s12 * s12 / (s11 * s22))
    vif = F.when(r12sq < 1.0, 1.0 / (1.0 - r12sq))
    cols = []
    if group:
        cols.append(F.col("g").alias(group))
    cols += [
        n.cast("long").alias("n"),
        F.round(b0, 6).alias("b0"),
        F.round(b1, 6).alias("b1"),
        F.round(b2, 6).alias("b2"),
        F.round(se1, 6).alias("se_b1"),
        F.round(se2, 6).alias("se_b2"),
        F.round(t1, 6).alias("t_b1"),
        F.round(t2, 6).alias("t_b2"),
        F.when(ok, F.abs(t1) > t_crit).alias("sig_b1"),
        F.when(ok, F.abs(t2) > t_crit).alias("sig_b2"),
        F.round(r2, 6).alias("r2"),
        F.round(adj, 6).alias("adj_r2"),
        F.round(vif, 6).alias("vif"),
        F.when(vif.isNotNull(), vif > 10.0).alias("collinear"),
    ]
    return agg.filter(n >= min_n).select(*cols)
