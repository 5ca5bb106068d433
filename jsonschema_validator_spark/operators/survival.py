"""Survival analysis — the Kaplan-Meier product-limit estimator, the
standard right-censoring-aware form of "how long do users stay
active": naive mean lifetimes are biased low because still-active
users haven't finished their lifetime yet, and KM is the estimator
that uses them correctly (they stay in the at-risk denominator until
their censoring time, then leave without an event).

Reference parity note: outside the reference validator's scope
(macisamuele/jsonschema-validator validates keywords); this is the
analytics tier of SURVEY.md §2.

Scale: one-row-per-subject input reduces by ONE aggregation to the
O(groups x distinct-durations) block relation; the at-risk cumsum and
the cumulative product (as exp-of-summed-logs) are windows over that
reduced relation only — raw subjects never enter a window (the AUC /
gini pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def kaplan_meier(
    df: DataFrame,
    duration: str,
    event: str,
    group: str | None = None,
) -> DataFrame:
    """Kaplan-Meier survival curve per group.

    ``duration`` is the observed time (event time if ``event`` = 1,
    censoring time if 0); rows with NULL duration or event are
    excluded. Output has one row per (group?, t) where at least one
    EVENT occurred (censoring-only times move the at-risk count but
    are not curve steps, per the standard estimator):

        S(t) = prod_{t_j <= t} (1 - d_j / n_j)

    with d_j events and n_j at risk at t_j. The product is computed as
    exp(sum(ln(1 - d/n))) over the ordered block relation; a step
    where everyone at risk dies (d = n) sets survival to exactly 0.0
    from there on (tracked by a flag, not ln(0), which Spark nulls and
    other engines -inf). Returns (group?, t, n_risk, n_events,
    survival), survival rounded to 6.
    """
    gcols = [group] if group else []
    subj = df.filter(F.col(duration).isNotNull() & F.col(event).isNotNull()).select(
        *gcols,
        F.col(duration).cast("double").alias("__t"),
        F.col(event).cast("int").alias("__e"),
    )
    blocks = subj.groupBy(*gcols, "__t").agg(
        F.count(F.lit(1)).alias("__m"), F.sum("__e").alias("__d")
    )
    w = (
        Window.partitionBy(*gcols).orderBy("__t")
        if gcols
        else Window.partitionBy(F.lit(1)).orderBy("__t")
    )
    before = F.coalesce(
        F.sum("__m").over(w.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0)
    )
    total = F.sum("__m").over(
        w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    risked = blocks.withColumn("__n", total - before)
    factor = 1.0 - F.col("__d") / F.col("__n")
    stepped = risked.withColumn(
        "__lnf", F.when(factor > 0, F.log(factor))
    ).withColumn("__dead", (factor == 0).cast("int"))
    upto = w.rowsBetween(Window.unboundedPreceding, 0)
    curve = stepped.withColumn(
        "__surv",
        F.when(F.max("__dead").over(upto) == 1, F.lit(0.0)).otherwise(
            F.exp(F.sum("__lnf").over(upto))
        ),
    )
    return curve.filter(F.col("__d") > 0).select(
        *gcols,
        F.col("__t").alias("t"),
        F.col("__n").alias("n_risk"),
        F.col("__d").alias("n_events"),
        F.round("__surv", 6).alias("survival"),
    )


def nelson_aalen(
    df: DataFrame,
    duration: str,
    event: str,
    group: str | None = None,
) -> DataFrame:
    """Nelson-Aalen cumulative-hazard estimator per group — the
    additive sibling of the Kaplan-Meier product curve: H(t) =
    sum_{t_j <= t} d_j / n_j, with pointwise variance
    sum d_j / n_j^2 (Klein-Moeschberger form). Where KM answers "what
    fraction survives past t", H(t)'s SLOPE is the hazard itself —
    flat segments mean quiet periods, a steepening curve means the
    conversion/failure intensity is rising — and being a plain sum it
    is the better-behaved estimator at small risk sets (no product
    collapsing to 0 when one step kills everyone at risk).

    Same input contract and block-relation plan as kaplan_meier:
    rows reduce to (group?, t) with event/censor counts, at-risk from
    the reversed cumulative, and the hazard cumsum runs over the
    O(distinct times) relation only. Censoring-only times move the
    at-risk count but add no step. Returns (group?, t, n_risk,
    n_events, cum_hazard, var_hazard), floats rounded to 6.
    """
    gcols = [group] if group else []
    subj = df.filter(F.col(duration).isNotNull() & F.col(event).isNotNull()).select(
        *gcols,
        F.col(duration).cast("double").alias("__t"),
        F.col(event).cast("int").alias("__e"),
    )
    blocks = subj.groupBy(*gcols, "__t").agg(
        F.count(F.lit(1)).alias("__m"), F.sum("__e").alias("__d")
    )
    w = (
        Window.partitionBy(*gcols).orderBy("__t")
        if gcols
        else Window.partitionBy(F.lit(1)).orderBy("__t")
    )
    before = F.coalesce(
        F.sum("__m").over(w.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0)
    )
    total = F.sum("__m").over(
        w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    risked = blocks.withColumn("__n", (total - before).cast("double"))
    upto = w.rowsBetween(Window.unboundedPreceding, 0)
    hazard = F.sum(F.col("__d") / F.col("__n")).over(upto)
    var = F.sum(F.col("__d") / (F.col("__n") * F.col("__n"))).over(upto)
    out = risked.withColumn("__h", hazard).withColumn("__v", var)
    return out.filter(F.col("__d") > 0).select(
        *gcols,
        F.col("__t").alias("t"),
        F.col("__n").cast("long").alias("n_risk"),
        F.col("__d").alias("n_events"),
        F.round("__h", 6).alias("cum_hazard"),
        F.round("__v", 6).alias("var_hazard"),
    )


def log_rank(
    df: DataFrame,
    duration: str,
    event: str,
    group: str,
    group_a: str,
    group_b: str,
) -> DataFrame:
    """Two-sample log-rank (Mantel-Cox) test: are the survival curves
    of ``group_a`` and ``group_b`` the same? The hypothesis-test
    companion of the kaplan_meier curve — eyeballing two KM curves is
    not a verdict; the log-rank statistic is.

    At each pooled distinct EVENT time t_j the 2x2 table (group x
    event/no-event among those at risk) contributes observed events
    O_aj = d_aj, hypergeometric expectation E_aj = d_j * n_aj / n_j,
    and variance V_j = d_j (n_aj/n_j)(n_bj/n_j)(n_j - d_j)/(n_j - 1)
    (0 when n_j = 1). Z = (O_a - E_a)/sqrt(sum V_j); chi2 = Z^2 is
    chi-square(1) under H0; flag at the 5% critical value 3.841459.

    Scale: identical block-relation plan to kaplan_meier — subjects
    reduce by one aggregation to O(2 x distinct-durations) cells, the
    at-risk counts come from a cumsum over that reduced relation (the
    time x group grid is completed with a broadcast cross join so each
    group has an at-risk value at every POOLED time), and the final
    reduce is one aggregation. Raw subjects never enter a window.
    Returns one row: (group_a, group_b, n_a, n_b, o_a, e_a, var_a,
    z_stat, chi2, reject_5pct), floats rounded to 6.
    """
    subj = (
        df.filter(
            F.col(duration).isNotNull()
            & F.col(event).isNotNull()
            & F.col(group).isin(group_a, group_b)
        ).select(
            F.col(group).alias("__g"),
            F.col(duration).cast("double").alias("__t"),
            F.col(event).cast("int").alias("__e"),
        )
    )
    blocks = subj.groupBy("__g", "__t").agg(
        F.count(F.lit(1)).alias("__m"), F.sum("__e").alias("__d")
    )
    grid = (
        blocks.select("__t")
        .distinct()
        .crossJoin(F.broadcast(blocks.select("__g").distinct()))
    )
    cells = grid.join(blocks, ["__g", "__t"], "left").select(
        "__g",
        "__t",
        F.coalesce("__m", F.lit(0)).alias("__m"),
        F.coalesce("__d", F.lit(0)).alias("__d"),
    )
    w = Window.partitionBy("__g").orderBy("__t")
    before = F.coalesce(
        F.sum("__m").over(w.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0)
    )
    total = F.sum("__m").over(
        w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    risked = cells.withColumn("__n", (total - before).cast("double"))
    is_a = (F.col("__g") == group_a).cast("int")
    per_t = risked.groupBy("__t").agg(
        F.sum("__d").alias("__dj"),
        F.sum("__n").alias("__nj"),
        F.sum(F.col("__d") * is_a).alias("__da"),
        F.sum(F.col("__n") * is_a).alias("__na"),
    )
    ev_t = per_t.filter(F.col("__dj") > 0)
    frac_a = F.col("__na") / F.col("__nj")
    v_j = F.when(
        F.col("__nj") > 1,
        F.col("__dj")
        * frac_a
        * (1.0 - frac_a)
        * (F.col("__nj") - F.col("__dj"))
        / (F.col("__nj") - 1.0),
    ).otherwise(F.lit(0.0))
    tot = ev_t.agg(
        F.sum("__da").alias("__oa"),
        F.sum(F.col("__dj") * frac_a).alias("__ea"),
        F.sum(v_j).alias("__va"),
    )
    counts = subj.groupBy().agg(
        F.sum(is_a).alias("__cnt_a"),
        F.sum(1 - is_a).alias("__cnt_b"),
    )
    z = (F.col("__oa") - F.col("__ea")) / F.sqrt(F.col("__va"))
    return (
        tot.crossJoin(F.broadcast(counts))
        .select(
            F.lit(group_a).alias("group_a"),
            F.lit(group_b).alias("group_b"),
            F.col("__cnt_a").cast("long").alias("n_a"),
            F.col("__cnt_b").cast("long").alias("n_b"),
            F.col("__oa").cast("long").alias("o_a"),
            F.round("__ea", 6).alias("e_a"),
            F.round("__va", 6).alias("var_a"),
            F.when(F.col("__va") > 0, F.round(z, 6)).alias("z_stat"),
            F.when(F.col("__va") > 0, F.round(z * z, 6)).alias("chi2"),
            F.when(F.col("__va") > 0, (z * z) > 3.841459)
            .otherwise(F.lit(False))
            .alias("reject_5pct"),
        )
    )


def weibull_plot_fit(
    df: DataFrame,
    value_col: str,
    group: str | None = None,
) -> DataFrame:
    """Weibull shape/scale via the probability-plot regression — the
    parametric reading of the gap-time distributions Kaplan-Meier and
    the burstiness screen describe nonparametrically: shape k < 1 means
    DECREASING hazard (bursty arrivals, long quiet tails — retries and
    failure clusters), k ~ 1 is memoryless Poisson, k > 1 is
    wear-out/heartbeat rhythm. On positive durations with Benard median
    ranks F_i = (i - 0.3)/(n + 0.4):

        y_i = ln(-ln(1 - F_i)),  x_i = ln(v_(i))
        OLS y on x: slope = k, scale = exp(-intercept/k)

    Ranks come from one per-group sort of the reduced duration
    relation; tied durations may receive either rank order but
    contribute identical x with the same fixed rank set, so the fit is
    deterministic without a tie-break. Returns (group?, n, shape_k,
    scale, r2, decreasing_hazard); groups with n < 3 or zero duration
    variance yield NULL fit.
    """
    gcols = [group] if group else []
    v = F.col(value_col).cast("double")
    pos = df.filter(v.isNotNull() & (v > 0)).select(*gcols, v.alias("__v"))
    cnt = pos.groupBy(*gcols).agg(F.count(F.lit(1)).alias("n"))
    j = (
        pos.join(F.broadcast(cnt), gcols)
        if gcols
        else pos.crossJoin(F.broadcast(cnt))
    )
    w = (
        Window.partitionBy(*gcols)
        if gcols
        else Window.partitionBy(F.lit(1))
    ).orderBy("__v")
    ranked = j.select(
        *gcols, "n", "__v", F.row_number().over(w).alias("__r")
    )
    fi = (F.col("__r") - 0.3) / (F.col("n") + 0.4)
    x = F.log("__v")
    y = F.log(-F.log(1.0 - fi))
    fit = ranked.select(*gcols, "n", x.alias("__x"), y.alias("__y")).groupBy(
        *gcols
    ).agg(
        F.first("n").alias("n"),
        F.sum("__x").alias("__sx"),
        F.sum("__y").alias("__sy"),
        F.sum(F.col("__x") * F.col("__x")).alias("__sxx"),
        F.sum(F.col("__x") * F.col("__y")).alias("__sxy"),
        F.sum(F.col("__y") * F.col("__y")).alias("__syy"),
    )
    nd = F.col("n").cast("double")
    sxx = F.col("__sxx") - F.col("__sx") * F.col("__sx") / nd
    cov = F.col("__sxy") - F.col("__sx") * F.col("__sy") / nd
    syy = F.col("__syy") - F.col("__sy") * F.col("__sy") / nd
    k = F.try_divide(cov, F.when(sxx > 0, sxx))
    c = (F.col("__sy") - k * F.col("__sx")) / nd
    r2 = F.try_divide(cov * cov, F.when(sxx * syy > 0, sxx * syy))
    ok = (F.col("n") >= 3) & k.isNotNull() & (k > 0)
    return fit.select(
        *gcols,
        "n",
        F.when(ok, F.round(k, 6)).alias("shape_k"),
        F.when(ok, F.round(F.exp(-c / k), 6)).alias("scale"),
        F.when(ok, F.round(r2, 6)).alias("r2"),
        F.when(ok, k < 1.0).alias("decreasing_hazard"),
    )
