"""Round-4e operators: Hill tail index, Cook's distance, Durbin-Watson,
Hyndman seasonal/trend strength — the "can I trust my own screens" family:
heavy tails break z-scores, influential days break trend verdicts,
autocorrelated residuals break OLS bands, weekly rhythm breaks
unconditioned drift alerts."""

import datetime
import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F


# ---------------------------------------------------------------- hill_tail


def _vals(spark, vs, group=None):
    if group is None:
        return spark.createDataFrame([Row(v=float(x)) for x in vs])
    return spark.createDataFrame(
        [Row(g=g, v=float(x)) for g, x in zip(group, vs)]
    )


def test_hill_tail_hand_computed(spark):
    # k=3 over [100, 80, 60, 50, 10, 5, 2, 1]: gamma = mean(ln top-3)
    # - ln X_(4) = (ln100 + ln80 + ln60)/3 - ln50.
    from jsonschema_validator_spark.operators.anomaly import hill_tail

    r = hill_tail(
        _vals(spark, [100, 80, 60, 50, 10, 5, 2, 1]), "v", k=3
    ).collect()[0]
    gamma = (math.log(100) + math.log(80) + math.log(60)) / 3 - math.log(50)
    assert r["n_pos"] == 8
    assert r["k"] == 3
    assert r["x_k1"] == pytest.approx(50.0)
    assert r["hill_gamma"] == pytest.approx(gamma, abs=1e-6)
    assert r["tail_alpha"] == pytest.approx(1.0 / gamma, abs=1e-5)
    # alpha = 2.2297 >= 2 -> finite variance, flag False
    assert r["tail_alpha"] > 2.0
    assert r["infinite_variance"] is False


def test_hill_tail_boundary_ties_partial_multiplicity(spark):
    # k=2 over [5, 5, 5, 5, 2, 1]: the tied top block covers ranks 1-4,
    # so the top-2 log-mass is 2*ln5 and X_(3) is also 5 -> gamma = 0,
    # a degenerate top block: alpha NULL, never a division blow-up.
    from jsonschema_validator_spark.operators.anomaly import hill_tail

    r = hill_tail(_vals(spark, [5, 5, 5, 5, 2, 1]), "v", k=2).collect()[0]
    assert r["x_k1"] == pytest.approx(5.0)
    assert r["hill_gamma"] == pytest.approx(0.0, abs=1e-9)
    assert r["tail_alpha"] is None
    assert r["infinite_variance"] is None


def test_hill_tail_too_few_positives_null(spark):
    # k=5 needs at least 6 positive values; zeros/negatives/NULLs never
    # count (log undefined).
    from jsonschema_validator_spark.operators.anomaly import hill_tail

    df = _vals(spark, [10, 9, 8, -1, 0, 3]).union(
        _vals(spark, [7]).selectExpr("CAST(NULL AS DOUBLE) AS v")
    )
    r = hill_tail(df, "v", k=5).collect()[0]
    assert r["n_pos"] == 4
    assert r["x_k1"] is None and r["hill_gamma"] is None
    assert r["tail_alpha"] is None


def test_hill_tail_grouped_pareto_vs_uniform(spark):
    # Pareto(alpha=1) quantile grid has a MUCH heavier tail than the
    # matching uniform grid: the estimator must rank them that way and
    # flag only the Pareto side as infinite-variance.
    from jsonschema_validator_spark.operators.anomaly import hill_tail

    n = 400
    pareto = [1.0 / (1.0 - (i + 0.5) / n) for i in range(n)]  # alpha = 1
    unif = [1.0 + 9.0 * (i + 0.5) / n for i in range(n)]
    df = _vals(spark, pareto + unif, group=["p"] * n + ["u"] * n)
    rows = {r["g"]: r for r in hill_tail(df, "v", k=40, group="g").collect()}
    assert rows["p"]["tail_alpha"] == pytest.approx(1.0, rel=0.25)
    assert rows["p"]["infinite_variance"] is True
    assert rows["u"]["tail_alpha"] > 3.0
    assert rows["u"]["infinite_variance"] is False


# ----------------------------------------------------------- cooks_distance


def _xy(spark, ys):
    return spark.createDataFrame(
        [Row(x=float(i), y=float(y)) for i, y in enumerate(ys)]
    )


def test_cooks_distance_hand_computed(spark):
    # x=0..4, y=[0,1,2,3,10]: b=2.2, a=-1.2, s^2=14.4/3=4.8,
    # h=[.6,.3,.2,.3,.6]; D_4 = 2.4^2/9.6 * .6/.16 = 2.25 > 4/5 -> the
    # wild day is the ONLY influential point.
    from jsonschema_validator_spark.operators.stats import cooks_distance

    rows = {
        r["x"]: r
        for r in cooks_distance(_xy(spark, [0, 1, 2, 3, 10]), "x", "y").collect()
    }
    assert rows[4.0]["resid"] == pytest.approx(2.4)
    assert rows[4.0]["leverage"] == pytest.approx(0.6)
    assert rows[4.0]["cooks_d"] == pytest.approx(2.25)
    assert rows[4.0]["influential"] is True
    assert rows[0.0]["cooks_d"] == pytest.approx(0.5625)
    assert rows[0.0]["influential"] is False
    assert rows[2.0]["cooks_d"] == pytest.approx(0.046875)
    assert sum(1 for r in rows.values() if r["influential"]) == 1


def test_cooks_distance_perfect_fit_null(spark):
    # y = 3x + 1 exactly: s^2 = 0, D undefined -> NULL, residuals 0.
    from jsonschema_validator_spark.operators.stats import cooks_distance

    rows = cooks_distance(_xy(spark, [1, 4, 7, 10, 13]), "x", "y").collect()
    assert all(r["resid"] == 0.0 for r in rows)
    assert all(r["cooks_d"] is None and r["influential"] is None for r in rows)


def test_cooks_distance_min_points(spark):
    # n=3 < 4: leverage/resid still reported, D withheld (one residual
    # degree of freedom is not an influence verdict).
    from jsonschema_validator_spark.operators.stats import cooks_distance

    rows = cooks_distance(_xy(spark, [0, 2, 1]), "x", "y").collect()
    assert all(r["cooks_d"] is None for r in rows)
    assert all(r["leverage"] is not None for r in rows)


def test_cooks_distance_grouped_threshold_override(spark):
    # Same data in two groups; an explicit threshold=3.0 demotes the
    # D=2.25 point everywhere.
    from jsonschema_validator_spark.operators.stats import cooks_distance

    df = spark.createDataFrame(
        [
            Row(g=g, x=float(i), y=float(y))
            for g in ("a", "b")
            for i, y in enumerate([0, 1, 2, 3, 10])
        ]
    )
    rows = cooks_distance(df, "x", "y", group="g", threshold=3.0).collect()
    assert len(rows) == 10
    assert all(r["influential"] is False for r in rows if r["cooks_d"] is not None)


# ------------------------------------------------------------ durbin_watson


def _dw_expected(ys):
    """Replay the closed form: OLS fit, residuals in x order, DW."""
    n = len(ys)
    xs = list(range(n))
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    b = (sxy - sx * sy / n) / (sxx - sx * sx / n)
    a = (sy - b * sx) / n
    e = [y - (a + b * x) for x, y in zip(xs, ys)]
    ss = sum(v * v for v in e)
    sd = sum((e[i] - e[i - 1]) ** 2 for i in range(1, n))
    return b, sd / ss


def test_durbin_watson_hand_computed_negative_autocorr(spark):
    # Alternating residuals: x=0..3, y=[1,-1,1,-1] -> e=[.4,-1.2,1.2,-.4],
    # DW = 10.88/3.2 = 3.4 > 3 -> flagged (negative autocorrelation).
    from jsonschema_validator_spark.operators.timeseries import durbin_watson

    r = durbin_watson(_xy(spark, [1, -1, 1, -1]), "x", "y").collect()[0]
    assert r["n"] == 4
    assert r["slope"] == pytest.approx(-0.4)
    assert r["dw"] == pytest.approx(3.4)
    assert r["rho1"] == pytest.approx(-0.7)
    assert r["autocorr_flag"] is True


def test_durbin_watson_runs_series(spark):
    # Two long runs (half zeros then half ones): replayed closed form
    # gives DW = 1.833..., positive rho1, below the DW<1 rough flag.
    from jsonschema_validator_spark.operators.timeseries import durbin_watson

    ys = [0, 0, 0, 0, 1, 1, 1, 1]
    b, dw = _dw_expected(ys)
    r = durbin_watson(_xy(spark, ys), "x", "y").collect()[0]
    assert r["slope"] == pytest.approx(b, abs=1e-6)
    assert r["dw"] == pytest.approx(dw, abs=1e-6)
    assert r["rho1"] == pytest.approx(1 - dw / 2, abs=1e-6)
    assert r["autocorr_flag"] is False


def test_durbin_watson_perfect_fit_null(spark):
    # Zero residual sum of squares: DW undefined -> NULL, never 0/0.
    from jsonschema_validator_spark.operators.timeseries import durbin_watson

    r = durbin_watson(_xy(spark, [1, 3, 5, 7]), "x", "y").collect()[0]
    assert r["slope"] == pytest.approx(2.0)
    assert r["dw"] is None and r["autocorr_flag"] is None


def test_durbin_watson_grouped_independent(spark):
    from jsonschema_validator_spark.operators.timeseries import durbin_watson

    df = spark.createDataFrame(
        [Row(g="alt", x=float(i), y=float(y)) for i, y in enumerate([1, -1, 1, -1])]
        + [Row(g="lin", x=float(i), y=float(y)) for i, y in enumerate([1, 3, 5, 7])]
    )
    rows = {r["g"]: r for r in durbin_watson(df, "x", "y", group="g").collect()}
    assert rows["alt"]["dw"] == pytest.approx(3.4)
    assert rows["lin"]["dw"] is None


# -------------------------------------------------------- seasonal_strength


def _daily(spark, ys, start=datetime.date(2024, 1, 1), group="g"):
    return spark.createDataFrame(
        [
            Row(
                g=group,
                ts=datetime.datetime.combine(
                    start + datetime.timedelta(days=i), datetime.time(12)
                ),
                v=float(y),
            )
            for i, y in enumerate(ys)
        ]
    )


def test_seasonal_strength_pure_trend_plus_weekly(spark):
    # y = 10 + 0.5*i + s[i%7] with s orthogonal to both the intercept
    # and the day index (sum s = 0, sum p*s_p = 0 over the 4 full
    # weeks): OLS recovers the trend exactly, weekday means recover s
    # exactly, remainder is 0 -> both strengths are exactly 1.
    from jsonschema_validator_spark.operators.timeseries import (
        seasonal_strength,
    )

    s = [1, -2, 1, 0, 1, -2, 1]
    ys = [10 + 0.5 * i + s[i % 7] for i in range(28)]
    r = seasonal_strength(
        _daily(spark, ys), "ts", value=F.sum("v"), group="g"
    ).collect()[0]
    assert r["n_days"] == 28
    assert r["var_remainder"] == pytest.approx(0.0, abs=1e-9)
    assert r["trend_strength"] == pytest.approx(1.0)
    assert r["seasonal_strength"] == pytest.approx(1.0)


def test_seasonal_strength_flat_series_null(spark):
    # Constant series: detrended and deseasonalized variances are 0,
    # both strengths undefined -> NULL (a flat line is neither trendy
    # nor seasonal; claiming either would be vacuous).
    from jsonschema_validator_spark.operators.timeseries import (
        seasonal_strength,
    )

    r = seasonal_strength(
        _daily(spark, [5.0] * 28), "ts", value=F.sum("v"), group="g"
    ).collect()[0]
    assert r["var_remainder"] == pytest.approx(0.0, abs=1e-12)
    assert r["trend_strength"] is None
    assert r["seasonal_strength"] is None


def test_seasonal_strength_too_short_null(spark):
    # 7 days < two weekday cycles: every statistic withheld.
    from jsonschema_validator_spark.operators.timeseries import (
        seasonal_strength,
    )

    r = seasonal_strength(
        _daily(spark, [1, 2, 3, 4, 5, 6, 7]), "ts", value=F.sum("v"), group="g"
    ).collect()[0]
    assert r["n_days"] == 7
    assert r["var_remainder"] is None
    assert r["trend_strength"] is None and r["seasonal_strength"] is None


def test_seasonal_strength_noise_dominates(spark):
    # Deterministic "noise" (a 28-periodic ramp shuffled by a coprime
    # stride) with no weekly structure: seasonal strength must be far
    # below the pure-weekly case's 1.0.
    from jsonschema_validator_spark.operators.timeseries import (
        seasonal_strength,
    )

    ys = [float((i * 11) % 28) for i in range(28)]
    r = seasonal_strength(
        _daily(spark, ys), "ts", value=F.sum("v"), group="g"
    ).collect()[0]
    assert r["seasonal_strength"] is not None
    assert r["seasonal_strength"] < 0.5
