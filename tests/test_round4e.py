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


# --------------------------------------------------------- poisson_bootstrap


_P1_CDF = (
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238462,
    0.9963401531726563,
    0.9994058151824183,
)


def _boot_replay(pairs, B):
    """Pure-python replay of the mixer -> Poisson weight -> replicate
    mean pipeline, bit-for-bit with the Column algebra."""

    def mix(k):
        h = (k % (1 << 31)) * 2654435761
        return h ^ (h >> 29)

    def w(k, b):
        u = ((mix(k * B + b) % 1000000) + 1.0) / 1000001.0
        for j, c in enumerate(_P1_CDF):
            if u < c:
                return float(j)
        return 6.0

    means = []
    for b in range(B):
        sw = swv = 0.0
        for k, v in pairs:
            ww = w(k, b)
            sw += ww
            swv += ww * v
        means.append(swv / sw if sw > 0 else None)
    ms = [m for m in means if m is not None]
    mu = sum(ms) / len(ms)
    var = sum((m - mu) ** 2 for m in ms) / (len(ms) - 1)
    return mu, math.sqrt(var)


def test_poisson_bootstrap_matches_exact_replay(spark):
    # Same mixer, same CDF inversion, same replicate algebra: the Spark
    # result must equal the scalar replay to the rounding digit.
    from jsonschema_validator_spark.operators.stats import poisson_bootstrap

    pairs = [(k, float((k * 7) % 13)) for k in range(1, 41)]
    df = spark.createDataFrame([Row(k=k, v=v) for k, v in pairs])
    r = poisson_bootstrap(df, "v", "k", B=8).collect()[0]
    mu, se = _boot_replay(pairs, 8)
    assert r["n"] == 40 and r["b"] == 8
    assert r["mean"] == pytest.approx(
        sum(v for _, v in pairs) / 40, abs=1e-6
    )
    assert r["boot_mean"] == pytest.approx(mu, abs=1e-6)
    assert r["boot_se"] == pytest.approx(se, abs=1e-6)
    assert r["ci_lo"] == pytest.approx(r["mean"] - 1.959964 * r["boot_se"], abs=1e-5)


def test_poisson_bootstrap_single_row_null_se(spark):
    from jsonschema_validator_spark.operators.stats import poisson_bootstrap

    df = spark.createDataFrame([Row(k=1, v=5.0)])
    r = poisson_bootstrap(df, "v", "k", B=8).collect()[0]
    assert r["n"] == 1
    assert r["boot_se"] is None and r["ci_lo"] is None


def test_poisson_bootstrap_se_tracks_spread(spark):
    # Two groups with identical n but 10x the spread: the bootstrap SE
    # must scale with it (calibration, not just determinism).
    from jsonschema_validator_spark.operators.stats import poisson_bootstrap

    rows = [
        Row(g="narrow", k=k, v=float(k % 5)) for k in range(400)
    ] + [Row(g="wide", k=k, v=float((k % 5) * 10)) for k in range(400)]
    out = {
        r["g"]: r
        for r in poisson_bootstrap(
            spark.createDataFrame(rows), "v", "k", B=32, group="g"
        ).collect()
    }
    # (each side independently rounded to 6 digits before the compare)
    assert out["wide"]["boot_se"] == pytest.approx(
        10 * out["narrow"]["boot_se"], abs=1e-4
    )


# ------------------------------------------------------------- kpss_level


def _kpss_replay(ys, lags):
    n = len(ys)
    mu = sum(ys) / n
    e = [y - mu for y in ys]
    s = []
    acc = 0.0
    for v in e:
        acc += v
        s.append(acc)
    eta = sum(v * v for v in s) / (n * n)
    lrv = sum(v * v for v in e) / n
    for j in range(1, lags + 1):
        gj = sum(e[t] * e[t - j] for t in range(j, n)) / n
        lrv += 2.0 * (1.0 - j / (lags + 1.0)) * gj
    return eta, lrv


def test_kpss_ramp_rejects_level_stationarity(spark):
    # A pure ramp is the canonical level-KPSS rejection: partial sums
    # of the demeaned series grow quadratically.
    from jsonschema_validator_spark.operators.timeseries import kpss_level

    ys = [float(i) for i in range(30)]
    eta, lrv = _kpss_replay(ys, 2)
    r = kpss_level(_xy(spark, ys), "x", "y", lags=2).collect()[0]
    assert r["eta"] == pytest.approx(eta, abs=1e-5)
    assert r["lrv"] == pytest.approx(lrv, abs=1e-5)
    assert r["kpss_stat"] == pytest.approx(eta / lrv, abs=1e-5)
    assert r["kpss_stat"] > 0.463
    assert r["nonstationary_5pct"] is True


def test_kpss_alternating_is_stationary(spark):
    # Alternating +/-1 around a level: partial sums stay bounded ->
    # tiny statistic, no rejection.
    from jsonschema_validator_spark.operators.timeseries import kpss_level

    ys = [1.0 if i % 2 == 0 else -1.0 for i in range(30)]
    eta, lrv = _kpss_replay(ys, 2)
    r = kpss_level(_xy(spark, ys), "x", "y", lags=2).collect()[0]
    assert r["kpss_stat"] == pytest.approx(eta / lrv, abs=1e-5)
    assert r["nonstationary_5pct"] is False


def test_kpss_flat_series_null(spark):
    from jsonschema_validator_spark.operators.timeseries import kpss_level

    r = kpss_level(_xy(spark, [3.0] * 12), "x", "y", lags=2).collect()[0]
    assert r["kpss_stat"] is None and r["nonstationary_5pct"] is None


# --------------------------------------------------------- cochrane_orcutt


def test_cochrane_orcutt_matches_replay(spark):
    # AR(1)-flavored residuals on a known trend; replay the two-fit
    # closed form and require exact agreement.
    from jsonschema_validator_spark.operators.timeseries import (
        cochrane_orcutt,
    )

    n = 20
    u = [0.0]
    for i in range(1, n):
        u.append(0.7 * u[-1] + ((i * 13) % 7 - 3.0))
    ys = [2.0 + 0.5 * i + u[i] for i in range(n)]
    xs = list(range(n))
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    b = (sxy - sx * sy / n) / (sxx - sx * sx / n)
    a = (sy - b * sx) / n
    e = [y - (a + b * x) for x, y in zip(xs, ys)]
    rho = sum(e[t] * e[t - 1] for t in range(1, n)) / sum(
        e[t - 1] ** 2 for t in range(1, n)
    )
    xq = [xs[t] - rho * xs[t - 1] for t in range(1, n)]
    yq = [ys[t] - rho * ys[t - 1] for t in range(1, n)]
    n2 = n - 1
    sx2, sy2 = sum(xq), sum(yq)
    sxx2 = sum(x * x for x in xq)
    sxy2 = sum(x * y for x, y in zip(xq, yq))
    b2 = (sxy2 - sx2 * sy2 / n2) / (sxx2 - sx2 * sx2 / n2)

    r = cochrane_orcutt(_xy(spark, ys), "x", "y").collect()[0]
    assert r["slope_ols"] == pytest.approx(b, abs=1e-6)
    assert r["rho"] == pytest.approx(rho, abs=1e-6)
    assert r["slope_corrected"] == pytest.approx(b2, abs=1e-6)
    assert r["slope_shift"] == pytest.approx(b2 - b, abs=1e-6)


def test_cochrane_orcutt_perfect_fit_null_rho(spark):
    # Zero residuals: rho undefined -> no correction, NULLs not 0/0.
    from jsonschema_validator_spark.operators.timeseries import (
        cochrane_orcutt,
    )

    r = cochrane_orcutt(_xy(spark, [1, 3, 5, 7, 9]), "x", "y").collect()[0]
    assert r["slope_ols"] == pytest.approx(2.0)
    assert r["rho"] is None and r["slope_corrected"] is None


def test_cochrane_orcutt_min_n_withheld(spark):
    # n=3: rho and the refit exist arithmetically but the verdict is
    # withheld (quasi-differencing 2 points is not a trend).
    from jsonschema_validator_spark.operators.timeseries import (
        cochrane_orcutt,
    )

    r = cochrane_orcutt(_xy(spark, [0, 2, 1]), "x", "y").collect()[0]
    assert r["slope_corrected"] is None and r["slope_shift"] is None


# ---------------------------------------------------------------- poly_mmd


def test_poly_mmd_hand_computed(spark):
    # a = {(1,0),(0,1)}, b = {(2,0),(0,2)}: mu_a=(.5,.5), mu_b=(1,1) ->
    # lin = 0.5; M_a = diag(.5), M_b = diag(2) -> quad = 2*(1.5)^2 = 4.5;
    # mmd2 = 4.5 + 2*0.5 = 5.5 at c=1.
    from jsonschema_validator_spark.operators.similarity import poly_mmd

    df = spark.createDataFrame(
        [
            Row(s="a", v=[1.0, 0.0]),
            Row(s="a", v=[0.0, 1.0]),
            Row(s="b", v=[2.0, 0.0]),
            Row(s="b", v=[0.0, 2.0]),
        ]
    )
    r = poly_mmd(df, "v", "s", "a", "b").collect()[0]
    assert (r["n_a"], r["n_b"]) == (2, 2)
    assert r["mmd2_linear"] == pytest.approx(0.5)
    assert r["mmd2_quadratic"] == pytest.approx(4.5)
    assert r["mmd2"] == pytest.approx(5.5)


def test_poly_mmd_identical_samples_zero(spark):
    # The same point set in both samples: every moment matches, MMD^2
    # must round to exactly 0 (no spurious kernel-noise floor).
    from jsonschema_validator_spark.operators.similarity import poly_mmd

    pts = [[float((i * 3) % 7), float((i * 5) % 11)] for i in range(20)]
    df = spark.createDataFrame(
        [Row(s="a", v=p) for p in pts] + [Row(s="b", v=p) for p in pts]
    )
    r = poly_mmd(df, "v", "s", "a", "b").collect()[0]
    assert r["mmd2"] == 0.0
    assert r["mmd2_linear"] == 0.0 and r["mmd2_quadratic"] == 0.0


def test_poly_mmd_missing_side_null(spark):
    from jsonschema_validator_spark.operators.similarity import poly_mmd

    df = spark.createDataFrame([Row(s="a", v=[1.0, 2.0])])
    r = poly_mmd(df, "v", "s", "a", "b").collect()[0]
    assert r["n_b"] is None and r["mmd2"] is None


def test_poly_mmd_covariance_only_shift(spark):
    # Same mean, rotated covariance: the linear term must stay ~0 while
    # the quadratic term fires — the case a mean-vector drift check is
    # structurally blind to.
    from jsonschema_validator_spark.operators.similarity import poly_mmd

    a = [[1.0, 1.0], [-1.0, -1.0], [2.0, 2.0], [-2.0, -2.0]]  # corr +1
    b = [[1.0, -1.0], [-1.0, 1.0], [2.0, -2.0], [-2.0, 2.0]]  # corr -1
    df = spark.createDataFrame(
        [Row(s="a", v=p) for p in a] + [Row(s="b", v=p) for p in b]
    )
    r = poly_mmd(df, "v", "s", "a", "b").collect()[0]
    assert r["mmd2_linear"] == 0.0
    assert r["mmd2_quadratic"] > 1.0


# ---------------------------------------------------- mahalanobis_outliers


def test_mahalanobis_flags_planted_scale_bug(spark):
    # 60 well-behaved 4-d vectors + one scaled 10x: only the planted
    # vector crosses z=3.
    from jsonschema_validator_spark.operators.similarity import (
        mahalanobis_outliers,
    )

    base = [
        [
            float((i * 3) % 7 - 3),
            float((i * 5) % 11 - 5),
            float((i * 7) % 13 - 6),
            float((i * 11) % 17 - 8),
        ]
        for i in range(60)
    ]
    rows = [Row(id=i, v=p) for i, p in enumerate(base)]
    rows.append(Row(id=999, v=[40.0, 50.0, 60.0, 70.0]))
    out = mahalanobis_outliers(
        spark.createDataFrame(rows), "id", "v"
    ).collect()
    assert [r["id"] for r in out] == [999]
    assert out[0]["d_eff"] == 4
    assert out[0]["z"] > 3.0


def test_mahalanobis_zero_variance_dim_excluded(spark):
    # A constant dimension carries no information: it must drop out of
    # d_eff instead of dividing by zero.
    from jsonschema_validator_spark.operators.similarity import (
        mahalanobis_outliers,
    )

    rows = [
        Row(id=i, v=[float((i * 3) % 7 - 3), 5.0, float((i * 5) % 11 - 5)])
        for i in range(40)
    ]
    rows.append(Row(id=777, v=[90.0, 5.0, -90.0]))
    out = mahalanobis_outliers(spark.createDataFrame(rows), "id", "v").collect()
    assert [r["id"] for r in out] == [777]
    assert out[0]["d_eff"] == 2


def test_mahalanobis_clean_corpus_empty(spark):
    from jsonschema_validator_spark.operators.similarity import (
        mahalanobis_outliers,
    )

    rows = [
        Row(id=i, v=[float((i * 3) % 7 - 3), float((i * 5) % 11 - 5)])
        for i in range(50)
    ]
    assert mahalanobis_outliers(spark.createDataFrame(rows), "id", "v").count() == 0


# ---------------------------------------------------------- species_richness


def test_species_richness_hand_computed(spark):
    # Tokens: a a a b b c d e -> N=8, S=5, n1=3 (c,d,e), n2=1 (b):
    # missing_mass = 3/8, chao1 = 5 + 3*2/(2*2) = 6.5.
    from jsonschema_validator_spark.operators.textstats import (
        species_richness,
    )

    toks = list("aaabbcde")
    df = spark.createDataFrame([Row(t=c) for c in toks])
    r = species_richness(df, "t").collect()[0]
    assert (r["n_tokens"], r["n_types"]) == (8, 5)
    assert (r["singletons"], r["doubletons"]) == (3, 1)
    assert r["missing_mass"] == pytest.approx(0.375)
    assert r["coverage"] == pytest.approx(0.625)
    assert r["chao1"] == pytest.approx(6.5)
    assert r["undetected_types"] == pytest.approx(1.5)


def test_species_richness_saturated_corpus(spark):
    # Every type seen many times: no singletons -> missing mass 0 and
    # chao1 collapses to the observed count (nothing left to find).
    from jsonschema_validator_spark.operators.textstats import (
        species_richness,
    )

    df = spark.createDataFrame([Row(t=c) for c in "ababab" * 5])
    r = species_richness(df, "t").collect()[0]
    assert r["missing_mass"] == 0.0
    assert r["chao1"] == pytest.approx(r["n_types"])
    assert r["undetected_types"] == 0.0


def test_species_richness_all_singletons(spark):
    # Every token unique: missing mass 1 (the next token is certainly
    # new) and chao1 explodes past S_obs — the unsaturated extreme.
    from jsonschema_validator_spark.operators.textstats import (
        species_richness,
    )

    df = spark.createDataFrame([Row(t=f"w{i}") for i in range(10)])
    r = species_richness(df, "t").collect()[0]
    assert r["missing_mass"] == 1.0
    assert r["chao1"] > r["n_types"] * 4


# ---------------------------------------------------------- weibull_plot_fit


def _weibull_replay(vals):
    n = len(vals)
    sv = sorted(vals)
    xs = [math.log(v) for v in sv]
    ys = [
        math.log(-math.log(1.0 - (i + 1 - 0.3) / (n + 0.4)))
        for i in range(n)
    ]
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    k = (sxy - sx * sy / n) / (sxx - sx * sx / n)
    c = (sy - k * sx) / n
    return k, math.exp(-c / k)


def test_weibull_recovers_exponential_shape(spark):
    # Exponential quantile grid (Weibull k=1, scale 5): the plot fit
    # must recover k ~ 1 and scale ~ 5.
    from jsonschema_validator_spark.operators.survival import (
        weibull_plot_fit,
    )

    n = 200
    vals = [-5.0 * math.log(1.0 - (i + 0.5) / n) for i in range(n)]
    r = weibull_plot_fit(
        spark.createDataFrame([Row(v=v) for v in vals]), "v"
    ).collect()[0]
    assert r["shape_k"] == pytest.approx(1.0, abs=0.05)
    assert r["scale"] == pytest.approx(5.0, rel=0.05)
    assert r["r2"] > 0.99
    # (k sits a hair under 1 on the finite grid, so the knife-edge
    # decreasing-hazard flag is asserted on the clear k=2 case below)
    rayleigh = [
        3.0 * math.sqrt(-math.log(1.0 - (i + 0.5) / 100)) for i in range(100)
    ]
    r2 = weibull_plot_fit(
        spark.createDataFrame([Row(v=v) for v in rayleigh]), "v"
    ).collect()[0]
    assert r2["shape_k"] == pytest.approx(2.0, abs=0.1)
    assert r2["decreasing_hazard"] is False


def test_weibull_matches_replay_and_flags_bursty(spark):
    # Weibull(k=0.5) quantile grid: decreasing hazard must flag, and
    # the fit must equal the scalar replay of the same median-rank
    # regression.
    from jsonschema_validator_spark.operators.survival import (
        weibull_plot_fit,
    )

    n = 100
    vals = [2.0 * (-math.log(1.0 - (i + 0.5) / n)) ** 2 for i in range(n)]
    k, scale = _weibull_replay(vals)
    r = weibull_plot_fit(
        spark.createDataFrame([Row(v=v) for v in vals]), "v"
    ).collect()[0]
    assert r["shape_k"] == pytest.approx(k, abs=1e-6)
    assert r["scale"] == pytest.approx(scale, abs=1e-4)
    assert r["shape_k"] < 1.0
    assert r["decreasing_hazard"] is True


def test_weibull_degenerate_constant_gaps(spark):
    # All durations equal: zero x-variance, fit undefined -> NULLs.
    from jsonschema_validator_spark.operators.survival import (
        weibull_plot_fit,
    )

    r = weibull_plot_fit(
        spark.createDataFrame([Row(v=2.0)] * 10), "v"
    ).collect()[0]
    assert r["shape_k"] is None and r["decreasing_hazard"] is None


def test_weibull_nonpositive_excluded(spark):
    from jsonschema_validator_spark.operators.survival import (
        weibull_plot_fit,
    )

    vals = [1.0, 2.0, 3.0, 4.0, 0.0, -1.0]
    r = weibull_plot_fit(
        spark.createDataFrame([Row(v=v) for v in vals]), "v"
    ).collect()[0]
    assert r["n"] == 4


# ------------------------------------------------------------ pairwise_welch


def test_pairwise_welch_hand_computed(spark):
    # a: mean 0, var 1 over {-1,0,1}x4 (n=12); b: mean 5 same spread ->
    # z = -5/sqrt(2*v/12); c tiny n for a third pair set.
    from jsonschema_validator_spark.operators.stats import pairwise_welch

    rows = (
        [Row(g="a", v=float(x)) for x in [-1, 0, 1] * 4]
        + [Row(g="b", v=float(x + 5)) for x in [-1, 0, 1] * 4]
        + [Row(g="c", v=float(x)) for x in [0, 10]]
    )
    out = {
        (r["group_a"], r["group_b"]): r
        for r in pairwise_welch(
            spark.createDataFrame(rows), "v", "g", z_crit=2.807034
        ).collect()
    }
    ab = out[("a", "b")]
    var = 8.0 / 11.0  # var_samp of {-1,0,1}x4
    se = math.sqrt(2 * var / 12)
    assert ab["mean_diff"] == pytest.approx(-5.0)
    assert ab["se"] == pytest.approx(se, abs=1e-6)
    assert ab["z"] == pytest.approx(-5.0 / se, abs=1e-4)
    assert ab["significant"] is True
    ac = out[("a", "c")]
    assert ac["significant"] is False  # huge se from n=2 spread-10 side
    assert len(out) == 3


def test_pairwise_welch_zero_variance_side_null(spark):
    # One group constant with n >= 2: var 0 but the OTHER side's
    # variance keeps se > 0 -> still testable; both constant -> NULL.
    from jsonschema_validator_spark.operators.stats import pairwise_welch

    rows = [Row(g="a", v=3.0)] * 5 + [Row(g="b", v=4.0)] * 5
    r = pairwise_welch(spark.createDataFrame(rows), "v", "g").collect()[0]
    assert r["se"] is None and r["z"] is None and r["significant"] is None
    assert r["mean_diff"] == pytest.approx(-1.0)


# ------------------------------------------------------------ brown_forsythe


def test_brown_forsythe_equal_spread_accepts(spark):
    # Same shape in both groups (shifted): deviations from the medians
    # are identical -> F ~ 0, no heteroscedasticity verdict.
    from jsonschema_validator_spark.operators.stats import brown_forsythe

    base = [-2.0, -1.0, 0.0, 1.0, 2.0] * 6
    rows = [Row(g="a", v=x) for x in base] + [
        Row(g="b", v=x + 100) for x in base
    ]
    r = brown_forsythe(
        spark.createDataFrame(rows), "v", "g", f_crit=3.9
    ).collect()[0]
    assert r["k"] == 2 and r["n"] == 60
    assert r["f_stat"] == pytest.approx(0.0, abs=1e-9)
    assert r["heteroscedastic"] is False


def test_brown_forsythe_tenfold_spread_rejects(spark):
    from jsonschema_validator_spark.operators.stats import brown_forsythe

    base = [-2.0, -1.0, 0.0, 1.0, 2.0] * 6
    rows = [Row(g="a", v=x) for x in base] + [
        Row(g="b", v=10 * x) for x in base
    ]
    r = brown_forsythe(
        spark.createDataFrame(rows), "v", "g", f_crit=3.9
    ).collect()[0]
    assert r["f_stat"] > 3.9
    assert r["heteroscedastic"] is True


def test_brown_forsythe_no_crit_reports_stat_only(spark):
    from jsonschema_validator_spark.operators.stats import brown_forsythe

    rows = [Row(g="a", v=float(i)) for i in range(10)] + [
        Row(g="b", v=float(3 * i)) for i in range(10)
    ]
    r = brown_forsythe(spark.createDataFrame(rows), "v", "g").collect()[0]
    assert r["f_stat"] is not None
    assert r["heteroscedastic"] is None


# -------------------------------------------------------- partial_correlation


def test_partial_correlation_pure_confounder(spark):
    # x = z + tiny x-noise, y = z + tiny y-noise with orthogonal noise
    # patterns: r_xy is almost 1 purely through z; holding z fixed the
    # residual correlation collapses -> confounded flag fires.
    from jsonschema_validator_spark.operators.stats import (
        partial_correlation,
    )

    rows = []
    for i in range(60):
        zv = float(i)
        nx = 0.1 * ((i * 7) % 11 - 5)
        ny = 0.1 * ((i * 5) % 13 - 6)
        rows.append(Row(x=zv + nx, y=zv + ny, z=zv))
    r = partial_correlation(
        spark.createDataFrame(rows), "x", "y", "z"
    ).collect()[0]
    assert r["r_xy"] > 0.99
    assert abs(r["r_partial"]) < 0.1
    assert r["confounded"] is True


def test_partial_correlation_direct_link_survives(spark):
    # y = x + noise with z independent: partialling z out changes
    # nothing, the correlation is real.
    from jsonschema_validator_spark.operators.stats import (
        partial_correlation,
    )

    rows = [
        Row(
            x=float(i),
            y=float(i) + 0.5 * ((i * 7) % 11 - 5),
            z=float((i * 13) % 17),
        )
        for i in range(60)
    ]
    r = partial_correlation(
        spark.createDataFrame(rows), "x", "y", "z"
    ).collect()[0]
    assert r["r_xy"] > 0.9
    assert r["r_partial"] > 0.9
    assert r["confounded"] is False


def test_partial_correlation_replay_formula(spark):
    # r_xy.z must equal the textbook recursion computed from the three
    # plain correlations the operator itself reports.
    from jsonschema_validator_spark.operators.stats import (
        partial_correlation,
    )

    rows = [
        Row(
            x=float((i * 3) % 7),
            y=float((i * 5) % 11),
            z=float((i * 2) % 5),
        )
        for i in range(50)
    ]
    r = partial_correlation(
        spark.createDataFrame(rows), "x", "y", "z"
    ).collect()[0]
    expect = (r["r_xy"] - r["r_xz"] * r["r_yz"]) / math.sqrt(
        (1 - r["r_xz"] ** 2) * (1 - r["r_yz"] ** 2)
    )
    assert r["r_partial"] == pytest.approx(expect, abs=1e-5)


def test_partial_correlation_constant_z_null(spark):
    # Constant confounder: r_xz undefined -> partial undefined, NULL.
    from jsonschema_validator_spark.operators.stats import (
        partial_correlation,
    )

    rows = [Row(x=float(i), y=float(2 * i), z=7.0) for i in range(20)]
    r = partial_correlation(
        spark.createDataFrame(rows), "x", "y", "z"
    ).collect()[0]
    assert r["r_partial"] is None and r["confounded"] is None


# ------------------------------------------------------------ quantile_shift


def test_quantile_shift_pure_location(spark):
    # b = a + 10 elementwise: every decile shifts by exactly 10.
    from jsonschema_validator_spark.operators.drift import quantile_shift

    avals = [float(i) for i in range(100)]
    rows = [Row(s="a", v=v) for v in avals] + [
        Row(s="b", v=v + 10) for v in avals
    ]
    out = quantile_shift(
        spark.createDataFrame(rows), "v", "s", "a", "b"
    ).collect()
    assert len(out) == 9
    assert all(r["shift"] == pytest.approx(10.0, abs=1e-9) for r in out)
    assert [r["q"] for r in out] == pytest.approx(
        [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]
    )


def test_quantile_shift_tail_only_inflation(spark):
    # b doubles only above its p80: low deciles stay put, the p90
    # shift dwarfs the median shift — the exact pattern KS can detect
    # but never localize.
    from jsonschema_validator_spark.operators.drift import quantile_shift

    avals = [float(i) for i in range(100)]
    bvals = [v if v < 80 else v * 2 for v in avals]
    rows = [Row(s="a", v=v) for v in avals] + [
        Row(s="b", v=v) for v in bvals
    ]
    out = {
        round(r["q"], 1): r
        for r in quantile_shift(
            spark.createDataFrame(rows), "v", "s", "a", "b"
        ).collect()
    }
    assert out[0.5]["shift"] == pytest.approx(0.0, abs=1e-9)
    assert out[0.9]["shift"] > 50
    assert out[0.9]["rel_shift"] > 0.5


def test_quantile_shift_missing_side_nulls(spark):
    from jsonschema_validator_spark.operators.drift import quantile_shift

    rows = [Row(s="a", v=float(i)) for i in range(10)]
    out = quantile_shift(
        spark.createDataFrame(rows), "v", "s", "a", "b"
    ).collect()
    assert all(r["q_b"] is None and r["shift"] is None for r in out)


# --------------------------------------------------------- weight_diagnostics


def test_weight_diagnostics_uniform_weights_full_ess(spark):
    # Equal weights: ESS = n exactly, max_share = 1/n, not degenerate.
    from jsonschema_validator_spark.operators.sampling import (
        weight_diagnostics,
    )

    df = spark.createDataFrame([Row(w=2.5) for _ in range(50)])
    r = weight_diagnostics(df, "w").collect()[0]
    assert r["n"] == 50
    assert r["ess"] == pytest.approx(50.0)
    assert r["ess_ratio"] == pytest.approx(1.0)
    assert r["max_share"] == pytest.approx(0.02)
    assert r["degenerate"] is False


def test_weight_diagnostics_one_dominant_weight(spark):
    # One weight of 1000 among 99 ones: ESS collapses toward 1 and the
    # dominant row owns ~91% of the mass -> degenerate.
    from jsonschema_validator_spark.operators.sampling import (
        weight_diagnostics,
    )

    rows = [Row(w=1.0)] * 99 + [Row(w=1000.0)]
    r = weight_diagnostics(spark.createDataFrame(rows), "w").collect()[0]
    expect_ess = (99 + 1000.0) ** 2 / (99 + 1000.0**2)
    assert r["ess"] == pytest.approx(expect_ess, abs=1e-4)
    assert r["degenerate"] is True
    assert r["max_share"] == pytest.approx(1000.0 / 1099.0, abs=1e-6)


def test_weight_diagnostics_nonpositive_excluded(spark):
    from jsonschema_validator_spark.operators.sampling import (
        weight_diagnostics,
    )

    rows = [Row(w=1.0)] * 10 + [Row(w=0.0), Row(w=-3.0), Row(w=None)]
    r = weight_diagnostics(spark.createDataFrame(rows), "w").collect()[0]
    assert r["n"] == 10
    assert r["ess"] == pytest.approx(10.0)


def test_weight_diagnostics_column_expression(spark):
    # Derived weights (a temperature power) without materialization.
    from jsonschema_validator_spark.operators.sampling import (
        weight_diagnostics,
    )

    df = spark.createDataFrame([Row(g="s", c=float(i + 1)) for i in range(20)])
    r = weight_diagnostics(
        df, F.pow(F.col("c"), 2.0), group="g"
    ).collect()[0]
    s = sum((i + 1) ** 2 for i in range(20))
    q = sum((i + 1) ** 4 for i in range(20))
    assert r["ess"] == pytest.approx(s * s / q, abs=1e-4)


def test_moment_partials_mergeable_across_splits(spark):
    # Partials computed on two disjoint halves, unioned, must assemble
    # to the identical MMD row as the one-shot batch — the property
    # the streaming sink relies on.
    from jsonschema_validator_spark.operators.similarity import (
        mmd_from_partials,
        moment_partials,
        poly_mmd,
    )

    rows = [
        Row(s="a" if i % 2 == 0 else "b", v=[float((i * 3) % 7), float((i * 5) % 11)])
        for i in range(40)
    ]
    df = spark.createDataFrame(rows)
    whole = poly_mmd(df, "v", "s", "a", "b").collect()[0]
    h1 = df.limit(20)
    h2 = df.subtract(h1)
    parts = moment_partials(h1, "v", "s", "a", "b").unionByName(
        moment_partials(h2, "v", "s", "a", "b")
    )
    merged = mmd_from_partials(parts, "a", "b").collect()[0]
    assert merged.asDict() == whole.asDict()


# --------------------------------------------------------- count_model_screen


def test_count_model_materializes_missing_days_as_zero(spark):
    # Rows on days 1, 2 and 5 only: the spine must complete days 3-4
    # as zeros (n_days = 5, zero_days = 2) — absent days are the
    # outage, not a gap in the report.
    from jsonschema_validator_spark.operators.anomaly import (
        count_model_screen,
    )

    rows = []
    for day, cnt in [(1, 3), (2, 1), (5, 2)]:
        rows += [
            Row(ts=datetime.datetime(2024, 1, day, 10, 0, 0))
            for _ in range(cnt)
        ]
    r = count_model_screen(spark.createDataFrame(rows), "ts").collect()[0]
    assert r["n_days"] == 5
    assert r["zero_days"] == 2
    assert r["mean_count"] == pytest.approx(6 / 5)
    assert r["zero_observed"] == pytest.approx(0.4)
    # Poisson at lambda=1.2 expects e^-1.2 ~ 0.301 zeros; 0.4 exceeds
    # it by ~0.1 -> flag fires.
    assert r["zero_excess_flag"] is True


def test_count_model_nb_fit_overdispersed(spark):
    # Counts [0, 0, 12, 0, 0, 12, ...]: heavily overdispersed -> the
    # NB moment fit exists and matches the closed form.
    from jsonschema_validator_spark.operators.anomaly import (
        count_model_screen,
    )

    rows = []
    for day in range(1, 11):
        cnt = 12 if day % 3 == 0 else 0
        rows += [
            Row(ts=datetime.datetime(2024, 2, day, 9, 0, 0))
            for _ in range(cnt)
        ]
    r = count_model_screen(spark.createDataFrame(rows), "ts").collect()[0]
    m = r["mean_count"]
    v = r["var_count"]
    assert v > m
    assert r["nb_r"] == pytest.approx(m * m / (v - m), abs=1e-4)
    assert r["nb_p"] == pytest.approx(m / v, abs=1e-6)
    assert r["dispersion"] > 2


def test_count_model_equidispersed_nb_null(spark):
    # Constant daily count: variance 0 < mean -> NB fit withheld.
    from jsonschema_validator_spark.operators.anomaly import (
        count_model_screen,
    )

    rows = [
        Row(ts=datetime.datetime(2024, 3, day, 12, 0, 0))
        for day in range(1, 8)
        for _ in range(4)
    ]
    r = count_model_screen(spark.createDataFrame(rows), "ts").collect()[0]
    assert r["var_count"] == 0.0
    assert r["nb_r"] is None and r["nb_p"] is None
    assert r["zero_excess_flag"] is False


# ---------------------------------------------------------- turn_latency_sla


def test_turn_latency_sla_hand_computed(spark):
    # One conversation, gaps 10s / 10s / 100s on the same (a -> b)
    # edge... construct: roles a,b,a,b with gaps 10,10,100: edges
    # (a,b): 10, 100; (b,a): 10.
    from jsonschema_validator_spark.operators.conversation import (
        turn_latency_sla,
    )

    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        Row(conv="c", i=1, role="a", ts=t0),
        Row(conv="c", i=2, role="b", ts=t0 + datetime.timedelta(seconds=10)),
        Row(conv="c", i=3, role="a", ts=t0 + datetime.timedelta(seconds=20)),
        Row(conv="c", i=4, role="b", ts=t0 + datetime.timedelta(seconds=120)),
    ]
    out = {
        (r["prev_role"], r["role"]): r
        for r in turn_latency_sla(
            spark.createDataFrame(rows), "conv", "i", "role", "ts", sla_s=50.0
        ).collect()
    }
    ab = out[("a", "b")]
    assert ab["n"] == 2
    assert ab["p50_s"] == pytest.approx(55.0)  # interpolated between 10,100
    assert ab["breach_rate"] == pytest.approx(0.5)
    assert ab["sla_breached"] is True
    ba = out[("b", "a")]
    assert ba["n"] == 1
    assert ba["p95_s"] == pytest.approx(10.0)
    assert ba["sla_breached"] is False


def test_turn_latency_sla_cross_conversation_gaps_excluded(spark):
    # The first turn of each conversation has no predecessor: no edge
    # across conversation boundaries.
    from jsonschema_validator_spark.operators.conversation import (
        turn_latency_sla,
    )

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        Row(conv=c, i=i, role="r", ts=t0 + datetime.timedelta(seconds=30 * i))
        for c in ("c1", "c2")
        for i in (1, 2)
    ]
    out = turn_latency_sla(
        spark.createDataFrame(rows), "conv", "i", "role", "ts"
    ).collect()
    assert len(out) == 1
    assert out[0]["n"] == 2  # one intra-conv gap per conversation


# ------------------------------------------------------------ mojibake_screen


def test_mojibake_detects_each_signature(spark):
    from jsonschema_validator_spark.operators.cleaning import mojibake_screen

    rows = [
        Row(t="clean ascii text"),
        Row(t="decoder gave up \ufffd here"),
        Row(t="c1 control \u0085 residue"),
        Row(t="double decoded caf\u00c3\u00a9"),
        Row(t="Portuguese S\u00c3O PAULO stays clean"),  # A-tilde + ASCII
        Row(t=None),
    ]
    r = mojibake_screen(spark.createDataFrame(rows), "t").collect()[0]
    assert r["n_docs"] == 5  # NULL excluded
    assert r["fffd_docs"] == 1
    assert r["c1_docs"] == 1
    assert r["double_decode_docs"] == 1
    assert r["damaged_docs"] == 3
    assert r["damaged_rate"] == pytest.approx(0.6)


def test_mojibake_legit_accents_not_flagged(spark):
    # Correctly-decoded accented text (lowercase accents, uppercase
    # followed by ASCII) must never count as damage.
    from jsonschema_validator_spark.operators.cleaning import mojibake_screen

    rows = [
        Row(t="caf\u00e9 cr\u00e8me"),
        Row(t="S\u00e3o Paulo \u00c0 bient\u00f4t"),
        Row(t="stra\u00dfe \u00fcber"),
    ]
    r = mojibake_screen(spark.createDataFrame(rows), "t").collect()[0]
    assert r["damaged_docs"] == 0
    assert r["damaged_rate"] == 0.0


# --------------------------------------------------------------- entropy_rate


def test_entropy_rate_deterministic_cycle(spark):
    # a->b->a->b...: H0 = 1 bit (roles 50/50) but the next role is
    # fully determined -> H_rate = 0, predictability = 1.
    from jsonschema_validator_spark.operators.conversation import (
        entropy_rate,
    )

    rows = [
        Row(conv="c", i=i, role="a" if i % 2 == 0 else "b")
        for i in range(21)
    ]
    r = entropy_rate(spark.createDataFrame(rows), "conv", "i", "role").collect()[0]
    assert r["n_transitions"] == 20
    assert r["h0_bits"] == pytest.approx(1.0, abs=1e-6)
    assert r["h_rate_bits"] == pytest.approx(0.0, abs=1e-9)
    assert r["predictability"] == pytest.approx(1.0)


def test_entropy_rate_iid_uniform_no_predictability(spark):
    # Next role independent of current (balanced 2x2 transition
    # counts): H_rate = H0 = 1 bit, predictability ~ 0.
    from jsonschema_validator_spark.operators.conversation import (
        entropy_rate,
    )

    seq = "aabb" * 10  # transitions: a->a, a->b, b->b, b->a balanced
    rows = [Row(conv="c", i=i, role=ch) for i, ch in enumerate(seq)]
    r = entropy_rate(spark.createDataFrame(rows), "conv", "i", "role").collect()[0]
    assert r["h0_bits"] == pytest.approx(1.0, abs=0.01)
    assert r["predictability"] == pytest.approx(0.0, abs=0.05)


def test_entropy_rate_single_role_null_predictability(spark):
    from jsonschema_validator_spark.operators.conversation import (
        entropy_rate,
    )

    rows = [Row(conv="c", i=i, role="only") for i in range(5)]
    r = entropy_rate(spark.createDataFrame(rows), "conv", "i", "role").collect()[0]
    assert r["n_roles"] == 1
    assert r["h0_bits"] == 0.0 and r["h_rate_bits"] == 0.0
    assert r["predictability"] is None


def test_entropy_rate_null_role_is_category(spark):
    # A NULL-role turn mid-conversation contributes edges in and out;
    # the role census counts it.
    from jsonschema_validator_spark.operators.conversation import (
        entropy_rate,
    )

    rows = [
        Row(conv="c", i=1, role="a"),
        Row(conv="c", i=2, role=None),
        Row(conv="c", i=3, role="a"),
    ]
    r = entropy_rate(spark.createDataFrame(rows), "conv", "i", "role").collect()[0]
    assert r["n_transitions"] == 2
    assert r["n_roles"] == 2  # 'a' and NULL both appear as sources
