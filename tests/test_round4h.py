"""Round-4h batch 2: Newey-West HAC SE, seasonal Mann-Kendall, Yuen
trimmed test, decision stump, two-proportion MDE planning."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F


def _daily_events(spark, series_by_group):
    rows = []
    for g, xs in series_by_group.items():
        for d, c in enumerate(xs):
            for _ in range(int(c)):
                rows.append((g, f"2024-01-{d + 1:02d} 12:00:00"))
    return spark.createDataFrame(rows, "g string, day string").select(
        "g", F.to_timestamp("day").alias("ts")
    )


# ------------------------------------------------------------- Newey-West


def test_newey_west_matches_numpy(spark):
    from jsonschema_validator_spark.operators.timeseries import newey_west_se

    rng = np.random.RandomState(3)
    xs = [20]
    for _ in range(29):
        xs.append(max(1, int(0.6 * xs[-1] + rng.randint(1, 15))))
    df = _daily_events(spark, {"a": xs})
    row = newey_west_se(df, group="g", ts="ts", max_lag=5).collect()[0]

    x = np.asarray(xs, float)
    d = x - x.mean()
    n = len(x)
    gam = [float((d * d).sum() / n)] + [
        float((d[k:] * d[:-k]).sum() / n) for k in range(1, 6)
    ]
    lrv = gam[0] + 2 * sum((1 - k / 6.0) * gam[k] for k in range(1, 6))
    assert row["n_days"] == n
    assert row["mean"] == pytest.approx(x.mean(), abs=1e-5)
    assert row["gamma0"] == pytest.approx(gam[0], abs=1e-4)
    assert row["lrv"] == pytest.approx(lrv, abs=1e-4)
    assert row["se_nw"] == pytest.approx(math.sqrt(lrv / n), abs=1e-5)
    assert row["se_naive"] == pytest.approx(math.sqrt(gam[0] / n), abs=1e-5)
    # positively autocorrelated series: naive SE understates
    assert row["inflation"] > 1.0
    assert row["ci_lo"] == pytest.approx(
        x.mean() - 1.96 * math.sqrt(lrv / n), abs=1e-4
    )


def test_newey_west_iid_inflation_near_one(spark):
    from jsonschema_validator_spark.operators.timeseries import newey_west_se

    rng = np.random.RandomState(8)
    xs = [int(v) for v in rng.randint(10, 30, 30)]
    df = _daily_events(spark, {"a": xs})
    row = newey_west_se(df, group="g", ts="ts", max_lag=3).collect()[0]
    assert 0.5 < row["inflation"] < 1.5  # no systematic inflation


# ---------------------------------------------------- seasonal Mann-Kendall


def test_seasonal_mk_detects_trend_under_weekly_cycle(spark):
    from jsonschema_validator_spark.operators.timeseries import (
        seasonal_mann_kendall,
    )

    # strong weekly cycle + small upward drift: 28 days
    xs = [(30 if d % 7 == 0 else 10) + d for d in range(28)]
    rows = []
    for d, c in enumerate(xs):
        rows.append(("a", f"2024-01-{d + 1:02d} 12:00:00", float(c)))
    df = spark.createDataFrame(rows, "g string, day string, v double").select(
        "g", F.to_timestamp("day").alias("ts"), "v"
    )
    row = seasonal_mann_kendall(df, group="g", ts="ts", value="v").collect()[0]
    # within each weekday the series is strictly increasing: S per
    # season = C(4,2) = 6, 7 seasons -> S = 42
    assert row["s_stat"] == 42
    assert row["n_seasons"] == 7 and row["n_days"] == 28
    var = 7 * (4 * 3 * 13) / 18.0
    assert row["var_s"] == pytest.approx(var, abs=1e-6)
    assert row["z"] == pytest.approx((42 - 1) / math.sqrt(var), abs=1e-5)
    assert row["trend"] == "increasing"


def test_seasonal_mk_pure_cycle_no_trend(spark):
    from jsonschema_validator_spark.operators.timeseries import (
        mann_kendall,
        seasonal_mann_kendall,
    )

    xs = [30 if d % 7 == 0 else 10 for d in range(28)]
    rows = [
        ("a", f"2024-01-{d + 1:02d} 12:00:00", float(c))
        for d, c in enumerate(xs)
    ]
    df = spark.createDataFrame(rows, "g string, day string, v double").select(
        "g", F.to_timestamp("day").alias("ts"), "v"
    )
    row = seasonal_mann_kendall(df, group="g", ts="ts", value="v").collect()[0]
    assert row["s_stat"] == 0 and row["trend"] == "none"


# -------------------------------------------------------------------- Yuen


def test_yuen_matches_numpy_replay(spark):
    from jsonschema_validator_spark.operators.normality import (
        yuen_trimmed_test,
    )

    rng = np.random.RandomState(5)
    c = rng.normal(10, 2, 60)
    t = rng.normal(11, 2, 55)
    rows = [("g", "c", float(v)) for v in c] + [
        ("g", "t", float(v)) for v in t
    ]
    df = spark.createDataFrame(rows, "g string, arm string, v double")
    row = yuen_trimmed_test(
        df, "g", "arm", "v", control="c", treatment="t", trim=0.2
    ).collect()[0]

    def stats(xs):
        xs = np.sort(np.asarray(xs))
        n = len(xs)
        g = int(math.floor(0.2 * n))
        kept = xs[g : n - g]
        h = len(kept)
        tm = kept.mean()
        clamped = np.clip(xs, kept.min(), kept.max())
        sw2 = clamped.var(ddof=1)
        d = sw2 * (n - 1) / (h * (h - 1))
        return n, h, tm, d

    nc, hc, tmc, dc = stats(c)
    nt, ht, tmt, dt = stats(t)
    assert (row["n_control"], row["h_control"]) == (nc, hc)
    assert (row["n_treatment"], row["h_treatment"]) == (nt, ht)
    assert row["trimmed_mean_control"] == pytest.approx(tmc, abs=1e-5)
    assert row["trimmed_mean_treatment"] == pytest.approx(tmt, abs=1e-5)
    assert row["t_stat"] == pytest.approx(
        (tmt - tmc) / math.sqrt(dt + dc), abs=1e-4
    )


def test_yuen_robust_to_planted_tail(spark):
    """A huge outlier flips Welch but not Yuen."""
    from jsonschema_validator_spark.operators.normality import (
        yuen_trimmed_test,
    )

    rng = np.random.RandomState(7)
    c = list(rng.normal(10, 1, 40))
    t = list(rng.normal(10, 1, 40)) + [10000.0]  # one corrupt row
    rows = [("g", "c", float(v)) for v in c] + [
        ("g", "t", float(v)) for v in t
    ]
    df = spark.createDataFrame(rows, "g string, arm string, v double")
    row = yuen_trimmed_test(
        df, "g", "arm", "v", control="c", treatment="t", trim=0.2
    ).collect()[0]
    # trimmed means stay near 10 and the test does not reject
    assert abs(row["lift_trimmed"]) < 1.0
    assert not row["reject"]


def test_yuen_trim_zero_equals_welch_t(spark):
    from jsonschema_validator_spark.operators.normality import (
        yuen_trimmed_test,
    )

    rng = np.random.RandomState(2)
    c = rng.normal(0, 1, 30)
    t = rng.normal(1, 1, 30)
    rows = [("g", "c", float(v)) for v in c] + [
        ("g", "t", float(v)) for v in t
    ]
    df = spark.createDataFrame(rows, "g string, arm string, v double")
    row = yuen_trimmed_test(
        df, "g", "arm", "v", control="c", treatment="t", trim=0.0
    ).collect()[0]
    welch_t = (t.mean() - c.mean()) / math.sqrt(
        t.var(ddof=1) / len(t) + c.var(ddof=1) / len(c)
    )
    assert row["t_stat"] == pytest.approx(welch_t, abs=1e-4)


# ------------------------------------------------------------------- stump


def test_stump_finds_planted_threshold(spark):
    from jsonschema_validator_spark.operators.rootcause import decision_stump

    rng = np.random.RandomState(11)
    rows = []
    for _ in range(500):
        x = float(rng.uniform(0, 100))
        label = bool(x > 42) if rng.rand() < 0.95 else bool(rng.rand() < 0.5)
        rows.append((label, x))
    df = spark.createDataFrame(rows, "y boolean, x double")
    out = decision_stump(
        df, "y", "x", thresholds=[10, 20, 30, 40, 50, 60, 70, 80, 90]
    ).collect()
    best = [r for r in out if r["best"]]
    assert len(best) == 1 and best[0]["threshold"] == 40.0
    assert best[0]["pos_rate_gt"] > 0.9 and best[0]["pos_rate_le"] < 0.1
    # exact gain replay at t=40
    ys = np.array([r[0] for r in rows])
    xs = np.array([r[1] for r in rows])

    def h(p):
        if p <= 0 or p >= 1:
            return 0.0
        return -(p * math.log2(p) + (1 - p) * math.log2(1 - p))

    le = xs <= 40
    gain = (
        h(ys.mean())
        - le.mean() * h(ys[le].mean())
        - (~le).mean() * h(ys[~le].mean())
    )
    assert best[0]["info_gain"] == pytest.approx(gain, abs=1e-5)


def test_stump_uninformative_feature_near_zero_gain(spark):
    from jsonschema_validator_spark.operators.rootcause import decision_stump

    rng = np.random.RandomState(4)
    rows = [
        (bool(rng.rand() < 0.5), float(rng.uniform(0, 1))) for _ in range(400)
    ]
    df = spark.createDataFrame(rows, "y boolean, x double")
    out = decision_stump(df, "y", "x", thresholds=[0.25, 0.5, 0.75]).collect()
    assert max(r["info_gain"] for r in out) < 0.02
    assert sum(1 for r in out if r["best"]) == 1


def test_stump_min_side_and_groups(spark):
    from jsonschema_validator_spark.operators.rootcause import decision_stump

    rows = [("a", True, 1.0), ("a", False, 2.0), ("a", True, 3.0)] * 5 + [
        ("b", False, 1.0),
        ("b", False, 5.0),
    ] * 3
    df = spark.createDataFrame(rows, "g string, y boolean, x double")
    out = decision_stump(
        df, "y", "x", thresholds=[0.5, 2.5, 9.0], group="g", min_side=1
    ).collect()
    a = {r["threshold"]: r for r in out if r["g"] == "a"}
    # t=0.5 puts zero rows on the left -> NULL gain, never best
    assert a[0.5]["info_gain"] is None and not a[0.5]["best"]
    assert a[2.5]["info_gain"] is not None
    # all-false group b: zero parent entropy, the one non-degenerate
    # split (t=2.5) has gain 0 and is best; degenerate splits never are
    b = {r["threshold"]: r for r in out if r["g"] == "b"}
    assert b[2.5]["best"] and b[2.5]["info_gain"] == 0.0
    assert not b[0.5]["best"] and not b[9.0]["best"]


# --------------------------------------------------------------------- MDE


def test_mde_matches_closed_form(spark):
    from jsonschema_validator_spark.operators.evaluation import (
        mde_two_proportion,
    )

    rows = [("c", 1 if i < 30 else 0) for i in range(200)] + [
        ("t", 1 if i < 40 else 0) for i in range(200)
    ]
    df = spark.createDataFrame(rows, "arm string, y int")
    row = mde_two_proportion(
        df, "arm", "y", control="c", treatment="t"
    ).collect()[0]
    p_c, p_t = 30 / 200, 40 / 200
    pool = 70 / 400
    zsum = 1.96 + 0.8416
    mde = zsum * math.sqrt(pool * (1 - pool) * (2 / 200))
    req = zsum**2 * (p_c * (1 - p_c) + p_t * (1 - p_t)) / (p_t - p_c) ** 2
    assert row["rate_control"] == pytest.approx(p_c)
    assert row["rate_treatment"] == pytest.approx(p_t)
    assert row["mde"] == pytest.approx(mde, abs=1e-5)
    assert row["required_n_per_arm"] == math.ceil(req)
    assert row["powered"] == (abs(p_t - p_c) >= mde)


def test_mde_zero_lift_yields_null_required_n(spark):
    from jsonschema_validator_spark.operators.evaluation import (
        mde_two_proportion,
    )

    rows = [("c", i % 2) for i in range(100)] + [
        ("t", i % 2) for i in range(100)
    ]
    df = spark.createDataFrame(rows, "arm string, y int")
    row = mde_two_proportion(
        df, "arm", "y", control="c", treatment="t"
    ).collect()[0]
    assert row["lift"] == 0.0 and row["required_n_per_arm"] is None
    assert not row["powered"]


# ------------------------------------------------- JB partials mergeability


def test_jb_power_sums_merge_invariance(spark):
    """Partials from any row partitioning sum to the same JB — the
    property the streaming twin relies on."""
    import numpy as np
    from jsonschema_validator_spark.operators.normality import (
        jarque_bera_screen,
        jb_from_power_sums,
        power_sums,
    )

    rng = np.random.RandomState(17)
    rows = [("g", float(v)) for v in rng.exponential(2.0, 300)]
    df = spark.createDataFrame(rows, "g string, v double")
    direct = jarque_bera_screen(df, "g", "v").collect()
    half_a = spark.createDataFrame(rows[:137], "g string, v double")
    half_b = spark.createDataFrame(rows[137:], "g string, v double")
    parts = power_sums(half_a, "g", "v").unionByName(
        power_sums(half_b, "g", "v")
    )
    merged = jb_from_power_sums(parts, "g").collect()
    assert len(direct) == len(merged) == 1
    assert direct[0]["jb_stat"] == pytest.approx(
        merged[0]["jb_stat"], abs=1e-5
    )
    assert direct[0]["n"] == merged[0]["n"]
    assert direct[0]["skewness"] == pytest.approx(
        merged[0]["skewness"], abs=1e-6
    )
