"""Round-4f operators: normality (Jarque-Bera / Bartlett / Grubbs),
spectral (PACF / periodogram / effective rank), two-regressor OLS.

Each test pins the statistic against an independent numpy/pure-Python
replay on a small planted frame — the same oracle-style check the
DuckDB gate runs at the contract scale."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


# ---------------------------------------------------------------- normality


def test_jarque_bera_matches_numpy(spark):
    from jsonschema_validator_spark.operators.normality import (
        jarque_bera_screen,
    )

    rng = np.random.RandomState(7)
    normal = rng.normal(10, 2, 200).tolist()
    skewed = (rng.exponential(1.0, 200) ** 2).tolist()
    rows = [("n", float(v)) for v in normal] + [
        ("s", float(v)) for v in skewed
    ]
    out = {
        r["g"]: r
        for r in jarque_bera_screen(
            _df(spark, rows, "g string, v double"), "g", "v"
        )
        .collect()
    }

    def jb(xs):
        x = np.asarray(xs)
        n = len(x)
        m = x.mean()
        m2 = ((x - m) ** 2).mean()
        m3 = ((x - m) ** 3).mean()
        m4 = ((x - m) ** 4).mean()
        s = m3 / m2**1.5
        k = m4 / m2**2 - 3
        return n / 6 * (s * s + k * k / 4), s, k

    for g, xs in (("n", normal), ("s", skewed)):
        stat, s, k = jb(xs)
        assert out[g]["jb_stat"] == pytest.approx(stat, abs=1e-4)
        assert out[g]["skewness"] == pytest.approx(s, abs=1e-4)
        assert out[g]["kurtosis_excess"] == pytest.approx(k, abs=1e-4)
    assert not out["n"]["reject"] and out["s"]["reject"]


def test_jarque_bera_filters_degenerate(spark):
    from jsonschema_validator_spark.operators.normality import (
        jarque_bera_screen,
    )

    rows = [("c", 5.0)] * 20 + [("tiny", 1.0), ("tiny", 2.0)]
    out = jarque_bera_screen(
        _df(spark, rows, "g string, v double"), "g", "v"
    ).collect()
    assert out == []  # zero variance and n < min_n both excluded


def test_bartlett_matches_reference_formula(spark):
    from jsonschema_validator_spark.operators.normality import bartlett_test

    rng = np.random.RandomState(3)
    groups = {
        "a": rng.normal(0, 1.0, 40),
        "b": rng.normal(0, 1.0, 55),
        "c": rng.normal(0, 3.0, 30),  # inflated variance -> reject
    }
    rows = [(g, float(v)) for g, xs in groups.items() for v in xs]
    row = bartlett_test(
        _df(spark, rows, "g string, v double"), "g", "v"
    ).collect()[0]

    ns = {g: len(xs) for g, xs in groups.items()}
    vs = {g: np.var(xs, ddof=1) for g, xs in groups.items()}
    k = 3
    n_tot = sum(ns.values())
    sp2 = sum((ns[g] - 1) * vs[g] for g in groups) / (n_tot - k)
    t = (n_tot - k) * math.log(sp2) - sum(
        (ns[g] - 1) * math.log(vs[g]) for g in groups
    )
    c = 1 + (
        sum(1 / (ns[g] - 1) for g in groups) - 1 / (n_tot - k)
    ) / (3 * (k - 1))
    assert row["k"] == 3 and row["n_total"] == n_tot
    assert row["t_stat"] == pytest.approx(t / c, abs=1e-4)
    assert row["t_crit_95"] == pytest.approx(5.991)
    assert row["reject"]


def test_bartlett_excludes_degenerate_groups(spark):
    from jsonschema_validator_spark.operators.normality import bartlett_test

    rows = (
        [("a", float(v)) for v in (1, 2, 3, 4, 5)]
        + [("b", float(v)) for v in (2, 3, 4, 5, 6)]
        + [("z", 7.0)] * 5  # zero variance -> excluded, counted
        + [("w", 1.0)]  # n < 2 -> excluded
    )
    row = bartlett_test(
        _df(spark, rows, "g string, v double"), "g", "v"
    ).collect()[0]
    assert row["k"] == 2 and row["n_groups_excluded"] == 2
    assert not row["reject"]  # identical shifted samples


def test_grubbs_flags_planted_outlier(spark):
    from jsonschema_validator_spark.operators.normality import grubbs_screen

    base = [float(v) for v in range(20)]
    rows = [("clean", v) for v in base] + [
        ("dirty", v) for v in base + [500.0]
    ]
    out = {
        r["g"]: r
        for r in grubbs_screen(
            _df(spark, rows, "g string, v double"), "g", "v", crit=2.71
        ).collect()
    }
    xs = np.array(base + [500.0])
    g = max(xs.max() - xs.mean(), xs.mean() - xs.min()) / xs.std(ddof=1)
    assert out["dirty"]["g_stat"] == pytest.approx(g, abs=1e-4)
    assert out["dirty"]["extreme_value"] == 500.0
    assert out["dirty"]["reject"] and not out["clean"]["reject"]


def test_grubbs_attributes_low_side(spark):
    from jsonschema_validator_spark.operators.normality import grubbs_screen

    rows = [("g", float(v)) for v in [50, 51, 52, 53, 49, 48, 50, 51, -200]]
    row = grubbs_screen(
        _df(spark, rows, "g string, v double"), "g", "v", crit=2.0
    ).collect()[0]
    assert row["extreme_value"] == -200.0 and row["reject"]


# ----------------------------------------------------------------- spectral


def _daily_rows(series_by_group):
    """(group, day, count) -> one event row per count unit."""
    rows = []
    for g, xs in series_by_group.items():
        for d, c in enumerate(xs):
            for _ in range(int(c)):
                rows.append((g, f"2024-01-{d + 1:02d} 12:00:00"))
    return rows


def test_pacf_matches_direct_yule_walker(spark):
    from jsonschema_validator_spark.operators.spectral import pacf_yw

    rng = np.random.RandomState(11)
    xs = [20]
    for _ in range(29):  # AR(1)-ish positive series
        xs.append(max(1, int(0.7 * xs[-1] + rng.randint(1, 12))))
    rows = _daily_rows({"a": xs})
    df = spark.createDataFrame(rows, "g string, day string").select(
        "g", F.to_timestamp("day").alias("ts")
    )
    out = {r["lag"]: r for r in pacf_yw(df, group="g", ts="ts").collect()}

    x = np.asarray(xs, dtype=float)
    d = x - x.mean()
    den = (d * d).sum()
    r = [np.dot(d[k:], d[:-k]) / den for k in (1, 2, 3)]
    p1 = r[0]
    p2 = (r[1] - r[0] ** 2) / (1 - r[0] ** 2)
    num3 = (
        r[2]
        - 2 * r[0] * r[1]
        - r[0] ** 2 * r[2]
        + r[0] * r[1] ** 2
        + r[0] ** 3
    )
    den3 = 1 - 2 * r[0] ** 2 - r[1] ** 2 + 2 * r[0] ** 2 * r[1]
    assert out[1]["pacf"] == pytest.approx(p1, abs=1e-4)
    assert out[2]["pacf"] == pytest.approx(p2, abs=1e-4)
    assert out[3]["pacf"] == pytest.approx(num3 / den3, abs=1e-4)
    # AR(1): lag-1 significant, direct dependence cuts off after it
    assert out[1]["significant"]


def test_pacf_agrees_with_durbin_levinson(spark):
    """The unrolled determinants must equal the recursion they unroll."""
    from jsonschema_validator_spark.operators.spectral import pacf_yw

    rng = np.random.RandomState(5)
    xs = [int(v) for v in rng.randint(5, 40, 28)]
    rows = _daily_rows({"a": xs})
    df = spark.createDataFrame(rows, "g string, day string").select(
        "g", F.to_timestamp("day").alias("ts")
    )
    out = {r["lag"]: r["pacf"] for r in pacf_yw(df, group="g", ts="ts").collect()}

    x = np.asarray(xs, dtype=float)
    d = x - x.mean()
    den = (d * d).sum()
    r = [1.0] + [np.dot(d[k:], d[:-k]) / den for k in (1, 2, 3)]
    # Durbin-Levinson
    phi = {1: {1: r[1]}}
    v = 1 - r[1] ** 2
    for k in (2, 3):
        num = r[k] - sum(phi[k - 1][j] * r[k - j] for j in range(1, k))
        pk = num / v
        phi[k] = {k: pk}
        for j in range(1, k):
            phi[k][j] = phi[k - 1][j] - pk * phi[k - 1][k - j]
        v *= 1 - pk**2
    for k in (1, 2, 3):
        assert out[k] == pytest.approx(phi[k][k], abs=1e-4)


def test_periodogram_finds_planted_period(spark):
    from jsonschema_validator_spark.operators.spectral import (
        periodogram_screen,
    )

    xs = [30 if d % 7 == 0 else 10 for d in range(28)]  # weekly spike
    rows = _daily_rows({"a": xs, "flat": [10] * 28})
    df = spark.createDataFrame(rows, "g string, day string").select(
        "g", F.to_timestamp("day").alias("ts")
    )
    out = periodogram_screen(df, group="g", ts="ts").collect()
    a = {r["period"]: r for r in out if r["g"] == "a"}
    assert a[7]["dominant"] and a[7]["power_share"] > 0.9
    assert a[7]["fisher_g"] == a[7]["power_share"]
    # exact DFT replay at period 7
    x = np.asarray(xs, float)
    d = x - x.mean()
    t = np.arange(len(x))
    A = (d * np.cos(2 * np.pi * t / 7)).sum()
    B = (d * np.sin(2 * np.pi * t / 7)).sum()
    assert a[7]["power"] == pytest.approx(2 * (A * A + B * B) / len(x), abs=1e-3)
    flat = [r for r in out if r["g"] == "flat"]
    # zero-variance series: total power 0 -> NULL shares, no dominant
    assert all(r["power_share"] is None and not r["dominant"] for r in flat)


def test_effective_rank_isotropic_vs_collapsed(spark):
    from jsonschema_validator_spark.operators.spectral import effective_rank

    rng = np.random.RandomState(2)
    iso = rng.normal(0, 1, (300, 8))
    direction = rng.normal(0, 1, 8)
    collapsed = np.outer(rng.normal(0, 1, 300), direction) + rng.normal(
        0, 0.01, (300, 8)
    )

    def run(mat):
        rows = [(i, [float(v) for v in row]) for i, row in enumerate(mat)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        return effective_rank(df, "embedding").collect()[0]

    r_iso, r_col = run(iso), run(collapsed)

    def pr(mat):
        m = np.asarray(mat, dtype=np.float32).astype(np.float64)
        c = np.cov(m.T, bias=True)
        lam = np.linalg.eigvalsh(c)
        return lam.sum() ** 2 / (lam**2).sum()

    assert r_iso["effective_rank"] == pytest.approx(pr(iso), abs=1e-3)
    assert r_col["effective_rank"] == pytest.approx(pr(collapsed), abs=1e-3)
    assert r_iso["dim"] == 8 and r_iso["n_vectors"] == 300
    assert not r_iso["collapsed"] and r_col["collapsed"]


# ---------------------------------------------------------------------- OLS


def test_ols2_matches_lstsq(spark):
    from jsonschema_validator_spark.operators.regression import ols2

    rng = np.random.RandomState(9)
    x1 = rng.normal(5, 2, 300)
    x2 = rng.normal(-1, 3, 300)
    y = 4.0 + 1.5 * x1 - 0.7 * x2 + rng.normal(0, 1, 300)
    rows = [(float(a), float(b), float(c)) for a, b, c in zip(y, x1, x2)]
    row = ols2(
        _df(spark, rows, "y double, x1 double, x2 double"), "y", "x1", "x2"
    ).collect()[0]

    X = np.column_stack([np.ones_like(x1), x1, x2])
    beta, _, _, _ = np.linalg.lstsq(X, y, rcond=None)
    resid = y - X @ beta
    sse = (resid**2).sum()
    syy = ((y - y.mean()) ** 2).sum()
    s2 = sse / (len(y) - 3)
    covb = s2 * np.linalg.inv(X.T @ X)
    assert row["b0"] == pytest.approx(beta[0], abs=1e-4)
    assert row["b1"] == pytest.approx(beta[1], abs=1e-4)
    assert row["b2"] == pytest.approx(beta[2], abs=1e-4)
    assert row["r2"] == pytest.approx(1 - sse / syy, abs=1e-5)
    assert row["se_b1"] == pytest.approx(math.sqrt(covb[1, 1]), abs=1e-4)
    assert row["se_b2"] == pytest.approx(math.sqrt(covb[2, 2]), abs=1e-4)
    r12 = np.corrcoef(x1, x2)[0, 1]
    assert row["vif"] == pytest.approx(1 / (1 - r12**2), abs=1e-4)
    assert row["sig_b1"] and row["sig_b2"] and not row["collinear"]


def test_ols2_singular_design_yields_nulls(spark):
    from jsonschema_validator_spark.operators.regression import ols2

    rows = [(float(i), float(i), float(2 * i)) for i in range(20)]
    row = ols2(
        _df(spark, rows, "y double, x1 double, x2 double"), "y", "x1", "x2"
    ).collect()[0]
    assert row["b1"] is None and row["b2"] is None and row["vif"] is None


def test_ols2_per_group_and_min_n(spark):
    from jsonschema_validator_spark.operators.regression import ols2

    rng = np.random.RandomState(4)
    rows = []
    for g, slope in (("a", 2.0), ("b", -3.0)):
        x1 = rng.normal(0, 1, 50)
        x2 = rng.normal(0, 1, 50)
        y = slope * x1 + 0.5 * x2
        rows += [
            (g, float(yy), float(a), float(b))
            for yy, a, b in zip(y, x1, x2)
        ]
    rows += [("tiny", 1.0, 1.0, 1.0)] * 3
    out = {
        r["g"]: r
        for r in ols2(
            _df(spark, rows, "g string, y double, x1 double, x2 double"),
            "y",
            "x1",
            "x2",
            group="g",
        ).collect()
    }
    assert set(out) == {"a", "b"}  # tiny dropped by min_n
    assert out["a"]["b1"] == pytest.approx(2.0, abs=1e-6)
    assert out["b"]["b1"] == pytest.approx(-3.0, abs=1e-6)
    assert out["a"]["r2"] == pytest.approx(1.0, abs=1e-6)
