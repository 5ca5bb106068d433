"""Round-4i batch 3: delta-method ratio test, sample-ratio-mismatch
gate, post-stratified A/B comparison."""

from __future__ import annotations

import math

import numpy as np
import pytest


# ------------------------------------------------------------ delta method


def test_delta_ratio_matches_numpy(spark):
    from jsonschema_validator_spark.operators.evaluation import (
        delta_method_ratio_test,
    )

    rng = np.random.RandomState(9)
    rows = []
    per_arm = {}
    for t, arm_lbl, uplift in ((0, "c", 0.0), (1, "t", 0.1)):
        xs, ys = [], []
        for _ in range(120):
            views = float(rng.poisson(20) + 1)
            clicks = float(rng.binomial(int(views), 0.2 + uplift))
            rows.append((arm_lbl, clicks, views))
            xs.append(clicks)
            ys.append(views)
        per_arm[t] = (np.array(xs), np.array(ys))
    df = spark.createDataFrame(rows, "arm string, x double, y double")
    row = delta_method_ratio_test(
        df, "arm", "x", "y", control="c", treatment="t"
    ).collect()[0]

    def side(xs, ys):
        n = len(xs)
        r = xs.sum() / ys.sum()
        var = (
            xs.var(ddof=1) - 2 * r * np.cov(xs, ys, ddof=1)[0, 1]
            + r * r * ys.var(ddof=1)
        ) / (n * ys.mean() ** 2)
        return r, math.sqrt(var)

    r_c, se_c = side(*per_arm[0])
    r_t, se_t = side(*per_arm[1])
    assert row["ratio_control"] == pytest.approx(r_c, abs=1e-5)
    assert row["ratio_treatment"] == pytest.approx(r_t, abs=1e-5)
    assert row["se_control"] == pytest.approx(se_c, abs=1e-5)
    assert row["se_treatment"] == pytest.approx(se_t, abs=1e-5)
    assert row["z"] == pytest.approx(
        (r_t - r_c) / math.sqrt(se_c**2 + se_t**2), abs=1e-3
    )
    assert row["z"] > 3  # the planted 10-point uplift is detected


def test_delta_ratio_agrees_with_jackknife_se(spark):
    """Closed form vs leave-one-out: same estimand, SEs within 10%."""
    from jsonschema_validator_spark.operators.evaluation import (
        delta_method_ratio_test,
    )

    rng = np.random.RandomState(3)
    xs = rng.poisson(5, 100).astype(float) + 1
    ys = xs * 3 + rng.poisson(10, 100)
    rows = [("c", float(a), float(b)) for a, b in zip(xs, ys)] + [
        ("t", float(a), float(b)) for a, b in zip(xs, ys)
    ]
    df = spark.createDataFrame(rows, "arm string, x double, y double")
    row = delta_method_ratio_test(
        df, "arm", "x", "y", control="c", treatment="t"
    ).collect()[0]
    # jackknife on one arm
    n = len(xs)
    r_full = xs.sum() / ys.sum()
    loo = np.array(
        [(xs.sum() - xs[i]) / (ys.sum() - ys[i]) for i in range(n)]
    )
    jk_se = math.sqrt((n - 1) / n * ((loo - loo.mean()) ** 2).sum())
    assert row["se_control"] == pytest.approx(jk_se, rel=0.1)
    assert row["lift"] == 0.0 and row["ratio_control"] == pytest.approx(
        r_full, abs=1e-6
    )


# --------------------------------------------------------------------- SRM


def test_srm_detects_planted_mismatch(spark):
    from jsonschema_validator_spark.operators.evaluation import srm_check

    rows = [("A",)] * 5000 + [("B",)] * 4600  # ~4% missing from B
    df = spark.createDataFrame(rows, "arm string")
    row = srm_check(df, "arm", {"A": 0.5, "B": 0.5}).collect()[0]
    n = 9600
    chi2 = (5000 - n / 2) ** 2 / (n / 2) + (4600 - n / 2) ** 2 / (n / 2)
    assert row["chi2"] == pytest.approx(chi2, abs=1e-6)
    assert row["chi2_crit"] == 3.841
    assert row["srm"]  # gate fires: do not read this experiment


def test_srm_clean_split_passes_and_counts_unknown_arms(spark):
    from jsonschema_validator_spark.operators.evaluation import srm_check

    rows = [("A",)] * 5020 + [("B",)] * 4980 + [("weird",)] * 7
    df = spark.createDataFrame(rows, "arm string")
    row = srm_check(df, "arm", {"A": 0.5, "B": 0.5}).collect()[0]
    assert not row["srm"]
    assert row["n_unexpected"] == 7 and row["n_total"] == 10000


def test_srm_three_arms_and_validation(spark):
    from jsonschema_validator_spark.operators.evaluation import srm_check

    rows = [("A",)] * 800 + [("B",)] * 100 + [("C",)] * 100
    df = spark.createDataFrame(rows, "arm string")
    row = srm_check(
        df, "arm", {"A": 0.8, "B": 0.1, "C": 0.1}
    ).collect()[0]
    assert row["chi2"] == pytest.approx(0.0, abs=1e-9)
    assert row["chi2_crit"] == 5.991  # df = 2
    with pytest.raises(ValueError):
        srm_check(df, "arm", {"A": 0.6, "B": 0.1})
    with pytest.raises(ValueError):
        srm_check(df, "arm", {"A": 1.0})


# --------------------------------------------------- post-stratification


def test_post_stratified_removes_mix_confound(spark):
    """No within-stratum effect, but treatment oversamples the
    high-outcome stratum: raw lift large, post-stratified lift ~ 0."""
    from jsonschema_validator_spark.operators.evaluation import (
        post_stratified_test,
    )

    rng = np.random.RandomState(1)
    rows = []
    for s, level, (nc, nt) in (
        ("low", 10.0, (300, 100)),
        ("high", 50.0, (100, 300)),
    ):
        for _ in range(nc):
            rows.append(("c", s, level + float(rng.normal(0, 1))))
        for _ in range(nt):
            rows.append(("t", s, level + float(rng.normal(0, 1))))
    df = spark.createDataFrame(rows, "arm string, s string, y double")
    row = post_stratified_test(
        df, "arm", "s", "y", control="c", treatment="t"
    ).collect()[0]
    assert row["lift_raw"] > 15  # the confounded view
    assert abs(row["lift_post"]) < 0.5  # the adjusted truth
    assert abs(row["z_post"]) < 3
    assert row["imbalance"] == pytest.approx(0.5, abs=1e-6)
    assert row["n_strata"] == 2


def test_post_stratified_matches_numpy_replay(spark):
    from jsonschema_validator_spark.operators.evaluation import (
        post_stratified_test,
    )

    rng = np.random.RandomState(6)
    data = {}
    rows = []
    for s in ("a", "b", "c"):
        for t, arm_lbl in ((0, "c"), (1, "t")):
            vals = rng.normal(10 + 5 * t, 2, rng.randint(20, 40))
            data[(s, t)] = vals
            rows += [(arm_lbl, s, float(v)) for v in vals]
    df = spark.createDataFrame(rows, "arm string, s string, y double")
    row = post_stratified_test(
        df, "arm", "s", "y", control="c", treatment="t"
    ).collect()[0]

    n_pool = sum(len(v) for v in data.values())
    mean_post = {0: 0.0, 1: 0.0}
    var_post = {0: 0.0, 1: 0.0}
    for s in ("a", "b", "c"):
        w = (len(data[(s, 0)]) + len(data[(s, 1)])) / n_pool
        for t in (0, 1):
            mean_post[t] += w * data[(s, t)].mean()
            var_post[t] += (
                w * w * data[(s, t)].var(ddof=1) / len(data[(s, t)])
            )
    lift = mean_post[1] - mean_post[0]
    se = math.sqrt(var_post[0] + var_post[1])
    assert row["lift_post"] == pytest.approx(lift, abs=1e-5)
    assert row["se_post"] == pytest.approx(se, abs=1e-5)
    assert row["z_post"] == pytest.approx(lift / se, abs=1e-3)


def test_post_stratified_drops_one_arm_strata(spark):
    from jsonschema_validator_spark.operators.evaluation import (
        post_stratified_test,
    )

    rows = (
        [("c", "s1", float(v)) for v in range(10)]
        + [("t", "s1", float(v + 1)) for v in range(10)]
        + [("t", "orphan", 99.0)] * 5  # no control rows: dropped
    )
    df = spark.createDataFrame(rows, "arm string, s string, y double")
    row = post_stratified_test(
        df, "arm", "s", "y", control="c", treatment="t"
    ).collect()[0]
    assert row["n_strata"] == 1
    assert row["n_treatment"] == 10  # orphan stratum excluded
    assert row["lift_post"] == pytest.approx(1.0, abs=1e-9)
