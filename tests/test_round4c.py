"""Round-4c operators: log-rank survival comparison, McNemar paired
verdicts, empirical-Bayes pass-rate shrinkage."""

import pytest
from pyspark.sql import functions as F


def test_log_rank_hand_computed(spark):
    # A: events at t=1,2; B: events at t=3,4 (no censoring).
    # Pooled event times: t=1 (n=4, d=1, na=2, E=.5, V=.25),
    # t=2 (n=3, d=1, na=1, E=1/3, V=2/9), t=3/4 contribute 0 to E and V
    # for A. O=2, E=5/6, V=17/36.
    from jsonschema_validator_spark.operators.survival import log_rank

    df = spark.createDataFrame(
        [("A", 1, 1), ("A", 2, 1), ("B", 3, 1), ("B", 4, 1)],
        "g string, dur int, ev int",
    )
    r = log_rank(df, "dur", "ev", "g", "A", "B").collect()[0]
    assert (r["n_a"], r["n_b"], r["o_a"]) == (2, 2, 2)
    assert r["e_a"] == pytest.approx(5 / 6, abs=1e-6)
    assert r["var_a"] == pytest.approx(17 / 36, abs=1e-6)
    z = (2 - 5 / 6) / (17 / 36) ** 0.5
    assert r["z_stat"] == pytest.approx(z, abs=1e-5)
    assert r["chi2"] == pytest.approx(z * z, abs=1e-5)
    assert r["reject_5pct"] is False


def test_log_rank_identical_groups_is_null(spark):
    # Same duration profile in both groups: O == E at every time, z = 0.
    from jsonschema_validator_spark.operators.survival import log_rank

    rows = [("A", t, 1) for t in (1, 2, 3)] + [("B", t, 1) for t in (1, 2, 3)]
    r = log_rank(
        spark.createDataFrame(rows, "g string, dur int, ev int"),
        "dur",
        "ev",
        "g",
        "A",
        "B",
    ).collect()[0]
    assert r["z_stat"] == pytest.approx(0.0, abs=1e-9)
    assert r["reject_5pct"] is False


def test_log_rank_censoring_moves_at_risk_only(spark):
    # A censored subject leaves the risk set at its censoring time but
    # contributes no event step: with B's t=2 subject censored, time 3
    # sees n = 1 (only A's last), so E and V change accordingly.
    from jsonschema_validator_spark.operators.survival import log_rank

    df = spark.createDataFrame(
        [("A", 1, 1), ("A", 3, 1), ("B", 2, 0), ("B", 3, 1)],
        "g string, dur int, ev int",
    )
    r = log_rank(df, "dur", "ev", "g", "A", "B").collect()[0]
    # t=1: n=4, d=1, na=2 -> E=.5, V=1*(.5)(.5)(3/3)=.25
    # t=2: censoring only (d=0) -> no step
    # t=3: n=2 (A1, B1), d=2, na=1 -> E=1, V=2*(.5)(.5)*(0/1)=0
    assert r["o_a"] == 2
    assert r["e_a"] == pytest.approx(1.5, abs=1e-6)
    assert r["var_a"] == pytest.approx(0.25, abs=1e-6)


def test_mcnemar_hand_computed(spark):
    from jsonschema_validator_spark.operators.stats import mcnemar

    rows = (
        [(True, True)] * 5 + [(True, False)] * 8 + [(False, True)] * 2 + [(False, False)] * 3
    )
    r = mcnemar(
        spark.createDataFrame(rows, "a boolean, b boolean"), "a", "b"
    ).collect()[0]
    assert (r["n_both_pass"], r["n_a_only"], r["n_b_only"], r["n_both_fail"]) == (
        5,
        8,
        2,
        3,
    )
    assert r["chi2"] == pytest.approx((abs(8 - 2) - 1) ** 2 / 10, abs=1e-9)
    assert r["reject_5pct"] is False


def test_mcnemar_degenerate_and_null_verdicts(spark):
    from jsonschema_validator_spark.operators.stats import mcnemar

    # NULL verdict counts as a failure; zero discordance -> NULL chi2.
    rows = [(True, True), (None, None), (False, False)]
    r = mcnemar(
        spark.createDataFrame(rows, "a boolean, b boolean"), "a", "b"
    ).collect()[0]
    assert (r["n_both_pass"], r["n_a_only"], r["n_b_only"], r["n_both_fail"]) == (
        1,
        0,
        0,
        2,
    )
    assert r["chi2"] is None and r["reject_5pct"] is False


def test_eb_shrinkage_matches_moment_formula_and_direction(spark):
    from jsonschema_validator_spark.operators.stats import eb_shrunk_rates

    # keys: (trials, passes)
    spec = {"u1": (10, 9), "u2": (10, 1), "u3": (2, 2), "u4": (10, 5)}
    rows = []
    for key, (n, k) in spec.items():
        rows += [(key, True)] * k + [(key, False)] * (n - k)
    rows.append((None, True))  # NULL key must be excluded
    df = spark.createDataFrame(rows, "key string, ok boolean")
    out = {r["key"]: r for r in eb_shrunk_rates(df, "key", "ok").collect()}
    assert set(out) == set(spec)

    # independent replay of the Morris/Efron moment fit
    import statistics

    rates = [k / n for n, k in spec.values()]
    m = statistics.mean(rates)
    v = statistics.variance(rates)
    s = m * (1 - m) / v - 1
    assert s > 0
    alpha, beta = m * s, (1 - m) * s
    for key, (n, k) in spec.items():
        exp = (k + alpha) / (n + alpha + beta)
        assert out[key]["shrunk_rate"] == pytest.approx(exp, abs=1e-6)
        # shrinkage pulls toward the prior mean, never past it
        raw = k / n
        lo, hi = sorted((raw, m))
        assert lo - 1e-9 <= out[key]["shrunk_rate"] <= hi + 1e-9
    # the low-evidence key moves the most
    assert abs(out["u3"]["delta"]) > abs(out["u1"]["delta"])


def test_eb_shrinkage_degenerate_equal_rates(spark):
    from jsonschema_validator_spark.operators.stats import eb_shrunk_rates

    # identical rates -> zero variance -> s = 0 -> no shrinkage
    rows = [("a", True), ("a", False), ("b", True), ("b", False)]
    out = eb_shrunk_rates(
        spark.createDataFrame(rows, "key string, ok boolean"), "key", "ok"
    ).collect()
    for r in out:
        assert r["alpha"] == 0.0 and r["beta"] == 0.0
        assert r["shrunk_rate"] == r["raw_rate"]


def test_cramers_v_perfect_and_independent(spark):
    from jsonschema_validator_spark.operators.stats import cramers_v_matrix

    # x == y -> V = 1; z independent of x (balanced) -> V = 0;
    # w constant -> NULL V (dof 0).
    rows = []
    for i in range(40):
        x = "a" if i % 2 == 0 else "b"
        z = "p" if (i // 2) % 2 == 0 else "q"
        rows.append((x, x, z, "const"))
    df = spark.createDataFrame(rows, "x string, y string, z string, w string")
    out = {
        (r["col_a"], r["col_b"]): r
        for r in cramers_v_matrix(df, ["x", "y", "z", "w"]).collect()
    }
    assert out[("x", "y")]["cramers_v"] == pytest.approx(1.0, abs=1e-9)
    assert out[("x", "z")]["cramers_v"] == pytest.approx(0.0, abs=1e-9)
    assert out[("x", "w")]["cramers_v"] is None
    assert out[("x", "w")]["dof"] == 0


def test_cramers_v_null_is_a_category(spark):
    from jsonschema_validator_spark.operators.stats import cramers_v_matrix

    # nullness of y tracks x exactly -> perfect association
    rows = [("a", "v")] * 10 + [("b", None)] * 10
    df = spark.createDataFrame(rows, "x string, y string")
    r = cramers_v_matrix(df, ["x", "y"]).collect()[0]
    assert r["cramers_v"] == pytest.approx(1.0, abs=1e-9)
    assert r["n"] == 20


def test_theil_decomposition_identity_and_degenerate(spark):
    import math

    from jsonschema_validator_spark.operators.stats import theil_decomposition

    vals = {"g1": [1.0, 2.0, 3.0], "g2": [10.0, 20.0, 30.0, 40.0]}
    rows = [(g, v) for g, xs in vals.items() for v in xs]
    out = theil_decomposition(
        spark.createDataFrame(rows, "g string, v double"), "v", "g"
    ).collect()
    # independent replay: global Theil from raw values
    xs = [v for vs in vals.values() for v in vs]
    mu = sum(xs) / len(xs)
    t_global = sum((x / mu) * math.log(x / mu) for x in xs) / len(xs)
    r0 = out[0]
    assert r0["theil_total"] == pytest.approx(t_global, abs=1e-6)
    assert r0["theil_total"] == pytest.approx(
        r0["within_total"] + r0["between_total"], abs=2e-6
    )
    # equal values -> zero inequality everywhere
    eq = theil_decomposition(
        spark.createDataFrame([("a", 5.0), ("a", 5.0), ("b", 5.0)], "g string, v double"),
        "v",
        "g",
    ).collect()
    for r in eq:
        assert r["theil_total"] == 0.0 and r["theil_within"] == 0.0


def test_theil_excludes_nonpositive(spark):
    from jsonschema_validator_spark.operators.stats import theil_decomposition

    rows = [("a", 1.0), ("a", 0.0), ("a", -3.0), ("a", None), ("a", 2.0)]
    out = theil_decomposition(
        spark.createDataFrame(rows, "g string, v double"), "v", "g"
    ).collect()
    assert len(out) == 1 and out[0]["n_g"] == 2


def test_runs_test_alternating_and_clustered(spark):
    from jsonschema_validator_spark.operators.stats import runs_test

    # alternating -> 6 runs; E=4, Var=1.2
    alt = spark.createDataFrame(
        [(i, float(1 + i % 2)) for i in range(6)], "o int, v double"
    )
    r = runs_test(alt, "o", "v").collect()[0]
    assert (r["n"], r["n1"], r["n2"], r["runs"]) == (6, 3, 3, 6)
    assert r["e_runs"] == pytest.approx(4.0, abs=1e-9)
    assert r["var_runs"] == pytest.approx(1.2, abs=1e-9)
    assert r["z_stat"] == pytest.approx(2 / 1.2**0.5, abs=1e-5)

    # clustered -> 2 runs, symmetric negative z
    clu = spark.createDataFrame(
        [(i, 1.0 if i < 3 else 2.0) for i in range(6)], "o int, v double"
    )
    r2 = runs_test(clu, "o", "v").collect()[0]
    assert r2["runs"] == 2
    assert r2["z_stat"] == pytest.approx(-2 / 1.2**0.5, abs=1e-5)


def test_runs_test_degenerate_one_sided(spark):
    from jsonschema_validator_spark.operators.stats import runs_test

    # constant series: everything ties at the median -> all "below"
    df = spark.createDataFrame([(i, 7.0) for i in range(5)], "o int, v double")
    r = runs_test(df, "o", "v").collect()[0]
    assert r["n1"] == 0 and r["z_stat"] is None and r["flag"] is False


def test_hurst_trend_and_antipersistent(spark):
    from jsonschema_validator_spark.operators.timeseries import hurst_rs

    # linear trend: R/S grows ~ n -> H ~ 1
    trend = spark.createDataFrame(
        [(i, float(i)) for i in range(64)], "o int, v double"
    )
    rows = hurst_rs(trend, "o", "v", block_sizes=[8, 16, 32]).collect()
    assert [r["block_n"] for r in rows] == [8, 16, 32]
    assert rows[0]["n_blocks"] == 8 and rows[2]["n_blocks"] == 2
    assert rows[0]["hurst"] == pytest.approx(1.0, abs=0.02)
    assert all(r["n_points"] == 64 for r in rows)

    # strict alternation: R/S constant in n -> H ~ 0
    alt = spark.createDataFrame(
        [(i, float(i % 2)) for i in range(64)], "o int, v double"
    )
    r = hurst_rs(alt, "o", "v", block_sizes=[8, 16, 32]).collect()[0]
    assert r["hurst"] == pytest.approx(0.0, abs=0.02)


def test_hurst_drops_ragged_tail(spark):
    from jsonschema_validator_spark.operators.timeseries import hurst_rs

    # 40 points with sizes [8, 16]: 5 and 2 full blocks
    df = spark.createDataFrame(
        [(i, float(i * i % 17)) for i in range(40)], "o int, v double"
    )
    out = {r["block_n"]: r["n_blocks"] for r in hurst_rs(df, "o", "v", [8, 16]).collect()}
    assert out == {8: 5, 16: 2}


def test_permutation_entropy_monotone_and_noise(spark):
    from jsonschema_validator_spark.operators.timeseries import (
        permutation_entropy,
    )

    inc = spark.createDataFrame(
        [(i, float(i)) for i in range(20)], "o int, v double"
    )
    rows = permutation_entropy(inc, "o", "v").collect()
    assert len(rows) == 1 and rows[0]["pattern"] == "012"
    assert rows[0]["norm_entropy"] == 0.0 and rows[0]["n_windows"] == 18

    # constant series: ties rank by position -> still the single 012
    const = spark.createDataFrame(
        [(i, 5.0) for i in range(10)], "o int, v double"
    )
    rows2 = permutation_entropy(const, "o", "v").collect()
    assert len(rows2) == 1 and rows2[0]["pattern"] == "012"

    # up-down sawtooth: two patterns, entropy ln(2)
    saw = spark.createDataFrame(
        [(i, float(i % 2)) for i in range(20)], "o int, v double"
    )
    rows3 = permutation_entropy(saw, "o", "v").collect()
    assert len(rows3) == 2
    import math

    assert rows3[0]["entropy"] == pytest.approx(math.log(2), abs=1e-4)


def test_capture_recapture_hand_computed(spark):
    from jsonschema_validator_spark.operators.dedup import (
        capture_recapture_pairs,
    )

    # fa: {x: a,b,c} -> M = 3; fb: {y: a,b}, {z: c,d} -> C = 2;
    # joint: (x,y)={a,b} -> R = 1. Chapman = 4*3/2 - 1 = 5, se = sqrt(2).
    rows = [
        ("a", "x", "y"),
        ("b", "x", "y"),
        ("c", "x", "z"),
        ("d", "w", "z"),
        ("e", None, "q"),  # null fa: excluded from detector A only
    ]
    df = spark.createDataFrame(rows, "id string, fa string, fb string")
    r = capture_recapture_pairs(df, "id", F.col("fa"), F.col("fb")).collect()[0]
    assert (r["n_ids"], r["m_pairs"], r["c_pairs"], r["r_pairs"]) == (5, 3, 2, 1)
    assert r["chapman_est"] == pytest.approx(5.0, abs=1e-9)
    assert r["chapman_se"] == pytest.approx(2**0.5, abs=1e-6)
    assert r["caught_frac_a"] == pytest.approx(0.6, abs=1e-9)


def test_capture_recapture_no_dups(spark):
    from jsonschema_validator_spark.operators.dedup import (
        capture_recapture_pairs,
    )

    df = spark.createDataFrame(
        [(str(i), f"a{i}", f"b{i}") for i in range(5)],
        "id string, fa string, fb string",
    )
    r = capture_recapture_pairs(df, "id", F.col("fa"), F.col("fb")).collect()[0]
    assert r["m_pairs"] == 0 and r["chapman_est"] is None


def test_jackknife_ratio_hand_computed(spark):
    from jsonschema_validator_spark.operators.stats import jackknife_ratio

    # groups (num, den): (1,2), (2,2), (3,4); theta = .75
    # loo ratios 5/6, 4/6, 3/4 -> tbar = .75, var = (2/3)(2/144) = 1/108
    rows = []
    for g, (num, den) in {"g1": (1, 2), "g2": (2, 2), "g3": (3, 4)}.items():
        rows += [(g, 1)] * num + [(g, 0)] * (den - num)
    df = spark.createDataFrame(rows, "g string, ok int")
    r = jackknife_ratio(df, "g", F.col("ok"), F.lit(1)).collect()[0]
    assert r["n_groups"] == 3
    assert r["ratio"] == pytest.approx(0.75, abs=1e-9)
    assert r["jk_mean"] == pytest.approx(0.75, abs=1e-9)
    assert r["jk_se"] == pytest.approx((1 / 108) ** 0.5, abs=1e-6)
    assert r["ci_lo"] < 0.75 < r["ci_hi"]


def test_jackknife_single_group_degenerate(spark):
    from jsonschema_validator_spark.operators.stats import jackknife_ratio

    df = spark.createDataFrame([("g", 1), ("g", 0)], "g string, ok int")
    r = jackknife_ratio(df, "g", F.col("ok"), F.lit(1)).collect()[0]
    assert r["jk_se"] is None and r["ratio"] == 0.5
