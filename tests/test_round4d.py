"""Round-4d operators: TOST equivalence of pass rates, Bland-Altman
paired-measurement agreement — the "are two engines the same" pair."""

import pytest
from pyspark.sql import functions as F


def _armed(spark, n_a, k_a, n_b, k_b):
    from pyspark.sql import Row

    rows = (
        [Row(arm="A", ok=True)] * k_a
        + [Row(arm="A", ok=False)] * (n_a - k_a)
        + [Row(arm="B", ok=True)] * k_b
        + [Row(arm="B", ok=False)] * (n_b - k_b)
    )
    return spark.createDataFrame(rows)


def test_tost_equivalent_hand_computed(spark):
    # pa = pb = 0.9, n = 400 each: se = sqrt(2*0.09/400) = 0.0212132,
    # zl = 0.05/se = 2.3570 > 1.645 and zu = -2.3570 < -1.645 -> equivalent.
    from jsonschema_validator_spark.operators.parity import tost_equivalence

    r = tost_equivalence(
        _armed(spark, 400, 360, 400, 360), "arm", "A", "B", "ok", margin=0.05
    ).collect()[0]
    assert (r["n_a"], r["n_b"]) == (400, 400)
    assert r["rate_a"] == pytest.approx(0.9)
    assert r["rate_b"] == pytest.approx(0.9)
    assert r["diff"] == 0.0
    assert r["se"] == pytest.approx(0.021213, abs=1e-6)
    assert r["z_lower"] == pytest.approx(2.357023, abs=1e-5)
    assert r["z_upper"] == pytest.approx(-2.357023, abs=1e-5)
    assert r["equivalent"] is True


def test_tost_large_gap_not_equivalent(spark):
    # pa = 0.9 vs pb = 0.7: zu = (0.2 - 0.05)/se >> 0 fails the upper
    # one-sided test -> positively NOT equivalent at this margin.
    from jsonschema_validator_spark.operators.parity import tost_equivalence

    r = tost_equivalence(
        _armed(spark, 200, 180, 200, 140), "arm", "A", "B", "ok", margin=0.05
    ).collect()[0]
    assert r["diff"] == pytest.approx(0.2)
    assert r["z_upper"] > 0
    assert r["equivalent"] is False


def test_tost_underpowered_small_n_not_certified(spark):
    # Same true rates but tiny n: se too large to reject either null ->
    # equivalent False (can't certify), NOT True — TOST never rewards
    # small samples.
    from jsonschema_validator_spark.operators.parity import tost_equivalence

    r = tost_equivalence(
        _armed(spark, 10, 9, 10, 9), "arm", "A", "B", "ok", margin=0.05
    ).collect()[0]
    assert r["equivalent"] is False


def test_tost_zero_variance_is_null(spark):
    # All-pass both arms: se = 0, no variance to certify with -> NULLs.
    from jsonschema_validator_spark.operators.parity import tost_equivalence

    r = tost_equivalence(
        _armed(spark, 50, 50, 50, 50), "arm", "A", "B", "ok", margin=0.05
    ).collect()[0]
    assert r["rate_a"] == 1.0 and r["rate_b"] == 1.0
    assert r["se"] is None and r["equivalent"] is None


def test_tost_rejects_unsupported_alpha(spark):
    from jsonschema_validator_spark.operators.parity import tost_equivalence

    with pytest.raises(ValueError):
        tost_equivalence(
            _armed(spark, 2, 1, 2, 1), "arm", "A", "B", "ok", alpha=0.01
        )


def test_bland_altman_hand_computed(spark):
    # diffs a-b = [1, -1, 2, -2, 0]: bias 0, sd = sqrt(10/4) = 1.5811388,
    # LoA = +/-3.0992, every diff inside -> pct_within 1.0.
    from jsonschema_validator_spark.operators.parity import bland_altman

    df = spark.createDataFrame(
        [(11.0, 10.0), (9.0, 10.0), (12.0, 10.0), (8.0, 10.0), (10.0, 10.0)],
        "a double, b double",
    )
    r = bland_altman(df, "a", "b").collect()[0]
    assert r["n"] == 5
    assert r["bias"] == 0.0
    assert r["sd_diff"] == pytest.approx(1.581139, abs=1e-6)
    assert r["loa_lower"] == pytest.approx(-3.098966, abs=1e-5)
    assert r["loa_upper"] == pytest.approx(3.098966, abs=1e-5)
    assert r["pct_within"] == 1.0
    assert r["mean_a"] == pytest.approx(10.0)
    assert r["mean_b"] == pytest.approx(10.0)


def test_bland_altman_systematic_bias_and_outlier(spark):
    # Scorer a reads exactly +2 except one wild pair: bias pulled off 2,
    # the outlier falls outside the limits -> pct_within < 1.
    from jsonschema_validator_spark.operators.parity import bland_altman

    rows = [(float(x + 2), float(x)) for x in range(10)] + [(120.0, 10.0)]
    r = bland_altman(
        spark.createDataFrame(rows, "a double, b double"), "a", "b"
    ).collect()[0]
    assert r["n"] == 11
    assert r["bias"] == pytest.approx((2 * 10 + 110) / 11, abs=1e-6)
    assert r["pct_within"] == pytest.approx(10 / 11, abs=1e-6)


def test_bland_altman_single_pair_degenerate(spark):
    from jsonschema_validator_spark.operators.parity import bland_altman

    r = bland_altman(
        spark.createDataFrame([(3.0, 1.0)], "a double, b double"), "a", "b"
    ).collect()[0]
    assert r["n"] == 1 and r["bias"] == 2.0
    assert r["sd_diff"] is None and r["loa_lower"] is None
    assert r["pct_within"] is None


def test_bland_altman_null_pairs_excluded(spark):
    from jsonschema_validator_spark.operators.parity import bland_altman

    df = spark.createDataFrame(
        [(1.0, 2.0), (None, 5.0), (3.0, None), (2.0, 1.0)],
        "a double, b double",
    )
    assert bland_altman(df, "a", "b").collect()[0]["n"] == 2


# --- round-4e: matched-design agreement (Cochran Q, Friedman, CCC, ICC) ---


def test_cochran_q_hand_computed(spark):
    # Classic 3-treatment layout, 4 items:
    #   item1: 1,1,0  item2: 1,0,0  item3: 1,1,1  item4: 0,0,0
    # C = (3,2,1), N = 6, sum R^2 = 4+1+9+0 = 14,
    # Q = 2*(3*14 - 36)/(18 - 14) = 2*6/4 = 3.0, df 2.
    from jsonschema_validator_spark.operators.agreement import cochran_q

    rows = []
    verd = {1: (1, 1, 0), 2: (1, 0, 0), 3: (1, 1, 1), 4: (0, 0, 0)}
    for i, (a, b, c) in verd.items():
        rows += [(i, "t1", a), (i, "t2", b), (i, "t3", c)]
    r = cochran_q(
        spark.createDataFrame(rows, "item int, t string, ok int"),
        "item",
        "t",
        "ok",
    ).collect()[0]
    assert (r["k"], r["n_items"], r["n_complete"], r["n_pass"]) == (3, 4, 4, 6)
    assert r["q_stat"] == pytest.approx(3.0, abs=1e-6)
    assert r["df"] == 2
    assert r["reject_5pct"] is False  # chi2(2) 5% cutoff is 5.99


def test_cochran_q_incomplete_blocks_excluded(spark):
    # Item 5 only has 2 of 3 verdicts -> excluded from the statistic but
    # counted in n_items.
    from jsonschema_validator_spark.operators.agreement import cochran_q

    rows = [(1, "t1", 1), (1, "t2", 0), (1, "t3", 0), (5, "t1", 1), (5, "t2", 1)]
    r = cochran_q(
        spark.createDataFrame(rows, "item int, t string, ok int"),
        "item",
        "t",
        "ok",
    ).collect()[0]
    assert (r["n_items"], r["n_complete"]) == (2, 1)
    # single complete discordant block: Q = 2*(3*(1+0+0) - 1)/(3*1 - 1) = 2.0
    assert r["q_stat"] == pytest.approx(2.0, abs=1e-6)


def test_cochran_q_degenerate_all_pass(spark):
    from jsonschema_validator_spark.operators.agreement import cochran_q

    rows = [(i, t, 1) for i in (1, 2) for t in ("t1", "t2")]
    r = cochran_q(
        spark.createDataFrame(rows, "item int, t string, ok int"),
        "item",
        "t",
        "ok",
    ).collect()[0]
    assert r["q_stat"] is None and r["reject_5pct"] is None


def test_friedman_hand_computed_no_ties(spark):
    # 3 treatments, 3 blocks, same order every block: ranks (1,2,3) each.
    # R = (3,6,9), classic chi2 = 12/(3*3*4)*(9+36+81) - 3*3*4 = 42 - 36 = 6.
    # Conover form must agree when untied: A = 3*(1+4+9) = 42,
    # B = (9+36+81)/3 = 42, centre = 3*3*16/4 = 36 -> 2*(42-36)/(42-42)…
    # denominator A - B = 0 when ranks are IDENTICAL per block — that's
    # the maximally-concordant degenerate: chi2 undefined -> NULL.
    from jsonschema_validator_spark.operators.stats import friedman_test

    rows = []
    for i in (1, 2, 3):
        rows += [(i, "a", 1.0), (i, "b", 2.0), (i, "c", 3.0)]
    r = friedman_test(
        spark.createDataFrame(rows, "item int, t string, v double"),
        "item",
        "t",
        "v",
    ).collect()[0]
    assert (r["k"], r["n_complete"]) == (3, 3)
    assert r["chi2"] is None  # perfect concordance: A == B


def test_friedman_hand_computed_mixed(spark):
    # blocks: (1,2,3), (1,3,2), (2,1,3) by treatment (a,b,c) ranks.
    # R_a = 4, R_b = 6, R_c = 8. A = 3*14 = 42, B = (16+36+64)/3 = 38.667,
    # centre = 36, chi2 = 2*(38.6667-36)/(42-38.6667) = 5.3333/3.3333 = 1.6.
    from jsonschema_validator_spark.operators.stats import friedman_test

    rows = [
        (1, "a", 1.0), (1, "b", 2.0), (1, "c", 3.0),
        (2, "a", 1.0), (2, "b", 3.0), (2, "c", 2.0),
        (3, "a", 2.0), (3, "b", 1.0), (3, "c", 3.0),
    ]
    r = friedman_test(
        spark.createDataFrame(rows, "item int, t string, v double"),
        "item",
        "t",
        "v",
    ).collect()[0]
    assert r["chi2"] == pytest.approx(1.6, abs=1e-6)
    assert r["reject_5pct"] is False


def test_friedman_ties_get_midranks(spark):
    # Block with a two-way tie: values (1,1,2) -> midranks (1.5,1.5,3).
    from jsonschema_validator_spark.operators.stats import friedman_test

    rows = [
        (1, "a", 1.0), (1, "b", 1.0), (1, "c", 2.0),
        (2, "a", 1.0), (2, "b", 2.0), (2, "c", 3.0),
    ]
    r = friedman_test(
        spark.createDataFrame(rows, "item int, t string, v double"),
        "item",
        "t",
        "v",
    ).collect()[0]
    # R_a = 2.5, R_b = 3.5, R_c = 6. A = 1.5^2*2 + 9 + 1 + 4 + 9 = 27.5,
    # B = (6.25 + 12.25 + 36)/2 = 27.25, centre = 2*3*16/4 = 24.
    # chi2 = 2*(27.25-24)/(27.5-27.25) = 6.5/0.25 = 26.0
    assert r["chi2"] == pytest.approx(26.0, abs=1e-6)


def test_lin_ccc_perfect_and_shifted(spark):
    from jsonschema_validator_spark.operators.parity import lin_ccc

    ident = spark.createDataFrame(
        [(1.0, 1.0), (2.0, 2.0), (3.0, 3.0)], "a double, b double"
    )
    r = lin_ccc(ident, "a", "b").collect()[0]
    assert r["pearson_r"] == 1.0 and r["c_b"] == 1.0 and r["ccc"] == 1.0

    # b = a + 3: r stays 1, ccc drops by the location shift.
    # var = 2/3 (pop), ccc = 2*(2/3)/(2/3 + 2/3 + 9) = (4/3)/(31/3) = 4/31.
    shifted = spark.createDataFrame(
        [(1.0, 4.0), (2.0, 5.0), (3.0, 6.0)], "a double, b double"
    )
    r = lin_ccc(shifted, "a", "b").collect()[0]
    assert r["pearson_r"] == 1.0
    assert r["ccc"] == pytest.approx(4 / 31, abs=1e-6)
    assert r["c_b"] == pytest.approx(4 / 31, abs=1e-6)


def test_lin_ccc_anticorrelated(spark):
    from jsonschema_validator_spark.operators.parity import lin_ccc

    r = lin_ccc(
        spark.createDataFrame(
            [(1.0, 3.0), (2.0, 2.0), (3.0, 1.0)], "a double, b double"
        ),
        "a",
        "b",
    ).collect()[0]
    assert r["pearson_r"] == -1.0 and r["ccc"] == pytest.approx(-1.0)


def test_icc_hand_computed_balanced(spark):
    # 2 items x 2 ratings: item1 (1,2), item2 (5,6).
    # SSB = 2*(1.5-3.5)^2 + 2*(5.5-3.5)^2 = 16, MSB = 16.
    # SSW = 0.5 + 0.5 = 1, MSW = 0.5. k0 = (4 - 8/4)/1 = 2.
    # ICC = (16-0.5)/(16+0.5) = 15.5/16.5.
    from jsonschema_validator_spark.operators.agreement import icc_oneway

    df = spark.createDataFrame(
        [(1, 1.0), (1, 2.0), (2, 5.0), (2, 6.0)], "item int, v double"
    )
    r = icc_oneway(df, "item", "v").collect()[0]
    assert (r["n_items"], r["n_ratings"]) == (2, 4)
    assert r["k0"] == 2.0
    assert r["msb"] == pytest.approx(16.0, abs=1e-6)
    assert r["msw"] == pytest.approx(0.5, abs=1e-6)
    assert r["icc1"] == pytest.approx(15.5 / 16.5, abs=1e-6)


def test_icc_no_replication_is_null(spark):
    from jsonschema_validator_spark.operators.agreement import icc_oneway

    df = spark.createDataFrame([(1, 1.0), (2, 5.0)], "item int, v double")
    r = icc_oneway(df, "item", "v").collect()[0]
    assert r["icc1"] is None and r["msw"] is None


def test_icc_pure_noise_near_zero(spark):
    # Items carry no signal: ratings identical across items -> MSB ~ MSW,
    # ICC <= small (can be negative).
    from jsonschema_validator_spark.operators.agreement import icc_oneway

    rows = [(i, float(j)) for i in range(1, 9) for j in (1, 2, 3)]
    r = icc_oneway(
        spark.createDataFrame(rows, "item int, v double"), "item", "v"
    ).collect()[0]
    assert r["msb"] == pytest.approx(0.0, abs=1e-9)
    assert r["icc1"] is not None and r["icc1"] < 0
