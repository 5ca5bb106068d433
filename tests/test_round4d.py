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
