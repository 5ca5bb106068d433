"""Round-4p batch 10: weighted kappa, Bowker symmetry, Cronbach alpha."""

from __future__ import annotations

import numpy as np
import pytest


# ---------------------------------------------------------- weighted kappa


def _wk_ref(pairs, k, quadratic=True):
    n = len(pairs)
    O = np.zeros((k, k))
    for a, b in pairs:
        O[a, b] += 1
    ra = O.sum(axis=1)
    rb = O.sum(axis=0)
    E = np.outer(ra, rb) / n
    idx = np.arange(k)
    d = np.abs(idx[:, None] - idx[None, :]) / (k - 1)
    W = d**2 if quadratic else d
    return 1 - (W * O).sum() / (W * E).sum()


def test_weighted_kappa_matches_reference(spark):
    from jsonschema_validator_spark.operators.agreement import weighted_kappa

    rng = np.random.RandomState(6)
    pairs = []
    for _ in range(400):
        a = int(rng.randint(0, 4))
        b = int(min(3, max(0, a + rng.choice([-1, 0, 0, 0, 1]))))
        pairs.append((a, b))
    df = spark.createDataFrame(pairs, "a int, b int")
    row = weighted_kappa(df, "a", "b", levels=4).collect()[0]
    assert row["kappa_w"] == pytest.approx(_wk_ref(pairs, 4), abs=1e-5)
    lin = weighted_kappa(df, "a", "b", levels=4, weights="linear").collect()[0]
    assert lin["kappa_w"] == pytest.approx(
        _wk_ref(pairs, 4, quadratic=False), abs=1e-5
    )
    assert row["n"] == 400 and row["n_excluded"] == 0


def test_weighted_kappa_near_misses_beat_plain_kappa(spark):
    """All disagreements one level off: weighted kappa >> plain."""
    from jsonschema_validator_spark.operators.agreement import (
        cohen_kappa,
        weighted_kappa,
    )

    rng = np.random.RandomState(3)
    pairs = []
    for _ in range(600):
        a = int(rng.randint(0, 5))
        b = int(a if rng.rand() < 0.5 else min(4, max(0, a + rng.choice([-1, 1]))))
        pairs.append((a, b))
    df = spark.createDataFrame(pairs, "a int, b int")
    wk = weighted_kappa(df, "a", "b", levels=5).collect()[0]["kappa_w"]
    pk = cohen_kappa(df, "a", "b").collect()[0]["kappa"]
    assert wk > pk + 0.2


def test_weighted_kappa_out_of_range_excluded(spark):
    from jsonschema_validator_spark.operators.agreement import weighted_kappa

    pairs = [(0, 0), (1, 1), (2, 2), (1, 2)] * 5 + [(7, 1), (None, 2)]
    df = spark.createDataFrame(pairs, "a int, b int")
    row = weighted_kappa(df, "a", "b", levels=3).collect()[0]
    assert row["n"] == 20 and row["n_excluded"] == 2
    with pytest.raises(ValueError):
        weighted_kappa(df, "a", "b", levels=1)


# ---------------------------------------------------------- Bowker symmetry


def test_bowker_detects_directional_drift(spark):
    from jsonschema_validator_spark.operators.agreement import bowker_symmetry

    rows = (
        [("hi", "hi")] * 100
        + [("med", "med")] * 80
        + [("lo", "lo")] * 90
        + [("med", "lo")] * 30  # systematic med -> lo relabeling
        + [("lo", "med")] * 5
        + [("hi", "med")] * 8
        + [("med", "hi")] * 7
    )
    df = spark.createDataFrame(rows, "a string, b string")
    row = bowker_symmetry(df, "a", "b").collect()[0]
    # pairs (string-sorted): (hi,lo): 0+0 -> no df; (hi,med): 8 vs 7;
    # (lo,med): 5 vs 30
    chi2 = (8 - 7) ** 2 / 15 + (5 - 30) ** 2 / 35
    assert row["df"] == 2
    assert row["chi2"] == pytest.approx(chi2, abs=1e-5)
    assert row["chi2_crit_95"] == 5.991
    assert row["reject"]
    assert row["n"] == len(rows)


def test_bowker_symmetric_table_passes(spark):
    from jsonschema_validator_spark.operators.agreement import bowker_symmetry

    rows = (
        [("a", "b")] * 20 + [("b", "a")] * 20
        + [("a", "c")] * 10 + [("c", "a")] * 10
        + [("a", "a")] * 50
    )
    df = spark.createDataFrame(rows, "a string, b string")
    row = bowker_symmetry(df, "a", "b").collect()[0]
    assert row["chi2"] == pytest.approx(0.0, abs=1e-9)
    assert not row["reject"]


# ----------------------------------------------------------- Cronbach alpha


def test_cronbach_matches_reference_formula(spark):
    from jsonschema_validator_spark.operators.agreement import cronbach_alpha

    rng = np.random.RandomState(8)
    trait = rng.normal(0, 2, 300)
    items = [trait + rng.normal(0, 1, 300) for _ in range(4)]
    rows = [tuple(float(it[i]) for it in items) for i in range(300)]
    df = spark.createDataFrame(rows, "q1 double, q2 double, q3 double, q4 double")
    row = cronbach_alpha(df, ["q1", "q2", "q3", "q4"]).collect()[0]

    X = np.column_stack(items)
    iv = X.var(axis=0, ddof=1).sum()
    tv = X.sum(axis=1).var(ddof=1)
    alpha = 4 / 3 * (1 - iv / tv)
    assert row["alpha"] == pytest.approx(alpha, abs=1e-5)
    assert row["alpha"] > 0.7  # strongly shared trait
    assert row["k"] == 4 and row["n"] == 300


def test_cronbach_independent_items_near_zero(spark):
    from jsonschema_validator_spark.operators.agreement import cronbach_alpha

    rng = np.random.RandomState(5)
    rows = [
        (float(a), float(b), float(c))
        for a, b, c in rng.normal(0, 1, (400, 3))
    ]
    df = spark.createDataFrame(rows, "a double, b double, c double")
    row = cronbach_alpha(df, ["a", "b", "c"]).collect()[0]
    assert abs(row["alpha"]) < 0.25


def test_cronbach_complete_case_and_validation(spark):
    from jsonschema_validator_spark.operators.agreement import cronbach_alpha

    rows = [(1.0, 2.0), (2.0, 3.0), (3.0, 5.0), (4.0, 4.0),
            (5.0, 6.0), (6.0, 8.0), (7.0, 7.0), (8.0, 9.0),
            (None, 1.0), (2.0, None)]
    df = spark.createDataFrame(rows, "a double, b double")
    row = cronbach_alpha(df, ["a", "b"]).collect()[0]
    assert row["n"] == 8 and row["n_excluded"] == 2
    with pytest.raises(ValueError):
        cronbach_alpha(df, ["a"])
