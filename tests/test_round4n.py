"""Round-4n batch 8: SMD covariate balance, difference-in-differences."""

from __future__ import annotations

import math

import numpy as np
import pytest


# -------------------------------------------------------------- SMD balance


def test_smd_matches_replay_and_flags_planted_imbalance(spark):
    from jsonschema_validator_spark.operators.evaluation import smd_balance

    rng = np.random.RandomState(3)
    rows = []
    c_age = rng.normal(40, 10, 300)
    t_age = rng.normal(43, 10, 300)  # planted imbalance ~0.3 SMD
    c_len = rng.normal(100, 20, 300)
    t_len = rng.normal(100, 20, 300)  # balanced
    for i in range(300):
        rows.append(("c", float(c_age[i]), float(c_len[i])))
        rows.append(("t", float(t_age[i]), float(t_len[i])))
    df = spark.createDataFrame(rows, "arm string, age double, length double")
    out = {
        r["covariate"]: r
        for r in smd_balance(
            df, "arm", ["age", "length"], control="c", treatment="t"
        ).collect()
    }
    smd = (t_age.mean() - c_age.mean()) / math.sqrt(
        (t_age.var(ddof=1) + c_age.var(ddof=1)) / 2
    )
    assert out["age"]["smd"] == pytest.approx(smd, abs=1e-4)
    assert out["age"]["imbalanced"]
    assert not out["length"]["imbalanced"]
    assert out["age"]["n_control"] == out["age"]["n_treatment"] == 300


def test_smd_sample_size_free_vs_t_test(spark):
    """A tiny true difference at huge n: t would scream, SMD stays
    under the cut — the property the operator exists for."""
    from jsonschema_validator_spark.operators.evaluation import smd_balance

    rng = np.random.RandomState(9)
    n = 20000
    rows = [("c", float(v)) for v in rng.normal(0, 1, n)] + [
        ("t", float(v)) for v in rng.normal(0.03, 1, n)
    ]
    df = spark.createDataFrame(rows, "arm string, x double")
    row = smd_balance(
        df, "arm", ["x"], control="c", treatment="t"
    ).collect()[0]
    # t-stat ~ 0.03 * sqrt(n/2) ~ 3 (significant); SMD ~ 0.03 (fine)
    assert abs(row["smd"]) < 0.1 and not row["imbalanced"]


def test_smd_null_and_degenerate_handling(spark):
    from jsonschema_validator_spark.operators.evaluation import smd_balance

    rows = [("c", 1.0, None), ("c", 2.0, None), ("t", 1.5, 5.0),
            ("t", 2.5, 5.0)]
    df = spark.createDataFrame(rows, "arm string, x double, y double")
    out = {
        r["covariate"]: r
        for r in smd_balance(
            df, "arm", ["x", "y"], control="c", treatment="t"
        ).collect()
    }
    assert out["x"]["smd"] is not None
    # y: control side all NULL -> n_control 0 -> smd NULL
    assert out["y"]["n_control"] == 0 and out["y"]["smd"] is None
    with pytest.raises(ValueError):
        smd_balance(df, "arm", [], control="c", treatment="t")


# --------------------------------------------------------------------- DiD


def test_did_matches_replay_and_removes_common_trend(spark):
    from jsonschema_validator_spark.operators.evaluation import did_test

    rng = np.random.RandomState(5)
    rows = []
    cells = {}
    # common trend +5, treatment effect +2 on top
    for (t, q), (mu, n) in {
        (0, 0): (10.0, 80),
        (0, 1): (15.0, 90),
        (1, 0): (12.0, 85),
        (1, 1): (19.0, 95),
    }.items():
        vals = rng.normal(mu, 1.0, n)
        cells[(t, q)] = vals
        arm_lbl = "t" if t else "c"
        per = "post" if q else "pre"
        rows += [(arm_lbl, per, float(v)) for v in vals]
    df = spark.createDataFrame(rows, "arm string, period string, y double")
    row = did_test(
        df, "arm", "period", "y", control="c", treatment="t",
        pre="pre", post="post",
    ).collect()[0]

    m = {k: v.mean() for k, v in cells.items()}
    did = (m[(1, 1)] - m[(1, 0)]) - (m[(0, 1)] - m[(0, 0)])
    se2 = sum(
        cells[k].var(ddof=1) / len(cells[k]) for k in cells
    )
    assert row["did"] == pytest.approx(did, abs=1e-5)
    assert row["se"] == pytest.approx(math.sqrt(se2), abs=1e-5)
    assert row["z"] == pytest.approx(did / math.sqrt(se2), abs=1e-4)
    assert row["did"] == pytest.approx(2.0, abs=0.5)  # recovers effect
    assert row["diff_control"] == pytest.approx(5.0, abs=0.5)


def test_did_empty_cell_yields_no_row(spark):
    from jsonschema_validator_spark.operators.evaluation import did_test

    rows = [
        ("c", "pre", 1.0), ("c", "pre", 2.0),
        ("c", "post", 2.0), ("c", "post", 3.0),
        ("t", "post", 5.0), ("t", "post", 6.0),  # no treatment pre
    ]
    df = spark.createDataFrame(rows, "arm string, period string, y double")
    assert did_test(
        df, "arm", "period", "y", control="c", treatment="t",
        pre="pre", post="post",
    ).collect() == []
