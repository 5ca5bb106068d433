"""Round-4g operators: entropy l-diversity, CUPED variance-reduced
A/B test, conditional mutual information over transcripts."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F


# ------------------------------------------------------ entropy l-diversity


def test_entropy_l_diversity_skewed_class_fails(spark):
    from jsonschema_validator_spark.operators.privacy import (
        entropy_l_diversity,
        k_anonymity,
    )

    # class "skew": 2 distinct values but 99-to-1 — passes distinct
    # l-diversity at l=2, must FAIL entropy l-diversity at l=2.
    rows = (
        [("skew", "a")] * 99
        + [("skew", "b")]
        + [("fair", "a")] * 10
        + [("fair", "b")] * 10
        + [("mono", "a")] * 5
    )
    df = spark.createDataFrame(rows, "qi string, s string")
    out = {
        r["qi"]: r
        for r in entropy_l_diversity(df, ["qi"], "s", l=2.0).collect()
    }
    distinct = {
        r["qi"]: r for r in k_anonymity(df, ["qi"], sensitive="s").collect()
    }
    assert not distinct["skew"]["l_violation"]  # distinct count passes
    assert out["skew"]["l_violation"]  # entropy catches it
    # exact entropy replay
    p = np.array([99, 1]) / 100
    h = -(p * np.log2(p)).sum()
    assert out["skew"]["entropy_bits"] == pytest.approx(h, abs=1e-5)
    assert out["skew"]["effective_l"] == pytest.approx(2**h, abs=1e-4)
    assert out["fair"]["entropy_bits"] == pytest.approx(1.0, abs=1e-9)
    assert not out["fair"]["l_violation"]
    assert out["mono"]["entropy_bits"] == pytest.approx(0.0, abs=1e-9)
    assert out["mono"]["l_violation"]


def test_entropy_l_diversity_null_handling(spark):
    from jsonschema_validator_spark.operators.privacy import (
        entropy_l_diversity,
    )

    rows = [("c", None)] * 4 + [("c", "x")] * 4
    df = spark.createDataFrame(rows, "qi string, s string")
    row = entropy_l_diversity(df, ["qi"], "s").collect()[0]
    # NULL sensitive excluded from diversity but kept in class_size
    assert row["class_size"] == 8 and row["n_sensitive"] == 1
    assert row["l_violation"]

    # all-NULL class: entropy undefined -> violation by convention
    df2 = spark.createDataFrame([("c", None)] * 3, "qi string, s string")
    row2 = entropy_l_diversity(df2, ["qi"], "s").collect()[0]
    assert row2["n_sensitive"] == 0 and row2["l_violation"]
    assert row2["entropy_bits"] is None


# ------------------------------------------------------------------- CUPED


def _cuped_frame(spark, rho_strength=0.9, lift=0.5, n=400, seed=13):
    rng = np.random.RandomState(seed)
    x = rng.normal(10, 2, n)
    noise = rng.normal(0, math.sqrt(1 - rho_strength**2) * 2, n)
    arm = np.array(["t" if i % 2 == 0 else "c" for i in range(n)])
    y = rho_strength * x + noise + np.where(arm == "t", lift, 0.0)
    rows = [
        (a, float(xx), float(yy)) for a, xx, yy in zip(arm, x, y)
    ]
    return (
        spark.createDataFrame(rows, "arm string, x double, y double"),
        arm,
        x,
        y,
    )


def test_cuped_matches_numpy_replay(spark):
    from jsonschema_validator_spark.operators.evaluation import cuped

    df, arm, x, y = _cuped_frame(spark)
    row = cuped(df, "arm", "x", "y", control="c", treatment="t").collect()[0]

    theta = np.cov(x, y, bias=True)[0, 1] / np.var(x)
    ycv = y - theta * (x - x.mean())
    tmask, cmask = arm == "t", arm == "c"
    lift_raw = y[tmask].mean() - y[cmask].mean()
    se2_raw = np.var(y[tmask], ddof=1) / tmask.sum() + np.var(
        y[cmask], ddof=1
    ) / cmask.sum()
    lift_cv = ycv[tmask].mean() - ycv[cmask].mean()
    se2_cv = np.var(ycv[tmask], ddof=1) / tmask.sum() + np.var(
        ycv[cmask], ddof=1
    ) / cmask.sum()
    assert row["theta"] == pytest.approx(theta, abs=1e-4)
    assert row["lift_raw"] == pytest.approx(lift_raw, abs=1e-4)
    assert row["z_raw"] == pytest.approx(lift_raw / math.sqrt(se2_raw), abs=1e-3)
    assert row["lift_cuped"] == pytest.approx(lift_cv, abs=1e-4)
    assert row["z_cuped"] == pytest.approx(lift_cv / math.sqrt(se2_cv), abs=1e-3)
    assert row["var_reduction"] == pytest.approx(1 - se2_cv / se2_raw, abs=1e-4)
    # strong covariate: big variance reduction, sharper z
    assert row["var_reduction"] > 0.5
    assert abs(row["z_cuped"]) > abs(row["z_raw"])
    assert row["rho"] == pytest.approx(
        np.corrcoef(x, y)[0, 1], abs=1e-4
    )


def test_cuped_zero_variance_covariate_falls_back(spark):
    from jsonschema_validator_spark.operators.evaluation import cuped

    rows = [("c", 1.0, float(v)) for v in range(10)] + [
        ("t", 1.0, float(v + 2)) for v in range(10)
    ]
    df = spark.createDataFrame(rows, "arm string, x double, y double")
    row = cuped(df, "arm", "x", "y", control="c", treatment="t").collect()[0]
    assert row["theta"] is None
    assert row["lift_cuped"] == row["lift_raw"]
    assert row["z_cuped"] == row["z_raw"]
    assert row["var_reduction"] == pytest.approx(0.0, abs=1e-9)


def test_cuped_per_group_and_min_n(spark):
    from jsonschema_validator_spark.operators.evaluation import cuped

    rng = np.random.RandomState(1)
    rows = []
    for g in ("g1", "g2"):
        for i in range(40):
            a = "t" if i % 2 else "c"
            x = float(rng.normal(0, 1))
            rows.append((g, a, x, x + float(rng.normal(0, 0.1))))
    rows += [("tiny", "c", 1.0, 1.0), ("tiny", "t", 1.0, 2.0)]
    df = spark.createDataFrame(rows, "g string, arm string, x double, y double")
    out = cuped(
        df, "arm", "x", "y", control="c", treatment="t", group="g"
    ).collect()
    assert sorted(r["g"] for r in out) == ["g1", "g2"]


# ----------------------------------------------- conditional mutual info


def test_cmi_deterministic_covariate(spark):
    """Z fully determines next role within each current role -> CMI
    equals H(next|role); influence_ratio = 1."""
    from jsonschema_validator_spark.operators.conversation import (
        conditional_mutual_information,
    )

    rows = []
    for conv in range(40):
        z = "a" if conv % 2 == 0 else "b"
        nxt = "X" if z == "a" else "Y"
        rows += [
            (conv, 0, "u", z),
            (conv, 1, nxt, "c"),
        ]
    df = spark.createDataFrame(rows, "conv long, i int, role string, z string")
    row = conditional_mutual_information(
        df, "conv", "i", "role", "z"
    ).collect()[0]
    assert row["n_transitions"] == 40
    assert row["h_next_given_role_bits"] == pytest.approx(1.0, abs=1e-9)
    assert row["h_next_given_role_z_bits"] == pytest.approx(0.0, abs=1e-9)
    assert row["cmi_bits"] == pytest.approx(1.0, abs=1e-9)
    assert row["influence_ratio"] == pytest.approx(1.0, abs=1e-9)


def test_cmi_independent_covariate_is_zero(spark):
    from jsonschema_validator_spark.operators.conversation import (
        conditional_mutual_information,
    )

    rows = []
    conv = 0
    # balanced design: every (z, next) combination equally often
    for z in ("a", "b"):
        for nxt in ("X", "Y"):
            for _ in range(5):
                rows += [(conv, 0, "u", z), (conv, 1, nxt, "c")]
                conv += 1
    df = spark.createDataFrame(rows, "conv long, i int, role string, z string")
    row = conditional_mutual_information(
        df, "conv", "i", "role", "z"
    ).collect()[0]
    assert row["cmi_bits"] == pytest.approx(0.0, abs=1e-9)
    assert row["influence_ratio"] == pytest.approx(0.0, abs=1e-9)


def test_cmi_matches_numpy_and_nulls_are_categories(spark):
    from jsonschema_validator_spark.operators.conversation import (
        conditional_mutual_information,
    )

    rng = np.random.RandomState(21)
    rows = []
    trans = []
    for conv in range(120):
        roles = ["u", "as", None, "u"]
        zs = [
            None if rng.rand() < 0.3 else ("t1" if rng.rand() < 0.5 else "t2")
            for _ in roles
        ]
        for i, (r, z) in enumerate(zip(roles, zs)):
            rows.append((conv, i, r, z))
        for i in range(len(roles) - 1):
            trans.append(
                (
                    roles[i] or "(null)",
                    zs[i] or "(null)",
                    roles[i + 1] or "(null)",
                )
            )
    df = spark.createDataFrame(rows, "conv long, i int, role string, z string")
    row = conditional_mutual_information(
        df, "conv", "i", "role", "z"
    ).collect()[0]

    from collections import Counter

    n = len(trans)
    c_rzn = Counter(trans)
    c_rn = Counter((r, nx) for r, _, nx in trans)
    c_rz = Counter((r, z) for r, z, _ in trans)
    c_r = Counter(r for r, _, _ in trans)

    def h_cond(joint, marg):
        return (
            sum(v * math.log2(v) for v in marg.values())
            - sum(v * math.log2(v) for v in joint.values())
        ) / n

    h1 = h_cond(c_rn, c_r)
    h2 = h_cond(c_rzn, c_rz)
    assert row["n_transitions"] == n
    assert row["h_next_given_role_bits"] == pytest.approx(h1, abs=1e-6)
    assert row["h_next_given_role_z_bits"] == pytest.approx(h2, abs=1e-6)
    assert row["cmi_bits"] == pytest.approx(h1 - h2, abs=1e-6)
