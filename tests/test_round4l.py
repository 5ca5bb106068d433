"""Round-4l batch 6: Cochran-Armitage trend, Mantel-Haenszel odds
ratio, Wilson intervals."""

from __future__ import annotations

import math

import numpy as np
import pytest


# --------------------------------------------------------- Cochran-Armitage


def test_cochran_armitage_matches_replay(spark):
    from jsonschema_validator_spark.operators.categorical import (
        cochran_armitage,
    )

    rng = np.random.RandomState(7)
    rows = []
    data = {}
    for w in range(5):  # failure rate rises with bucket
        n_i = 200
        p_i = 0.05 + 0.04 * w
        xs = rng.binomial(1, p_i, n_i)
        data[w] = xs
        rows += [(float(w), int(v)) for v in xs]
    df = spark.createDataFrame(rows, "b double, y int")
    row = cochran_armitage(df, "b", "y").collect()[0]

    ns = {w: len(v) for w, v in data.items()}
    xs = {w: v.sum() for w, v in data.items()}
    N = sum(ns.values())
    X = sum(xs.values())
    p = X / N
    t = sum(w * xs[w] for w in data) - p * sum(w * ns[w] for w in data)
    var = p * (1 - p) * (
        sum(w * w * ns[w] for w in data)
        - sum(w * ns[w] for w in data) ** 2 / N
    )
    assert row["pooled_rate"] == pytest.approx(p, abs=1e-9)
    assert row["t_stat"] == pytest.approx(t, abs=1e-6)
    assert row["z"] == pytest.approx(t / math.sqrt(var), abs=1e-5)
    assert row["trending"]  # the planted drift is detected


def test_cochran_armitage_flat_rate_not_trending(spark):
    from jsonschema_validator_spark.operators.categorical import (
        cochran_armitage,
    )

    rng = np.random.RandomState(2)
    rows = [
        (float(w), int(v))
        for w in range(5)
        for v in rng.binomial(1, 0.2, 300)
    ]
    df = spark.createDataFrame(rows, "b double, y int")
    row = cochran_armitage(df, "b", "y").collect()[0]
    assert not row["trending"]
    # too few buckets -> NULL z
    df2 = spark.createDataFrame(
        [(0.0, 1), (0.0, 0), (1.0, 1), (1.0, 0)], "b double, y int"
    )
    row2 = cochran_armitage(df2, "b", "y").collect()[0]
    assert row2["z"] is None and row2["trending"] is None


# ---------------------------------------------------------- Mantel-Haenszel


def test_mantel_haenszel_simpson_reversal(spark):
    """Classic Simpson setup: pooled 2x2 shows treatment worse, MH
    (within-stratum) shows it better."""
    from jsonschema_validator_spark.operators.categorical import (
        mantel_haenszel,
    )

    rows = []

    def add(s, arm_lbl, succ, fail):
        rows.extend([(s, arm_lbl, 1)] * succ + [(s, arm_lbl, 0)] * fail)

    # stratum easy: treatment mostly here, both arms do well
    add("easy", "t", 192, 48)  # 80%
    add("easy", "c", 55, 5)  # ~92% but tiny
    # stratum hard: control mostly here, both arms do poorly
    add("hard", "t", 12, 48)  # 20%
    add("hard", "c", 60, 180)  # 25%
    df = spark.createDataFrame(rows, "s string, arm string, y int")
    row = mantel_haenszel(
        df, "s", "arm", "y", control="c", treatment="t"
    ).collect()[0]

    # replay OR_MH
    tables = {
        "easy": (192, 48, 55, 5),
        "hard": (12, 48, 60, 180),
    }
    num = sum(a * d / (a + b + c + d) for a, b, c, d in tables.values())
    den = sum(b * c / (a + b + c + d) for a, b, c, d in tables.values())
    assert row["or_mh"] == pytest.approx(num / den, abs=1e-5)
    assert row["n_strata"] == 2 and row["n_strata_excluded"] == 0


def test_mantel_haenszel_chi2_replay_and_exclusions(spark):
    from jsonschema_validator_spark.operators.categorical import (
        mantel_haenszel,
    )

    rows = []

    def add(s, arm_lbl, succ, fail):
        rows.extend([(s, arm_lbl, 1)] * succ + [(s, arm_lbl, 0)] * fail)

    add("s1", "t", 30, 10)
    add("s1", "c", 20, 20)
    add("s2", "t", 25, 15)
    add("s2", "c", 15, 25)
    add("orphan", "t", 5, 5)  # no control arm -> excluded
    df = spark.createDataFrame(rows, "s string, arm string, y int")
    row = mantel_haenszel(
        df, "s", "arm", "y", control="c", treatment="t"
    ).collect()[0]
    assert row["n_strata"] == 2 and row["n_strata_excluded"] == 1

    sa = se = sv = 0.0
    for a, b, c, d in ((30, 10, 20, 20), (25, 15, 15, 25)):
        n = a + b + c + d
        r1, r0 = a + b, c + d
        c1, c0 = a + c, b + d
        sa += a
        se += r1 * c1 / n
        sv += r1 * r0 * c1 * c0 / (n * n * (n - 1))
    chi2 = (abs(sa - se) - 0.5) ** 2 / sv
    assert row["chi2"] == pytest.approx(chi2, abs=1e-5)
    assert row["chi2_crit"] == pytest.approx(1.96**2, abs=1e-9)
    assert row["reject"] == (chi2 > 1.96**2)


# ------------------------------------------------------------------- Wilson


def test_wilson_matches_closed_form_and_beats_normal_at_edge(spark):
    from jsonschema_validator_spark.operators.categorical import (
        wilson_intervals,
    )

    rows = [("edge", 0)] * 20 + [("mid", 1)] * 30 + [("mid", 0)] * 70
    df = spark.createDataFrame(rows, "g string, y int")
    out = {r["g"]: r for r in wilson_intervals(df, "g", "y").collect()}

    # p = 0, n = 20: normal interval collapses to [0, 0]; Wilson doesn't
    e = out["edge"]
    assert e["normal_lo"] == 0.0 and e["normal_hi"] == 0.0
    assert e["wilson_lo"] == 0.0 or e["wilson_lo"] >= 0.0
    assert e["wilson_hi"] > 0.1  # honest upper bound near 16%

    m = out["mid"]
    p, n, z = 0.3, 100, 1.96
    denom = 1 + z * z / n
    center = (p + z * z / (2 * n)) / denom
    half = z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n)) / denom
    assert m["wilson_lo"] == pytest.approx(center - half, abs=1e-5)
    assert m["wilson_hi"] == pytest.approx(center + half, abs=1e-5)
    assert m["normal_lo"] == pytest.approx(
        p - z * math.sqrt(p * 0.7 / n), abs=1e-5
    )
    # interval stays in [0, 1] by construction
    assert 0.0 <= m["wilson_lo"] < p < m["wilson_hi"] <= 1.0
