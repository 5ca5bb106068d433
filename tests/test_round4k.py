"""Round-4k batch 5: quantile-slope divergence (grid quantile
regression), column risk profile."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


def _series_df(spark, series_by_group):
    rows = []
    for g, xs in series_by_group.items():
        for d, v in enumerate(xs):
            rows.append(
                (g, f"2024-0{1 + d // 28}-{1 + d % 28:02d} 12:00:00", float(v))
            )
    return spark.createDataFrame(rows, "g string, day string, v double").select(
        "g", F.to_timestamp("day").alias("ts"), "v"
    )


# ------------------------------------------------- quantile slope divergence


def test_qslope_recovers_planted_tail_divergence(spark):
    from jsonschema_validator_spark.operators.timeseries import (
        quantile_slope_divergence,
    )

    # median flat, upper tail grows: every 5th day spikes by 0.5*t
    xs = [100.0 + (0.5 * d if d % 5 == 0 else 0.0) for d in range(40)]
    df = _series_df(spark, {"a": xs})
    out = {
        r["tau"]: r
        for r in quantile_slope_divergence(df, group="g", ts="ts", value="v")
        .collect()
    }
    assert out[0.5]["slope"] == pytest.approx(0.0, abs=1e-9)
    assert out[0.9]["slope"] >= 0.3  # tail trend detected
    assert not out[0.5]["at_grid_edge"]


def test_qslope_matches_bruteforce_pinball(spark):
    from jsonschema_validator_spark.operators.timeseries import (
        quantile_slope_divergence,
    )

    rng = np.random.RandomState(5)
    xs = (3.0 + 0.2 * np.arange(30) + rng.normal(0, 0.5, 30)).tolist()
    df = _series_df(spark, {"a": xs})
    grid = (-0.5, -0.2, 0.0, 0.1, 0.2, 0.3, 0.5)
    out = {
        r["tau"]: r
        for r in quantile_slope_divergence(
            df, group="g", ts="ts", value="v", taus=(0.5,), slope_grid=grid
        ).collect()
    }

    x = np.asarray(xs)
    t = np.arange(30, dtype=float)

    def pinball(tau, b):
        a = np.quantile(x - b * t, tau)  # linear interpolation, like SQL
        u = x - b * t - a
        return np.where(u >= 0, tau * u, (tau - 1) * u).sum(), a

    losses = {b: pinball(0.5, b) for b in grid}
    best = min(grid, key=lambda b: (round(losses[b][0], 6), abs(b), b))
    assert out[0.5]["slope"] == pytest.approx(best, abs=1e-9)
    assert out[0.5]["pinball_loss"] == pytest.approx(
        round(losses[best][0], 6), abs=1e-4
    )
    assert out[0.5]["intercept"] == pytest.approx(losses[best][1], abs=1e-4)


def test_qslope_grid_edge_flagged(spark):
    from jsonschema_validator_spark.operators.timeseries import (
        quantile_slope_divergence,
    )

    xs = [10.0 * d for d in range(20)]  # slope 10 >> grid max
    df = _series_df(spark, {"a": xs})
    out = quantile_slope_divergence(
        df, group="g", ts="ts", value="v", taus=(0.5,)
    ).collect()[0]
    assert out["at_grid_edge"] and out["slope"] == 2.0


# ---------------------------------------------------- column risk profile


def test_column_risk_roles_and_entropy(spark):
    from jsonschema_validator_spark.operators.profile import (
        column_risk_profile,
    )

    n = 400
    rows = [
        (
            i,  # identifier: all distinct
            f"u{i % 80}",  # quasi_id: distinct ratio 0.2
            "en" if i % 4 else "fr",  # dominated: 75% one value
            ["a", "b", "c", "d"][i % 4],  # categorical, uniform
            None if i % 10 == 0 else "x",  # nulls + dominated
        )
        for i in range(n)
    ]
    df = spark.createDataFrame(
        rows, "id long, user string, lang string, cat string, opt string"
    )
    out = {r["column"]: r for r in column_risk_profile(df).collect()}
    assert out["id"]["role"] == "identifier"
    assert out["id"]["distinct_ratio"] == 1.0
    assert out["user"]["role"] == "quasi_id"
    assert out["lang"]["role"] == "dominated"
    assert out["lang"]["top_value"] == "en"
    assert out["lang"]["top_share"] == 0.75
    assert out["cat"]["role"] == "categorical"
    assert out["cat"]["entropy_bits"] == pytest.approx(2.0, abs=1e-9)
    assert out["opt"]["null_rate"] == pytest.approx(0.1, abs=1e-9)
    assert out["opt"]["role"] == "dominated"
    assert out["opt"]["n_rows"] == n


def test_column_risk_all_null_and_subset(spark):
    from jsonschema_validator_spark.operators.profile import (
        column_risk_profile,
    )

    rows = [(i, None) for i in range(20)]
    df = spark.createDataFrame(rows, "id long, dead string")
    out = {
        r["column"]: r
        for r in column_risk_profile(df, columns=["dead"]).collect()
    }
    assert set(out) == {"dead"}
    row = out["dead"]
    assert row["null_rate"] == 1.0
    assert row["entropy_bits"] is None
    assert row["role"] == "dominated"
    with pytest.raises(ValueError):
        column_risk_profile(df, columns=[])
