"""CUSUM change-point screen (operators/changepoint): sustained-drift
sensitivity, pointwise-screen blindness contrast, quietness on clean
data, and partition-order independence."""

from __future__ import annotations

import datetime

import pytest

import pyspark.sql.functions as F


def _series(spark, shift=0.0, shift_from=20, days=30, per_day=4):
    rows = []
    for d in range(days):
        for j in range(per_day):
            ts = datetime.datetime(2024, 1, 1 + d, 6 * j)
            base = 10.0 + (j - 1.5) * 0.4  # deterministic within-day wiggle
            x = base + (shift if d + 1 >= shift_from else 0.0)
            rows.append(("g1", ts, x))
    return spark.createDataFrame(rows, "g string, ts timestamp, v double")


def test_cusum_flags_sustained_shift_only_after_onset(spark):
    from jsonschema_validator_spark.operators.changepoint import cusum_screen

    out = cusum_screen(_series(spark, shift=2.0), "g", "ts", "v").orderBy("day").collect()
    flagged = [r["day"] for r in out if r["flag"]]
    assert flagged, "sustained shift must flag"
    assert min(flagged) >= "2024-01-20"
    # cusum is non-decreasing across the post-shift run
    post = [r["cusum"] for r in out if r["day"] >= "2024-01-20"]
    assert post == sorted(post)


def test_cusum_quiet_on_clean_series(spark):
    from jsonschema_validator_spark.operators.changepoint import cusum_screen

    out = cusum_screen(_series(spark, shift=0.0), "g", "ts", "v").collect()
    assert not any(r["flag"] for r in out)


def test_cusum_catches_drift_pointwise_screen_misses(spark):
    """A +0.8-sigma-ish sustained shift: every single day stays inside
    a 4-sigma pointwise band, but the accumulated statistic crosses."""
    from jsonschema_validator_spark.operators.changepoint import cusum_screen

    df = _series(spark, shift=1.0, shift_from=15)
    daily = df.groupBy("g", F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day")).agg(
        F.avg("v").alias("x")
    )
    stats = daily.groupBy("g").agg(F.avg("x").alias("mu"), F.stddev_samp("x").alias("sd")).collect()[0]
    pointwise_flags = daily.filter(
        F.col("x") > stats["mu"] + 4 * stats["sd"]
    ).count()
    assert pointwise_flags == 0  # the screen CUSUM complements sees nothing
    out = cusum_screen(df, "g", "ts", "v").collect()
    assert any(r["flag"] for r in out)


def test_cusum_constant_series_no_nan(spark):
    from jsonschema_validator_spark.operators.changepoint import cusum_screen

    rows = [("g1", datetime.datetime(2024, 1, 1 + d), 5.0) for d in range(5)]
    df = spark.createDataFrame(rows, "g string, ts timestamp, v double")
    out = cusum_screen(df, "g", "ts", "v").collect()
    assert len(out) == 5
    assert all(r["cusum"] == 0.0 and not r["flag"] for r in out)


def test_cusum_partition_order_independent(spark):
    from jsonschema_validator_spark.operators.changepoint import cusum_screen

    df = _series(spark, shift=2.0)
    a = sorted(tuple(r) for r in cusum_screen(df, "g", "ts", "v").collect())
    b = sorted(tuple(r) for r in cusum_screen(df.repartition(7), "g", "ts", "v").collect())
    assert a == b


def test_best_split_planted_step(spark):
    import datetime as dt

    from jsonschema_validator_spark.operators.changepoint import best_split

    # counts 5,5,5,5 then 20,20,20,20: the split after day 4 explains
    # ALL the variance (two perfectly constant segments).
    rows = []
    for d in range(8):
        c = 5 if d < 4 else 20
        rows += [("g", dt.datetime(2024, 2, 1 + d, 12))] * c
    df = spark.createDataFrame(rows, "g string, ts timestamp")
    r = best_split(df, "g", "ts").collect()[0]
    assert r["split_day"] == "2024-02-04"
    assert (r["mean_left"], r["mean_right"]) == (5.0, 20.0)
    assert r["shift"] == 15.0
    assert r["explained"] == pytest.approx(1.0, abs=1e-9)


def test_best_split_flat_series_and_tie_break(spark):
    import datetime as dt

    from jsonschema_validator_spark.operators.changepoint import best_split

    # flat series: zero variance -> no break to locate
    rows = [("flat", dt.datetime(2024, 2, 1 + d, 12)) for d in range(4)]
    # symmetric vee 9,1,1,9: splits after day1 and day3 tie on gain;
    # the EARLIEST day must win
    for d, c in enumerate([9, 1, 1, 9]):
        rows += [("vee", dt.datetime(2024, 2, 1 + d, 12))] * c
    df = spark.createDataFrame(rows, "g string, ts timestamp")
    out = {r["part"]: r for r in best_split(df, "g", "ts").collect()}
    assert out["flat"]["split_day"] is None and out["flat"]["explained"] is None
    assert out["vee"]["split_day"] == "2024-02-01"
