"""CUSUM change-point screen (operators/changepoint): sustained-drift
sensitivity, pointwise-screen blindness contrast, quietness on clean
data, and partition-order independence."""

from __future__ import annotations

import datetime

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
