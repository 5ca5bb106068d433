"""Round-4m batch 7: SLA breach backtest (Kupiec + Christoffersen),
sequential near-duplicate adjacency screen."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------- SLA backtest


def _days_df(spark, flags_by_group):
    """One row per (group, day) with a 0/1 per-row breach flag equal
    to the day's verdict (rate over {0,1} row = the flag itself)."""
    rows = []
    for g, flags in flags_by_group.items():
        for d, f in enumerate(flags):
            # two rows per day, both with the flag value, so avg = flag
            day = f"2024-0{1 + d // 28}-{1 + d % 28:02d} 12:00:00"
            rows += [(g, day, int(f)), (g, day, int(f))]
    return spark.createDataFrame(rows, "g string, day string, b int").select(
        "g", F.to_timestamp("day").alias("ts"), "b"
    )


def test_kupiec_matches_replay_and_flags_excess(spark):
    from jsonschema_validator_spark.operators.quality_rules import (
        sla_breach_backtest,
    )

    # budget p0 = 0.1; planted 12/40 breach days (3x over budget)
    flags = [1 if d % 10 < 3 else 0 for d in range(40)]
    df = _days_df(spark, {"a": flags})
    row = sla_breach_backtest(
        df, "g", "ts", F.col("b"), p0=0.1
    ).collect()[0]
    n, x = 40, sum(flags)
    ph = x / n

    def xlog(v, p):
        return v * math.log(p) if v > 0 else 0.0

    lr = -2 * (xlog(n - x, 0.9) + xlog(x, 0.1)) + 2 * (
        xlog(n - x, 1 - ph) + xlog(x, ph)
    )
    assert row["n_breach_days"] == x
    assert row["lr_pof"] == pytest.approx(lr, abs=1e-5)
    assert row["pof_reject"]  # 30% breaches vs 10% budget


def test_christoffersen_flags_clustering_not_frequency(spark):
    from jsonschema_validator_spark.operators.quality_rules import (
        sla_breach_backtest,
    )

    n = 60
    k = 15
    # same breach COUNT, different arrangement; the scattered one is a
    # seeded uniform draw (a PERIODIC pattern like every-4th-day has
    # NEGATIVE serial dependence and correctly rejects too)
    clustered = [1] * k + [0] * (n - k)
    rng = np.random.RandomState(1)
    spread = [0] * n
    for i in rng.choice(n, k, replace=False):
        spread[i] = 1
    df = _days_df(spark, {"clustered": clustered, "spread": spread})
    out = {
        r["g"]: r
        for r in sla_breach_backtest(
            df, "g", "ts", F.col("b"), p0=0.25
        ).collect()
    }
    assert (
        out["clustered"]["n_breach_days"]
        == out["spread"]["n_breach_days"]
        == k
    )
    # frequency test agrees on both ...
    assert out["clustered"]["lr_pof"] == pytest.approx(
        out["spread"]["lr_pof"], abs=1e-6
    )
    # ... independence test separates them
    assert out["clustered"]["ind_reject"]
    assert not out["spread"]["ind_reject"]
    # replay clustered LR_ind: a run of 15 ones then 45 zeros gives
    # transitions n11=14, n10=1, n01=0, n00=44
    n11, n10, n01, n00 = 14, 1, 0, 44
    nt = n00 + n01 + n10 + n11
    pht = (n01 + n11) / nt
    p01 = n01 / (n00 + n01)
    p11 = n11 / (n10 + n11)

    def xlog(v, p):
        return v * math.log(p) if v > 0 else 0.0

    lr = -2 * (xlog(n00 + n10, 1 - pht) + xlog(n01 + n11, pht)) + 2 * (
        xlog(n00, 1 - p01)
        + xlog(n01, p01)
        + xlog(n10, 1 - p11)
        + xlog(n11, p11)
    )
    assert out["clustered"]["lr_ind"] == pytest.approx(lr, abs=1e-5)


def test_backtest_degenerate_sequences(spark):
    from jsonschema_validator_spark.operators.quality_rules import (
        sla_breach_backtest,
    )

    df = _days_df(spark, {"never": [0] * 30, "always": [1] * 30})
    out = {
        r["g"]: r
        for r in sla_breach_backtest(
            df, "g", "ts", F.col("b"), p0=0.1
        ).collect()
    }
    # one-state sequences: independence test undefined
    assert out["never"]["lr_ind"] is None
    assert out["always"]["lr_ind"] is None
    assert out["never"]["lr_pof"] == pytest.approx(
        -2 * 30 * math.log(0.9), abs=1e-5
    )
    assert out["always"]["pof_reject"]


# ------------------------------------------------------ sequential overlap


def test_sequential_overlap_finds_adjacent_dups(spark):
    from jsonschema_validator_spark.operators.dedup import sequential_overlap

    rows = [
        ("s1", 1, "alpha beta gamma delta epsilon"),
        ("s1", 2, "alpha beta gamma delta zeta"),  # 4/6 = 0.667
        ("s1", 3, "alpha beta gamma delta zeta"),  # identical -> 1.0
        ("s1", 4, "totally different words here now"),
        ("s2", 1, "alpha beta gamma delta zeta"),  # group boundary
    ]
    df = spark.createDataFrame(rows, "src string, doc_id int, text string")
    out = sequential_overlap(
        df, "src", "doc_id", "text", jaccard_cut=0.8
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["src"], r["id"], r["prev_id"]) == ("s1", 3, 2)
    assert r["jaccard"] == 1.0 and r["n_common"] == 5
    # lower cut picks up the 0.667 pair too; group boundary never pairs
    out2 = sequential_overlap(
        df, "src", "doc_id", "text", jaccard_cut=0.6
    ).collect()
    assert {(r["id"], r["prev_id"]) for r in out2} == {(2, 1), (3, 2)}
    assert all(r["src"] == "s1" for r in out2)


def test_sequential_overlap_token_semantics(spark):
    from jsonschema_validator_spark.operators.dedup import sequential_overlap

    rows = [
        ("s", 1, "Hello, WORLD! hello world"),  # distinct {hello, world}
        ("s", 2, "world hello"),  # same set, different order/case
        ("s", 3, ""),  # empty -> NULL jaccard, never flagged
        ("s", 4, "x1 y2"),  # digits split: {x, y}
    ]
    df = spark.createDataFrame(rows, "src string, doc_id int, text string")
    out = sequential_overlap(df, "src", "doc_id", "text").collect()
    assert [(r["id"], r["jaccard"]) for r in out] == [(2, 1.0)]
