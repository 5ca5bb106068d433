"""Round-4j batch 4: Gumbel return levels, record-count and
turning-point i.i.d. screens, Heaps' law vocabulary growth."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F


def _series_df(spark, series_by_group):
    rows = []
    for g, xs in series_by_group.items():
        for d, v in enumerate(xs):
            rows.append((g, f"2024-0{1 + d // 28}-{1 + d % 28:02d} 12:00:00", float(v)))
    return spark.createDataFrame(rows, "g string, day string, v double").select(
        "g", F.to_timestamp("day").alias("ts"), "v"
    )


# ------------------------------------------------------------------ Gumbel


def test_gumbel_matches_moment_formulas(spark):
    from jsonschema_validator_spark.operators.extremes import (
        gumbel_return_levels,
    )

    rng = np.random.RandomState(4)
    # per-day multiple rows; operator takes the day max
    rows = []
    maxima = []
    for d in range(30):
        vals = rng.gumbel(100, 15, 20)
        maxima.append(vals.max())
        for v in vals:
            rows.append(("a", f"2024-01-{d + 1:02d} 12:00:00", float(v)))
    df = spark.createDataFrame(rows, "g string, day string, v double").select(
        "g", F.to_timestamp("day").alias("ts"), "v"
    )
    out = {
        r["return_period"]: r
        for r in gumbel_return_levels(df, "g", "ts", "v").collect()
    }
    m = np.mean(maxima)
    s = np.std(maxima, ddof=1)
    beta = s * math.sqrt(6) / math.pi
    mu = m - 0.5772156649015329 * beta
    for t in (30, 90, 365):
        lvl = mu - beta * math.log(-math.log(1 - 1 / t))
        assert out[t]["return_level"] == pytest.approx(lvl, abs=1e-4)
        assert out[t]["mu"] == pytest.approx(mu, abs=1e-4)
        assert out[t]["beta"] == pytest.approx(beta, abs=1e-4)
    # longer horizon -> higher level, above the observed mean max
    assert out[365]["return_level"] > out[30]["return_level"] > m


def test_gumbel_degenerate_groups_dropped(spark):
    from jsonschema_validator_spark.operators.extremes import (
        gumbel_return_levels,
    )

    df = _series_df(spark, {"const": [5.0] * 20, "short": [1, 2]})
    assert gumbel_return_levels(df, "g", "ts", "v").collect() == []


# ----------------------------------------------------------------- records


def test_record_count_monotone_series_flags_trend(spark):
    from jsonschema_validator_spark.operators.extremes import (
        record_count_test,
    )

    n = 30
    df = _series_df(
        spark,
        {
            "up": list(range(1, n + 1)),  # every day a record
            "down": list(range(n, 0, -1)),  # only day 1
        },
    )
    out = {r["g"]: r for r in record_count_test(df, "g", "ts", "v").collect()}
    h_n = sum(1.0 / i for i in range(1, n + 1))
    v_n = sum(1.0 / i - 1.0 / i**2 for i in range(1, n + 1))
    assert out["up"]["n_records_up"] == n
    assert out["up"]["n_records_low"] == 1
    assert out["up"]["expected"] == pytest.approx(h_n, abs=1e-5)
    assert out["up"]["sd"] == pytest.approx(math.sqrt(v_n), abs=1e-5)
    assert out["up"]["z_up"] == pytest.approx(
        (n - h_n) / math.sqrt(v_n), abs=1e-5
    )
    assert out["up"]["verdict"] == "trending_up"
    assert out["down"]["n_records_low"] == n
    assert out["down"]["verdict"] == "trending_down"


def test_record_count_iid_series_consistent(spark):
    from jsonschema_validator_spark.operators.extremes import (
        record_count_test,
    )

    rng = np.random.RandomState(12)
    df = _series_df(spark, {"iid": rng.normal(0, 1, 50).tolist()})
    row = record_count_test(df, "g", "ts", "v").collect()[0]
    assert row["verdict"] == "consistent_with_iid"
    # ties do not break records: a constant series has exactly 1 each
    df2 = _series_df(spark, {"const": [7.0] * 25})
    row2 = record_count_test(df2, "g", "ts", "v").collect()[0]
    assert row2["n_records_up"] == 1 and row2["n_records_low"] == 1


# ---------------------------------------------------------- turning points


def test_turning_points_exact_counts_and_verdicts(spark):
    from jsonschema_validator_spark.operators.extremes import (
        turning_point_test,
    )

    n = 31
    zigzag = [(1 if i % 2 == 0 else 2) for i in range(n)]  # all interior TP
    mono = list(range(n))  # zero TP
    df = _series_df(spark, {"zig": zigzag, "mono": mono})
    out = {r["g"]: r for r in turning_point_test(df, "g", "ts", "v").collect()}
    assert out["zig"]["n_turning"] == n - 2
    assert out["zig"]["verdict"] == "alternating"
    assert out["mono"]["n_turning"] == 0
    assert out["mono"]["verdict"] == "momentum"
    exp = 2 * (n - 2) / 3.0
    sd = math.sqrt((16 * n - 29) / 90.0)
    assert out["zig"]["expected"] == pytest.approx(exp, abs=1e-6)
    assert out["zig"]["z"] == pytest.approx((n - 2 - exp) / sd, abs=1e-5)


def test_turning_points_iid_consistent_and_plateaus(spark):
    from jsonschema_validator_spark.operators.extremes import (
        turning_point_test,
    )

    rng = np.random.RandomState(3)
    df = _series_df(spark, {"iid": rng.normal(0, 1, 50).tolist()})
    assert (
        turning_point_test(df, "g", "ts", "v").collect()[0]["verdict"]
        == "consistent_with_iid"
    )
    # plateau days are not turning points (strict inequalities)
    df2 = _series_df(spark, {"p": [1, 2, 2, 1, 1, 2, 2, 1]})
    assert turning_point_test(df2, "g", "ts", "v").collect()[0][
        "n_turning"
    ] == 0


# -------------------------------------------------------------- Heaps' law


def _alpha(n: int) -> str:
    """Letters-only token id (tokenizer splits on non-letters)."""
    out = []
    n += 1
    while n:
        n, r = divmod(n, 26)
        out.append(chr(97 + r))
    return "q" + "".join(out)


def test_heaps_law_recovers_planted_exponent(spark):
    from jsonschema_validator_spark.operators.textstats import heaps_law

    # synthetic corpus with V(T) = T^0.5 exactly: doc i contributes 10
    # tokens; new types appear so cumulative types track sqrt(cum toks)
    rng = np.random.RandomState(8)
    docs = []
    vocab_used = 0
    tokens_so_far = 0
    for i in range(1, 201):
        words = []
        for _ in range(10):
            tokens_so_far += 1
            target_vocab = int(math.sqrt(tokens_so_far * 10))
            if target_vocab > vocab_used:
                vocab_used = target_vocab
                words.append(_alpha(vocab_used))  # brand-new type
            else:
                words.append(_alpha(rng.randint(1, vocab_used + 1)))
        docs.append((i, " ".join(words)))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    row = heaps_law(df, "doc_id", "text").collect()[0]
    assert 0.35 < row["beta"] < 0.65
    assert row["r2"] > 0.95
    assert row["n_tokens"] == 2000


def test_heaps_law_closed_vocab_and_open_vocab_extremes(spark):
    from jsonschema_validator_spark.operators.textstats import heaps_law

    closed = [
        (i, "alpha beta gamma delta") for i in range(1, 101)
    ]  # vocabulary never grows
    open_v = [
        (i, " ".join(f"uid{i}x{j}" for j in range(4)))
        for i in range(1, 101)
    ]  # every token a new type -> note: digits split, letters kept
    df_c = spark.createDataFrame(closed, "doc_id long, text string")
    df_o = spark.createDataFrame(
        [(i, " ".join(f"tok{chr(97 + (i * 7 + j) % 26)}{chr(97 + (i * 5 + j * 3) % 26)}{chr(97 + (i + j * 11) % 26)}x" for j in range(4))) for i in range(1, 101)],
        "doc_id long, text string",
    )
    row_c = heaps_law(df_c, "doc_id", "text", min_types=2).collect()[0]
    assert row_c["beta"] == pytest.approx(0.0, abs=0.02)
    assert row_c["n_types"] == 4
    row_o = heaps_law(df_o, "doc_id", "text", min_types=2).collect()[0]
    # heavy type reuse impossible to avoid with 3-letter ids, but the
    # open corpus must grow much faster than the closed one
    assert row_o["beta"] > 0.3


def test_heaps_law_per_group(spark):
    from jsonschema_validator_spark.operators.textstats import heaps_law

    rows = []
    for i in range(1, 81):
        rows.append((i, "en", "the quick brown fox " + _alpha(i)))
        rows.append((i, "tiny", "a b"))
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = {r["lang"]: r for r in heaps_law(
        df, "doc_id", "text", group="lang", min_types=3
    ).collect()}
    assert "en" in out and "tiny" not in out  # min_types gate
    assert out["en"]["beta"] > 0.2  # one new type per doc keeps growth
