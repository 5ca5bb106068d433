"""Tests for the anomaly screens (operators/anomaly.py), the violation
triage rollup (api.violation_summary) and conversation-document
assembly (operators/conversation.conversation_documents)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F


def test_volume_anomaly_median_mad(spark):
    from jsonschema_validator_spark.operators.anomaly import volume_anomaly

    # days with counts 4,4,4,4,20 -> med=4, deviations (0,0,0,0,16),
    # mad=0 -> strict mode: any deviation from median flags
    rows = [(f"d{d}", i) for d in range(4) for i in range(4)]
    rows += [("d4", i) for i in range(20)]
    df = spark.createDataFrame(rows, "day string, x int")
    out = {r["part"]: r for r in volume_anomaly(df, "day", k=3.0).collect()}
    assert len(out) == 5
    assert out["d4"]["is_anomaly"] and out["d4"]["n"] == 20.0
    assert not any(out[f"d{d}"]["is_anomaly"] for d in range(4))
    assert out["d0"]["med"] == 4.0 and out["d0"]["mad"] == 0.0


def test_volume_anomaly_nonzero_mad_and_custom_value(spark):
    from jsonschema_validator_spark.operators.anomaly import volume_anomaly

    # per-day token sums 10,12,14,16,100 -> med=14, devs 4,2,0,2,86,
    # mad=2 -> k=3 band is 14±6: only the 100 day flags
    sums = {"a": 10, "b": 12, "c": 14, "d": 16, "e": 100}
    rows = [(day, s) for day, s in sums.items()]
    df = spark.createDataFrame(rows, "day string, tokens int")
    out = {
        r["part"]: r
        for r in volume_anomaly(df, "day", k=3.0, value=F.sum("tokens")).collect()
    }
    assert out["e"]["is_anomaly"] and out["e"]["mad"] == 2.0
    assert [out[d]["is_anomaly"] for d in "abcd"] == [False] * 4


def test_cardinality_drift_exact_and_approx(spark):
    from jsonschema_validator_spark.operators.anomaly import cardinality_drift

    # distinct users per day: 10, 10, 1 (collapse), first day vacuous
    rows = [("d1", u) for u in range(10)]
    rows += [("d2", u) for u in range(10) for _ in (0, 1)]
    rows += [("d3", 7)] * 30
    df = spark.createDataFrame(rows, "day string, user_id int")
    out = cardinality_drift(df, "user_id", "day", threshold=0.5).collect()
    got = [(r["part"], r["n_distinct"], r["prev_distinct"], r["ok"]) for r in out]
    assert got == [("d1", 10, None, True), ("d2", 10, 10, True), ("d3", 1, 10, False)]
    assert out[2]["rel_change"] == -0.9
    # approx mode keeps the schema and flags the same collapse
    a = cardinality_drift(df, "user_id", "day", threshold=0.5, approx=True).collect()
    assert [r["ok"] for r in a] == [True, True, False]


def test_violation_summary_rollup(spark):
    from jsonschema_validator_spark.api import Schema, violation_summary

    s = Schema.create(
        {
            "type": "object",
            "required": ["k"],
            "properties": {"k": {"type": "integer", "maximum": 5}},
        },
        spark,
        draft="draft7",
    )
    rows = [
        (1, json.dumps({"k": 1})),     # valid
        (2, json.dumps({"k": 9})),     # maximum
        (3, json.dumps({"k": 10})),    # maximum
        (4, json.dumps({})),           # required
        (5, json.dumps({"k": 9})),     # maximum (dup doc value, distinct id)
    ]
    df = spark.createDataFrame(rows, "doc_id int, doc string")
    out = {
        (r["keyword"], r["path"]): r
        for r in violation_summary(s.validate_many(df, "doc"), "doc_id").collect()
    }
    mx = out[("maximum", "#k")]
    assert (mx["n_violations"], mx["n_docs"], mx["example_id"]) == (3, 3, 2)
    rq = out[("required", "#")]
    assert (rq["n_violations"], rq["n_docs"], rq["example_id"]) == (1, 1, 4)
    assert len(out) == 2


def test_conversation_documents_assembly_and_validation(spark):
    from jsonschema_validator_spark.api import Schema
    from jsonschema_validator_spark.operators.conversation import (
        conversation_documents,
    )

    rows = [
        ("c1", 0, "user"), ("c1", 1, "assistant"), ("c1", 2, "user"),
        ("c2", 1, "assistant"), ("c2", 0, "assistant"),  # opens wrong
        ("c3", 0, "user"),  # too short, no assistant turn
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string")
    docs = conversation_documents(df)
    got = {r["conv_id"]: r for r in docs.collect()}
    assert json.loads(got["c1"]["doc"]) == ["user", "assistant", "user"]
    assert json.loads(got["c2"]["doc"]) == ["assistant", "assistant"]
    assert got["c1"]["n_turns"] == 3

    s = Schema.create(
        {
            "type": "array",
            "minItems": 2,
            "prefixItems": [{"const": "user"}],
            "items": {"enum": ["user", "assistant"]},
            "contains": {"const": "assistant"},
        },
        spark,
        draft="draft2020-12",
    )
    ok = {
        r["conv_id"]: r["ok"]
        for r in s.with_valid(docs, "doc", out_col="ok").collect()
    }
    assert ok == {"c1": True, "c2": False, "c3": False}


def test_part_sorted_numeric_keys_natural_order(spark):
    from jsonschema_validator_spark.operators.anomaly import cardinality_drift

    # hours 0..11, each hour h has h+1 distinct users -> with NUMERIC
    # ordering every step is a small relative change; string ordering
    # would put hour 10 after hour 1 and misassign every prev
    rows = [(h, u) for h in range(12) for u in range(h + 1)]
    df = spark.createDataFrame(rows, "hour int, user_id int")
    out = cardinality_drift(df, "user_id", "hour", threshold=2.0).collect()
    assert [r["part"] for r in out] == list(range(12))
    assert [r["prev_distinct"] for r in out] == [None] + list(range(1, 12))


def test_cardinality_drift_zero_prev_recovery_flags(spark):
    from jsonschema_validator_spark.operators.anomaly import cardinality_drift

    rows = [("a", 1), ("a", 2)]          # 2 distinct
    rows += [("b", None)]                # 0 distinct (all NULL keys)
    rows += [("c", i) for i in range(5)]  # recovery to 5
    df = spark.createDataFrame(rows, "day string, user_id int")
    out = {r["part"]: r for r in cardinality_drift(df, "user_id", "day", 0.5).collect()}
    assert out["b"]["n_distinct"] == 0 and not out["b"]["ok"]  # collapse flags
    assert out["c"]["prev_distinct"] == 0 and out["c"]["rel_change"] is None
    assert not out["c"]["ok"]  # 0 -> nonzero recovery flags too


def test_volume_anomaly_null_aggregate_is_zero(spark):
    from pyspark.sql import functions as F

    from jsonschema_validator_spark.operators.anomaly import volume_anomaly

    rows = [("d1", 10), ("d2", 10), ("d3", None)]
    df = spark.createDataFrame(rows, "day string, tokens int")
    out = {r["part"]: r for r in volume_anomaly(df, "day", value=F.sum("tokens")).collect()}
    assert out["d3"]["n"] == 0.0 and out["d3"]["is_anomaly"]


def test_robust_outliers_zero_mad_and_breakdown(spark):
    from jsonschema_validator_spark.operators.anomaly import robust_outliers

    # group A: tight cluster + one wild point -> only the wild point
    # flags, and its presence cannot drag the threshold (median/MAD
    # have a 50% breakdown point)
    rows = [("A", float(v)) for v in (10, 10, 11, 9, 10, 12, 9, 11, 1000)]
    # group B: constant column with two deviants -> zero MAD: only the
    # deviants flag, score is NULL (not inf/poison)
    rows += [("B", 5.0)] * 6 + [("B", 7.0), ("B", 3.0)]
    # group C: NULL values never flag
    rows += [("C", None), ("C", 1.0), ("C", 1.0), ("C", 1.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = robust_outliers(df, "v", k=3.5, group_col="g").collect()
    by_g = {}
    for r in out:
        by_g.setdefault(r["g"], []).append(r)
    assert [r["v"] for r in by_g["A"]] == [1000.0]
    assert by_g["A"][0]["robust_z"] > 3.5
    assert sorted(r["v"] for r in by_g["B"]) == [3.0, 7.0]
    assert all(r["robust_z"] is None for r in by_g["B"])
    assert "C" not in by_g


def test_robust_outliers_null_group_is_screened(spark):
    # a NULL group key is its own group (null-safe join-back): the
    # corrupt slice with a missing partition label must still flag
    from jsonschema_validator_spark.operators.anomaly import robust_outliers

    rows = [(None, float(v)) for v in (10, 10, 11, 9, 10, 12, 9, 11, 1000)]
    rows += [("A", 5.0)] * 5  # a named group so the plan really groups
    df = spark.createDataFrame(rows, "g string, v double")
    out = robust_outliers(df, "v", k=3.5, group_col="g").collect()
    assert len(out) == 1 and out[0]["g"] is None and out[0]["v"] == 1000.0
    assert out[0]["robust_z"] > 3.5


def test_benford_conforming_vs_fabricated(spark):
    """Log-uniform data is Benford-conforming (quiet screen); a
    constant-leading-digit series flags."""
    import pyspark.sql.functions as F

    from jsonschema_validator_spark.operators.anomaly import benford_screen

    base = spark.range(0, 3000)
    conforming = base.select(
        F.lit("ok").alias("g"), F.pow(F.lit(10.0), (F.col("id") % 1000) / 1000.0 * 3.0).alias("v")
    )
    fabricated = base.select(
        F.lit("bad").alias("g"), (F.lit(700.0) + (F.col("id") % 100)).alias("v")
    )
    out = {
        r["g"]: (r["chi2"], r["flag"])
        for r in benford_screen(conforming.unionByName(fabricated), "v", group_col="g").collect()
    }
    assert out["ok"][1] is False and out["ok"][0] < 15.507
    assert out["bad"][1] is True and out["bad"][0] > 1000


def test_benford_excludes_zero_and_null(spark):
    import pyspark.sql.functions as F

    from jsonschema_validator_spark.operators.anomaly import benford_screen

    df = spark.createDataFrame(
        [(0.0,), (None,), (123.0,), (0.045,)], "v double"
    )
    row = benford_screen(df, "v").collect()[0]
    assert row["n"] == 2  # zero and NULL have no significant digit
    assert row["c1"] == 1 and row["c4"] == 1  # 123 -> 1, 0.045 -> 4


def test_seasonal_volume_planted_spike_flags_only_itself(spark):
    from datetime import datetime

    from jsonschema_validator_spark.operators.anomaly import seasonal_volume

    # Three weeks of Mondays/Tuesdays: Mondays carry 10 rows each except
    # the middle one (30 rows, a 3x spike vs its LOO mean of 10);
    # Tuesdays uniform at 10. 2024-01-01 is a Monday.
    rows = []
    for day, n in [("2024-01-01", 10), ("2024-01-08", 30), ("2024-01-15", 10),
                   ("2024-01-02", 10), ("2024-01-09", 10), ("2024-01-16", 10)]:
        rows += [(datetime.fromisoformat(day + "T12:00:00"),)] * n
    df = spark.createDataFrame(rows, "ts timestamp")
    out = {r["day"]: r for r in seasonal_volume(df, "ts", ratio_thr=1.5).collect()}
    spike = out["2024-01-08"]
    assert spike["weekday"] == 1 and spike["n_same_weekday"] == 3
    assert spike["loo_mean"] == 10.0 and spike["ratio"] == 3.0
    assert spike["is_anomaly"]
    # its Monday peers compare against a LOO mean POLLUTED by the spike
    # ((30+10)/2 = 20 -> ratio 0.5 < 1/1.5) — they flag too, which is the
    # honest two-sided reading with only 3 peers; Tuesdays stay quiet.
    for d in ("2024-01-02", "2024-01-09", "2024-01-16"):
        assert out[d]["ratio"] == 1.0 and not out[d]["is_anomaly"]


def test_seasonal_volume_single_peer_never_flags(spark):
    from datetime import datetime

    from jsonschema_validator_spark.operators.anomaly import seasonal_volume

    df = spark.createDataFrame(
        [(datetime(2024, 1, 3, 9),)] * 50, "ts timestamp"
    )
    r = seasonal_volume(df, "ts").collect()[0]
    assert r["n_same_weekday"] == 1
    assert r["loo_mean"] is None and r["ratio"] is None
    assert not r["is_anomaly"]
