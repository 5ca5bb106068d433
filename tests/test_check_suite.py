"""Integration tests: CheckSuite over the deterministic transcripts
fixture (FIXTURES.md) — clean fixture passes everything; every injected
violation V1..V10 surfaces in violations()/verdicts() at its known keys."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from jsonschema_validator_spark.errors import UninitialisedPlanError
from jsonschema_validator_spark.fixtures import generate_transcripts
from jsonschema_validator_spark.plans import CheckSuite
from jsonschema_validator_spark.specs import transcripts_spec


@pytest.fixture(scope="module")
def clean_df(spark):
    fx = generate_transcripts("tiny", dirty=False)
    return spark.createDataFrame(fx.table.to_pandas()).cache()


@pytest.fixture(scope="module")
def dirty(spark):
    fx = generate_transcripts("tiny", dirty=True)
    return spark.createDataFrame(fx.table.to_pandas()).cache(), fx.expected_violations.to_pandas()


@pytest.fixture(scope="module")
def suite():
    return CheckSuite(transcripts_spec()).build()


def test_unbuilt_suite_refuses():
    s = CheckSuite(transcripts_spec())
    with pytest.raises(UninitialisedPlanError):
        s.verdicts(None)


def test_clean_fixture_all_pass(clean_df, suite):
    v = suite.verdicts(clean_df)
    failed = v.filter(~F.col("pass")).collect()
    assert not failed, f"clean fixture failed checks: {[(r.day, r.check) for r in failed]}"
    # and zero violation rows
    assert suite.violations(clean_df).count() == 0


def test_dirty_fixture_verdicts(dirty, suite):
    df, _ = dirty
    v = suite.verdicts(df).collect()
    failed_checks = {r.check for r in v if not r["pass"]}
    # every injected violation class shows up as a failing check
    for expect in [
        "enum@#role",
        "required@#text",
        "minLength@#text",
        "maxLength@#text",
        "pattern@#text",
        "enum@#tool",
        "dependencies@#",
        "minimum@#turn_idx",
        "maximum@#turn_idx",
        "unique(conv_id,turn_idx)",
        "referential_root(conv_id)",
        "ordering(conv_id)",
        "drift(length(text))",
    ]:
        assert expect in failed_checks, f"{expect} not failing; failing: {sorted(failed_checks)}"


def test_dirty_fixture_violation_attribution(dirty, suite):
    df, expected = dirty
    viol = suite.violations(df).toPandas()
    got = set(zip(viol.conv_id, viol.turn_idx, viol.keyword))
    # keyword name used by the engine for each expectation
    kw_map = {
        "unique": "unique",
        "referential": "referential",
        "enum": "enum",
        "required": "required",
        "minLength": "minLength",
        "maxLength": "maxLength",
        "pattern": "pattern",
        "dependencies": "dependencies",
        "ordering": "ordering",
        "minimum": "minimum",
        "maximum": "maximum",
    }
    missing = []
    for _, e in expected.iterrows():
        if (e.conv_id, e.turn_idx, kw_map[e.keyword]) not in got:
            missing.append((e.conv_id, int(e.turn_idx), e.violation_id, e.keyword))
    assert not missing, f"expected violations not reported: {missing}"


def test_drift_day_flagged(dirty, suite):
    df, _ = dirty
    v = suite.verdicts(df).filter(F.col("check") == "drift(length(text))").toPandas()
    drifted = set(v[~v["pass"]].day)
    assert "2026-01-21" in drifted  # V9 shifted-lognormal day
    # among days large enough to evaluate (>= min_rows, where PSI noise
    # ~ buckets/n is small), the shifted day's PSI must dominate
    big = v[v.rows_checked >= 200]
    psi = {r.day: r.metrics["psi"] for _, r in big.iterrows()}
    worst = max(psi, key=psi.get)
    assert worst == "2026-01-21", psi


def test_stats_metrics_present(clean_df, suite):
    v = suite.verdicts(clean_df).filter(F.col("check") == "stats:text").first()
    m = v.metrics
    assert m["null_rate"] == 0.0
    assert m["len_min"] >= 1 and m["len_max"] <= 8000 + 20


def test_violation_sampling_cap(dirty, suite):
    """sample_per_check caps rows per (day, keyword) deterministically;
    the sampled set is a subset of the full violations."""
    df, _ = dirty
    full = {tuple(r) for r in suite.violations(df).collect()}
    capped = suite.violations(df, sample_per_check=2)
    rows = capped.collect()
    assert {tuple(r) for r in rows} <= full
    from collections import Counter

    per = Counter((r.day, r.keyword) for r in rows)
    assert max(per.values()) <= 2
    # deterministic: same sample on re-evaluation
    assert {tuple(r) for r in capped.collect()} == {tuple(r) for r in rows}


def test_referential_cross_table_check(spark):
    """The `referential` dataset check: child keys must exist in a parent
    table supplied via refs (or a sources table ref)."""
    from jsonschema_validator_spark.errors import MalformedSchemaError
    from jsonschema_validator_spark.plans import CheckSuite

    child = spark.createDataFrame(
        [("d1", "c1", 0), ("d1", "c2", 0), ("d2", "cX", 0)],
        "day string, conv_id string, turn_idx int",
    )
    parent = spark.createDataFrame([("c1",), ("c2",)], "conv_id string")
    suite = CheckSuite(
        {
            "name": "ri",
            "partition_by": "day",
            "keys": ["conv_id", "turn_idx"],
            "row": {},
            "dataset": [
                {"check": "referential", "columns": ["conv_id"], "parent": "convs"}
            ],
        }
    ).build()
    v = {r.day: r for r in suite.verdicts(child, refs={"convs": parent}).collect()}
    assert v["d1"]["pass"] and v["d1"].violation_count == 0
    assert not v["d2"]["pass"] and v["d2"].violation_count == 1
    viol = suite.violations(child, refs={"convs": parent}).collect()
    assert [(r.conv_id, r.keyword) for r in viol] == [("cX", "referential")]

    # malformed spec fails at COMPILE, not at runtime
    import pytest as _pytest

    with _pytest.raises(MalformedSchemaError):
        CheckSuite(
            {"name": "bad", "row": {}, "dataset": [{"check": "referential"}]}
        )


def test_volume_and_freshness_checks(spark):
    """volume: tolerance band around the median partition count;
    freshness: newest event within max_age_hours of as_of. Fused and
    legacy paths agree."""
    from jsonschema_validator_spark.plans import CheckSuite

    rows = []
    for day, n, last_sec in [("d1", 100, 0), ("d2", 98, 3600), ("d3", 10, 7200)]:
        for i in range(n):
            rows.append((day, f"c{day}{i}", 0, f"2026-01-05 0{int(last_sec//3600)}:00:00"))
    df = spark.createDataFrame(
        rows, "day string, conv_id string, turn_idx int, ts_s string"
    ).withColumn("ts", __import__("pyspark.sql.functions", fromlist=["F"]).col("ts_s").cast("timestamp")).drop("ts_s")

    spec = {
        "name": "vf",
        "partition_by": "day",
        "keys": ["conv_id", "turn_idx"],
        "row": {},
        "dataset": [
            {"check": "volume", "tolerance": 0.5},
            {
                "check": "freshness",
                "ts": "ts",
                "as_of": "2026-01-05T03:30:00",
                "max_age_hours": 3.0,
            },
        ],
    }
    suite = CheckSuite(spec).build()
    for fused in (True, False):
        v = {(r.day, r.check): r for r in suite.verdicts(df, fused=fused).collect()}
        assert v[("d1", "volume")]["pass"] and v[("d2", "volume")]["pass"]
        assert not v[("d3", "volume")]["pass"]  # 10 vs median 98
        # d1: newest 00:00, age 3.5h > 3h -> stale; d2: 2.5h ok; d3: 1.5h ok
        assert not v[("d1", "freshness(ts)")]["pass"]
        assert v[("d2", "freshness(ts)")]["pass"]
        assert v[("d3", "freshness(ts)")]["pass"]
        assert abs(v[("d2", "freshness(ts)")].metrics["age_hours"] - 2.5) < 1e-6

    # malformed freshness fails at compile
    import pytest as _pytest
    from jsonschema_validator_spark.errors import MalformedSchemaError

    with _pytest.raises(MalformedSchemaError):
        CheckSuite({"name": "bad", "row": {}, "dataset": [{"check": "freshness", "ts": "ts"}]})


def test_every_dataset_check_kind_executes(spark):
    """Guard the compile/runtime split for the whole DATASET_CHECKS set:
    every kind accepted at compile must execute through fused verdicts,
    legacy verdicts, and violations without error (the 'referential'
    kind once compiled fine and exploded at runtime)."""
    from jsonschema_validator_spark.plans import CheckSuite
    from jsonschema_validator_spark.plans.check_suite import DATASET_CHECKS

    df = spark.createDataFrame(
        [
            ("d1", "c1", 0, "hello world", "2026-01-05 01:00:00"),
            ("d1", "c1", 1, "more text", "2026-01-05 01:01:00"),
            ("d2", "c2", 0, "bye", "2026-01-06 02:00:00"),
        ],
        "day string, conv_id string, turn_idx int, text string, ts_s string",
    )
    from pyspark.sql import functions as F

    df = df.withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s")
    parent = spark.createDataFrame([("c1",), ("c2",)], "conv_id string")

    config = {
        "unique": {"check": "unique", "columns": ["conv_id", "turn_idx"]},
        "referential_root": {"check": "referential_root", "group": "conv_id", "order": "turn_idx"},
        "referential": {"check": "referential", "columns": ["conv_id"], "parent": "p"},
        "ordering": {"check": "ordering", "group": "conv_id", "order": "turn_idx", "monotone": ["ts"]},
        "drift": {"check": "drift", "value": "length(text)", "lo": 0.0, "hi": 100.0},
        "stats": {"check": "stats", "columns": ["conv_id", "text"]},
        "volume": {"check": "volume", "tolerance": 0.9},
        "freshness": {"check": "freshness", "ts": "ts", "as_of": "2026-01-07T00:00:00", "max_age_hours": 100.0},
    }
    assert set(config) == DATASET_CHECKS, set(config) ^ DATASET_CHECKS

    for kind, d in config.items():
        suite = CheckSuite(
            {
                "name": f"k_{kind}",
                "partition_by": "day",
                "keys": ["conv_id", "turn_idx"],
                "row": {},
                "dataset": [d],
            }
        ).build()
        for fused in (True, False):
            rows = suite.verdicts(df, fused=fused, refs={"p": parent}).collect()
            assert rows, (kind, fused)
        suite.violations(df, refs={"p": parent}).collect()


def test_spec_level_format_assertion(spark):
    """`validate_formats: true` in a spec turns `format` keywords into
    asserted checks; without it they stay annotations (JSON Schema
    default). The flag lives in the spec dict, so it changes spec_hash
    (lineage invalidation)."""
    rows = [
        ("c1", 0, "a@b.com"),
        ("c1", 1, "not-an-email"),
        ("c2", 0, None),
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, contact string")
    base = {
        "name": "fmt_suite",
        "draft": "draft7",
        "partition_by": "conv_id",
        "keys": ["conv_id", "turn_idx"],
        "row": {
            "required": ["conv_id"],
            "properties": {"contact": {"format": "email"}},
        },
    }
    asserted = CheckSuite({**base, "validate_formats": True}).build()
    annotated = CheckSuite(base).build()
    assert asserted.spec_hash != annotated.spec_hash

    v = asserted.verdicts(df)
    bad = v.filter(~F.col("pass")).collect()
    assert len(bad) == 1 and bad[0]["day"] == "c1" and bad[0]["violation_count"] == 1

    # annotation mode: the format keyword compiles to nothing, so only
    # the required check remains and nothing fails
    assert len(annotated._checks) == 1
    v2 = annotated.verdicts(df)
    assert v2.filter(~F.col("pass")).count() == 0
