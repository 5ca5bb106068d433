"""Gopher rule battery (operators/quality_rules): each rule kills
exactly the doc engineered to violate it, and a clean doc passes all
eight."""

from __future__ import annotations

import pyspark.sql.functions as F


def _flags(spark, text):
    from jsonschema_validator_spark.operators.quality_rules import gopher_flags

    df = spark.createDataFrame([(text,)], "text string")
    return df.select(gopher_flags(F.col("text")).alias("fl")).collect()[0]["fl"].asDict()


def _clean_doc():
    # 60 plain words including >=2 required stopwords, mwl in [3,10]
    words = ["the", "and", "with", "that"] + [f"word{i:02d}" for i in range(56)]
    return " ".join(words)


def test_clean_doc_passes_all(spark):
    fl = _flags(spark, _clean_doc())
    assert fl["pass"] is True
    assert all(v for v in fl.values())


def test_short_doc_fails_words_only(spark):
    fl = _flags(spark, "the and just a few words here")
    assert fl["r_words"] is False and fl["pass"] is False


def test_symbol_ratio_rule(spark):
    doc = _clean_doc() + " " + "#" * 40
    fl = _flags(spark, doc)
    assert fl["r_symbol"] is False


def test_bullet_rule(spark):
    doc = "\n".join("- " + w for w in _clean_doc().split(" "))
    fl = _flags(spark, doc)
    assert fl["r_bullet"] is False


def test_ellipsis_rule(spark):
    doc = "\n".join(w + "..." for w in _clean_doc().split(" "))
    fl = _flags(spark, doc)
    assert fl["r_ellipsis"] is False


def test_alpha_rule(spark):
    doc = _clean_doc() + " " + " ".join(["12345"] * 60)
    fl = _flags(spark, doc)
    assert fl["r_alpha"] is False


def test_stopword_rule_needs_two_distinct(spark):
    doc = " ".join(["the"] * 30 + [f"w{i}" for i in range(30)])  # only 1 distinct
    fl = _flags(spark, doc)
    assert fl["r_stopword"] is False


def test_dupline_rule(spark):
    line = " ".join(_clean_doc().split(" ")[:10])
    doc = "\n".join([line] * 8)
    fl = _flags(spark, doc)
    assert fl["r_dupline"] is False


def test_mwl_rule(spark):
    doc = " ".join(["a"] * 80 + ["the", "and"])  # mwl ~1
    fl = _flags(spark, doc)
    assert fl["r_mwl"] is False


def test_report_single_exchange_plan(spark):
    """The rollup must be ONE scan + ONE exchange: the eight rules ride
    a single projection, never per-rule scans."""
    from jsonschema_validator_spark.operators.quality_rules import gopher_report

    df = spark.createDataFrame([("a", _clean_doc()), ("b", "short")], "cat string, text string")
    plan = gopher_report(df, "text", "cat")._jdf.queryExecution().executedPlan().toString()
    # exactly one shuffle for the final aggregation (+1 for orderBy's range exchange)
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Scan ExistingRDD" in plan or "LocalTableScan" in plan
