"""Structured Streaming surface: micro-batch validation with
exactly-once sinks, watermarked windowed checks, streaming dedup."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

from jsonschema_validator_spark.fixtures import generate_transcripts
from jsonschema_validator_spark.plans import CheckSuite
from jsonschema_validator_spark.specs import transcripts_spec
from jsonschema_validator_spark.streaming import (
    stream_validate,
    streaming_enum_rate,
    streaming_dedup,
)


@pytest.fixture(scope="module")
def landed(tmp_path_factory):
    """A 'landing directory' with the dirty tiny fixture as one file."""
    d = tmp_path_factory.mktemp("landing")
    fx = generate_transcripts("tiny", dirty=True)
    pq.write_table(fx.table, str(d / "part-000.parquet"))
    return str(d), fx


def test_stream_validate_foreachbatch(spark, landed, tmp_path):
    path, fx = landed
    out = str(tmp_path / "out")
    schema = spark.read.parquet(path).schema
    suite = CheckSuite(transcripts_spec()).build()
    q = stream_validate(spark, path, schema, suite, out)
    q.awaitTermination(300)
    verdicts = spark.read.parquet(f"{out}/verdicts")
    failed = {r.check for r in verdicts.collect() if not r["pass"]}
    assert "unique(conv_id,turn_idx)" in failed and "enum@#role" in failed
    viol = spark.read.parquet(f"{out}/violations")
    assert viol.count() > 0
    assert os.path.isdir(f"{out}/_checkpoint")

    # resume semantics: restarting over the same input adds no new batches
    n_before = verdicts.count()
    q2 = stream_validate(spark, path, schema, suite, out)
    q2.awaitTermination(300)
    assert spark.read.parquet(f"{out}/verdicts").count() == n_before


def test_streaming_enum_rate_matches_batch(spark, landed, tmp_path):
    path, fx = landed
    schema = spark.read.parquet(path).schema
    stream = spark.readStream.schema(schema).parquet(path)
    agg = streaming_enum_rate(
        stream, "role", ["system", "user", "assistant", "tool"], window="24 hours"
    )
    out = str(tmp_path / "rates")
    q = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", out + "_cp")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.read.parquet(out)
    total_bad = sum(r.n_violations for r in got.collect())
    batch = spark.read.parquet(path)
    from pyspark.sql import functions as F

    expect = batch.filter(
        ~F.col("role").isin(["system", "user", "assistant", "tool"])
    ).count()
    assert total_bad == expect and expect > 0


def test_streaming_dedup(spark, landed, tmp_path):
    path, fx = landed
    schema = spark.read.parquet(path).schema
    stream = spark.readStream.schema(schema).parquet(path)
    deduped = streaming_dedup(stream, ["conv_id", "turn_idx"], watermark="10 days")
    out = str(tmp_path / "dedup")
    q = (
        deduped.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", out + "_cp")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.read.parquet(out)
    batch = spark.read.parquet(path)
    # exact copies (same ts) collapse; the fixture's V1 duplicates are
    # exact copies of their source rows
    assert got.count() == batch.dropDuplicates(["conv_id", "turn_idx", "ts"]).count()
