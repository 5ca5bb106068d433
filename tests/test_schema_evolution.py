"""Schema-evolution reader (sources/tables.read_evolved +
align_to_schema): added-column NULL backfill, type widening, extra-column
drop, and the mergeSchema union."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def test_read_evolved_backfills_added_columns(spark, tmp_path):
    from jsonschema_validator_spark.sources.tables import read_evolved

    root = str(tmp_path / "t")
    spark.createDataFrame([(1, "a")], "id long, x string").write.mode("append").parquet(root)
    spark.createDataFrame([(2, "b", 0.5)], "id long, x string, q double").write.mode(
        "append"
    ).parquet(root)
    df = read_evolved(spark, root).orderBy("id")
    rows = [tuple(r) for r in df.select("id", "x", "q").collect()]
    assert rows == [(1, "a", None), (2, "b", 0.5)]


def test_align_widens_and_drops_and_backfills(spark):
    from jsonschema_validator_spark.sources.tables import align_to_schema

    df = spark.createDataFrame([(1, 2, "junk")], "id int, v int, extra string")
    target = StructType(
        [
            StructField("id", LongType()),      # widen int -> long
            StructField("v", DoubleType()),     # widen int -> double
            StructField("missing", StringType()),  # backfill
        ]
    )
    out = align_to_schema(df, target)
    assert [f.dataType for f in out.schema.fields] == [LongType(), DoubleType(), StringType()]
    assert out.columns == ["id", "v", "missing"]
    assert out.collect()[0] == (1, 2.0, None)


def test_read_evolved_with_target_handles_type_conflict(spark, tmp_path):
    """mergeSchema itself cannot union int and string variants of the
    same column across directories — align_to_schema per generation
    can: read each generation with its own footer schema, align, union."""
    from jsonschema_validator_spark.sources.tables import align_to_schema

    old = spark.createDataFrame([(1, 42)], "id long, lang int")
    new = spark.createDataFrame([(2, "en")], "id long, lang string")
    target = StructType([StructField("id", LongType()), StructField("lang", StringType())])
    merged = align_to_schema(old, target).unionByName(align_to_schema(new, target))
    rows = sorted(tuple(r) for r in merged.collect())
    assert rows == [(1, "42"), (2, "en")]
