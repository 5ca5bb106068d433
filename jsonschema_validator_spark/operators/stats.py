"""Per-column statistics in ONE aggregation pass — the table-scale
generalization of required/minimum/maximum/minLength (SURVEY.md §2.4):
null-rate, approximate distinct (HyperLogLog++), min/max/mean, length
stats. One scan, one shuffle, all columns (SURVEY.md §4.1 fused pass)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

NUMERIC = (T.ByteType, T.ShortType, T.IntegerType, T.LongType, T.FloatType, T.DoubleType, T.DecimalType)


def column_stats(
    df: DataFrame,
    columns: list[str] | None = None,
    partition_col: str | None = None,
    rsd: float = 0.05,
) -> DataFrame:
    """Wide per-partition stats: one groupBy(partition) pass emitting, for
    every column c: c__null_rate, c__approx_distinct, and (numeric)
    c__min/c__max/c__mean or (string) c__len_min/c__len_max/c__len_mean.

    Returns one row per partition (plus rows_checked)."""
    columns = columns or [c for c in df.columns if c != partition_col]
    aggs = [F.count(F.lit(1)).alias("rows_checked")]
    for c in columns:
        dtype = df.schema[c].dataType
        col = F.col(c)
        aggs.append(F.avg(col.isNull().cast("double")).alias(f"{c}__null_rate"))
        aggs.append(F.approx_count_distinct(c, rsd).cast("double").alias(f"{c}__approx_distinct"))
        if isinstance(dtype, NUMERIC):
            aggs += [
                F.min(col).cast("double").alias(f"{c}__min"),
                F.max(col).cast("double").alias(f"{c}__max"),
                F.avg(col).cast("double").alias(f"{c}__mean"),
            ]
        elif isinstance(dtype, T.StringType):
            ln = F.length(col)
            aggs += [
                F.min(ln).cast("double").alias(f"{c}__len_min"),
                F.max(ln).cast("double").alias(f"{c}__len_max"),
                F.avg(ln).cast("double").alias(f"{c}__len_mean"),
            ]
        elif isinstance(dtype, (T.TimestampType, T.DateType)):
            aggs += [
                F.min(col).cast("double").alias(f"{c}__min"),
                F.max(col).cast("double").alias(f"{c}__max"),
            ]
    grouped = df.groupBy(partition_col) if partition_col else df.groupBy()
    return grouped.agg(*aggs)


def length_histogram(
    df: DataFrame,
    column: str,
    partition_col: str | None = None,
    bucket_width: int = 100,
) -> DataFrame:
    """Length histogram for a string column: (partition?, bucket, n).
    bucket = floor(length / bucket_width); NULLs get bucket -1."""
    b = F.coalesce(
        F.floor(F.length(F.col(column)) / bucket_width), F.lit(-1)
    ).alias("bucket")
    keys = ([partition_col] if partition_col else []) + ["bucket"]
    return df.select(*([partition_col] if partition_col else []), b).groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n")
    )
