"""Table provider abstraction (SURVEY.md §7 "Iceberg note").

Production target is an Iceberg table (BASELINE.json input_hint); this
sandbox has no Iceberg jars, so refs dispatch on scheme:

    "iceberg:catalog.db.table"   -> spark.read.format("iceberg") (+ snapshot)
    "parquet:/path"              -> spark.read.parquet
    "/bare/path"                 -> parquet (local default)

Keeping the provider behind one function means every operator/plan is
storage-agnostic; partition pruning and pushdown work identically (both
sources are DataSourceV2 with filter/column pushdown)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_table(spark: SparkSession, ref: str, snapshot_id: int | None = None) -> DataFrame:
    if ref.startswith("iceberg:"):
        reader = spark.read.format("iceberg")
        if snapshot_id is not None:
            # snapshot-ID lineage: resumable runs pin their input snapshot
            reader = reader.option("snapshot-id", str(snapshot_id))
        try:
            return reader.load(ref[len("iceberg:") :])
        except Exception as e:  # pragma: no cover - no iceberg jar locally
            raise RuntimeError(
                "iceberg source requires iceberg-spark-runtime on the "
                "classpath (spark-submit --packages org.apache.iceberg:...)"
            ) from e
    if ref.startswith("parquet:"):
        ref = ref[len("parquet:") :]
    return spark.read.parquet(ref)


def write_table(
    df: DataFrame,
    ref: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    if ref.startswith("iceberg:"):
        writer = df.writeTo(ref[len("iceberg:") :])
        if mode == "overwrite":
            writer.createOrReplace()  # pragma: no cover - no iceberg jar
        else:
            writer.append()  # pragma: no cover
        return
    if ref.startswith("parquet:"):
        ref = ref[len("parquet:") :]
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(ref)
