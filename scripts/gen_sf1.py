"""Generate deterministic sf1 bench tables (10x sf0.1) under
bench_data/sf1/ by key-shifted replication of the driver's read-only
sf0.1 parquet: each copy i offsets every primary/foreign key by
i * (1 + max_key) so join selectivities, per-user chain lengths, text
distributions and value marginals are preserved while every
cardinality scales 10x — the sf-scaling shape the top-20 bench section
needs (VERDICT r4 #5). No randomness, no wall clock: same input ->
same bytes. Only the tables the top-20 heaviest queries touch are
materialized (events, embeddings, documents, lineitem, orders).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from jsonschema_validator_spark.session import get_spark

SRC = "/root/testdata/sf0.1"
DST = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench_data", "sf1")
COPIES = 10

# table -> columns to offset by i * (1 + global max of that column)
KEYS = {
    "events": ["event_id", "user_id"],
    "embeddings": ["vec_id"],
    "documents": ["doc_id"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
}


def main() -> None:
    spark = get_spark(
        app_name="gen_sf1",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=32,
    )
    os.makedirs(DST, exist_ok=True)
    for table, keys in KEYS.items():
        src = spark.read.parquet(f"{SRC}/{table}.parquet")
        maxes = src.agg(
            *[(F.max(k) + 1).alias(k) for k in keys]
        ).first()
        copies = None
        for i in range(COPIES):
            c = src
            for k in keys:
                c = c.withColumn(k, F.col(k) + F.lit(i * maxes[k]))
            copies = c if copies is None else copies.unionByName(c)
        out = f"{DST}/{table}.parquet"
        copies.repartition(32).write.mode("overwrite").parquet(out)
        n = spark.read.parquet(out).count()
        print(f"{table}: {n} rows -> {out}", flush=True)


if __name__ == "__main__":
    main()
