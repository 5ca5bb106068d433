"""Benchmark harness (driver contract): run the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS], print ONE JSON line.

Each query executes to completion through the noop sink (full plan runs,
no driver-side collect cost). A warm-up run of the flagship absorbs
session/JIT startup.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod
from jsonschema_validator_spark.session import get_spark


def run_query(fn, spark, sf_dir) -> float:
    t0 = time.time()
    df = fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def skew_section(spark) -> dict:
    """Planted Zipf-hot-key fixture (VERDICT r2 item 6): one conv_id
    owns 60% of the rows, synthesized deterministically (hash
    arithmetic, no files). Reports plain vs salted aggregation and
    window vs agg+join per-row attribution side by side.

    Measured conclusion this encodes (BENCH/BASELINE.md): Catalyst's
    map-side partial aggregation makes PLAIN hash aggregation skew-
    immune for algebraic aggregates — the hot key arrives at its reducer
    pre-collapsed to one row per map partition — so salting never
    crosses over for counts/min/max/distinct-on-salt-dim. Where skew
    genuinely bites is the per-row WINDOW (the hot group sorts in ONE
    task); the agg+equi-join attribution (duplicate_rows_join) is the
    scale path, and AQE skew-join splitting shards its probe side."""
    from pyspark.sql import functions as F

    from jsonschema_validator_spark.operators.ordering import density
    from jsonschema_validator_spark.operators.uniqueness import (
        duplicate_rows,
        duplicate_rows_join,
    )

    n = int(os.environ.get("SPARK_GRAFT_SKEW_ROWS", "6000000"))
    df = (
        spark.range(n)
        .withColumn(
            "conv_id",
            F.when(F.pmod(F.xxhash64("id"), F.lit(10)) < 6, F.lit("whale"))
            .otherwise(
                F.concat(F.lit("c"), F.pmod(F.xxhash64("id", F.lit(1)), F.lit(40000)))
            ),
        )
        .withColumn("turn_idx", F.col("id"))
        .persist()
    )
    df.count()

    def best(mk, runs=2) -> float:
        samples = []
        for _ in range(runs):
            t0 = time.time()
            mk().write.format("noop").mode("overwrite").save()
            samples.append(time.time() - t0)
        return round(min(samples), 3)

    out = {
        "n_rows": n,
        "hot_frac": 0.6,
        "density_plain": best(lambda: density(df, "conv_id", "turn_idx")),
        "density_salted": best(lambda: density(df, "conv_id", "turn_idx", salt_buckets=64)),
        "dup_rows_window": best(lambda: duplicate_rows(df, ["conv_id"])),
        "dup_rows_join": best(lambda: duplicate_rows_join(df, ["conv_id"])),
    }
    df.unpersist()
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    spark = get_spark(
        app_name="jsv_bench",
        master=f"local[{cpus}]",
        shuffle_partitions=2 * cpus,
    )
    qs = entry_mod.queries()

    # warm-up (JIT/codegen/classloading + Python UDF worker spawn) — not
    # timed: one JVM-heavy query and one Arrow/pandas-UDF query
    run_query(qs["keyword_verdicts_events"], spark, sf_dir)
    run_query(qs["dedup_minhash_documents"], spark, sf_dir)

    # min of 3 runs per query (round-1 protocol, restored per VERDICT r2
    # item 9): this host is a shared VM with multi-second throttling
    # episodes (see BENCH/BASELINE.md); a single sample can be 5-10x the
    # attainable time and even n=2 minima moved 1.2-1.5x between round-2
    # sessions. Same min-of-N estimator as the scaling bench.
    # One failing query must not lose the other measurements: record
    # the error and keep going; a nonzero exit still flags the run.
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name, fn in qs.items():
        try:
            t = min(run_query(fn, spark, sf_dir) for _ in range(runs))
            timings[name] = round(t, 3)
        except Exception as e:  # noqa: BLE001 - survive any query failure
            errors[name] = f"{type(e).__name__}: {e}"[:300]

    skew = skew_section(spark)

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "check_suite_total_runtime",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    if errors:
        out["errors"] = errors
    # VERDICT r3 #3: BENCH_r03.json came back `parsed: null` with a
    # head-truncated tail because the stdout line overflowed the
    # driver's capture window. Mirror the FULL record (queries + skew
    # study) to an in-repo twin first, then print the contract line
    # compact (no separators whitespace) and WITHOUT the skew block —
    # ~115 query timings fit the window; the skew study lives in the
    # twin and BENCH/BASELINE.md.
    full = dict(out)
    full["skew"] = skew
    mirror = os.environ.get(
        "SPARK_GRAFT_BENCH_MIRROR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH", "latest_queries.json"),
    )
    try:
        with open(mirror, "w") as f:
            json.dump(full, f, indent=1, sort_keys=True)
            f.write("\n")
    except OSError as e:
        print(f"mirror write failed: {e}", file=sys.stderr)
    print(json.dumps(out, separators=(",", ":")))
    spark.stop()
    if errors:
        sys.exit(1)


if __name__ == "__main__":
    main()
