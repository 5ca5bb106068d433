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

    # min of 2 runs per query: this host is a shared VM with multi-second
    # throttling episodes (see BENCH/BASELINE.md); a single sample can be
    # 5-10x the attainable time. Same estimator as the scaling bench.
    # One failing query must not lose the other 37 measurements: record
    # the error and keep going; a nonzero exit still flags the run.
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name, fn in qs.items():
        try:
            t = min(run_query(fn, spark, sf_dir), run_query(fn, spark, sf_dir))
            timings[name] = round(t, 3)
        except Exception as e:  # noqa: BLE001 - survive any query failure
            errors[name] = f"{type(e).__name__}: {e}"[:300]

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
    print(json.dumps(out))
    spark.stop()
    if errors:
        sys.exit(1)


if __name__ == "__main__":
    main()
