"""Two-parallelism scaling benchmark (BASELINE.md protocol).

Runs the IDENTICAL full check-suite job (CheckSuite.verdicts over the
bench transcripts fixture) at local[N] and local[4N] on the same input,
separate JVMs per configuration, warm-up discarded, median of --runs
timed runs. Reports T_N, T_4N (validated turns/sec) and efficiency =
(T_4N / T_N) / 4. Writes BENCH/BASELINE.md.

Usage:
    python scripts/bench_scaling.py [--cores 8,32] [--runs 3] [--scale bench]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_RUN_ONE = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from jsonschema_validator_spark.session import get_spark
from jsonschema_validator_spark.plans import CheckSuite
from jsonschema_validator_spark.specs import transcripts_spec

cores = {cores}
runs = {runs}
spark = get_spark(app_name=f"scaling_{{cores}}", master=f"local[{{cores}}]",
                  shuffle_partitions=2 * cores)
df = spark.read.parquet({fixture!r})
n_turns = df.count()
suite = CheckSuite(transcripts_spec()).build()

def job():
    t0 = time.time()
    suite.verdicts(df).write.format("noop").mode("overwrite").save()
    return time.time() - t0

job()  # warm-up (JIT, codegen, file listing) — discarded
times = [job() for _ in range(runs)]
print("RESULT " + json.dumps({{"cores": cores, "times": times, "n_turns": n_turns}}))
spark.stop()
"""


def run_config(cores: int, runs: int, fixture: str) -> dict:
    code = _RUN_ONE.format(repo=REPO, cores=cores, runs=runs, fixture=fixture)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=3600
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT from cores={cores}:\n{out.stdout[-2000:]}\n{out.stderr[-3000:]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", default="8,32")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--scale", default="bench")
    ap.add_argument("--fixture-dir", default=os.path.join(REPO, "bench_data"))
    args = ap.parse_args()

    fixture = os.path.join(args.fixture_dir, f"transcripts_dirty_{args.scale}.parquet")
    if not os.path.exists(fixture):
        print(f"generating {args.scale} fixture at {fixture} ...", flush=True)
        from jsonschema_validator_spark.fixtures import write_fixture

        write_fixture(args.fixture_dir, scale=args.scale)

    cores_list = [int(c) for c in args.cores.split(",")]
    results = {}
    for cores in cores_list:
        print(f"running local[{cores}] x{args.runs} ...", flush=True)
        r = run_config(cores, args.runs, fixture)
        med = statistics.median(r["times"])
        results[cores] = {
            "median_sec": round(med, 2),
            "times": [round(t, 2) for t in r["times"]],
            "turns_per_sec": round(r["n_turns"] / med),
            "n_turns": r["n_turns"],
        }
        print(f"  local[{cores}]: median {med:.2f}s -> {results[cores]['turns_per_sec']:,} turns/s")

    lo, hi = min(cores_list), max(cores_list)
    ratio = hi / lo
    eff = (results[hi]["turns_per_sec"] / results[lo]["turns_per_sec"]) / ratio
    print(f"scaling efficiency local[{lo}] -> local[{hi}]: {eff:.3f} (target >= 0.8)")

    md = f"""# BENCH — measured performance (scaling protocol from BASELINE.md)

Job: full `CheckSuite(transcripts_spec()).verdicts(df)` — every keyword
check fused in one scan + uniqueness + referential-root + ordering +
drift + stats — over the deterministic dirty transcripts fixture
(`jsonschema_validator_spark.fixtures`, scale `{args.scale}`,
{results[lo]['n_turns']:,} turns, seed 42). Identical job, identical
input, two parallelism levels, separate JVMs,
`spark.sql.shuffle.partitions = 2 x cores`, warm-up run discarded,
median of {args.runs} timed runs.

| config | times (s) | median (s) | validated turns/sec |
|---|---|---|---|
| local[{lo}] | {results[lo]['times']} | {results[lo]['median_sec']} | {results[lo]['turns_per_sec']:,} |
| local[{hi}] | {results[hi]['times']} | {results[hi]['median_sec']} | {results[hi]['turns_per_sec']:,} |

**Scaling efficiency (T_{hi} / T_{lo}) / {ratio:.0f} = {eff:.3f}** (target >= 0.8 per
`BASELINE.json` north_rule; N -> 4N executors evidenced at two local
parallelism levels per the sandbox protocol in BASELINE.md).

Reference baseline: the reference publishes no numbers
(BASELINE.md — pre-release skeleton); the authoritative target is the
north rule's throughput + efficiency criterion above.
"""
    out_path = os.path.join(REPO, "BENCH", "BASELINE.md")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        f.write(md)
    print(f"wrote {out_path}")
    print(json.dumps({"efficiency": round(eff, 3), **{f"local[{c}]": results[c] for c in cores_list}}))


if __name__ == "__main__":
    main()
