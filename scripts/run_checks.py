"""spark-submit entry point (north_rule: "run via spark-submit
--py-files on a multi-executor cluster").

Usage:
    python scripts/make_pyfiles_zip.py   # build engine.zip
    spark-submit --py-files engine.zip scripts/run_checks.py \
        --input iceberg:catalog.db.transcripts \
        --output s3://bucket/checks_out \
        [--spec spec.json] [--batch-size 50] [--cores-hint 0]

Reads the table through the provider abstraction (Iceberg in prod,
parquet locally), runs the checkpointed CheckSuite, and prints a JSON
run report. Re-running resumes from the manifest.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# local `python scripts/run_checks.py` convenience: the package ships via
# --py-files on a cluster, but a direct invocation needs the repo root
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="iceberg:catalog.db.tbl or parquet path")
    ap.add_argument("--output", required=True, help="output dir for verdicts/violations/_manifest")
    ap.add_argument("--spec", default=None, help="JSON check-suite spec file (default: transcripts_v1)")
    ap.add_argument("--batch-size", type=int, default=None)
    ap.add_argument("--snapshot-id", type=int, default=None, help="pin Iceberg snapshot (lineage)")
    args = ap.parse_args()

    from jsonschema_validator_spark.plans import CheckSuite
    from jsonschema_validator_spark.plans.runner import CheckpointedRunner
    from jsonschema_validator_spark.session import get_spark
    from jsonschema_validator_spark.sources import read_table
    from jsonschema_validator_spark.specs import transcripts_spec

    spec = json.load(open(args.spec)) if args.spec else transcripts_spec()
    suite = CheckSuite(spec).build()

    spark = get_spark(app_name=f"jsv_checks_{suite.name}")
    runner = CheckpointedRunner(suite, args.output)
    if args.snapshot_id is not None:
        # explicit pin overrides lineage resolution
        df = read_table(spark, args.input, snapshot_id=args.snapshot_id)
        report = runner.run(df, batch_size=args.batch_size, snapshot_id=args.snapshot_id)
    else:
        # resolve-and-pin: first run records the source's current
        # snapshot in the manifest; resumes reuse the pinned one
        report = runner.run_ref(spark, args.input, batch_size=args.batch_size)
    print(
        json.dumps(
            {
                "spec": suite.name,
                "spec_hash": suite.spec_hash,
                "snapshot_id": report.snapshot_id,
                "processed_partitions": report.processed,
                "skipped_partitions": report.skipped,
                "batches": report.batches,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
