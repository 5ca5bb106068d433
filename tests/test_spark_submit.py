"""spark-submit --py-files packaging contract (north rule: "run via
spark-submit --py-files on a multi-executor cluster").

This is the REAL deployment path, not a unit test: build engine.zip
with scripts/make_pyfiles_zip, copy the entry script OUT of the repo,
and launch an actual `spark-submit --py-files engine.zip run_checks.py`
subprocess from a neutral cwd with no PYTHONPATH — so the package can
only be importable if --py-files shipped it, exactly as on a cluster.

The reference analog is its packaged-library boundary (Cargo.toml:1-25:
consumers link the crate, not the source tree); ours is the zip that
spark-submit distributes to every executor.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pyarrow.parquet as pq
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not installed"
)
def test_spark_submit_py_files_end_to_end(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from make_pyfiles_zip import main as build_zip

    from jsonschema_validator_spark.fixtures import generate_transcripts

    zip_path = build_zip(str(tmp_path / "engine.zip"))
    # the zip must carry the package and nothing else from the repo
    import zipfile

    names = zipfile.ZipFile(zip_path).namelist()
    assert any(n == "jsonschema_validator_spark/__init__.py" for n in names)
    assert all(n.startswith("jsonschema_validator_spark/") for n in names)

    inp = tmp_path / "input"
    fx = generate_transcripts("tiny", dirty=True)
    pq.write_table(fx.table, str(tmp_path / "transcripts.parquet"))
    inp.mkdir()
    os.rename(tmp_path / "transcripts.parquet", inp / "part-0.parquet")

    # entry script copied OUTSIDE the repo: its sys.path.insert of its own
    # parent directory adds tmp_path, NOT the repo root, so the package
    # import below can only be satisfied by --py-files
    entry = tmp_path / "run_checks.py"
    shutil.copy(os.path.join(REPO, "scripts", "run_checks.py"), entry)

    out = tmp_path / "out"
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("PYTHONPATH",)  # nothing may leak the repo onto sys.path
    }
    env["SPARK_GRAFT_CPUS"] = "4"
    env["SPARK_DRIVER_MEMORY"] = "2g"
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master",
            "local[4]",
            "--py-files",
            zip_path,
            str(entry),
            "--input",
            f"parquet:{inp}",
            "--output",
            str(out),
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    # the report JSON is the last stdout line
    report = json.loads(proc.stdout.strip().splitlines()[-1])
    assert report["spec"] == "transcripts_v1"
    assert len(report["processed_partitions"]) > 0

    # verdict rows landed in the output dir and the manifest enables resume
    verdict_files = [
        os.path.join(r, f)
        for r, _d, fs in os.walk(out)
        for f in fs
        if f.endswith(".parquet")
    ]
    assert verdict_files, f"no parquet written under {out}"
    manifest_dir = out / "_manifest"
    assert manifest_dir.is_dir() and any(
        f.endswith(".jsonl") for f in os.listdir(manifest_dir)
    )

    # every processed partition has a committed manifest line, so a second
    # deployment of the same job would resume as a no-op (the resume
    # semantics themselves are pinned in-process by test_runner.py — a
    # second JVM boot here would only re-prove the same manifest logic)
    lines = []
    for f in sorted(os.listdir(manifest_dir)):
        if f.endswith(".jsonl"):
            with open(manifest_dir / f) as fh:
                lines += [json.loads(ln) for ln in fh if ln.strip()]
    done = {r["partition"] for r in lines if r.get("status") == "done"}
    assert done == set(report["processed_partitions"])
