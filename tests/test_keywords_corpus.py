"""Keyword-corpus parity harness (SURVEY.md §5.4).

Runs JSON-Schema-Test-Suite-format corpus files (tests/corpus/*.json,
format per the reference's pinned submodule,
/root/reference/.gitmodules:1-3) through the variant-column compiler:
each `data` value becomes one row of a JSON-string column; the engine's
fused verdict must equal `valid`.

All cases across all groups are evaluated in ONE Spark action: one
DataFrame, one predicate column per schema group, one collect — the
set-oriented analog of the reference's per-case loop.
"""

from __future__ import annotations

import json
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from jsonschema_validator_spark.functions.accessors import VariantAccessor
from jsonschema_validator_spark.functions.keywords import (
    Scope,
    compile_schema,
    pred_of,
)

CORPUS_DIR = Path(__file__).parent / "corpus"

DRAFT_OF_FILE = {
    "draft4_core.json": "draft4",
    "draft6_draft7.json": "draft7",
    "draft_ref_bool.json": "draft7",
}


def _load(fname: str):
    return json.loads((CORPUS_DIR / fname).read_text())


@pytest.mark.parametrize("fname", sorted(DRAFT_OF_FILE))
def test_corpus_file(spark, fname):
    groups = _load(fname)
    draft = DRAFT_OF_FILE[fname]

    preds, rows, expected = [], [], {}
    for gi, group in enumerate(groups):
        scope = Scope(draft=draft)
        scope.root = group["schema"]
        checks = compile_schema(
            group["schema"],
            scope,
            validate_formats=group.get("format_validation", False),
        )
        preds.append(pred_of(checks))
        for ci, case in enumerate(group["tests"]):
            rows.append((gi, ci, json.dumps(case["data"])))
            expected[(gi, ci)] = (case["valid"], group["description"], case["description"])

    df = spark.createDataFrame(rows, "g int, c int, j string")
    acc = VariantAccessor(F.parse_json("j"))
    out = df.select("g", "c", *[p(acc).alias(f"p{i}") for i, p in enumerate(preds)])
    got = {(r["g"], r["c"]): r[f"p{r['g']}"] for r in out.collect()}

    failures = [
        f"{grp} :: {case} (expected valid={want}, got {got[key]})"
        for key, (want, grp, case) in expected.items()
        if got[key] != want
    ]
    assert not failures, f"{len(failures)} corpus mismatches:\n" + "\n".join(failures)
