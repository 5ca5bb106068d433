"""Table-level CheckSuite: the engine's compiled check plan.

The Spark analog of the reference's compiled Schema
(/root/reference/src/types/schema.rs:13-19): a check-suite *spec* is data
(a dict — "schemas are data", SURVEY.md §1.2), compiled at driver time
into Column expressions, frozen by build() (the ScopeBuilder::build
initialisation guard, scope_builder.rs:56-66 / schema.rs:71-73), then
applied to DataFrames with the reference's dual API (schema.rs:67-78):

- ``verdicts(df)``   — per-partition pass/fail + counts + metrics, the
  ``is_valid`` fast path: one fused select computes every row check in a
  single scan, one groupBy(partition) aggregates them (SURVEY.md §4.1 —
  one job for ALL checks, not one job per check).
- ``violations(df)`` — per-row violation rows (conv_id, turn_idx, column,
  keyword, message, path, day), the ``validation_errors`` path: the same
  fused flags feed an array-of-structs -> explode.

Spec format::

    {
      "name": "transcripts_v1",
      "draft": "draft7",
      "partition_by": "day",
      "keys": ["conv_id", "turn_idx"],
      "row": { <JSON-Schema applied to each row-as-object> },
      "dataset": [
        {"check": "unique", "columns": ["conv_id", "turn_idx"]},
        {"check": "referential_root", "group": "conv_id", "order": "turn_idx"},
        {"check": "ordering", "group": "conv_id", "order": "turn_idx",
         "monotone": ["ts"]},
        {"check": "drift", "value": "length(text)", "buckets": 20,
         "psi_threshold": 0.2, "ks_threshold": 0.1},
        {"check": "stats", "columns": [...]}
      ]
    }
"""

from __future__ import annotations

import hashlib
import json
from typing import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from jsonschema_validator_spark.errors import (
    MalformedSchemaError,
    UninitialisedPlanError,
)
from jsonschema_validator_spark.functions.accessors import RowAccessor
from jsonschema_validator_spark.functions.keywords import (
    CheckExpr,
    Scope,
    compile_schema,
)
from jsonschema_validator_spark.operators import drift as drift_ops
from jsonschema_validator_spark.operators import integrity as ri_ops
from jsonschema_validator_spark.operators import ordering as ord_ops
from jsonschema_validator_spark.operators import stats as stats_ops
from jsonschema_validator_spark.operators import uniqueness as uniq_ops

VIOLATION_SCHEMA = "conv_id string, turn_idx int, column string, keyword string, message string, path string, day string"
DATASET_CHECKS = {"unique", "referential_root", "referential", "ordering", "drift", "stats"}


def _column_of(path: str) -> str:
    seg = path.lstrip("#/")
    return seg.split("/")[0] if seg else ""


class CheckSuite:
    def __init__(self, spec: dict):
        self.spec = spec
        self.name = spec.get("name", "check_suite")
        self.draft = spec.get("draft", "draft7")
        self.partition_by = spec.get("partition_by", "day")
        self.keys = spec.get("keys", ["conv_id", "turn_idx"])
        self._checks: list[CheckExpr] | None = None
        for d in spec.get("dataset", []):
            if d.get("check") not in DATASET_CHECKS:
                raise MalformedSchemaError("#/dataset", str(d.get("check")), "unknown dataset check")

    # -- lineage ---------------------------------------------------------
    @property
    def spec_hash(self) -> str:
        """Deterministic content hash of the spec — the anonymous-schema
        key analog (contrast uuid4 at scope_builder.rs:17-19)."""
        blob = json.dumps(self.spec, sort_keys=True, separators=(",", ":"))
        return hashlib.sha256(blob.encode()).hexdigest()[:16]

    # -- compile ----------------------------------------------------------
    def build(self) -> "CheckSuite":
        """Compile the row schema into CheckExprs and freeze the plan.
        Malformed specs raise HERE, never at runtime (SURVEY.md §1.3.5)."""
        row_schema = dict(self.spec.get("row", {}))
        checks: list[CheckExpr] = []
        # expand root-level `required` into one check per column so each
        # missing column attributes its own violation row
        for name in row_schema.pop("required", []) or []:
            scope = Scope(draft=self.draft)
            scope.root = {"required": [name]}
            for ce in compile_schema(scope.root, scope, path=f"#/{name}"):
                checks.append(ce)
        scope = Scope(draft=self.draft)
        scope.root = row_schema
        checks.extend(compile_schema(row_schema, scope))
        self._checks = checks
        return self

    def _require_built(self):
        # uninitialised-plan guard (schema.rs:71-73)
        if self._checks is None:
            raise UninitialisedPlanError(f"CheckSuite {self.name!r}: call build() first")

    # -- fused row-check flags -------------------------------------------
    def _flag_cols(self, df: DataFrame) -> list[tuple[CheckExpr, object]]:
        acc = RowAccessor(df.schema)
        return [(ce, ce.gated(acc)) for ce in self._checks]

    @staticmethod
    def _check_name(ce: CheckExpr) -> str:
        return f"{ce.keyword}@{ce.path}"

    # -- dual API ----------------------------------------------------------
    def verdicts(self, df: DataFrame) -> DataFrame:
        """Per-partition verdict rows: (day, check, pass, violation_count,
        rows_checked, metrics). One fused scan+agg for all row checks;
        dataset checks contribute their own (also single-pass) jobs."""
        self._require_built()
        part = self.partition_by
        out: list[DataFrame] = []

        flags = self._flag_cols(df)
        if flags:
            sel = df.select(
                F.col(part),
                *[(~c).cast("long").alias(f"f{i}") for i, (_, c) in enumerate(flags)],
            )
            agg = sel.groupBy(part).agg(
                F.count(F.lit(1)).alias("rows_checked"),
                *[F.sum(f"f{i}").alias(self._check_name(ce)) for i, (ce, _) in enumerate(flags)],
            )
            long = agg.unpivot(
                ids=[part, "rows_checked"],
                values=[self._check_name(ce) for ce, _ in flags],
                variableColumnName="check",
                valueColumnName="violation_count",
            )
            out.append(
                long.select(
                    F.col(part).alias("day"),
                    "check",
                    (F.col("violation_count") == 0).alias("pass"),
                    "violation_count",
                    "rows_checked",
                    F.lit(None).cast("map<string,double>").alias("metrics"),
                )
            )

        for d in self.spec.get("dataset", []):
            out.append(self._dataset_verdicts(df, d))
        if not out:
            raise UninitialisedPlanError("empty check suite")
        res = out[0]
        for o in out[1:]:
            res = res.unionByName(o)
        return res

    def violations(self, df: DataFrame) -> DataFrame:
        """Per-row violation rows — ValidationError analog
        (validation_error.rs:5-10): (conv_id, turn_idx, column, keyword,
        message, path, day)."""
        self._require_built()
        part = self.partition_by
        k1, k2 = self.keys
        out: list[DataFrame] = []

        flags = self._flag_cols(df)
        if flags:
            structs = [
                F.when(
                    ~c,
                    F.struct(
                        F.lit(_column_of(ce.path)).alias("column"),
                        F.lit(ce.keyword).alias("keyword"),
                        F.lit(ce.message).alias("message"),
                        F.lit(ce.path).alias("path"),
                    ),
                )
                for ce, c in flags
            ]
            rows = (
                df.select(
                    F.col(k1).alias("conv_id"),
                    F.col(k2).cast("int").alias("turn_idx"),
                    F.col(part).alias("day"),
                    F.array_compact(F.array(*structs)).alias("v"),
                )
                .filter(F.size("v") > 0)
                .select(
                    "conv_id", "turn_idx", F.explode("v").alias("e"), "day"
                )
                .select(
                    "conv_id",
                    "turn_idx",
                    F.col("e.column").alias("column"),
                    F.col("e.keyword").alias("keyword"),
                    F.col("e.message").alias("message"),
                    F.col("e.path").alias("path"),
                    "day",
                )
            )
            out.append(rows)

        for d in self.spec.get("dataset", []):
            v = self._dataset_violations(df, d)
            if v is not None:
                out.append(v)
        res = out[0]
        for o in out[1:]:
            res = res.unionByName(o)
        return res

    def run(self, df: DataFrame) -> tuple[DataFrame, DataFrame]:
        return self.verdicts(df), self.violations(df)

    # -- dataset checks -----------------------------------------------------
    def _dataset_verdicts(self, df: DataFrame, d: dict) -> DataFrame:
        part = self.partition_by
        kind = d["check"]
        nullmap = F.lit(None).cast("map<string,double>")

        if kind == "unique":
            cols = d["columns"]
            dups = (
                uniq_ops.salted_duplicate_keys(df, cols, d.get("salt_buckets", 64))
                if d.get("salted")
                else uniq_ops.duplicate_keys(df, cols)
            )
            # attribute duplicate keys to partitions via a semi join back
            dup_rows = df.join(dups.select(*cols), cols, "left_semi")
            agg = dup_rows.groupBy(part).agg(F.count(F.lit(1)).alias("violation_count"))
            totals = df.groupBy(part).agg(F.count(F.lit(1)).alias("rows_checked"))
            return (
                totals.join(agg, part, "left")
                .fillna(0, subset=["violation_count"])
                .select(
                    F.col(part).alias("day"),
                    F.lit(f"unique({','.join(cols)})").alias("check"),
                    (F.col("violation_count") == 0).alias("pass"),
                    "violation_count",
                    "rows_checked",
                    nullmap.alias("metrics"),
                )
            )

        if kind == "referential_root":
            group, order = d.get("group", "conv_id"), d.get("order", "turn_idx")
            orphan = ri_ops.conversation_orphans(df, group, order)
            rows = df.join(F.broadcast(orphan.select(group)), group, "left_semi")
            agg = rows.groupBy(part).agg(F.count(F.lit(1)).alias("violation_count"))
            totals = df.groupBy(part).agg(F.count(F.lit(1)).alias("rows_checked"))
            return (
                totals.join(agg, part, "left")
                .fillna(0, subset=["violation_count"])
                .select(
                    F.col(part).alias("day"),
                    F.lit(f"referential_root({group})").alias("check"),
                    (F.col("violation_count") == 0).alias("pass"),
                    "violation_count",
                    "rows_checked",
                    nullmap.alias("metrics"),
                )
            )

        if kind == "ordering":
            v = ord_ops.ordering_violations(
                df, d.get("group", "conv_id"), d.get("order", "turn_idx"), d.get("monotone")
            )
            agg = v.groupBy(part).agg(F.count(F.lit(1)).alias("violation_count"))
            totals = df.groupBy(part).agg(F.count(F.lit(1)).alias("rows_checked"))
            return (
                totals.join(agg, part, "left")
                .fillna(0, subset=["violation_count"])
                .select(
                    F.col(part).alias("day"),
                    F.lit(f"ordering({d.get('group', 'conv_id')})").alias("check"),
                    (F.col("violation_count") == 0).alias("pass"),
                    "violation_count",
                    "rows_checked",
                    nullmap.alias("metrics"),
                )
            )

        if kind == "drift":
            value = F.expr(d.get("value", "length(text)"))
            res = drift_ops.ks_psi(
                df, value, part, d.get("buckets", 20),
                baseline_partition=d.get("baseline"),
                lo=d.get("lo"), hi=d.get("hi"),
            )
            ks_t = d.get("ks_threshold", 0.15)
            psi_t = d.get("psi_threshold", 0.2)
            # abstain (pass) below min_rows: PSI/KS over B buckets are pure
            # noise when n ~ B (E[PSI] ~ B/n); metrics still reported
            min_rows = d.get("min_rows", 200)
            return res.select(
                F.col("part").alias("day"),
                F.lit(f"drift({d.get('value', 'length(text)')})").alias("check"),
                (
                    (F.col("n_rows") < min_rows)
                    | ((F.col("ks_stat") <= ks_t) & (F.col("psi") <= psi_t))
                ).alias("pass"),
                F.lit(0).cast("long").alias("violation_count"),
                F.col("n_rows").alias("rows_checked"),
                F.create_map(
                    F.lit("ks_stat"), F.col("ks_stat"), F.lit("psi"), F.col("psi")
                ).alias("metrics"),
            )

        if kind == "stats":
            cols = d.get("columns")
            wide = stats_ops.column_stats(df, cols, part)
            metric_cols = [c for c in wide.columns if c not in (part, "rows_checked")]
            by_col: dict[str, list[str]] = {}
            for mc in metric_cols:
                col, metric = mc.split("__", 1)
                by_col.setdefault(col, []).append(mc)
            frames = []
            for col, mcs in by_col.items():
                kv = []
                for mc in mcs:
                    kv += [F.lit(mc.split("__", 1)[1]), F.col(mc)]
                frames.append(
                    wide.select(
                        F.col(part).alias("day"),
                        F.lit(f"stats:{col}").alias("check"),
                        F.lit(True).alias("pass"),
                        F.lit(0).cast("long").alias("violation_count"),
                        F.col("rows_checked"),
                        F.create_map(*kv).alias("metrics"),
                    )
                )
            res = frames[0]
            for fr in frames[1:]:
                res = res.unionByName(fr)
            return res

        raise MalformedSchemaError("#/dataset", kind, "unknown dataset check")

    def _dataset_violations(self, df: DataFrame, d: dict) -> DataFrame | None:
        part = self.partition_by
        k1, k2 = self.keys
        kind = d["check"]

        def shape(rows: DataFrame, keyword: str, message) -> DataFrame:
            return rows.select(
                F.col(k1).alias("conv_id"),
                F.col(k2).cast("int").alias("turn_idx"),
                F.lit(",".join(d.get("columns", [k1, k2]))).alias("column"),
                F.lit(keyword).alias("keyword"),
                (F.lit(message) if isinstance(message, str) else message).alias("message"),
                F.lit("#").alias("path"),
                F.col(part).alias("day"),
            )

        if kind == "unique":
            rows = uniq_ops.duplicate_rows(df, d["columns"])
            return shape(rows, "unique", "duplicate key")
        if kind == "referential_root":
            group = d.get("group", "conv_id")
            orphan = ri_ops.conversation_orphans(df, group, d.get("order", "turn_idx"))
            rows = df.join(F.broadcast(orphan.select(group)), group, "left_semi")
            return shape(rows, "referential", "conversation has no root turn")
        if kind == "ordering":
            rows = ord_ops.ordering_violations(
                df, d.get("group", "conv_id"), d.get("order", "turn_idx"), d.get("monotone")
            )
            return shape(rows, "ordering", F.col("ordering_issue"))
        return None  # drift/stats are partition-level: verdict-only
