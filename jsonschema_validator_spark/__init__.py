"""jsonschema_validator_spark — a PySpark-native schema + constraint
validation engine.

Re-expresses the JSON-Schema keyword semantics of the reference validator
(macisamuele/jsonschema-validator, /root/reference — a row-at-a-time Rust
tree-walker) as vectorized, set-oriented Spark Column algebra:

- ``functions.keywords``  — keyword -> Column predicate compilers
  (draft4/draft6/draft7), over both typed DataFrame columns and Spark 4
  VariantType columns (arbitrary JSON).
- ``plans.schema_compiler`` — Schema/Scope compilation with $ref resolution
  and memoization (mirrors reference src/types/scope_builder.rs semantics).
- ``plans.check_suite``   — table-level CheckSuite: one fused pass emitting
  all per-row checks, dual API verdicts()/violations() (mirrors the
  reference's is_valid vs validation_errors, src/types/schema.rs:67-78).
- ``operators``           — dataset-level checks: column stats, uniqueness,
  referential integrity, ordering, KS/PSI drift, dedup, similarity search,
  text stats, multimodal plumbing.
- ``plans.runner``        — checkpointed per-partition lineage + resume.

Everything row-level is native Column expressions (JVM-side, codegen);
pandas/Arrow UDFs only where Column algebra cannot express the operator.
"""

__version__ = "0.1.0"

from jsonschema_validator_spark.errors import SchemaError, MalformedSchemaError

__all__ = ["SchemaError", "MalformedSchemaError", "__version__"]
