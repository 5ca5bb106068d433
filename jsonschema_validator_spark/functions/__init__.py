from jsonschema_validator_spark.functions.accessors import (
    JsonAccessor,
    TypedAccessor,
    VariantAccessor,
    json_accessor,
    malformed_json_check,
)

__all__ = [
    "JsonAccessor",
    "TypedAccessor",
    "VariantAccessor",
    "json_accessor",
    "malformed_json_check",
]
