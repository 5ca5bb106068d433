from jsonschema_validator_spark.streaming.validate import (  # noqa: F401
    stream_validate,
    streaming_enum_rate,
    streaming_dedup,
)
