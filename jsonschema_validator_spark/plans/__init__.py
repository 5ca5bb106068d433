from jsonschema_validator_spark.plans.check_suite import CheckSuite

__all__ = ["CheckSuite"]
