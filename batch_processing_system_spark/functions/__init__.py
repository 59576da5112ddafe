from .json_schema import compile_json_schema, make_validator_udf

__all__ = ["compile_json_schema", "make_validator_udf"]
