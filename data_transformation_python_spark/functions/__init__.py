"""Scalar-function surface + dialect shim — see scalars.py."""

from .scalars import SNOWFLAKE_TO_SPARK, transpile_snowflake  # noqa: F401
