"""Scalar function catalog (st_* surface)."""

from geomesa_spark.functions.st import ST_FUNCTIONS, register_st_functions  # noqa: F401
