"""Scalar expression helpers shared by operators and queries."""

from bigdatafinalproject_hockey_spark.functions import numeric, text, vectors  # noqa: F401
