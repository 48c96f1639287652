"""File sources & sinks (SURVEY.md §2.1)."""

from bigdatafinalproject_hockey_spark.sources import csv  # noqa: F401
