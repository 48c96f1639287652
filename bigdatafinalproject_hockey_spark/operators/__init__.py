"""Relational operator library (SURVEY.md §2).

Every operator is a pure function ``DataFrame -> DataFrame`` (or a
small factory returning one) built from Catalyst expressions only —
no Python UDFs on the hot path, mirroring the reference's own
UDF-free style (reference code/experiment.py throughout).
"""

from bigdatafinalproject_hockey_spark.operators import (  # noqa: F401
    aggregates,
    joins,
    lookup,
    sampling,
    scalar,
    setops,
    strings,
    windows,
)
