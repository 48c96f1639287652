"""Engine-portable 64-bit string hash.

Spark's fast native hashes (xxhash64, hash) have no DuckDB
counterpart, which forces any operator built on them into a weaker
rows-only correctness check. This hash is built from md5 — available
with identical semantics in Spark, DuckDB, and virtually every other
engine — so operators using it (simhash fingerprints, deterministic
bucketing) can be verified value-for-value against a SQL oracle.

Construction: the first 16 hex chars of md5(s), i.e. the high 64 bits
of the digest, assembled as two 32-bit halves (hi << 32 | lo). The
assembled bit pattern is identical in both engines; Spark holds it in
a signed long, DuckDB in a UBIGINT (DuckDB's signed << raises on
overflow rather than wrapping). Extracting bits/blocks with unsigned
shifts yields identical values on both sides, which is all the
callers observe.

Cost note: md5 is a cryptographic digest, several times the cost of
xxhash64 per token — but every current caller feeds it into per-token
work (e.g. a 64-slot simhash vote aggregate) that dominates by orders
of magnitude, so portability is effectively free. For a hash-only hot
path at 100 TB, prefer F.xxhash64 and a rows-only check.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_MASK64 = (1 << 64) - 1


def splitmix64(x: int) -> int:
    """SplitMix64 finalizer — a public-domain integer mixer (Steele et
    al., "Fast splittable pseudorandom number generators", OOPSLA'14).
    Plan-build-time only: derives deterministic literal coefficients
    (hyperplanes, projections, hash families) that Spark plans and SQL
    oracles embed identically."""
    x = (x ^ (x >> 30)) * 0xBF58476D1CE4E5B9 & _MASK64
    x = (x ^ (x >> 27)) * 0x94D049BB133111EB & _MASK64
    return x ^ (x >> 31)


def portable_hash64_expr(col: Column | str) -> Column:
    """64-bit hash of a string column as a signed long — JVM-side,
    codegen'd (md5 + conv + bit ops, no UDF)."""
    c = F.col(col) if isinstance(col, str) else col
    digest = F.md5(c.cast("string"))
    hi = F.conv(F.substring(digest, 1, 8), 16, 10).cast("long")
    lo = F.conv(F.substring(digest, 9, 8), 16, 10).cast("long")
    return F.shiftleft(hi, 32).bitwiseOR(lo)


def portable_hash64_sql(expr: str) -> str:
    """DuckDB fragment computing the same 64 bits as
    :func:`portable_hash64_expr`, as a UBIGINT. ``hi * 2^32 + lo``
    never exceeds 2^64-1, so UBIGINT multiplication is exact (and
    avoids DuckDB's overflow-checked ``<<``)."""
    return (
        f"(CAST(('0x' || substr(md5({expr}), 1, 8)) AS UBIGINT) * 4294967296 + "
        f"CAST(('0x' || substr(md5({expr}), 9, 8)) AS UBIGINT))"
    )
