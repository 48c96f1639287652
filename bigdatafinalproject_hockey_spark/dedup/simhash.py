"""SimHash document fingerprints — constant-size near-dup signatures.

Classic Charikar simhash over the token set: each token contributes
its 64-bit hash as ±1 votes per bit position; the fingerprint is the
sign vector packed into a long. Documents within a small hamming
distance are near-dup candidates.

Implemented entirely with Catalyst higher-order expressions
(aggregate over the token array zip_with'ing a 64-slot counter array)
— JVM-side, no Python in the row path. xxhash64 is Spark-specific →
rows-only oracle check.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bigdatafinalproject_hockey_spark.functions.text import distinct_tokens_expr
from bigdatafinalproject_hockey_spark.operators.partitioning import ensure_parallelism

N_BITS = 64


def simhash_expr(text_col: Column | str) -> Column:
    """64-bit simhash of the document's distinct token set, as a long.

    Bit positions are unrolled at plan-build time (shift amounts must
    be literals), so this compiles to one aggregate over the token
    array producing a 64-slot vote vector, then a literal-folded pack.
    """
    toks = distinct_tokens_expr(text_col)
    zeros = F.array_repeat(F.lit(0), N_BITS)
    # votes[i] += (bit i of xxhash64(token)) ? 1 : -1, for every token
    votes = F.aggregate(
        toks,
        zeros,
        lambda acc, t: F.zip_with(
            acc,
            F.array(
                *[
                    F.shiftright(F.xxhash64(t), i).bitwiseAND(F.lit(1)).cast("int")
                    for i in range(N_BITS)
                ]
            ),
            lambda a, b: a + (b * 2 - 1),
        ),
    )
    # pack sign bits: OR together 2^i for every positive vote slot
    packed = F.lit(0).cast("long")
    for i in range(N_BITS):
        bit = F.when(
            F.element_at(votes, i + 1) > 0,
            F.shiftleft(F.lit(1).cast("long"), i),
        ).otherwise(F.lit(0).cast("long"))
        packed = packed.bitwiseOR(bit)
    return packed


def simhash_fingerprints(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    # The 64-slot vote aggregate is ~100× the scan cost per row — make
    # sure it runs on every core even when the scan was one split.
    return ensure_parallelism(df).select(
        F.col(id_col), simhash_expr(text_col).alias("simhash")
    )


def hamming_expr(a: Column, b: Column) -> Column:
    """Hamming distance between two packed 64-bit fingerprints."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_pairs(
    df: DataFrame, text_col: str, id_col: str, max_hamming: int = 3
) -> DataFrame:
    """Near-dup candidate pairs by simhash hamming distance.

    Candidate generation blocks on the high 16 bits of the fingerprint
    (a 4-band LSH over the simhash) so the self-join is not quadratic;
    exact hamming filter afterwards. At 100 TB use all 4 rotated bands
    to avoid missing pairs that differ in the chosen band.
    """
    from pyspark import StorageLevel

    fps = simhash_fingerprints(df, text_col, id_col)
    # 16 bytes/doc; the self-join scans this twice and the 64-slot vote
    # aggregate above it is by far the most expensive stage — persist.
    banded = fps.withColumn(
        "band", F.shiftrightunsigned("simhash", 48)
    ).persist(StorageLevel.MEMORY_AND_DISK)
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            hamming_expr(F.col("a.simhash"), F.col("b.simhash")).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )
