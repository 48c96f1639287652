"""MinHash + LSH near-duplicate candidate pairs (sub-quadratic path).

Shingle → hash token sets into a sparse vector → MinHashLSH banding →
bucket self-join. Uses pyspark.ml.feature.MinHashLSH, whose
approxSimilarityJoin only compares documents that collide in at least
one LSH band — the 100 TB-scale alternative to exact Jaccard's
inverted-index join (dedup.jaccard).

Hash functions are seeded, so results are deterministic for a given
Spark version, but not reproducible in an external SQL engine →
checked rows-only by the driver.
"""

from __future__ import annotations

from pyspark.ml.feature import HashingTF, MinHashLSH
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bigdatafinalproject_hockey_spark.functions.text import tokens_expr
from bigdatafinalproject_hockey_spark.operators.partitioning import ensure_parallelism


def shingles_expr(col, n: int = 3):
    """Word n-gram shingles from the token array.

    Built by zip_with-ing n-1 shifted copies of the token array —
    O(tokens) array ops per row. (A transform-over-indices with
    per-index slice/indexing is ~40× slower: nested HOF indexing
    doesn't codegen and re-evaluates the array per position.)
    n=1 degenerates to the distinct token set.
    """
    toks = tokens_expr(col)
    if n <= 1:
        return F.array_distinct(toks)
    acc = toks
    for k in range(1, n):
        shifted = F.slice(toks, k + 1, F.greatest(F.size(toks) - k, F.lit(0)))
        acc = F.zip_with(acc, shifted, lambda a, b: F.concat_ws(" ", a, b))
    full = F.when(
        F.size(toks) >= n, F.slice(acc, 1, F.size(toks) - (n - 1))
    ).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(full)


def minhash_candidate_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    shingle_n: int = 1,
    num_hash_tables: int = 8,
    max_jaccard_distance: float = 0.3,
    vocab_size: int = 1 << 18,
) -> DataFrame:
    """Candidate near-dup pairs with estimated Jaccard distance <= cutoff.

    Output: doc_a, doc_b, jaccard_dist. Pairs are deduped (doc_a < doc_b).
    """
    # Shingling + banding + the bucket join are far more expensive per
    # row than the scan; widen a narrow scan layout first (a 3× win at
    # bench scale, where the corpus arrives as one parquet split).
    shingled = ensure_parallelism(df).select(
        F.col(id_col).alias("doc"), shingles_expr(F.col(text_col), shingle_n).alias("sh")
    ).filter(F.size("sh") > 0)
    # HashingTF, not CountVectorizer: stateless feature hashing needs no
    # vocabulary fit (no extra pass, no driver-side vocab) — at corpus
    # scale a CountVectorizer vocab would not fit the driver at all.
    tf = HashingTF(
        inputCol="sh", outputCol="features", numFeatures=vocab_size, binary=True
    )
    # Persist the signature vectors: the self-join references this
    # lineage TWICE (plus the fit pass), and shingling is the most
    # expensive narrow stage — without the persist it runs 3×. Sparse
    # binary vectors are compact (~|shingles| ints/doc), so this is the
    # right trade even at corpus scale; spills to disk if not.
    from pyspark import StorageLevel

    vecs = tf.transform(shingled).persist(StorageLevel.MEMORY_AND_DISK)
    lsh = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=num_hash_tables, seed=42
    )
    lsh_model = lsh.fit(vecs)
    pairs = lsh_model.approxSimilarityJoin(
        vecs, vecs, max_jaccard_distance, distCol="jaccard_dist"
    )
    return (
        pairs.select(
            F.col("datasetA.doc").alias("doc_a"),
            F.col("datasetB.doc").alias("doc_b"),
            F.col("jaccard_dist"),
        )
        .filter(F.col("doc_a") < F.col("doc_b"))
    )
