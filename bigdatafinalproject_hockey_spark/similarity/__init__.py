"""Similarity search over embedding columns (array<float>).

Two paths:
- brute-force cosine top-k: exact, O(queries × corpus) — the baseline
  and the correctness oracle. Fine when the query set is small or the
  corpus is broadcastable.
- LSH-bucketed ANN (BucketedRandomProjectionLSH): sub-linear candidate
  generation — the 100 TB path, where neither side fits anywhere.

Both keep all arithmetic in Catalyst higher-order expressions
(functions.vectors) — no Python UDFs.
"""

from __future__ import annotations

from pyspark.ml.feature import BucketedRandomProjectionLSH
from pyspark.ml.functions import array_to_vector
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bigdatafinalproject_hockey_spark.functions.vectors import (
    as_double_array,
    cosine_expr,
)
from bigdatafinalproject_hockey_spark.operators.partitioning import ensure_parallelism
from bigdatafinalproject_hockey_spark.operators.windows import topk_per_group


def brute_force_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    round_decimals: int = 6,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    The query side is broadcast (small by contract); the corpus streams
    — one pass, no shuffle until the per-query top-k, which moves only
    k rows per query. Scores are rounded BEFORE ranking so ranking is
    stable across engines; ties break on neighbor id.

    Output: query_id, neighbor_id, cosine, rnk.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double_array(vec_col).alias("q_emb")
    )
    c = ensure_parallelism(corpus).select(
        F.col(id_col).alias("neighbor_id"), as_double_array(vec_col).alias("c_emb")
    )
    scored = c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id")).select(
        "query_id",
        "neighbor_id",
        F.round(cosine_expr(F.col("q_emb"), F.col("c_emb")), round_decimals).alias(
            "cosine"
        ),
    )
    top = topk_per_group(
        scored, ["query_id"], [F.col("cosine").desc(), F.col("neighbor_id")], k
    )
    return top.select(
        "query_id", "neighbor_id", "cosine", F.col("rnk").cast("long").alias("rnk")
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    min_cosine: float = 0.95,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b) above a
    similarity threshold — brute-force within-block form; use
    ann_lsh_near_pairs at corpus scale."""
    df = ensure_parallelism(df)
    a = df.select(F.col(id_col).alias("id_a"), as_double_array(vec_col).alias("e_a"))
    b = df.select(F.col(id_col).alias("id_b"), as_double_array(vec_col).alias("e_b"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(cosine_expr(F.col("e_a"), F.col("e_b")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= min_cosine)
    )


def ivf_cosine_topk(
    corpus: DataFrame,
    centroids: DataFrame,
    query_ids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    round_decimals: int = 6,
) -> DataFrame:
    """IVF (inverted-file) approximate nearest neighbors: assign every
    vector to its nearest centroid, then search only within the
    query's cell (nprobe=1).

    This is the coarse-quantization scale path: with C centroids the
    per-query work drops from |corpus| to ~|corpus|/C, and the cell
    assignment is a broadcast map over one corpus scan. Centroids are
    supplied by the caller (deterministic subset or a KMeans fit), so
    the whole computation is engine-reproducible — unlike seeded-hash
    LSH this variant IS oracle-checkable.

    ``query_ids``: one column ``id_col`` selecting query vectors (must
    exist in the corpus). Output: query_id, neighbor_id, cosine, rnk.
    """
    c = corpus.select(F.col(id_col).alias("vid"), as_double_array(vec_col).alias("emb"))
    c = ensure_parallelism(c)
    cent = centroids.select(
        F.col(id_col).alias("cent_id"), as_double_array(vec_col).alias("cemb")
    )
    # nearest centroid per vector: broadcast the (tiny) centroid set,
    # rank rounded cosine with centroid-id tiebreak for determinism
    scored = c.crossJoin(F.broadcast(cent)).select(
        "vid",
        "emb",
        "cent_id",
        F.round(cosine_expr(F.col("emb"), F.col("cemb")), round_decimals).alias("cs"),
    )
    from pyspark import StorageLevel

    # Referenced twice below (query lookup + per-cell candidates); the
    # centroid crossJoin + ranking above it is the expensive pass —
    # persist the compact (vid, cell, emb) assignment instead of
    # running it twice.
    assign = (
        topk_per_group(scored, ["vid"], [F.col("cs").desc(), F.col("cent_id")], 1)
        .select("vid", F.col("cent_id").alias("cell"), "emb")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    q = (
        assign.join(
            F.broadcast(query_ids.select(F.col(id_col).alias("vid"))), "vid"
        )
        .select(
            F.col("vid").alias("query_id"),
            F.col("emb").alias("qemb"),
            "cell",
        )
    )
    cand = q.join(assign, "cell").filter(F.col("vid") != F.col("query_id")).select(
        "query_id",
        F.col("vid").alias("neighbor_id"),
        F.round(cosine_expr(F.col("qemb"), F.col("emb")), round_decimals).alias(
            "cosine"
        ),
    )
    top = topk_per_group(
        cand, ["query_id"], [F.col("cosine").desc(), F.col("neighbor_id")], k
    )
    return top.select(
        "query_id", "neighbor_id", "cosine", F.col("rnk").cast("long").alias("rnk")
    )


def ann_lsh_near_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_length: float = 2.0,
    num_hash_tables: int = 4,
    max_l2: float = 5.0,
) -> DataFrame:
    """Approximate near-neighbor pairs via random-projection LSH over
    L2 distance — the sub-quadratic scale path. Bucket collisions
    bound the candidate set; the exact L2 filter runs only on
    candidates. Spark-seeded hashes → rows-only check.

    Output: id_a, id_b, l2_dist.
    """
    vecs = ensure_parallelism(df).select(
        F.col(id_col).alias("vid"),
        array_to_vector(as_double_array(vec_col)).alias("features"),
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=42,
    )
    model = lsh.fit(vecs)
    pairs = model.approxSimilarityJoin(vecs, vecs, max_l2, distCol="l2_dist")
    return (
        pairs.select(
            F.col("datasetA.vid").alias("id_a"),
            F.col("datasetB.vid").alias("id_b"),
            "l2_dist",
        )
        .filter(F.col("id_a") < F.col("id_b"))
    )
