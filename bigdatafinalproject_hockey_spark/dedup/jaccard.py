"""Token-set Jaccard near-duplicate pairs via inverted-index self-join.

Exact Jaccard is quadratic in the worst case; the standard scale
trick is blocking — only compare documents sharing a block key (here:
language) and generate candidates through the token inverted index
(docs sharing ≥1 token). At 100 TB you narrow blocks further
(lang × length-bucket × source) or switch to MinHash LSH
(dedup.minhash) which is the sub-quadratic path.

Everything is built-in exprs + joins + aggs: tokenize scan-side,
explode distinct tokens, self-join the posting lists, count
intersections, and compute |A∩B| / (|A|+|B|-|A∩B|) from integer
counts (bit-deterministic division).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bigdatafinalproject_hockey_spark.functions.text import distinct_tokens_expr
from bigdatafinalproject_hockey_spark.operators.partitioning import ensure_parallelism


def jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    block_col: str | None = None,
    threshold: float = 0.8,
) -> DataFrame:
    """All (id_a < id_b) pairs with token-set Jaccard >= threshold.

    Output: doc_a, doc_b, jaccard (exact double from integer counts).
    """
    base_cols = [F.col(id_col).alias("doc"), distinct_tokens_expr(text_col).alias("toks")]
    if block_col:
        base_cols.append(F.col(block_col).alias("blk"))
    toks = ensure_parallelism(df).select(*base_cols)

    # Carry |tokens| on every posting row instead of joining a counts
    # table back in afterwards: n_tok is constant per doc, so the
    # intersection groupBy can recover it with min() — two whole joins
    # (and two extra tokenize passes) gone. The self-join scans the
    # posting list twice, but both sides share the canonical
    # token-key exchange the join inserts: tokenize+explode runs once
    # into the shuffle, ReusedExchange feeds the second side — no
    # cache copy (round 4).
    posting = toks.select(
        "doc",
        F.size("toks").cast("long").alias("n_tok"),
        *(["blk"] if block_col else []),
        F.explode("toks").alias("token"),
    )
    a = posting.alias("a")
    b = posting.alias("b")
    cond = (F.col("a.token") == F.col("b.token")) & (F.col("a.doc") < F.col("b.doc"))
    if block_col:
        cond = cond & (F.col("a.blk") == F.col("b.blk"))
    inter = (
        a.join(b, cond)
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(
            F.count(F.lit(1)).alias("n_inter"),
            F.min("a.n_tok").alias("n_a"),
            F.min("b.n_tok").alias("n_b"),
        )
    )
    return (
        inter.withColumn(
            "jaccard",
            F.col("n_inter").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
