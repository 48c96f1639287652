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


def _pair_intersections(
    df: DataFrame,
    text_col: str,
    id_col: str,
    block_col: str | None = None,
) -> DataFrame:
    """(doc_a < doc_b, n_inter, n_a, n_b) token-set intersections via
    the blocked inverted-index self-join — the shared candidate stage
    under both Jaccard and containment scoring.

    Carries |tokens| on every posting row instead of joining a counts
    table back in afterwards: n_tok is constant per doc, so the
    intersection groupBy can recover it with min() — two whole joins
    (and two extra tokenize passes) gone. The self-join scans the
    posting list twice, but both sides share the canonical token-key
    exchange the join inserts: tokenize+explode runs once into the
    shuffle, ReusedExchange feeds the second side — no cache copy
    (round 4).
    """
    base_cols = [F.col(id_col).alias("doc"), distinct_tokens_expr(text_col).alias("toks")]
    if block_col:
        base_cols.append(F.col(block_col).alias("blk"))
    toks = ensure_parallelism(df).select(*base_cols)

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
    return (
        a.join(b, cond)
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(
            F.count(F.lit(1)).alias("n_inter"),
            F.min("a.n_tok").alias("n_a"),
            F.min("b.n_tok").alias("n_b"),
        )
    )


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
    inter = _pair_intersections(df, text_col, id_col, block_col)
    return (
        inter.withColumn(
            "jaccard",
            F.col("n_inter").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def containment_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    block_col: str | None = None,
    threshold: float = 0.9,
) -> DataFrame:
    """Directed near-SUPERSET pairs: the smaller token set's
    containment in the larger, |A∩B| / min(|A|,|B|) >= threshold.

    Jaccard misses doc-inside-doc duplication — a document quoted
    whole inside a much larger one scores |A|/|B| Jaccard (tiny) but
    containment 1.0. For LLM corpora this is the boilerplate-wrapper
    / quotation case, and dedup policy usually drops the CONTAINED
    side, so the output is directed: (contained, container), smaller
    set first, ties broken by id.

    Output: contained, container, containment (exact double from
    integer counts). Same blocked inverted-index candidate stage as
    jaccard_pairs — a pair with zero shared tokens is never scored.
    """
    inter = _pair_intersections(df, text_col, id_col, block_col)
    scored = inter.withColumn(
        "containment",
        F.col("n_inter").cast("double")
        / F.least("n_a", "n_b").cast("double"),
    ).filter(F.col("containment") >= threshold)
    a_is_contained = (F.col("n_a") < F.col("n_b")) | (
        (F.col("n_a") == F.col("n_b")) & (F.col("doc_a") < F.col("doc_b"))
    )
    return scored.select(
        F.when(a_is_contained, F.col("doc_a")).otherwise(F.col("doc_b")).alias(
            "contained"
        ),
        F.when(a_is_contained, F.col("doc_b")).otherwise(F.col("doc_a")).alias(
            "container"
        ),
        "containment",
    )
