"""Streaming, sessionization, ML, and source/sink queries.

Covers SURVEY.md §2.1 (scan/sink), §2.12 (streaming extension) and
§2.14 (ML surface). The streaming aggregate runs a REAL Structured
Streaming query (file replay → watermark → windowed agg → memory
sink) whose complete-mode result equals the batch oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdatafinalproject_hockey_spark.catalog import SCHEMAS, load_table
from bigdatafinalproject_hockey_spark.ml import (
    baselines,
    evaluate_binary,
    feature_importances_topk,
    train_pipeline,
)
from bigdatafinalproject_hockey_spark.operators.sampling import split_temporal
from bigdatafinalproject_hockey_spark.queries.base import register
from bigdatafinalproject_hockey_spark.sources.csv import scan_csv, sink_csv
from bigdatafinalproject_hockey_spark.streaming import (
    read_events_stream,
    run_stream_to_table,
    sessionize,
    sliding_agg,
    static_enrich_agg,
    stream_dedup,
    tumbling_agg,
)

TMP_DIR = "/root/repo/.tmp"


@register(
    "stream_tumbling_agg",
    oracle="""
    SELECT time_bucket(INTERVAL '1 day', ts) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
               AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q_stream_tumbling_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling-window aggregate executed as a REAL
    streaming query (availableNow file replay → memory sink, complete
    mode). Epoch-aligned windows match the batch time_bucket oracle."""
    stream = read_events_stream(spark, sf_dir)
    agg = tumbling_agg(stream, window_duration="1 day", watermark_delay="1 hour")
    return run_stream_to_table(spark, agg, output_mode="complete")


@register(
    "stream_static_enrich",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
               AS sum_value
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY 1
    """,
)
def q_stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment as a REAL streaming query: the events
    file stream broadcast-joins the static customer dimension and
    aggregates revenue per market segment (complete-mode keyed state,
    bounded by segment cardinality). The oracle is the equivalent
    batch join+aggregate."""
    stream = read_events_stream(spark, sf_dir)
    dim = load_table(spark, "customer", sf_dir)
    agg = static_enrich_agg(stream, dim)
    return run_stream_to_table(spark, agg, output_mode="complete")


@register(
    "stream_sliding_agg",
    oracle="""
    WITH expanded AS (
      SELECT time_bucket(INTERVAL '12 hours', ts) AS window_start,
             event_type, value
      FROM events
      UNION ALL
      SELECT time_bucket(INTERVAL '12 hours', ts) - INTERVAL '12 hours',
             event_type, value
      FROM events
    )
    SELECT window_start, event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
               AS sum_value
    FROM expanded
    GROUP BY 1, 2
    """,
)
def q_stream_sliding_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window (1 day every 12 h) streaming aggregate: every
    event belongs to exactly duration/slide = 2 epoch-aligned windows;
    the oracle expands each event into both window starts and groups."""
    stream = read_events_stream(spark, sf_dir)
    agg = sliding_agg(
        stream, window_duration="1 day", slide="12 hours", watermark_delay="1 hour"
    )
    return run_stream_to_table(spark, agg, output_mode="complete")


@register(
    "stream_dedup",
    oracle="""
    SELECT event_id, ts, user_id, event_type, value FROM events
    """,
)
def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup as a REAL streaming query: the source is
    self-unioned so every event arrives twice; watermarked
    dropDuplicates emits each exactly once (append mode). Surviving
    copies are byte-identical, so the output value-matches the plain
    batch table regardless of which copy won."""
    stream = read_events_stream(spark, sf_dir)
    deduped = stream_dedup(stream, watermark_delay="1 hour")
    return run_stream_to_table(spark, deduped, output_mode="append")


@register(
    "sessionize_events",
    oracle="""
    WITH o AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       >= INTERVAL 30 MINUTE
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
             THEN 1 ELSE 0 END AS new_sess
      FROM events
    ),
    s AS (
      SELECT user_id, ts, value,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
      FROM o
    )
    SELECT user_id,
           MIN(ts) AS first_ts,
           MAX(ts) AS last_ts,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
               AS sum_value
    FROM s
    GROUP BY user_id, sess_id
    """,
)
def q_sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity) via the built-in
    session_window — the oracle is the classic gaps-and-islands SQL.
    Spark semantics: a session's window extends gap past the last
    event; an event at exactly +gap starts a NEW session (oracle uses
    >= accordingly)."""
    events = load_table(spark, "events", sf_dir)
    return sessionize(events, gap="30 minutes")


@register(
    "scan_jsonl_roundtrip",
    oracle="""
    SELECT doc_id, text, lang, source, n_chars FROM documents
    """,
)
def q_scan_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONL sink + explicit-schema JSONL scan: the pretraining-corpus
    interchange format (one document object per line). Values must
    round-trip losslessly against the parquet original — exercises
    JSON escaping of arbitrary text payloads and null handling."""
    from bigdatafinalproject_hockey_spark.sources.jsonl import scan_jsonl, sink_jsonl

    path = os.path.join(TMP_DIR, "jsonl_roundtrip_documents")
    df = load_table(spark, "documents", sf_dir)
    sink_jsonl(df, path)
    return scan_jsonl(spark, path, SCHEMAS["documents"])


@register(
    "scan_csv_roundtrip",
    oracle="""
    SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
    FROM customer
    """,
)
def q_scan_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV sink + explicit-schema CSV scan (SURVEY.md §2.1): write the
    customer table to CSV, read it back typed, values identical to the
    parquet original. Exercises header handling, null sentinels, and
    full-precision double round-trip."""
    path = os.path.join(TMP_DIR, "csv_roundtrip_customer")
    df = load_table(spark, "customer", sf_dir)
    sink_csv(df, path)
    return scan_csv(spark, path, SCHEMAS["customer"])


def _ml_train_eval(spark: SparkSession, sf_dir: str, kind: str) -> DataFrame:
    """Shared body for the four classifier queries: features from the
    star schema, temporal split, train with the reference's
    hyperparameters (ml.classifier / ml.mlp_classifier,
    reference code/experiment.py:697-785), SINGLE-PASS confusion-matrix
    evaluation + baselines (vs the reference's six jobs, SURVEY.md
    §3.3). Tree ensembles also report their top feature importance
    (reference code/experiment.py:39-54). Returns one metrics row."""
    orders = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    per_order = li.groupBy("l_orderkey").agg(
        F.sum("l_quantity").alias("f_qty"),
        F.avg("l_discount").alias("f_disc"),
        F.avg("l_extendedprice").alias("f_price"),
        F.count(F.lit(1)).alias("f_lines"),
    )
    data = (
        orders.join(per_order, orders.o_orderkey == per_order.l_orderkey)
        .withColumn("label", F.when(F.col("o_orderstatus") == "F", 1.0).otherwise(0.0))
        .withColumn("order_year", F.year("o_orderdate"))
        .select("label", "order_year", "f_qty", "f_disc", "f_price", "f_lines")
    )
    train, test = split_temporal(data, "order_year")
    feats = ["f_qty", "f_disc", "f_price", "f_lines"]
    model = train_pipeline(train, feats, kind)
    preds = model.transform(test).cache()
    m = evaluate_binary(preds)
    base = baselines(test)
    row = {
        "model": kind,
        "n_test": float(m.n),
        "accuracy": m.accuracy,
        "precision": m.precision,
        "recall": m.recall,
        "f1": m.f1,
        "auc": float(m.auc or 0.0),
        "baseline_majority": base["majority"],
        "baseline_weighted": base["weighted_random"],
    }
    if kind in ("rf", "gbt"):
        imp, name = feature_importances_topk(model, feats, k=1)[0]
        row["top_feature"] = name
        row["top_feature_importance"] = float(imp)
    else:
        row["top_feature"] = None
        row["top_feature_importance"] = None
    schema = (
        "model string, n_test double, accuracy double, precision double, "
        "recall double, f1 double, auc double, baseline_majority double, "
        "baseline_weighted double, top_feature string, "
        "top_feature_importance double"
    )
    return spark.createDataFrame([row], schema=schema)


@register("ml_train_eval")  # model internals → rows-only check
def q_ml_train_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Logistic regression (reference code/experiment.py:743-758)."""
    return _ml_train_eval(spark, sf_dir, "lr")


@register("ml_train_eval_rf")  # model internals → rows-only check
def q_ml_train_eval_rf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random forest, numTrees=200 maxDepth=10 seed=42 (reference
    code/experiment.py:697-710), with top feature importance."""
    return _ml_train_eval(spark, sf_dir, "rf")


@register("ml_train_eval_gbt")  # model internals → rows-only check
def q_ml_train_eval_gbt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gradient-boosted trees, maxIter=100 maxDepth=8 (reference
    code/experiment.py:711-742), with top feature importance."""
    return _ml_train_eval(spark, sf_dir, "gbt")


@register("ml_train_eval_mlp")  # model internals → rows-only check
def q_ml_train_eval_mlp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multilayer perceptron, layers [n, 64, 32, 2] (reference
    code/experiment.py:767-785)."""
    return _ml_train_eval(spark, sf_dir, "mlp")


@register(
    "scan_chunked",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n_rows,
           SUM(l_quantity) AS sum_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_scan_chunked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-parallel scan (reference scan_chunked: bounded-memory
    chunked CSV reads, code/create_subsample.py:54-70). Spark's native
    form is split-based scanning — ``spark.sql.files.maxPartitionBytes``
    bounds per-task input, so no task ever holds the whole file
    (tests/test_modules.py::test_scan_chunked_splits locks that the
    split count scales and values are chunk-invariant). On top,
    ``ensure_parallelism`` re-chunks a compact scan across all cores
    before the aggregate. The aggregate is associative, so the result
    is independent of the chunking — which is exactly what the oracle
    checks."""
    from bigdatafinalproject_hockey_spark.operators.partitioning import (
        ensure_parallelism,
    )

    li = load_table(spark, "lineitem", sf_dir).select("l_returnflag", "l_quantity")
    chunked = ensure_parallelism(li)
    return chunked.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("l_quantity").alias("sum_qty"),
    )
