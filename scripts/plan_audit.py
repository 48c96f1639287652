"""Full-registry physical-plan audit: flag scale red-flags everywhere.

The plan-lock tests (tests/test_plans.py) pin the plans that MATTER
most, one by one. This sweep is the complement: render the formatted
physical plan of EVERY registry query at sf0.01 and grep for the
patterns that sink a 100 TB run —

- ``CartesianProduct``        unbounded pair blow-up
- ``BroadcastNestedLoopJoin`` quadratic unless one side is truly small
- ``Exchange SinglePartition``everything through one task

and fail (exit 1) if any query outside the known-intentional
allowlist trips one. A second sweep checks COLUMN PRUNING: any
FileScan over a catalog table (width >= 5) whose ReadSchema carries
the table's full width is flagged — a projection that stops reaching
the scan is invisible at sf0.01 and a full-table read at 100 TB.
Round-5 baseline: zero full-width reads. The allowlist entries are all the SAME shape:
a ``crossJoin(F.broadcast(...))`` against a SCALAR aggregate (one
row: ref date, total count, fence thresholds) or a BOUNDED metadata
table (IVF centroids, top-V vocab, band table) — the cases where a
nested-loop broadcast join is the correct, cheapest plan at any
scale. A NEW name appearing here means a quadratic plan crept into a
query that didn't opt in; remove a name when its query drops the
pattern.

Round-5 baseline: 13 allowlisted BNL joins, zero cartesian, zero
single-partition exchanges, 187 queries.

Run from the repo root:  python scripts/plan_audit.py
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

FLAGS = {
    "cartesian": re.compile(r"CartesianProduct", re.I),
    "bnl_join": re.compile(r"BroadcastNestedLoopJoin", re.I),
    "single_part_exchange": re.compile(r"Exchange SinglePartition", re.I),
}

# query -> the flags it is ALLOWED to trip, with the broadcast-small
# rationale enforced by review (each is scalar-or-bounded broadcast).
ALLOWED: dict[str, set[str]] = {
    "analytics_basket_lift": {"bnl_join"},    # scalar n_orders
    "analytics_idle_customers": {"bnl_join"}, # scalar avg acctbal
    "analytics_rfm_segments": {"bnl_join"},   # scalar ref_date
    "corpus_drift": {"bnl_join"},             # top-V vocab table
    "diag_join_key_skew": {"bnl_join"},       # scalar skew thresholds
    "dq_expectations": {"bnl_join"},          # scalar check counts
    "join_range": {"bnl_join"},               # band table (by design;
                                              # scale path: join_interval_binned
    "sim_ann_ivf": {"bnl_join"},              # centroid table
    "sim_cosine_topk": {"bnl_join"},          # brute-force recall oracle
    "sim_hybrid_rrf": {"bnl_join"},           # centroid table (IVF leg)
    "sim_knn_classify": {"bnl_join"},         # centroid table
    "text_tfidf_top_terms": {"bnl_join"},     # scalar corpus doc count
    "text_unigram_logprob": {"bnl_join"},     # scalar vocab total
}

SF = "/root/testdata/sf0.01"


_SCAN_RX = re.compile(
    r"Location:.*?/(\w+)\.parquet.*?ReadSchema: struct<([^>]*)>", re.S
)


def _full_width_reads(plan: str, widths: dict[str, int]) -> list[str]:
    """FileScans over catalog tables that read every column (tables
    narrower than 5 columns are exempt: nation/region are all-key)."""
    out = []
    for m in _SCAN_RX.finditer(plan):
        table, schema = m.group(1), m.group(2)
        ncols = len([c for c in schema.split(",") if ":" in c])
        if table in widths and widths[table] >= 5 and ncols >= widths[table]:
            out.append(f"full_width_read:{table}")
    return out


def main() -> int:
    from bigdatafinalproject_hockey_spark.catalog import SCHEMAS
    from bigdatafinalproject_hockey_spark.queries import QUERIES
    from bigdatafinalproject_hockey_spark.session import get_session

    spark = get_session(app_name="plan_audit", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    widths = {t: len(s.fields) for t, s in SCHEMAS.items()}
    violations: dict[str, list[str]] = {}
    for name, fn in QUERIES.items():
        try:
            df = fn(spark, SF)
            plan = df._jdf.queryExecution().explainString(mode)
        except Exception as exc:  # noqa: BLE001
            violations[name] = [f"PLAN_ERROR {type(exc).__name__}: {exc}"[:120]]
            continue
        hits = {k for k, rx in FLAGS.items() if rx.search(plan)}
        bad = sorted(hits - ALLOWED.get(name, set()))
        bad += _full_width_reads(plan, widths)
        if bad:
            violations[name] = bad
    for name, flags in sorted(violations.items()):
        print(f"VIOLATION {name}: {flags}")
    n = len(QUERIES)
    print(f"{n} queries audited, {len(violations)} violations")
    return 1 if violations else 0


if __name__ == "__main__":
    raise SystemExit(main())
