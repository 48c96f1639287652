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
Round-5 baseline: zero full-width reads.

A third sweep locks each query's SHUFFLE BUDGET: the number of
``Exchange`` nodes in the physical plan is recorded in
``scripts/shuffle_baseline.json`` on the first run and compared on
every later one — a query whose exchange count GROWS fails the audit
(the docstrings state shuffle budgets; this makes them enforceable).
A count that shrinks is reported and auto-recorded as the new
baseline. The allowlist entries are all the SAME shape:
a ``crossJoin(F.broadcast(...))`` against a SCALAR aggregate (one
row: ref date, total count, fence thresholds) or a BOUNDED metadata
table (IVF centroids, top-V vocab, band table) — the cases where a
nested-loop broadcast join is the correct, cheapest plan at any
scale. A NEW name appearing here means a quadratic plan crept into a
query that didn't opt in; remove a name when its query drops the
pattern.

Round-5 baseline: 13 allowlisted BNL joins, zero cartesian, zero
single-partition exchanges, 187 queries. Round 6: 193 queries + 16
captured eager stages (209 audited plans), same flag counts. Round 7:
199 queries + 16 captured stages (215 audited plans); the new
IVF/PQ-family queries join the centroid-table BNL allowlist, while
``dedup_semantic_scaled`` deliberately does NOT — its quantizer is a
broadcast HASH join on sign-LSH band keys, which is the whole point
of that variant.

COVERAGE BOUNDARY (ADVICE r5): rendering the RETURNED DataFrame's
plan cannot see stages a query executes eagerly while being built —
a ``localCheckpoint`` truncates lineage and a per-step parquet write
runs a whole job whose plan never reaches the returned frame. Round 6
closes the known cases through the plancapture hook
(bigdatafinalproject_hockey_spark/plancapture.py): the iterative /
MV / ingest queries call ``capture(label, df)`` on each eager stage,
this audit installs a sink, and every captured plan is audited under
``<query>#<label>`` with the same flag/pruning/shuffle-ratchet rules
(tests/test_plan_audit.py asserts the expected capture keys exist, so
a removed hook fails the suite). Eager stages in code that does NOT
call capture() remain invisible — fixture staging writes
(roundtrip sources, amplified corpora) are deliberately out of scope.

Run from the repo root:  python scripts/plan_audit.py
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, ".")

FLAGS = {
    "cartesian": re.compile(r"CartesianProduct", re.I),
    "bnl_join": re.compile(r"BroadcastNestedLoopJoin", re.I),
    # formatted mode puts an Exchange's partitioning on its own
    # "Arguments:" line, NOT adjacent to the node name — matching the
    # legacy "Exchange SinglePartition" substring silently checks
    # nothing (a false negative this audit itself shipped with first).
    "single_part_exchange": re.compile(r"Arguments: SinglePartition", re.I),
}

# query -> the flags it is ALLOWED to trip, with the rationale
# enforced by review. Two benign patterns only:
#   bnl_join              crossJoin(broadcast(X)) where X is a SCALAR
#                         aggregate (one row) or a BOUNDED metadata
#                         table (centroids, top-V vocab, band table)
#   single_part_exchange  the final merge of a GLOBAL scalar
#                         aggregate (partial_* map-side, ONE ROW per
#                         partition to one task) or a global window
#                         over a per-key aggregate whose docstring
#                         states the |keys|-fit-a-partition bound
ALLOWED: dict[str, set[str]] = {
    "agg_count_filter": {"single_part_exchange"},      # global scalar count
    "agg_global_max": {"single_part_exchange"},        # global scalar max
    "analytics_ab_test": {"single_part_exchange"},     # two-proportion scalars
    "analytics_basket_lift": {"bnl_join", "single_part_exchange"},  # scalar n_orders
    "analytics_idle_customers": {"bnl_join", "single_part_exchange"},  # scalar avg acctbal
    "analytics_pareto": {"single_part_exchange"},      # rank over per-customer agg (docstring bound)
    "analytics_rfm_segments": {"bnl_join", "single_part_exchange"},  # scalar ref_date; ntile over per-customer agg
    "analytics_small_qty_revenue": {"single_part_exchange"},  # global revenue scalar
    "analytics_top_supplier": {"single_part_exchange"},  # global argmax scalar
    "bpe_learn_merge": {"bnl_join"},          # 1-row argmax merge pair
    "bpe_learn_vocab": {"bnl_join", "single_part_exchange"},  # per-iteration
                                              # 1-row argmax merges; k-row
                                              # merge-list fold
    "tokenize_bpe_corpus": {"bnl_join", "single_part_exchange"},  # shared
                                              # learn loop; symbol-table
                                              # windows over alphabet+merges
    "bpe_vocab_extend": {"bnl_join", "single_part_exchange"},  # the
                                              # same trainer loop continued
                                              # over the union type table
    "tokenize_bpe_delta": {"bnl_join", "single_part_exchange"},  # same
                                              # learn loop + symtab windows,
                                              # plus the k-fold replay's
                                              # 1-row broadcast merges over
                                              # the unseen-type table
    "corpus_drift": {"bnl_join"},             # top-V vocab table
    "diag_join_key_skew": {"bnl_join", "single_part_exchange"},  # scalar skew thresholds
    "dq_expectations": {"bnl_join", "single_part_exchange"},  # scalar check counts
    "join_range": {"bnl_join"},               # band table (by design;
                                              # scale path: join_interval_binned)
    "ml_centroid_classify": {"bnl_join", "single_part_exchange"},  # |classes|-row
                                              # mean table folded to one broadcast
                                              # row (round 13 — see the IVF/PQ
                                              # pack block below)
    "ml_eval_deterministic": {"single_part_exchange"},  # global confusion scalars
    "sample_temperature": {"bnl_join", "single_part_exchange"},  # scalar corpus totals
    "scan_csv_quarantine": {"single_part_exchange"},   # global quarantine count
    # Round 13: the IVF/PQ family's quantizer/encode argmax runs as an
    # expression fold over a SINGLE broadcast row holding the bounded
    # candidate table (≤50 centroids / m×codes≤128 codebook rows /
    # |queries|-row ADC LUTs — see similarity._pack_centroids /
    # _pack_codebooks / _pack_query_luts). Folding that table to one
    # row is a global collect_list aggregate, whose final merge is BY
    # CONSTRUCTION an Exchange SinglePartition over ≤a-few-hundred
    # metadata rows — the same benign class as the scalar-aggregate
    # entries above. The corpus-sized exchanges these folds replaced
    # (assignment window rank, encode SortAggregate) are gone; the
    # shuffle ratchet still bounds the total.
    "ann_recall_eval": {"bnl_join", "single_part_exchange"},  # centroid table + bf recall leg; centroid pack
    "ann_recall_eval_pq": {"bnl_join", "single_part_exchange"},  # centroid table + bf recall leg; packs
    "ann_index_delta": {"bnl_join", "single_part_exchange"},  # frozen centroid table (delta assign); packs
    "pipeline_embedding_curation": {"bnl_join", "single_part_exchange"},  # survivor centroid table (index half); packs
    "codebook_kmeans_refine": {"bnl_join", "single_part_exchange"},  # centroid table (E-step quantizer); pack
    "dedup_semantic": {"bnl_join", "single_part_exchange"},   # centroid table (quantizer); pack
    "sim_ann_ivf": {"bnl_join", "single_part_exchange"},      # centroid table; pack
    "sim_ann_ivf_multiprobe": {"bnl_join", "single_part_exchange"},  # centroid table; pack
    "sim_ann_ivfpq": {"bnl_join", "single_part_exchange"},    # centroid table (IVF half); packs
    "sim_ann_ivfpq_fitted": {"bnl_join", "single_part_exchange"},  # centroid table (IVF half; fit is equi-join); packs
    "sim_ann_ivfpq_multiprobe": {"bnl_join", "single_part_exchange"},  # centroid table (probe list, nprobe=2); packs
    "sim_ann_ivfpq_rerank": {"bnl_join", "single_part_exchange"},  # centroid table (IVF half; refine is equi-join); packs
    "sim_ann_ivfpq_residual": {"bnl_join", "single_part_exchange"},  # centroid table (IVF half + residual pass); packs
    "embedding_pq_encode": {"bnl_join", "single_part_exchange"},  # codebook pack (1-row crossJoin)
    "sim_ann_pq_adc": {"bnl_join", "single_part_exchange"},   # codebook pack (1-row crossJoin)
    "sim_cosine_topk": {"bnl_join"},          # brute-force recall oracle
    "sim_hybrid_rrf": {"bnl_join"},           # centroid table (IVF leg)
    "sim_knn_classify": {"bnl_join"},         # centroid table
    "stream_fanout_multi_sink": {"single_part_exchange"},  # global readout scalars
    "text_tfidf_top_terms": {"bnl_join", "single_part_exchange"},  # scalar corpus doc count
    "text_unigram_logprob": {"bnl_join", "single_part_exchange"},  # scalar vocab total
    "quality_tertile_split": {"bnl_join", "single_part_exchange"},  # same
                                              # scalar vocab total as its
                                              # unigram base
}

SF = "/root/testdata/sf0.01"


# formatted-mode node detail blocks start "(N) NodeName"
_NODE_RX = re.compile(r"(?m)^\(\d+\) ")
_LOCATION_RX = re.compile(r"Location:.*?/(\w+)\.parquet")
_READSCHEMA_RX = re.compile(r"ReadSchema: struct<([^>]*)>")
# formatted-mode Exchange node detail headers: "(5) Exchange"
_EXCHANGE_RX = re.compile(r"(?m)^\(\d+\) Exchange\b")


def _full_width_reads(plan: str, widths: dict[str, int]) -> list[str]:
    """FileScans over catalog tables that read every column (tables
    narrower than 5 columns are exempt: nation/region are all-key).

    Location and ReadSchema are matched WITHIN one node detail block
    (split on the "(N) NodeName" headers): a single cross-plan
    non-greedy match (the original shape) let a scan whose Location
    didn't fit the parquet pattern swallow the following nodes'
    ReadSchema lines, silently exempting catalog scans from the sweep
    (ADVICE r5 — false negatives only, but still a hole)."""
    out = []
    for block in _NODE_RX.split(plan):
        loc = _LOCATION_RX.search(block)
        schema = _READSCHEMA_RX.search(block)
        if not loc or not schema:
            continue
        table = loc.group(1)
        ncols = len([c for c in schema.group(1).split(",") if ":" in c])
        if table in widths and widths[table] >= 5 and ncols >= widths[table]:
            out.append(f"full_width_read:{table}")
    return out


def run_audit() -> tuple[int, dict[str, int]]:
    """Run the sweep; return (exit code, observed plan keys -> exchange
    counts). The observed dict is the per-RUN ground truth — one key
    per registry query plus one per captured eager stage — so callers
    (tests/test_plan_audit.py) can assert capture-hook coverage against
    what this run actually saw, not against the baseline file, which
    always contains historical keys (ADVICE r6 medium: the old
    assertion could not catch a dropped capture() hook)."""
    from bigdatafinalproject_hockey_spark.catalog import SCHEMAS
    from bigdatafinalproject_hockey_spark.queries import QUERIES
    from bigdatafinalproject_hockey_spark.session import get_session

    spark = get_session(app_name="plan_audit", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    widths = {t: len(s.fields) for t, s in SCHEMAS.items()}
    baseline_path = os.path.join(os.path.dirname(__file__), "shuffle_baseline.json")
    baseline: dict[str, int] = {}
    if os.path.isfile(baseline_path):
        with open(baseline_path) as fh:
            baseline = json.load(fh)
    observed: dict[str, int] = {}
    violations: dict[str, list[str]] = {}

    def _audit_one(key: str, qname: str, plan: str) -> None:
        """Apply flags, pruning sweep, and the shuffle ratchet to one
        rendered plan. ``key`` is the baseline entry (query name, or
        query#stage for a captured eager stage); the flag allowlist is
        the owning QUERY's — a stage needing its own exemption should
        be its own named pattern, not a silent pass."""
        hits = {k for k, rx in FLAGS.items() if rx.search(plan)}
        bad = sorted(hits - ALLOWED.get(qname, set()))
        bad += _full_width_reads(plan, widths)
        observed[key] = len(_EXCHANGE_RX.findall(plan))
        if key in baseline and observed[key] > baseline[key]:
            bad.append(f"shuffle_regression:{baseline[key]}->{observed[key]}")
        if bad:
            violations[key] = bad

    from bigdatafinalproject_hockey_spark import plancapture

    for name, fn in QUERIES.items():
        # Render every plan from an EMPTY cache: a persisted subtree
        # (e.g. the IVF cell assignment) renders as InMemoryRelation
        # once another query in the same session has registered an
        # identical plan, collapsing its exchanges out of the count —
        # so the measured budget depended on which queries ran first
        # (the in-suite audit after a full test session recorded
        # sim_ann_ivf at 4 exchanges, a fresh session at 6). Clearing
        # per query pins the ratchet to the fresh-session rendering.
        # Note the persisted-subtree counts OVERSTATE real shuffles:
        # each reference re-renders the cached fragment's exchanges,
        # while at runtime the fragment materializes once.
        spark.catalog.clearCache()
        captured: list[tuple[str, str]] = []

        def _sink(label, df, _cap=captured):
            # render NOW — the DataFrame is about to be checkpointed
            # or written; rendering later would see truncated lineage
            _cap.append(
                (label, df._jdf.queryExecution().explainString(mode))
            )

        plancapture.install(_sink)
        try:
            df = fn(spark, SF)
            plan = df._jdf.queryExecution().explainString(mode)
        except Exception as exc:  # noqa: BLE001
            violations[name] = [f"PLAN_ERROR {type(exc).__name__}: {exc}"[:120]]
            continue
        finally:
            plancapture.uninstall()
        _audit_one(name, name, plan)
        # eager intermediate stages (ADVICE r5's blind spot): same
        # rules, keyed query#stage so each holds its own budget
        for label, cplan in captured:
            _audit_one(f"{name}#{label}", name, cplan)
    for name, flags in sorted(violations.items()):
        print(f"VIOLATION {name}: {flags}")
    improved = {
        n: (baseline[n], c)
        for n, c in observed.items()
        if n in baseline and c < baseline[n]
    }
    for n, (old, new) in sorted(improved.items()):
        print(f"IMPROVED {n}: {old} -> {new} exchanges")
    if not violations:
        # Record THIS run's observations verbatim: new queries seed
        # their entries, improvements ratchet down, and keys for
        # removed/renamed queries or dropped stage captures are PRUNED
        # (ADVICE r6 low: merging kept stale entries forever, letting a
        # renamed query silently restart its ratchet and blinding the
        # capture-coverage test). A green run observes every live
        # registry query, so ``observed`` is exactly the live key set.
        stale = sorted(set(baseline) - set(observed))
        for key in stale:
            print(f"PRUNED stale baseline key: {key}")
        with open(baseline_path, "w") as fh:
            json.dump(dict(sorted(observed.items())), fh, indent=0, sort_keys=True)
    n = len(QUERIES)
    print(f"{n} queries audited, {len(violations)} violations")
    return (1 if violations else 0), observed


def main() -> int:
    rc, _ = run_audit()
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
