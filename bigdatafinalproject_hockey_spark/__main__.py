"""CLI — the engine's replacement for the reference's
``spark-submit experiment.py --events X --results Y`` entry point
(reference code/experiment.py:250-262):

    python -m bigdatafinalproject_hockey_spark \
        --events  path/to/EventData.csv \
        --results path/to/results.csv \
        [--team-map teams.json] [--models rf,lr] [--lookback 5] \
        [--min-season 20072008] [--min-game 2007020001] [--output out/]

Differences from the reference, by design:
- The 83-entry team-name map is USER DATA, not engine code — supply it
  as a JSON file (name → code); unmapped names fall back to the same
  strip-non-letters rule the reference uses.
- CSVs are read with explicit header + \\N null handling; types are
  pinned by the pipeline's casts (no double inference scan).
- Evaluation is single-pass (one groupBy job, not six).
- Paths may be local, gs://, s3a://, hdfs:// — whatever the session's
  Hadoop conf supports.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

from pyspark.sql import functions as F

from bigdatafinalproject_hockey_spark.ml import (
    baselines,
    evaluate_binary,
    train_pipeline,
)
from bigdatafinalproject_hockey_spark.pipeline import PipelineConfig, run_pipeline
from bigdatafinalproject_hockey_spark.session import get_session
from bigdatafinalproject_hockey_spark.sources.csv import scan_csv_infer


def _parse_args(argv: list[str] | None = None) -> argparse.Namespace:
    p = argparse.ArgumentParser(prog="bigdatafinalproject_hockey_spark")
    p.add_argument("--events", required=True, help="event-level CSV path")
    p.add_argument("--results", required=True, help="per-game results CSV path")
    p.add_argument("--team-map", default=None, help="JSON file: raw name → code")
    p.add_argument(
        "--models",
        default="lr",
        help="comma list of rf,lr,gbt,mlp (reference trains all four)",
    )
    p.add_argument("--lookback", type=int, default=5)
    p.add_argument("--min-season", type=int, default=None)
    p.add_argument("--min-game", type=int, default=None)
    p.add_argument("--output", default=None, help="optional parquet dir for matchups")
    p.add_argument(
        "--show",
        type=int,
        nargs="?",
        const=20,
        default=None,
        metavar="N",
        help="print the first N matchup rows (default 20) — the "
        "reference's console sink (experiment.py:678-680)",
    )
    return p.parse_args(argv)


def main(argv: list[str] | None = None, spark=None) -> dict:
    args = _parse_args(argv)
    own_session = spark is None
    if own_session:
        spark = get_session(app_name="hockey_pipeline")
    team_map = {}
    if args.team_map:
        with open(args.team_map) as f:
            team_map = json.load(f)

    t0 = time.time()
    results = scan_csv_infer(spark, args.results)
    events = scan_csv_infer(spark, args.events)
    cfg = PipelineConfig(
        team_map=team_map,
        min_season=args.min_season,
        min_game=args.min_game,
        lookback=args.lookback,
    )
    out = run_pipeline(results, events, cfg)
    n_game_rows = out["game_data"].count()
    n_matchups = out["matchups"].count()
    print(f"game-team rows: {n_game_rows}")
    print(f"matchups: {n_matchups}")

    if args.output:
        out["matchups"].write.mode("overwrite").parquet(args.output)
        print(f"matchups written to {args.output}")

    if args.show is not None:
        # console sink: tabular display with the reference's implicit
        # row cap (df.show defaults to 20)
        out["matchups"].orderBy("GameID").show(args.show)

    train, test = out["train"], out["test"]
    n_train, n_test = train.count(), test.count()
    print(f"train/test: {n_train}/{n_test}")

    summary: dict = {
        "game_team_rows": n_game_rows,
        "matchups": n_matchups,
        "train": n_train,
        "test": n_test,
        "models": {},
    }
    feats = sorted(
        c
        for c, t in out["matchups"].dtypes
        if c.startswith(("home_hist_", "away_hist_", "diff_")) and t == "double"
    )
    if n_train and n_test and "label" in train.columns:
        for kind in [m.strip() for m in args.models.split(",") if m.strip()]:
            model = train_pipeline(train, feats, kind)
            m = evaluate_binary(model.transform(test).persist())
            print(
                f"[{kind}] acc={m.accuracy:.4f} auc={m.auc:.4f} "
                f"prec={m.precision:.4f} rec={m.recall:.4f} f1={m.f1:.4f} "
                f"cm=(tp={m.tp},tn={m.tn},fp={m.fp},fn={m.fn})"
            )
            summary["models"][kind] = {
                "accuracy": m.accuracy,
                "auc": m.auc,
                "precision": m.precision,
                "recall": m.recall,
                "f1": m.f1,
            }
        base = baselines(test)
        print(
            f"[baselines] majority={base['majority']:.4f} "
            f"coin={base['coin_flip']:.4f} weighted={base['weighted_random']:.4f}"
        )
        summary["baselines"] = base
    else:
        print("skipping model training (empty split or no label)", file=sys.stderr)
    print(f"wall: {time.time() - t0:.1f}s")
    if own_session:
        spark.stop()
    return summary


if __name__ == "__main__":
    main()
