"""Per-query job/stage/task census + steady wall (round 13, guide §1).

At sf0.1 most headline queries are OVERHEAD-dominated (2k-600k rows on
32 cores): their seconds are bought by Spark job/stage scheduling, not
data. The optimization guide's "open the UI, find the slowest stage"
step is replaced here (UI disabled) by the status tracker: run each
query through the noop sink, count the jobs/stages/tasks it launched,
and record the steady wall (min of N runs). A query whose wall tracks
its stage count is a stage-count problem (remove exchanges / fuse
jobs); one whose wall tracks task time is a compute problem.

    python scripts/stage_census.py [-n RUNS] [query ...]

Defaults: bench.py HEADLINE list, 3 runs. Output: one JSON line per
query to stdout, human summary to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    args = sys.argv[1:]
    n_runs = 3
    if args and args[0] == "-n":
        n_runs = int(args[1])
        args = args[2:]
    from bench import HEADLINE
    from bigdatafinalproject_hockey_spark.queries import QUERIES
    from bigdatafinalproject_hockey_spark.session import get_session

    names = args or list(HEADLINE)
    spark = get_session(app_name="stage_census")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    # Warm the exact classes (bench protocol) once at tiny scale.
    for name in names:
        try:
            QUERIES[name](spark, "/root/testdata/sf0.001").write.format(
                "noop"
            ).mode("overwrite").save()
        except Exception:
            pass
    spark.catalog.clearCache()

    tracker = sc.statusTracker()
    out = {}
    for name in names:
        walls = []
        jobs = stages = tasks = 0
        group = f"census:{name}"
        try:
            for i in range(n_runs):
                sc.setJobGroup(group + str(i), name)
                t0 = time.perf_counter()
                QUERIES[name](spark, SF_DIR).write.format("noop").mode(
                    "overwrite"
                ).save()
                walls.append(time.perf_counter() - t0)
                sc.setJobGroup("idle", "idle")
                spark.catalog.clearCache()
                if i == n_runs - 1:  # census the LAST (deep-warm) run
                    ids = tracker.getJobIdsForGroup(group + str(i))
                    jobs = len(ids)
                    st_ids = set()
                    for j in ids:
                        info = tracker.getJobInfo(j)
                        if info:
                            st_ids.update(info.stageIds)
                    stages = len(st_ids)
                    for s in st_ids:
                        sinfo = tracker.getStageInfo(s)
                        if sinfo:
                            tasks += sinfo.numTasks
        except Exception as exc:  # noqa: BLE001
            out[name] = {"error": f"{type(exc).__name__}: {exc}"[:160]}
            print(f"{name}: ERROR {out[name]['error']}", file=sys.stderr)
            continue
        out[name] = {
            "steady_sec": round(min(walls), 3),
            "runs": [round(w, 3) for w in walls],
            "jobs": jobs,
            "stages": stages,
            "tasks": tasks,
        }
        print(
            f"{name}: {min(walls):.3f}s  jobs={jobs} stages={stages} "
            f"tasks={tasks}",
            file=sys.stderr,
        )
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
