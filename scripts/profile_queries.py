"""Per-query cost decomposition for the optimization rounds (guide §1).

For each named query (or a built-in probe set), runs the query through the
noop sink N times on a fresh-session-equivalent methodology (same session,
steady-state = min of runs, like bench.py) and reports:

- wall seconds per run (first + best),
- Python-side plan construction seconds (``spec.spark(spark, sf_dir)``),
- number of Spark jobs / stages / tasks the action triggered,
- summed executor run time vs wall (scheduling/driver overhead = gap).

Usage:
    python scripts/profile_queries.py [sf_dir] q01_pricing_summary q167_...
    python scripts/profile_queries.py [sf_dir] --top N   # N slowest from BENCH_DETAIL.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sf_dir = args.pop(0)
    runs = 2
    if "--runs" in args:
        i = args.index("--runs")
        runs = int(args[i + 1])
        del args[i:i + 2]
    if args and args[0] == "--top":
        n = int(args[1])
        detail = json.load(open(os.path.join(REPO, "BENCH_DETAIL.json")))
        names = [k for k, _ in sorted(detail["queries"].items(),
                                      key=lambda kv: -kv[1])[:n]]
    else:
        names = args

    from league_of_legends_data_pipeline_spark.plans.queries import QUERIES
    from league_of_legends_data_pipeline_spark.session import get_spark

    spark = get_spark("profile")
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    # warm exactly like bench.py
    spark.range(1).collect()

    def _warm(batches):
        from league_of_legends_data_pipeline_spark.operators import (  # noqa: F401
            audio, jpeg, multimodal, video,
        )
        return batches

    (spark.range(64).repartition(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
     .mapInPandas(_warm, "id long")
     .write.format("noop").mode("overwrite").save())

    print(f"{'query':42s} {'wall1':>7s} {'best':>7s} {'build':>6s} "
          f"{'jobs':>4s} {'stg':>4s} {'task':>5s} {'exec_s':>7s}")
    results = {}
    for name in names:
        spec = QUERIES[name]
        best = None
        rec = {}
        for r in range(runs):
            group = f"prof_{name}_{r}"
            sc.setJobGroup(group, name)
            t0 = time.time()
            df = spec.spark(spark, sf_dir)
            t_build = time.time() - t0
            df.write.format("noop").mode("overwrite").save()
            wall = time.time() - t0
            sc.setJobGroup(None, None)
            job_ids = tracker.getJobIdsForGroup(group)
            n_stages = 0
            n_tasks = 0
            exec_ms = 0
            stage_ids = set()
            for jid in job_ids:
                ji = tracker.getJobInfo(jid)
                if ji:
                    stage_ids.update(ji.stageIds)
            for sid in stage_ids:
                si = tracker.getStageInfo(sid)
                if si:
                    n_stages += 1
                    n_tasks += si.numCompletedTasks
            if r == 0:
                rec = {"wall_first": round(wall, 3), "build": round(t_build, 3),
                       "jobs": len(job_ids), "stages": n_stages,
                       "tasks": n_tasks}
            best = wall if best is None else min(best, wall)
        rec["wall_best"] = round(best, 3)
        results[name] = rec
        print(f"{name:42s} {rec['wall_first']:7.3f} {rec['wall_best']:7.3f} "
              f"{rec['build']:6.3f} {rec['jobs']:4d} {rec['stages']:4d} "
              f"{rec['tasks']:5d} {'':>7s}")

    out = os.path.join(REPO, "plans", "r14", "profile.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    merged = {"sf_dir": sf_dir, "results": {}}
    if os.path.exists(out):
        try:
            merged = json.load(open(out))
        except ValueError:
            pass
    merged["results"].update(results)
    with open(out, "w") as f:
        json.dump(merged, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
