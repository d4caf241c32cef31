#!/usr/bin/env python
"""Round-15 per-query profiler: plan capture + job/stage accounting.

For each headline query (or the names given on argv):
  - writes ``plans/r16/<name>_<tag>.txt`` with .explain("formatted"),
  - runs the noop sink N times under a job group,
  - records wall per run, job count, and per-stage task-time sums
    (run/cpu/gc/shuffle bytes) from the UI REST API.

Usage: python tools/profile_r16.py [--tag before] [name ...]
Output: tools/out/profile_r16_<tag>.json
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from pufs_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N = int(os.environ.get("PUFS_PROFILE_N", "3"))


def rest(app_path: str):
    url = f"http://127.0.0.1:4040/api/v1/applications{app_path}"
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.load(r)


def main() -> None:
    args = sys.argv[1:]
    tag = "before"
    if args and args[0] == "--tag":
        tag = args[1]
        args = args[2:]
    import bench

    names = args or bench.HEADLINE
    input_bytes = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(SF_DIR)
        for f in fs
    )
    spark = get_spark(
        app_name="pufs_profile_r16",
        input_bytes=input_bytes,
        extra_conf={"spark.ui.enabled": "true"},
    )
    sc = spark.sparkContext
    app_id = sc.applicationId
    qs = entrymod.queries()
    # bench-identical warm-up
    bench.force(qs["Q6_forecast_revenue"](spark, SF_DIR))
    for memo in ("_fs_nodes", "_fs_regions"):
        getattr(entrymod, memo)(spark, SF_DIR).count()

    plans_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r16",
    )
    os.makedirs(plans_dir, exist_ok=True)

    out: dict[str, dict] = {}
    for name in names:
        df = qs[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(plans_dir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(plan)
        walls = []
        builds = []
        jobs_per_run = []
        for i in range(N):
            group = f"{name}_run{i}"
            sc.setJobGroup(group, name)
            t0 = time.monotonic()
            qdf = qs[name](spark, SF_DIR)
            builds.append(round(time.monotonic() - t0, 3))
            bench.force(qdf)
            walls.append(round(time.monotonic() - t0, 3))
            sc.setJobGroup(f"idle_{name}", "idle")
            jobs_per_run.append(
                len(sc.statusTracker().getJobIdsForGroup(group))
            )
        # stage accounting for the LAST run's job group
        stages = []
        try:
            for j in rest(f"/{app_id}/jobs"):
                if j.get("jobGroup") != f"{name}_run{N-1}":
                    continue
                for sid in j.get("stageIds", []):
                    for s in rest(f"/{app_id}/stages/{sid}"):
                        stages.append(
                            {
                                "stage": sid,
                                "name": s.get("name", "")[:80],
                                "tasks": s.get("numCompleteTasks"),
                                "run_s": round(
                                    s.get("executorRunTime", 0) / 1e3, 2
                                ),
                                "cpu_s": round(
                                    s.get("executorCpuTime", 0) / 1e9, 2
                                ),
                                "shuffle_read_mb": round(
                                    s.get("shuffleReadBytes", 0) / 1e6, 2
                                ),
                                "shuffle_write_mb": round(
                                    s.get("shuffleWriteBytes", 0) / 1e6, 2
                                ),
                                "input_mb": round(
                                    s.get("inputBytes", 0) / 1e6, 2
                                ),
                            }
                        )
        except Exception as exc:  # noqa: BLE001
            stages = [{"err": str(exc)[:200]}]
        nplan = {
            "exchanges": plan.count("Exchange"),
            "python_nodes": sum(
                plan.count(t)
                for t in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas")
            ),
            "smj": plan.count("SortMergeJoin"),
            "bhj": plan.count("BroadcastHashJoin"),
        }
        out[name] = {
            "walls": walls,
            "builds": builds,
            "min": min(walls),
            "jobs_per_run": jobs_per_run,
            "plan": nplan,
            "stages_last_run": sorted(
                [s for s in stages if "run_s" in s],
                key=lambda s: -s["run_s"],
            )[:8],
        }
        print(
            f"{name:28s} min {min(walls):7.3f}  walls {walls} "
            f"builds {builds} jobs {jobs_per_run}  plan {nplan}",
            flush=True,
        )
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "out",
        f"profile_r16_{tag}.json",
    )
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
