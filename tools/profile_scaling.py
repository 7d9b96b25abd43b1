"""Profile one scaling-suite query at a given parallelism and attribute its
wall clock: executor run time, GC, shuffle write/fetch wait, spill, and the
scheduler gap (wall*slots - sum(task time)). This is the instrument behind
the eta(2->8) attribution in BENCH.md — it answers "where did the non-scaling
time go" mechanically instead of by guess.

Usage: python tools/profile_scaling.py <query> <cpus> [reps]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _api(port: int, path: str):
    with urllib.request.urlopen(f"http://localhost:{port}/api/v1/{path}") as r:
        return json.loads(r.read())


def main() -> None:
    query, cpus = sys.argv[1], int(sys.argv[2])
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    os.environ["SPARK_UI"] = "true"
    os.environ["BENCH_QUERIES"] = query
    os.environ["BENCH_REPS"] = str(reps)

    import bench
    from taxahfe_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        f"profile_{cpus}", master=f"local[{cpus}]", shuffle_partitions=64
    )
    port = int(spark.sparkContext.uiWebUrl.rsplit(":", 1)[1])
    app_id = spark.sparkContext.applicationId
    spark.range(1000000).selectExpr("sum(id)").collect()

    t0 = time.time()
    res = bench._scaling_suite(spark, sf_dir)
    wall = time.time() - t0

    stages = _api(port, f"applications/{app_id}/stages?status=complete")
    # attribution covers exactly the measured window: drop stages submitted
    # before t0 (the warm-up job) so run-time/occupancy/cpu_fraction are not
    # inflated by work outside the timed suite
    def _sub_epoch(st) -> float:
        raw = st.get("submissionTime", "")
        try:
            from datetime import datetime, timezone

            return (
                datetime.strptime(raw.replace("GMT", ""), "%Y-%m-%dT%H:%M:%S.%f")
                .replace(tzinfo=timezone.utc)
                .timestamp()
            )
        except Exception:
            return float("inf")  # unparseable -> keep (never silently drop work)

    stages = [st for st in stages if _sub_epoch(st) >= t0]
    agg = {
        "executorRunTime_s": 0.0,
        "executorCpuTime_s": 0.0,
        "jvmGcTime_s": 0.0,
        "shuffleWriteTime_s": 0.0,
        "shuffleFetchWaitTime_s": 0.0,
        "shuffleWriteBytes_mb": 0.0,
        "shuffleReadBytes_mb": 0.0,
        "memorySpilled_mb": 0.0,
        "diskSpilled_mb": 0.0,
        "inputBytes_mb": 0.0,
        "resultSerializationTime_s": 0.0,
        "deserializeTime_s": 0.0,
        "schedulerDelay_hint_s": 0.0,
        "numTasks": 0,
    }
    top = []
    for st in stages:
        rt = st.get("executorRunTime", 0) / 1e3
        agg["executorRunTime_s"] += rt
        agg["executorCpuTime_s"] += st.get("executorCpuTime", 0) / 1e9
        agg["jvmGcTime_s"] += st.get("jvmGcTime", 0) / 1e3
        agg["shuffleWriteTime_s"] += st.get("shuffleWriteTime", 0) / 1e9
        agg["shuffleFetchWaitTime_s"] += st.get("shuffleFetchWaitTime", 0) / 1e3
        agg["shuffleWriteBytes_mb"] += st.get("shuffleWriteBytes", 0) / 1e6
        agg["shuffleReadBytes_mb"] += st.get("shuffleReadBytes", 0) / 1e6
        agg["memorySpilled_mb"] += st.get("memoryBytesSpilled", 0) / 1e6
        agg["diskSpilled_mb"] += st.get("diskBytesSpilled", 0) / 1e6
        agg["inputBytes_mb"] += st.get("inputBytes", 0) / 1e6
        agg["resultSerializationTime_s"] += st.get("resultSerializationTime", 0) / 1e3
        agg["deserializeTime_s"] += st.get("executorDeserializeTime", 0) / 1e3
        agg["numTasks"] += st.get("numCompleteTasks", 0)
        top.append(
            {
                "stage": st["stageId"],
                "name": st.get("name", "")[:60],
                "tasks": st.get("numCompleteTasks", 0),
                "runTime_s": round(rt, 1),
                "gc_s": round(st.get("jvmGcTime", 0) / 1e3, 1),
                "shufWrite_s": round(st.get("shuffleWriteTime", 0) / 1e9, 1),
                "fetchWait_s": round(st.get("shuffleFetchWaitTime", 0) / 1e3, 1),
                "spillDisk_mb": round(st.get("diskBytesSpilled", 0) / 1e6, 1),
            }
        )
    top.sort(key=lambda d: -d["runTime_s"])
    for k in agg:
        agg[k] = round(agg[k], 2)
    out = {
        "query": query,
        "cpus": cpus,
        "reps": reps,
        "wall_s": round(wall, 2),
        "query_best_s": {k: v[0] for k, v in res.items()},
        "slot_seconds": round(wall * cpus, 1),
        # occupancy: fraction of available slot-time actually running tasks.
        # Low occupancy at the HIGH leg = scheduler gaps / stage barriers;
        # low occupancy at BOTH legs = driver-side time (plan, collect).
        "occupancy": round(agg["executorRunTime_s"] / (wall * cpus), 3),
        # cpu_fraction: of task run time, how much was on-CPU vs blocked
        # (shuffle I/O waits, lock contention, page faults)
        "cpu_fraction": round(
            agg["executorCpuTime_s"] / max(agg["executorRunTime_s"], 1e-9), 3
        ),
        "agg": agg,
        "top_stages": top[:8],
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
