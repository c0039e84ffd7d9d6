"""Per-stage decomposition of the flagship at pinned N vs pinned 4N.

Runs the flagship once (after a full warmup) at a pinned core count and
dumps every completed stage's name, wall duration, summed executor run
time, shuffle bytes, and input bytes from the Spark UI REST API — the
data needed to see WHICH stage loses parallel efficiency when the
pinned 4→16 flagship eff (0.605) sits far below the scan-only probe
(0.938).  Diagnostic tool, not a recorded benchmark.
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request


def run(cpus: int, n_pages: int) -> dict:
    from immich_geodata_zh_tw_spark.session import get_spark

    from .common import flagship, materialize_full, materialize_pages, pinned

    import os

    os.environ["SPARK_GRAFT_UI"] = "true"
    with pinned(cpus):
        spark = get_spark(app_name=f"decompose-{cpus}", parallelism=cpus,
                          shuffle_partitions=max(cpus, 8))
        try:
            path = materialize_pages(spark, n_pages)
            materialize_full(flagship(spark, path))  # warmup
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            materialize_full(flagship(spark, path))
            wall = time.perf_counter() - t0
            ui = spark.sparkContext.uiWebUrl
            app_id = spark.sparkContext.applicationId
            with urllib.request.urlopen(
                    f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
            ) as r:
                stages = json.load(r)
            with urllib.request.urlopen(
                    f"{ui}/api/v1/applications/{app_id}/executors") as r:
                executors = json.load(r)
        finally:
            spark.stop()
    with open(f"/tmp/stages_raw_{cpus}.json", "w") as fh:
        json.dump({"stages": stages, "executors": executors}, fh)
    rows = []
    for s in stages:
        rows.append({
            "stageId": s["stageId"],
            "name": s["name"].split("\n")[0][:70],
            "tasks": s["numCompleteTasks"],
            "executorRunTime_s": round(s["executorRunTime"] / 1e3, 1),
            "executorCpuTime_s": round(s["executorCpuTime"] / 1e9, 1),
            "jvmGcTime_s": round(s.get("jvmGcTime", 0) / 1e3, 1),
            "memorySpilled_MB": round(s.get("memoryBytesSpilled", 0) / 1e6, 1),
            "diskSpilled_MB": round(s.get("diskBytesSpilled", 0) / 1e6, 1),
            "input_MB": round(s["inputBytes"] / 1e6, 1),
            "shuffleRead_MB": round(s["shuffleReadBytes"] / 1e6, 1),
            "shuffleWrite_MB": round(s["shuffleWriteBytes"] / 1e6, 1),
            "submitted": s.get("firstTaskLaunchedTime"),
            "completed": s.get("completionTime"),
        })
    rows.sort(key=lambda r: r["stageId"])
    gc_total = round(sum(e.get("totalGCTime", 0) for e in executors) / 1e3, 1)
    return {"cpus": cpus, "wall_s": round(wall, 1),
            "executor_gc_total_s": gc_total, "stages": rows}


if __name__ == "__main__":
    cpus = int(sys.argv[1])
    n_pages = int(sys.argv[2]) if len(sys.argv) > 2 else 24_000_000
    print(json.dumps(run(cpus, n_pages), indent=1))
