"""Pinned-width flagship A/B + saturation sweep (diagnostic).

Usage: ``python -m bench.pinned_ab <n_pages> <cpus[:engine]> ...``

Each cell = fresh pinned session, full warmup, min-of-2 noop-measured
reps of the flagship at that width/engine.  Emits one JSON object.
Feeds the BENCH/BASELINE.md pinned-scaling analysis: per-core
throughput vs pinned width is the single-box saturation curve, and the
arrow-vs-jvm columns show whether halving processes-per-core (the
zero-Python extract twin) pays once cores are scarce.
"""

from __future__ import annotations

import json
import os
import sys
import time


def run_cell(cpus: int, engine: str, n_pages: int) -> dict:
    from immich_geodata_zh_tw_spark.plans.reverse_geocode import (
        reverse_geocode_pages)
    from immich_geodata_zh_tw_spark.synth import cities, polygons

    from .common import (cpu_sys_steal_total, materialize_full,
                         materialize_pages, pinned)

    polys_pdf = polygons.admin_polygons_pdf(village_grid=5)
    cities_pdf = cities.cities_pdf(village_grid=5)

    def job(spark, path):
        return reverse_geocode_pages(
            spark, spark.read.parquet(path), polys_pdf, cities_pdf,
            geo_engine=engine)

    from immich_geodata_zh_tw_spark.session import get_spark

    with pinned(cpus):
        spark = get_spark(app_name=f"ab-{cpus}-{engine}", parallelism=cpus,
                          shuffle_partitions=max(cpus, 8))
        t0 = cpu_sys_steal_total()
        try:
            path = materialize_pages(spark, n_pages)
            materialize_full(job(spark, path))  # warmup
            spark.catalog.clearCache()
            best = float("inf")
            for _ in range(2):
                t = time.perf_counter()
                materialize_full(job(spark, path))
                best = min(best, time.perf_counter() - t)
                spark.catalog.clearCache()
        finally:
            spark.stop()
        t1 = cpu_sys_steal_total()
    out = {"cpus": cpus, "engine": engine, "sec": round(best, 3),
           "pages_per_sec": round(n_pages / best, 1),
           "per_core": round(n_pages / best / cpus, 1)}
    if t0 and t1:
        dt = max(t1[2] - t0[2], 1)
        out["host_sys_frac"] = round((t1[0] - t0[0]) / dt, 3)
        # host width from the host, not a literal: a 64-core box would
        # otherwise under-report leaked pins 2x (common.py does the same)
        out["host_busy_cores"] = round(
            (t1[3] - t0[3]) / dt * (os.cpu_count() or 1), 2)
    return out


if __name__ == "__main__":
    n_pages = int(sys.argv[1])
    cells = []
    for spec in sys.argv[2:]:
        cpus, _, engine = spec.partition(":")
        cells.append(run_cell(int(cpus), engine or "arrow", n_pages))
        print(json.dumps(cells[-1]), file=sys.stderr, flush=True)
    print(json.dumps({"metric": "pinned_flagship_ab", "n_pages": n_pages,
                      "cells": cells}))
