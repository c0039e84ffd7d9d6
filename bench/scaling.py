"""Two-parallelism scaling protocol (BASELINE.json north_rule evidence).

A real N→4N-executor cluster is unavailable in this sandbox, so per the driver
instructions we run the identical flagship job on the same input at two local
parallelism levels (local[N] and local[4N]) and report throughput at both plus
``eff = (pages/sec @ 4N) / (4 × pages/sec @ N)``.
"""

from __future__ import annotations

import os
import time


def _run_once(cpus: int, n_pages: int, *, warmup: bool = True) -> float:
    """Steady-state flagship wall time at ``cpus``: run the full job once to
    warm JIT/codegen/Python workers/broadcasts, drop the plan-identity cache
    (so no data is silently reused), then time a second full run — a
    1000-executor production job runs for hours, so steady-state throughput
    is the quantity the north-rule scales."""
    from immich_geodata_zh_tw_spark.session import get_spark

    from .common import flagship, materialize_pages

    spark = get_spark(app_name=f"scaling-{cpus}", parallelism=cpus,
                      shuffle_partitions=max(cpus, 8))
    try:
        pages_path = materialize_pages(spark, n_pages)
        if warmup:
            flagship(spark, pages_path).count()
            spark.catalog.clearCache()
        best = float("inf")
        for _ in range(2):  # min of 2 reps — single-machine variance is real
            t0 = time.perf_counter()
            flagship(spark, pages_path).count()
            best = min(best, time.perf_counter() - t0)
            spark.catalog.clearCache()
        return best
    finally:
        spark.stop()


def run_scaling(sf_dir: str, cpus_4n: int, *, n_pages: int | None = None,
                warmup: bool = True) -> dict:
    from immich_geodata_zh_tw_spark.session import get_spark

    if n_pages is None:
        n_pages = int(os.environ.get("SPARK_GRAFT_SCALING_PAGES", "0")) or None
    if n_pages is None:
        spark = get_spark(app_name="scaling-size", parallelism=4)
        try:
            # 80× events: large enough that fixed per-job latencies (a few
            # seconds of driver-side scheduling) stay well under 10% of wall
            n_pages = spark.read.parquet(f"{sf_dir}/events.parquet").count() * 80
        finally:
            spark.stop()

    # materialize the pages parquet ONCE at full width before either timed
    # leg — otherwise the N-leg session pays the whole 72M-page synthesis
    # on N cores (measured ~35 min at local[4]) before its first rep
    spark = get_spark(app_name="scaling-materialize", parallelism=cpus_4n)
    try:
        from .common import materialize_pages

        materialize_pages(spark, n_pages)
    finally:
        spark.stop()

    cpus_n = max(cpus_4n // 4, 1)
    results = {}
    for label, cpus in (("N", cpus_n), ("4N", cpus_4n)):
        sec = _run_once(cpus, n_pages, warmup=warmup)
        results[label] = {"cpus": cpus, "sec": round(sec, 3),
                          "pages_per_sec": round(n_pages / sec, 1)}
    eff = results["4N"]["pages_per_sec"] / (4.0 * results["N"]["pages_per_sec"])
    return {
        "metric": "scaling_efficiency_n_to_4n",
        "value": round(eff, 3),
        "unit": "ratio",
        "n_pages": n_pages,
        "runs": results,
    }
