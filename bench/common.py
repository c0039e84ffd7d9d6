"""Shared bench helpers: pages materialization + flagship plan."""

from __future__ import annotations

import os

PAGES_CACHE = os.environ.get("SPARK_GRAFT_PAGES_CACHE", "/tmp/spark_graft_pages")


def materialize_full(df) -> None:
    """Force FULL evaluation via the noop sink — `.count()` is NOT a
    benchmark action: Catalyst prunes row-preserving work under it (the
    round-5 audit found 7 of 20 bench queries partially pruned, and count
    over a group-less aggregate folds to a constant so NOTHING executes).
    The noop writer consumes every output row with every column — what a
    real downstream sink does.  ONE definition shared by bench.py and the
    scaling harness so the materialization action can't drift between
    them."""
    df.write.format("noop").mode("overwrite").save()


def cpu_sys_steal_total() -> tuple[int, int, int] | None:
    """(system-ish jiffies, steal jiffies, total jiffies) from /proc/stat
    line 1 — host-wide, so it sees the sandbox's documented noise storms
    even when another process (or, for steal, a CO-TENANT VM on the
    hypervisor) causes them.  ONE definition shared by bench.py's noise
    record and the scaling legs' per-leg fracs: both emit the same
    ``host_sys_frac`` key, so they must count the same jiffy classes
    (system+irq+softirq — softirq-heavy windows are one of the documented
    storm modes) or a stormy scaling leg reads as calm."""
    try:
        with open("/proc/stat") as fh:
            vals = [int(v) for v in fh.readline().split()[1:]]
        sys_t = vals[2] + vals[5] + vals[6]  # system+irq+softirq
        steal = vals[7] if len(vals) > 7 else 0
        return sys_t, steal, sum(vals)
    except Exception:
        return None


def materialize_pages(spark, n_pages: int) -> str:
    """Write the deterministic pages table to parquet once (outside timing) —
    the timed pipeline reads parquet, matching the real Iceberg-scan workload
    rather than paying Python page *synthesis* inside the measurement."""
    path = f"{PAGES_CACHE}/pages_{n_pages}.parquet"
    # gate on the _SUCCESS marker, not the directory: a crashed write (seen
    # once — a Python worker killed mid-synthesis by host noise) leaves a
    # partial directory that a bare exists() would silently serve as the
    # whole corpus, poisoning every later measurement
    if not os.path.exists(f"{path}/_SUCCESS"):
        from immich_geodata_zh_tw_spark.synth import pages

        # fixed file count, independent of the writing session's parallelism:
        # small parquet files are one row group each (unsplittable), so a
        # low-core writer would otherwise cap every reader's scan parallelism
        n_files = max(64, n_pages // 100_000)
        (pages.pages_df(spark, n_pages, partitions=n_files)
         .write.mode("overwrite").parquet(path))
    return path


def flagship(spark, pages_path: str):
    from immich_geodata_zh_tw_spark.plans.reverse_geocode import reverse_geocode_pages
    from immich_geodata_zh_tw_spark.synth import cities, polygons

    return reverse_geocode_pages(
        spark, spark.read.parquet(pages_path),
        polygons.admin_polygons_pdf(village_grid=5),
        cities.cities_pdf(village_grid=5))


def two_level_scaling(*, cpus_4n: int, n_items: int, materialize, build_job,
                      unit: str, metric: str, warmup: bool = True,
                      extra: dict | None = None) -> dict:
    """Shared N vs 4N-cores scaling harness (the north-rule protocol).

    One copy of the protocol for every scaled job — flagship
    (``bench/scaling.py``) and dedup family (``bench/scaling_dedup.py``)
    — so protocol fixes (full-size warm-up, min-of-2 reps,
    materialize-at-4N-before-either-leg) can't drift between them.

    ``materialize(spark) -> path`` writes the corpus once at full width
    (a low-core writer would cap every reader's scan parallelism);
    ``build_job(spark, path) -> DataFrame`` declares the measured plan.
    Each leg runs in its own session: full-size warm-up (JIT/codegen/
    Python workers/broadcasts), cache drop, then min of 2 timed reps —
    steady-state throughput, the quantity a long production job sees.

    Every leg records its own host sys/steal fractions (identical runs of
    the dedup job measured 20.7 s vs 83.1 s across noise windows on this
    sandbox) — an efficiency number whose legs show unequal noise fracs
    must be re-measured, not read as a scaling property of the plan.
    """
    import time

    from immich_geodata_zh_tw_spark.session import get_spark

    cpu_ticks = cpu_sys_steal_total

    spark = get_spark(app_name="scaling-materialize", parallelism=cpus_4n)
    try:
        path = materialize(spark)
    finally:
        spark.stop()

    def run_once(cpus: int) -> tuple[float, dict]:
        spark = get_spark(app_name=f"scaling-{cpus}", parallelism=cpus,
                          shuffle_partitions=max(cpus, 8))
        t_start = cpu_ticks()
        try:
            if warmup:
                materialize_full(build_job(spark, path))
                spark.catalog.clearCache()
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                materialize_full(build_job(spark, path))
                best = min(best, time.perf_counter() - t0)
                spark.catalog.clearCache()
            t_end = cpu_ticks()
            noise = {}
            if t_start and t_end:
                dt = max(t_end[2] - t_start[2], 1)
                noise = {"host_sys_frac": round((t_end[0] - t_start[0]) / dt, 3),
                         "host_steal_frac": round((t_end[1] - t_start[1]) / dt, 3)}
            return best, noise
        finally:
            spark.stop()

    cpus_n = max(cpus_4n // 4, 1)
    results = {}
    for label, cpus in (("N", cpus_n), ("4N", cpus_4n)):
        sec, noise = run_once(cpus)
        results[label] = {"cpus": cpus, "sec": round(sec, 3),
                          f"{unit}_per_sec": round(n_items / sec, 1), **noise}
    rate = f"{unit}_per_sec"
    eff = results["4N"][rate] / (4.0 * results["N"][rate])
    out = {"metric": metric, "value": round(eff, 3), "unit": "ratio",
           f"n_{unit}": n_items, "runs": results}
    if extra:
        out.update(extra)
    return out
