"""Shared bench helpers: pages materialization + flagship plan."""

from __future__ import annotations

import os

PAGES_CACHE = os.environ.get("SPARK_GRAFT_PAGES_CACHE", "/tmp/spark_graft_pages")


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
