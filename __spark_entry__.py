"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship reverse-geocode plan; ``queries()`` /
``oracle_sql()`` cover the operator inventory (SURVEY.md §2) over the
driver-provided tables at ``sf_dir``, each Spark plan paired with an ANSI-SQL
oracle that DuckDB executes on the same parquet.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: reverse-geocode a deterministic synthetic pages table.

    Sized from the sf0.001 events table (driver contract: load sf0.001
    parquet); pages/polygons/cities are deterministic synthetic fixtures —
    the reference's NLSC/GeoNames inputs are not redistributable
    (FIXTURES.md §1/§6).
    """
    from immich_geodata_zh_tw_spark.plans.reverse_geocode import reverse_geocode_pages
    from immich_geodata_zh_tw_spark.session import _ship_package
    from immich_geodata_zh_tw_spark.synth import cities, pages, polygons

    _ship_package(spark)  # driver-owned sessions: make executors able to import us
    n_events = spark.read.parquet(f"{SF0001}/events.parquet").count()
    pages_sdf = pages.pages_df(spark, max(n_events * 2, 1000))
    return reverse_geocode_pages(
        spark, pages_sdf,
        polygons.admin_polygons_pdf(village_grid=5),
        cities.cities_pdf(village_grid=5),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from immich_geodata_zh_tw_spark.plans import driver_queries
    from immich_geodata_zh_tw_spark.session import _ship_package

    def _wrap(fn):
        def run(spark, sf_dir):
            _ship_package(spark)
            return fn(spark, sf_dir)
        return run

    return {name: _wrap(fn) for name, fn in driver_queries.queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query key."""
    from immich_geodata_zh_tw_spark.plans import driver_queries

    return driver_queries.oracle_sql()
