"""One-off measurement for the knn_join brute-fallback payload question
(round-2 VERDICT "what's wrong" #4): does carrying the one-row __all array
through the projection cost anything when (nearly) every row settles in the
ring path?

Protocol: sf0.1-sized synthetic queries vs the cities table; compare
  A. knn_join_static   (no fallback branch at all)
  B. knn_join          (CASE fallback present, ~0 rows take it)
  C. knn_join, guard forced to 0 (every row takes the brute branch)
min-of-2 after a warm-up, same as bench.py.  Run standalone:
  python -m bench.knn_fallback_probe
"""

from __future__ import annotations

import time


def main() -> None:
    from immich_geodata_zh_tw_spark.session import get_spark
    from immich_geodata_zh_tw_spark.synth import cities, pages
    from immich_geodata_zh_tw_spark.operators import knn
    from bench.common import materialize_pages
    from immich_geodata_zh_tw_spark.extract.html_meta import extract_pages
    from pyspark.sql import functions as F

    spark = get_spark(app_name="knn-probe", parallelism=32,
                      shuffle_partitions=32)
    cities_pdf = cities.cities_pdf()
    path = materialize_pages(spark, 2_000_000)
    q = (extract_pages(spark.read.parquet(path))
         .filter(F.col("lat").isNotNull()).drop("text")
         .repartition(32))

    def timed(label, df):
        df.count()  # warm
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            df.count()
            best = min(best, time.perf_counter() - t0)
            spark.catalog.clearCache()
        print(f"{label}: {best:.3f}s")
        return best

    timed("A static (no fallback)", knn.knn_join_static(
        spark, q, cities_pdf, query_id="url",
        place_cols=["geoname_id", "name"], res=10, k=1))
    timed("B general (fallback idle)", knn.knn_join(
        spark, q, cities_pdf, query_id="url",
        place_cols=["geoname_id", "name"], res=10, k=1))
    # C: coarse ring at res 6 ⇒ guard huge; instead force misses with res 14
    # (tiny cells, most rows' nearest is outside the ring guard)
    timed("C general (fallback hot, res=14)", knn.knn_join(
        spark, q, cities_pdf, query_id="url",
        place_cols=["geoname_id", "name"], res=14, k=1))
    spark.stop()


if __name__ == "__main__":
    main()
