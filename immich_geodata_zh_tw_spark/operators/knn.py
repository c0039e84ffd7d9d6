"""Nearest-neighbor (k=1) naming join — the Immich runtime semantic.

Reference semantic: a photo's (lat, lon) is matched to the nearest cities500
point (reference README.md:103; the reference *constructs* that point table,
one row per village centroid, so k=1 lands on the right village).  At 10^12
pages a cross join is impossible; the scalable plan is:

1. encode each query point's grid cell in pure Column algebra (no UDF);
2. explode the **small** places table by the k-ring of each place's cell
   (driver-side numpy — the places table is broadcast-sized by construction,
   ~10^4 rows; the 10^12-row side is never exploded and never shuffled);
3. broadcast equi-join on the query's own cell → candidate pairs;
4. pick the true nearest per query with ``min(struct(dist, tiebreak, ...))``
   — a hash aggregation with map-side partial combine (deliberately NOT a
   window: ``row_number() over (partitionBy=query)`` would shuffle every
   candidate row and sort; min-of-struct ships one partial row per query per
   task);
5. **exactness guard**: a candidate found inside ring k is provably the global
   nearest only if its distance is ≤ the minimum possible distance to any
   cell outside the ring.  Rows failing the guard (and rows with no candidate
   at all) escalate to a larger k; the final remainder falls back to a
   brute-force broadcast cross join — exact by definition, and by then the
   remainder is a vanishing fraction (isolated points only).

The escalation loop is driver-side control flow over shrinking DataFrames —
bounded iterations, each a broadcast join (no big-side shuffle).
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..functions.geo import cell_expr, haversine_col
from ..geo import grid

_DEG_KM = math.pi / 180.0 * 6371.0088  # km per degree of great-circle arc


def explode_places_by_kring(spark: SparkSession, places_pdf, *,
                            lat_col: str, lon_col: str,
                            res: int, k: int) -> DataFrame:
    """Small-side prep: one row per (place, covered cell), as a Spark DF.

    ``places_pdf`` is a pandas DataFrame (broadcast-scale by contract).
    """
    cells = grid.cell_of(places_pdf[lat_col].to_numpy(),
                         places_pdf[lon_col].to_numpy(), res)
    rings = grid.k_ring(cells, k)  # (n, (2k+1)^2)
    n, m = rings.shape
    idx = np.repeat(np.arange(n), m)
    flat = rings.ravel()
    keep = flat >= 0
    out = places_pdf.iloc[idx[keep]].reset_index(drop=True)
    out["cell"] = flat[keep]
    return spark.createDataFrame(out)


def min_cell_km(res: int, max_abs_lat: float) -> float:
    """Smallest ground extent of one cell step at ``res`` within ±max_abs_lat."""
    lat_step, lon_step = grid.cell_size_deg(res)
    return min(lat_step, lon_step * math.cos(math.radians(max_abs_lat))) * _DEG_KM


def knn_join_static(spark: SparkSession, queries: DataFrame, places_pdf, *,
                    query_id: str, lat_col: str = "lat", lon_col: str = "lon",
                    place_lat: str = "latitude", place_lon: str = "longitude",
                    place_cols: list[str] | None = None,
                    res: int = grid.DEFAULT_RES, k: int = 1) -> DataFrame:
    """Single-pass exact kNN as a *pure narrow plan* — zero shuffle.

    Valid when the caller can guarantee every query's true nearest place lies
    within the k-ring (e.g. a tiling-derived point set whose worst-case
    nearest-centroid distance is below ``k * min_cell_km(res, lat)`` — the
    flagship's village table satisfies this at res 10/k 1).  Queries with no
    candidate in the ring are dropped; use :func:`knn_join` when coverage is
    unknown.

    Plan shape: the small side is pre-grouped per covering cell into an
    ``array<struct(lat, lon, payload…)>`` and broadcast; each query row joins
    its own cell's candidate array (1 row in → 1 row out — NO explode) and
    picks the nearest with ``array_min(transform(...))`` in whole-stage
    codegen.  A query-id-unique groupBy would shuffle every candidate row for
    no reduction (ids are unique) — measured as the dominant non-scaling cost
    at 10^7-row scale; this plan removes that shuffle entirely and is
    streaming/foreachBatch-safe.
    """
    if place_cols is None:
        place_cols = [c for c in places_pdf.columns if c not in (place_lat, place_lon)]
    tiebreak = place_cols[0]

    exploded = explode_places_by_kring(
        spark, places_pdf, lat_col=place_lat, lon_col=place_lon, res=res, k=k)
    grouped = exploded.groupBy("cell").agg(
        F.collect_list(F.struct(
            F.col(place_lat).alias("plat"), F.col(place_lon).alias("plon"),
            F.col(tiebreak).alias("tb"),
            *[F.col(c).alias(c) for c in place_cols if c != tiebreak],
        )).alias("__places"))

    q = queries.withColumn("__cell", cell_expr(F.col(lat_col), F.col(lon_col), res))
    joined = q.join(F.broadcast(grouped), q["__cell"] == grouped["cell"], "inner")

    dist_sql = haversine_sql_cols(lat_col, lon_col, "p.plat", "p.plon")
    payload = ", ".join(["p.tb AS tb",
                         *[f"p.{c} AS {c}" for c in place_cols if c != tiebreak]])
    best = F.expr(
        f"array_min(transform(__places, p -> struct({dist_sql} AS d, {payload})))")
    out = joined.withColumn("__best", best)
    return out.select(
        *[c for c in queries.columns],
        F.col("__best.tb").alias(tiebreak),
        *[F.col(f"__best.{c}").alias(c) for c in place_cols if c != tiebreak],
        F.col("__best.d").alias("knn_dist_km"),
    )


def haversine_sql_cols(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    """Spark-SQL haversine text (same formula as geo/distance.py)."""
    from ..geo.distance import haversine_sql

    return haversine_sql(lat1, lon1, lat2, lon2)


def knn_join(spark: SparkSession, queries: DataFrame, places_pdf, *,
             query_id: str, lat_col: str = "lat", lon_col: str = "lon",
             place_lat: str = "latitude", place_lon: str = "longitude",
             place_cols: list[str] | None = None,
             res: int = grid.DEFAULT_RES,
             k_schedule: tuple[int, ...] = (1, 4, 16),
             max_abs_lat: float = 60.0, persist: bool = True) -> DataFrame:
    """Exact nearest-place join: one output row per query row.

    Output = all ``queries`` columns + ``place_cols`` + ``knn_dist_km``.
    Ties broken by the first column of ``place_cols`` (ascending) — callers
    should pass a unique key first (e.g. geoname_id), mirroring the
    deterministic tie rule used throughout the reference (min geoname_id,
    enhance_data.py:279-290).
    """
    if place_cols is None:
        place_cols = [c for c in places_pdf.columns if c not in (place_lat, place_lon)]
    tiebreak = place_cols[0]

    q = queries.withColumn("__cell", cell_expr(F.col(lat_col), F.col(lon_col), res))
    if persist:
        # the query side is typically post-extract / post-filter (a small
        # fraction of the 100 TB scan) — persist it so each escalation round
        # reuses it instead of re-running the upstream pipeline
        q = q.persist(StorageLevel.MEMORY_AND_DISK)
    remaining = q
    results: list[DataFrame] = []
    query_cols = [c for c in queries.columns]

    dist_sql = _haversine_places_sql(lat_col, lon_col)
    payload = ", ".join(["p.tb AS tb",
                         *[f"p.{c} AS {c}" for c in place_cols if c != tiebreak]])
    best_expr = F.expr(
        f"array_min(transform(__places, p -> struct({dist_sql} AS d, {payload})))")

    def _grouped(df_places: DataFrame) -> DataFrame:
        """cell → array<struct(plat, plon, payload…)> (small side, broadcast)."""
        return df_places.groupBy("cell").agg(
            F.collect_list(F.struct(
                F.col(place_lat).alias("plat"), F.col(place_lon).alias("plon"),
                F.col(tiebreak).alias("tb"),
                *[F.col(c).alias(c) for c in place_cols if c != tiebreak],
            )).alias("__places"))

    def _best(joined: DataFrame) -> DataFrame:
        """Per-row nearest via array_min(transform(...)) — zero shuffle."""
        out = joined.withColumn("__best", best_expr)
        return out.select(
            *query_cols, F.col("__cell"),
            F.col("__best.tb").alias(tiebreak),
            *[F.col(f"__best.{c}").alias(c) for c in place_cols if c != tiebreak],
            F.col("__best.d").alias("knn_dist_km"))

    for k in k_schedule:
        grouped = _grouped(explode_places_by_kring(
            spark, places_pdf, lat_col=place_lat, lon_col=place_lon, res=res, k=k))
        joined = remaining.join(F.broadcast(grouped),
                                remaining["__cell"] == grouped["cell"], "inner")
        best = _best(joined)
        # exactness guard: nearest-in-ring is global nearest iff closer than
        # any point outside the k-ring could possibly be
        guard_km = k * min_cell_km(res, max_abs_lat)
        exact = best.filter(F.col("knn_dist_km") <= F.lit(guard_km))
        if persist:
            # materialized lazily by the next take(1) on remaining
            exact = exact.persist(StorageLevel.MEMORY_AND_DISK)
        results.append(exact)
        remaining = remaining.join(exact.select(query_id), query_id, "left_anti")
        if not remaining.take(1):
            remaining = None
            break

    if remaining is not None:
        # brute force on the (tiny) remainder — all places as one array
        all_places = spark.createDataFrame(places_pdf).withColumn(
            "cell", F.lit(0)).transform(_grouped).drop("cell")
        joined = remaining.crossJoin(F.broadcast(all_places))
        results.append(_best(joined))

    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    return out.drop("__cell")


def _haversine_places_sql(lat_col: str, lon_col: str) -> str:
    from ..geo.distance import haversine_sql

    return haversine_sql(lat_col, lon_col, "p.plat", "p.plon")
