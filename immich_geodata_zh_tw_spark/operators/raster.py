"""Raster ↔ vector operators over the integer cell grid (north_rule item).

A "raster" here is the engine's native gridded form: one row per cell id at
a fixed resolution with aggregated band values — the distributed analogue of
a GeoTIFF band, keyed by the same packed int64 cells the kNN/PIP indexes
use, so raster and vector layers join directly on ``cell``.

* :func:`rasterize_points` — vector→raster: point rows → per-cell aggregated
  bands (pure Column algebra + hash agg with map-side combine; the classic
  cell histogram is the ``count`` special case);
* :func:`raster_bounds`  — raster→vector: cell id → numeric cell-boundary
  box (lat/lon min/max) in pure Column algebra (bit arithmetic mirrors
  geo/grid.py exactly; numeric, not WKT — float→string rendering differs
  between engines, numbers hash-match);
* :func:`raster_to_wkt`  — raster→vector geometry text for export/display
  (Spark-side convenience over the numeric bounds);
* :func:`zonal_stats`    — raster-style statistics per vector zone: exact
  PIP assignment (operators/pipjoin) then per-zone aggregation.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.geo import cell_expr
from ..geo.grid import _ROW_SHIFT, _ROW_MASK
from .pipjoin import pip_join


def rasterize_points(points: DataFrame, *, lat_col: str = "lat",
                     lon_col: str = "lon", res: int,
                     bands: dict[str, Column] | None = None) -> DataFrame:
    """Vector→raster: aggregate point rows into grid cells.

    ``bands`` maps output band names to aggregate Columns (default: a
    ``n_points`` count band).  One shuffle on the cell key with map-side
    partial aggregation — at 10^12 points the output is bounded by the cell
    count at ``res``, not the input size.
    """
    if bands is None:
        bands = {"n_points": F.count(F.lit(1))}
    aggs = [v.alias(k) for k, v in bands.items()]
    return (points
            .groupBy(cell_expr(F.col(lat_col), F.col(lon_col), res).alias("cell"))
            .agg(*aggs))


def _bounds_exprs(cell_col: str, res: int) -> dict[str, str]:
    """SQL text for the four cell-boundary coordinates (identical in Spark
    SQL and DuckDB; mirrors geo/grid.cell_bounds bit layout)."""
    nrows = 1 << res
    ncols = 2 << res
    row = f"((({cell_col}) >> {_ROW_SHIFT}) & {_ROW_MASK})"
    col = f"(({cell_col}) & {_ROW_MASK})"
    return {
        "lat_min": f"(CAST({row} AS DOUBLE) / {float(nrows)} * 180.0 - 90.0)",
        "lat_max": f"(CAST({row} + 1 AS DOUBLE) / {float(nrows)} * 180.0 - 90.0)",
        "lon_min": f"(CAST({col} AS DOUBLE) / {float(ncols)} * 360.0 - 180.0)",
        "lon_max": f"(CAST({col} + 1 AS DOUBLE) / {float(ncols)} * 360.0 - 180.0)",
    }


def raster_bounds(raster: DataFrame, *, cell_col: str = "cell",
                  res: int) -> DataFrame:
    """Raster→vector: attach the cell's boundary box as numeric columns."""
    out = raster
    for name, sql in _bounds_exprs(cell_col, res).items():
        out = out.withColumn(name, F.expr(sql))
    return out


def bounds_sql(cell_col: str, res: int) -> dict[str, str]:
    """The same boundary SQL text for DuckDB oracles."""
    return _bounds_exprs(cell_col, res)


def raster_to_wkt(raster: DataFrame, *, cell_col: str = "cell",
                  res: int, out_col: str = "wkt") -> DataFrame:
    """Raster→vector geometry text: each cell as a POLYGON WKT ring
    (closed, counter-clockwise).  Spark-side export convenience — numeric
    parity lives in :func:`raster_bounds`."""
    b = _bounds_exprs(cell_col, res)
    wkt = (f"concat('POLYGON((', {b['lon_min']}, ' ', {b['lat_min']}, ', ', "
           f"{b['lon_max']}, ' ', {b['lat_min']}, ', ', "
           f"{b['lon_max']}, ' ', {b['lat_max']}, ', ', "
           f"{b['lon_min']}, ' ', {b['lat_max']}, ', ', "
           f"{b['lon_min']}, ' ', {b['lat_min']}, '))')")
    return raster.withColumn(out_col, F.expr(wkt))


def zonal_stats(spark: SparkSession, points: DataFrame,
                polys_pdf: pd.DataFrame, *, zone_cols: list[str],
                bands: dict[str, Column], lat_col: str = "lat",
                lon_col: str = "lon", res: int,
                id_col: str = "poly_id") -> DataFrame:
    """Per-zone statistics of a point layer: exact PIP assignment (broadcast
    cell-prefilter + ray-cast refine) then one hash aggregation per zone."""
    assigned = pip_join(spark, points, polys_pdf, lat_col=lat_col,
                        lon_col=lon_col, id_col=id_col,
                        attr_cols=zone_cols, res=res)
    return assigned.groupBy(*zone_cols).agg(
        *[v.alias(k) for k, v in bands.items()])
