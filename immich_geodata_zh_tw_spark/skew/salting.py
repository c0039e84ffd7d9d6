"""Salted repartitioning + adaptive cell splitting for dense urban cells.

The reference is single-machine Polars, so it never faces shuffle skew; at
10^12 pages the Taipei/New Taipei cells concentrate a large share of in-bbox
points (north_star).  AQE's skew-join splitting helps joins but not groupBy
hotspots, so the engine provides:

* ``salted_repartition`` — explicit (key, salt) repartitioning for hot keys:
  hot rows spread over ``factor`` salts, cold rows keep salt 0.  For the kNN
  candidate join the *small* side is replicated per salt, so results are
  unchanged (A/B-tested in tests/test_skew.py).
* ``adaptive_cell_split`` — two-pass re-resolution: a cell histogram finds
  cells above ``threshold``; their rows are re-encoded at ``res + delta``
  (finer cells), cold rows stay coarse.  Downstream per-cell work then sees
  bounded cell populations.  The output column is a *mixed-resolution* cell
  id (grid.py ids carry their own resolution bits, so mixing is safe).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.geo import cell_expr


def salted_repartition(df: DataFrame, key_col: str, *, factor: int,
                       hot_keys: list | None = None,
                       salt_col: str = "salt") -> DataFrame:
    """Add a salt column and repartition by (key, salt).

    With ``hot_keys`` given, only those keys fan out over ``factor`` salts;
    otherwise every key is salted (uniform fan-out).  Salt is derived from a
    stable row hash — deterministic, no RNG state.
    """
    salt = F.pmod(F.xxhash64(*df.columns), F.lit(factor)).cast("int")
    if hot_keys is not None:
        salt = F.when(F.col(key_col).isin(hot_keys), salt).otherwise(F.lit(0))
    out = df.withColumn(salt_col, salt)
    return out.repartition(F.col(key_col), F.col(salt_col))


def cell_histogram(df: DataFrame, *, lat_col: str = "lat", lon_col: str = "lon",
                   res: int) -> DataFrame:
    """Pass 1: per-cell counts (the skew detector)."""
    return (df.groupBy(cell_expr(F.col(lat_col), F.col(lon_col), res).alias("cell"))
            .agg(F.count(F.lit(1)).alias("n")))


def adaptive_cell_split(df: DataFrame, *, lat_col: str = "lat",
                        lon_col: str = "lon", res: int, threshold: int,
                        delta: int = 2, out_col: str = "acell") -> DataFrame:
    """Pass 2: rows in cells above ``threshold`` get finer cell ids.

    Hot-cell list is collected to the driver (it is small by definition —
    only cells above threshold) and broadcast into an ``isin`` predicate.
    """
    hist = cell_histogram(df, lat_col=lat_col, lon_col=lon_col, res=res)
    hot = [r.cell for r in hist.filter(F.col("n") > threshold).collect()]
    coarse = cell_expr(F.col(lat_col), F.col(lon_col), res)
    fine = cell_expr(F.col(lat_col), F.col(lon_col), min(res + delta, 28))
    return df.withColumn(
        out_col, F.when(coarse.isin(hot), fine).otherwise(coarse))
