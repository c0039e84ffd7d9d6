"""Haversine distance — numpy kernel + Spark Column-algebra form.

The Column form (SURVEY.md §2.8 F18) stays entirely inside WholeStageCodegen —
no UDF on the kNN hot path.  Both forms share the same formula so the pytest
oracle and the Spark plan agree bit-for-bit up to libm.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0088  # IUGG mean Earth radius


def haversine_np(lat1, lon1, lat2, lon2) -> np.ndarray:
    """Great-circle distance in km, vectorized numpy (degrees in)."""
    lat1, lon1, lat2, lon2 = (np.radians(np.asarray(a, dtype=np.float64))
                              for a in (lat1, lon1, lat2, lon2))
    dlat = lat2 - lat1
    dlon = lon2 - lon1
    h = np.sin(dlat / 2.0) ** 2 + np.cos(lat1) * np.cos(lat2) * np.sin(dlon / 2.0) ** 2
    return 2.0 * EARTH_RADIUS_KM * np.arcsin(np.sqrt(np.clip(h, 0.0, 1.0)))


def haversine_col(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Same formula as pure Column algebra (JVM codegen, no Python)."""
    rlat1, rlon1 = F.radians(lat1), F.radians(lon1)
    rlat2, rlon2 = F.radians(lat2), F.radians(lon2)
    h = (
        F.pow(F.sin((rlat2 - rlat1) / 2.0), 2)
        + F.cos(rlat1) * F.cos(rlat2) * F.pow(F.sin((rlon2 - rlon1) / 2.0), 2)
    )
    return 2.0 * F.lit(EARTH_RADIUS_KM) * F.asin(F.sqrt(F.least(F.greatest(h, F.lit(0.0)), F.lit(1.0))))


def haversine_sql(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    """ANSI-SQL text of the same formula (for DuckDB oracles)."""
    return (
        f"2.0 * {EARTH_RADIUS_KM} * asin(sqrt(least(greatest("
        f"pow(sin((radians({lat2}) - radians({lat1})) / 2), 2)"
        f" + cos(radians({lat1})) * cos(radians({lat2}))"
        f" * pow(sin((radians({lon2}) - radians({lon1})) / 2), 2), 0.0), 1.0)))"
    )
