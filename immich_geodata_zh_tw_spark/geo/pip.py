"""Vectorized point-in-polygon (ray casting) over WKB geometries.

Replaces the exact-refinement role shapely's STRtree + ``contains`` would play
(SURVEY.md §2.3 J9): the PIP *join* prefilters with grid-cell equi-joins, and
this kernel does the exact test inside an Arrow-batched pandas UDF.

Algorithm: standard even-odd ray casting (public domain; cf. W. Randolph
Franklin's PNPOLY), vectorized so one call tests ``n`` points against one
geometry in O(n · edges) numpy ops — no per-row Python.

Boundary semantics: points exactly on an edge are implementation-defined (as
with shapely's ``contains``); synthetic fixtures keep points off edges.
"""

from __future__ import annotations

import numpy as np

from . import wkb


class PreparedGeometry:
    """Edge arrays precomputed from WKB for repeated batch PIP tests."""

    __slots__ = ("x1", "y1", "x2", "y2", "lon_min", "lat_min", "lon_max", "lat_max")

    def __init__(self, wkb_bytes: bytes):
        rings = wkb.decode(wkb_bytes)
        xs1, ys1, xs2, ys2 = [], [], [], []
        for ring in rings:
            if len(ring) < 4:  # degenerate (needs >=3 distinct + closure)
                continue
            x, y = ring[:, 0], ring[:, 1]
            xs1.append(x[:-1]); ys1.append(y[:-1])
            xs2.append(x[1:]);  ys2.append(y[1:])
        if xs1:
            self.x1 = np.concatenate(xs1); self.y1 = np.concatenate(ys1)
            self.x2 = np.concatenate(xs2); self.y2 = np.concatenate(ys2)
        else:
            self.x1 = self.y1 = self.x2 = self.y2 = np.empty(0)
        pts = np.vstack([r for r in rings]) if rings else np.zeros((1, 2))
        self.lon_min = float(pts[:, 0].min()); self.lat_min = float(pts[:, 1].min())
        self.lon_max = float(pts[:, 0].max()); self.lat_max = float(pts[:, 1].max())

    def contains(self, lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
        """Boolean mask: which (lon, lat) points fall inside (even-odd rule)."""
        lon = np.asarray(lon, dtype=np.float64)
        lat = np.asarray(lat, dtype=np.float64)
        out = np.zeros(lon.shape, dtype=bool)
        # bbox prefilter keeps the O(n·edges) broadcast small
        cand = (
            (lon >= self.lon_min) & (lon <= self.lon_max)
            & (lat >= self.lat_min) & (lat <= self.lat_max)
        )
        if not cand.any() or self.x1.size == 0:
            return out
        px = lon[cand][:, None]
        py = lat[cand][:, None]
        y1, y2 = self.y1[None, :], self.y2[None, :]
        x1, x2 = self.x1[None, :], self.x2[None, :]
        straddle = (y1 > py) != (y2 > py)
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = x1 + (py - y1) * (x2 - x1) / (y2 - y1)
        crossings = np.sum(straddle & (px < xint), axis=1)
        out[cand] = (crossings % 2) == 1
        return out


def contains_wkb(wkb_bytes: bytes, lon, lat) -> np.ndarray:
    """One-shot convenience: PIP test without caching the prepared geometry."""
    return PreparedGeometry(wkb_bytes).contains(np.asarray(lon), np.asarray(lat))
