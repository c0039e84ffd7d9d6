"""Dependency-free geometry kernels (numpy + struct only).

The reference uses shapely/geopandas/pyproj/h3-style tooling on a single
machine; none of those libraries exist in this environment, so the kernels are
implemented from scratch on public formats/algorithms:

* ``grid``    — integer grid-cell spatial index (H3-style: cell id, k-ring,
                parent/child, covering), pure numpy, vectorizes over arrays.
* ``wkb``     — minimal OGC WKB Polygon/MultiPolygon codec (public standard).
* ``pip``     — vectorized ray-casting point-in-polygon over WKB geometries.
* ``proj``    — simple cylindrical equal-area projection + polygon centroid
                (replaces the reference's pyproj UTM/TWD97 reprojection,
                core/geodata/taiwan.py:60-68, japan.py:29-107).
* ``distance``— haversine, both numpy and Spark Column-algebra forms.
"""
