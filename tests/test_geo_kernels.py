"""Unit tests for the dependency-free geometry kernels (SURVEY.md §5 item 1)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from immich_geodata_zh_tw_spark.geo import distance, grid, pip, proj, wkb


class TestGrid:
    def test_roundtrip_center(self):
        lat, lon = 25.04, 121.51  # Taipei
        c = grid.cell_of(lat, lon, 13)
        clat, clon = grid.cell_center(c)
        lat_step, lon_step = grid.cell_size_deg(13)
        assert abs(clat - lat) <= lat_step / 2
        assert abs(clon - lon) <= lon_step / 2

    def test_fields(self):
        c = grid.cell_of(25.04, 121.51, 13)
        assert grid.cell_res(c) == 13
        lat_min, lat_max, lon_min, lon_max = grid.cell_bounds(c)
        assert lat_min <= 25.04 < lat_max
        assert lon_min <= 121.51 < lon_max

    def test_nan_maps_to_minus_one(self):
        out = grid.cell_of(np.array([25.0, np.nan]), np.array([121.0, 121.0]), 10)
        assert out[0] > 0 and out[1] == -1

    def test_vectorized_matches_scalar(self):
        rng = np.random.default_rng(42)
        lats = rng.uniform(-89, 89, 100)
        lons = rng.uniform(-180, 180, 100)
        vec = grid.cell_of(lats, lons, 12)
        for i in range(100):
            assert vec[i] == grid.cell_of(lats[i], lons[i], 12)

    @given(st.floats(-89.9, 89.9), st.floats(-179.9, 179.9),
           st.integers(0, grid.MAX_RES))
    @settings(max_examples=200, deadline=None)
    def test_point_always_in_own_cell_bounds(self, lat, lon, res):
        c = grid.cell_of(lat, lon, res)
        lat_min, lat_max, lon_min, lon_max = grid.cell_bounds(c)
        assert lat_min - 1e-9 <= lat <= lat_max + 1e-9
        assert lon_min - 1e-9 <= lon <= lon_max + 1e-9

    def test_k_ring_counts_and_membership(self):
        c = grid.cell_of(25.04, 121.51, 13)
        ring = grid.k_ring(np.array([c]), 1)
        assert ring.shape == (1, 9)
        assert c in ring[0]
        assert len(set(ring[0].tolist())) == 9  # no pole clamping here

    def test_k_ring_pole_clamp(self):
        c = grid.cell_of(89.99, 0.0, 4)  # top row
        ring = grid.k_ring(np.array([c]), 1)
        assert (ring[0] == -1).sum() == 3  # rows above the pole dropped

    def test_k_ring_lon_wrap(self):
        c = grid.cell_of(0.0, 179.99, 4)
        ring = grid.k_ring(np.array([c]), 1)
        valid = ring[0][ring[0] >= 0]
        cols = grid.cell_col(valid)
        assert 0 in cols  # wrapped across the antimeridian

    def test_parent(self):
        c = grid.cell_of(25.04, 121.51, 13)
        p = grid.cell_to_parent(np.array([c]), 11)[0]
        assert p == grid.cell_of(25.04, 121.51, 11)

    def test_covering_cells(self):
        cells = grid.covering_cells(21.5, 25.5, 119.5, 122.5, 8)
        # every cell center (clamped into the bbox) must encode back to itself
        lat, lon = grid.cell_center(cells)
        back = grid.cell_of(lat, lon, 8)
        assert np.array_equal(np.sort(back), np.sort(cells))
        # a point inside the bbox must land in one of the covering cells
        assert grid.cell_of(23.3, 120.7, 8) in set(cells.tolist())


class TestWkbPip:
    def _square(self, lon0, lat0, size):
        return np.array([
            [lon0, lat0], [lon0 + size, lat0],
            [lon0 + size, lat0 + size], [lon0, lat0 + size], [lon0, lat0],
        ])

    def test_wkb_roundtrip_polygon(self):
        ring = self._square(121.0, 24.0, 0.5)
        buf = wkb.encode_polygon([ring])
        rings = wkb.decode(buf)
        assert len(rings) == 1
        assert np.allclose(rings[0], ring)

    def test_wkb_roundtrip_multipolygon(self):
        p1 = [self._square(121.0, 24.0, 0.5)]
        p2 = [self._square(120.0, 22.0, 0.3)]
        buf = wkb.encode_multipolygon([p1, p2])
        rings = wkb.decode(buf)
        assert len(rings) == 2

    def test_pip_square(self):
        buf = wkb.encode_polygon([self._square(121.0, 24.0, 1.0)])
        lon = np.array([121.5, 120.9, 122.1, 121.0001])
        lat = np.array([24.5, 24.5, 24.5, 24.0001])
        assert pip.contains_wkb(buf, lon, lat).tolist() == [True, False, False, True]

    def test_pip_hole(self):
        outer = self._square(0.0, 0.0, 10.0)
        hole = self._square(4.0, 4.0, 2.0)
        buf = wkb.encode_polygon([outer, hole])
        lon = np.array([5.0, 1.0, 11.0])
        lat = np.array([5.0, 1.0, 5.0])
        # center is inside the hole → outside
        assert pip.contains_wkb(buf, lon, lat).tolist() == [False, True, False]

    def test_pip_concave(self):
        # L-shape: point in the notch must be outside
        ring = np.array([[0, 0], [4, 0], [4, 4], [2, 4], [2, 2], [0, 2], [0, 0]],
                        dtype=float)
        buf = wkb.encode_polygon([ring])
        lon = np.array([1.0, 3.0, 1.0, 3.0])
        lat = np.array([1.0, 1.0, 3.0, 3.0])
        assert pip.contains_wkb(buf, lon, lat).tolist() == [True, True, False, True]

    @given(st.floats(0.1, 9.9), st.floats(0.1, 9.9))
    @settings(max_examples=100, deadline=None)
    def test_pip_matches_box_test(self, x, y):
        buf = wkb.encode_polygon([self._square(2.0, 3.0, 5.0)])
        expected = (2.0 < x < 7.0) and (3.0 < y < 8.0)
        got = pip.contains_wkb(buf, np.array([x]), np.array([y]))[0]
        if min(abs(x - 2), abs(x - 7)) > 1e-9 and min(abs(y - 3), abs(y - 8)) > 1e-9:
            assert bool(got) == expected


class TestProjDistance:
    def test_utm_zone(self):
        assert proj.utm_zone(121.5) == 51  # Taiwan (reference japan.py:29-32)
        assert proj.utm_zone(139.7) == 54  # Tokyo
        assert proj.utm_zone(-0.1) == 30

    def test_square_centroid(self):
        ring = np.array([[121.0, 24.0], [121.2, 24.0], [121.2, 24.2],
                         [121.0, 24.2], [121.0, 24.0]])
        lat, lon = proj.polygon_centroid([ring])
        assert lat == pytest.approx(24.1, abs=1e-9)
        assert lon == pytest.approx(121.1, abs=1e-9)

    def test_centroid_of_wkb_triangle(self):
        ring = np.array([[0.0, 0.0], [3.0, 0.0], [0.0, 3.0], [0.0, 0.0]])
        lat, lon = proj.centroid_of_wkb(wkb.encode_polygon([ring]))
        assert lat == pytest.approx(1.0, abs=1e-6)
        assert lon == pytest.approx(1.0, abs=1e-6)

    def test_haversine_known(self):
        # Taipei 101 → Kaohsiung ~300 km
        d = distance.haversine_np(25.0340, 121.5645, 22.6273, 120.3014)
        assert 290 < d < 310

    def test_haversine_zero(self):
        assert distance.haversine_np(25.0, 121.0, 25.0, 121.0) == 0.0


class TestHaversineParity:
    def test_column_matches_numpy(self, spark):
        import pandas as pd

        rng = np.random.default_rng(7)
        df = pd.DataFrame({
            "lat1": rng.uniform(21, 26, 50), "lon1": rng.uniform(119, 123, 50),
            "lat2": rng.uniform(21, 26, 50), "lon2": rng.uniform(119, 123, 50),
        })
        from pyspark.sql import functions as F
        sdf = spark.createDataFrame(df).withColumn(
            "d", distance.haversine_col(F.col("lat1"), F.col("lon1"),
                                        F.col("lat2"), F.col("lon2")))
        got = np.array([r["d"] for r in sdf.select("d").collect()])
        want = distance.haversine_np(df.lat1, df.lon1, df.lat2, df.lon2)
        # collect() order matches input order for a no-shuffle plan
        assert np.allclose(np.sort(got), np.sort(want), rtol=1e-12)


class TestTransverseMercator:
    """geo/tmerc.py — exact Krüger-series TM (F16, the reference's
    TWD97/UTM reprojection without pyproj)."""

    def test_central_meridian_easting_exact(self):
        from immich_geodata_zh_tw_spark.geo import tmerc

        e, _ = tmerc.TWD97_TM2.forward(25.0, 121.0)
        assert float(e) == 250000.0  # FE exactly on the central meridian

    def test_utm_standard_vector(self):
        """Equator point 3° from the zone-31 central meridian — the classic
        published UTM value 166021.443 m."""
        from immich_geodata_zh_tw_spark.geo import tmerc

        e, n = tmerc.utm(31).forward(0.0, 0.0)
        assert abs(float(e) - 166021.443) < 0.001
        assert abs(float(n)) < 1e-6

    def test_roundtrip_nanometer_class(self):
        import numpy as np
        from immich_geodata_zh_tw_spark.geo import tmerc

        rng = np.random.default_rng(7)
        lat = rng.uniform(-80, 80, 5000)
        lon = 121.0 + rng.uniform(-8, 8, 5000)
        E, N = tmerc.TWD97_TM2.forward(lat, lon)
        lat2, lon2 = tmerc.TWD97_TM2.inverse(E, N)
        assert np.abs(lat2 - lat).max() < 1e-9
        assert np.abs(lon2 - lon).max() < 1e-9

    def test_scale_factor_at_central_meridian(self):
        """Ground distance along the CM scales by k0 = 0.9999."""
        import numpy as np
        from immich_geodata_zh_tw_spark.geo import tmerc
        from immich_geodata_zh_tw_spark.geo.distance import haversine_np

        _, n1 = tmerc.TWD97_TM2.forward(24.0, 121.0)
        _, n2 = tmerc.TWD97_TM2.forward(24.001, 121.0)
        proj_m = float(n2 - n1)
        # spherical vs ellipsoidal arc differ ~0.3%; assert k0 bracket
        arc_m = float(haversine_np(24.0, 121.0, 24.001, 121.0)) * 1000.0
        assert 0.995 < proj_m / arc_m < 1.003

    def test_twd97_centroid_close_to_local(self):
        """For admin-polygon-sized geometry the exact-TM centroid and the
        local equal-area centroid agree to sub-metre (~1e-5 deg)."""
        from immich_geodata_zh_tw_spark.geo import proj
        from immich_geodata_zh_tw_spark.synth import polygons

        polys = polygons.admin_polygons_pdf(village_grid=3)
        for buf in polys["geometry_wkb"].head(20):
            la, lo = proj.centroid_of_wkb(bytes(buf), crs="local")
            lt, ln = proj.centroid_of_wkb(bytes(buf), crs="twd97")
            assert abs(la - lt) < 2e-5 and abs(lo - ln) < 2e-5

    def test_utm_centroid_zone_dispatch(self):
        from immich_geodata_zh_tw_spark.geo import proj, wkb
        import numpy as np

        ring = np.array([[139.6, 35.4], [139.7, 35.4], [139.7, 35.5],
                         [139.6, 35.5], [139.6, 35.4]])
        buf = wkb.encode_polygon([ring])
        lat, lon = proj.centroid_of_wkb(buf, crs="utm")  # zone 54
        assert abs(lat - 35.45) < 1e-4 and abs(lon - 139.65) < 1e-4
