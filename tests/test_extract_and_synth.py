"""Extract stage + synthetic fixtures: determinism and the byte-identity
invariant (BASELINE.json input_hint)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from immich_geodata_zh_tw_spark.extract import html_meta
from immich_geodata_zh_tw_spark.synth import TW_BBOX, cities, pages, polygons
from immich_geodata_zh_tw_spark.geo import pip


class TestExtractor:
    def test_text_strips_tags_scripts_entities(self):
        html = (b"<html><head><script>bad()</script><style>x{}</style></head>"
                b"<body><!-- c --><h1>Hi &amp; bye</h1>  <p>a\n b</p></body></html>")
        assert html_meta.extract_text(html) == "Hi & bye a b"

    def test_geo_position(self):
        h = b'<meta name="geo.position" content="25.04;121.51">'
        assert html_meta.extract_geo(h) == (25.04, 121.51)

    def test_icbm(self):
        h = b'<meta name="ICBM" content="25.04, 121.51">'
        assert html_meta.extract_geo(h) == (25.04, 121.51)

    def test_exif(self):
        h = b'<meta name="exif.gps" content="-25.04 -121.51">'
        assert html_meta.extract_geo(h) == (-25.04, -121.51)

    def test_no_geo(self):
        assert html_meta.extract_geo(b"<html><body>hi</body></html>") is None

    def test_invalid_range_rejected(self):
        h = b'<meta name="geo.position" content="95.0;121.51">'
        assert html_meta.extract_geo(h) is None


class TestPagesSynth:
    def test_deterministic(self):
        a = pages.pages_pdf(np.arange(50))
        b = pages.pages_pdf(np.arange(50))
        pd.testing.assert_frame_equal(a, b)

    def test_byte_identity_invariant(self):
        pdf = pages.pages_pdf(np.arange(200))
        for _, row in pdf.iterrows():
            assert html_meta.extract_text(row["html"]) == row["text"]

    def test_mix_fractions(self):
        ids = np.arange(5000)
        lat, lon = pages.page_coords(ids)
        nan = np.isnan(lat)
        lat_min, lat_max, lon_min, lon_max = TW_BBOX
        inb = (~nan & (lat >= lat_min) & (lat <= lat_max)
               & (lon >= lon_min) & (lon <= lon_max))
        assert 0.20 < nan.mean() < 0.30
        assert 0.55 < inb.mean() < 0.65

    def test_skew_cluster_present(self):
        ids = np.arange(20000)
        lat, lon = pages.page_coords(ids)
        dense = ((lat >= 24.95) & (lat <= 25.10) & (lon >= 121.35) & (lon <= 121.55))
        inb = (~np.isnan(lat) & (lat >= TW_BBOX[0]) & (lat <= TW_BBOX[1])
               & (lon >= TW_BBOX[2]) & (lon <= TW_BBOX[3]))
        assert dense.sum() / inb.sum() >= 0.28

    def test_extract_roundtrip_geo(self):
        ids = np.arange(300)
        pdf = pages.pages_pdf(ids)
        lat, lon = pages.page_coords(ids)
        for j in range(len(ids)):
            got = html_meta.extract_geo(pdf["html"].iloc[j])
            if np.isnan(lat[j]):
                assert got is None
            else:
                assert got is not None
                assert abs(got[0] - lat[j]) < 1e-6
                assert abs(got[1] - lon[j]) < 1e-6

    def test_distributed_matches_driver(self, spark):
        sdf = pages.pages_df(spark, 100, partitions=7).toPandas()
        sdf = sdf.sort_values("url").reset_index(drop=True)
        want = pages.pages_pdf(np.arange(100)).sort_values("url").reset_index(drop=True)
        # timestamps: Spark returns tz-naive; compare as strings
        assert sdf["url"].tolist() == want["url"].tolist()
        assert sdf["text"].tolist() == want["text"].tolist()
        assert [bytes(b) for b in sdf["html"]] == [bytes(b) for b in want["html"]]


class TestPolygonsCities:
    def test_polygon_counts(self):
        pdf = polygons.admin_polygons_pdf(village_grid=5)
        assert pdf["county"].nunique() == 5
        assert pdf["township"].nunique() == 20
        assert len(pdf) == 20 * 25

    def test_centroids_inside_own_polygon(self):
        pdf = polygons.admin_polygons_pdf(village_grid=3)
        for _, row in pdf.iterrows():
            ok = pip.contains_wkb(row["geometry_wkb"],
                                  np.array([row["centroid_lon"]]),
                                  np.array([row["centroid_lat"]]))[0]
            # the enclave centroid may fall in the gap between its two parts
            if "001里" == row["village"][-4:] and row["township"] == "臺北01區":
                continue
            assert ok, row["village"]

    def test_polygons_tile_without_overlap(self):
        pdf = polygons.admin_polygons_pdf(village_grid=3)
        rng = np.random.default_rng(0)
        lats = rng.uniform(TW_BBOX[0] + 0.01, TW_BBOX[1] - 0.01, 200)
        lons = rng.uniform(TW_BBOX[2] + 0.01, TW_BBOX[3] - 0.01, 200)
        counts = np.zeros(200, dtype=int)
        for _, row in pdf.iterrows():
            counts += pip.contains_wkb(row["geometry_wkb"], lons, lats)
        # every probe point is in exactly one village (enclave gap: zero)
        assert counts.max() == 1
        assert (counts == 1).mean() > 0.97

    def test_cities_ids_sequential_and_sorted(self):
        c = cities.cities_pdf(village_grid=3)
        assert c["geoname_id"].tolist() == list(
            range(cities.BASE_GEONAME_ID, cities.BASE_GEONAME_ID + len(c)))
        assert c[["admin_1", "admin_2", "name"]].equals(
            c[["admin_1", "admin_2", "name"]].sort_values(
                ["admin_1", "admin_2", "name"], kind="mergesort").reset_index(drop=True))

    def test_admin1_codes_dense_rank(self):
        c = cities.cities_pdf(village_grid=3)
        codes = c.groupby("admin_1")["admin1_code"].first().sort_index()
        assert codes.tolist() == [f"TW.{i+1}" for i in range(5)]


class TestGeoOnlyKernel:
    def test_geo_only_matches_full_kernel(self, spark):
        """extract_pages(with_text=False) must agree with the full kernel on
        every (url, lat, lon) — it is the same geo scan minus the text pass."""
        from immich_geodata_zh_tw_spark.extract.html_meta import extract_pages
        from immich_geodata_zh_tw_spark.synth.pages import pages_df

        pages = pages_df(spark, 500, partitions=4)
        full = (extract_pages(pages).drop("text").toPandas()
                .sort_values("url").reset_index(drop=True))
        geo = (extract_pages(pages, with_text=False).toPandas()
               .sort_values("url").reset_index(drop=True))
        assert list(geo.columns) == ["url", "lat", "lon"]
        assert geo.equals(full)


class TestJvmGeoExtract:
    """The Column-algebra geo extract (``extract_geo_jvm``) must agree with
    the Arrow kernel row-for-row — the Python ``extract_geo`` function is
    the semantic definition, the JVM cascade the scale path."""

    def _compare(self, spark, htmls: list[bytes]):
        from immich_geodata_zh_tw_spark.extract.html_meta import (
            extract_geo, extract_pages)

        pdf = pd.DataFrame({
            "url": [f"u{i:05d}" for i in range(len(htmls))],
            "html": htmls,
        })
        df = spark.createDataFrame(pdf)
        got = (extract_pages(df, with_text=False, geo_engine="jvm")
               .toPandas().sort_values("url").reset_index(drop=True))
        want_rows = [extract_geo(h) for h in htmls]
        want = pd.DataFrame({
            "url": pdf["url"],
            "lat": [r[0] if r else np.nan for r in want_rows],
            "lon": [r[1] if r else np.nan for r in want_rows],
        })
        pd.testing.assert_frame_equal(got, want, check_exact=True)

    def test_adversarial_corpus(self, spark):
        """Deterministic adversarial sweep: style priority, bounds
        fallthrough, case folding, whitespace variants, malformed UTF-8,
        truncated tags, multiple tags, sign/decimal shapes."""
        import random

        rng = random.Random(20260819)
        tags = {
            "geo": '<meta name="geo.position" content="{a};{b}">',
            "icbm": '<meta name="ICBM" content="{a}, {b}">',
            "exif": '<meta name="exif.gps" content="{a} {b}">',
        }
        nums = ["25.04", "-90", "90", "91", "-91.5", "121.5", "-180",
                "180", "181", "-200.25", "0", "7", "25.", ".5", "+3.1",
                "1e2", "nan", "25.0000001"]
        cases: list[bytes] = []
        for style, t in tags.items():
            for a in nums:
                for b in nums[::3]:
                    cases.append(t.format(a=a, b=b).encode())
        # case folding + whitespace + attr-order variants
        cases += [
            b'<META NAME="GEO.POSITION" CONTENT="25.1;121.5">',
            b'<meta  name="geo.position"  content="25.1;121.5">',
            b'<meta\tname="ICBM"\ncontent="25.1,121.5">',
            b'<meta name="icbm" content="25.1,  121.5">',
            b'<meta name="ICBM" content="25.1,121.5">',
            b'<meta name="exif.GPS" content="25.1\t121.5">',
            b'<meta content="25.1;121.5" name="geo.position">',  # swapped
            b'<meta name="geo.position" content="25.1,121.5">',  # wrong sep
            b'<meta name="geo.position" content="25.1;121.5',    # truncated
            b'<meta name="geo.position" content=25.1;121.5>',    # unquoted
        ]
        # bounds fallthrough: out-of-range first style + valid later style
        cases += [
            (tags["geo"].format(a="95", b="121") +
             tags["icbm"].format(a="24.9", b="121.2")).encode(),
            (tags["geo"].format(a="25", b="190") +
             tags["exif"].format(a="-24", b="120")).encode(),
            (tags["icbm"].format(a="99", b="0") +
             tags["geo"].format(a="23", b="120")).encode(),  # priority wins
            (tags["exif"].format(a="1", b="2") +
             tags["geo"].format(a="3", b="4")).encode(),     # geo beats exif
            (tags["geo"].format(a="95", b="0") +
             tags["geo"].format(a="25", b="121")).encode(),  # 1st match only
        ]
        # malformed UTF-8 around and inside pages
        cases += [
            b"\xff\xfe" + tags["geo"].format(a="25.1", b="121.5").encode(),
            tags["icbm"].format(a="24", b="121").encode() + b"\x80\x80",
            b'<meta name="geo.position" content="25.1;121.5"> \xc3\x28 tail',
            b"\xe4\xb8" + b'<meta name="exif.gps" content="24 121">',
            b"no tags at all \xf0\x9f",
        ]
        # random soup with embedded tags
        for _ in range(60):
            soup = "".join(rng.choice(
                ['<div>', 'x', ' ', '"', ';', ',', '&amp;', '台北', '<meta ',
                 'name="geo.position"', 'content="25;121"'])
                for _ in range(rng.randrange(3, 25)))
            cases.append(soup.encode())
        self._compare(spark, cases)

    def test_synth_corpus_engines_agree(self, spark):
        """jvm vs arrow engines over the real synthetic generator mix."""
        from immich_geodata_zh_tw_spark.extract.html_meta import extract_pages
        from immich_geodata_zh_tw_spark.synth.pages import pages_df

        pg = pages_df(spark, 3000, partitions=8)
        jvm = (extract_pages(pg, with_text=False, geo_engine="jvm")
               .toPandas().sort_values("url").reset_index(drop=True))
        arrow = (extract_pages(pg, with_text=False, geo_engine="arrow")
                 .toPandas().sort_values("url").reset_index(drop=True))
        pd.testing.assert_frame_equal(jvm, arrow, check_exact=True)
        assert jvm["lat"].notna().sum() > 1000  # the mix really has geo rows

    def test_jvm_plan_has_no_python(self, spark):
        """The jvm-engine geo plan must contain no Python evaluation node
        (ArrowEvalPython/MapInPandas/BatchEvalPython) — the point is that
        (url, html) never crosses the IPC boundary.  The source here is a
        plain local frame: the synthetic *generator* is itself a
        mapInPandas, which would trip the assertion for the wrong node."""
        from immich_geodata_zh_tw_spark.extract.html_meta import extract_pages

        src = spark.createDataFrame(pd.DataFrame({
            "url": ["u1"], "html": [b'<meta name="ICBM" content="25,121">'],
        }))
        plan = (extract_pages(src, with_text=False, geo_engine="jvm")
                ._jdf.queryExecution().executedPlan().toString())
        assert "Python" not in plan and "Pandas" not in plan, plan
