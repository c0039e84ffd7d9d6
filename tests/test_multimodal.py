"""Multimodal binary-column plumbing: header parsing real, decode stubbed."""

from __future__ import annotations

import numpy as np

from immich_geodata_zh_tw_spark.extract import multimodal as mm


class TestHeaderParsing:
    def test_png(self):
        assert mm.parse_image_header(mm.make_png(640, 480)) == ("png", 640, 480)

    def test_gif(self):
        buf = b"GIF89a" + (320).to_bytes(2, "little") + (200).to_bytes(2, "little")
        assert mm.parse_image_header(buf) == ("gif", 320, 200)

    def test_jpeg_sof(self):
        import struct
        jpeg = (b"\xff\xd8"
                + b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
                + b"\xff\xc0" + struct.pack(">H", 17) + b"\x08"
                + struct.pack(">HH", 480, 640) + b"\x03" + b"\x00" * 9)
        assert mm.parse_image_header(jpeg) == ("jpeg", 640, 480)

    def test_wav(self):
        rate, nbytes = mm.parse_wav_header(mm.make_wav(16000, 100))
        assert rate == 16000 and nbytes == 200

    def test_garbage(self):
        assert mm.parse_image_header(b"notanimage") is None
        assert mm.parse_wav_header(b"RIFFxxxx") is None


class TestSparkPlumbing:
    def test_decode_media_plan(self, spark):
        decoded = mm.decode_media(mm.media_df(spark, 100)).toPandas()
        assert len(decoded) == 100
        imgs = decoded[decoded["media_type"] == "image"]
        auds = decoded[decoded["media_type"] == "audio"]
        assert (imgs["format"] == "png").all()
        assert imgs["width"].between(16, 79).all()
        assert (auds["format"] == "wav").all()
        assert auds["sample_rate"].isin([8000, 16000, 24000, 32000, 40000]).all()
        # stub features: deterministic, fixed dim, valid floats
        feats = np.array(decoded["feature"].tolist())
        assert feats.shape == (100, 16)
        assert np.isfinite(feats).all()

    def test_features_deterministic(self, spark):
        a = mm.decode_media(mm.media_df(spark, 20)).toPandas().sort_values("url")
        b = mm.decode_media(mm.media_df(spark, 20)).toPandas().sort_values("url")
        assert [list(x) for x in a["feature"]] == [list(x) for x in b["feature"]]

    def test_feature_join_downstream(self, spark):
        """Features flow into the similarity operator (the real purpose)."""
        from immich_geodata_zh_tw_spark.operators import similarity
        from pyspark.sql import functions as F

        decoded = mm.decode_media(mm.media_df(spark, 60)).filter(
            F.col("media_type") == "image")
        corpus = decoded.select(F.col("url").alias("vec_id"),
                                F.col("feature").alias("embedding"))
        queries = corpus.limit(5).select(F.col("vec_id").alias("q_id"),
                                         F.col("embedding").alias("q_vec"))
        out = similarity.brute_force_topk(corpus, queries, k=1).toPandas()
        assert len(out) == 5
        assert (out["cos_sim"] <= 1.000001).all()
