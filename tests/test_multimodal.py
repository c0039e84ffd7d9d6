"""Multimodal binary-column kernels: headers real for all formats;
BMP/PNG/GIF/JPEG pixel, MJPEG-AVI sampled-frame, and PCM-16 WAV sample
decode REAL (content-statistics features); MP4 container metadata real;
only inter-frame-coded video remains the declared stub."""

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

    def test_bmp(self):
        assert mm.parse_bmp_header(mm.make_bmp(17, 9)) == ("bmp", 17, 9)

    def test_garbage(self):
        assert mm.parse_image_header(b"notanimage") is None
        assert mm.parse_wav_header(b"RIFFxxxx") is None
        assert mm.parse_bmp_header(b"XX") is None


class TestRealDecode:
    def test_bmp_pixels_round_trip(self):
        """decode(make_bmp) must reproduce the generator's exact pixels."""
        w, h, seed = 17, 9, 5  # odd width → row padding exercised
        px = mm.decode_bmp_pixels(mm.make_bmp(w, h, seed=seed))
        assert px is not None and px.shape == (h, w, 3)
        x = np.arange(w, dtype=np.int64)
        y = np.arange(h, dtype=np.int64)[:, None]
        want_r = np.broadcast_to(((x + y + seed) * 5) % 256, (h, w))
        want_g = np.broadcast_to(((y * 13 + seed) * 3) % 256, (h, w))
        want_b = np.broadcast_to(((x + seed) * 7) % 256, (h, w))
        assert (px[..., 0] == want_r).all()
        assert (px[..., 1] == want_g).all()
        assert (px[..., 2] == want_b).all()

    def test_png_pixels_round_trip(self):
        """decode(make_png) must reproduce the generator's exact pixels
        through zlib inflate + all five row-filter branches (the generator
        cycles None/Sub/Up/Average/Paeth per row)."""
        w, h, seed = 21, 11, 3  # ≥5 rows → every filter type exercised
        px = mm.decode_png_pixels(mm.make_png(w, h, seed=seed))
        assert px is not None and px.shape == (h, w, 3)
        x = np.arange(w, dtype=np.int64)
        y = np.arange(h, dtype=np.int64)[:, None]
        assert (px[..., 0] == np.broadcast_to(((x + seed) * 7) % 256, (h, w))).all()
        assert (px[..., 1] == np.broadcast_to(((y * 13 + seed) * 3) % 256, (h, w))).all()
        assert (px[..., 2] == np.broadcast_to(((x + y + seed) * 5) % 256, (h, w))).all()

    def test_gif_pixels_round_trip(self):
        """decode(make_gif) must reproduce the generator's exact palette
        pixels through the pure-Python LZW decoder."""
        for nc, il in [(64, False), (64, True), (256, False), (4, True)]:
            w, h, seed = 21, 11, 3
            px = mm.decode_gif_pixels(
                mm.make_gif(w, h, seed=seed, n_colors=nc, interlaced=il))
            assert px is not None and px.shape == (h, w, 3)
            bits = max((nc - 1).bit_length(), 1)
            ct = 1 << bits
            shade = (np.arange(ct, dtype=np.int64) * 255) // max(ct - 1, 1)
            pal = np.stack([shade, 255 - shade, (shade * 3) % 256],
                           axis=-1).astype(np.uint8)
            x = np.arange(w, dtype=np.int64)
            y = np.arange(h, dtype=np.int64)[:, None]
            idx = np.broadcast_to((x * 7 + y * 13 + seed * 5) % nc, (h, w))
            assert (px == pal[idx]).all(), (nc, il)

    def test_gif_malformed_falls_back(self):
        assert mm.decode_gif_pixels(b"GIF89a\x00") is None
        assert mm.decode_gif_pixels(b"notgif") is None
        # header-only GIF (no image descriptor): header parse still works
        hdr = b"GIF89a" + (320).to_bytes(2, "little") + (200).to_bytes(2, "little")
        assert mm.parse_image_header(hdr) == ("gif", 320, 200)

    def test_jpeg_pixels_round_trip(self):
        """Baseline-JPEG decode(make_jpeg) is LOSSY but must land within
        quantization error of the original, and be exact on flat images."""
        from immich_geodata_zh_tw_spark.extract import jpeg

        w, h, seed = 33, 24, 4
        buf = mm.make_jpeg_gradient(w, h, seed=seed)
        assert mm.parse_image_header(buf) == ("jpeg", w, h)
        px = jpeg.decode_jpeg_pixels(buf)
        assert px is not None and px.shape == (h, w, 3)
        x = np.arange(w, dtype=np.int64)
        y = np.arange(h, dtype=np.int64)[:, None]
        want = np.stack(np.broadcast_arrays(
            ((x + y + seed) * 5) % 256, ((y * 13 + seed) * 3) % 256,
            ((x + seed) * 7) % 256), axis=-1).astype(np.int64)
        # the modulo gradient has 255→0 wrap edges → DCT ringing; loose gate
        diff = np.abs(px.astype(np.int64) - want)
        assert diff.mean() < 16 and diff.max() < 128, (diff.mean(), diff.max())
        # tight gate on a smooth (wrap-free) image: within quantization error
        xs = np.arange(40); ys = np.arange(32)[:, None]
        smooth = np.stack(np.broadcast_arrays(
            64 + 64 * np.sin(xs / 9.0) * np.cos(ys / 7.0) + 100,
            128 + xs, 96 + ys * 2), axis=-1).astype(np.uint8)
        out = jpeg.decode_jpeg_pixels(jpeg.make_jpeg(smooth))
        sdiff = np.abs(out.astype(np.int64) - smooth.astype(np.int64))
        assert sdiff.mean() < 4 and sdiff.max() < 24, (sdiff.mean(), sdiff.max())
        flat = np.full((16, 16, 3), 100, np.uint8)
        out = jpeg.decode_jpeg_pixels(jpeg.make_jpeg(flat))
        assert (out == 100).all()

    def test_jpeg_malformed_falls_back(self):
        from immich_geodata_zh_tw_spark.extract import jpeg

        assert jpeg.decode_jpeg_pixels(b"\xff\xd8junk") is None
        assert jpeg.decode_jpeg_pixels(b"notjpeg") is None

    def test_png_header_only_falls_back(self):
        buf = mm.make_png(8, 4, pixels=False)
        assert mm.decode_png_pixels(buf) is None
        assert mm.parse_image_header(buf) == ("png", 8, 4)

    def test_mp4_box_tree_round_trip(self):
        buf = mm.make_mp4(12.5, 640, 480)
        assert mm.parse_mp4_header(buf) == (12.5, 640, 480)
        assert mm.parse_mp4_header(b"\x00\x00\x00\x08junk") is None

    def test_avi_mjpeg_frames_round_trip(self):
        """Real video-frame decode: every sampled MJPEG frame reproduces its
        generator gradient within baseline-JPEG quantization error."""
        w, h, n, seed = 24, 16, 5, 3
        buf = mm.make_avi_mjpeg(w, h, n, fps=10, seed=seed)
        assert mm.parse_avi_header(buf) == (0.5, w, h, n)
        frames = mm.decode_avi_mjpeg_frames(buf, max_frames=3)
        assert len(frames) == 3  # first / middle / last of 5
        x = np.arange(w, dtype=np.int64)
        y = np.arange(h, dtype=np.int64)[:, None]
        for px, fidx in zip(frames, (0, 2, 4)):
            s = seed + 11 * fidx
            want = np.stack(np.broadcast_arrays(
                ((x + y + s) * 5) % 256, ((y * 13 + s) * 3) % 256,
                ((x + s) * 7) % 256), axis=-1).astype(np.int64)
            assert px.shape == (h, w, 3)
            # lossy codec, high-frequency gradient: content must correlate
            err = np.abs(px.astype(np.int64) - want).mean()
            assert err < 24.0
        short = mm.make_avi_mjpeg(8, 8, 2, seed=1)
        assert len(mm.decode_avi_mjpeg_frames(short, max_frames=3)) == 2
        assert mm.parse_avi_header(b"RIFFxxxxWAVE") is None
        assert mm.decode_avi_mjpeg_frames(b"notavi") == []
        # ADVICE.md round-3: max_frames=1 on a multi-frame stream must not
        # divide by zero — it picks exactly one frame
        assert len(mm.decode_avi_mjpeg_frames(buf, max_frames=1)) == 1

    def test_wav_samples_round_trip(self):
        buf = mm.make_wav(16000, 96, amplitude=8000, period=32)
        rate, channels, samples = mm.decode_wav_samples(buf)
        assert (rate, channels) == (16000, 1)
        assert samples.shape == (96,)
        t = np.arange(96, dtype=np.int64) % 32
        tri = np.where(t < 16, t, 32 - t) - 8
        assert (samples == tri * 1000).all()

    def test_image_feature_is_real_statistics(self):
        px = mm.decode_bmp_pixels(mm.make_bmp(16, 8, seed=1))
        f = mm.image_feature(px)
        flat = px.astype(np.float32).reshape(-1, 3) / 255.0
        assert np.allclose(f[0:3], flat.mean(axis=0), atol=1e-6)
        assert np.allclose(f[3:6], flat.std(axis=0), atol=1e-6)
        assert f[14] == np.float32(16.0 / 8.0)  # aspect ratio

    def test_audio_feature_is_real_statistics(self):
        rate, _, samples = mm.decode_wav_samples(
            mm.make_wav(8000, 200, amplitude=4000))
        f = mm.audio_feature(samples, rate)
        s = samples.astype(np.float32) / 32768.0
        assert np.isclose(f[2], np.sqrt(np.mean(s * s)), atol=1e-6)  # RMS
        assert np.isclose(f[5], 200.0 / 8000.0)  # duration
        assert f[2] > 0  # non-silent waveform


class TestSparkPlumbing:
    def test_decode_media_plan(self, spark):
        decoded = mm.decode_media(mm.media_df(spark, 100)).toPandas()
        assert len(decoded) == 100
        bmps = decoded[decoded["format"] == "bmp"]
        pngs = decoded[decoded["format"] == "png"]
        gifs = decoded[decoded["format"] == "gif"]
        jpgs = decoded[decoded["format"] == "jpeg"]
        auds = decoded[decoded["media_type"] == "audio"]
        vids = decoded[decoded["media_type"] == "video"]
        assert len(bmps) == len(auds) == len(vids) == 25
        # the i%4==2 image slot cycles png/gif/png/jpeg by (i//4)%4
        assert (len(pngs), len(gifs), len(jpgs)) == (13, 6, 6)
        # real decodes flagged as such (PNG round-2, GIF+JPEG round-3)
        assert bmps["real_decode"].all()
        assert pngs["real_decode"].all()
        assert gifs["real_decode"].all()
        assert jpgs["real_decode"].all()
        assert auds["real_decode"].all()
        # video slot alternates MJPEG-AVI (real sampled frames, round 3)
        # with MP4 (container metadata only)
        avis = vids[vids["format"] == "avi"]
        mp4s = vids[vids["format"] == "mp4"]
        assert (len(avis), len(mp4s)) == (12, 13)
        assert avis["real_decode"].all()
        assert not mp4s["real_decode"].any()
        assert bmps["width"].between(8, 23).all()
        assert auds["sample_rate"].isin([8000, 16000, 24000, 32000, 40000]).all()
        assert mp4s["duration_s"].between(1.0, 30.0).all()
        assert mp4s["width"].between(320, 800).all()
        assert avis["width"].between(16, 32).all()
        assert avis["duration_s"].between(0.1, 0.6).all()
        feats = np.array(decoded["feature"].tolist())
        assert feats.shape == (100, 16)
        assert np.isfinite(feats).all()
        # real features carry content statistics, not hashes: the aspect
        # slot of every decoded image equals width/height exactly
        for sub in (bmps, pngs, gifs):
            f = np.array(sub["feature"].tolist())
            assert np.allclose(f[:, 14],
                               sub["width"].to_numpy() / sub["height"].to_numpy())

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


class TestResize:
    def test_exact_box_average_integer_factor(self):
        """4×4 → 2×2 with an integer factor is the plain mean of each
        2×2 block."""
        import numpy as np

        px = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
        th = mm.resize_pixels(px, 2, 2)
        assert th.shape == (2, 2, 3)
        for oi in range(2):
            for oj in range(2):
                block = px[2 * oi:2 * oi + 2, 2 * oj:2 * oj + 2, :]
                want = block.astype(np.float64).mean(axis=(0, 1))
                assert np.allclose(th[oi, oj], want)

    def test_fractional_factor_preserves_mass(self):
        """Non-integer ratio (5 → 2): area weights partition the source
        exactly, so the global mean is preserved (no aliasing drop-out) and
        weights rows sum to 1."""
        import numpy as np

        w = mm._overlap_weights(5, 2)
        assert np.allclose(w.sum(axis=1), 1.0)
        px = (np.arange(75, dtype=np.float64).reshape(5, 5, 3) * 3.1) % 251
        th = mm.resize_pixels(px, 2, 2)
        assert np.allclose(th.mean(axis=(0, 1)),
                           px.mean(axis=(0, 1)), atol=1e-4)

    def test_identity_and_grayscale(self):
        import numpy as np

        px = np.arange(12, dtype=np.uint8).reshape(3, 4)  # grayscale 2-D
        th = mm.resize_pixels(px, 3, 4)
        assert th.shape == (3, 4, 1)
        assert np.allclose(th[:, :, 0], px)

    def test_spark_thumbnail_plan(self, spark):
        """resize_media over the synthetic media table: every really-
        decodable row (images + MJPEG-AVI first frame) gets a thumbnail of
        exactly out_h×out_w×3 floats; undecodable rows carry null thumbs,
        and the kernel is deterministic."""
        out = mm.resize_media(mm.media_df(spark, 60), out_h=4,
                              out_w=6).toPandas().sort_values("url")
        real = out[out["real_decode"]]
        assert len(real) > 0
        assert set(real["format"]) <= {"bmp", "png", "gif", "jpeg", "avi"}
        assert all(len(t) == 4 * 6 * 3 for t in real["thumb"])
        assert (real["thumb_w"] == 6).all() and (real["thumb_h"] == 4).all()
        fake = out[~out["real_decode"]]
        assert all(t is None for t in fake["thumb"])
        again = mm.resize_media(mm.media_df(spark, 60), out_h=4,
                                out_w=6).toPandas().sort_values("url")
        for a, b in zip(out["thumb"], again["thumb"]):
            assert (a is None and b is None) or (a == b).all()
