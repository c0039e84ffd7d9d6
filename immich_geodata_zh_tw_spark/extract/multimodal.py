"""Multimodal binary columns: images/audio/video as opaque ``binary`` + typed
metadata (driver mandate).

The Spark-side plumbing is real — schemas, Arrow batching, partitioning,
per-batch vectorization; the *decode* kernels are split in three tiers:

* **header parsing** (PNG/GIF/JPEG/BMP dimensions, WAV sample rate) is
  implemented for real in stdlib ``struct`` — container headers are public
  formats and need no codec;
* **real pixel/sample decode for uncompressed formats**: 24-bit BI_RGB BMP
  pixels and PCM-16 WAV samples decode with numpy alone — their feature
  vectors are *actual content statistics* (per-channel means/stds, RMS,
  zero-crossing rate…), ``real_decode = true``;
* **codec formats** (PNG/GIF/JPEG pixels) need codec libraries absent from
  this environment — those features are a clearly-marked deterministic fake
  (splitmix-hash) behind ``STUB_DECODE``, ``real_decode = false``; swap for
  PIL/ffmpeg kernels on a real cluster without touching any plan.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd

from ..synth.hashing import splitmix64

#: codec-backed formats (PNG/GIF/JPEG pixels) fall back to the fake feature;
#: BMP + WAV decode for real regardless of this flag
STUB_DECODE = True

MEDIA_SCHEMA = ("url string, media_type string, content binary")

DECODED_SCHEMA = ("url string, media_type string, format string, "
                  "width int, height int, sample_rate int, n_bytes long, "
                  "real_decode boolean, feature array<float>")

_FEATURE_DIM = 16


def parse_image_header(buf: bytes) -> tuple[str, int, int] | None:
    """(format, width, height) from PNG/GIF/JPEG headers — pure stdlib."""
    if buf[:8] == b"\x89PNG\r\n\x1a\n" and len(buf) >= 24:
        w, h = struct.unpack(">II", buf[16:24])
        return "png", w, h
    if buf[:6] in (b"GIF87a", b"GIF89a") and len(buf) >= 10:
        w, h = struct.unpack("<HH", buf[6:10])
        return "gif", w, h
    if buf[:2] == b"\xff\xd8":  # JPEG: scan segments for SOFn
        i = 2
        while i + 9 < len(buf):
            if buf[i] != 0xFF:
                return None
            marker = buf[i + 1]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = struct.unpack(">HH", buf[i + 5:i + 9])
                return "jpeg", w, h
            (seg_len,) = struct.unpack(">H", buf[i + 2:i + 4])
            i += 2 + seg_len
        return None
    return None


def parse_wav_header(buf: bytes) -> tuple[int, int] | None:
    """(sample_rate, n_data_bytes) from a RIFF/WAVE header."""
    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE" or len(buf) < 44:
        return None
    (rate,) = struct.unpack("<I", buf[24:28])
    return rate, max(len(buf) - 44, 0)


def parse_bmp_header(buf: bytes) -> tuple[str, int, int] | None:
    """(format, width, |height|) from a BMP BITMAPINFOHEADER."""
    if buf[:2] != b"BM" or len(buf) < 26:
        return None
    w, h = struct.unpack("<ii", buf[18:26])
    return "bmp", w, abs(h)


def decode_bmp_pixels(buf: bytes) -> np.ndarray | None:
    """REAL pixel decode for uncompressed 24-bit BI_RGB BMP — numpy only.

    Returns an (h, w, 3) uint8 RGB array, or None for any other BMP flavor.
    Rows are 4-byte aligned and stored bottom-up (top-down when height<0).
    """
    if buf[:2] != b"BM" or len(buf) < 54:
        return None
    (data_off,) = struct.unpack("<I", buf[10:14])
    w, h = struct.unpack("<ii", buf[18:26])
    bpp, compression = struct.unpack("<HI", buf[28:34])
    if bpp != 24 or compression != 0 or w <= 0 or h == 0:
        return None
    top_down = h < 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    if len(buf) < data_off + stride * h:
        return None
    raw = np.frombuffer(buf, dtype=np.uint8,
                        count=stride * h, offset=data_off)
    rows = raw.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return rows[..., ::-1]  # BGR → RGB


def decode_wav_samples(buf: bytes) -> tuple[int, int, np.ndarray] | None:
    """REAL sample decode for PCM-16 WAV — numpy only.

    Walks the RIFF chunk list to the ``fmt `` and ``data`` chunks; returns
    (sample_rate, n_channels, int16 samples) or None for non-PCM16.
    """
    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        return None
    rate = channels = None
    data = None
    i = 12
    while i + 8 <= len(buf):
        cid = buf[i:i + 4]
        (clen,) = struct.unpack("<I", buf[i + 4:i + 8])
        body = buf[i + 8:i + 8 + clen]
        if cid == b"fmt " and clen >= 16:
            fmt_tag, channels, rate, _, _, bits = struct.unpack("<HHIIHH",
                                                                body[:16])
            if fmt_tag != 1 or bits != 16:
                return None
        elif cid == b"data":
            data = body
        i += 8 + clen + (clen & 1)  # chunks are word-aligned
    if rate is None or data is None or not channels:
        return None
    samples = np.frombuffer(data, dtype="<i2", count=len(data) // 2)
    return int(rate), int(channels), samples


def image_feature(px: np.ndarray) -> np.ndarray:
    """Real image statistics feature: per-channel mean/std/min/max + overall
    luma stats + aspect, padded to ``_FEATURE_DIM``."""
    f = px.astype(np.float32) / 255.0
    luma = f @ np.array([0.299, 0.587, 0.114], dtype=np.float32)
    flat = f.reshape(-1, 3)
    vals = [
        *flat.mean(axis=0), *flat.std(axis=0),
        *flat.min(axis=0), *flat.max(axis=0),
        luma.mean(), luma.std(),
        float(px.shape[1]) / float(px.shape[0]), 1.0,
    ]
    out = np.zeros(_FEATURE_DIM, dtype=np.float32)
    out[:len(vals)] = np.asarray(vals, dtype=np.float32)[:_FEATURE_DIM]
    return out


def audio_feature(samples: np.ndarray, rate: int) -> np.ndarray:
    """Real audio statistics feature: mean/std/RMS/peak/zero-crossing-rate/
    duration, padded to ``_FEATURE_DIM``."""
    s = samples.astype(np.float32) / 32768.0
    if s.size == 0:
        s = np.zeros(1, dtype=np.float32)
    zcr = float(np.mean(np.abs(np.diff(np.signbit(s).astype(np.int8))))) \
        if s.size > 1 else 0.0
    vals = [s.mean(), s.std(), float(np.sqrt(np.mean(s * s))),
            float(np.abs(s).max()), zcr, s.size / float(rate), 1.0]
    out = np.zeros(_FEATURE_DIM, dtype=np.float32)
    out[:len(vals)] = np.asarray(vals, dtype=np.float32)
    return out


def _fake_feature(buf: bytes) -> np.ndarray:
    """Deterministic STUB feature vector from content bytes (splitmix of a
    cheap byte fingerprint) — stands in for a perceptual embedding."""
    if not STUB_DECODE:  # pragma: no cover - real kernel goes here
        raise NotImplementedError("real decode requires codec libraries")
    h = np.uint64(len(buf))
    for off in range(0, min(len(buf), 64), 8):
        chunk = int.from_bytes(buf[off:off + 8].ljust(8, b"\0"), "little")
        h = splitmix64(h ^ np.uint64(chunk))
    seeds = splitmix64(np.arange(_FEATURE_DIM, dtype=np.uint64) + h)
    return ((seeds >> np.uint64(11)).astype(np.float64) / float(1 << 53)).astype(np.float32)


def decode_media_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """``mapInPandas`` kernel: media rows → typed metadata + feature vector.

    BMP pixels and PCM-16 WAV samples decode for REAL (numpy; feature =
    content statistics, ``real_decode=true``); codec formats keep header
    metadata real and fall back to the declared stub feature."""
    for pdf in batches:
        out = {k: [] for k in ("url", "media_type", "format", "width", "height",
                               "sample_rate", "n_bytes", "real_decode",
                               "feature")}
        for url, mtype, content in zip(pdf["url"], pdf["media_type"], pdf["content"]):
            buf = bytes(content)
            fmt, w, h, rate = None, None, None, None
            real, feature = False, None
            if mtype == "image":
                px = decode_bmp_pixels(buf)
                if px is not None:
                    fmt, w, h = "bmp", px.shape[1], px.shape[0]
                    real, feature = True, image_feature(px)
                else:
                    parsed = parse_image_header(buf)
                    if parsed:
                        fmt, w, h = parsed
            elif mtype == "audio":
                decoded = decode_wav_samples(buf)
                if decoded is not None:
                    rate, _channels, samples = decoded
                    fmt = "wav"
                    real, feature = True, audio_feature(samples, rate)
                else:
                    parsed = parse_wav_header(buf)
                    if parsed:
                        fmt, rate = "wav", parsed[0]
            out["url"].append(url)
            out["media_type"].append(mtype)
            out["format"].append(fmt)
            out["width"].append(w)
            out["height"].append(h)
            out["sample_rate"].append(rate)
            out["n_bytes"].append(len(buf))
            out["real_decode"].append(real)
            out["feature"].append(feature if feature is not None
                                  else _fake_feature(buf))
        yield pd.DataFrame(out)


def decode_media(media_df):
    """Spark plan: media table → decoded metadata/features (column-pruned)."""
    return media_df.select("url", "media_type", "content").mapInPandas(
        decode_media_batches, schema=DECODED_SCHEMA)


# ---- deterministic synthetic media (tests/bench; no external data) ----

def make_png(width: int, height: int) -> bytes:
    """Minimal structurally-valid PNG header + IHDR (no pixel data needed for
    header parsing; content bytes only feed the stub feature hash)."""
    ihdr = struct.pack(">II", width, height) + b"\x08\x06\x00\x00\x00"
    return (b"\x89PNG\r\n\x1a\n"
            + struct.pack(">I", 13) + b"IHDR" + ihdr + b"\x00\x00\x00\x00")


def make_wav(sample_rate: int, n_samples: int, *, amplitude: int = 0,
             period: int = 32) -> bytes:
    """Structurally-valid PCM-16 mono WAV; ``amplitude > 0`` fills the data
    chunk with a real deterministic triangle wave (decodable content)."""
    if amplitude:
        t = np.arange(n_samples, dtype=np.int64) % period
        tri = np.where(t < period // 2, t, period - t) - period // 4
        samples = (tri * (4 * amplitude // period)).astype("<i2")
        data = samples.tobytes()
    else:
        data = b"\x00\x00" * n_samples
    return (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate,
                                    sample_rate * 2, 2, 16)
            + b"data" + struct.pack("<I", len(data)) + data)


def make_bmp(width: int, height: int, *, seed: int = 0) -> bytes:
    """Real uncompressed 24-bit BI_RGB BMP with a deterministic gradient
    pattern (fully decodable by :func:`decode_bmp_pixels`)."""
    stride = (width * 3 + 3) & ~3
    header = (b"BM" + struct.pack("<IHHI", 54 + stride * height, 0, 0, 54)
              + struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                            stride * height, 2835, 2835, 0, 0))
    x = np.arange(width, dtype=np.int64)
    y = np.arange(height, dtype=np.int64)[:, None]
    b = ((x + seed) * 7) % 256
    g = ((y * 13 + seed) * 3) % 256
    r = ((x + y + seed) * 5) % 256
    px = np.stack(np.broadcast_arrays(b, g, r), axis=-1).astype(np.uint8)
    rows = np.zeros((height, stride), dtype=np.uint8)
    # positive biHeight ⇒ the file stores rows bottom-up
    rows[:, : width * 3] = px[::-1].reshape(height, width * 3)
    return header + rows.tobytes()


def media_df(spark, n: int):
    """Deterministic media table: BMP images (real pixels), WAV audio (real
    samples), and PNG images (header-only; stub features) in rotation."""
    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                if i % 3 == 0:
                    rows.append((f"img://{i}", "image",
                                 make_bmp(8 + i % 16, 5 + i % 9, seed=i)))
                elif i % 3 == 1:
                    rows.append((f"aud://{i}", "audio",
                                 make_wav(8000 + (i % 5) * 8000, 100 + i % 50,
                                          amplitude=4000 + (i % 7) * 1000)))
                else:
                    rows.append((f"img://{i}", "image",
                                 make_png(16 + i % 64, 9 + i % 33)))
            yield pd.DataFrame(rows, columns=["url", "media_type", "content"])

    return spark.range(0, n).mapInPandas(gen, schema=MEDIA_SCHEMA)
