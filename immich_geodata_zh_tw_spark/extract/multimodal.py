"""Multimodal binary columns: images/audio/video as opaque ``binary`` + typed
metadata (driver mandate).

The Spark-side plumbing is real — schemas, Arrow batching, partitioning,
per-batch vectorization; the *decode* kernels are split in two tiers:

* **header parsing** (PNG/GIF/JPEG dimensions, WAV sample rate/duration) is
  implemented for real in stdlib ``struct`` — container headers are public
  formats and need no codec;
* **pixel/sample decode** (resize, frame sampling, perceptual features) needs
  codec libraries absent from this environment — those steps are stubbed with
  a clearly-marked deterministic fake (splitmix-hash features) behind
  ``STUB_DECODE`` so the batch shapes, UDF signatures and downstream joins
  are fully exercised; swap the fake for PIL/ffmpeg kernels on a real
  cluster without touching any plan.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd

from ..synth.hashing import splitmix64

#: replace with a real codec-backed implementation on clusters that have one
STUB_DECODE = True

MEDIA_SCHEMA = ("url string, media_type string, content binary")

DECODED_SCHEMA = ("url string, media_type string, format string, "
                  "width int, height int, sample_rate int, n_bytes long, "
                  "feature array<float>")

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
    """``mapInPandas`` kernel: media rows → typed metadata + feature vector."""
    for pdf in batches:
        out = {k: [] for k in ("url", "media_type", "format", "width", "height",
                               "sample_rate", "n_bytes", "feature")}
        for url, mtype, content in zip(pdf["url"], pdf["media_type"], pdf["content"]):
            buf = bytes(content)
            fmt, w, h, rate = None, None, None, None
            if mtype == "image":
                parsed = parse_image_header(buf)
                if parsed:
                    fmt, w, h = parsed
            elif mtype == "audio":
                parsed = parse_wav_header(buf)
                if parsed:
                    fmt = "wav"
                    rate = parsed[0]
            out["url"].append(url)
            out["media_type"].append(mtype)
            out["format"].append(fmt)
            out["width"].append(w)
            out["height"].append(h)
            out["sample_rate"].append(rate)
            out["n_bytes"].append(len(buf))
            out["feature"].append(_fake_feature(buf))
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


def make_wav(sample_rate: int, n_samples: int) -> bytes:
    data = b"\x00\x00" * n_samples
    return (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate,
                                    sample_rate * 2, 2, 16)
            + b"data" + struct.pack("<I", len(data)) + data)


def media_df(spark, n: int):
    """Deterministic media table: alternating PNG images and WAV audio."""
    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                if i % 2 == 0:
                    rows.append((f"img://{i}", "image",
                                 make_png(16 + i % 64, 9 + i % 33)))
                else:
                    rows.append((f"aud://{i}", "audio",
                                 make_wav(8000 + (i % 5) * 8000, 100 + i % 50)))
            yield pd.DataFrame(rows, columns=["url", "media_type", "content"])

    return spark.range(0, n).mapInPandas(gen, schema=MEDIA_SCHEMA)
