"""Baseline JPEG (ITU-T.81 sequential DCT, 8-bit) encode/decode in stdlib +
numpy — no codec library (round 3: closes the last leg of the multimodal
codec stub; ref parity: the reference pipeline never decodes media at all,
this is driver-mandate scope).

Decoder scope: baseline sequential, 8-bit precision, 1 or 3 components with
NO chroma subsampling (all sampling factors 1×1 — what :func:`make_jpeg`
emits), arbitrary DQT/DHT tables read from the stream (so files from other
encoders decode too, as long as they are 4:4:4 baseline), no restart
intervals.  Anything else → ``None`` (caller falls back to header-only
metadata).

Encoder: 4:4:4, Annex-K quantization tables, simple fixed-length canonical
Huffman tables written into DHT (any prefix-free table is valid JPEG — the
decoder reads tables from the stream, so nothing depends on the "standard"
Annex-K Huffman tables).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# shared tables
# ---------------------------------------------------------------------------


def _zigzag() -> np.ndarray:
    """Raster index visited at each zigzag-scan position (spec fig. 5)."""
    order, r, c = [], 0, 0
    for _ in range(64):
        order.append(r * 8 + c)
        if (r + c) % 2 == 0:  # moving up-right
            if c == 7:
                r += 1
            elif r == 0:
                c += 1
            else:
                r, c = r - 1, c + 1
        else:  # moving down-left
            if r == 7:
                c += 1
            elif c == 0:
                r += 1
            else:
                r, c = r + 1, c - 1
    return np.asarray(order, dtype=np.int64)


ZIGZAG = _zigzag()

#: Annex K.1/K.2 quantization tables (raster order)
QUANT_LUMA = np.asarray([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64)
QUANT_CHROMA = np.asarray([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int64)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix: DCT = T @ block @ T.T."""
    x = np.arange(8, dtype=np.float64)
    t = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16) / 2.0
    t[0] /= np.sqrt(2.0)
    return t


_T = _dct_matrix()

# encoder Huffman tables: fixed-length canonical codes (prefix-free by
# construction; the all-ones max-length code stays unused in both)
_DC_BITS = [0] * 16
_DC_BITS[3] = 12  # 12 DC categories, 4 bits each (codes 0..11 of 16)
_DC_VALS = list(range(12))
_AC_BITS = [0] * 16
_AC_BITS[7] = 162  # all 162 baseline AC symbols, 8 bits each (codes 0..161)
_AC_VALS = [0x00, 0xF0] + [(run << 4) | size
                           for run in range(16) for size in range(1, 11)]


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length) per the canonical JPEG assignment."""
    out, code = {}, 0
    i = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[i]] = (code, length)
            code += 1
            i += 1
        code <<= 1
    return out


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            byte = ((self.acc << pad) | ((1 << pad) - 1)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)
            self.acc = self.n = 0
        return bytes(self.buf)


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _amplitude(v: int, size: int) -> int:
    return v if v >= 0 else v + (1 << size) - 1


def make_jpeg(rgb: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a baseline 4:4:4 JFIF JPEG."""
    h, w = rgb.shape[:2]
    f = rgb.astype(np.float64)
    y = 0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]
    cb = -0.168736 * f[..., 0] - 0.331264 * f[..., 1] + 0.5 * f[..., 2] + 128
    cr = 0.5 * f[..., 0] - 0.418688 * f[..., 1] - 0.081312 * f[..., 2] + 128
    planes = [y, cb, cr]
    quants = [QUANT_LUMA, QUANT_CHROMA, QUANT_CHROMA]

    bh, bw = (h + 7) // 8, (w + 7) // 8
    dc_codes = _canonical_codes(_DC_BITS, _DC_VALS)
    ac_codes = _canonical_codes(_AC_BITS, _AC_VALS)
    writer = _BitWriter()
    dc_prev = [0, 0, 0]
    for by in range(bh):
        for bx in range(bw):
            for ci, (plane, q) in enumerate(zip(planes, quants)):
                block = np.full((8, 8), 128.0)
                ys, xs = by * 8, bx * 8
                tile = plane[ys:min(ys + 8, h), xs:min(xs + 8, w)]
                block[:tile.shape[0], :tile.shape[1]] = tile
                # replicate edge pixels into the padding (cheap ringing guard)
                block[tile.shape[0]:, :tile.shape[1]] = tile[-1:, :]
                block[:, tile.shape[1]:] = block[:, tile.shape[1] - 1:tile.shape[1]]
                coef = _T @ (block - 128.0) @ _T.T
                zz = np.round(coef.ravel()[ZIGZAG]
                              / q[ZIGZAG].astype(np.float64)).astype(np.int64)
                diff = int(zz[0]) - dc_prev[ci]
                dc_prev[ci] = int(zz[0])
                size = _category(diff)
                code, length = dc_codes[size]
                writer.write(code, length)
                if size:
                    writer.write(_amplitude(diff, size), size)
                run = 0
                last_nz = int(np.flatnonzero(zz[1:]).max()) + 1 \
                    if (zz[1:] != 0).any() else 0
                for k in range(1, last_nz + 1):
                    v = int(zz[k])
                    if v == 0:
                        run += 1
                        continue
                    while run >= 16:
                        code, length = ac_codes[0xF0]
                        writer.write(code, length)
                        run -= 16
                    size = _category(v)
                    code, length = ac_codes[(run << 4) | size]
                    writer.write(code, length)
                    writer.write(_amplitude(v, size), size)
                    run = 0
                if last_nz < 63:
                    code, length = ac_codes[0x00]
                    writer.write(code, length)
    scan = writer.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    def dqt(tid: int, table: np.ndarray) -> bytes:
        return seg(0xFFDB, bytes([tid]) + bytes(int(v) for v in table[ZIGZAG]))

    def dht(cls: int, tid: int, bits: list[int], vals: list[int]) -> bytes:
        return seg(0xFFC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))

    sof = seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 3)
              + bytes([1, 0x11, 0]) + bytes([2, 0x11, 1]) + bytes([3, 0x11, 1]))
    sos = seg(0xFFDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    app0 = seg(0xFFE0, b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00")
    return (b"\xff\xd8" + app0 + dqt(0, QUANT_LUMA) + dqt(1, QUANT_CHROMA)
            + dht(0, 0, _DC_BITS, _DC_VALS) + dht(1, 0, _AC_BITS, _AC_VALS)
            + dht(0, 1, _DC_BITS, _DC_VALS) + dht(1, 1, _AC_BITS, _AC_VALS)
            + sof + sos + scan + b"\xff\xd9")


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00 unstuffing."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def _fill(self) -> bool:
        while self.n < 24 and self.pos < len(self.data):
            byte = self.data[self.pos]
            if byte == 0xFF:
                nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else None
                if nxt == 0x00:
                    self.pos += 2
                else:  # a real marker terminates the scan
                    return self.n > 0
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | byte
            self.n += 8
        return self.n > 0

    def bit(self) -> int | None:
        if self.n == 0 and not self._fill():
            return None
        if self.n == 0:
            return None
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, count: int) -> int | None:
        v = 0
        for _ in range(count):
            b = self.bit()
            if b is None:
                return None
            v = (v << 1) | b
        return v


def _build_decode_table(bits: list[int], vals: list[int]):
    """(length → (first_code, first_index)) lookup for canonical decoding."""
    table = {}
    code, idx = 0, 0
    for length in range(1, 17):
        n = bits[length - 1]
        if n:
            table[length] = (code, idx)
        code = (code + n) << 1
        idx += n
    return table, vals


def _huff_decode(reader: _BitReader, table) -> int | None:
    lengths, vals = table
    code = 0
    for length in range(1, 17):
        b = reader.bit()
        if b is None:
            return None
        code = (code << 1) | b
        if length in lengths:
            first, idx = lengths[length]
            offset = code - first
            # codes at this length form a contiguous canonical block whose
            # size is bounded by the next populated length's start index
            if 0 <= offset < _codes_at(lengths, length, len(vals)):
                return vals[idx + offset]
    return None


def _codes_at(lengths, length: int, total: int) -> int:
    first, idx = lengths[length]
    nexts = [i for ln, (c, i) in lengths.items() if ln > length]
    upper = min(nexts) if nexts else total
    return upper - idx


def _extend(v: int, size: int) -> int:
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg_pixels(buf: bytes) -> np.ndarray | None:
    """REAL pixel decode for baseline 4:4:4 (or grayscale) JPEG."""
    if buf[:2] != b"\xff\xd8":
        return None
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, object] = {}
    huff_ac: dict[int, object] = {}
    w = h = None
    comps: list[tuple[int, int, int]] = []  # (id, quant_tid, sampling)
    scan_map: list[tuple[int, int, int]] = []  # (comp_idx, dc_tid, ac_tid)
    scan_data = None
    while pos + 4 <= len(buf):
        if buf[pos] != 0xFF:
            return None
        marker = buf[pos + 1]
        if marker == 0xD9:
            break
        (seg_len,) = struct.unpack(">H", buf[pos + 2:pos + 4])
        body = buf[pos + 4:pos + 2 + seg_len]
        if marker == 0xDB:  # DQT (possibly several tables)
            i = 0
            while i < len(body):
                pq, tid = body[i] >> 4, body[i] & 0xF
                if pq != 0:
                    return None  # 16-bit tables: out of scope
                zz = np.frombuffer(body, np.uint8, count=64, offset=i + 1)
                tbl = np.zeros(64, dtype=np.int64)
                tbl[ZIGZAG] = zz
                quant[tid] = tbl
                i += 65
        elif marker == 0xC4:  # DHT (possibly several tables)
            i = 0
            while i < len(body):
                cls, tid = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1:i + 17])
                n = sum(bits)
                vals = list(body[i + 17:i + 17 + n])
                tbl = _build_decode_table(bits, vals)
                (huff_dc if cls == 0 else huff_ac)[tid] = tbl
                i += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            precision, h, w, nc = struct.unpack(">BHHB", body[:6])
            if precision != 8 or nc not in (1, 3):
                return None
            for c in range(nc):
                cid, sampling, qid = body[6 + 3 * c:9 + 3 * c]
                if sampling != 0x11:
                    return None  # subsampled: out of scope
                comps.append((cid, qid, sampling))
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            return None  # non-baseline frame types
        elif marker == 0xDD:  # DRI
            (interval,) = struct.unpack(">H", body[:2])
            if interval:
                return None  # restart markers: out of scope
        elif marker == 0xDA:  # SOS
            ns = body[0]
            for c in range(ns):
                cid, tids = body[1 + 2 * c], body[2 + 2 * c]
                comp_idx = next((k for k, (i2, _, _) in enumerate(comps)
                                 if i2 == cid), None)
                if comp_idx is None:
                    return None
                scan_map.append((comp_idx, tids >> 4, tids & 0xF))
            scan_data = buf[pos + 2 + seg_len:]
            break
        pos += 2 + seg_len
    if w is None or scan_data is None or len(scan_map) != len(comps):
        return None

    reader = _BitReader(scan_data)
    bh, bw = (h + 7) // 8, (w + 7) // 8
    planes = [np.zeros((bh * 8, bw * 8), dtype=np.float64) for _ in comps]
    dc_prev = [0] * len(comps)
    for by in range(bh):
        for bx in range(bw):
            for si, (ci, dc_tid, ac_tid) in enumerate(scan_map):
                if dc_tid not in huff_dc or ac_tid not in huff_ac:
                    return None
                q = quant.get(comps[ci][1])
                if q is None:
                    return None
                zz = np.zeros(64, dtype=np.int64)
                size = _huff_decode(reader, huff_dc[dc_tid])
                if size is None:
                    return None
                if size:
                    raw = reader.bits(size)
                    if raw is None:
                        return None
                    dc_prev[ci] += _extend(raw, size)
                else:
                    dc_prev[ci] += 0
                zz[0] = dc_prev[ci]
                k = 1
                while k < 64:
                    sym = _huff_decode(reader, huff_ac[ac_tid])
                    if sym is None:
                        return None
                    if sym == 0x00:  # EOB
                        break
                    if sym == 0xF0:  # ZRL
                        k += 16
                        continue
                    run, size = sym >> 4, sym & 0xF
                    k += run
                    if k > 63 or size == 0:
                        return None
                    raw = reader.bits(size)
                    if raw is None:
                        return None
                    zz[k] = _extend(raw, size)
                    k += 1
                coef = np.zeros(64, dtype=np.float64)
                coef[ZIGZAG] = zz * q[ZIGZAG]
                block = _T.T @ coef.reshape(8, 8) @ _T + 128.0
                planes[ci][by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = block
    planes = [p[:h, :w] for p in planes]
    if len(planes) == 1:
        g = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=-1)
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
