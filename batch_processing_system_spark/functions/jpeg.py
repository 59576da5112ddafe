"""Baseline JPEG (ITU-T T.81 sequential DCT, SOF0) pixel decoder —
pure Python + numpy, no codec library.

Closes the last still-image decode gap of the multimodal family
(north-star X5): the container ships no Pillow, but baseline JPEG is
buildable from the public spec exactly like round 2's GIF-LZW and
PNG-unfilter work — segment walk, canonical Huffman entropy decode,
dequantize + dezigzag, 8x8 inverse DCT as one numpy matrix sandwich,
chroma upsample, YCbCr→RGB.

Supported: baseline Huffman (SOF0), grayscale and 3-component YCbCr,
any sampling factors (4:4:4 / 4:2:2 / 4:2:0 / ...), restart markers.
Progressive (SOF2) and arithmetic coding raise NotImplementedError
naming the feature — they are a different entropy layout, not a
bigger table.

Decode cost model for the Spark side: one numpy IDCT per 8x8 block —
the mapInPandas batch loop stays vectorized per block with no
per-pixel Python. Executor memory is O(one image).
"""

from __future__ import annotations

import struct

import numpy as np

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])

# IDCT basis: spatial = C.T @ coeffs @ C with C[u, x] the orthonormal
# DCT-II matrix — one 8x8 matrix sandwich per block, all in numpy.
_C = np.zeros((8, 8))
for _u in range(8):
    _alpha = (1 / 8) ** 0.5 if _u == 0 else (2 / 8) ** 0.5
    for _x in range(8):
        _C[_u, _x] = _alpha * np.cos((2 * _x + 1) * _u * np.pi / 16)


class _Huff:
    """Canonical Huffman table from a DHT segment (16 counts +
    symbols), decoded MSB-first via (length, code) lookup."""

    def __init__(self, counts: list[int], symbols: bytes):
        self.lookup: dict[tuple[int, int], int] = {}
        code, k = 0, 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                self.lookup[(length, code)] = symbols[k]
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment: unstuffs
    0xFF00, stops at markers, realigns at restarts."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bits = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2  # stuffed
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(nxt)
            else:
                raise EOFError("marker inside entropy stream")
        else:
            self.pos += 1
        self.bits = (self.bits << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bits >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode(self, table: _Huff) -> int:
        length, code = 0, 0
        while length < 16:
            code = (code << 1) | self.read_bit()
            length += 1
            sym = table.lookup.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")

    def align_after_restart(self) -> None:
        # consume the RSTn marker and restart on a byte boundary
        self.bits = 0
        self.nbits = 0
        self.pos += 2


class _RestartMarker(Exception):
    def __init__(self, marker: int):
        self.marker = marker


def _extend(v: int, t: int) -> int:
    """JPEG receive-extend: t-bit magnitude v to signed value."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg_rgb(content: bytes):
    """Decode a baseline JPEG into (h, w, 3) uint8 RGB, or None when
    ``content`` is not a JPEG at all. Raises NotImplementedError for
    progressive/arithmetic variants."""
    if not content or content[:2] != b"\xff\xd8":
        return None
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _Huff] = {}
    huff_ac: dict[int, _Huff] = {}
    frame = None
    restart_interval = 0
    pos = 2
    while pos < len(content):
        if content[pos] != 0xFF:
            pos += 1
            continue
        marker = content[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:  # EOI
            break
        seglen = struct.unpack(">H", content[pos + 2 : pos + 4])[0]
        seg = content[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 15
                if pq:
                    tbl = np.frombuffer(seg[i + 1 : i + 129], dtype=">u2").astype(np.int32)
                    i += 129
                else:
                    tbl = np.frombuffer(seg[i + 1 : i + 65], dtype=np.uint8).astype(np.int32)
                    i += 65
                qt[tq] = tbl
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                counts = list(seg[i + 1 : i + 17])
                n = sum(counts)
                table = _Huff(counts, seg[i + 17 : i + 17 + n])
                (huff_ac if tc else huff_dc)[th] = table
                i += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise NotImplementedError("only 8-bit JPEG precision supported")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise NotImplementedError(
                "only baseline sequential JPEG (SOF0) is supported; "
                f"marker 0xFF{marker:02X} is a progressive/extended frame"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF0")
            ns = seg[0]
            scan = {}
            for c in range(ns):
                cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                scan[cs] = (tt >> 4, tt & 15)
            data_pos = pos + 2 + seglen
            return _decode_scan(
                content, data_pos, frame, scan, qt, huff_dc, huff_ac, restart_interval
            )
        pos += 2 + seglen
    raise ValueError("no SOS segment found")


def _decode_scan(data, pos, frame, scan, qt, huff_dc, huff_ac, restart_interval):
    comps = frame["comps"]
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    planes = [
        np.zeros((mcus_y * c["v"] * 8, mcus_x * c["h"] * 8), dtype=np.float64)
        for c in comps
    ]
    # quant tables arrive zigzag-ordered; coefficients below are stored
    # in natural order (via ZIGZAG[k]), so de-zigzag each table once
    qnat = []
    for c in comps:
        t = np.zeros(64, dtype=np.float64)
        t[ZIGZAG] = qt[c["tq"]]
        qnat.append(t)
    reader = _BitReader(data, pos)
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                # skip to the RSTn marker (may already be flagged by
                # the reader mid-fill), realign, reset DC predictors
                try:
                    while True:
                        reader.read_bit()
                except (_RestartMarker, EOFError):
                    pass
                if not (
                    reader.data[reader.pos] == 0xFF
                    and 0xD0 <= reader.data[reader.pos + 1] <= 0xD7
                ):
                    raise ValueError("expected restart marker")
                reader.align_after_restart()
                pred = [0] * len(comps)
            mcu_count += 1
            for ci, comp in enumerate(comps):
                dc_t = huff_dc[scan[comp["id"]][0]]
                ac_t = huff_ac[scan[comp["id"]][1]]
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        coeffs = np.zeros(64, dtype=np.float64)
                        t = reader.decode(dc_t)
                        pred[ci] += _extend(reader.read_bits(t), t)
                        coeffs[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = reader.decode(ac_t)
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            coeffs[ZIGZAG[k]] = _extend(reader.read_bits(s), s)
                            k += 1
                        block = (coeffs * qnat[ci]).reshape(8, 8)
                        spatial = _C.T @ block @ _C + 128.0
                        y0 = (my * comp["v"] + by) * 8
                        x0 = (mx * comp["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = spatial
    # upsample every plane to full MCU-padded resolution, crop, convert
    full = []
    for ci, comp in enumerate(comps):
        p = planes[ci]
        p = np.repeat(np.repeat(p, vmax // comp["v"], axis=0), hmax // comp["h"], axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        y = np.clip(full[0], 0, 255)
        return np.dstack([y, y, y]).astype(np.uint8)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.dstack([r, g, b]), 0, 255).astype(np.uint8)
