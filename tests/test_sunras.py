"""Sun rasterfile decoder vs an independently written encoder (own
RLE, own row padding): 24-bit BGR/RGB orders, 32-bit x-byte, 8-bit
colormap, 1-bit, BYTE_ENCODED RLE incl. the 0x80-literal escape."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from batch_processing_system_spark.functions.sunras import decode_sunras_rgb


def _rle(raw: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(raw)
    while i < n:
        run = 1
        while i + run < n and raw[i + run] == raw[i] and run < 256:
            run += 1
        if run >= 3 or (run >= 2 and raw[i] == 0x80):
            out += bytes([0x80, run - 1, raw[i]])
            i += run
        elif raw[i] == 0x80:
            out += bytes([0x80, 0x00])
            i += 1
        else:
            out.append(raw[i])
            i += 1
    return bytes(out)


def encode_sunras(
    rows, depth: int = 24, rtype: int = 1, cmap=None
) -> bytes:
    h = len(rows)
    w = len(rows[0])
    stride = ((w * depth + 15) // 16) * 2
    raw = bytearray()
    for row in rows:
        line = bytearray()
        for px in row:
            if depth == 24:
                r, g, b = px
                line += bytes([r, g, b] if rtype == 3 else [b, g, r])
            elif depth == 32:
                r, g, b = px
                line += bytes([0, r, g, b] if rtype == 3 else [0, b, g, r])
            elif depth == 8:
                line.append(px)
            else:  # depth 1: px is a bit
                pass
        if depth == 1:
            byte = nbits = 0
            for v in row:
                byte = (byte << 1) | (v & 1)
                nbits += 1
                if nbits == 8:
                    line.append(byte)
                    byte = nbits = 0
            if nbits:
                line.append(byte << (8 - nbits))
        while len(line) < stride:
            line.append(0)
        raw += line
    body = _rle(bytes(raw)) if rtype == 2 else bytes(raw)
    maptype = 1 if cmap is not None else 0
    mapbytes = b""
    if cmap is not None:
        mapbytes = (
            bytes(c[0] for c in cmap)
            + bytes(c[1] for c in cmap)
            + bytes(c[2] for c in cmap)
        )
    head = struct.pack(
        ">8i", 0x59A66A95, w, h, depth, len(body), rtype, maptype, len(mapbytes)
    )
    return head + mapbytes + body


def _grad(h, w):
    return [
        [((23 * y + 7 * x) % 256, (3 * y) % 256, (13 * x) % 256) for x in range(w)]
        for y in range(h)
    ]


class TestSunras:
    def test_24bit_bgr_and_rgb_orders(self):
        px = _grad(5, 3)  # odd width exercises 16-bit row padding
        for rtype in (1, 3):
            got = decode_sunras_rgb(encode_sunras(px, rtype=rtype))
            assert (got == np.array(px, dtype=np.uint8)).all(), rtype

    def test_rle_with_0x80_literals(self):
        px = [[(0x80, 0x80, 0x80)] * 6 + [(0x80, 1, 2)]]
        plain = decode_sunras_rgb(encode_sunras(px, rtype=1))
        rle = decode_sunras_rgb(encode_sunras(px, rtype=2))
        assert (plain == rle).all()
        assert plain[0, 0].tolist() == [0x80, 0x80, 0x80]

    def test_32bit_x_byte_skipped(self):
        px = _grad(2, 4)
        got = decode_sunras_rgb(encode_sunras(px, depth=32))
        assert (got == np.array(px, dtype=np.uint8)).all()

    def test_8bit_colormap(self):
        cmap = [(250, 0, 0), (0, 250, 0), (0, 0, 250), (7, 8, 9)]
        idx = [[0, 1, 2, 3, 2], [3, 2, 1, 0, 1]]
        got = decode_sunras_rgb(encode_sunras(idx, depth=8, cmap=cmap))
        expect = np.array([[cmap[i] for i in row] for row in idx], dtype=np.uint8)
        assert (got == expect).all()

    def test_1bit_black_is_one(self):
        bits = [[1, 0, 1, 1, 0, 0, 1, 0, 1], [0, 1, 0, 0, 1, 1, 0, 1, 0]]
        got = decode_sunras_rgb(encode_sunras(bits, depth=1))
        expect = (1 - np.array(bits, dtype=np.uint8)) * 255
        assert (got[:, :, 0] == expect).all()

    def test_not_ras_and_corrupt(self):
        assert decode_sunras_rgb(b"\x00" * 40) is None
        data = encode_sunras(_grad(3, 3), rtype=2)
        with pytest.raises(ValueError):
            decode_sunras_rgb(data[:40])

    @given(
        w=st.integers(1, 9), h=st.integers(1, 7),
        rtype=st.sampled_from([1, 2, 3]), seed=st.integers(0, 9999),
    )
    @settings(max_examples=40, deadline=None)
    def test_random_roundtrip(self, w, h, rtype, seed):
        rng = np.random.default_rng(seed)
        px = [
            [tuple(int(v) for v in rng.integers(0, 256, 3)) for _ in range(w)]
            for _ in range(h)
        ]
        got = decode_sunras_rgb(encode_sunras(px, rtype=rtype))
        assert (got == np.array(px, dtype=np.uint8)).all()
