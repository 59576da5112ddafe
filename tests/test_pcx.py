"""PCX decoder vs an independently written encoder (own RLE packer,
own plane interleave): 24-bit, 8-bit VGA palette, 1-bit mono, 4-bit
EGA, RLE edge cases (0xC0-range literals must be run-encoded)."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from batch_processing_system_spark.functions.pcx import decode_pcx_rgb


def _rle(row: bytes) -> bytes:
    """Independent RLE: runs up to 63; any byte >= 0xC0 MUST be coded
    as a run even for length 1."""
    out = bytearray()
    i = 0
    while i < len(row):
        run = 1
        while i + run < len(row) and row[i + run] == row[i] and run < 63:
            run += 1
        if run > 1 or row[i] >= 0xC0:
            out.append(0xC0 | run)
            out.append(row[i])
        else:
            out.append(row[i])
        i += run
    return bytes(out)


def encode_pcx(rows, kind: str = "rgb24", ega_palette=None) -> bytes:
    h = len(rows)
    w = len(rows[0])
    if kind == "rgb24":
        bpp, nplanes = 8, 3
        bpl = w
    elif kind == "pal8":
        bpp, nplanes = 8, 1
        bpl = w
    elif kind == "mono1":
        bpp, nplanes = 1, 1
        bpl = (w + 7) // 8
    else:  # ega4
        bpp, nplanes = 4, 1
        bpl = (w * 4 + 7) // 8
    header = bytearray(128)
    header[0], header[1], header[2], header[3] = 0x0A, 5, 1, bpp
    header[4:12] = struct.pack("<4H", 0, 0, w - 1, h - 1)
    if ega_palette:
        flat = bytes(v for rgb in ega_palette for v in rgb)
        header[16 : 16 + len(flat)] = flat
    header[65] = nplanes
    header[66:68] = struct.pack("<H", bpl)
    body = bytearray()
    palette = None
    if kind == "rgb24":
        for row in rows:
            for c in range(3):
                body += _rle(bytes(px[c] for px in row))
    elif kind == "pal8":
        palette = sorted({px for row in rows for px in row})
        lut = {p: i for i, p in enumerate(palette)}
        for row in rows:
            body += _rle(bytes(lut[px] for px in row))
    elif kind == "mono1":
        for row in rows:
            packed = bytearray()
            byte = nbits = 0
            for v in row:
                byte = (byte << 1) | (v & 1)
                nbits += 1
                if nbits == 8:
                    packed.append(byte)
                    byte = nbits = 0
            if nbits:
                packed.append(byte << (8 - nbits))
            body += _rle(bytes(packed))
    else:  # ega4: rows of palette indexes 0..15
        for row in rows:
            packed = bytearray()
            for i in range(0, len(row), 2):
                hi = row[i] & 0x0F
                lo = row[i + 1] & 0x0F if i + 1 < len(row) else 0
                packed.append((hi << 4) | lo)
            body += _rle(bytes(packed))
    out = bytes(header) + bytes(body)
    if kind == "pal8":
        pal_block = bytearray(b"\x0c")
        for p in palette:
            pal_block += bytes(p)
        pal_block += b"\x00" * (768 - 3 * len(palette))
        out += bytes(pal_block)
    return out


def _grad(h, w):
    return [
        [((17 * y + 31 * x) % 256, (5 * y) % 256, (11 * x) % 256) for x in range(w)]
        for y in range(h)
    ]


class TestPcx:
    def test_rgb24_exact(self):
        px = _grad(6, 5)
        got = decode_pcx_rgb(encode_pcx(px))
        assert (got == np.array(px, dtype=np.uint8)).all()

    def test_rle_high_literals(self):
        # bytes >= 0xC0 as single pixels force length-1 run coding
        px = [[(0xC5, 0xFF, 0xC0), (0x10, 0xC1, 0x20)]]
        got = decode_pcx_rgb(encode_pcx(px))
        assert (got == np.array(px, dtype=np.uint8)).all()

    def test_pal8_vga(self):
        colors = [(250, 0, 0), (0, 250, 0), (0, 0, 250), (9, 8, 7)]
        px = [[colors[(x + y) % 4] for x in range(7)] for y in range(5)]
        got = decode_pcx_rgb(encode_pcx(px, kind="pal8"))
        assert (got == np.array(px, dtype=np.uint8)).all()

    def test_mono1(self):
        bits = [[1, 0, 0, 1, 1, 0, 1, 0, 1], [0, 1, 1, 0, 0, 1, 0, 1, 0]]
        got = decode_pcx_rgb(encode_pcx(bits, kind="mono1"))
        expect = np.array(bits, dtype=np.uint8) * 255
        assert (got[:, :, 0] == expect).all()
        assert (got[:, :, 0] == got[:, :, 2]).all()

    def test_ega4_header_palette(self):
        pal = [(i * 16, 255 - i * 16, (i * 37) % 256) for i in range(16)]
        idx = [[(x + y) % 16 for x in range(5)] for y in range(4)]
        got = decode_pcx_rgb(encode_pcx(idx, kind="ega4", ega_palette=pal))
        expect = np.array([[pal[i] for i in row] for row in idx], dtype=np.uint8)
        assert (got == expect).all()

    def test_not_pcx_and_corrupt(self):
        assert decode_pcx_rgb(b"BM\x00\x00" + b"\x00" * 200) is None
        data = encode_pcx(_grad(3, 3))
        with pytest.raises(ValueError):
            decode_pcx_rgb(data[:140])
        pal8 = encode_pcx(_grad(2, 2), kind="pal8")
        with pytest.raises(ValueError, match="palette"):
            decode_pcx_rgb(pal8[:-769])  # strip the VGA palette block

    @given(w=st.integers(1, 10), h=st.integers(1, 8), seed=st.integers(0, 9999))
    @settings(max_examples=40, deadline=None)
    def test_random_rgb_roundtrip(self, w, h, seed):
        rng = np.random.default_rng(seed)
        px = [
            [tuple(int(v) for v in rng.integers(0, 256, 3)) for _ in range(w)]
            for _ in range(h)
        ]
        got = decode_pcx_rgb(encode_pcx(px))
        assert (got == np.array(px, dtype=np.uint8)).all()
