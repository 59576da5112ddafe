"""PNM (P1-P6) and TGA decoders vs the independently written encoders
in tests/_pnm_tga_encoder.py — exact pixel equality everywhere the
format is lossless, documented 5-bit expansion where it is not."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from batch_processing_system_spark.functions.pnm import decode_pnm_rgb
from batch_processing_system_spark.functions.tga import decode_tga_rgb
from tests._pnm_tga_encoder import encode_pnm, encode_tga


def _grad(h, w):
    return [
        [((13 * y + 29 * x) % 256, (7 * y + 3 * x) % 256, (x * y) % 256) for x in range(w)]
        for y in range(h)
    ]


def _gray(h, w, maxval=255):
    return [[(11 * y + 17 * x) % (maxval + 1) for x in range(w)] for y in range(h)]


class TestPNM:
    def test_p3_p6_equal_and_exact(self):
        px = _grad(5, 7)
        a = decode_pnm_rgb(encode_pnm(px, "P3"))
        b = decode_pnm_rgb(encode_pnm(px, "P6"))
        expect = np.array(px, dtype=np.uint8)
        assert (a == expect).all() and (b == expect).all()

    def test_p2_p5_gray_replicates_channels(self):
        px = _gray(4, 6)
        for kind in ("P2", "P5"):
            got = decode_pnm_rgb(encode_pnm(px, kind))
            expect = np.array(px, dtype=np.uint8)
            assert (got[:, :, 0] == expect).all()
            assert (got[:, :, 0] == got[:, :, 1]).all()
            assert (got[:, :, 1] == got[:, :, 2]).all()

    def test_p1_p4_bitmap_black_is_one(self):
        px = [[1, 0, 0, 1, 1, 0, 1, 0, 1], [0, 1, 1, 0, 0, 1, 0, 1, 0]]
        for kind in ("P1", "P4"):
            got = decode_pnm_rgb(encode_pnm(px, kind))
            expect = (1 - np.array(px, dtype=np.uint8)) * 255
            assert (got[:, :, 0] == expect).all(), kind

    def test_maxval_scaling_exact_integer(self):
        for maxval in (1, 15, 31, 1023, 65535):
            px = _gray(3, 3, maxval)
            got = decode_pnm_rgb(encode_pnm(px, "P5", maxval))
            expect = (np.array(px, dtype=np.uint32) * 255 + maxval // 2) // maxval
            assert (got[:, :, 0] == expect.astype(np.uint8)).all(), maxval

    def test_p6_16bit_and_odd_header_whitespace(self):
        px = [[(65535, 0, 32768), (257, 514, 1028)]]
        data = encode_pnm(px, "P6", 65535)
        got = decode_pnm_rgb(data)
        assert got[0, 0].tolist() == [255, 0, (32768 * 255 + 32767) // 65535]
        assert got[0, 1].tolist() == [1, 2, 4]

    def test_rejects_non_pnm_and_truncated(self):
        assert decode_pnm_rgb(b"BM\x00\x00") is None
        assert decode_pnm_rgb(b"P7 3 3 255 ") is None  # PAM not claimed
        with pytest.raises(ValueError):
            decode_pnm_rgb(b"P5 4 4 255\n\x00\x00")
        with pytest.raises(ValueError):
            decode_pnm_rgb(b"P2 2 2 10\n0 5 11 3")  # sample > maxval

    @given(
        w=st.integers(1, 9),
        h=st.integers(1, 7),
        kind=st.sampled_from(["P2", "P3", "P5", "P6"]),
        seed=st.integers(0, 10_000),
    )
    @settings(max_examples=40, deadline=None)
    def test_random_roundtrip(self, w, h, kind, seed):
        rng = np.random.default_rng(seed)
        if kind in ("P3", "P6"):
            px = [
                [tuple(int(v) for v in rng.integers(0, 256, 3)) for _ in range(w)]
                for _ in range(h)
            ]
            expect = np.array(px, dtype=np.uint8)
        else:
            px = [[int(v) for v in rng.integers(0, 256, w)] for _ in range(h)]
            expect = np.repeat(
                np.array(px, dtype=np.uint8)[:, :, None], 3, axis=2
            )
        got = decode_pnm_rgb(encode_pnm(px, kind))
        assert (got == expect).all()


class TestTGA:
    def test_uncompressed_24_exact(self):
        px = _grad(6, 5)
        got = decode_tga_rgb(encode_tga(px, bpp=24))
        assert (got == np.array(px, dtype=np.uint8)).all()

    def test_rle_equals_uncompressed(self):
        # runs + literals: stripes force run packets, noise forces raw
        px = [[(200, 10, 10)] * 9 for _ in range(3)] + _grad(3, 9)
        a = decode_tga_rgb(encode_tga(px, bpp=24, rle=False))
        b = decode_tga_rgb(encode_tga(px, bpp=24, rle=True))
        assert (a == b).all()

    def test_origin_flips(self):
        px = _grad(4, 6)
        top = decode_tga_rgb(encode_tga(px, top_down=True))
        bottom = decode_tga_rgb(encode_tga(px[::-1], top_down=False))
        assert (top == bottom).all()
        rl = decode_tga_rgb(
            encode_tga([row[::-1] for row in px], right_left=True)
        )
        assert (top == rl).all()

    def test_32bit_drops_alpha(self):
        px = _grad(3, 3)
        got = decode_tga_rgb(encode_tga(px, bpp=32))
        assert (got == np.array(px, dtype=np.uint8)).all()

    def test_16bit_documented_5bit_expansion(self):
        px = [[(248, 120, 8), (255, 0, 96)]]
        got = decode_tga_rgb(encode_tga(px, bpp=16))
        expect = [
            [((v >> 3) * 255 + 15) // 31 for v in p] for p in px[0]
        ]
        assert got[0].tolist() == expect

    def test_gray_and_palette(self):
        gray_px = [[10, 200, 45], [0, 255, 128]]
        g = decode_tga_rgb(encode_tga(gray_px, bpp=8, gray=True))
        assert (g[:, :, 0] == np.array(gray_px, dtype=np.uint8)).all()
        assert (g[:, :, 0] == g[:, :, 2]).all()
        pal = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (9, 8, 7)]
        idx = [[0, 1, 2, 3], [3, 2, 1, 0]]
        p = decode_tga_rgb(encode_tga(idx, bpp=8, palette=pal))
        expect = np.array([[pal[i] for i in row] for row in idx], dtype=np.uint8)
        assert (p == expect).all()

    def test_sniffing_requires_footer(self):
        px = _grad(2, 2)
        with_footer = encode_tga(px, footer=True)
        without = encode_tga(px, footer=False)
        assert decode_tga_rgb(with_footer, require_footer=True) is not None
        assert decode_tga_rgb(without, require_footer=True) is None
        # direct decode still handles v1 files
        assert decode_tga_rgb(without) is not None

    def test_id_field_skipped(self):
        px = _grad(2, 3)
        got = decode_tga_rgb(encode_tga(px, id_field=b"hello-id"))
        assert (got == np.array(px, dtype=np.uint8)).all()

    @given(
        w=st.integers(1, 8),
        h=st.integers(1, 8),
        rle=st.booleans(),
        top_down=st.booleans(),
        bpp=st.sampled_from([24, 32]),
        seed=st.integers(0, 10_000),
    )
    @settings(max_examples=40, deadline=None)
    def test_random_roundtrip(self, w, h, rle, top_down, bpp, seed):
        rng = np.random.default_rng(seed)
        px = [
            [tuple(int(v) for v in rng.integers(0, 256, 3)) for _ in range(w)]
            for _ in range(h)
        ]
        stored = px if top_down else px[::-1]
        got = decode_tga_rgb(
            encode_tga(stored, bpp=bpp, rle=rle, top_down=top_down)
        )
        assert (got == np.array(px, dtype=np.uint8)).all()
