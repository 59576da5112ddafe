"""TIFF decoder (functions/tiff.py) vs the independent encoder in
tests/_tiff_encoder.py: bit-exact decode across endianness, strip
layouts, compressions (none/PackBits/LZW), predictor, photometrics
(gray/WhiteIsZero/RGB/palette), bilevel and 16-bit depths — plus
hypothesis-random images through every compression."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from batch_processing_system_spark.functions.tiff import (
    _lzw_decode,
    _unpackbits,
    decode_tiff_rgb,
)
from tests._tiff_encoder import (
    encode_tiff,
    encode_tiff_tiled,
    lzw_encode,
    packbits_encode,
)


def _gradient_rgb(h, w):
    y, x = np.mgrid[0:h, 0:w]
    return np.stack(
        [(x * 255 // max(w - 1, 1)), (y * 255 // max(h - 1, 1)), (x + y) % 256],
        axis=2,
    ).astype(np.uint8)


def _gray(h, w):
    y, x = np.mgrid[0:h, 0:w]
    return ((x * 7 + y * 13) % 256).astype(np.uint8)


def _rgbify_gray(g):
    return np.repeat(g[:, :, None], 3, axis=2)


class TestCodecs:
    @given(st.binary(min_size=0, max_size=400))
    @settings(max_examples=100, deadline=None)
    def test_packbits_roundtrip(self, data):
        assert _unpackbits(packbits_encode(data), len(data)) == data

    @given(st.binary(min_size=1, max_size=400))
    @settings(max_examples=100, deadline=None)
    def test_lzw_roundtrip(self, data):
        assert _lzw_decode(lzw_encode(data), len(data)) == data

    def test_lzw_width_growth(self):
        # enough distinct pairs to push the table past 511 and 1023:
        # exercises the early-change thresholds on both sides
        data = bytes(range(256)) * 12
        assert _lzw_decode(lzw_encode(data), len(data)) == data

    def test_lzw_table_full_clear_reset(self):
        # incompressible-ish stream long enough to fill the 12-bit
        # table (~4094 entries) and force a mid-stream CLEAR + rebuild
        rng = np.random.default_rng(7)
        data = rng.integers(0, 256, size=9000, dtype=np.uint8).tobytes()
        assert _lzw_decode(lzw_encode(data), len(data)) == data


class TestDecode:
    @pytest.mark.parametrize("endian", ["<", ">"])
    @pytest.mark.parametrize("compression", [1, 5, 8, 32946, 32773])
    def test_rgb_both_endians_all_compressions(self, endian, compression):
        img = _gradient_rgb(13, 9)
        data = encode_tiff(img, endian=endian, compression=compression)
        out = decode_tiff_rgb(data)
        assert out is not None and np.array_equal(out, img)

    def test_multiple_strips(self):
        img = _gradient_rgb(11, 6)
        for rps in (1, 3, 4, 11):
            out = decode_tiff_rgb(encode_tiff(img, rows_per_strip=rps))
            assert np.array_equal(out, img), rps

    @pytest.mark.parametrize("compression", [5, 8, 32773])
    def test_predictor2(self, compression):
        img = _gradient_rgb(7, 16)
        data = encode_tiff(img, compression=compression, predictor=2)
        assert np.array_equal(decode_tiff_rgb(data), img)

    def test_gray_and_whiteiszero(self):
        g = _gray(9, 7)
        assert np.array_equal(
            decode_tiff_rgb(encode_tiff(g, photometric=1)), _rgbify_gray(g)
        )
        assert np.array_equal(
            decode_tiff_rgb(encode_tiff(g, photometric=0)), _rgbify_gray(255 - g)
        )

    def test_palette(self):
        pal = np.array(
            [[250, 10, 0], [0, 200, 30], [5, 5, 255], [7, 8, 9]], dtype=np.uint8
        )
        idx = (np.arange(30).reshape(5, 6) % 4).astype(np.uint8)
        out = decode_tiff_rgb(encode_tiff(idx, palette=pal))
        assert np.array_equal(out, pal[idx])

    def test_bilevel(self):
        bits = (np.arange(40).reshape(5, 8) % 3 == 0).astype(np.uint8)
        out = decode_tiff_rgb(encode_tiff(bits, bilevel=True))
        assert np.array_equal(out, _rgbify_gray(bits * 255))
        # WhiteIsZero inverts
        out0 = decode_tiff_rgb(encode_tiff(bits, bilevel=True, photometric=0))
        assert np.array_equal(out0, _rgbify_gray(255 - bits * 255))

    def test_gray16_reduces_to_high_byte(self):
        g = _gray(6, 5)
        for endian in ("<", ">"):
            out = decode_tiff_rgb(encode_tiff(g, depth=16, endian=endian))
            # encoder widens v -> v*257, so the high byte is exactly v
            assert np.array_equal(out, _rgbify_gray(g)), endian

    @pytest.mark.parametrize("endian", ["<", ">"])
    @pytest.mark.parametrize("compression", [1, 5, 8, 32946, 32773])
    def test_tiled_rgb_all_compressions(self, endian, compression):
        # 29x21 with 16x16 tiles: a 2x2 grid where the right/bottom
        # edge tiles carry pad that must be cropped away
        img = _gradient_rgb(21, 29)
        data = encode_tiff_tiled(
            img, endian=endian, compression=compression, tile_w=16, tile_h=16
        )
        out = decode_tiff_rgb(data)
        assert out is not None and np.array_equal(out, img)

    def test_tiled_exact_grid_and_single_tile(self):
        img = _gradient_rgb(32, 16)  # exact multiple: no pad path
        assert np.array_equal(
            decode_tiff_rgb(encode_tiff_tiled(img, tile_w=16, tile_h=16)), img
        )
        small = _gradient_rgb(5, 7)  # whole image inside one padded tile
        assert np.array_equal(
            decode_tiff_rgb(encode_tiff_tiled(small, tile_w=16, tile_h=16)), small
        )

    @pytest.mark.parametrize("compression", [5, 8, 32773])
    def test_tiled_predictor2(self, compression):
        img = _gradient_rgb(18, 20)
        data = encode_tiff_tiled(
            img, compression=compression, predictor=2, tile_w=16, tile_h=16
        )
        assert np.array_equal(decode_tiff_rgb(data), img)

    def test_tiled_gray_and_gray16(self):
        g = _gray(19, 23)
        assert np.array_equal(
            decode_tiff_rgb(encode_tiff_tiled(g, tile_w=16, tile_h=16)),
            _rgbify_gray(g),
        )
        for endian in ("<", ">"):
            out = decode_tiff_rgb(
                encode_tiff_tiled(g, depth=16, endian=endian, tile_w=16, tile_h=16)
            )
            assert np.array_equal(out, _rgbify_gray(g)), endian

    @given(
        h=st.integers(1, 40),
        w=st.integers(1, 40),
        compression=st.sampled_from([1, 5, 8, 32773]),
        endian=st.sampled_from(["<", ">"]),
        tw=st.sampled_from([16, 32]),
        th=st.sampled_from([16, 32]),
        seed=st.integers(0, 2**31 - 1),
    )
    @settings(max_examples=25, deadline=None)
    def test_tiled_random_images(self, h, w, compression, endian, tw, th, seed):
        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        out = decode_tiff_rgb(
            encode_tiff_tiled(
                img, endian=endian, compression=compression, tile_w=tw, tile_h=th
            )
        )
        assert np.array_equal(out, img)

    def test_non_tiff_returns_none(self):
        assert decode_tiff_rgb(b"\x89PNG\r\n\x1a\nxxxxxxx") is None
        assert decode_tiff_rgb(b"II\x2c\x00????") is None  # unknown magic

    @pytest.mark.parametrize("endian", ["<", ">"])
    @pytest.mark.parametrize("compression", [1, 5, 8, 32773])
    def test_bigtiff_rgb(self, endian, compression):
        from tests._tiff_encoder import encode_tiff_big

        img = _gradient_rgb(14, 11)
        data = encode_tiff_big(img, endian=endian, compression=compression)
        assert data[2:4] == (b"\x2b\x00" if endian == "<" else b"\x00\x2b")
        out = decode_tiff_rgb(data)
        assert out is not None and np.array_equal(out, img)

    def test_bigtiff_gray_multistrip_and_16bit(self):
        from tests._tiff_encoder import encode_tiff_big

        g = _gray(13, 9)
        assert np.array_equal(
            decode_tiff_rgb(encode_tiff_big(g, rows_per_strip=4)),
            _rgbify_gray(g),
        )
        for endian in ("<", ">"):
            out = decode_tiff_rgb(encode_tiff_big(g, depth=16, endian=endian))
            assert np.array_equal(out, _rgbify_gray(g)), endian

    def test_bigtiff_malformed_header_raises(self):
        with pytest.raises(ValueError, match="BigTIFF"):
            decode_tiff_rgb(b"II\x2b\x00\x04\x00\x00\x00" + b"\0" * 16)

    def test_unsupported_compression_raises(self):
        img = _gradient_rgb(4, 4)
        data = bytearray(encode_tiff(img))
        # patch the Compression tag value (259) in place to CCITT G4 (4)
        idx = data.find((259).to_bytes(2, "little"))
        data[idx + 8] = 4
        with pytest.raises(NotImplementedError, match="compression"):
            decode_tiff_rgb(bytes(data))

    @given(
        h=st.integers(1, 12),
        w=st.integers(1, 12),
        compression=st.sampled_from([1, 5, 8, 32773]),
        endian=st.sampled_from(["<", ">"]),
        data=st.data(),
    )
    @settings(max_examples=40, deadline=None)
    def test_random_images(self, h, w, compression, endian, data):
        img = np.array(
            data.draw(
                st.lists(
                    st.lists(
                        st.lists(st.integers(0, 255), min_size=3, max_size=3),
                        min_size=w,
                        max_size=w,
                    ),
                    min_size=h,
                    max_size=h,
                )
            ),
            dtype=np.uint8,
        )
        rps = data.draw(st.integers(1, h))
        out = decode_tiff_rgb(
            encode_tiff(img, endian=endian, compression=compression, rows_per_strip=rps)
        )
        assert np.array_equal(out, img)
