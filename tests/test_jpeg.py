"""JPEG decoder (functions/jpeg.py) round-tripped against the
independent encoder in tests/_jpeg_encoder.py — baseline grayscale,
color 4:4:4 and 4:2:0, restart markers, non-multiple-of-8 dimensions,
and progressive (SOF2) streams with spectral selection + successive
approximation — plus the Spark decode_and_resize path on JPEG files.

The progressive invariant is exact: a progressive stream transmits
the SAME quantized coefficients as the baseline stream of the same
image, only reordered across scans, so the progressive decode must be
bit-identical to the baseline decode — not merely close."""

from __future__ import annotations

import numpy as np
import pytest

from batch_processing_system_spark.functions.jpeg import decode_jpeg_rgb
from tests._jpeg_encoder import (
    encode_color,
    encode_color_progressive,
    encode_gray,
    encode_gray_progressive,
)


class TestDecoderRoundTrip:
    def test_grayscale_q1_near_lossless(self):
        rng = np.random.default_rng(7)
        img = rng.integers(0, 256, (24, 17)).astype(float)
        rgb = decode_jpeg_rgb(encode_gray(img))
        assert rgb.shape == (24, 17, 3)
        # q=1 quantization: only DCT rounding remains
        assert np.abs(rgb[:, :, 0].astype(float) - img).max() <= 3
        # grayscale replicates into all three channels
        assert (rgb[:, :, 0] == rgb[:, :, 1]).all()

    def test_grayscale_lossy_quant_table(self):
        img = np.zeros((16, 16))
        img[:, :8] = 64
        img[:, 8:] = 192
        rgb = decode_jpeg_rgb(encode_gray(img, quant=[16] * 64))
        assert np.abs(rgb[:, :, 0].astype(float) - img).mean() < 12

    def test_color_444(self):
        rng = np.random.default_rng(11)
        img = rng.integers(0, 256, (19, 22, 3)).astype(np.uint8)
        dec = decode_jpeg_rgb(encode_color(img, (1, 1)))
        assert dec.shape == img.shape
        assert np.abs(dec.astype(float) - img.astype(float)).max() <= 4

    def test_color_420_subsampled(self):
        xs = np.linspace(0, 255, 32)
        smooth = np.dstack(
            [
                np.tile(xs, (24, 1)),
                np.tile(xs[::-1], (24, 1)),
                np.full((24, 32), 100.0),
            ]
        ).astype(np.uint8)
        dec = decode_jpeg_rgb(encode_color(smooth, (2, 2)))
        assert dec.shape == smooth.shape
        # chroma subsampling is lossy by design; luma-dominated error
        # stays small on a smooth gradient
        assert np.abs(dec.astype(float) - smooth.astype(float)).mean() < 8

    def test_restart_markers(self):
        rng = np.random.default_rng(13)
        img = rng.integers(0, 256, (19, 22, 3)).astype(np.uint8)
        dec = decode_jpeg_rgb(encode_color(img, (1, 1), restart=2))
        assert np.abs(dec.astype(float) - img.astype(float)).max() <= 4

    def test_non_jpeg_returns_none(self):
        assert decode_jpeg_rgb(b"") is None
        assert decode_jpeg_rgb(b"\x89PNG\r\n\x1a\n") is None

    def test_arithmetic_and_lossless_raise_named(self):
        rng = np.random.default_rng(7)
        data = bytearray(encode_gray(rng.integers(0, 256, (8, 8)).astype(float)))
        i = data.index(b"\xff\xc0")
        for sof in (0xC9, 0xC3):  # arithmetic sequential, lossless
            data[i + 1] = sof
            with pytest.raises(NotImplementedError, match="arithmetic/lossless"):
                decode_jpeg_rgb(bytes(data))


class TestProgressiveDecode:
    """SOF2: every scan shape the spec's Huffman progressive mode has —
    DC first/refine with point transform, AC band scans with EOB runs,
    two successive-approximation refinement passes, interleaved DC +
    non-interleaved AC for color."""

    def test_gray_bit_equal_to_baseline(self):
        rng = np.random.default_rng(41)
        img = rng.integers(0, 256, (24, 17)).astype(float)
        base = decode_jpeg_rgb(encode_gray(img))
        prog = decode_jpeg_rgb(encode_gray_progressive(img))
        assert (base == prog).all()

    def test_gray_lossy_quant_bit_equal(self):
        img = np.zeros((16, 16))
        img[:, :8] = 64
        img[:, 8:] = 192
        q = [16] * 64
        base = decode_jpeg_rgb(encode_gray(img, quant=q))
        prog = decode_jpeg_rgb(encode_gray_progressive(img, quant=q))
        assert (base == prog).all()

    def test_color_444_bit_equal(self):
        rng = np.random.default_rng(43)
        img = rng.integers(0, 256, (19, 22, 3)).astype(np.uint8)
        base = decode_jpeg_rgb(encode_color(img, (1, 1)))
        prog = decode_jpeg_rgb(encode_color_progressive(img, (1, 1)))
        assert (base == prog).all()

    def test_color_420_bit_equal(self):
        # subsampled chroma: the AC scans run on the component's own
        # block raster, smaller than the MCU-padded one
        rng = np.random.default_rng(47)
        img = rng.integers(0, 256, (21, 13, 3)).astype(np.uint8)
        base = decode_jpeg_rgb(encode_color(img, (2, 2)))
        prog = decode_jpeg_rgb(encode_color_progressive(img, (2, 2)))
        assert (base == prog).all()

    def test_restart_markers_in_every_scan(self):
        # RSTn every 2 blocks across DC-first, AC-first, AC-refine and
        # DC-refine scans: EOB runs must flush before each marker and
        # the decoder must reset predictors AND its EOB run
        rng = np.random.default_rng(53)
        img = rng.integers(0, 256, (24, 33)).astype(float)
        base = decode_jpeg_rgb(encode_gray(img))
        prog = decode_jpeg_rgb(encode_gray_progressive(img, restart=2))
        assert (base == prog).all()

    def test_property_random_gray(self):
        from hypothesis import given, settings, strategies as st

        @settings(max_examples=15, deadline=None)
        @given(
            h=st.integers(1, 40),
            w=st.integers(1, 40),
            seed=st.integers(0, 2**31 - 1),
        )
        def check(h, w, seed):
            rng = np.random.default_rng(seed)
            img = rng.integers(0, 256, (h, w)).astype(float)
            base = decode_jpeg_rgb(encode_gray(img))
            prog = decode_jpeg_rgb(encode_gray_progressive(img))
            assert (base == prog).all()

        check()

    def test_property_random_color_both_samplings(self):
        from hypothesis import given, settings, strategies as st

        @settings(max_examples=10, deadline=None)
        @given(
            h=st.integers(1, 32),
            w=st.integers(1, 32),
            seed=st.integers(0, 2**31 - 1),
            sub=st.sampled_from([(1, 1), (2, 2)]),
        )
        def check(h, w, seed, sub):
            rng = np.random.default_rng(seed)
            img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
            base = decode_jpeg_rgb(encode_color(img, sub))
            prog = decode_jpeg_rgb(encode_color_progressive(img, sub))
            assert (base == prog).all()

        check()


class TestSparkDecodePath:
    def test_decode_and_resize_reads_jpeg(self, spark, tmp_path):
        from batch_processing_system_spark.functions.multimodal import (
            decode_and_resize,
        )
        from batch_processing_system_spark.sources.binaryfile import (
            read_binary_dir,
        )

        rng = np.random.default_rng(23)
        img = rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)
        (tmp_path / "x.jpg").write_bytes(encode_color(img, (1, 1)))
        rows = decode_and_resize(
            read_binary_dir(spark, str(tmp_path)), 16, 16
        ).collect()
        assert len(rows) == 1
        got = np.array(rows[0]["pixels"], dtype=np.uint8).reshape(16, 16, 3)
        assert np.abs(got.astype(float) - img.astype(float)).max() <= 4

    def test_decode_and_resize_reads_progressive_jpeg(self, spark, tmp_path):
        from batch_processing_system_spark.functions.multimodal import (
            decode_and_resize,
        )
        from batch_processing_system_spark.sources.binaryfile import (
            read_binary_dir,
        )

        rng = np.random.default_rng(31)
        img = rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)
        (tmp_path / "p.jpg").write_bytes(encode_color_progressive(img, (1, 1)))
        rows = decode_and_resize(
            read_binary_dir(spark, str(tmp_path)), 16, 16
        ).collect()
        assert len(rows) == 1
        got = np.array(rows[0]["pixels"], dtype=np.uint8).reshape(16, 16, 3)
        assert np.abs(got.astype(float) - img.astype(float)).max() <= 4

    def test_metadata_sniff_reports_jpeg_dims(self, spark, tmp_path):
        from batch_processing_system_spark.functions.multimodal import (
            extract_media_metadata,
        )
        from batch_processing_system_spark.sources.binaryfile import (
            read_binary_dir,
        )

        rng = np.random.default_rng(29)
        img = rng.integers(0, 256, (20, 30, 3)).astype(np.uint8)
        (tmp_path / "y.jpg").write_bytes(encode_color(img, (2, 2)))
        [row] = extract_media_metadata(
            read_binary_dir(spark, str(tmp_path))
        ).collect()
        assert row["format"] == "jpeg"
        assert (row["width"], row["height"]) == (30, 20)


class TestJpegProperty:
    """Property: for ANY 8-bit image at quantizer=1, decode(encode(x))
    differs from x only by DCT rounding — bounded error, exact shape.
    Both the grayscale and color-4:4:4 paths, random dims including
    non-multiples of 8."""

    def test_random_grayscale_roundtrips(self):
        from hypothesis import given, settings, strategies as st

        @settings(max_examples=15, deadline=None)
        @given(
            h=st.integers(1, 40),
            w=st.integers(1, 40),
            seed=st.integers(0, 2**31 - 1),
        )
        def check(h, w, seed):
            rng = np.random.default_rng(seed)
            img = rng.integers(0, 256, (h, w)).astype(float)
            rgb = decode_jpeg_rgb(encode_gray(img))
            assert rgb.shape == (h, w, 3)
            assert np.abs(rgb[:, :, 0].astype(float) - img).max() <= 3

        check()

    def test_random_color_roundtrips(self):
        from hypothesis import given, settings, strategies as st

        @settings(max_examples=10, deadline=None)
        @given(
            h=st.integers(1, 32),
            w=st.integers(1, 32),
            seed=st.integers(0, 2**31 - 1),
        )
        def check(h, w, seed):
            rng = np.random.default_rng(seed)
            img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
            dec = decode_jpeg_rgb(encode_color(img, (1, 1)))
            assert dec.shape == img.shape
            assert np.abs(dec.astype(float) - img.astype(float)).max() <= 5

        check()
