"""AIFF/AIFF-C and ICO decoders vs the independent encoders in
tests/_aiff_ico_encoder.py: exact sample equality (lossless PCM), the
80-bit extended sample-rate quirk, sowt byte order, signed 8-bit,
largest-entry selection, AND-mask transparency, embedded PNG."""

from __future__ import annotations

import numpy as np
import pytest

from batch_processing_system_spark.functions.aiff import (
    _parse_extended80,
    decode_aiff,
)
from batch_processing_system_spark.functions.ico import decode_ico_rgb
from tests._aiff_ico_encoder import _extended80, encode_aiff, encode_ico


def _sig(n, scale, period):
    return [int(scale * ((i % period) - period // 2)) for i in range(n)]


class TestAiff:
    def test_16bit_stereo_exact(self):
        left = _sig(500, 60, 17)
        right = [-v for v in left]
        data = encode_aiff([left, right], 8000, 16)
        sr, ch, bits, x = decode_aiff(data)
        assert (sr, ch, bits) == (8000, 2, 16)
        assert x.reshape(-1, 2)[:, 0].tolist() == left
        assert x.reshape(-1, 2)[:, 1].tolist() == right

    def test_extended80_rates(self):
        for rate in (8000, 11025, 22050, 44100, 48000, 96000, 192000):
            assert _parse_extended80(_extended80(rate)) == rate

    def test_signed_8bit(self):
        mono = [-128, -1, 0, 1, 127] * 10
        sr, ch, bits, x = decode_aiff(encode_aiff([mono], 8000, 8))
        assert bits == 8 and x.tolist() == mono

    def test_24bit_and_ssnd_offset(self):
        mono = [-(1 << 23), -1, 0, 1, (1 << 23) - 1] * 4
        data = encode_aiff([mono], 44100, 24, ssnd_offset=8)
        sr, ch, bits, x = decode_aiff(data)
        assert (sr, bits) == (44100, 24) and x.tolist() == mono

    def test_aifc_sowt_little_endian(self):
        mono = _sig(200, 100, 23)
        big = decode_aiff(encode_aiff([mono], 22050, 16, aifc_comp=b"twos"))
        little = decode_aiff(encode_aiff([mono], 22050, 16, aifc_comp=b"sowt"))
        assert big[3].tolist() == little[3].tolist() == mono

    def test_perceptual_aifc_raises_named(self):
        data = encode_aiff([_sig(64, 50, 9)], 8000, 16, aifc_comp=b"ima4")
        with pytest.raises(NotImplementedError, match="ima4"):
            decode_aiff(data)

    def test_not_aiff_returns_none(self):
        assert decode_aiff(b"RIFF\x00\x00\x00\x00WAVE") is None
        assert decode_aiff(b"FORM\x00\x00\x00\x04XXXX") is None

    def test_truncated_ssnd_raises(self):
        data = encode_aiff([_sig(100, 50, 9)], 8000, 16)
        with pytest.raises(ValueError):
            decode_aiff(data[:-40])


def _grad(h, w):
    return [
        [((5 * y + 11 * x) % 256, (3 * y) % 256, (7 * x) % 256) for x in range(w)]
        for y in range(h)
    ]


class TestIco:
    def test_32bit_dib_exact(self):
        px = _grad(6, 6)
        got = decode_ico_rgb(encode_ico([(px, 32, None)]))
        assert (got == np.array(px, dtype=np.uint8)).all()

    def test_largest_entry_wins(self):
        small = _grad(4, 4)
        big = _grad(8, 8)
        got = decode_ico_rgb(encode_ico([(small, 32, None), (big, 32, None)]))
        assert got.shape == (8, 8, 3)
        assert (got == np.array(big, dtype=np.uint8)).all()

    def test_transparency_renders_black(self):
        px = [[(255, 255, 255)] * 4 for _ in range(4)]
        transparent = {(0, 0), (3, 3)}
        got = decode_ico_rgb(encode_ico([(px, 32, transparent)]))
        assert got[0, 0].tolist() == [0, 0, 0]
        assert got[3, 3].tolist() == [0, 0, 0]
        assert got[1, 1].tolist() == [255, 255, 255]

    def test_24bit_dib_with_mask(self):
        px = _grad(5, 3)
        transparent = {(2, 1)}
        got = decode_ico_rgb(encode_ico([(px, 24, transparent)]))
        expect = np.array(px, dtype=np.uint8)
        expect[2, 1] = 0
        assert (got == expect).all()

    def test_embedded_png_entry(self):
        from tests.test_multimodal import make_real_png

        px = _grad(9, 7)
        png = make_real_png(px, 2)
        got = decode_ico_rgb(encode_ico([("png", png, 7, 9)]))
        assert (got == np.array(px, dtype=np.uint8)).all()

    def test_not_ico_returns_none(self):
        assert decode_ico_rgb(b"BM\x00\x00\x00\x00") is None
        assert decode_ico_rgb(b"\x00\x00\x02\x00\x01\x00") is None  # .cur
