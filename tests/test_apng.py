"""APNG decoder vs the independent encoder in tests/_apng_encoder.py:
region offsets, dispose none/background/previous, blend source/over
(opaque and fully-transparent cases are renderer-exact; the one
semi-transparent case pins the documented integer compositing),
default-image exclusion, sequence validation."""

from __future__ import annotations

import numpy as np
import pytest

from batch_processing_system_spark.functions.apng import decode_apng_frames
from tests._apng_encoder import encode_apng


def _solid(w, h, rgba):
    return [[rgba] * w for _ in range(h)]


def _frame_px(frames, idx, w):
    delay, fw, fh, rgb = frames[idx]
    return np.frombuffer(rgb, dtype=np.uint8).reshape(fh, fw, 3)


class TestApng:
    def test_offsets_and_dispose_none(self):
        # 4x4 red canvas; frame 2 paints a 2x1 green patch at (1, 2)
        data = encode_apng(
            4, 4,
            [
                {"rows": _solid(4, 4, (255, 0, 0, 255))},
                {"rows": _solid(2, 1, (0, 255, 0, 255)), "x": 1, "y": 2},
            ],
        )
        frames = decode_apng_frames(data)
        assert len(frames) == 2
        f0 = _frame_px(frames, 0, 4)
        assert (f0 == [255, 0, 0]).all()
        f1 = _frame_px(frames, 1, 4)
        assert f1[2, 1].tolist() == [0, 255, 0]
        assert f1[2, 2].tolist() == [0, 255, 0]
        assert f1[0, 0].tolist() == [255, 0, 0]  # dispose none keeps base

    def test_dispose_background_clears_to_black_sentinel(self):
        data = encode_apng(
            2, 2,
            [
                {"rows": _solid(2, 2, (10, 20, 30, 255)), "dispose": 1},
                {"rows": _solid(1, 1, (200, 0, 0, 255))},
            ],
        )
        frames = decode_apng_frames(data)
        f1 = _frame_px(frames, 1, 2)
        assert f1[0, 0].tolist() == [200, 0, 0]
        # the rest was disposed to transparent -> black sentinel
        assert f1[1, 1].tolist() == [0, 0, 0]

    def test_dispose_previous_restores(self):
        data = encode_apng(
            2, 1,
            [
                {"rows": _solid(2, 1, (1, 2, 3, 255))},
                {"rows": _solid(1, 1, (9, 9, 9, 255)), "dispose": 2},
                {"rows": _solid(1, 1, (7, 7, 7, 255)), "x": 1},
            ],
        )
        frames = decode_apng_frames(data)
        f2 = _frame_px(frames, 2, 2)
        assert f2[0, 0].tolist() == [1, 2, 3]  # frame-1 patch restored away
        assert f2[0, 1].tolist() == [7, 7, 7]

    def test_blend_over_transparent_pixels_keep_base(self):
        # over-blend with alpha 0 leaves the base; alpha 255 replaces
        top = [[(0, 255, 0, 255), (0, 0, 0, 0)]]
        data = encode_apng(
            2, 1,
            [
                {"rows": _solid(2, 1, (255, 0, 0, 255))},
                {"rows": top, "blend": 1},
            ],
        )
        frames = decode_apng_frames(data)
        f1 = _frame_px(frames, 1, 2)
        assert f1[0, 0].tolist() == [0, 255, 0]
        assert f1[0, 1].tolist() == [255, 0, 0]

    def test_blend_source_replaces_even_transparent(self):
        top = [[(0, 255, 0, 255), (0, 0, 0, 0)]]
        data = encode_apng(
            2, 1,
            [
                {"rows": _solid(2, 1, (255, 0, 0, 255))},
                {"rows": top, "blend": 0},
            ],
        )
        frames = decode_apng_frames(data)
        f1 = _frame_px(frames, 1, 2)
        assert f1[0, 1].tolist() == [0, 0, 0]  # transparent -> sentinel

    def test_blend_over_semitransparent_documented_math(self):
        # sa=128 green over opaque red: the DOCUMENTED integer formula
        sa, sc = 128, (0, 255, 0)
        dc = (255, 0, 0)
        oa = sa + 255 * (255 - sa) // 255
        expect = [
            (c * sa * 255 + d * 255 * (255 - sa)) // (oa * 255)
            for c, d in zip(sc, dc)
        ]
        data = encode_apng(
            1, 1,
            [
                {"rows": _solid(1, 1, (255, 0, 0, 255))},
                {"rows": _solid(1, 1, (0, 255, 0, 128)), "blend": 1},
            ],
        )
        frames = decode_apng_frames(data)
        assert _frame_px(frames, 1, 1)[0, 0].tolist() == expect

    def test_default_image_not_a_frame(self):
        data = encode_apng(
            2, 2,
            [{"rows": _solid(2, 2, (5, 5, 5, 255))}],
            default_image=_solid(2, 2, (90, 90, 90, 255)),
        )
        frames = decode_apng_frames(data)
        assert len(frames) == 1
        assert (_frame_px(frames, 0, 2) == 5).all()

    def test_plain_png_returns_none(self):
        from tests.test_multimodal import make_real_png

        png = make_real_png([[(1, 2, 3)]], 2)
        assert decode_apng_frames(png) is None

    def test_bad_sequence_raises(self):
        data = bytearray(
            encode_apng(
                1, 1,
                [
                    {"rows": _solid(1, 1, (1, 1, 1, 255))},
                    {"rows": _solid(1, 1, (2, 2, 2, 255))},
                ],
            )
        )
        # corrupt the second fcTL's sequence number field
        idx = data.find(b"fcTL", data.find(b"fcTL") + 4)
        data[idx + 4 : idx + 8] = (99).to_bytes(4, "big")
        with pytest.raises(ValueError, match="sequence"):
            decode_apng_frames(bytes(data))

    def test_delay_milliseconds(self):
        data = encode_apng(
            1, 1,
            [
                {"rows": _solid(1, 1, (1, 1, 1, 255)), "delay": (1, 4)},
                {"rows": _solid(1, 1, (2, 2, 2, 255)), "delay": (7, 0)},
            ],
        )
        frames = decode_apng_frames(data)
        assert frames[0][0] == 250
        assert frames[1][0] == 70  # den 0 -> 100 per spec
