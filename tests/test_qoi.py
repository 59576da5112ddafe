"""QOI decoder vs the independent encoder in tests/_qoi_encoder.py:
every op class exercised (RUN/INDEX/DIFF/LUMA/RGB/RGBA), wrap-around
diffs, alpha dropping, hypothesis-random round-trips, corrupt cases."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from batch_processing_system_spark.functions.qoi import decode_qoi_rgb
from tests._qoi_encoder import encode_qoi


class TestQoi:
    def test_gradient_exact(self):
        px = [
            [((13 * y + 29 * x) % 256, (7 * y) % 256, (3 * x) % 256) for x in range(9)]
            for y in range(7)
        ]
        got = decode_qoi_rgb(encode_qoi(px))
        assert (got == np.array(px, dtype=np.uint8)).all()

    def test_runs_and_index_hits(self):
        # long solid runs (RUN, incl. >62 splits) then a repeat of an
        # earlier color (INDEX)
        px = [[(10, 20, 30)] * 100 + [(200, 100, 50)] * 3 + [(10, 20, 30)] * 2]
        got = decode_qoi_rgb(encode_qoi(px))
        assert (got[0, :100] == [10, 20, 30]).all()
        assert (got[0, 103:] == [10, 20, 30]).all()

    def test_diff_luma_wraparound(self):
        # consecutive pixels with small diffs incl. 255->0 wrap
        px = [[(255, 255, 255), (0, 0, 1), (4, 18, 12), (250, 10, 8)]]
        got = decode_qoi_rgb(encode_qoi(px))
        assert (got == np.array(px, dtype=np.uint8)).all()

    def test_rgba_alpha_dropped(self):
        px = [[(1, 2, 3, 4), (5, 6, 7, 200)]]
        got = decode_qoi_rgb(encode_qoi(px, channels=4))
        assert got[0, 0].tolist() == [1, 2, 3]
        assert got[0, 1].tolist() == [5, 6, 7]

    def test_not_qoi_and_corrupt(self):
        assert decode_qoi_rgb(b"BM\x00\x00") is None
        data = encode_qoi([[(9, 9, 9)] * 4])
        with pytest.raises(ValueError):
            decode_qoi_rgb(data[:-9])  # missing end marker
        with pytest.raises(ValueError):
            decode_qoi_rgb(data[:16])  # truncated stream

    @given(
        w=st.integers(1, 12),
        h=st.integers(1, 10),
        seed=st.integers(0, 10_000),
        smooth=st.booleans(),
    )
    @settings(max_examples=50, deadline=None)
    def test_random_roundtrip(self, w, h, seed, smooth):
        rng = np.random.default_rng(seed)
        if smooth:
            # small neighbor deltas exercise DIFF/LUMA heavily
            base = rng.integers(0, 256, 3)
            px, cur = [], base
            for _ in range(h):
                row = []
                for _ in range(w):
                    cur = (cur + rng.integers(-3, 4, 3)) % 256
                    row.append(tuple(int(v) for v in cur))
                px.append(row)
        else:
            px = [
                [tuple(int(v) for v in rng.integers(0, 256, 3)) for _ in range(w)]
                for _ in range(h)
            ]
        got = decode_qoi_rgb(encode_qoi(px))
        assert (got == np.array(px, dtype=np.uint8)).all()
