"""Native-vs-pure decode lane contract (decode_rgb_any /
decode_and_resize).

Pillow is NOT installed in this container (pip install is
unavailable), so the native lane is exercised through a FAKE PIL
module injected driver-side — a clearly-marked structural stand-in
whose ``open().convert('RGB')`` delegates to the repo's pure
decoders. What this pins is the dispatch contract itself:

- lane='pure' never touches PIL;
- lane='auto' falls back to pure when PIL is absent and prefers
  native when present;
- lane='native' raises NotImplementedError naming Pillow when absent;
- the native lane's output feeds the SAME deterministic
  _resize_nearest, so with a real Pillow the two lanes are
  pixel-identical on lossless formats (the fake proves the plumbing;
  the real-lib cross-check runs wherever Pillow exists).
"""

from __future__ import annotations

import glob
import io
import os

import numpy as np
import pytest

from batch_processing_system_spark.functions import multimodal as mm

FIXDIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "batch_processing_system_spark",
    "fixtures",
    "multimodal",
)

# lossless still-image fixtures (JPEG excluded: IDCTs legitimately
# differ within spec tolerance between implementations)
LOSSLESS_EXT = (".bmp", ".png", ".pnm", ".ppm", ".pgm", ".tga", ".tif",
                ".tiff", ".ico", ".qoi", ".pcx", ".ras", ".xbm")


def _still_fixtures():
    out = []
    for p in sorted(glob.glob(os.path.join(FIXDIR, "fx*"))):
        if p.lower().endswith(LOSSLESS_EXT):
            out.append(p)
    assert out, f"no still fixtures under {FIXDIR}"
    return out


class _FakeImage:
    """Stand-in for PIL.Image.Image backed by a decoded numpy array."""

    def __init__(self, arr: np.ndarray):
        self._arr = arr
        self.size = (arr.shape[1], arr.shape[0])

    def convert(self, mode):
        assert mode == "RGB"
        return self

    def __array__(self, dtype=None):
        return self._arr if dtype is None else self._arr.astype(dtype)


class _FakePIL:
    """Stand-in for the PIL.Image MODULE: decodes via the repo's pure
    chain (the real Pillow would use its C codecs — byte-identical on
    lossless formats by both specs)."""

    calls = 0

    def open(self, fp):
        _FakePIL.calls += 1
        data = fp.read() if isinstance(fp, io.BytesIO) else bytes(fp)
        rgb = mm.decode_rgb_any(data, lane="pure")
        return _FakeImage(rgb)


class TestLaneDispatch:
    def test_pure_and_fake_native_agree_on_lossless(self):
        fake = _FakePIL()
        for p in _still_fixtures():
            data = open(p, "rb").read()
            pure = mm.decode_rgb_any(data, lane="pure", path=p)
            native = mm.decode_rgb_any(
                data, lane="native", path=p, pil_module=fake
            )
            assert native.dtype == np.uint8 and native.shape == pure.shape, p
            assert np.array_equal(native, pure), p

    def test_native_lane_raises_without_pillow(self):
        data = open(_still_fixtures()[0], "rb").read()
        assert mm._PIL_Image is None, (
            "Pillow appeared in the container: drop the fake and let "
            "this suite cross-check the real lanes"
        )
        with pytest.raises(NotImplementedError, match="Pillow"):
            mm.decode_rgb_any(data, lane="native")

    def test_auto_prefers_native_and_falls_back(self):
        data = open(_still_fixtures()[0], "rb").read()
        before = _FakePIL.calls
        out = mm.decode_rgb_any(data, lane="auto", pil_module=_FakePIL())
        assert _FakePIL.calls == before + 1  # native consulted
        # PIL absent -> auto must silently use the pure chain
        fallback = mm.decode_rgb_any(data, lane="auto")
        assert np.array_equal(out, fallback)

    def test_unknown_lane_rejected(self, spark):
        with pytest.raises(ValueError, match="unknown lane"):
            mm.decode_and_resize(spark.range(0), 2, 2, lane="fast")

    def test_spark_pure_equals_auto_without_pillow(self, spark, tmp_path):
        import shutil

        from batch_processing_system_spark.sources.binaryfile import (
            read_binary_dir,
        )

        for p in _still_fixtures()[:4]:
            shutil.copy(p, tmp_path / os.path.basename(p))
        df = read_binary_dir(spark, str(tmp_path))
        got_auto = {
            r["path"]: r["pixels"]
            for r in mm.decode_and_resize(df, 4, 4, lane="auto").collect()
        }
        got_pure = {
            r["path"]: r["pixels"]
            for r in mm.decode_and_resize(df, 4, 4, lane="pure").collect()
        }
        assert got_auto == got_pure and len(got_pure) == 4
