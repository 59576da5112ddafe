"""Multimodal feature extraction over binary columns (north-star
"multimodal columns": decode / feature-extract / resize / frame-sample
as Arrow-batched Python over mapInPandas).

What's real here vs stubbed (this container has no image/audio libs):

- REAL: the Spark plumbing — schemas, mapInPandas batch shape,
  partition behavior — pure-Python container-header parsing
  (PNG/GIF/BMP/JPEG dimensions, WAV sample rate/duration), and a
  pure-stdlib+numpy pixel decode + nearest-neighbor resize for
  uncompressed 24/32-bit BMP (BI_RGB). Header sniffing IS the
  production shape for metadata extraction: bytes stay in Arrow, no
  decoder needed — and the BMP path exercises the full
  decode→resize→array pipeline end to end.
- STUBBED: compressed-format pixel decode (PNG/GIF/JPEG need Pillow)
  and video frame-sampling (needs an AV library) raise
  NotImplementedError naming the dependency; the call signatures and
  output schemas are final so swapping the real library in changes
  no plan.
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

try:  # pragma: no cover - absent in this container
    from PIL import Image as _PIL_Image  # type: ignore
except Exception:
    _PIL_Image = None

MEDIA_META_SCHEMA = (
    "path string, length bigint, format string, width int, height int, "
    "sample_rate int, duration_ms bigint"
)


def _sniff(content: bytes | None) -> tuple:
    """(format, width, height, sample_rate, duration_ms) from container
    headers — pure byte arithmetic, no decoders."""
    if not content or len(content) < 12:
        return ("unknown", None, None, None, None)
    if content[:8] == b"\x89PNG\r\n\x1a\n" and len(content) >= 24:
        w, h = struct.unpack(">II", content[16:24])
        return ("png", w, h, None, None)
    if content[:6] in (b"GIF87a", b"GIF89a") and len(content) >= 10:
        w, h = struct.unpack("<HH", content[6:10])
        return ("gif", w, h, None, None)
    if content[:2] == b"BM" and len(content) >= 26:
        w, h = struct.unpack("<ii", content[18:26])
        return ("bmp", w, abs(h), None, None)
    if content[:3] == b"\xff\xd8\xff":
        # walk JPEG segments to the SOF marker for dimensions
        i = 2
        while i + 9 < len(content):
            if content[i] != 0xFF:
                break
            marker, seglen = content[i + 1], struct.unpack(">H", content[i + 2 : i + 4])[0]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = struct.unpack(">HH", content[i + 5 : i + 9])
                return ("jpeg", w, h, None, None)
            i += 2 + seglen
        return ("jpeg", None, None, None, None)
    if content[:4] == b"RIFF" and content[8:12] == b"WAVE" and len(content) >= 32:
        sample_rate = struct.unpack("<I", content[24:28])[0]
        byte_rate = struct.unpack("<I", content[28:32])[0]
        data_size = max(len(content) - 44, 0)
        dur = int(data_size * 1000 / byte_rate) if byte_rate else None
        return ("wav", None, None, sample_rate, dur)
    return ("unknown", None, None, None, None)


def extract_media_metadata(binary_df: DataFrame) -> DataFrame:
    """mapInPandas feature extraction: (path, content) batches in Arrow,
    typed metadata out. One Python crossing per batch, not per file."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [_sniff(c) for c in pdf["content"]]
            out = pd.DataFrame(
                metas, columns=["format", "width", "height", "sample_rate", "duration_ms"]
            )
            out.insert(0, "path", pdf["path"].values)
            out.insert(1, "length", pdf["length"].values)
            yield out

    return binary_df.select("path", "length", "content").mapInPandas(
        extract, MEDIA_META_SCHEMA
    )


def _decode_bmp_rgb(content: bytes):
    """Decode an uncompressed 24/32-bit BI_RGB BMP to a top-down
    (h, w, 3) uint8 RGB array — pure struct+numpy, no image library.
    Returns None for anything that isn't such a BMP."""
    import numpy as np

    if not content or len(content) < 54 or content[:2] != b"BM":
        return None
    data_off = struct.unpack("<I", content[10:14])[0]
    dib_size = struct.unpack("<I", content[14:18])[0]
    if dib_size < 40:
        return None
    w, h = struct.unpack("<ii", content[18:26])
    bpp = struct.unpack("<H", content[28:30])[0]
    compression = struct.unpack("<I", content[30:34])[0]
    if compression != 0 or bpp not in (24, 32) or w <= 0 or h == 0:
        return None
    top_down, h_abs = h < 0, abs(h)
    nbytes = bpp // 8
    stride = ((w * nbytes + 3) // 4) * 4  # rows pad to 4-byte boundaries
    if len(content) < data_off + stride * h_abs:
        return None
    arr = np.frombuffer(content, dtype=np.uint8, count=stride * h_abs, offset=data_off)
    arr = arr.reshape(h_abs, stride)[:, : w * nbytes].reshape(h_abs, w, nbytes)
    if not top_down:
        arr = arr[::-1]
    return arr[:, :, [2, 1, 0]]  # stored BGR(A) → RGB


def _resize_nearest(rgb, width: int, height: int):
    """Nearest-neighbor resample of a (h, w, 3) array — index
    arithmetic only, so results are deterministic everywhere."""
    import numpy as np

    h0, w0 = rgb.shape[:2]
    ys = np.arange(height) * h0 // height
    xs = np.arange(width) * w0 // width
    return rgb[ys][:, xs]


def decode_and_resize(binary_df: DataFrame, width: int, height: int) -> DataFrame:
    """Pixel decode + resize → flattened RGB array column, schema
    (path string, pixels array<int>), row-major top-down RGB triplets.

    Two execution paths, chosen per file inside the Arrow batch:
    - Pillow, when importable (any format it reads);
    - a pure-stdlib+numpy decoder for uncompressed 24/32-bit BMP
      (BI_RGB) with nearest-neighbor resize — always available.
    A file neither path can decode raises NotImplementedError naming
    the missing dependency (surfaced through the task failure).
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                if _PIL_Image is not None:  # pragma: no cover - lib absent here
                    img = (
                        _PIL_Image.open(io.BytesIO(content))
                        .convert("RGB")
                        .resize((width, height))
                    )
                    rows.append((path, [b for px in img.getdata() for b in px]))
                    continue
                rgb = _decode_bmp_rgb(bytes(content) if content is not None else b"")
                if rgb is None:
                    raise NotImplementedError(
                        f"decode_and_resize: {path!r} is not an uncompressed "
                        "BMP and Pillow (PIL) is not installed; install "
                        "Pillow for PNG/GIF/JPEG decode"
                    )
                rows.append(
                    (path, [int(v) for v in _resize_nearest(rgb, width, height).ravel()])
                )
            yield pd.DataFrame(rows, columns=["path", "pixels"])

    return binary_df.select("path", "content").mapInPandas(
        decode, "path string, pixels array<int>"
    )


def sample_video_frames(binary_df: DataFrame, every_ms: int) -> DataFrame:
    """Video frame sampling stub — no AV library in this container.
    Final contract: (path string, frame_ms bigint, frame binary)."""
    raise NotImplementedError(
        "sample_video_frames needs an AV decoder (e.g. PyAV/ffmpeg), not "
        "installed here; the output contract is (path, frame_ms, frame)"
    )
