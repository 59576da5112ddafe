"""Pure-Python Sun Rasterfile (.ras) decode from the public SunOS
rasterfile spec: big-endian 8-word header (magic 0x59A66A95),
standard and old types, BYTE_ENCODED RLE (0x80-escaped), RT_FORMAT_RGB
channel order, equal-RGB colormaps, 1/8/24/32-bit depths, and the
16-bit row rounding rule.

Reference surface: /root/reference/README.md:150-156 (multimodal
ingest). The tenth dependency-free still-image decoder — the classic
Unix-workstation raster that TIFF/PNG displaced.

Determinism: palette and channel reordering are pure index ops;
nothing to round.
"""

from __future__ import annotations

import struct

import numpy as np

from .guard import controlled_decode

_MAGIC = 0x59A66A95
RT_OLD, RT_STANDARD, RT_BYTE_ENCODED, RT_FORMAT_RGB = 0, 1, 2, 3


def _unrle(data: bytes, need: int) -> np.ndarray:
    out = np.empty(need, dtype=np.uint8)
    filled = 0
    pos = 0
    end = len(data)
    while filled < need:
        if pos >= end:
            raise ValueError("sunras: truncated RLE stream")
        b = data[pos]
        pos += 1
        if b == 0x80:
            if pos >= end:
                raise ValueError("sunras: truncated RLE escape")
            n = data[pos]
            pos += 1
            if n == 0:  # literal 0x80
                out[filled] = 0x80
                filled += 1
            else:
                if pos >= end:
                    raise ValueError("sunras: truncated RLE run value")
                v = data[pos]
                pos += 1
                take = min(n + 1, need - filled)
                out[filled : filled + take] = v
                filled += take
        else:
            out[filled] = b
            filled += 1
    return out


@controlled_decode("SUNRAS")
def decode_sunras_rgb(data: bytes):
    """Decode a Sun rasterfile to a top-down (h, w, 3) uint8 RGB
    array; None if the magic does not match."""
    if len(data) < 32:
        return None
    magic, w, h, depth, _length, rtype, maptype, maplen = struct.unpack(
        ">8i", data[:32]
    )
    if magic != _MAGIC:
        return None
    if rtype not in (RT_OLD, RT_STANDARD, RT_BYTE_ENCODED, RT_FORMAT_RGB):
        raise ValueError(f"sunras: unsupported type {rtype}")
    if depth not in (1, 8, 24, 32):
        raise ValueError(f"sunras: unsupported depth {depth}")
    if w <= 0 or h <= 0 or w * h > 256 * 1024 * 1024:
        raise ValueError(f"sunras: implausible dimensions {w}x{h}")
    pos = 32
    cmap = None
    if maptype == 1:  # RMT_EQUAL_RGB: R plane, G plane, B plane
        if maplen % 3 or pos + maplen > len(data):
            raise ValueError("sunras: bad colormap")
        n = maplen // 3
        raw = np.frombuffer(data[pos : pos + maplen], dtype=np.uint8)
        cmap = np.stack([raw[:n], raw[n : 2 * n], raw[2 * n :]], axis=1)
        pos += maplen
    elif maptype == 2:  # raw map: skip
        pos += maplen
    elif maptype != 0:
        raise ValueError(f"sunras: unsupported maptype {maptype}")

    # rows round up to 16-bit boundaries
    row_bits = w * depth
    stride = ((row_bits + 15) // 16) * 2
    need = stride * h
    if rtype == RT_BYTE_ENCODED:
        raw = _unrle(data[pos:], need)
    else:
        raw = np.frombuffer(data[pos : pos + need], dtype=np.uint8)
        if raw.size < need:
            raise ValueError("sunras: truncated raster")
    rows = raw.reshape(h, stride)
    if depth == 1:  # 1 = black (like PBM)
        bits = np.unpackbits(rows, axis=1)[:, :w]
        gray = ((1 - bits) * 255).astype(np.uint8)
        if cmap is not None and len(cmap) >= 2:
            return cmap[bits].astype(np.uint8)
        return np.repeat(gray[:, :, None], 3, axis=2)
    if depth == 8:
        idx = rows[:, :w]
        if cmap is None:
            return np.repeat(idx[:, :, None], 3, axis=2).copy()
        if idx.max(initial=0) >= len(cmap):
            raise ValueError("sunras: palette index out of range")
        return cmap[idx].astype(np.uint8)
    bypp = depth // 8
    px = rows[:, : w * bypp].reshape(h, w, bypp)
    if depth == 32:
        px = px[:, :, 1:]  # x/alpha byte FIRST in the word
    # BGR for old/standard/byte-encoded; RGB for RT_FORMAT_RGB
    if rtype == RT_FORMAT_RGB:
        return np.ascontiguousarray(px[:, :, :3])
    return np.ascontiguousarray(px[:, :, ::-1])
