"""Pure-Python X BitMap (XBM) decode — the X11 C-source bitmap format:
``#define <name>_width W`` / ``#define <name>_height H`` and a
``static [unsigned] char <name>_bits[] = {0x.., ...}`` initializer.
Bits pack LSB-FIRST within each byte (the opposite of PBM), rows pad
to whole bytes, set bits are FOREGROUND (rendered black, like PBM's
1=black). X10 variant (``short`` arrays) is accepted by reading each
16-bit word little-endian.

Reference surface: /root/reference/README.md:150-156 (multimodal
ingest). The only TEXT-based image format in the set — it stresses a
completely different parsing lane (token scan, not byte structs).
"""

from __future__ import annotations

import re

import numpy as np

from .guard import controlled_decode

_WIDTH_RE = re.compile(rb"#define\s+\w*_?width\s+(\d+)")
_HEIGHT_RE = re.compile(rb"#define\s+\w*_?height\s+(\d+)")
_BITS_RE = re.compile(
    rb"(?:unsigned\s+)?(char|short)\s+\w*_?bits\s*\[\s*\]\s*=\s*\{([^}]*)\}",
    re.S,
)
_VAL_RE = re.compile(rb"0[xX][0-9a-fA-F]+|\d+")


@controlled_decode("XBM")
def decode_xbm_rgb(data: bytes):
    """Decode an XBM to a top-down (h, w, 3) uint8 RGB array (set
    bits -> black); None when the defines/initializer are absent."""
    if b"#define" not in data[:4096]:
        return None
    wm = _WIDTH_RE.search(data)
    hm = _HEIGHT_RE.search(data)
    bm = _BITS_RE.search(data)
    if not (wm and hm and bm):
        return None
    w = int(wm.group(1))
    h = int(hm.group(1))
    if w <= 0 or h <= 0 or w * h > 256 * 1024 * 1024:
        raise ValueError(f"xbm: implausible dimensions {w}x{h}")
    vals = [int(v, 0) for v in (x.decode() for x in _VAL_RE.findall(bm.group(2)))]
    if bm.group(1) == b"short":  # X10: LE 16-bit words -> byte pairs
        bytes_list = []
        for v in vals:
            if not 0 <= v <= 0xFFFF:
                raise ValueError(f"xbm: short value {v} out of range")
            bytes_list += [v & 0xFF, v >> 8]
        vals = bytes_list
    if any(not 0 <= v <= 0xFF for v in vals):
        raise ValueError("xbm: byte value out of range")
    stride = (w + 7) // 8
    if len(vals) < stride * h:
        raise ValueError(
            f"xbm: {len(vals)} bytes for {stride * h} expected"
        )
    arr = np.array(vals[: stride * h], dtype=np.uint8).reshape(h, stride)
    bits = np.unpackbits(arr, axis=1, bitorder="little")[:, :w]
    gray = ((1 - bits) * 255).astype(np.uint8)
    return np.repeat(gray[:, :, None], 3, axis=2)
