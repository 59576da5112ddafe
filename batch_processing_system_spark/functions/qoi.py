"""Pure-Python QOI ("Quite OK Image", qoiformat.org, 2021) decode —
the complete public spec: QOI_OP_RGB/RGBA, 64-entry hash-index cache
(hash = (3r+5g+7b+11a) mod 64), 2-bit DIFF, LUMA (green-anchored
diffs), RUN (bias −1, 1..62), wrap-around byte arithmetic, and the
8-byte end marker. 3- and 4-channel images, both colorspaces (the
field is informative only).

Reference surface: /root/reference/README.md:150-156 (multimodal
ingest). QOI is the one MODERN still-image format simple enough to
decode dependency-free — lossless, so every comparison against the
independent encoder in tests is exact.
"""

from __future__ import annotations

import struct

import numpy as np

from .guard import controlled_decode

_MAGIC = b"qoif"
_END = b"\x00" * 7 + b"\x01"


@controlled_decode("QOI")
def decode_qoi_rgb(data: bytes):
    """Decode a QOI image to a top-down (h, w, 3) uint8 RGB array
    (alpha dropped, like the PNG still path); None if not QOI."""
    if len(data) < 14 or data[:4] != _MAGIC:
        return None
    w, h, channels, _colorspace = struct.unpack(">IIBB", data[4:14])
    if channels not in (3, 4):
        raise ValueError(f"qoi: illegal channel count {channels}")
    if w == 0 or h == 0 or w * h > 512 * 1024 * 1024:
        raise ValueError(f"qoi: implausible dimensions {w}x{h}")
    n_px = w * h
    out = np.empty((n_px, 4), dtype=np.uint8)
    index = [(0, 0, 0, 0)] * 64
    r, g, b, a = 0, 0, 0, 255
    pos = 14
    i = 0
    end = len(data)
    while i < n_px:
        if pos >= end:
            raise ValueError("qoi: truncated data stream")
        byte = data[pos]
        pos += 1
        if byte == 0xFE:  # QOI_OP_RGB
            if pos + 3 > end:
                raise ValueError("qoi: truncated RGB op")
            r, g, b = data[pos], data[pos + 1], data[pos + 2]
            pos += 3
        elif byte == 0xFF:  # QOI_OP_RGBA
            if pos + 4 > end:
                raise ValueError("qoi: truncated RGBA op")
            r, g, b, a = data[pos], data[pos + 1], data[pos + 2], data[pos + 3]
            pos += 4
        else:
            tag = byte >> 6
            if tag == 0:  # INDEX
                r, g, b, a = index[byte & 0x3F]
            elif tag == 1:  # DIFF, bias 2
                r = (r + ((byte >> 4) & 3) - 2) & 0xFF
                g = (g + ((byte >> 2) & 3) - 2) & 0xFF
                b = (b + (byte & 3) - 2) & 0xFF
            elif tag == 2:  # LUMA
                if pos >= end:
                    raise ValueError("qoi: truncated LUMA op")
                dg = (byte & 0x3F) - 32
                b2 = data[pos]
                pos += 1
                r = (r + dg + ((b2 >> 4) & 0x0F) - 8) & 0xFF
                g = (g + dg) & 0xFF
                b = (b + dg + (b2 & 0x0F) - 8) & 0xFF
            else:  # RUN, bias -1
                run = (byte & 0x3F) + 1
                if i + run > n_px:
                    raise ValueError("qoi: run past image end")
                out[i : i + run] = (r, g, b, a)
                i += run
                continue
        index[(r * 3 + g * 5 + b * 7 + a * 11) % 64] = (r, g, b, a)
        out[i] = (r, g, b, a)
        i += 1
    if data[pos : pos + 8] != _END:
        raise ValueError("qoi: missing end marker")
    return out[:, :3].reshape(h, w, 3).copy()
