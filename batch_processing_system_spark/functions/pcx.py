"""Pure-Python ZSoft PCX decode from the public PCX spec: RLE
(0xC0-tagged runs), row-interleaved planes, bytes-per-line padding,
8-bit VGA-paletted (trailing 0x0C + 768-byte palette), 24-bit
3-plane true color, 1-bit monochrome, and the 16-color EGA header
palette for 4-bit images.

Reference surface: /root/reference/README.md:150-156 (multimodal
ingest). With BMP/PNG/JPEG/TIFF/PNM/TGA/ICO/QOI this closes the
still-image set at nine formats, every one decoded dependency-free.
"""

from __future__ import annotations

import struct

import numpy as np

from .guard import controlled_decode


def _unrle(data: bytes, pos: int, need: int) -> tuple[np.ndarray, int]:
    out = np.empty(need, dtype=np.uint8)
    filled = 0
    end = len(data)
    while filled < need:
        if pos >= end:
            raise ValueError("pcx: truncated RLE stream")
        b = data[pos]
        pos += 1
        if b >= 0xC0:
            if pos >= end:
                raise ValueError("pcx: truncated RLE run")
            run = b & 0x3F
            val = data[pos]
            pos += 1
            take = min(run, need - filled)
            out[filled : filled + take] = val
            filled += take
        else:
            out[filled] = b
            filled += 1
    return out, pos


@controlled_decode("PCX")
def decode_pcx_rgb(data: bytes):
    """Decode a PCX image to a top-down (h, w, 3) uint8 RGB array;
    None if not PCX (manufacturer byte / encoding sanity)."""
    if len(data) < 128 or data[0] != 0x0A:
        return None
    version, encoding, bpp = data[1], data[2], data[3]
    if encoding != 1 or version > 5:
        return None
    xmin, ymin, xmax, ymax = struct.unpack("<4H", data[4:12])
    nplanes = data[65]
    bytes_per_line = struct.unpack("<H", data[66:68])[0]
    w = xmax - xmin + 1
    h = ymax - ymin + 1
    if w <= 0 or h <= 0 or w * h > 256 * 1024 * 1024:
        raise ValueError(f"pcx: implausible dimensions {w}x{h}")
    combo = (bpp, nplanes)
    if combo not in ((8, 1), (8, 3), (1, 1), (4, 1), (1, 4)):
        raise ValueError(f"pcx: unsupported depth {bpp}bpp x {nplanes} planes")
    raw, pos = _unrle(data, 128, bytes_per_line * nplanes * h)
    rows = raw.reshape(h, nplanes, bytes_per_line)
    if combo == (8, 3):  # 24-bit: planes R, G, B per row
        return np.ascontiguousarray(
            np.stack([rows[:, c, :w] for c in range(3)], axis=2)
        )
    if combo == (8, 1):  # VGA palette appended after the image data
        if pos < len(data) and data[pos] == 0x0C and pos + 769 <= len(data):
            pal = np.frombuffer(data[pos + 1 : pos + 769], dtype=np.uint8).reshape(
                256, 3
            )
        else:
            raise ValueError("pcx: 8-bit image without a VGA palette block")
        return pal[rows[:, 0, :w]]
    if combo == (1, 1):  # monochrome: 1 = white
        bits = np.unpackbits(rows[:, 0, :], axis=1)[:, :w]
        return np.repeat((bits * 255).astype(np.uint8)[:, :, None], 3, axis=2)
    # 4-bit (or 1-bit x 4 planes): EGA palette from the header
    pal = np.frombuffer(data[16:64], dtype=np.uint8).reshape(16, 3)
    if combo == (4, 1):
        nib = np.unpackbits(rows[:, 0, :], axis=1)
        grouped = nib.reshape(h, -1, 4)
        idx = (
            (grouped[:, :, 0] << 3)
            | (grouped[:, :, 1] << 2)
            | (grouped[:, :, 2] << 1)
            | grouped[:, :, 3]
        )[:, :w]
    else:  # 1 bit x 4 planes: bit-plane composition
        planes = np.stack(
            [np.unpackbits(rows[:, c, :], axis=1)[:, :w] for c in range(4)],
            axis=0,
        )
        idx = (
            planes[0] | (planes[1] << 1) | (planes[2] << 2) | (planes[3] << 3)
        )
    return pal[idx]
