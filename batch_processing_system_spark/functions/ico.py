"""Pure-Python Windows ICO decode from the public ICONDIR/BMP specs.

An .ico is a directory of images; each entry is either a PNG (magic
intact — delegated to the repo's PNG decoder) or a headerless DIB: a
BITMAPINFOHEADER whose biHeight is DOUBLED (XOR color rows + a 1-bit
AND transparency mask), bottom-up rows, BGRA/BGR/palette pixels.
``decode_ico_rgb`` returns the LARGEST entry (max w·h; ties -> first
directory order) as RGB.

Transparency: AND-masked pixels (and 32-bit pixels with alpha 0)
render as black (0,0,0) — the same documented sentinel the GIF
disposal-2 path uses, so digests are renderer-independent.

Reference surface: /root/reference/README.md:150-156 (multimodal
ingest).
"""

from __future__ import annotations

import struct

import numpy as np

from .guard import controlled_decode


def _decode_dib_entry(body: bytes):
    if len(body) < 40:
        raise ValueError("ico: truncated DIB header")
    (
        size,
        w,
        h2,
        _planes,
        bpp,
        comp,
        _imgsize,
        _xp,
        _yp,
        used,
        _imp,
    ) = struct.unpack("<IiihhIIiiII", body[:40])
    if size < 40 or comp != 0:
        raise ValueError(f"ico: unsupported DIB (size={size}, compression={comp})")
    h = h2 // 2
    if w <= 0 or h <= 0:
        raise ValueError("ico: non-positive DIB dimensions")
    pos = size
    palette = None
    if bpp <= 8:
        n_colors = used or (1 << bpp)
        pal_raw = np.frombuffer(
            body[pos : pos + 4 * n_colors], dtype=np.uint8
        )
        if pal_raw.size < 4 * n_colors:
            raise ValueError("ico: truncated DIB palette")
        palette = pal_raw.reshape(n_colors, 4)[:, 2::-1]  # BGRX -> RGB
        pos += 4 * n_colors

    def rows(bits_per_px: int) -> int:
        return ((w * bits_per_px + 31) // 32) * 4  # 4-byte aligned

    if bpp == 32:
        stride = rows(32)
        raw = np.frombuffer(body[pos : pos + stride * h], dtype=np.uint8)
        if raw.size < stride * h:
            raise ValueError("ico: truncated 32-bit XOR data")
        px = raw.reshape(h, stride)[:, : w * 4].reshape(h, w, 4)
        rgb = px[:, :, 2::-1].copy()
        alpha0 = px[:, :, 3] == 0
        rgb[alpha0] = 0
        pos += stride * h
    elif bpp == 24:
        stride = rows(24)
        raw = np.frombuffer(body[pos : pos + stride * h], dtype=np.uint8)
        if raw.size < stride * h:
            raise ValueError("ico: truncated 24-bit XOR data")
        rgb = raw.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)[:, :, ::-1].copy()
        pos += stride * h
    elif bpp in (1, 4, 8):
        stride = rows(bpp)
        raw = np.frombuffer(body[pos : pos + stride * h], dtype=np.uint8)
        if raw.size < stride * h:
            raise ValueError("ico: truncated paletted XOR data")
        rows_u8 = raw.reshape(h, stride)
        if bpp == 8:
            idx = rows_u8[:, :w]
        else:
            bits = np.unpackbits(rows_u8, axis=1)
            if bpp == 1:
                idx = bits[:, :w]
            else:  # 4-bit: regroup nibbles
                nib = bits.reshape(h, -1, 4)
                idx = (
                    (nib[:, :, 0] << 3)
                    | (nib[:, :, 1] << 2)
                    | (nib[:, :, 2] << 1)
                    | nib[:, :, 3]
                )[:, :w]
        if idx.max(initial=0) >= len(palette):
            raise ValueError("ico: palette index out of range")
        rgb = palette[idx].astype(np.uint8)
        pos += stride * h
    else:
        raise ValueError(f"ico: unsupported DIB depth {bpp}")

    # AND mask: 1 bit per pixel, rows 4-byte aligned; 1 = transparent
    mstride = rows(1)
    mraw = np.frombuffer(body[pos : pos + mstride * h], dtype=np.uint8)
    if mraw.size >= mstride * h and not (bpp == 32):
        mask = np.unpackbits(mraw.reshape(h, mstride), axis=1)[:, :w]
        rgb = rgb.copy()
        rgb[mask == 1] = 0
    return rgb[::-1].copy()  # bottom-up -> top-down


@controlled_decode("ICO")
def decode_ico_rgb(data: bytes):
    """Decode the largest image of an .ico to (h, w, 3) uint8 RGB;
    None if not an ICO (reserved/type/count sanity)."""
    if len(data) < 6 or data[:4] != b"\x00\x00\x01\x00":
        return None
    (count,) = struct.unpack("<H", data[4:6])
    if count == 0 or len(data) < 6 + 16 * count:
        return None
    entries = []
    for i in range(count):
        off = 6 + 16 * i
        bw, bh, _colors, _res, _planes, _bpp, size, offset = struct.unpack(
            "<BBBBHHII", data[off : off + 16]
        )
        w = bw or 256
        h = bh or 256
        entries.append((w * h, i, offset, size))
    _, _, offset, size = max(entries, key=lambda e: (e[0], -e[1]))
    body = data[offset : offset + size]
    if len(body) < size:
        raise ValueError("ico: directory entry exceeds file size")
    if body[:8] == b"\x89PNG\r\n\x1a\n":
        from .multimodal import _decode_png_rgb

        rgb = _decode_png_rgb(body)
        if rgb is None:
            raise ValueError("ico: embedded PNG failed to decode")
        return rgb
    return _decode_dib_entry(body)
