"""Pure-Python Truevision TGA decode from the public TGA 2.0 spec:
uncompressed and RLE true-color/grayscale/color-mapped images, 8/15/
16/24/32-bit pixels, 15/16/24/32-bit palette entries, and all four
origin orientations (descriptor bits 4-5).

Reference surface: /root/reference/README.md:150-156 (multimodal
ingest). TGA has NO leading magic, so format sniffing (q99 /
extract_decode_stats) requires the TGA 2.0 footer signature
``TRUEVISION-XFILE.\\0`` in the file's last 26 bytes; ``decode_tga_rgb``
decodes footer-less v1 files too when called directly.

Determinism: 5-bit channel expansion is exact integer rounding
``(c * 255 + 15) // 31`` (documented divergence: some renderers use
``(c << 3) | (c >> 2)``, which differs by at most 1 for c in 4..27 —
pinned in tests so the choice stays deliberate).
"""

from __future__ import annotations

import struct

import numpy as np

from .guard import controlled_decode

FOOTER_SIG = b"TRUEVISION-XFILE.\x00"


def _expand5(c: np.ndarray) -> np.ndarray:
    return ((c.astype(np.uint32) * 255 + 15) // 31).astype(np.uint8)


def _pixels_to_rgb(raw: np.ndarray, bpp: int, n: int) -> np.ndarray:
    """(n * bytes_per_px,) uint8 -> (n, 3) uint8 RGB."""
    if bpp == 8:
        g = raw.reshape(n)
        return np.repeat(g[:, None], 3, axis=1)
    if bpp in (15, 16):
        v = raw.reshape(n, 2).astype(np.uint16)
        word = v[:, 0] | (v[:, 1] << 8)  # little-endian ARGB1555
        r = _expand5((word >> 10) & 0x1F)
        g = _expand5((word >> 5) & 0x1F)
        b = _expand5(word & 0x1F)
        return np.stack([r, g, b], axis=1)
    if bpp == 24:
        bgr = raw.reshape(n, 3)
        return bgr[:, ::-1].copy()
    if bpp == 32:
        bgra = raw.reshape(n, 4)
        return bgra[:, 2::-1].copy()  # B G R A -> R G B
    raise ValueError(f"tga: unsupported pixel depth {bpp}")


def _unrle(data: bytes, pos: int, n_px: int, bytes_px: int) -> np.ndarray:
    out = np.empty(n_px * bytes_px, dtype=np.uint8)
    filled = 0
    total = n_px * bytes_px
    while filled < total:
        if pos >= len(data):
            raise ValueError("tga: truncated RLE stream")
        head = data[pos]
        pos += 1
        count = (head & 0x7F) + 1
        if head & 0x80:  # run packet: one pixel repeated
            px = np.frombuffer(data[pos : pos + bytes_px], dtype=np.uint8)
            if px.size < bytes_px:
                raise ValueError("tga: truncated RLE run pixel")
            pos += bytes_px
            need = min(count * bytes_px, total - filled)
            out[filled : filled + need] = np.tile(px, count)[:need]
            filled += need
        else:  # raw packet
            nbytes = count * bytes_px
            chunk = np.frombuffer(data[pos : pos + nbytes], dtype=np.uint8)
            if chunk.size < nbytes:
                raise ValueError("tga: truncated RLE raw packet")
            pos += nbytes
            need = min(nbytes, total - filled)
            out[filled : filled + need] = chunk[:need]
            filled += need
    return out


@controlled_decode("TGA")
def decode_tga_rgb(data: bytes, require_footer: bool = False):
    """Decode a TGA image to an (h, w, 3) uint8 RGB array.

    Returns None when ``require_footer`` is set and the TGA 2.0 footer
    signature is absent (the sniffing mode q99 uses — TGA has no
    leading magic), or when the header is structurally impossible.
    Raises on a structurally valid but unsupported/corrupt file.
    """
    if require_footer and (
        len(data) < 44 or data[len(data) - 26 + 8 :][:18] != FOOTER_SIG
    ):
        return None
    if len(data) < 18:
        return None
    (
        id_len,
        cmap_type,
        img_type,
        cmap_first,
        cmap_len,
        cmap_bpp,
        _x0,
        _y0,
        w,
        h,
        bpp,
        desc,
    ) = struct.unpack("<BBBHHBHHHHBB", data[:18])
    if img_type not in (1, 2, 3, 9, 10, 11) or w == 0 or h == 0:
        return None
    pos = 18 + id_len
    cmap = None
    if cmap_type == 1:
        entry_bytes = (cmap_bpp + 7) // 8
        nbytes = cmap_len * entry_bytes
        raw = np.frombuffer(data[pos : pos + nbytes], dtype=np.uint8)
        if raw.size < nbytes:
            raise ValueError("tga: truncated color map")
        cmap = _pixels_to_rgb(raw, cmap_bpp, cmap_len)
        pos += nbytes
    bytes_px = (bpp + 7) // 8
    n_px = w * h
    if img_type >= 9:
        raw = _unrle(data, pos, n_px, bytes_px)
    else:
        nbytes = n_px * bytes_px
        raw = np.frombuffer(data[pos : pos + nbytes], dtype=np.uint8)
        if raw.size < nbytes:
            raise ValueError("tga: truncated raster")
    if img_type in (1, 9):  # color-mapped
        if cmap is None:
            raise ValueError("tga: color-mapped image without a color map")
        idx = raw.reshape(n_px).astype(np.int32) - cmap_first
        if idx.min(initial=0) < 0 or idx.max(initial=0) >= cmap_len:
            raise ValueError("tga: palette index out of range")
        rgb = cmap[idx]
    else:
        rgb = _pixels_to_rgb(raw, bpp, n_px)
    img = rgb.reshape(h, w, 3)
    if not desc & 0x20:  # bit 5 clear: bottom-to-top storage
        img = img[::-1]
    if desc & 0x10:  # bit 4: right-to-left storage
        img = img[:, ::-1]
    return np.ascontiguousarray(img)
