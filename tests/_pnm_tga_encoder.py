"""Independently written PNM and TGA ENCODERS for decoder tests —
written from the format specs, sharing no code with the decoders
(functions/pnm.py, functions/tga.py): its own tokens/packing, its own
RLE compressor, its own descriptor handling."""

from __future__ import annotations

import struct


def encode_pnm(pixels, kind: str, maxval: int = 255) -> bytes:
    """pixels: list of rows; gray rows are ints, color rows are
    (r, g, b) tuples — values already in 0..maxval. kind: one of
    P1..P6."""
    h = len(pixels)
    w = len(pixels[0])
    header = f"{kind}\n# independent encoder\n{w} {h}\n".encode()
    if kind not in ("P1", "P4"):
        header += f"{maxval}\n".encode()
    if kind == "P1":
        body = "\n".join(
            " ".join(str(v) for v in row) for row in pixels
        ).encode()
        return header + body + b"\n"
    if kind == "P2":
        body = "\n".join(
            " ".join(str(v) for v in row) for row in pixels
        ).encode()
        return header + body + b"\n"
    if kind == "P3":
        body = "\n".join(
            " ".join(f"{r} {g} {b}" for r, g, b in row) for row in pixels
        ).encode()
        return header + body + b"\n"
    if kind == "P4":
        out = bytearray(header)
        for row in pixels:
            byte = 0
            nbits = 0
            for v in row:
                byte = (byte << 1) | (v & 1)
                nbits += 1
                if nbits == 8:
                    out.append(byte)
                    byte = nbits = 0
            if nbits:
                out.append(byte << (8 - nbits))
        return bytes(out)
    wide = maxval > 255
    out = bytearray(header)
    for row in pixels:
        for px in row:
            vals = px if isinstance(px, tuple) else (px,)
            for v in vals:
                out += struct.pack(">H", v) if wide else bytes([v])
    return bytes(out)


def _rle_compress(pixels: list[bytes]) -> bytes:
    """Own RLE: greedy runs >= 2 as run packets, else raw packets."""
    out = bytearray()
    i = 0
    n = len(pixels)
    while i < n:
        run = 1
        while i + run < n and run < 128 and pixels[i + run] == pixels[i]:
            run += 1
        if run >= 2:
            out.append(0x80 | (run - 1))
            out += pixels[i]
            i += run
        else:
            j = i + 1
            while (
                j < n
                and j - i < 128
                and not (j + 1 < n and pixels[j + 1] == pixels[j])
            ):
                j += 1
            out.append((j - i) - 1)
            for k in range(i, j):
                out += pixels[k]
            i = j
    return bytes(out)


def encode_tga(
    rgb_rows,
    bpp: int = 24,
    rle: bool = False,
    top_down: bool = True,
    right_left: bool = False,
    gray: bool = False,
    palette=None,
    footer: bool = True,
    id_field: bytes = b"",
) -> bytes:
    """rgb_rows: rows of (r, g, b) tuples (or gray ints / palette
    indexes). bpp: 16, 24 or 32 for true color (16 quantizes to 5-bit
    channels); 8 for gray/palette."""
    h = len(rgb_rows)
    w = len(rgb_rows[0])
    if palette is not None:
        img_type, cmap_type = 1, 1
        cmap_len, cmap_bpp = len(palette), 24
    elif gray:
        img_type, cmap_type, cmap_len, cmap_bpp = 3, 0, 0, 0
    else:
        img_type, cmap_type, cmap_len, cmap_bpp = 2, 0, 0, 0
    if rle:
        img_type += 8
    desc = (0x20 if top_down else 0) | (0x10 if right_left else 0)
    head = struct.pack(
        "<BBBHHBHHHHBB",
        len(id_field), cmap_type, img_type, 0, cmap_len, cmap_bpp,
        0, 0, w, h, bpp, desc,
    )
    out = bytearray(head + id_field)
    if palette is not None:
        for r, g, b in palette:
            out += bytes([b, g, r])
    px_bytes = []
    for row in rgb_rows:
        for px in row:
            if palette is not None or gray:
                px_bytes.append(bytes([px]))
            elif bpp == 16:
                r, g, b = px
                word = ((r >> 3) << 10) | ((g >> 3) << 5) | (b >> 3)
                px_bytes.append(struct.pack("<H", word))
            elif bpp == 24:
                r, g, b = px
                px_bytes.append(bytes([b, g, r]))
            else:
                r, g, b = px
                px_bytes.append(bytes([b, g, r, 255]))
    if rle:
        out += _rle_compress(px_bytes)
    else:
        out += b"".join(px_bytes)
    if footer:
        out += struct.pack("<II", 0, 0) + b"TRUEVISION-XFILE.\x00"
    return bytes(out)
