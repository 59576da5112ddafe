"""Independent AIFF and ICO ENCODERS for decoder tests — written from
the specs, sharing no code with functions/aiff.py / functions/ico.py:
its own 80-bit extended-float writer, its own DIB/mask packer."""

from __future__ import annotations

import struct


def _extended80(rate: int) -> bytes:
    """Integer sample rate -> 80-bit IEEE extended, normalized."""
    if rate <= 0:
        raise ValueError(rate)
    exp = 16383 + 63
    mant = rate
    while mant < (1 << 63):
        mant <<= 1
        exp -= 1
    while mant >= (1 << 64):
        mant >>= 1
        exp += 1
    return struct.pack(">H", exp) + mant.to_bytes(8, "big")


def encode_aiff(
    channels_samples,
    sample_rate: int,
    bits: int = 16,
    aifc_comp: bytes | None = None,
    ssnd_offset: int = 0,
) -> bytes:
    """channels_samples: list of per-channel int lists (equal length).
    aifc_comp: None -> plain AIFF; b'NONE'/b'sowt'/b'twos' -> AIFF-C."""
    ch = len(channels_samples)
    n = len(channels_samples[0])
    bps = bits // 8
    little = aifc_comp == b"sowt"
    frames = bytearray()
    for i in range(n):
        for c in range(ch):
            v = channels_samples[c][i]
            if bits == 8:
                frames += struct.pack("b", v)
            elif bits == 16:
                frames += struct.pack("<h" if little else ">h", v)
            elif bits == 24:
                u = v & 0xFFFFFF
                b3 = u.to_bytes(3, "little" if little else "big")
                frames += b3
            else:
                frames += struct.pack("<i" if little else ">i", v)
    form_type = b"AIFC" if aifc_comp else b"AIFF"
    comm_body = struct.pack(">hIh", ch, n, bits) + _extended80(sample_rate)
    if aifc_comp:
        comm_body += aifc_comp + b"\x00\x00"  # pstring name (empty, padded)
    ssnd_body = struct.pack(">II", ssnd_offset, 0) + b"\x00" * ssnd_offset + frames

    def chunk(cid: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) % 2 else b""
        return cid + struct.pack(">I", len(body)) + body + pad

    inner = chunk(b"COMM", comm_body) + chunk(b"SSND", ssnd_body)
    return b"FORM" + struct.pack(">I", 4 + len(inner)) + form_type + inner


def _dib_entry(rgb_rows, bpp: int = 32, transparent=None) -> bytes:
    """rgb_rows: top-down rows of (r,g,b); transparent: set of (y,x)
    marked in the AND mask (and alpha-0 for 32-bit)."""
    transparent = transparent or set()
    h = len(rgb_rows)
    w = len(rgb_rows[0])
    head = struct.pack(
        "<IiihhIIiiII", 40, w, 2 * h, 1, bpp, 0, 0, 0, 0, 0, 0
    )
    body = bytearray(head)
    # XOR rows, bottom-up, 4-byte aligned
    for y in range(h - 1, -1, -1):
        row = bytearray()
        for x in range(w):
            r, g, b = rgb_rows[y][x]
            if bpp == 32:
                a = 0 if (y, x) in transparent else 255
                row += bytes([b, g, r, a])
            else:
                row += bytes([b, g, r])
        while len(row) % 4:
            row += b"\x00"
        body += row
    # AND mask, bottom-up, 1 bit per px, 4-byte aligned
    for y in range(h - 1, -1, -1):
        bits = [1 if (y, x) in transparent else 0 for x in range(w)]
        row = bytearray()
        for i in range(0, len(bits), 8):
            byte = 0
            chunk8 = bits[i : i + 8] + [0] * (8 - len(bits[i : i + 8]))
            for bit in chunk8:
                byte = (byte << 1) | bit
            row.append(byte)
        while len(row) % 4:
            row += b"\x00"
        body += row
    return bytes(body)


def encode_ico(images) -> bytes:
    """images: list of (rgb_rows, bpp, transparent_set_or_None) DIB
    entries, or ('png', png_bytes, w, h) tuples."""
    entries = []
    bodies = []
    for img in images:
        if img[0] == "png":
            _, png, w, h = img
            bodies.append(png)
            entries.append((w, h))
        else:
            rgb_rows, bpp, transparent = img
            bodies.append(_dib_entry(rgb_rows, bpp, transparent))
            entries.append((len(rgb_rows[0]), len(rgb_rows)))
    out = bytearray(struct.pack("<HHH", 0, 1, len(images)))
    offset = 6 + 16 * len(images)
    for (w, h), body in zip(entries, bodies):
        out += struct.pack(
            "<BBBBHHII",
            0 if w >= 256 else w,
            0 if h >= 256 else h,
            0, 0, 1, 32, len(body), offset,
        )
        offset += len(body)
    for body in bodies:
        out += body
    return bytes(out)
