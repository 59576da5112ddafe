"""Independent APNG ENCODER for decoder tests — written from the APNG
spec, sharing no code with functions/apng.py: its own chunk/CRC
writer, its own filter-0 scanline packer, its own sequence numbering."""

from __future__ import annotations

import struct
import zlib


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body))
    )


def _pack_rgba(rows) -> bytes:
    raw = bytearray()
    for row in rows:
        raw.append(0)  # filter 0
        for r, g, b, a in row:
            raw += bytes([r, g, b, a])
    return zlib.compress(bytes(raw))


def encode_apng(
    canvas_w: int,
    canvas_h: int,
    frames,
    default_image=None,
    num_plays: int = 0,
) -> bytes:
    """frames: list of dicts with keys rows (RGBA tuples), x, y,
    delay (num, den), dispose, blend. default_image: optional full
    RGBA rows emitted as IDAT BEFORE the first fcTL (not part of the
    animation; frames then all use fdAT)."""
    out = bytearray(b"\x89PNG\r\n\x1a\n")
    out += _chunk(
        b"IHDR", struct.pack(">IIBBBBB", canvas_w, canvas_h, 8, 6, 0, 0, 0)
    )
    out += _chunk(b"acTL", struct.pack(">II", len(frames), num_plays))
    seq = 0
    for i, f in enumerate(frames):
        rows = f["rows"]
        fh = len(rows)
        fw = len(rows[0])
        dnum, dden = f.get("delay", (1, 10))
        fctl = struct.pack(
            ">IIIIIHHBB",
            seq, fw, fh, f.get("x", 0), f.get("y", 0),
            dnum, dden, f.get("dispose", 0), f.get("blend", 0),
        )
        out += _chunk(b"fcTL", fctl)
        seq += 1
        payload = _pack_rgba(rows)
        if i == 0 and default_image is None:
            out += _chunk(b"IDAT", payload)
        else:
            out += _chunk(b"fdAT", struct.pack(">I", seq) + payload)
            seq += 1
    if default_image is not None:
        # splice the default image's IDAT right after acTL (before the
        # first fcTL): rebuild with the IDAT inserted
        head = bytes(out[: 8 + 25 + 20])  # sig + IHDR chunk + acTL chunk
        tail = bytes(out[8 + 25 + 20 :])
        out = bytearray(head)
        out += _chunk(b"IDAT", _pack_rgba(default_image))
        out += tail
    out += _chunk(b"IEND", b"")
    return bytes(out)
