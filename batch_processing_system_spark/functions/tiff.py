"""Pure-Python baseline TIFF decoder (TIFF 6.0 public specification).

Scope — the still-image baseline profile:

- both byte orders (``II`` little / ``MM`` big endian), classic
  (magic 42) AND BigTIFF (magic 43: 8-byte offsets, 20-byte IFD
  entries, LONG8 types — the >4 GB large-imagery container)
- chunky planar config, strip-organized data (any RowsPerStrip) AND
  tiled layout (TileWidth/TileLength grids with edge-tile padding,
  the layout large-imagery TIFFs use)
- compressions: 1 (none), 32773 (PackBits RLE), 5 (LZW — TIFF
  variant: MSB-first bit packing + EARLY code-width change, unlike
  the GIF LZW in multimodal.py), 8/32946 (Deflate, official and
  legacy tag, zlib-wrapped per strip/tile), each optionally with
  Predictor 2 (horizontal differencing per sample)
- photometric 0/1 (gray, including WhiteIsZero inversion), 2 (RGB),
  3 (palette via ColorMap)
- bit depths: 1-bit bilevel, 8-bit, 16-bit (reduced to the high byte,
  the same convention as the PNG 16-bit path)

Everything else (planar=2, CCITT fax codings, JPEG-in-TIFF,
floating-point samples) raises ``ValueError``/``NotImplementedError``
naming the missing piece — the honest-stub discipline of the other
decoders. Output convention matches them: ``(h, w, 3)`` uint8 RGB
ndarray. Tested against the INDEPENDENT encoder in
tests/_tiff_encoder.py (own PackBits/LZW writers, no shared code).
"""

from __future__ import annotations

import struct

import numpy as np

from .guard import controlled_decode

_TYPE_SIZES = {
    1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8,
    16: 8, 17: 8, 18: 8,  # BigTIFF LONG8 / SLONG8 / IFD8
}


def _read_ifd_values(data: bytes, bo: str, entry: bytes, big: bool):
    """One IFD entry -> (tag, values). Classic layout: 12-byte entry,
    4-byte count/offset, <=4 bytes inline. BigTIFF: 20-byte entry,
    8-byte count/offset, <=8 bytes inline."""
    if big:
        tag, typ = struct.unpack(bo + "HH", entry[:4])
        count = struct.unpack(bo + "Q", entry[4:12])[0]
        inline, off_fmt, off_at = 8, "Q", 12
    else:
        tag, typ, count = struct.unpack(bo + "HHI", entry[:8])
        inline, off_fmt, off_at = 4, "I", 8
    size = _TYPE_SIZES.get(typ)
    if size is None:
        raise ValueError(f"TIFF: unknown field type {typ} for tag {tag}")
    total = size * count
    if total <= inline:
        raw = entry[off_at : off_at + total]
    else:
        off = struct.unpack(bo + off_fmt, entry[off_at : off_at + size_of(off_fmt)])[0]
        raw = data[off : off + total]
        if len(raw) < total:
            raise ValueError(f"TIFF: tag {tag} value runs past end of file")
    if typ == 3:
        vals = list(struct.unpack(bo + "H" * count, raw))
    elif typ == 4:
        vals = list(struct.unpack(bo + "I" * count, raw))
    elif typ in (16, 17, 18):
        vals = list(struct.unpack(bo + "Q" * count, raw))
    elif typ in (1, 6, 7, 2):
        vals = list(raw)
    else:
        # RATIONAL etc. — not needed for the baseline tags we read
        vals = list(raw)
    return tag, vals


def size_of(fmt: str) -> int:
    return struct.calcsize("<" + fmt)


def _unpackbits(src: bytes, expected: int) -> bytes:
    """PackBits (Apple RLE, TIFF spec appendix): n in [0,127] -> copy
    n+1 literals; n in [-127,-1] -> repeat next byte 1-n times; -128
    is a no-op."""
    out = bytearray()
    i = 0
    while i < len(src) and len(out) < expected:
        n = src[i]
        i += 1
        if n < 128:
            out += src[i : i + n + 1]
            i += n + 1
        elif n == 128:
            continue
        else:
            out += bytes([src[i]]) * (257 - n)
            i += 1
    if len(out) < expected:
        raise ValueError("TIFF: PackBits strip shorter than expected")
    return bytes(out[:expected])


def _lzw_decode(src: bytes, expected: int) -> bytes:
    """TIFF LZW: MSB-first code packing, codes 256=Clear / 257=EOI,
    dictionary grows from 258, code width bumps EARLY (when the next
    entry would be 511/1023/2047 — one code before the GIF variant)."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    table: list[bytes] = []

    def reset():
        nonlocal table, width
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9

    width = 9
    reset()
    bitbuf = 0
    nbits = 0
    prev: bytes | None = None
    for byte in src:
        bitbuf = (bitbuf << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (bitbuf >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == CLEAR:
                reset()
                prev = None
                continue
            if code == EOI:
                if len(out) < expected:
                    raise ValueError("TIFF: LZW EOI before strip complete")
                return bytes(out[:expected])
            if prev is None:
                if code >= len(table):
                    raise ValueError("TIFF: LZW first code out of range")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError("TIFF: LZW code out of range")
            out += entry
            prev = entry
            # early change, decoder side: the decoder's table lags the
            # encoder's by ONE entry (the encoder has already added the
            # pair for the code we are about to read), so width grows
            # at table size 510/1022/2046 — one earlier than the
            # encoder's own 511/1023/2047 threshold, two earlier than
            # GIF
            if len(table) + 2 >= (1 << width) and width < 12:
                width += 1
            if len(out) >= expected:
                return bytes(out[:expected])
    if len(out) < expected:
        raise ValueError("TIFF: LZW strip data exhausted early")
    return bytes(out[:expected])


@controlled_decode("TIFF")
def decode_tiff_rgb(content: bytes):
    """Decode a baseline TIFF to an (h, w, 3) uint8 RGB ndarray, or
    None if ``content`` is not a TIFF file at all."""
    if len(content) < 8 or content[:2] not in (b"II", b"MM"):
        return None
    bo = "<" if content[:2] == b"II" else ">"
    magic = struct.unpack(bo + "H", content[2:4])[0]
    if magic == 42:  # classic
        big = False
        ifd_off = struct.unpack(bo + "I", content[4:8])[0]
        n = struct.unpack(bo + "H", content[ifd_off : ifd_off + 2])[0]
        entries_at, entry_sz = ifd_off + 2, 12
    elif magic == 43:  # BigTIFF: 8-byte offsets throughout
        big = True
        offsize, pad = struct.unpack(bo + "HH", content[4:8])
        if offsize != 8 or pad != 0:
            raise ValueError("TIFF: malformed BigTIFF header")
        ifd_off = struct.unpack(bo + "Q", content[8:16])[0]
        n = struct.unpack(bo + "Q", content[ifd_off : ifd_off + 8])[0]
        entries_at, entry_sz = ifd_off + 8, 20
    else:
        return None
    tags: dict[int, list] = {}
    for i in range(n):
        e = content[entries_at + entry_sz * i : entries_at + entry_sz * (i + 1)]
        tag, vals = _read_ifd_values(content, bo, e, big)
        tags[tag] = vals

    def one(tag, default=None):
        v = tags.get(tag)
        if v is None:
            if default is None:
                raise ValueError(f"TIFF: required tag {tag} missing")
            return default
        return v[0]

    width = one(256)
    height = one(257)
    spp = one(277, 1)
    bits = tags.get(258, [1])
    if len(set(bits)) != 1:
        raise NotImplementedError("TIFF: mixed per-sample bit depths")
    depth = bits[0]
    compression = one(259, 1)
    photometric = one(262)
    planar = one(284, 1)
    predictor = one(317, 1)
    if planar != 1:
        raise NotImplementedError("TIFF: planar configuration 2 (separate planes)")
    if compression not in (1, 5, 8, 32946, 32773):
        raise NotImplementedError(
            f"TIFF: compression {compression} (only none/LZW/Deflate/PackBits)"
        )
    if depth not in (1, 8, 16):
        raise NotImplementedError(f"TIFF: {depth}-bit samples")
    if depth == 1 and (spp != 1 or photometric not in (0, 1)):
        raise NotImplementedError("TIFF: 1-bit is supported as bilevel gray only")
    if predictor not in (1, 2):
        raise NotImplementedError(f"TIFF: predictor {predictor}")
    if predictor == 2 and depth != 8:
        raise NotImplementedError("TIFF: predictor 2 only at 8-bit depth here")

    def _decode_block(block: bytes, nrows: int, ncols: int) -> bytes:
        """Decompress + un-predict one strip or tile of nrows×ncols."""
        if depth == 1:
            expected = ((ncols + 7) // 8) * nrows
        else:
            expected = ncols * spp * (depth // 8) * nrows
        if compression == 1:
            if len(block) < expected:
                raise ValueError("TIFF: uncompressed strip/tile too short")
            decoded = block[:expected]
        elif compression == 32773:
            decoded = _unpackbits(block, expected)
        elif compression in (8, 32946):  # Deflate (official + legacy tag)
            import zlib

            decoded = zlib.decompress(block)
            if len(decoded) < expected:
                raise ValueError("TIFF: deflate strip/tile shorter than expected")
            decoded = decoded[:expected]
        else:
            decoded = _lzw_decode(block, expected)
        if predictor == 2:
            arr = np.frombuffer(decoded, dtype=np.uint8).reshape(nrows, ncols, spp)
            decoded = (
                np.cumsum(arr, axis=1, dtype=np.uint32).astype(np.uint8).tobytes()
            )
        return decoded

    if 322 in tags:  # tiled layout (TileWidth/TileLength/TileOffsets)
        if depth == 1:
            raise NotImplementedError("TIFF: tiled bilevel images")
        tw = one(322)
        th = one(323)
        offsets = tags.get(324)
        counts = tags.get(325)
        if offsets is None or counts is None:
            raise ValueError("TIFF: tiled image missing tile offsets/byte counts")
        across = (width + tw - 1) // tw
        down = (height + th - 1) // th
        if len(offsets) < across * down:
            raise ValueError("TIFF: fewer tiles than the tile grid needs")
        dt = np.dtype(bo + "u2") if depth == 16 else np.uint8
        canvas = np.zeros((down * th, across * tw, spp), dtype=dt)
        for idx in range(across * down):
            ty, tx = divmod(idx, across)
            block = bytes(content[offsets[idx] : offsets[idx] + counts[idx]])
            decoded = _decode_block(block, th, tw)
            tile = np.frombuffer(decoded, dtype=dt).reshape(th, tw, spp)
            canvas[ty * th : (ty + 1) * th, tx * tw : (tx + 1) * tw] = tile
        # tiles pad to the grid; crop to the true image size
        raw = canvas[:height, :width].tobytes()
    else:
        offsets = tags.get(273)
        counts = tags.get(279)
        if offsets is None or counts is None:
            raise ValueError("TIFF: missing strip offsets/byte counts")
        rows_per_strip = one(278, height)
        raw = bytearray()
        row = 0
        for off, cnt in zip(offsets, counts):
            nrows = min(rows_per_strip, height - row)
            raw += _decode_block(bytes(content[off : off + cnt]), nrows, width)
            row += nrows
        if row < height:
            raise ValueError("TIFF: strips cover fewer rows than ImageLength")
        raw = bytes(raw)

    if depth == 1:
        row_bytes = (width + 7) // 8
        bits_arr = np.unpackbits(
            np.frombuffer(raw, dtype=np.uint8).reshape(height, row_bytes), axis=1
        )[:, :width]
        gray = (bits_arr * 255).astype(np.uint8)
        if photometric == 0:  # WhiteIsZero
            gray = 255 - gray
        return np.repeat(gray[:, :, None], 3, axis=2)

    if depth == 16:
        arr16 = np.frombuffer(raw, dtype=np.dtype(bo + "u2")).reshape(
            height, width, spp
        )
        arr = (arr16 >> 8).astype(np.uint8)  # high byte, like the PNG path
    else:
        arr = np.frombuffer(raw, dtype=np.uint8).reshape(height, width, spp)

    if photometric == 2:
        if spp < 3:
            raise ValueError("TIFF: RGB photometric with < 3 samples")
        return np.ascontiguousarray(arr[:, :, :3])
    if photometric == 3:
        cmap = tags.get(320)
        if cmap is None:
            raise ValueError("TIFF: palette image missing ColorMap")
        ncolors = 1 << depth
        if len(cmap) != 3 * ncolors:
            raise ValueError("TIFF: ColorMap length != 3 * 2^depth")
        # ColorMap entries are 16-bit; high byte is the 8-bit channel
        cm = (np.array(cmap, dtype=np.uint16) >> 8).astype(np.uint8)
        lut = np.stack(
            [cm[:ncolors], cm[ncolors : 2 * ncolors], cm[2 * ncolors :]], axis=1
        )
        return lut[arr[:, :, 0]]
    if photometric in (0, 1):
        gray = arr[:, :, 0]
        if photometric == 0:
            gray = 255 - gray
        return np.repeat(gray[:, :, None], 3, axis=2)
    raise NotImplementedError(f"TIFF: photometric {photometric}")
