"""Independently-written baseline TIFF encoder, used ONLY to generate
test inputs for ``functions/tiff.py`` (the multimodal independent-
encoder discipline: the decoder is verified against files produced by
code that shares nothing with it).

Own bit/byte machinery throughout: struct-based IFD writer, its own
PackBits run finder, and an LZW compressor with MSB-first packing and
the TIFF early-change rule (code width grows when the next free code
would exceed (1<<width)-2, mirroring libtiff's encoder)."""

from __future__ import annotations

import struct

import numpy as np


def packbits_encode(row: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(row)
    while i < n:
        # find run length at i
        j = i
        while j + 1 < n and row[j + 1] == row[i] and j - i < 126:
            j += 1
        run = j - i + 1
        if run >= 2:
            out += bytes([257 - run, row[i]])
            i = j + 1
        else:
            # literal stretch until a run of >=3 starts (2-byte runs are
            # cheaper folded into literals than switched)
            k = i
            while k < n and k - i < 127:
                if (
                    k + 2 < n
                    and row[k + 1] == row[k]
                    and row[k + 2] == row[k]
                ):
                    break
                k += 1
            out += bytes([k - i - 1]) + row[i:k]
            i = k
    return bytes(out)


class _LzwWriter:
    CLEAR, EOI = 256, 257

    def __init__(self):
        self.out = bytearray()
        self.bitbuf = 0
        self.nbits = 0

    def put(self, code: int, width: int):
        self.bitbuf = (self.bitbuf << width) | code
        self.nbits += width
        while self.nbits >= 8:
            self.out.append((self.bitbuf >> (self.nbits - 8)) & 0xFF)
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append((self.bitbuf << (8 - self.nbits)) & 0xFF)
            self.nbits = 0
        return bytes(self.out)


def lzw_encode(data: bytes) -> bytes:
    w = _LzwWriter()
    width = 9
    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    w.put(_LzwWriter.CLEAR, width)
    cur = b""
    for byte in data:
        cand = cur + bytes([byte])
        if cand in table:
            cur = cand
            continue
        w.put(table[cur], width)
        table[cand] = next_code
        next_code += 1
        # TIFF early change: grow when the NEXT code to assign would
        # exceed (1<<width)-2 (one earlier than GIF)
        if next_code > (1 << width) - 2:
            if width < 12:
                width += 1
            else:
                w.put(_LzwWriter.CLEAR, width)
                table = {bytes([i]): i for i in range(256)}
                next_code = 258
                width = 9
        cur = bytes([byte])
    if cur:
        w.put(table[cur], width)
    w.put(_LzwWriter.EOI, width)
    return w.flush()


def encode_tiff_tiled(
    arr: np.ndarray,
    *,
    endian: str = "<",
    tile_w: int = 16,
    tile_h: int = 16,
    compression: int = 1,
    predictor: int = 1,
    depth: int = 8,
) -> bytes:
    """Tiled-layout twin of encode_tiff: arr (h,w,3) RGB or (h,w) gray
    (depth 8, or 16 via v*257). Edge tiles are padded to the full tile
    size with zeros, per the TIFF 6.0 tiled-image rules (tags 322/323/
    324/325 replace the strip tags)."""
    bo = endian
    h, w = arr.shape[:2]
    if arr.ndim == 3:
        spp, photometric = 3, 2
        px = arr.astype(np.uint8)
        bits = [8, 8, 8]
    elif depth == 16:
        spp, photometric = 1, 1
        px = (arr.astype(np.uint16) * 257).astype(np.dtype(bo + "u2"))[:, :, None]
        bits = [16]
    else:
        spp, photometric = 1, 1
        px = arr.astype(np.uint8)[:, :, None]
        bits = [8]

    across = (w + tile_w - 1) // tile_w
    down = (h + tile_h - 1) // tile_h
    padded = np.zeros((down * tile_h, across * tile_w, spp), dtype=px.dtype)
    padded[:h, :w] = px

    tiles = []
    for ty in range(down):
        for tx in range(across):
            t = padded[
                ty * tile_h : (ty + 1) * tile_h, tx * tile_w : (tx + 1) * tile_w
            ]
            if predictor == 2:
                d = t.astype(np.int16)
                d = np.concatenate([d[:, :1], d[:, 1:] - d[:, :-1]], axis=1)
                t = (d & 0xFF).astype(np.uint8)
            blob = t.tobytes()
            if compression == 32773:
                rows = [
                    t[y].tobytes() for y in range(tile_h)
                ]  # PackBits restarts per row, matching the strip writer
                tiles.append(b"".join(packbits_encode(r) for r in rows))
            elif compression == 5:
                tiles.append(lzw_encode(blob))
            elif compression in (8, 32946):
                import zlib

                tiles.append(zlib.compress(blob, 6))
            else:
                tiles.append(blob)

    header = struct.pack(bo + "2sHI", b"II" if bo == "<" else b"MM", 42, 8)
    entries = [
        (256, 4, [w]),
        (257, 4, [h]),
        (258, 3, bits),
        (259, 3, [compression]),
        (262, 3, [photometric]),
        (277, 3, [spp]),
        (322, 4, [tile_w]),
        (323, 4, [tile_h]),
        (325, 4, [len(t) for t in tiles]),
    ]
    if predictor != 1:
        entries.append((317, 3, [predictor]))

    n_entries = len(entries) + 1  # + TileOffsets
    ifd_size = 2 + 12 * n_entries + 4
    overflow_at = 8 + ifd_size
    entries = entries + [(324, 4, [0] * len(tiles))]
    entries.sort(key=lambda e: e[0])

    blobs = {}
    for tag, typ, vals in entries:
        _head, payload = _ifd_entry(bo, tag, typ, vals)
        if payload is not None:
            blobs[tag] = len(payload)
    data_at = overflow_at + sum(blobs.values())
    offs = []
    pos = data_at
    for t in tiles:
        offs.append(pos)
        pos += len(t)
    entries = [
        (tag, typ, offs if tag == 324 else vals) for tag, typ, vals in entries
    ]

    ifd = struct.pack(bo + "H", n_entries)
    overflow = bytearray()
    overflow_pos = overflow_at
    for tag, typ, vals in entries:
        head, payload = _ifd_entry(bo, tag, typ, vals)
        if payload is None:
            ifd += head
        else:
            ifd += head + struct.pack(bo + "I", overflow_pos)
            overflow += payload
            overflow_pos += len(payload)
    ifd += struct.pack(bo + "I", 0)
    return header + ifd + bytes(overflow) + b"".join(tiles)


def encode_tiff_big(
    arr: np.ndarray,
    *,
    endian: str = "<",
    rows_per_strip: int | None = None,
    compression: int = 1,
    depth: int = 8,
) -> bytes:
    """Independent BigTIFF (magic 43) writer: 8-byte IFD offsets,
    8-byte entry counts, 20-byte entries with 8-byte inline values;
    strip offsets/counts written as LONG8 (type 16). arr (h,w,3) RGB
    or (h,w) gray (depth 8 or 16 via v*257)."""
    bo = endian
    h, w = arr.shape[:2]
    if arr.ndim == 3:
        spp, photometric, bits = 3, 2, [8, 8, 8]
        raw_rows = [arr[y].astype(np.uint8).tobytes() for y in range(h)]
    elif depth == 16:
        spp, photometric, bits = 1, 1, [16]
        wide = (arr.astype(np.uint16) * 257).astype(np.dtype(bo + "u2"))
        raw_rows = [wide[y].tobytes() for y in range(h)]
    else:
        spp, photometric, bits = 1, 1, [8]
        raw_rows = [arr[y].astype(np.uint8).tobytes() for y in range(h)]

    rps = rows_per_strip or h
    strips = []
    for top in range(0, h, rps):
        rows = raw_rows[top : top + rps]
        blob = b"".join(rows)
        if compression == 32773:
            strips.append(b"".join(packbits_encode(r) for r in rows))
        elif compression == 5:
            strips.append(lzw_encode(blob))
        elif compression in (8, 32946):
            import zlib

            strips.append(zlib.compress(blob, 6))
        else:
            strips.append(blob)

    # (tag, type, values); type 3 = SHORT, 16 = LONG8
    entries = [
        (256, 16, [w]),
        (257, 16, [h]),
        (258, 3, bits),
        (259, 3, [compression]),
        (262, 3, [photometric]),
        (273, 16, [0] * len(strips)),  # patched below
        (277, 3, [spp]),
        (278, 16, [rps]),
        (279, 16, [len(s) for s in strips]),
    ]
    entries.sort(key=lambda e: e[0])
    tsize = {3: 2, 16: 8}
    header = struct.pack(
        bo + "2sHHHQ", b"II" if bo == "<" else b"MM", 43, 8, 0, 16
    )
    ifd_size = 8 + 20 * len(entries) + 8
    overflow_at = 16 + ifd_size
    # size the overflow region (values whose payload exceeds 8 bytes)
    ov_sizes = {}
    for tag, typ, vals in entries:
        total = tsize[typ] * len(vals)
        if total > 8:
            ov_sizes[tag] = total
    data_at = overflow_at + sum(ov_sizes.values())
    offs = []
    pos = data_at
    for s in strips:
        offs.append(pos)
        pos += len(s)
    entries = [
        (tag, typ, offs if tag == 273 else vals) for tag, typ, vals in entries
    ]

    ifd = struct.pack(bo + "Q", len(entries))
    overflow = bytearray()
    overflow_pos = overflow_at
    for tag, typ, vals in entries:
        fmt = {3: "H", 16: "Q"}[typ]
        payload = struct.pack(bo + fmt * len(vals), *vals)
        head = struct.pack(bo + "HHQ", tag, typ, len(vals))
        if len(payload) <= 8:
            ifd += head + payload.ljust(8, b"\0")
        else:
            ifd += head + struct.pack(bo + "Q", overflow_pos)
            overflow += payload
            overflow_pos += len(payload)
    ifd += struct.pack(bo + "Q", 0)  # next-IFD pointer (LONG8)
    return header + ifd + bytes(overflow) + b"".join(strips)


def _ifd_entry(bo, tag, typ, values):
    sizes = {3: 2, 4: 4}
    fmt = {3: "H", 4: "I"}[typ]
    count = len(values)
    payload = struct.pack(bo + fmt * count, *values)
    if len(payload) <= 4:
        return struct.pack(bo + "HHI", tag, typ, count) + payload.ljust(4, b"\0"), None
    return struct.pack(bo + "HHI", tag, typ, count), payload


def encode_tiff(
    arr: np.ndarray,
    *,
    endian: str = "<",
    photometric: int | None = None,
    palette: np.ndarray | None = None,
    rows_per_strip: int | None = None,
    compression: int = 1,
    predictor: int = 1,
    bilevel: bool = False,
    depth: int = 8,
) -> bytes:
    """arr: (h,w) gray/palette-index or (h,w,3) RGB; palette: (n,3)
    uint8 when photometric=3; bilevel packs (h,w) 0/1 into 1-bit rows;
    depth=16 widens gray via v*257."""
    bo = endian
    h, w = arr.shape[:2]
    if arr.ndim == 3:
        spp = 3
        photometric = 2 if photometric is None else photometric
        raw_rows = [arr[y].astype(np.uint8).tobytes() for y in range(h)]
        bits = [8, 8, 8]
    elif bilevel:
        spp = 1
        photometric = 1 if photometric is None else photometric
        raw_rows = [np.packbits(arr[y].astype(np.uint8)).tobytes() for y in range(h)]
        bits = [1]
    elif depth == 16:
        spp = 1
        photometric = 1 if photometric is None else photometric
        wide = (arr.astype(np.uint16) * 257).astype(np.dtype(bo + "u2"))
        raw_rows = [wide[y].tobytes() for y in range(h)]
        bits = [16]
    else:
        spp = 1
        photometric = (3 if palette is not None else 1) if photometric is None else photometric
        raw_rows = [arr[y].astype(np.uint8).tobytes() for y in range(h)]
        bits = [8]

    rps = rows_per_strip or h
    strips = []
    for top in range(0, h, rps):
        rows = raw_rows[top : top + rps]
        if predictor == 2:
            diffed = []
            for r in rows:
                a = np.frombuffer(r, dtype=np.uint8).reshape(-1, spp).astype(np.int16)
                d = np.empty_like(a)
                d[0] = a[0]
                d[1:] = a[1:] - a[:-1]
                diffed.append((d & 0xFF).astype(np.uint8).tobytes())
            rows = diffed
        blob = b"".join(rows)
        if compression == 32773:
            strips.append(b"".join(packbits_encode(r) for r in rows))
        elif compression == 5:
            strips.append(lzw_encode(blob))
        elif compression in (8, 32946):
            import zlib

            strips.append(zlib.compress(blob, 6))
        else:
            strips.append(blob)

    header = struct.pack(bo + "2sHI", b"II" if bo == "<" else b"MM", 42, 8)
    entries = [
        (256, 4, [w]),
        (257, 4, [h]),
        (258, 3, bits),
        (259, 3, [compression]),
        (262, 3, [photometric]),
        (277, 3, [spp]),
        (278, 4, [rps]),
    ]
    if predictor != 1:
        entries.append((317, 3, [predictor]))
    if palette is not None:
        n = 1 << bits[0]
        pal = np.zeros((n, 3), dtype=np.uint16)
        pal[: palette.shape[0]] = palette.astype(np.uint16) * 257
        cmap = list(pal[:, 0]) + list(pal[:, 1]) + list(pal[:, 2])
        entries.append((320, 3, [int(v) for v in cmap]))

    # layout: header | IFD | overflow values | strip data
    n_entries = len(entries) + 2  # + StripOffsets + StripByteCounts
    ifd_size = 2 + 12 * n_entries + 4
    overflow_at = 8 + ifd_size
    fixed, overflow = [], bytearray()
    entries = entries + [
        (273, 4, [0] * len(strips)),  # placeholder, patched below
        (279, 4, [len(s) for s in strips]),
    ]
    entries.sort(key=lambda e: e[0])

    # first pass to size overflow (StripOffsets values unknown but sized)
    blobs = {}
    for tag, typ, vals in entries:
        head, payload = _ifd_entry(bo, tag, typ, vals)
        if payload is not None:
            blobs[tag] = len(payload)
    data_at = overflow_at + sum(blobs.values())
    offs = []
    pos = data_at
    for s in strips:
        offs.append(pos)
        pos += len(s)
    entries = [
        (tag, typ, offs if tag == 273 else vals) for tag, typ, vals in entries
    ]

    ifd = struct.pack(bo + "H", n_entries)
    overflow_pos = overflow_at
    for tag, typ, vals in entries:
        head, payload = _ifd_entry(bo, tag, typ, vals)
        if payload is None:
            ifd += head
        else:
            ifd += head + struct.pack(bo + "I", overflow_pos)
            overflow += payload
            overflow_pos += len(payload)
    ifd += struct.pack(bo + "I", 0)  # next-IFD pointer
    return header + ifd + bytes(overflow) + b"".join(strips)
