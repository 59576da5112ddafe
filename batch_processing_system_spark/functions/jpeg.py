"""JPEG (ITU-T T.81) pixel decoder — pure Python + numpy, no codec
library: baseline sequential DCT (SOF0) and progressive DCT (SOF2).

Closes the still-image decode gaps of the multimodal family
(north-star X5): the container ships no Pillow, but Huffman JPEG is
buildable from the public spec exactly like round 2's GIF-LZW and
PNG-unfilter work — segment walk, canonical Huffman entropy decode,
dequantize + dezigzag, 8x8 inverse DCT as one numpy matrix sandwich,
chroma upsample, YCbCr→RGB.

Both frame types share one dataflow: every scan decodes into
per-component zigzag-ordered coefficient arrays (baseline is simply
the one-scan case with the full 0..63 band and no successive
approximation), and rendering happens once at EOI — dequantize,
de-zigzag, IDCT vectorized across ALL blocks per component (a single
batched 8x8 matrix sandwich), upsample, color-convert.

Progressive support covers the full T.81 Huffman feature set:
spectral selection (per-band scans with EOB-run coding), successive
approximation (DC/AC first and refinement passes, correction bits),
interleaved DC scans, non-interleaved AC scans with the component's
own block geometry, restart markers in any scan.

Still out of scope (named, raising): arithmetic coding, lossless and
hierarchical frames, 12-bit precision — a different entropy layout or
sample model, not a bigger table.

Decode cost model for the Spark side: one batched numpy IDCT per
component — the mapInPandas batch loop stays vectorized with no
per-pixel Python. Executor memory is O(one image).
"""

from __future__ import annotations

import struct

import numpy as np

from .guard import controlled_decode

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])

# IDCT basis: spatial = C.T @ coeffs @ C with C[u, x] the orthonormal
# DCT-II matrix — one batched matrix sandwich per component, in numpy.
_C = np.zeros((8, 8))
for _u in range(8):
    _alpha = (1 / 8) ** 0.5 if _u == 0 else (2 / 8) ** 0.5
    for _x in range(8):
        _C[_u, _x] = _alpha * np.cos((2 * _x + 1) * _u * np.pi / 16)


class _Huff:
    """Canonical Huffman table from a DHT segment (16 counts +
    symbols), decoded MSB-first via (length, code) lookup."""

    def __init__(self, counts: list[int], symbols: bytes):
        self.lookup: dict[tuple[int, int], int] = {}
        code, k = 0, 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                self.lookup[(length, code)] = symbols[k]
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment: unstuffs
    0xFF00, stops at markers, realigns at restarts."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bits = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2  # stuffed
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(nxt)
            else:
                raise EOFError("marker inside entropy stream")
        else:
            self.pos += 1
        self.bits = (self.bits << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bits >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode(self, table: _Huff) -> int:
        length, code = 0, 0
        while length < 16:
            code = (code << 1) | self.read_bit()
            length += 1
            sym = table.lookup.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")

    def align_after_restart(self) -> None:
        # consume the RSTn marker and restart on a byte boundary
        self.bits = 0
        self.nbits = 0
        self.pos += 2


class _RestartMarker(ValueError):
    # ValueError subclass: internally this is control flow (the scan
    # decoder catches it at restart intervals), but on a CORRUPT
    # stream it can surface from the bit reader in a place no handler
    # expects — subclassing ValueError keeps the escape inside the
    # controlled-decode contract (tests/test_corrupt_media.py).
    def __init__(self, marker: int):
        self.marker = marker


def _extend(v: int, t: int) -> int:
    """JPEG receive-extend: t-bit magnitude v to signed value."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


@controlled_decode("JPEG")
def decode_jpeg_rgb(content: bytes):
    """Decode a baseline (SOF0) or progressive (SOF2) JPEG into
    (h, w, 3) uint8 RGB, or None when ``content`` is not a JPEG at
    all. Raises NotImplementedError for arithmetic/lossless/
    hierarchical variants."""
    if not content or content[:2] != b"\xff\xd8":
        return None
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _Huff] = {}
    huff_ac: dict[int, _Huff] = {}
    frame = None
    geom = None
    coefs = None
    restart_interval = 0
    pos = 2
    n = len(content)
    while pos < n - 1:
        if content[pos] != 0xFF:
            pos += 1
            continue
        marker = content[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:  # EOI
            break
        seglen = struct.unpack(">H", content[pos + 2 : pos + 4])[0]
        seg = content[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 15
                if pq:
                    tbl = np.frombuffer(seg[i + 1 : i + 129], dtype=">u2").astype(np.int32)
                    i += 129
                else:
                    tbl = np.frombuffer(seg[i + 1 : i + 65], dtype=np.uint8).astype(np.int32)
                    i += 65
                qt[tq] = tbl
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                counts = list(seg[i + 1 : i + 17])
                nsym = sum(counts)
                table = _Huff(counts, seg[i + 17 : i + 17 + nsym])
                (huff_ac if tc else huff_dc)[th] = table
                i += 17 + nsym
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise NotImplementedError("only 8-bit JPEG precision supported")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps, "progressive": marker == 0xC2}
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise NotImplementedError(
                "only baseline (SOF0) and progressive (SOF2) Huffman JPEG "
                f"are supported; marker 0xFF{marker:02X} is an "
                "arithmetic/lossless/hierarchical frame"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scomps = []
            for c in range(ns):
                cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                scomps.append((cs, tt >> 4, tt & 15))
            ss, se, ahal = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 15
            if coefs is None:
                geom = _geometry(frame)
                coefs = [
                    np.zeros((g["bh"], g["bw"], 64), dtype=np.int32) for g in geom
                ]
            pos = _decode_scan_into(
                content, pos + 2 + seglen, geom, coefs, scomps,
                ss, se, ah, al, huff_dc, huff_ac, restart_interval,
            )
            continue
        pos += 2 + seglen
    if coefs is None:
        raise ValueError("no SOS segment found")
    return _render(frame, geom, coefs, qt)


def _geometry(frame) -> list[dict]:
    """Per-component block geometry: interleaved (MCU-padded) dims for
    storage/DC scans, the component's own ceil(size/8) dims for
    non-interleaved AC scans (T.81 A.2.2 — padded blocks beyond the
    component's own extent exist only in interleaved order)."""
    comps = frame["comps"]
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    out = []
    for c in comps:
        ch = -(-(h * c["v"]) // vmax)
        cw = -(-(w * c["h"]) // hmax)
        out.append({
            "id": c["id"], "h": c["h"], "v": c["v"], "tq": c["tq"],
            "bh": mcus_y * c["v"], "bw": mcus_x * c["h"],
            "nb_h": -(-ch // 8), "nb_w": -(-cw // 8),
            "mcus_x": mcus_x, "mcus_y": mcus_y,
        })
    return out


def _decode_scan_into(
    data, pos, geom, coefs, scomps, ss, se, ah, al,
    huff_dc, huff_ac, restart_interval,
):
    """Decode one scan's entropy data into the coefficient arrays
    (zigzag index order) and return the offset of the next marker.

    Handles every T.81 Huffman scan shape through one block routine:
    baseline (full band, Ah=Al=0), progressive DC first/refine,
    progressive AC first/refine with EOB-run coding."""
    comp_idx = {g["id"]: i for i, g in enumerate(geom)}
    # a scan referencing an undefined Huffman table would otherwise
    # surface as an AttributeError deep inside the bit reader on a
    # corrupt file — fail with a clear decode error up front (DC table
    # is only consumed when ss==0 and ah==0; AC whenever se > 0)
    for cs, td, ta in scomps:
        if ss == 0 and ah == 0 and td not in huff_dc:
            raise ValueError(f"scan references undefined DC Huffman table {td}")
        if se > 0 and ta not in huff_ac:
            raise ValueError(f"scan references undefined AC Huffman table {ta}")
    reader = _BitReader(data, pos)
    preds = [0] * len(geom)
    eobrun = 0

    def decode_block(ci, by, bx, dc_tbl, ac_tbl):
        nonlocal eobrun
        blk = coefs[ci][by, bx]
        k = ss
        if ss == 0:
            if ah == 0:
                t = reader.decode(dc_tbl)
                preds[ci] += _extend(reader.read_bits(t), t)
                blk[0] = preds[ci] << al
            else:  # DC refinement: one bit per block
                if reader.read_bit():
                    blk[0] |= 1 << al
            if se == 0:
                return
            k = 1
        if ah == 0:
            # AC first pass (baseline AC is this with al=0, eobrun
            # degenerating to per-block EOB since r=0 => eobrun=0)
            if eobrun > 0:
                eobrun -= 1
                return
            while k <= se:
                rs = reader.decode(ac_tbl)
                r, s = rs >> 4, rs & 15
                if s == 0:
                    if r != 15:
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += reader.read_bits(r)
                        break
                    k += 16  # ZRL
                    continue
                k += r
                if k > se:
                    raise ValueError("AC coefficient ran past the band")
                blk[k] = _extend(reader.read_bits(s), s) << al
                k += 1
            return
        # AC refinement pass (T.81 G.1.2.3 / the libjpeg correction-bit
        # algorithm): newly-nonzero coefficients arrive as (run, 1)
        # symbols + sign; already-nonzero coefficients consume one
        # correction bit each as the run skips over them.
        p1, m1 = 1 << al, -(1 << al)
        if eobrun == 0:
            while k <= se:
                rs = reader.decode(ac_tbl)
                r, s = rs >> 4, rs & 15
                newval = 0
                if s == 0:
                    if r != 15:
                        eobrun = 1 << r
                        if r:
                            eobrun += reader.read_bits(r)
                        break  # remaining nonzeros refined below
                    # r == 15: ZRL — skip 16 zero-history positions
                else:
                    newval = p1 if reader.read_bit() else m1
                while k <= se:
                    v = int(blk[k])
                    if v != 0:
                        if reader.read_bit() and (v & p1) == 0:
                            blk[k] = v + (p1 if v >= 0 else m1)
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if k <= se and newval:
                    blk[k] = newval
                k += 1
        if eobrun > 0:
            # inside an EOB run: every remaining nonzero coefficient in
            # the band still gets its correction bit
            while k <= se:
                v = int(blk[k])
                if v != 0:
                    if reader.read_bit() and (v & p1) == 0:
                        blk[k] = v + (p1 if v >= 0 else m1)
                k += 1
            eobrun -= 1

    def maybe_restart(mcu_count):
        nonlocal eobrun
        if restart_interval and mcu_count and mcu_count % restart_interval == 0:
            # skip padding to the RSTn marker (may already be flagged
            # mid-fill), realign, reset DC predictors and the EOB run
            try:
                while True:
                    reader.read_bit()
            except (_RestartMarker, EOFError):
                pass
            if not (
                reader.data[reader.pos] == 0xFF
                and 0xD0 <= reader.data[reader.pos + 1] <= 0xD7
            ):
                raise ValueError("expected restart marker")
            reader.align_after_restart()
            for i in range(len(preds)):
                preds[i] = 0
            eobrun = 0

    if len(scomps) > 1:  # interleaved — MCU order over all components
        mcus_x = geom[0]["mcus_x"]
        mcus_y = geom[0]["mcus_y"]
        mcu_count = 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                maybe_restart(mcu_count)
                mcu_count += 1
                for cs, td, ta in scomps:
                    ci = comp_idx[cs]
                    g = geom[ci]
                    for by in range(g["v"]):
                        for bx in range(g["h"]):
                            decode_block(
                                ci, my * g["v"] + by, mx * g["h"] + bx,
                                huff_dc.get(td), huff_ac.get(ta),
                            )
    else:  # non-interleaved — the component's own block raster
        cs, td, ta = scomps[0]
        ci = comp_idx[cs]
        g = geom[ci]
        blk_count = 0
        for by in range(g["nb_h"]):
            for bx in range(g["nb_w"]):
                maybe_restart(blk_count)
                blk_count += 1
                decode_block(ci, by, bx, huff_dc.get(td), huff_ac.get(ta))

    # advance to the next marker (skip any padding, stuffing, RSTn)
    p = reader.pos
    while p < len(data) - 1:
        if data[p] == 0xFF and data[p + 1] != 0x00 and not (
            0xD0 <= data[p + 1] <= 0xD7
        ):
            break
        p += 1
    return p


def _render(frame, geom, coefs, qt):
    """Dequantize + de-zigzag + IDCT every component in one batched
    numpy pass, then upsample, crop and color-convert."""
    h, w = frame["h"], frame["w"]
    hmax = max(g["h"] for g in geom)
    vmax = max(g["v"] for g in geom)
    full = []
    for ci, g in enumerate(geom):
        qzz = qt[g["tq"]].astype(np.float64)  # zigzag-ordered table
        zz = coefs[ci].astype(np.float64) * qzz  # (BY, BX, 64)
        nat = np.zeros_like(zz)
        nat[..., ZIGZAG] = zz  # scatter zigzag -> natural order
        blocks = nat.reshape(g["bh"], g["bw"], 8, 8)
        spatial = _C.T @ blocks @ _C + 128.0  # batched matrix sandwich
        plane = spatial.transpose(0, 2, 1, 3).reshape(g["bh"] * 8, g["bw"] * 8)
        plane = np.repeat(
            np.repeat(plane, vmax // g["v"], axis=0), hmax // g["h"], axis=1
        )
        full.append(plane[:h, :w])
    if len(full) == 1:
        y = np.clip(full[0], 0, 255)
        return np.dstack([y, y, y]).astype(np.uint8)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.dstack([r, g, b]), 0, 255).astype(np.uint8)
