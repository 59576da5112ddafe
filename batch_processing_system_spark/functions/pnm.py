"""Pure-Python Netpbm (PNM) decode — P1..P6 from the public Netpbm
format specs (pbm(5)/pgm(5)/ppm(5)): ASCII and binary bitmap/gray/RGB,
arbitrary maxval up to 65535 (two-byte big-endian samples when
maxval > 255), '#' comments anywhere in the header, and P1's
no-separator pixel stream.

Reference surface: /root/reference/README.md:150-156 (multimodal
ingest) — PNM is the interchange format scientific pipelines emit, and
the simplest real image format; decoding it closes another named
still-image path with zero dependencies.

Determinism: maxval rescaling to 8-bit is exact integer rounding
``(v * 255 + maxval // 2) // maxval`` — no float, no libm, identical
on every platform.
"""

from __future__ import annotations

import numpy as np

from .guard import controlled_decode

_MAGICS = {b"P1", b"P2", b"P3", b"P4", b"P5", b"P6"}
_WS = b" \t\r\n\x0b\x0c"


class _Tok:
    """Header tokenizer: whitespace-separated tokens, '#' comments."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos

    def _skip_ws(self) -> None:
        d = self.data
        while self.pos < len(d):
            c = d[self.pos]
            if c == 0x23:  # '#'
                nl = d.find(b"\n", self.pos)
                self.pos = len(d) if nl < 0 else nl + 1
            elif c in _WS:
                self.pos += 1
            else:
                return

    def next_int(self) -> int:
        self._skip_ws()
        start = self.pos
        d = self.data
        while self.pos < len(d) and d[self.pos : self.pos + 1].isdigit():
            self.pos += 1
        if self.pos == start:
            raise ValueError("pnm: expected integer in header")
        return int(d[start : self.pos])


def _scale(arr: np.ndarray, maxval: int) -> np.ndarray:
    if maxval == 255:
        return arr.astype(np.uint8)
    a = arr.astype(np.uint32)
    return ((a * 255 + maxval // 2) // maxval).astype(np.uint8)


@controlled_decode("PNM")
def decode_pnm_rgb(data: bytes):
    """Decode any P1..P6 Netpbm image to an (h, w, 3) uint8 RGB array;
    returns None if ``data`` is not PNM (wrong magic)."""
    if len(data) < 3 or data[:2] not in _MAGICS:
        return None
    if data[2] not in _WS and data[2] != 0x23:
        return None
    kind = int(data[1:2])
    tok = _Tok(data, 2)
    w = tok.next_int()
    h = tok.next_int()
    if kind in (1, 4):
        maxval = 1
    else:
        maxval = tok.next_int()
        if not 0 < maxval < 65536:
            raise ValueError(f"pnm: illegal maxval {maxval}")
    ch = 3 if kind in (3, 6) else 1
    n = w * h * ch

    if kind == 1:
        # ASCII bitmap: '0'/'1' characters, separators OPTIONAL
        vals = []
        pos = tok.pos
        while len(vals) < n and pos < len(data):
            c = data[pos : pos + 1]
            if c == b"#":
                nl = data.find(b"\n", pos)
                pos = len(data) if nl < 0 else nl + 1
                continue
            if c in (b"0", b"1"):
                vals.append(1 - int(c))  # PBM: 1 = black -> 0 intensity
            pos += 1
        if len(vals) < n:
            raise ValueError("pnm: truncated P1 raster")
        gray = np.array(vals, dtype=np.uint8).reshape(h, w) * 255
    elif kind in (2, 3):
        vals = [tok.next_int() for _ in range(n)]
        arr = np.array(vals, dtype=np.uint32)
        if arr.max(initial=0) > maxval:
            raise ValueError("pnm: sample exceeds maxval")
        gray = _scale(arr, maxval).reshape((h, w, 3) if ch == 3 else (h, w))
    else:
        # binary variants: the spec terminates the header with exactly
        # ONE whitespace byte — next_int left pos ON that byte
        raster = data[tok.pos + 1 :]
        if kind == 4:
            stride = (w + 7) // 8
            if len(raster) < stride * h:
                raise ValueError("pnm: truncated P4 raster")
            rows = np.frombuffer(
                raster[: stride * h], dtype=np.uint8
            ).reshape(h, stride)
            bits = np.unpackbits(rows, axis=1)[:, :w]
            gray = (1 - bits).astype(np.uint8) * 255
        else:
            wide = maxval > 255
            dt = ">u2" if wide else np.uint8
            need = n * (2 if wide else 1)
            if len(raster) < need:
                raise ValueError("pnm: truncated raster")
            arr = np.frombuffer(raster[:need], dtype=dt).astype(np.uint32)
            if arr.max(initial=0) > maxval:
                raise ValueError("pnm: sample exceeds maxval")
            gray = _scale(arr, maxval).reshape(
                (h, w, 3) if ch == 3 else (h, w)
            )

    if gray.ndim == 2:
        return np.repeat(gray[:, :, None], 3, axis=2)
    return gray
