"""Independent QOI ENCODER for decoder tests — written from the spec,
sharing no code with functions/qoi.py: its own cache, its own op
selection (run > index > diff > luma > rgb/rgba), its own wrap math."""

from __future__ import annotations

import struct


def encode_qoi(rows, channels: int = 3) -> bytes:
    h = len(rows)
    w = len(rows[0])
    out = bytearray(b"qoif" + struct.pack(">IIBB", w, h, channels, 0))
    index = [(0, 0, 0, 0)] * 64
    prev = (0, 0, 0, 255)
    px = []
    for row in rows:
        for p in row:
            px.append(tuple(p) if len(p) == 4 else (p[0], p[1], p[2], 255))
    i = 0
    n = len(px)
    while i < n:
        cur = px[i]
        if cur == prev:
            run = 1
            while i + run < n and px[i + run] == cur and run < 62:
                run += 1
            out.append(0xC0 | (run - 1))
            i += run
            continue
        hidx = (cur[0] * 3 + cur[1] * 5 + cur[2] * 7 + cur[3] * 11) % 64
        if index[hidx] == cur:
            out.append(hidx)
        else:
            dr = (cur[0] - prev[0]) & 0xFF
            dg = (cur[1] - prev[1]) & 0xFF
            db = (cur[2] - prev[2]) & 0xFF
            same_a = cur[3] == prev[3]

            def s8(v):  # interpret wrap diff as signed
                return v - 256 if v > 127 else v

            sdr, sdg, sdb = s8(dr), s8(dg), s8(db)
            if same_a and -2 <= sdr <= 1 and -2 <= sdg <= 1 and -2 <= sdb <= 1:
                out.append(0x40 | ((sdr + 2) << 4) | ((sdg + 2) << 2) | (sdb + 2))
            elif (
                same_a
                and -32 <= sdg <= 31
                and -8 <= sdr - sdg <= 7
                and -8 <= sdb - sdg <= 7
            ):
                out.append(0x80 | (sdg + 32))
                out.append(((sdr - sdg + 8) << 4) | (sdb - sdg + 8))
            elif same_a:
                out += bytes([0xFE, cur[0], cur[1], cur[2]])
            else:
                out += bytes([0xFF, cur[0], cur[1], cur[2], cur[3]])
        index[hidx] = cur
        prev = cur
        i += 1
        continue
    out += b"\x00" * 7 + b"\x01"
    return bytes(out)
