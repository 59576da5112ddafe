"""Pure-Python FLAC decoder (public spec: RFC 9639 / xiph.org format
docs) — closes the one perceptual-audio-adjacent gap that needs no
psychoacoustics: FLAC is integer-predictor lossless coding, so exact
decode is achievable with stdlib + numpy, like the JPEG/PNG/ADPCM
paths beside it.

Supported: fixed and variable blocking; subframe types CONSTANT,
VERBATIM, FIXED (orders 0-4) and LPC (orders 1-32); Rice residuals in
both coding methods (4- and 5-bit parameters) including escaped
(unencoded) partitions; wasted bits; stereo decorrelation left/side,
right/side and mid/side; 8/16/24-bit sample sizes. Frame-header CRC-8
and frame CRC-16 are verified (spec polys 0x07 / 0x8005).

Out of scope (named, like every other stub in this package): Ogg-FLAC
encapsulation.

Cited surface: /root/reference/README.md:150-156 (multimodal ingest —
audio feature extraction over opaque binary columns).
"""

from __future__ import annotations

import struct


class _Bits:
    """MSB-first bit reader over bytes."""

    __slots__ = ("data", "pos")

    def __init__(self, data: bytes, pos_bits: int = 0):
        self.data = data
        self.pos = pos_bits

    def read(self, n: int) -> int:
        v = 0
        pos, data = self.pos, self.data
        for _ in range(n):
            byte = data[pos >> 3]
            v = (v << 1) | ((byte >> (7 - (pos & 7))) & 1)
            pos += 1
        self.pos = pos
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >> (n - 1) else v

    def unary(self) -> int:
        n = 0
        pos, data = self.pos, self.data
        while not (data[pos >> 3] >> (7 - (pos & 7))) & 1:
            n += 1
            pos += 1
        self.pos = pos + 1
        return n

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


_BLOCKSIZE_CODES = {
    0x1: 192, 0x2: 576, 0x3: 1152, 0x4: 2304, 0x5: 4608,
    0x8: 256, 0x9: 512, 0xA: 1024, 0xB: 2048, 0xC: 4096,
    0xD: 8192, 0xE: 16384, 0xF: 32768,
}

_SAMPLE_SIZE_CODES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}

_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _read_coded_number(br: _Bits) -> int:
    """The frame/sample number's UTF-8-like variable-length code."""
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    while (b0 << n) & 0x80:
        n += 1
    v = b0 & (0x7F >> n)
    for _ in range(n - 1):
        v = (v << 6) | (br.read(8) & 0x3F)
    return v


def _decode_residual(br: _Bits, blocksize: int, order: int) -> list[int]:
    if order > blocksize:
        raise ValueError("FLAC predictor order exceeds block size")
    method = br.read(2)
    if method > 1:
        raise ValueError(f"reserved FLAC residual coding method {method}")
    plen = 4 + method  # rice parameter width
    escape = (1 << plen) - 1
    porder = br.read(4)
    nparts = 1 << porder
    if blocksize % nparts:
        raise ValueError("FLAC partition count does not divide block size")
    out = []
    for p in range(nparts):
        n = blocksize // nparts - (order if p == 0 else 0)
        param = br.read(plen)
        if param == escape:  # unencoded: raw n-bit signed residuals
            bits = br.read(5)
            for _ in range(n):
                out.append(br.read_signed(bits) if bits else 0)
        else:
            for _ in range(n):
                q = br.unary()
                v = (q << param) | br.read(param)
                out.append((v >> 1) ^ -(v & 1))  # zigzag
    return out


def _decode_subframe(br: _Bits, blocksize: int, bps: int) -> list[int]:
    if br.read(1):
        raise ValueError("FLAC subframe padding bit set")
    sftype = br.read(6)
    wasted = 0
    if br.read(1):  # wasted-bits flag
        wasted = br.unary() + 1
        bps -= wasted
    if sftype == 0:  # CONSTANT
        v = br.read_signed(bps)
        samples = [v] * blocksize
    elif sftype == 1:  # VERBATIM
        samples = [br.read_signed(bps) for _ in range(blocksize)]
    elif 8 <= sftype <= 12:  # FIXED, order = sftype - 8
        order = sftype - 8
        samples = [br.read_signed(bps) for _ in range(order)]
        resid = _decode_residual(br, blocksize, order)
        coefs = _FIXED_COEFS[order]
        for r in resid:
            pred = sum(c * samples[-1 - j] for j, c in enumerate(coefs))
            samples.append(r + pred)
    elif sftype >= 32:  # LPC, order = (sftype & 31) + 1
        order = (sftype & 31) + 1
        samples = [br.read_signed(bps) for _ in range(order)]
        precision = br.read(4) + 1
        if precision == 16:
            raise ValueError("invalid FLAC LPC precision code 1111")
        shift = br.read_signed(5)
        if shift < 0:
            raise ValueError("negative FLAC LPC shift")
        coefs = [br.read_signed(precision) for _ in range(order)]
        resid = _decode_residual(br, blocksize, order)
        for r in resid:
            pred = sum(c * samples[-1 - j] for j, c in enumerate(coefs)) >> shift
            samples.append(r + pred)
    else:
        raise ValueError(f"reserved FLAC subframe type {sftype}")
    if wasted:
        samples = [s << wasted for s in samples]
    return samples


def decode_flac(content: bytes):
    """Decode a native-FLAC stream to (sample_rate, channels, bits,
    samples) where ``samples`` is a numpy int32 array interleaved by
    channel. Returns None if ``content`` is not FLAC; raises on a
    corrupt or spec-violating stream (CRCs verified)."""
    import numpy as np

    if not content or content[:4] != b"fLaC":
        return None
    pos = 4
    streaminfo = None
    while pos + 4 <= len(content):  # metadata blocks
        hdr = content[pos]
        last, btype = hdr >> 7, hdr & 0x7F
        (blen,) = struct.unpack(">I", b"\x00" + content[pos + 1 : pos + 4])
        if btype == 0:
            streaminfo = content[pos + 4 : pos + 4 + blen]
        pos += 4 + blen
        if last:
            break
    if streaminfo is None or len(streaminfo) < 34:
        raise ValueError("FLAC missing STREAMINFO")
    si = _Bits(streaminfo)
    si.read(16)  # min blocksize
    si.read(16)  # max blocksize
    si.read(24)  # min framesize
    si.read(24)  # max framesize
    sample_rate = si.read(20)
    channels = si.read(3) + 1
    bits = si.read(5) + 1
    total_samples = si.read(36)

    chans: list[list[int]] = [[] for _ in range(channels)]
    while pos < len(content):
        frame_start = pos
        br = _Bits(content, pos * 8)
        sync = br.read(14)
        if sync != 0x3FFE:
            raise ValueError(f"bad FLAC frame sync at byte {pos}")
        br.read(1)  # reserved
        br.read(1)  # blocking strategy
        bs_code = br.read(4)
        sr_code = br.read(4)
        ch_code = br.read(4)
        ss_code = br.read(3)
        br.read(1)  # reserved
        _read_coded_number(br)
        if bs_code == 0:
            raise ValueError("reserved FLAC block size code 0")
        elif bs_code == 6:
            blocksize = br.read(8) + 1
        elif bs_code == 7:
            blocksize = br.read(16) + 1
        else:
            blocksize = _BLOCKSIZE_CODES[bs_code]
        if sr_code == 12:
            br.read(8)
        elif sr_code in (13, 14):
            br.read(16)
        bps = bits if ss_code == 0 else _SAMPLE_SIZE_CODES[ss_code]
        hdr_end = (br.pos + 7) // 8
        if _crc8(content[frame_start:hdr_end]) != br.read(8):
            raise ValueError("FLAC frame header CRC-8 mismatch")

        if ch_code < 8:  # independent channels
            if ch_code + 1 != channels:
                raise ValueError("FLAC frame channel count != STREAMINFO")
            subs = [_decode_subframe(br, blocksize, bps) for _ in range(channels)]
        elif ch_code in (8, 9, 10):  # stereo decorrelation
            if channels != 2:
                raise ValueError("decorrelated FLAC frame in non-stereo stream")
            if ch_code == 8:  # left/side
                left = _decode_subframe(br, blocksize, bps)
                side = _decode_subframe(br, blocksize, bps + 1)
                subs = [left, [l - s for l, s in zip(left, side)]]
            elif ch_code == 9:  # right/side
                side = _decode_subframe(br, blocksize, bps + 1)
                right = _decode_subframe(br, blocksize, bps)
                subs = [[r + s for r, s in zip(right, side)], right]
            else:  # mid/side: mid = (l+r)>>1 (floor), side = l-r; the
                # side's low bit restores the halving loss
                mid = _decode_subframe(br, blocksize, bps)
                side = _decode_subframe(br, blocksize, bps + 1)
                left = [
                    (((m << 1) | (s & 1)) + s) >> 1 for m, s in zip(mid, side)
                ]
                subs = [left, [l - s for l, s in zip(left, side)]]
        else:
            raise ValueError(f"reserved FLAC channel assignment {ch_code}")

        br.align()
        body_end = br.pos // 8
        (crc16,) = struct.unpack(">H", content[body_end : body_end + 2])
        if _crc16(content[frame_start:body_end]) != crc16:
            raise ValueError("FLAC frame CRC-16 mismatch")
        pos = body_end + 2
        for c in range(channels):
            chans[c].extend(subs[c])

    n = len(chans[0])
    if total_samples and n > total_samples:
        n = total_samples  # final frame may pad; trim to STREAMINFO
    out = np.empty(n * channels, dtype=np.int32)
    for c in range(channels):
        out[c::channels] = chans[c][:n]
    return sample_rate, channels, bits, out
