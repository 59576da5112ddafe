"""Independent FLAC encoder for decoder tests — shares only the public
spec (RFC 9639) with functions/flac.py, no code: its own bit writer,
its own CRC implementations, forward prediction (the decoder runs the
inverse), explicit subframe-type plans so every decode path gets
exercised deliberately.

Any quantized predictor yields a VALID stream as long as the stored
residual is sample - prediction, so the LPC path uses fixed example
coefficients rather than Levinson-Durbin — the decoder must still
reconstruct bit-exactly.
"""

from __future__ import annotations

import struct


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        value &= (1 << n) - 1 if n else 0
        self.acc = (self.acc << n) | value
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zeros then a 1

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def getvalue(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


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


def _utf8_number(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    # 2-byte form covers every frame count the tests produce
    assert n < 0x800
    return bytes([0xC0 | (n >> 6), 0x80 | (n & 0x3F)])


_FIXED_COEFS = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _rice_write(bw: _BitWriter, resid: list[int], param: int) -> None:
    for v in resid:
        u = v * 2 if v >= 0 else -v * 2 - 1  # zigzag
        bw.unary(u >> param)
        bw.write(u & ((1 << param) - 1), param)


def _best_rice_param(resid: list[int], plen: int) -> int:
    best, best_cost = 0, None
    for p in range((1 << plen) - 1):
        cost = sum((v * 2 if v >= 0 else -v * 2 - 1) >> p for v in resid) + len(resid) * (p + 1)
        if best_cost is None or cost < best_cost:
            best, best_cost = p, cost
    return best


def _write_residual(
    bw: _BitWriter,
    resid: list[int],
    blocksize: int,
    order: int,
    partition_order: int = 0,
    method: int = 0,
    escape_partitions: frozenset[int] = frozenset(),
) -> None:
    plen = 4 + method
    escape = (1 << plen) - 1
    bw.write(method, 2)
    bw.write(partition_order, 4)
    nparts = 1 << partition_order
    assert blocksize % nparts == 0
    pos = 0
    for p in range(nparts):
        n = blocksize // nparts - (order if p == 0 else 0)
        part = resid[pos : pos + n]
        pos += n
        if p in escape_partitions:
            width = max(
                (abs(v).bit_length() + 1 for v in part), default=1
            )
            bw.write(escape, plen)
            bw.write(width, 5)
            for v in part:
                bw.write(v & ((1 << width) - 1), width)
        else:
            param = min(_best_rice_param(part, plen), escape - 1)
            bw.write(param, plen)
            _rice_write(bw, part, param)
    assert pos == len(resid)


def _write_subframe(
    bw: _BitWriter, samples: list[int], bps: int, plan: dict
) -> None:
    kind = plan.get("kind", "fixed")
    wasted = plan.get("wasted", 0)
    if wasted:
        assert all(s % (1 << wasted) == 0 for s in samples)
        samples = [s >> wasted for s in samples]
        bps -= wasted
    blocksize = len(samples)

    def header(sftype: int) -> None:
        bw.write(0, 1)
        bw.write(sftype, 6)
        if wasted:
            bw.write(1, 1)
            bw.unary(wasted - 1)  # unary-coded wasted_bits - 1
        else:
            bw.write(0, 1)

    # the partition count must divide the block size and leave
    # partition 0 with a positive sample count after the warmup — a
    # short final frame falls back to fewer (or no) partitions
    def _clamped_po(order: int) -> int:
        po = plan.get("partition_order", 0)
        while po and (
            blocksize % (1 << po) or blocksize // (1 << po) <= order
        ):
            po -= 1
        return po

    # a frame shorter than the predictor order cannot carry that
    # predictor (warmup would exceed the block) — real encoders fall
    # back; verbatim is the simplest legal choice
    if kind in ("fixed", "lpc") and blocksize < plan.get(
        "order", 2 if kind == "fixed" else 3
    ):
        kind = "verbatim"

    if kind == "constant":
        assert len(set(samples)) == 1
        header(0)
        bw.write(samples[0] & ((1 << bps) - 1), bps)
    elif kind == "verbatim":
        header(1)
        for s in samples:
            bw.write(s & ((1 << bps) - 1), bps)
    elif kind == "fixed":
        order = plan.get("order", 2)
        coefs = _FIXED_COEFS[order]
        header(8 + order)
        for s in samples[:order]:
            bw.write(s & ((1 << bps) - 1), bps)
        resid = [
            samples[i] - sum(c * samples[i - 1 - j] for j, c in enumerate(coefs))
            for i in range(order, blocksize)
        ]
        _write_residual(
            bw, resid, blocksize, order,
            _clamped_po(order), plan.get("method", 0),
            frozenset(plan.get("escape_partitions", ())),
        )
    elif kind == "lpc":
        order = plan.get("order", 3)
        coefs = plan.get("coefs", [3, -3, 1][:order])
        shift = plan.get("shift", 1)
        assert len(coefs) == order
        precision = max(c.bit_length() + 1 for c in coefs)
        precision = max(precision, 2)
        header(32 + (order - 1))
        for s in samples[:order]:
            bw.write(s & ((1 << bps) - 1), bps)
        bw.write(precision - 1, 4)
        bw.write(shift, 5)
        for c in coefs:
            bw.write(c & ((1 << precision) - 1), precision)
        resid = [
            samples[i]
            - (sum(c * samples[i - 1 - j] for j, c in enumerate(coefs)) >> shift)
            for i in range(order, blocksize)
        ]
        _write_residual(
            bw, resid, blocksize, order,
            _clamped_po(order), plan.get("method", 0),
            frozenset(plan.get("escape_partitions", ())),
        )
    else:
        raise ValueError(kind)


def encode_flac(
    chan_samples: list[list[int]],
    sample_rate: int = 8000,
    bits: int = 16,
    blocksize: int = 64,
    plans=None,
    stereo_mode: str = "independent",
) -> bytes:
    """Native-FLAC stream from per-channel int sample lists.

    ``plans``: per-frame subframe plan dict (or list thereof, cycled),
    e.g. {"kind": "lpc", "order": 3, "partition_order": 2}.
    ``stereo_mode``: independent | left_side | right_side | mid_side.
    The last frame may be shorter than ``blocksize`` (spec-legal)."""
    channels = len(chan_samples)
    total = len(chan_samples[0])
    assert all(len(c) == total for c in chan_samples)
    if stereo_mode != "independent":
        assert channels == 2
    plans = plans or [{"kind": "fixed", "order": 2}]
    if isinstance(plans, dict):
        plans = [plans]

    out = bytearray(b"fLaC")
    si = _BitWriter()
    si.write(blocksize, 16)
    si.write(blocksize, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(channels - 1, 3)
    si.write(bits - 1, 5)
    si.write(total, 36)
    info = si.getvalue() + b"\x00" * 16  # md5 unset (all-zero = unknown)
    out += bytes([0x80]) + struct.pack(">I", len(info))[1:] + info

    frame_no = 0
    for start in range(0, total, blocksize):
        bs = min(blocksize, total - start)
        plan = plans[frame_no % len(plans)]
        hdr = _BitWriter()
        hdr.write(0x3FFE, 14)
        hdr.write(0, 1)
        hdr.write(0, 1)  # fixed blocking
        # always the explicit 16-bit (blocksize-1) form: frames may be short
        hdr.write(0x7, 4)
        hdr.write(0x0, 4)  # sample rate: from STREAMINFO
        if stereo_mode == "independent":
            hdr.write(channels - 1, 4)
        else:
            hdr.write(
                {"left_side": 8, "right_side": 9, "mid_side": 10}[stereo_mode], 4
            )
        hdr.write(0, 3)  # sample size: from STREAMINFO
        hdr.write(0, 1)
        hdr_bytes = bytearray(hdr.getvalue())
        hdr_bytes += _utf8_number(frame_no)
        hdr_bytes += struct.pack(">H", bs - 1)
        hdr_bytes.append(_crc8(bytes(hdr_bytes)))

        body = _BitWriter()
        chans = [c[start : start + bs] for c in chan_samples]
        if stereo_mode == "independent":
            for c in range(channels):
                _write_subframe(body, chans[c], bits, plan)
        else:
            left, right = chans
            side = [l - r for l, r in zip(left, right)]
            if stereo_mode == "left_side":
                _write_subframe(body, left, bits, plan)
                _write_subframe(body, side, bits + 1, plan)
            elif stereo_mode == "right_side":
                _write_subframe(body, side, bits + 1, plan)
                _write_subframe(body, right, bits, plan)
            else:  # mid_side
                mid = [(l + r) >> 1 for l, r in zip(left, right)]
                _write_subframe(body, mid, bits, plan)
                _write_subframe(body, side, bits + 1, plan)
        body.align()

        frame = bytes(hdr_bytes) + body.getvalue()
        frame += struct.pack(">H", _crc16(frame))
        out += frame
        frame_no += 1

    return bytes(out)
