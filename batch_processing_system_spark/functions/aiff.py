"""Pure-Python AIFF / AIFF-C PCM decode from the public Apple
Audio Interchange File Format spec (IFF 'FORM' container):

- COMM chunk: channels, frame count, sample size, and the sample rate
  as an 80-bit IEEE 754 EXTENDED float (the format's famous quirk) —
  parsed exactly with integer arithmetic, no float80 support needed;
- SSND chunk: big-endian signed PCM at 8/16/24/32 bits (8-bit AIFF is
  SIGNED, unlike WAV's unsigned 8-bit), honoring the offset field;
- AIFF-C compression types 'NONE'/'twos' (big-endian) and 'sowt'
  (little-endian, the classic PowerPC→x86 transition type); anything
  perceptual ('ima4', 'ulaw', ...) raises a named NotImplementedError.

Reference surface: /root/reference/README.md:150-156 (multimodal
ingest). Completes the uncompressed-audio container matrix next to
WAV: both RIFF (LE) and IFF (BE) lineages decode natively.
"""

from __future__ import annotations

import struct

import numpy as np

from .guard import controlled_decode

_SUPPORTED_COMP = {b"NONE", b"twos", b"sowt"}


def _parse_extended80(b: bytes) -> int:
    """80-bit IEEE extended -> sample rate as a positive integer.

    value = mantissa * 2^(exponent - 16383 - 63); audio rates are
    exact integers, so the shift is computed in integer arithmetic
    (rounding only if a fractional rate ever appears)."""
    if len(b) != 10:
        raise ValueError("aiff: COMM sample-rate field is not 10 bytes")
    (se,) = struct.unpack(">H", b[:2])
    mant = int.from_bytes(b[2:], "big")
    if se & 0x8000:
        raise ValueError("aiff: negative sample rate")
    exp = (se & 0x7FFF) - 16383 - 63
    if mant == 0:
        raise ValueError("aiff: zero sample rate")
    if exp >= 0:
        rate = mant << exp
    else:
        shift = -exp
        rate = (mant + (1 << (shift - 1))) >> shift  # round half up
    if not 0 < rate < 10**7:
        raise ValueError(f"aiff: implausible sample rate {rate}")
    return rate


@controlled_decode("AIFF")
def decode_aiff(data: bytes):
    """Decode AIFF/AIFF-C PCM to (sample_rate, channels, bits,
    int32 interleaved samples); None if not an AIFF FORM file."""
    if len(data) < 12 or data[:4] != b"FORM":
        return None
    form_type = data[8:12]
    if form_type not in (b"AIFF", b"AIFC"):
        return None
    pos = 12
    comm = None
    ssnd = None
    comp = b"NONE"
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack(">I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"COMM":
            if len(body) < 18:
                raise ValueError("aiff: truncated COMM chunk")
            channels, n_frames, bits = struct.unpack(">hIh", body[:8])
            rate = _parse_extended80(body[8:18])
            if form_type == b"AIFC":
                if len(body) < 22:
                    raise ValueError("aiff: AIFC COMM missing compression type")
                comp = body[18:22]
            comm = (channels, n_frames, bits, rate)
        elif cid == b"SSND":
            if len(body) < 8:
                raise ValueError("aiff: truncated SSND chunk")
            offset, _block = struct.unpack(">II", body[:8])
            ssnd = body[8 + offset :]
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if comm is None or ssnd is None:
        raise ValueError("aiff: missing COMM or SSND chunk")
    if comp not in _SUPPORTED_COMP:
        raise NotImplementedError(
            f"aiff: compression type {comp!r} needs a codec library; "
            "only NONE/twos/sowt PCM decode natively"
        )
    channels, n_frames, bits, rate = comm
    if channels <= 0 or bits not in (8, 16, 24, 32):
        raise ValueError(f"aiff: unsupported layout ch={channels} bits={bits}")
    bps = bits // 8
    need = n_frames * channels * bps
    if len(ssnd) < need:
        raise ValueError("aiff: SSND shorter than COMM frame count")
    raw = ssnd[:need]
    little = comp == b"sowt"
    if bits == 8:
        x = np.frombuffer(raw, dtype=np.int8).astype(np.int32)
    elif bits == 24:
        b3 = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
        if little:
            val = (
                b3[:, 0].astype(np.uint32)
                | (b3[:, 1].astype(np.uint32) << 8)
                | (b3[:, 2].astype(np.uint32) << 16)
            )
        else:
            val = (
                (b3[:, 0].astype(np.uint32) << 16)
                | (b3[:, 1].astype(np.uint32) << 8)
                | b3[:, 2].astype(np.uint32)
            )
        x = val.astype(np.int32)
        x[x >= (1 << 23)] -= 1 << 24
    else:
        dt = ("<" if little else ">") + ("i2" if bits == 16 else "i4")
        x = np.frombuffer(raw, dtype=dt).astype(np.int32)
    return rate, channels, bits, x
