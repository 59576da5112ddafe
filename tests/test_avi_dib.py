"""Uncompressed-DIB AVI decode vs an independently written minimal
AVI/DIB writer: 24/32-bit and 8-bit-palette frames, bottom-up and
top-down storage, row padding, and the named-fourcc error for
compressed codecs."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from batch_processing_system_spark.functions.multimodal import (
    _avi_mjpeg_frames,
)


def _chunk(cid: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) % 2 else b""
    return cid + struct.pack("<I", len(body)) + body + pad


def _list(ltype: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", ltype + body)


def make_dib_avi(
    frames_rows,
    bpp: int = 24,
    top_down: bool = False,
    palette=None,
    fourcc: bytes = b"DIB ",
    us_per_frame: int = 50_000,
) -> bytes:
    """Own minimal AVI writer: hdrl(avih + strl(strh 'vids' + strf
    BITMAPINFOHEADER[+palette])) + movi('00db' raw frames)."""
    h = len(frames_rows[0])
    w = len(frames_rows[0][0])
    avih = struct.pack("<IIIIIIIIIIIIII", us_per_frame, 0, 0, 0,
                       len(frames_rows), 0, 1, 0, w, h, 0, 0, 0, 0)
    strh = b"vids" + fourcc + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0, 1,
                                          30, len(frames_rows), 0, 0, 0, 0, 0)
    bmp_h = -h if top_down else h
    strf = struct.pack("<IiihhIIiiII", 40, w, bmp_h, 1,
                       8 if palette else bpp, 0, 0, 0, 0, 0, 0)
    if palette:
        for r, g, b in palette:
            strf += bytes([b, g, r, 0])
        strf += b"\x00" * (4 * (256 - len(palette)))
    movi_frames = b""
    for rows in frames_rows:
        order = rows if top_down else rows[::-1]
        raw = bytearray()
        for row in order:
            line = bytearray()
            for px in row:
                if palette:
                    line.append(px)
                elif bpp == 24:
                    r, g, b = px
                    line += bytes([b, g, r])
                else:
                    r, g, b = px
                    line += bytes([b, g, r, 0])
            while len(line) % 4:
                line += b"\x00"
            raw += line
        movi_frames += _chunk(b"00db", bytes(raw))
    hdrl = _list(b"hdrl", _chunk(b"avih", avih)
                 + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)))
    movi = _list(b"movi", movi_frames)
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def _grad(h, w):
    return [
        [((3 * y + 7 * x) % 256, (11 * y) % 256, (5 * x) % 256) for x in range(w)]
        for y in range(h)
    ]


class TestAviDib:
    def test_24bit_bottom_up_exact(self):
        px = _grad(4, 5)  # width 5 -> 15-byte rows pad to 16
        frames = _avi_mjpeg_frames(make_dib_avi([px]))
        assert len(frames) == 1
        delay, w, h, rgb = frames[0]
        got = np.frombuffer(rgb, dtype=np.uint8).reshape(h, w, 3)
        assert (got == np.array(px, dtype=np.uint8)).all()
        assert delay == 50

    def test_top_down_and_32bit(self):
        px = _grad(3, 3)
        for bpp in (24, 32):
            frames = _avi_mjpeg_frames(
                make_dib_avi([px], bpp=bpp, top_down=True)
            )
            _, w, h, rgb = frames[0]
            got = np.frombuffer(rgb, dtype=np.uint8).reshape(h, w, 3)
            assert (got == np.array(px, dtype=np.uint8)).all(), bpp

    def test_palette_frames(self):
        pal = [(250, 0, 0), (0, 250, 0), (0, 0, 250), (7, 8, 9)]
        idx = [[0, 1, 2, 3, 0], [3, 2, 1, 0, 3]]
        frames = _avi_mjpeg_frames(make_dib_avi([idx], palette=pal))
        _, w, h, rgb = frames[0]
        got = np.frombuffer(rgb, dtype=np.uint8).reshape(h, w, 3)
        expect = np.array([[pal[i] for i in row] for row in idx], dtype=np.uint8)
        assert (got == expect).all()

    def test_multi_frame_timeline(self):
        a = _grad(2, 2)
        b = [[px[::-1] for px in row] for row in _grad(2, 2)]
        frames = _avi_mjpeg_frames(make_dib_avi([a, b], us_per_frame=100_000))
        assert len(frames) == 2
        assert all(f[0] == 100 for f in frames)

    def test_compressed_codec_names_fourcc(self):
        avi = make_dib_avi([_grad(2, 2)])
        # flip biCompression in the strf to a fake codec id
        idx = avi.find(b"strf") + 8
        patched = bytearray(avi)
        patched[idx + 16 : idx + 20] = (0xC0DE).to_bytes(4, "little")
        with pytest.raises(NotImplementedError, match="neither MJPEG nor"):
            _avi_mjpeg_frames(bytes(patched))
