"""Tests for the round-6 advisory fixes:

1. IMA ADPCM decodes a trailing PARTIAL block (real encoders commonly
   emit a short final block; previously those samples were dropped).
2. _avi_mjpeg_frames collects only the first 'vids' stream's chunks —
   a multi-stream AVI no longer interleaves foreign frames.
3. A JPEG scan referencing an undefined Huffman table raises a clear
   ValueError instead of an AttributeError deep in the bit reader.

(The fourth advisory — GIF disposal-2 restore-to-transparent — is
covered by test_multimodal.TestGifComposition.)
"""

from __future__ import annotations

import math
import struct

import numpy as np
import pytest

from batch_processing_system_spark.functions.multimodal import (
    _avi_mjpeg_frames,
    _wav_pcm,
)

from .test_multimodal import _adpcm_encode_channel, make_adpcm_wav


def _sine16(sample_rate, n, freq, amp):
    return [
        int(amp * 32767 * math.sin(2 * math.pi * freq * i / sample_rate))
        for i in range(n)
    ]


class TestAdpcmPartialFinalBlock:
    def _wav_with_partial_tail(self, sig_full, sig_tail, sample_rate=8000):
        """One full mono block (65 samples) + a short final block with a
        header and only 2 of the 8 data words (1 + 16 samples)."""
        wav = bytearray(make_adpcm_wav([sig_full], sample_rate=sample_rate))
        # encode the partial block with the independent encoder
        idx_after = 0
        nibs_full, idx_after = _adpcm_encode_channel(sig_full, 0)
        tail = bytearray(struct.pack("<hBB", sig_tail[0], idx_after, 0))
        nibs, _ = _adpcm_encode_channel(sig_tail, idx_after)
        assert len(nibs) == 16  # 2 words
        for byte_i in range(8):
            lo, hi = nibs[2 * byte_i], nibs[2 * byte_i + 1]
            tail.append((hi << 4) | lo)
        # splice the tail into the data chunk and fix the RIFF sizes
        data_off = wav.rindex(b"data")
        old_size = struct.unpack("<I", wav[data_off + 4 : data_off + 8])[0]
        wav[data_off + 4 : data_off + 8] = struct.pack("<I", old_size + len(tail))
        wav += tail
        wav[4:8] = struct.pack("<I", len(wav) - 8)
        return bytes(wav)

    def test_partial_block_samples_are_decoded(self):
        sig = _sine16(8000, 65, 200, 0.4)
        tail = _sine16(8000, 17, 200, 0.4)
        sr, ch, bits, mono = _wav_pcm(self._wav_with_partial_tail(sig, tail))
        assert (sr, ch, bits) == (8000, 1, 4)
        # previously: only the 65 full-block samples; now 65 + 17
        assert mono.size == 65 + 17
        # judge the TAIL samples (the fix): the first block carries the
        # encoder's step-adaptation transient (only 65 samples from a
        # cold step index), so the overall rmse is dominated by it
        ref_tail = np.array(tail, dtype=np.float64) / 32768.0
        rmse = float(np.sqrt(np.mean((mono[65:] - ref_tail) ** 2)))
        assert rmse < 0.01, rmse

    def test_tail_shorter_than_headers_is_dropped(self):
        sig = _sine16(8000, 65, 200, 0.4)
        wav = bytearray(make_adpcm_wav([sig]))
        data_off = wav.rindex(b"data")
        old_size = struct.unpack("<I", wav[data_off + 4 : data_off + 8])[0]
        wav[data_off + 4 : data_off + 8] = struct.pack("<I", old_size + 3)
        wav += b"\x01\x02\x03"  # 3 bytes: not even a block header
        wav[4:8] = struct.pack("<I", len(wav) - 8)
        sr, ch, bits, mono = _wav_pcm(bytes(wav))
        assert mono.size == 65


def _solid_jpeg(r, g, b, w=16, h=16):
    from tests._jpeg_encoder import encode_color

    img = np.zeros((h, w, 3), dtype=np.uint8)
    img[:, :] = (r, g, b)
    return encode_color(img, (1, 1))


def _strl(fcc_type, handler=b"\x00\x00\x00\x00"):
    strh = fcc_type + handler + b"\x00" * 48
    body = b"strl" + b"strh" + struct.pack("<I", len(strh)) + strh
    return b"LIST" + struct.pack("<I", len(body)) + body


def _avi(stream_lists, movi_chunks, us_per_frame=50_000, w=16, h=16):
    """Independent AVI writer with explicit strl stream headers and
    arbitrary (chunk_id, payload) movi entries."""
    avih = struct.pack(
        "<14I", us_per_frame, 0, 0, 0, len(movi_chunks), 0,
        len(stream_lists), 0, w, h, 0, 0, 0, 0,
    )
    hdrl_body = b"hdrl" + b"avih" + struct.pack("<I", len(avih)) + avih
    for sl in stream_lists:
        hdrl_body += sl
    hdrl = b"LIST" + struct.pack("<I", len(hdrl_body)) + hdrl_body
    movi_body = b"movi"
    for cid, payload in movi_chunks:
        movi_body += cid + struct.pack("<I", len(payload)) + payload
        if len(payload) & 1:
            movi_body += b"\x00"
    movi = b"LIST" + struct.pack("<I", len(movi_body)) + movi_body
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


class TestAviStreamSelection:
    def test_second_stream_chunks_are_ignored(self):
        # stream 0 = vids (MJPEG), stream 1 = a second video stream
        # whose '01dc' frames must NOT interleave into the timeline
        red = _solid_jpeg(200, 30, 30)
        blue = _solid_jpeg(30, 30, 200)
        intruder = _solid_jpeg(30, 200, 30)
        avi = _avi(
            [_strl(b"vids", b"MJPG"), _strl(b"vids", b"MJPG")],
            [(b"00dc", red), (b"01dc", intruder), (b"00dc", blue)],
        )
        frames = _avi_mjpeg_frames(avi)
        assert len(frames) == 2
        for (_, w, h, rgb), want in zip(frames, [(200, 30, 30), (30, 30, 200)]):
            assert (w, h) == (16, 16)
            assert all(abs(rgb[i] - want[i]) <= 6 for i in range(3))

    def test_video_not_stream_zero(self):
        # stream 0 = audio, stream 1 = vids: frames live in '01dc' and
        # the '00wb' audio chunks must be skipped
        red = _solid_jpeg(200, 30, 30)
        avi = _avi(
            [_strl(b"auds"), _strl(b"vids", b"MJPG")],
            [(b"00wb", b"\x00" * 64), (b"01dc", red), (b"00wb", b"\x01" * 64)],
        )
        frames = _avi_mjpeg_frames(avi)
        assert len(frames) == 1
        _, w, h, rgb = frames[0]
        assert (w, h) == (16, 16)
        assert abs(rgb[0] - 200) <= 6 and abs(rgb[2] - 30) <= 6

    def test_headerless_avi_defaults_to_stream_zero(self):
        # no strl at all (the old fixture shape): stream 00 still decodes
        red = _solid_jpeg(200, 30, 30)
        avi = _avi([], [(b"00dc", red)])
        frames = _avi_mjpeg_frames(avi)
        assert len(frames) == 1


class TestJpegUndefinedHuffmanTable:
    def _strip_dht(self, jpeg: bytes) -> bytes:
        """Remove every DHT (0xFFC4) segment from a JPEG byte stream."""
        out = bytearray(jpeg[:2])  # SOI
        pos = 2
        while pos + 4 <= len(jpeg):
            assert jpeg[pos] == 0xFF
            marker = jpeg[pos + 1]
            if marker == 0xD9:  # EOI
                out += jpeg[pos:]
                break
            seglen = struct.unpack(">H", jpeg[pos + 2 : pos + 4])[0]
            seg = jpeg[pos : pos + 2 + seglen]
            if marker != 0xC4:
                out += seg
            pos += 2 + seglen
            if marker == 0xDA:  # entropy data until EOI
                out += jpeg[pos:]
                break
        return bytes(out)

    def test_missing_table_raises_clear_error(self):
        from batch_processing_system_spark.functions.jpeg import decode_jpeg_rgb

        jpeg = _solid_jpeg(120, 90, 60)
        with pytest.raises(ValueError, match="undefined DC Huffman table"):
            decode_jpeg_rgb(self._strip_dht(jpeg))

    def test_intact_jpeg_still_decodes(self):
        from batch_processing_system_spark.functions.jpeg import decode_jpeg_rgb

        rgb = decode_jpeg_rgb(_solid_jpeg(120, 90, 60))
        assert rgb.shape == (16, 16, 3)
