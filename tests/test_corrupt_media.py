"""Corrupt-input contract for every media decoder: a 100 TB ingest
sees truncated and bit-flipped files routinely, and the decode lanes
(extract_decode_stats, decode_and_resize, audio/video extractors) rely
on one contract — None for a magic mismatch, ValueError /
NotImplementedError for anything that matched the magic but cannot
decode. NEVER a raw parser exception (IndexError, struct.error,
zlib.error, EOFError) and never a hang.

Fuzz corpus: the 18 committed q99 fixtures (every supported format),
truncated at dozens of byte offsets and mutated with seeded byte
flips."""

from __future__ import annotations

import glob
import os
import random
import signal

import pytest

from batch_processing_system_spark.functions.aiff import decode_aiff
from batch_processing_system_spark.functions.apng import decode_apng_frames
from batch_processing_system_spark.functions.ico import decode_ico_rgb
from batch_processing_system_spark.functions.jpeg import decode_jpeg_rgb
from batch_processing_system_spark.functions.multimodal import (
    _audio_mono,
    _avi_mjpeg_frames,
    _decode_bmp_rgb,
    _decode_png_rgb,
    _gif_frames,
)
from batch_processing_system_spark.functions.pcx import decode_pcx_rgb
from batch_processing_system_spark.functions.pnm import decode_pnm_rgb
from batch_processing_system_spark.functions.qoi import decode_qoi_rgb
from batch_processing_system_spark.functions.sunras import decode_sunras_rgb
from batch_processing_system_spark.functions.tga import decode_tga_rgb
from batch_processing_system_spark.functions.tiff import decode_tiff_rgb
from batch_processing_system_spark.functions.xbm import decode_xbm_rgb
from batch_processing_system_spark.queries.media import FIXTURE_DIR

DECODERS = [
    _decode_bmp_rgb,
    _decode_png_rgb,
    decode_jpeg_rgb,
    decode_tiff_rgb,
    decode_pnm_rgb,
    lambda d: decode_tga_rgb(d, require_footer=True),
    _gif_frames,
    _avi_mjpeg_frames,
    _audio_mono,
    decode_aiff,
    decode_ico_rgb,
    decode_apng_frames,
    decode_qoi_rgb,
    decode_pcx_rgb,
    decode_sunras_rgb,
    decode_xbm_rgb,
]

CONTROLLED = (ValueError, NotImplementedError)


class _Hang(Exception):
    pass


def _alarm(*_):
    raise _Hang("decoder exceeded the watchdog")


def _assert_controlled(data: bytes, label: str) -> None:
    for dec in DECODERS:
        name = getattr(dec, "__name__", "decode_tga_rgb")
        # 60 s wall-clock budget (VERDICT r13 item 8): the watchdog
        # exists to catch infinite loops, not slowness — the whole
        # module runs in ~4 s unloaded, but a concurrent local[32]
        # Spark job on this host can starve the interpreter for tens
        # of seconds, and a 10 s alarm flagged exactly that as a
        # false hang once. Real decoder hangs are forever; 60 s
        # still catches them while surviving host contention.
        signal.alarm(60)
        try:
            dec(data)
        except CONTROLLED:
            pass
        except _Hang:
            raise AssertionError(f"{name} hung on {label}")
        except Exception as ex:  # noqa: BLE001 — the point of the test
            raise AssertionError(
                f"{name} leaked {type(ex).__name__} on {label}: {ex}"
            ) from ex
        finally:
            signal.alarm(0)


@pytest.fixture(scope="module", autouse=True)
def watchdog():
    old = signal.signal(signal.SIGALRM, _alarm)
    yield
    signal.signal(signal.SIGALRM, old)


def _fixtures():
    files = sorted(glob.glob(os.path.join(FIXTURE_DIR, "*")))
    assert len(files) >= 26
    return files


class TestCorruptMedia:
    def test_truncations_are_controlled(self):
        for f in _fixtures():
            data = open(f, "rb").read()
            step = max(1, len(data) // 37)
            for cut in range(1, len(data), step):
                _assert_controlled(
                    data[:cut], f"{os.path.basename(f)}[:{cut}]"
                )

    def test_byte_flips_are_controlled(self):
        rng = random.Random(63)
        for f in _fixtures():
            data = bytearray(open(f, "rb").read())
            for trial in range(25):
                m = bytearray(data)
                for _ in range(rng.randint(1, 6)):
                    m[rng.randrange(len(m))] = rng.randrange(256)
                _assert_controlled(
                    bytes(m), f"{os.path.basename(f)} flip#{trial}"
                )

    def test_garbage_and_empty(self):
        rng = random.Random(7)
        _assert_controlled(b"", "empty")
        for n in (1, 2, 3, 17, 64, 1024):
            _assert_controlled(
                bytes(rng.randrange(256) for _ in range(n)), f"garbage[{n}]"
            )

    def test_valid_fixtures_still_decode(self):
        # the guard must not damage the happy path: every fixture is
        # decodable by at least one decoder
        for f in _fixtures():
            data = open(f, "rb").read()
            ok = 0
            for dec in DECODERS:
                try:
                    if dec(data) is not None:
                        ok += 1
                except CONTROLLED:
                    pass
            assert ok >= 1, os.path.basename(f)
