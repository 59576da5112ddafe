"""Generate the q99 multimodal decode fixtures and print the pinned
oracle rows.

The fixture files are produced by the INDEPENDENT encoders in tests/
(the same ones the decoder unit tests verify against), written once
into ``batch_processing_system_spark/fixtures/multimodal/`` and
committed — the q99 catalog query decodes them with the repo's own
pure-Python decoders and compares against the DuckDB VALUES oracle
whose rows this script prints (paste into queries/media.py when the
fixture set changes).

Deterministic by construction: fixed pixel/sample patterns, no RNG.

Usage:  python tools/make_multimodal_fixtures.py
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from tests._flac_encoder import encode_flac
from tests._aiff_ico_encoder import encode_aiff, encode_ico
from tests._apng_encoder import encode_apng
from tests._qoi_encoder import encode_qoi
from tests.test_pcx import encode_pcx
from tests.test_sunras import encode_sunras
from tests.test_xbm import encode_xbm
from tests.test_avi_dib import make_dib_avi
from tests._pnm_tga_encoder import encode_pnm, encode_tga
from tests._jpeg_encoder import encode_color, encode_color_progressive
from tests._tiff_encoder import encode_tiff
from tests.test_multimodal import (
    PALETTE4,
    make_adpcm_wav,
    make_bmp,
    make_interlaced_png,
    make_mjpeg_avi,
    make_partial_gif,
    make_real_png,
    make_sine_wav,
    make_subbyte_png,
)

OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "batch_processing_system_spark", "fixtures", "multimodal",
)


def _gradient(h, w, ch):
    return [
        [tuple((13 * y + 29 * x + 57 * k) % 256 for k in range(ch)) for x in range(w)]
        for y in range(h)
    ]


def _solid(r, g, b, w=16, h=16):
    img = np.zeros((h, w, 3), dtype=np.uint8)
    img[:, :] = (r, g, b)
    return img


def build_fixtures() -> dict[str, bytes]:
    grad = _gradient(7, 9, 3)
    gray = [[(7 * y + 31 * x) % 256 for x in range(6)] for y in range(5)]
    img16 = [
        [tuple(((y * 37 + x * 53 + k * 11) * 257) % 65536 for k in range(3)) for x in range(4)]
        for y in range(3)
    ]
    # 16-bit PNG: raw big-endian samples, filter 0 rows
    import struct as st
    import zlib

    raw16 = bytearray()
    for row in img16:
        raw16.append(0)
        for px in row:
            for v in px:
                raw16 += st.pack(">H", v)

    def _chunk(ctype, body):
        return (
            st.pack(">I", len(body)) + ctype + body
            + st.pack(">I", zlib.crc32(ctype + body))
        )

    png16 = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", st.pack(">IIBBBBB", 4, 3, 16, 2, 0, 0, 0))
        + _chunk(b"IDAT", zlib.compress(bytes(raw16)))
        + _chunk(b"IEND", b"")
    )

    # photo-ish smooth gradient for JPEG (lossy; decode must still be
    # deterministic, and progressive must bit-match baseline)
    jimg = np.zeros((24, 32, 3), dtype=np.uint8)
    for y in range(24):
        for x in range(32):
            jimg[y, x] = ((y * 8) % 256, (x * 5) % 256, ((x + y) * 3) % 256)

    gif = make_partial_gif(
        [
            ([1] * 16, (0, 0, 4, 4), 5, 0, None),       # full frame
            ([2], (2, 1, 1, 1), 5, 3, None),            # patch, restore-prev
            ([0, 3], (0, 0, 2, 1), 5, 2, 0),            # transparency + disposal 2
            ([3] * 4, (1, 1, 2, 2), 5, 0, None),
        ],
        4, 4,
    )

    sine = [
        int(0.4 * 32767 * math.sin(2 * math.pi * 300 * i / 8000))
        for i in range(8000)
    ]
    # ADPCM needs whole 65-sample blocks; 8000 // 65 * 65 = 7995
    avi = make_mjpeg_avi(
        [
            encode_color(_solid(200, 30, 30), (1, 1)),
            encode_color(_solid(30, 200, 30), (2, 2)),
            encode_color_progressive(_solid(30, 30, 200), (1, 1)),
        ],
        us_per_frame=40_000,
    )

    return {
        "fx01_gradient.bmp": make_bmp(grad),
        "fx02_gray8.png": make_real_png(gray, 0),
        "fx03_rgb8.png": make_real_png(grad, 2),
        "fx04_pal8.png": make_real_png(
            [[0, 1, 2, 3], [3, 2, 1, 0]], 3, palette=PALETTE4
        ),
        "fx05_rgb16.png": png16,
        "fx06_adam7.png": make_interlaced_png(_gradient(13, 11, 3)),
        "fx07_gray4.png": make_subbyte_png(
            [[(3 * y + 2 * x) % 16 for x in range(5)] for y in range(5)], 4, 0
        ),
        "fx08_pal2_adam7.png": make_subbyte_png(
            [[(y * 2 + x) % 4 for x in range(9)] for y in range(9)],
            2, 3, palette=PALETTE4, interlace=1,
        ),
        "fx09_base.jpg": encode_color(jimg, (2, 2), restart=2),
        "fx10_prog.jpg": encode_color_progressive(jimg, (2, 2)),
        "fx11_anim.gif": gif,
        "fx12_pcm.wav": make_sine_wav(8000, 1, 300, 0.4),
        "fx13_adpcm.wav": make_adpcm_wav([sine, sine], sample_rate=8000),
        "fx14_mjpeg.avi": avi,
        # same gradient as fx01/fx03 -> the BMP≡PNG digest invariant
        # becomes three-way BMP≡PNG≡TIFF; big-endian + LZW + predictor 2
        # + multi-strip is the decoder's maximal machinery path
        "fx16_gradient.tif": encode_tiff(
            np.array(grad, dtype=np.uint8),
            endian=">",
            compression=5,
            predictor=2,
            rows_per_strip=3,
        ),
        # the SAME gradient again as binary PPM and as RLE top-down
        # TGA -> the cross-format digest invariant becomes five-way
        # BMP≡PNG≡TIFF≡PPM≡TGA (one pixel recipe, five container
        # formats, five independent decode paths)
        "fx17_gradient.ppm": encode_pnm(
            [[tuple(px) for px in row] for row in grad], "P6"
        ),
        "fx18_gradient.tga": encode_tga(
            [[tuple(px) for px in row] for row in grad], bpp=24, rle=True
        ),
        # the fx12 sine again as big-endian AIFF -> the PCM mono
        # digest invariant pairs fx12 (RIFF/LE) with fx19 (IFF/BE)
        "fx19_tone.aiff": encode_aiff([sine], 8000, 16),
        # the gradient a SIXTH time, as a 32-bit ICO DIB entry (plus a
        # smaller decoy entry the largest-entry rule must skip)
        "fx20_gradient.ico": encode_ico(
            [
                ([[(1, 2, 3)] * 4] * 4, 32, None),
                ([[tuple(px) for px in row] for row in grad], 32, None),
            ]
        ),
        # animated PNG exercising offsets, dispose background/
        # previous, and over-blending with a transparent hole — the
        # zlib-lineage sibling of fx11's GIF composition
        "fx21_anim.apng": encode_apng(
            4, 4,
            [
                {"rows": [[(200, 30, 30, 255)] * 4] * 4, "dispose": 0},
                {"rows": [[(30, 200, 30, 255)]], "x": 1, "y": 1,
                 "dispose": 2},
                {"rows": [[(30, 30, 200, 255), (0, 0, 0, 0)]], "x": 2,
                 "y": 3, "blend": 1, "dispose": 1},
                {"rows": [[(250, 250, 20, 128)] * 2] * 2, "x": 0, "y": 2,
                 "blend": 1},
            ],
        ),
        # ONE uncompressed-DIB AVI frame of the same gradient: the
        # video-kind digest (sha over concatenated frame RGB) equals
        # the six still-image digests — the invariant crosses the
        # image/video boundary
        "fx22_gradient_dib.avi": make_dib_avi(
            [[[tuple(px) for px in row] for row in grad]]
        ),
        # the gradient a SEVENTH still-image time, as QOI — the one
        # modern dependency-free lossless format
        "fx23_gradient.qoi": encode_qoi(
            [[tuple(px) for px in row] for row in grad]
        ),
        # an EIGHTH still-image rendering of the gradient: PCX 24-bit
        "fx24_gradient.pcx": encode_pcx(
            [[tuple(px) for px in row] for row in grad]
        ),
        # a NINTH still rendering: Sun raster, BYTE_ENCODED RLE
        "fx25_gradient.ras": encode_sunras(
            [[tuple(px) for px in row] for row in grad], rtype=2
        ),
        # a text-format entry: X11 bitmap (C source) — the only
        # non-binary image lane; a 13x11 checker-diagonal glyph
        "fx26_glyph.xbm": encode_xbm(
            [[(x * y + x + y) % 3 % 2 for x in range(13)] for y in range(11)]
        ),
        "fx15_stereo.flac": encode_flac(
            [sine[:4000], [-s for s in sine[:4000]]],
            sample_rate=8000,
            stereo_mode="mid_side",
            plans=[
                {"kind": "fixed", "order": 2, "partition_order": 2},
                {"kind": "lpc", "order": 3, "coefs": [3, -3, 1], "shift": 1},
            ],
        ),
    }


def main() -> None:
    os.makedirs(OUT_DIR, exist_ok=True)
    fixtures = build_fixtures()
    for name, data in sorted(fixtures.items()):
        with open(os.path.join(OUT_DIR, name), "wb") as f:
            f.write(data)
        print(f"wrote {name}  {len(data)} bytes")

    # decode with the repo decoders and print the oracle VALUES rows
    import hashlib

    from batch_processing_system_spark.functions.jpeg import decode_jpeg_rgb
    from batch_processing_system_spark.functions.multimodal import (
        _audio_mono,
        _avi_mjpeg_frames,
        _decode_bmp_rgb,
        _decode_png_rgb,
        _gif_frames,
    )

    print("\n-- pinned oracle rows (paste into queries/media.py):")
    for name, data in sorted(fixtures.items()):
        apng = None
        if data[:8] == b"\x89PNG\r\n\x1a\n":
            from batch_processing_system_spark.functions.apng import (
                decode_apng_frames,
            )

            apng = decode_apng_frames(data)
        if apng is not None or data[:6] in (b"GIF87a", b"GIF89a") or (
            data[:4] == b"RIFF" and data[8:12] == b"AVI "
        ):
            frames = apng or _gif_frames(data) or _avi_mjpeg_frames(data)
            dig = hashlib.sha256()
            for _, _, _, rgb in frames:
                dig.update(rgb)
            row = (name, "video", frames[0][1], frames[0][2], len(frames), dig.hexdigest())
        elif (
            (data[:4] == b"RIFF" and data[8:12] == b"WAVE")
            or data[:4] == b"fLaC"
            or (data[:4] == b"FORM" and data[8:12] in (b"AIFF", b"AIFC"))
        ):
            _, _, _, mono = _audio_mono(data)
            row = (name, "audio", None, None, int(mono.size),
                   hashlib.sha256(mono.tobytes()).hexdigest())
        else:
            rgb = _decode_bmp_rgb(data)
            if rgb is None:
                rgb = _decode_png_rgb(data)
            if rgb is None:
                rgb = decode_jpeg_rgb(data)
            if rgb is None:
                from batch_processing_system_spark.functions.tiff import (
                    decode_tiff_rgb,
                )

                rgb = decode_tiff_rgb(data)
            if rgb is None:
                from batch_processing_system_spark.functions.pnm import (
                    decode_pnm_rgb,
                )

                rgb = decode_pnm_rgb(data)
            if rgb is None:
                from batch_processing_system_spark.functions.tga import (
                    decode_tga_rgb,
                )

                rgb = decode_tga_rgb(data, require_footer=True)
            if rgb is None:
                from batch_processing_system_spark.functions.ico import (
                    decode_ico_rgb,
                )

                rgb = decode_ico_rgb(data)
            if rgb is None:
                from batch_processing_system_spark.functions.qoi import (
                    decode_qoi_rgb,
                )

                rgb = decode_qoi_rgb(data)
            if rgb is None:
                from batch_processing_system_spark.functions.pcx import (
                    decode_pcx_rgb,
                )

                rgb = decode_pcx_rgb(data)
            if rgb is None:
                from batch_processing_system_spark.functions.sunras import (
                    decode_sunras_rgb,
                )

                rgb = decode_sunras_rgb(data)
            if rgb is None:
                from batch_processing_system_spark.functions.xbm import (
                    decode_xbm_rgb,
                )

                rgb = decode_xbm_rgb(data)
            row = (name, "image", int(rgb.shape[1]), int(rgb.shape[0]), 1,
                   hashlib.sha256(rgb.tobytes()).hexdigest())
        f, k, w, h, n, s = row
        w_sql = "CAST(NULL AS INTEGER)" if w is None else str(w)
        h_sql = "CAST(NULL AS INTEGER)" if h is None else str(h)
        print(f"    ('{f}', '{k}', {w_sql}, {h_sql}, CAST({n} AS BIGINT), '{s}'),")


if __name__ == "__main__":
    main()
