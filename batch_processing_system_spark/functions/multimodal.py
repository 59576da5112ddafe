"""Multimodal feature extraction over binary columns (north-star
"multimodal columns": decode / feature-extract / resize / frame-sample
as Arrow-batched Python over mapInPandas).

What's real here vs stubbed (this container has no image/audio libs):

- REAL: the Spark plumbing — schemas, mapInPandas batch shape,
  partition behavior — pure-Python container-header parsing
  (PNG/GIF/BMP/JPEG dimensions, WAV sample rate/duration), a
  pure-stdlib+numpy pixel decode + nearest-neighbor resize for
  uncompressed 24/32-bit BMP (BI_RGB), for PNG (stdlib zlib inflate +
  all five scanline filters, color types gray/RGB/palette/gray-alpha/
  RGBA at bit depth 8 AND 16, non-interlaced and Adam7 — r5), AND for
  JPEG (functions/jpeg.py — canonical
  Huffman entropy decode, dequantize, numpy IDCT, chroma upsample,
  YCbCr→RGB; baseline SOF0 and progressive SOF2 with spectral
  selection + successive approximation; grayscale + color at any
  sampling, restart markers), integer-PCM WAV decode with signal
  features (RMS/peak/zero-crossings over the mono mix), and
  animated-GIF frame sampling with a pure-Python LZW decoder + palette
  mapping AND full frame composition (partial frames at offsets,
  transparency, disposal methods 0-3, 4-pass interlace — r5; the GIF
  path is feature-complete), MJPEG-in-AVI frame
  sampling (RIFF walk + the same JPEG
  decoder — a TRUE video container decoded end-to-end), and IMA/DVI
  ADPCM — the classic 4:1 COMPRESSED-audio WAV — decoded from the
  public spec (step/index tables, per-block headers). Every
  still-image format and every modality (image pixels, audio samples
  incl. one compressed codec, motion frames incl. one real container)
  has a real end-to-end decode path.
- STUBBED: arithmetic-coded/lossless JPEG, perceptual audio codecs
  (mp3/aac/ogg need a codec lib), and inter-frame-coded video
  (h264/vp9 in mp4/webm need PyAV/ffmpeg) raise NotImplementedError
  naming the dependency; the call signatures and output schemas are
  final so swapping the real library in changes no plan.
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from .guard import controlled_decode

try:  # pragma: no cover - absent in this container
    from PIL import Image as _PIL_Image  # type: ignore
except Exception:
    _PIL_Image = None

MEDIA_META_SCHEMA = (
    "path string, length bigint, format string, width int, height int, "
    "sample_rate int, duration_ms bigint"
)


def _sniff(content: bytes | None) -> tuple:
    """(format, width, height, sample_rate, duration_ms) from container
    headers — pure byte arithmetic, no decoders."""
    if not content or len(content) < 12:
        return ("unknown", None, None, None, None)
    if content[:8] == b"\x89PNG\r\n\x1a\n" and len(content) >= 24:
        w, h = struct.unpack(">II", content[16:24])
        return ("png", w, h, None, None)
    if content[:6] in (b"GIF87a", b"GIF89a") and len(content) >= 10:
        w, h = struct.unpack("<HH", content[6:10])
        return ("gif", w, h, None, None)
    if content[:2] == b"BM" and len(content) >= 26:
        w, h = struct.unpack("<ii", content[18:26])
        return ("bmp", w, abs(h), None, None)
    if content[:2] in (b"II", b"MM") and content[2:4] in (b"\x2a\x00", b"\x00\x2a"):
        bo = "<" if content[:2] == b"II" else ">"
        try:
            ifd = struct.unpack(bo + "I", content[4:8])[0]
            n = struct.unpack(bo + "H", content[ifd : ifd + 2])[0]
            w = h = None
            for i in range(n):
                e = content[ifd + 2 + 12 * i : ifd + 14 + 12 * i]
                tag, typ = struct.unpack(bo + "HH", e[:4])
                if tag in (256, 257):
                    v = struct.unpack(
                        bo + ("H" if typ == 3 else "I"), e[8 : 10 if typ == 3 else 12]
                    )[0]
                    if tag == 256:
                        w = v
                    else:
                        h = v
            return ("tiff", w, h, None, None)
        except (struct.error, IndexError):
            return ("tiff", None, None, None, None)
    if content[:3] == b"\xff\xd8\xff":
        # walk JPEG segments to the SOF marker for dimensions
        i = 2
        while i + 9 < len(content):
            if content[i] != 0xFF:
                break
            marker, seglen = content[i + 1], struct.unpack(">H", content[i + 2 : i + 4])[0]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = struct.unpack(">HH", content[i + 5 : i + 9])
                return ("jpeg", w, h, None, None)
            i += 2 + seglen
        return ("jpeg", None, None, None, None)
    if content[:4] == b"RIFF" and content[8:12] == b"WAVE" and len(content) >= 32:
        sample_rate = struct.unpack("<I", content[24:28])[0]
        byte_rate = struct.unpack("<I", content[28:32])[0]
        data_size = max(len(content) - 44, 0)
        dur = int(data_size * 1000 / byte_rate) if byte_rate else None
        return ("wav", None, None, sample_rate, dur)
    return ("unknown", None, None, None, None)


def extract_media_metadata(binary_df: DataFrame) -> DataFrame:
    """mapInPandas feature extraction: (path, content) batches in Arrow,
    typed metadata out. One Python crossing per batch, not per file."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [_sniff(c) for c in pdf["content"]]
            out = pd.DataFrame(
                metas, columns=["format", "width", "height", "sample_rate", "duration_ms"]
            )
            out.insert(0, "path", pdf["path"].values)
            out.insert(1, "length", pdf["length"].values)
            yield out

    return binary_df.select("path", "length", "content").mapInPandas(
        extract, MEDIA_META_SCHEMA
    )


@controlled_decode("BMP")
def _decode_bmp_rgb(content: bytes):
    """Decode an uncompressed 24/32-bit BI_RGB BMP to a top-down
    (h, w, 3) uint8 RGB array — pure struct+numpy, no image library.
    Returns None for anything that isn't such a BMP."""
    import numpy as np

    if not content or len(content) < 54 or content[:2] != b"BM":
        return None
    data_off = struct.unpack("<I", content[10:14])[0]
    dib_size = struct.unpack("<I", content[14:18])[0]
    if dib_size < 40:
        return None
    w, h = struct.unpack("<ii", content[18:26])
    bpp = struct.unpack("<H", content[28:30])[0]
    compression = struct.unpack("<I", content[30:34])[0]
    if compression != 0 or bpp not in (24, 32) or w <= 0 or h == 0:
        return None
    top_down, h_abs = h < 0, abs(h)
    nbytes = bpp // 8
    stride = ((w * nbytes + 3) // 4) * 4  # rows pad to 4-byte boundaries
    if len(content) < data_off + stride * h_abs:
        return None
    arr = np.frombuffer(content, dtype=np.uint8, count=stride * h_abs, offset=data_off)
    arr = arr.reshape(h_abs, stride)[:, : w * nbytes].reshape(h_abs, w, nbytes)
    if not top_down:
        arr = arr[::-1]
    return arr[:, :, [2, 1, 0]]  # stored BGR(A) → RGB


def _png_unfilter(raw: bytes, h: int, stride: int, bpp: int) -> bytearray:
    """Reverse PNG scanline filtering (spec filters 0-4: None, Sub, Up,
    Average, Paeth) over ``h`` scanlines of ``stride`` bytes, each
    preceded by its filter-type byte. Sequential by construction — each
    reconstructed byte depends on the one ``bpp`` back and the row
    above — so this is a per-file Python loop inside the Arrow batch;
    vectorizing across files, not within one, is the scale axis."""
    out = bytearray(h * stride)
    pos = 0
    for y in range(h):
        ft = raw[pos]
        pos += 1
        if ft > 4:
            raise ValueError(f"bad PNG filter type {ft}")
        row = y * stride
        up = row - stride
        for x in range(stride):
            fx = raw[pos + x]
            a = out[row + x - bpp] if x >= bpp else 0
            b = out[up + x] if y > 0 else 0
            if ft == 0:
                r = fx
            elif ft == 1:
                r = fx + a
            elif ft == 2:
                r = fx + b
            elif ft == 3:
                r = fx + ((a + b) >> 1)
            else:  # Paeth
                c = out[up + x - bpp] if (y > 0 and x >= bpp) else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                r = fx + (a if pa <= pb and pa <= pc else b if pb <= pc else c)
            out[row + x] = r & 0xFF
        pos += stride
    return out


# (channels in the raw scanline, has-palette) per PNG color type
_PNG_COLOR_TYPES = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


# Adam7 interlace pass geometry: (x_start, y_start, x_step, y_step)
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


@controlled_decode("PNG")
def _decode_png_rgb(content: bytes, rgba: bool = False):
    """Decode a 1/2/4/8/16-bit PNG (color types 0 gray, 2 RGB,
    3 palette, 4 gray+alpha, 6 RGBA; interlace 0 OR Adam7) to a
    top-down (h, w, 3) uint8 RGB array — stdlib zlib + struct + numpy
    only, no Pillow. Adam7 decodes each of the 7 passes as its own
    filtered sub-image and scatters it into place by the pass
    geometry; 16-bit samples reduce to their high byte (the standard
    16→8 mapping); sub-byte samples (1/2/4-bit, legal only for gray
    and palette) unpack MSB-first with per-row byte padding, gray
    scaling by 255/(2^depth-1) (exact for these depths). Alpha is
    dropped (no compositing), palette entries are looked up from
    PLTE. Returns None for non-PNG bytes.

    ``rgba=True`` (the APNG composition path) returns (h, w, 4)
    instead: color types 4/6 keep their alpha plane, 0/2 get opaque
    255, and palette entries take per-index alpha from tRNS (absent
    entries are opaque per the spec)."""
    import zlib

    import numpy as np

    if not content or content[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    pos, ihdr, plte, trns, idat = 8, None, None, None, bytearray()
    while pos + 8 <= len(content):
        (clen,), ctype = struct.unpack(">I", content[pos : pos + 4]), content[pos + 4 : pos + 8]
        body = content[pos + 8 : pos + 8 + clen]
        pos += 12 + clen  # length + type + body + CRC (CRC not verified)
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"PLTE":
            plte = body
        elif ctype == b"tRNS":
            trns = body
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR or IDAT")
    w, h, depth, color, _comp, _filt, interlace = ihdr
    if color not in _PNG_COLOR_TYPES:
        raise ValueError(f"bad PNG color type {color}")
    if depth not in (1, 2, 4, 8, 16) or interlace not in (0, 1):
        raise ValueError(f"bad PNG depth={depth} interlace={interlace}")
    if depth == 16 and color == 3:
        raise ValueError("palette PNG cannot be 16-bit")
    if depth in (1, 2, 4) and color not in (0, 3):
        raise ValueError(f"PNG color type {color} cannot be {depth}-bit")
    ch = _PNG_COLOR_TYPES[color]
    # filter distance is in BYTES, min 1 for sub-byte depths (spec 4.5.2)
    bpp = max(1, ch * depth // 8)
    stride = (w * ch * depth + 7) // 8  # rows pad to a byte boundary
    raw = zlib.decompress(bytes(idat))

    def to8(buf, ph, pw):
        if depth == 16:
            u16 = np.frombuffer(buf, dtype=">u2").reshape(ph, pw, ch)
            return (u16 >> 8).astype(np.uint8)
        if depth < 8:  # sub-byte: samples pack MSB-first within a byte
            pstride = (pw * depth + 7) // 8
            bits = np.unpackbits(
                np.frombuffer(buf, dtype=np.uint8).reshape(ph, pstride), axis=1
            )
            weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
            vals = (
                bits[:, : (pstride * 8 // depth) * depth]
                .reshape(ph, -1, depth) * weights
            ).sum(axis=2)[:, :pw]
            if color == 0:  # gray: 255/(2^d - 1) is exact for d in 1,2,4
                vals = vals * (255 // ((1 << depth) - 1))
            return vals.astype(np.uint8).reshape(ph, pw, 1)
        return np.frombuffer(buf, dtype=np.uint8).reshape(ph, pw, ch)

    if interlace == 1:  # Adam7: 7 independently-filtered sub-images
        arr = np.zeros((h, w, ch), dtype=np.uint8)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            pstride = (pw * ch * depth + 7) // 8
            seg = raw[off : off + ph * (pstride + 1)]
            off += ph * (pstride + 1)
            arr[y0::dy, x0::dx] = to8(
                bytes(_png_unfilter(seg, ph, pstride, bpp)), ph, pw
            )
        if off != len(raw):
            raise ValueError("PNG interlaced IDAT length mismatch")
    else:
        if len(raw) != h * (stride + 1):
            raise ValueError("PNG IDAT length mismatch")
        arr = to8(bytes(_png_unfilter(raw, h, stride, bpp)), h, w)
    opaque = np.full((h, w, 1), 255, dtype=np.uint8)
    if color == 2:
        return np.concatenate([arr, opaque], axis=2) if rgba else arr
    if color == 6:
        return arr if rgba else arr[:, :, :3]
    if color == 0:
        rgb = np.repeat(arr, 3, axis=2)
        return np.concatenate([rgb, opaque], axis=2) if rgba else rgb
    if color == 4:
        rgb = np.repeat(arr[:, :, :1], 3, axis=2)
        if rgba:
            return np.concatenate([rgb, arr[:, :, 1:2]], axis=2)
        return rgb
    # color == 3: palette lookup
    if plte is None:
        raise ValueError("palette PNG missing PLTE")
    pal = np.frombuffer(plte, dtype=np.uint8)
    pal = pal.reshape(len(pal) // 3, 3)
    rgb = pal[arr[:, :, 0]]
    if rgba:
        alpha = np.full(len(pal), 255, dtype=np.uint8)
        if trns is not None:
            t = np.frombuffer(trns, dtype=np.uint8)
            alpha[: len(t)] = t
        return np.concatenate([rgb, alpha[arr[:, :, 0]][:, :, None]], axis=2)
    return rgb


def _resize_nearest(rgb, width: int, height: int):
    """Nearest-neighbor resample of a (h, w, 3) array — index
    arithmetic only, so results are deterministic everywhere."""
    import numpy as np

    h0, w0 = rgb.shape[:2]
    ys = np.arange(height) * h0 // height
    xs = np.arange(width) * w0 // width
    return rgb[ys][:, xs]


def _native_decode_rgb(data: bytes, pil_module=None):
    """Decode ``data`` to an (h, w, 3) uint8 RGB numpy array through
    Pillow (the native C fast path — ~100× the pure-Python decoders'
    throughput on JPEG); returns None when Pillow is absent or cannot
    read the bytes, so callers fall through to the pure lane. Decode
    ONLY — resizing always goes through ``_resize_nearest`` so pixels
    are lane-invariant for lossless formats (JPEG IDCTs may differ
    within the spec's tolerance between implementations)."""
    import io

    import numpy as np

    pil = pil_module if pil_module is not None else _PIL_Image
    if pil is None:
        return None
    try:
        img = pil.open(io.BytesIO(data)).convert("RGB")
        return np.asarray(img, dtype=np.uint8).reshape(img.size[1], img.size[0], 3)
    except Exception:
        return None


def decode_and_resize(
    binary_df: DataFrame, width: int, height: int, lane: str = "auto"
) -> DataFrame:
    """Pixel decode + resize → flattened RGB array column, schema
    (path string, pixels array<int>), row-major top-down RGB triplets.

    Two execution lanes, chosen per file inside the Arrow batch:
    - ``native``: Pillow decode (any format it reads) — the C fast
      path, ~100× pure-Python JPEG throughput, used when importable;
    - ``pure``: stdlib+numpy decoders — always available — for
      uncompressed 24/32-bit BMP (BI_RGB), PNG at every legal depth
      (1/2/4/8/16-bit, gray/RGB/palette/alpha, non-interlaced or
      Adam7), baseline + progressive JPEG (functions/jpeg.py
      Huffman+IDCT), TIFF, PNM, footered TGA, ICO, QOI, PCX, Sun
      raster, and XBM.
    ``lane`` forces a route for cross-checking: 'auto' (native per
    file when available, else pure), 'native' (Pillow required —
    raises NotImplementedError naming it when absent), 'pure' (never
    touches Pillow; the environment-independent digest lane).
    Resize is ALWAYS the repo's deterministic nearest-neighbor
    (_resize_nearest), so the two lanes are pixel-identical on
    lossless formats — tests/test_multimodal_lanes.py pins that.
    A file neither lane can decode raises NotImplementedError naming
    the missing dependency (surfaced through the task failure).
    """
    if lane not in ("auto", "native", "pure"):
        raise ValueError(f"decode_and_resize: unknown lane {lane!r}")

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if lane == "native" and _PIL_Image is None:
            raise NotImplementedError(
                "decode_and_resize(lane='native'): Pillow (PIL) is not "
                "installed in this environment"
            )
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                data = bytes(content) if content is not None else b""
                rgb = decode_rgb_any(data, lane=lane, path=path)
                rows.append(
                    (path, [int(v) for v in _resize_nearest(rgb, width, height).ravel()])
                )
            yield pd.DataFrame(rows, columns=["path", "pixels"])

    return binary_df.select("path", "content").mapInPandas(
        decode, "path string, pixels array<int>"
    )


def decode_rgb_any(
    data: bytes, lane: str = "auto", path: str = "", pil_module=None
):
    """Per-file still-image decode with lane dispatch — the unit the
    Arrow batches of decode_and_resize loop over, exposed so the lane
    contract is testable driver-side (worker processes can't be
    monkeypatched). Returns an (h, w, 3) uint8 RGB array or raises."""
    from .jpeg import decode_jpeg_rgb

    rgb = None
    if lane != "pure":
        rgb = _native_decode_rgb(data, pil_module=pil_module)
        if rgb is None and lane == "native":
            missing = (pil_module or _PIL_Image) is None
            raise NotImplementedError(
                "decode_rgb_any(lane='native'): Pillow (PIL) is not "
                "installed in this environment"
                if missing
                else f"decode_rgb_any: Pillow cannot read {path!r} "
                "and lane='native' forbids the pure fallback"
            )
    if rgb is not None:
        return rgb
    rgb = _decode_bmp_rgb(data)
    if rgb is None:
        rgb = _decode_png_rgb(data)
    if rgb is None:
        rgb = decode_jpeg_rgb(data)
    if rgb is None:
        from .tiff import decode_tiff_rgb

        rgb = decode_tiff_rgb(data)
    if rgb is None:
        from .pnm import decode_pnm_rgb

        rgb = decode_pnm_rgb(data)
    if rgb is None:
        from .tga import decode_tga_rgb

        rgb = decode_tga_rgb(data, require_footer=True)
    if rgb is None:
        from .ico import decode_ico_rgb

        rgb = decode_ico_rgb(data)
    if rgb is None:
        from .qoi import decode_qoi_rgb

        rgb = decode_qoi_rgb(data)
    if rgb is None:
        from .pcx import decode_pcx_rgb

        rgb = decode_pcx_rgb(data)
    if rgb is None:
        from .sunras import decode_sunras_rgb

        rgb = decode_sunras_rgb(data)
    if rgb is None:
        from .xbm import decode_xbm_rgb

        rgb = decode_xbm_rgb(data)
    if rgb is None:
        raise NotImplementedError(
            f"decode_and_resize: {path!r} is not a BMP, PNG, "
            "Huffman JPEG, baseline TIFF, PNM, footered TGA, "
            "ICO, QOI, PCX, Sun raster, or XBM, and Pillow "
            "(PIL) is not installed; install Pillow for other "
            "formats"
        )
    return rgb


# IMA/DVI ADPCM constants (public spec: IMA Digital Audio Focus and
# Technology Working Groups, 1992; also RFC 3551 §4.5.1 shape)
_IMA_INDEX_TABLE = (-1, -1, -1, -1, 2, 4, 6, 8)
_IMA_STEP_TABLE = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767,
)


def _ima_adpcm_decode(data: bytes, channels: int, block_align: int):
    """Decode an IMA ADPCM WAV data chunk (format tag 0x11) to int16
    samples, interleaved by channel — pure Python from the public
    spec: per-block per-channel 4-byte headers (predictor int16, step
    index, reserved), then 4-byte words of eight 4-bit nibbles per
    channel, low nibble first, words interleaved across channels."""
    import numpy as np

    out = [[] for _ in range(channels)]
    # iterate to len(data): real encoders commonly emit a short final
    # block, and its samples are still valid — decode as many complete
    # 4-byte-per-channel word groups as the remainder holds after the
    # per-channel headers (a tail shorter than the headers is dropped)
    for bstart in range(0, len(data), block_align):
        block = data[bstart : bstart + block_align]
        if len(block) < 4 * channels:
            break
        preds, idxs = [], []
        for c in range(channels):
            pred, idx = struct.unpack("<hB", block[4 * c : 4 * c + 3])
            preds.append(pred)
            idxs.append(min(88, max(0, idx)))
            out[c].append(pred)  # the header predictor IS sample 0
        pos = 4 * channels
        while pos + 4 * channels <= len(block):
            for c in range(channels):
                word = block[pos + 4 * c : pos + 4 * c + 4]
                for byte in word:
                    for nib in (byte & 0x0F, byte >> 4):
                        step = _IMA_STEP_TABLE[idxs[c]]
                        diff = step >> 3
                        if nib & 1:
                            diff += step >> 2
                        if nib & 2:
                            diff += step >> 1
                        if nib & 4:
                            diff += step
                        if nib & 8:
                            preds[c] -= diff
                        else:
                            preds[c] += diff
                        preds[c] = max(-32768, min(32767, preds[c]))
                        idxs[c] = max(0, min(88, idxs[c] + _IMA_INDEX_TABLE[nib & 7]))
                        out[c].append(preds[c])
            pos += 4 * channels
    n = min(len(ch_s) for ch_s in out)
    return np.array([ch_s[:n] for ch_s in out], dtype=np.int16).T.reshape(-1)


def _mulaw_table():
    """G.711 mu-law byte -> linear int16 (ITU-T G.711 decoder: invert
    all bits, then ((mantissa<<3 | 0x84) << exponent) - 0x84, signed).
    256-entry table built once per process."""
    import numpy as np

    global _MULAW_LUT
    if _MULAW_LUT is None:
        out = np.empty(256, dtype=np.int16)
        for b in range(256):
            u = ~b & 0xFF
            sign = u & 0x80
            exp = (u >> 4) & 0x07
            mant = u & 0x0F
            mag = (((mant << 3) | 0x84) << exp) - 0x84
            out[b] = -mag if sign else mag
        _MULAW_LUT = out
    return _MULAW_LUT


def _alaw_table():
    """G.711 A-law byte -> linear int16 (even bits inverted by 0x55;
    exponent 0 is the linear segment; NOTE the sign convention is the
    reverse of mu-law: sign bit SET means positive)."""
    import numpy as np

    global _ALAW_LUT
    if _ALAW_LUT is None:
        out = np.empty(256, dtype=np.int16)
        for b in range(256):
            a = b ^ 0x55
            sign = a & 0x80
            exp = (a >> 4) & 0x07
            mant = a & 0x0F
            if exp == 0:
                mag = (mant << 4) | 0x08
            else:
                mag = ((mant << 4) | 0x108) << (exp - 1)
            out[b] = mag if sign else -mag
        _ALAW_LUT = out
    return _ALAW_LUT


_MULAW_LUT = None
_ALAW_LUT = None


def _wav_pcm(content: bytes):
    """Walk RIFF chunks of a WAV and return (sample_rate, channels,
    bits, samples ndarray normalized to [-1, 1] mono) — pure
    struct+numpy. Integer PCM (8/16/24/32-bit) and IEEE-float PCM
    (format tag 3, 32/64-bit) are read directly; IMA/DVI ADPCM
    (format tag 0x11 — the classic 4:1 compressed-audio WAV) is
    decoded by _ima_adpcm_decode; WAVE_FORMAT_EXTENSIBLE (0xFFFE)
    unwraps to the real tag from the fmt extension's SubFormat GUID.
    None for anything else."""
    import numpy as np

    if not content or len(content) < 12 or content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        return None
    pos, fmt, fmt_body, data = 12, None, b"", None
    while pos + 8 <= len(content):
        cid = content[pos : pos + 4]
        size = struct.unpack("<I", content[pos + 4 : pos + 8])[0]
        body = content[pos + 8 : pos + 8 + size]
        if cid == b"fmt " and len(body) >= 16:
            fmt = struct.unpack("<HHIIHH", body[:16])
            fmt_body = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks pad to even offsets
    if fmt is None or data is None:
        return None
    audio_fmt, channels, sample_rate, _, block_align, bits = fmt
    if channels < 1:
        return None
    if audio_fmt == 0xFFFE and len(fmt_body) >= 40:
        # EXTENSIBLE: cbSize(2) validbits(2) channelmask(4) SubFormat
        # GUID(16); the GUID's first two bytes are the wrapped tag
        audio_fmt = struct.unpack("<H", fmt_body[24:26])[0]
    if audio_fmt == 0x11 and bits == 4 and block_align >= 4 * channels:
        raw16 = _ima_adpcm_decode(data, channels, block_align)
        x = raw16.astype(np.float64) / 32768.0
    elif audio_fmt == 1 and bits == 16:
        raw = np.frombuffer(data, dtype="<i2", count=len(data) // 2)
        x = raw.astype(np.float64) / 32768.0
    elif audio_fmt == 1 and bits == 8:  # 8-bit PCM is unsigned
        raw = np.frombuffer(data, dtype=np.uint8)
        x = (raw.astype(np.float64) - 128.0) / 128.0
    elif audio_fmt == 1 and bits == 24:
        # 3-byte little-endian signed: widen to int32 via a zero pad
        # byte then an arithmetic shift (keeps the sign bit)
        n3 = len(data) - len(data) % 3
        b3 = np.frombuffer(data[:n3], dtype=np.uint8).reshape(-1, 3)
        b4 = np.zeros((b3.shape[0], 4), dtype=np.uint8)
        b4[:, 1:] = b3
        raw = b4.view("<i4").reshape(-1) >> 8
        x = raw.astype(np.float64) / float(1 << 23)
    elif audio_fmt == 1 and bits == 32:
        raw = np.frombuffer(data, dtype="<i4", count=len(data) // 4)
        x = raw.astype(np.float64) / float(1 << 31)
    elif audio_fmt == 3 and bits == 32:  # IEEE float
        x = np.frombuffer(data, dtype="<f4", count=len(data) // 4).astype(
            np.float64
        )
    elif audio_fmt == 3 and bits == 64:
        x = np.frombuffer(data, dtype="<f8", count=len(data) // 8).copy()
    elif audio_fmt in (6, 7) and bits == 8:  # G.711 A-law / mu-law
        lut = _alaw_table() if audio_fmt == 6 else _mulaw_table()
        raw = lut[np.frombuffer(data, dtype=np.uint8)]
        x = raw.astype(np.float64) / 32768.0
    else:
        return None
    n = (len(x) // channels) * channels
    mono = x[:n].reshape(-1, channels).mean(axis=1)
    return sample_rate, channels, bits, mono


@controlled_decode("WAV/FLAC/AIFF")
def _audio_mono(data: bytes):
    """Dispatch audio decode: integer-PCM / IMA-ADPCM WAV, native
    FLAC (functions/flac.py, r6), or AIFF/AIFF-C PCM (functions/aiff.py). Returns (sample_rate, channels,
    bits, float64 mono in [-1, 1]) or None if the format is neither."""
    import numpy as np

    dec = _wav_pcm(data)
    if dec is not None:
        return dec
    if data[:4] == b"fLaC":
        from .flac import decode_flac

        sr, ch, bits, samples = decode_flac(data)
        x = samples.astype(np.float64) / float(1 << (bits - 1))
        n = (len(x) // ch) * ch
        return sr, ch, bits, x[:n].reshape(-1, ch).mean(axis=1)
    from .aiff import decode_aiff

    dec = decode_aiff(data)
    if dec is not None:
        sr, ch, bits, samples = dec
        x = samples.astype(np.float64) / float(1 << (bits - 1))
        n = (len(x) // ch) * ch
        return sr, ch, bits, x[:n].reshape(-1, ch).mean(axis=1)
    return None


AUDIO_FEATURES_SCHEMA = (
    "path string, sample_rate int, channels int, bits int, "
    "n_samples bigint, duration_ms bigint, rms double, peak double, "
    "zero_crossings bigint"
)


def extract_audio_features(binary_df: DataFrame) -> DataFrame:
    """REAL audio decode (no stub): integer-PCM / IMA-ADPCM WAV and
    native FLAC (lossless, decoded exactly by functions/flac.py) →
    per-file signal features via one Arrow crossing per batch.
    Perceptual codecs (mp3/aac/ogg) raise NotImplementedError naming
    the codec gap. The mono mix, RMS, peak and zero-crossing count are
    the standard cheap speech/music screens of an audio training-data
    pipeline; at 100 TB this is a map-only pass over the binary
    column, exactly like q80 over text."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                dec = _audio_mono(bytes(content) if content is not None else b"")
                if dec is None:
                    raise NotImplementedError(
                        f"extract_audio_features: {path!r} is not integer/"
                        "float-PCM/IMA-ADPCM WAV or native FLAC; perceptual audio (mp3/"
                        "aac/ogg) needs a codec library (e.g. soundfile/"
                        "ffmpeg), not installed here"
                    )
                sr, ch, bits, mono = dec
                n = int(mono.size)
                rms = float(np.sqrt(np.mean(mono**2))) if n else 0.0
                peak = float(np.max(np.abs(mono))) if n else 0.0
                zc = int(np.count_nonzero(np.diff(np.signbit(mono)))) if n > 1 else 0
                rows.append(
                    (path, sr, ch, bits, n, int(n * 1000 / sr), round(rms, 6), round(peak, 6), zc)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "path", "sample_rate", "channels", "bits", "n_samples",
                    "duration_ms", "rms", "peak", "zero_crossings",
                ],
            )

    return binary_df.select("path", "content").mapInPandas(
        extract, AUDIO_FEATURES_SCHEMA
    )


SPECTRAL_FEATURES_SCHEMA = (
    "path string, sample_rate int, n_samples bigint, "
    "spectral_centroid_hz double, spectral_bandwidth_hz double, "
    "spectral_rolloff_hz double, spectral_flatness double"
)


def spectral_features_from_mono(sr: int, mono) -> tuple:
    """Magnitude-spectrum shape features from a mono float64 signal:
    centroid (power-weighted mean frequency), bandwidth (power-weighted
    std around it), 85% rolloff, and flatness (geometric/arithmetic
    mean of power, the noisiness measure; 1 = white noise, ->0 =
    tonal). DC is excluded so silence and constant offsets read as
    flatness 0. Pure numpy rfft — tested against a direct O(n^2) DFT
    reference in tests/test_multimodal.py."""
    import numpy as np

    n = int(mono.size)
    if n < 2:
        return (0.0, 0.0, 0.0, 0.0)
    spec = np.abs(np.fft.rfft(mono))
    freqs = np.fft.rfftfreq(n, d=1.0 / sr)
    power = spec[1:] ** 2  # drop DC
    freqs = freqs[1:]
    total = float(power.sum())
    if total <= 0.0:
        return (0.0, 0.0, 0.0, 0.0)
    centroid = float((freqs * power).sum() / total)
    bandwidth = float(np.sqrt(((freqs - centroid) ** 2 * power).sum() / total))
    cum = np.cumsum(power)
    rolloff = float(freqs[int(np.searchsorted(cum, 0.85 * total))])
    # flatness over the positive-frequency power spectrum
    with np.errstate(divide="ignore"):
        logp = np.log(power[power > 0])
    gm = float(np.exp(logp.mean())) if logp.size else 0.0
    am = total / power.size
    flatness = float(gm / am) if am > 0 else 0.0
    return (centroid, bandwidth, rolloff, flatness)


def extract_spectral_features(binary_df: DataFrame) -> DataFrame:
    """Frequency-domain screens for audio curation — the companions
    to extract_audio_features' time-domain ones: tonal-vs-noise
    (flatness), brightness (centroid/rolloff), spread (bandwidth).
    Same decode dispatch (_audio_mono: every WAV sample format,
    IMA-ADPCM, FLAC), same one-Arrow-crossing-per-batch mapInPandas
    shape; FFT cost is O(n log n) per file and embarrassingly
    parallel. Values are rounded to 4dp — FFT floats are
    library-deterministic, not cross-engine-deterministic, so this
    surface is pytest-verified (vs a direct DFT reference), not
    oracle-checked."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                dec = _audio_mono(bytes(content) if content is not None else b"")
                if dec is None:
                    raise NotImplementedError(
                        f"extract_spectral_features: {path!r} is not a "
                        "decodable WAV/FLAC; perceptual audio (mp3/aac/ogg) "
                        "needs a codec library, not installed here"
                    )
                sr, _ch, _bits, mono = dec
                c, b, r, f = spectral_features_from_mono(sr, mono)
                rows.append(
                    (path, sr, int(mono.size), round(c, 4), round(b, 4),
                     round(r, 4), round(f, 4))
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "path", "sample_rate", "n_samples",
                    "spectral_centroid_hz", "spectral_bandwidth_hz",
                    "spectral_rolloff_hz", "spectral_flatness",
                ],
            )

    return binary_df.select("path", "content").mapInPandas(
        extract, SPECTRAL_FEATURES_SCHEMA
    )


def _gif_lzw_decode(mcs: int, data: bytes) -> bytes:
    """GIF-flavor LZW decode (LSB-first codes, CLEAR/END, 12-bit max)
    → palette-index bytes. Pure Python; raises ValueError on a corrupt
    stream."""
    clear, end = 1 << mcs, (1 << mcs) + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    width = mcs + 1
    out = bytearray()
    prev = None
    bitpos, nbits = 0, len(data) * 8
    while bitpos + width <= nbits:
        byte_i = bitpos >> 3
        code = int.from_bytes(data[byte_i : byte_i + 3], "little")
        code = (code >> (bitpos & 7)) & ((1 << width) - 1)
        bitpos += width
        if code == clear:
            table, width, prev = list(base), mcs + 1, None
            continue
        if code == end:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("corrupt GIF LZW stream")
        out += entry
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    return bytes(out)


@controlled_decode("GIF")
def _gif_frames(content: bytes):
    """Parse an (animated) GIF into [(delay_ms, width, height, rgb
    bytes)] — pure Python block walk + LZW with full frame
    COMPOSITION (r5): partial frames paint onto a persistent logical
    screen at their (left, top) offset, transparency leaves the
    underlying canvas visible, and the GCE disposal methods are
    honored (0/1 keep, 2 restore-to-background, 3 restore-previous);
    interlaced frames deinterlace via the 4-pass row order. Every
    emitted frame is the composed logical screen. Returns None if not
    a GIF.

    Disposal 2 (restore-to-background) follows common renderer
    behavior (browsers, Pillow): the restored rect becomes
    TRANSPARENT, not the background-color palette entry — and because
    the output is RGB (no alpha channel), never-painted/restored
    pixels emit a fixed black (0,0,0) sentinel, matching what an
    RGBA→RGB flatten over black would produce."""
    if not content or content[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    sw, sh, flags = struct.unpack("<HHB", content[6:11])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 3 * (2 << (flags & 7))
        gct = content[pos : pos + n]
        pos += n
    # transparent-pixel sentinel: the canvas starts transparent and
    # disposal 2 restores to transparent (see docstring) — in RGB
    # output that is a fixed black, NOT the background palette entry
    bg_rgb = b"\x00\x00\x00"
    canvas = bytearray(bg_rgb * (sw * sh))
    frames, delay_ms, disposal, transp = [], 0, 0, None
    while pos < len(content):
        b0 = content[pos]
        if b0 == 0x3B:  # trailer
            break
        if b0 == 0x21:  # extension
            label = content[pos + 1]
            pos += 2
            if label == 0xF9 and content[pos] == 4:
                packed = content[pos + 1]
                delay_ms = struct.unpack("<H", content[pos + 2 : pos + 4])[0] * 10
                disposal = (packed >> 2) & 7
                transp = content[pos + 4] if packed & 1 else None
            while content[pos]:  # skip sub-blocks
                pos += 1 + content[pos]
            pos += 1
            continue
        if b0 == 0x2C:  # image descriptor
            left, top, w, h, iflags = struct.unpack("<HHHHB", content[pos + 1 : pos + 10])
            pos += 10
            pal = gct
            if iflags & 0x80:
                n = 3 * (2 << (iflags & 7))
                pal = content[pos : pos + n]
                pos += n
            if pal is None:
                raise ValueError("GIF frame has no palette")
            mcs = content[pos]
            pos += 1
            data = bytearray()
            while content[pos]:
                ln = content[pos]
                data += content[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            idx = _gif_lzw_decode(mcs, bytes(data))[: w * h]
            if iflags & 0x40:  # interlaced: rows arrive in 4-pass order
                order = (
                    list(range(0, h, 8)) + list(range(4, h, 8))
                    + list(range(2, h, 4)) + list(range(1, h, 2))
                )
                deinter = bytearray(w * h)
                for src, dst in enumerate(order):
                    deinter[dst * w : (dst + 1) * w] = idx[src * w : (src + 1) * w]
                idx = bytes(deinter)
            saved = bytes(canvas) if disposal == 3 else None
            for row in range(min(h, sh - top)):
                for col in range(min(w, sw - left)):
                    ci = idx[row * w + col]
                    if transp is not None and ci == transp:
                        continue
                    o = 3 * ((top + row) * sw + (left + col))
                    canvas[o : o + 3] = pal[3 * ci : 3 * ci + 3]
            frames.append((delay_ms, sw, sh, bytes(canvas)))
            if disposal == 2:  # restore the frame's rect to transparent
                for row in range(min(h, sh - top)):
                    for col in range(min(w, sw - left)):
                        o = 3 * ((top + row) * sw + (left + col))
                        canvas[o : o + 3] = bg_rgb  # transparent sentinel
            elif disposal == 3 and saved is not None:
                canvas = bytearray(saved)
            delay_ms, disposal, transp = 0, 0, None
            continue
        raise ValueError(f"unknown GIF block 0x{b0:02x}")
    return frames


@controlled_decode("AVI")
def _avi_mjpeg_frames(content: bytes):
    """Parse an AVI container (RIFF walk) whose video stream is MJPEG
    (every '00dc'/'00db' chunk a standalone JPEG, decoded by
    functions/jpeg.py) or UNCOMPRESSED DIB ('DIB '/raw biCompression=0
    frames: bottom-up 4-byte-aligned BGR(A)/palette rows described by
    the stream's strf BITMAPINFOHEADER) into the same
    [(delay_ms, width, height, rgb bytes)] shape as _gif_frames.
    Returns None if not an AVI; raises NotImplementedError naming the
    fourcc when the stream is some other codec."""
    if not content or len(content) < 12 or content[:4] != b"RIFF" or content[8:12] != b"AVI ":
        return None
    from .jpeg import decode_jpeg_rgb

    us_per_frame = [None]
    # streams are numbered by 'strh' order in the hdrl LIST (which
    # precedes movi); collect ONLY the first 'vids' stream's '##dc/db'
    # chunks so a multi-stream AVI (audio+video, or two video streams)
    # doesn't interleave foreign frames into one timeline
    stream_no, video_stream = [0], [None]
    expect_strf, video_strf = [False], [None]
    frame_chunks: list[bytes] = []

    def walk(pos: int, end: int) -> None:
        while pos + 8 <= end:
            cid = content[pos : pos + 4]
            size = struct.unpack("<I", content[pos + 4 : pos + 8])[0]
            body = pos + 8
            if cid in (b"LIST", b"RIFF"):
                walk(body + 4, min(body + size, len(content)))
            elif cid == b"avih":
                us_per_frame[0] = struct.unpack("<I", content[body : body + 4])[0]
            elif cid == b"strh":
                if content[body : body + 4] == b"vids" and video_stream[0] is None:
                    video_stream[0] = stream_no[0]
                    expect_strf[0] = True
                stream_no[0] += 1
            elif cid == b"strf":
                # the strf following the selected video strh carries its
                # BITMAPINFOHEADER (raw-DIB geometry + palette)
                if expect_strf[0]:
                    video_strf[0] = content[body : body + size]
                    expect_strf[0] = False
            elif cid[2:4] in (b"dc", b"db") and size > 0:
                want = b"%02d" % (video_stream[0] if video_stream[0] is not None else 0)
                if cid[:2] == want:
                    frame_chunks.append(content[body : body + size])
            pos = body + size + (size & 1)  # chunks pad to even offsets

    walk(12, len(content))
    if not frame_chunks:
        return None
    delay_ms = max(1, (us_per_frame[0] or 40_000) // 1000)
    frames = []
    for chunk in frame_chunks:
        rgb = decode_jpeg_rgb(chunk)
        if rgb is None:
            rgb = _avi_dib_frame(chunk, video_strf[0])
        if rgb is None:
            fourcc = (video_strf[0] or b"?" * 20)[16:20]
            raise NotImplementedError(
                f"sample_video_frames: AVI video stream (strf codec "
                f"{fourcc!r}) is neither MJPEG nor uncompressed DIB; "
                "other video codecs (h264/vp9/...) need an AV decoder "
                "(e.g. PyAV/ffmpeg), not installed here"
            )
        h, w = rgb.shape[:2]
        frames.append((delay_ms, w, h, rgb.tobytes()))
    return frames


def _avi_dib_frame(chunk: bytes, strf: bytes | None):
    """Decode one raw-DIB AVI frame ('00db' with biCompression=0) from
    the stream's BITMAPINFOHEADER: bottom-up (or top-down when height
    is negative) rows padded to 4 bytes, 24-bit BGR / 32-bit BGRX /
    8-bit palette. Returns None when the strf is absent or names a
    compressed codec (the caller reports the fourcc)."""
    import numpy as np

    if strf is None or len(strf) < 40:
        return None
    _sz, w, h, _planes, bpp, comp = struct.unpack("<IiihhI", strf[:20])
    if comp != 0 or w <= 0 or h == 0:
        return None
    top_down = h < 0
    h = abs(h)
    stride = ((w * bpp + 31) // 32) * 4
    if bpp == 8:
        pal_raw = np.frombuffer(strf[40 : 40 + 4 * 256], dtype=np.uint8)
        if pal_raw.size < 4:
            raise ValueError("avi: 8-bit DIB stream without a palette")
        pal = pal_raw.reshape(-1, 4)[:, 2::-1]  # BGRX -> RGB
        raw = np.frombuffer(chunk[: stride * h], dtype=np.uint8)
        if raw.size < stride * h:
            raise ValueError("avi: truncated DIB frame")
        idx = raw.reshape(h, stride)[:, :w]
        if idx.max(initial=0) >= len(pal):
            raise ValueError("avi: DIB palette index out of range")
        img = pal[idx].astype(np.uint8)
    elif bpp in (24, 32):
        bypp = bpp // 8
        raw = np.frombuffer(chunk[: stride * h], dtype=np.uint8)
        if raw.size < stride * h:
            raise ValueError("avi: truncated DIB frame")
        px = raw.reshape(h, stride)[:, : w * bypp].reshape(h, w, bypp)
        img = px[:, :, 2::-1].copy()
    else:
        raise ValueError(f"avi: unsupported DIB depth {bpp}")
    return img if top_down else img[::-1].copy()


MEDIA_DECODE_STATS_SCHEMA = (
    "path string, kind string, width int, height int, "
    "n_frames bigint, content_sha string"
)


def extract_decode_stats(binary_df: DataFrame) -> DataFrame:
    """Full decode → deterministic per-file statistics, the
    oracle-checkable face of the multimodal decoders (q99):

    - still images (BMP / PNG any legal depth / baseline+progressive
      JPEG): kind='image', (width, height), n_frames=1, sha256 of the
      decoded (h, w, 3) RGB bytes;
    - animated GIF and MJPEG-in-AVI: kind='video', first-frame
      dimensions, n_frames = frame count, sha256 over the concatenated
      composed-frame RGB bytes;
    - WAV (integer/float PCM / IMA ADPCM): kind='audio', n_frames = decoded
      mono sample count, sha256 of the float64 mono sample buffer.

    ALWAYS the repo's pure decoders — never Pillow, even when
    importable — so the digest is environment-independent. Arrow-batch
    mapInPandas like every extractor here; scale note: one Python
    crossing per batch, decode cost is per-byte of media and
    embarrassingly parallel."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        from .jpeg import decode_jpeg_rgb

        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                data = bytes(content) if content is not None else b""
                apng_frames = None
                if data[:8] == b"\x89PNG\r\n\x1a\n":
                    from .apng import decode_apng_frames

                    # None for a STILL png -> falls to the image chain
                    apng_frames = decode_apng_frames(data)
                if apng_frames is not None or data[:6] in (
                    b"GIF87a", b"GIF89a"
                ) or (data[:4] == b"RIFF" and data[8:12] == b"AVI "):
                    frames = apng_frames
                    if frames is None:
                        frames = _gif_frames(data)
                    if frames is None:
                        frames = _avi_mjpeg_frames(data)
                    dig = hashlib.sha256()
                    for _, _, _, rgb in frames:
                        dig.update(rgb)
                    rows.append(
                        (path, "video", frames[0][1], frames[0][2],
                         len(frames), dig.hexdigest())
                    )
                elif (
                    (data[:4] == b"RIFF" and data[8:12] == b"WAVE")
                    or data[:4] == b"fLaC"
                    or (data[:4] == b"FORM" and data[8:12] in (b"AIFF", b"AIFC"))
                ):
                    decoded = _audio_mono(data)
                    if decoded is None:
                        raise NotImplementedError(
                            f"extract_decode_stats: {path!r} WAV format is "
                            "not integer/float PCM, IMA ADPCM, FLAC, or AIFF PCM"
                        )
                    _, _, _, mono = decoded
                    rows.append(
                        (path, "audio", None, None, int(mono.size),
                         hashlib.sha256(mono.tobytes()).hexdigest())
                    )
                else:
                    rgb = _decode_bmp_rgb(data)
                    if rgb is None:
                        rgb = _decode_png_rgb(data)
                    if rgb is None:
                        rgb = decode_jpeg_rgb(data)
                    if rgb is None:
                        from .tiff import decode_tiff_rgb

                        rgb = decode_tiff_rgb(data)
                    if rgb is None:
                        from .pnm import decode_pnm_rgb

                        rgb = decode_pnm_rgb(data)
                    if rgb is None:
                        from .tga import decode_tga_rgb

                        rgb = decode_tga_rgb(data, require_footer=True)
                    if rgb is None:
                        from .ico import decode_ico_rgb

                        rgb = decode_ico_rgb(data)
                    if rgb is None:
                        from .qoi import decode_qoi_rgb

                        rgb = decode_qoi_rgb(data)
                    if rgb is None:
                        from .pcx import decode_pcx_rgb

                        rgb = decode_pcx_rgb(data)
                    if rgb is None:
                        from .sunras import decode_sunras_rgb

                        rgb = decode_sunras_rgb(data)
                    if rgb is None:
                        from .xbm import decode_xbm_rgb

                        rgb = decode_xbm_rgb(data)
                    if rgb is None:
                        raise NotImplementedError(
                            f"extract_decode_stats: {path!r} is not a BMP, "
                            "PNG, Huffman JPEG, TIFF, PNM, footered TGA, "
                            "ICO, QOI, PCX, Sun raster, XBM, GIF, WAV/AIFF, "
                            "or MJPEG/DIB AVI"
                        )
                    rows.append(
                        (path, "image", int(rgb.shape[1]), int(rgb.shape[0]),
                         1, hashlib.sha256(rgb.tobytes()).hexdigest())
                    )
            yield pd.DataFrame(
                rows,
                columns=["path", "kind", "width", "height", "n_frames", "content_sha"],
            )

    return binary_df.select("path", "content").mapInPandas(
        stats, MEDIA_DECODE_STATS_SCHEMA
    )


VIDEO_FRAMES_SCHEMA = (
    "path string, frame_idx int, frame_ms bigint, width int, height int, "
    "frame_rgb binary"
)


def sample_video_frames(binary_df: DataFrame, every_ms: int) -> DataFrame:
    """REAL frame sampling for the motion formats this container can
    decode end-to-end: animated GIF (block walk + pure-Python LZW +
    palette mapping) and MJPEG-in-AVI (RIFF walk + the repo's own JPEG
    decoder) — no library either way. Sampling ticks every
    ``every_ms`` over the cumulative frame timeline; each tick emits
    the frame active at that instant (deduped), as raw RGB bytes with
    its start timestamp. Inter-frame-coded video (h264/vp9 in
    mp4/webm) raises NotImplementedError naming the AV dependency —
    the schema is final either way, so swapping in PyAV changes no
    plan."""
    # plan-build-time guard: every_ms <= 0 would make the tick loop
    # inside the executor task never advance (infinite loop in a worker,
    # invisible from the driver) — fail fast here instead
    if every_ms < 1:
        raise ValueError(f"every_ms must be >= 1, got {every_ms}")

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                data = bytes(content) if content is not None else b""
                frames = _gif_frames(data)
                if frames is None:
                    frames = _avi_mjpeg_frames(data)
                if frames is None:
                    from .apng import decode_apng_frames

                    frames = decode_apng_frames(data)
                if frames is None:
                    raise NotImplementedError(
                        f"sample_video_frames: {path!r} is not a GIF, an "
                        "MJPEG AVI, or an APNG; other video containers/"
                        "codecs need an AV decoder (e.g. PyAV/ffmpeg), "
                        "not installed here"
                    )
                starts, t = [], 0
                for delay_ms, _, _, _ in frames:
                    starts.append(t)
                    t += max(delay_ms, 10)  # browsers clamp 0-delay; total > 0
                total = t
                picked, tick = [], 0
                while tick < total:
                    # frame active at this tick = last start <= tick
                    i = max(j for j, s in enumerate(starts) if s <= tick)
                    if not picked or picked[-1] != i:
                        picked.append(i)
                    tick += every_ms
                for i in picked:
                    _, w, h, rgb = frames[i]
                    rows.append((path, i, starts[i], w, h, rgb))
            yield pd.DataFrame(
                rows,
                columns=["path", "frame_idx", "frame_ms", "width", "height", "frame_rgb"],
            )

    return binary_df.select("path", "content").mapInPandas(
        sample, VIDEO_FRAMES_SCHEMA
    )
