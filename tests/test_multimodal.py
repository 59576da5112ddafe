"""Multimodal ingest + feature-extraction tests (north-star X5): real
binaryFile plumbing and header parsing over crafted media fixtures;
decode paths assert their stub contract."""

from __future__ import annotations

import struct

import pytest

from batch_processing_system_spark.functions.multimodal import (
    decode_and_resize,
    extract_media_metadata,
    sample_video_frames,
)
from batch_processing_system_spark.sources.binaryfile import read_binary_dir


def make_png(w, h):
    return (
        b"\x89PNG\r\n\x1a\n"
        + b"\x00\x00\x00\rIHDR"
        + struct.pack(">II", w, h)
        + b"\x08\x06\x00\x00\x00" + b"\x00" * 16
    )


def make_gif(w, h):
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00" * 32


def make_bmp(pixels_rgb):
    """Minimal bottom-up 24-bit BI_RGB BMP from a row-major top-down
    list of RGB rows, with the spec's 4-byte row padding."""
    h = len(pixels_rgb)
    w = len(pixels_rgb[0])
    stride = ((w * 3 + 3) // 4) * 4
    body = b""
    for row in reversed(pixels_rgb):  # bottom-up storage order
        line = b"".join(bytes((b, g, r)) for (r, g, b) in row)
        body += line + b"\x00" * (stride - len(line))
    header = (
        b"BM" + struct.pack("<I", 54 + len(body)) + b"\x00" * 4 + struct.pack("<I", 54)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    )
    return header + body


def make_wav(sample_rate=16000, seconds=2):
    byte_rate = sample_rate * 2
    data = b"\x00" * (byte_rate * seconds)
    return (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate, byte_rate, 2, 16)
        + b"data" + struct.pack("<I", len(data)) + data
    )


@pytest.fixture(scope="module")
def media_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("media")
    (d / "a.png").write_bytes(make_png(640, 480))
    (d / "b.gif").write_bytes(make_gif(32, 16))
    (d / "c.wav").write_bytes(make_wav(16000, 2))
    (d / "junk.bin").write_bytes(b"\x00\x01\x02\x03" * 10)
    return str(d)


class TestBinaryIngest:
    def test_scan_schema_and_digest(self, spark, media_dir):
        df = read_binary_dir(spark, media_dir)
        rows = {r["ext"]: r for r in df.collect()}
        assert set(rows) == {"png", "gif", "wav", "bin"}
        assert rows["png"]["length"] == len(make_png(640, 480))
        assert len(rows["png"]["content_sha256"]) == 64
        # identical content → identical digest (media exact-dedup key)
        assert rows["png"]["content_sha256"] != rows["gif"]["content_sha256"]

    def test_glob_filter(self, spark, media_dir):
        df = read_binary_dir(spark, media_dir, glob="*.png")
        assert df.count() == 1


class TestMetadataExtraction:
    def test_header_dimensions(self, spark, media_dir):
        meta = {
            r["format"]: r
            for r in extract_media_metadata(read_binary_dir(spark, media_dir)).collect()
        }
        assert (meta["png"]["width"], meta["png"]["height"]) == (640, 480)
        assert (meta["gif"]["width"], meta["gif"]["height"]) == (32, 16)
        assert meta["wav"]["sample_rate"] == 16000
        assert abs(meta["wav"]["duration_ms"] - 2000) <= 10
        assert meta["unknown"]["width"] is None

    def test_batch_shape_is_arrow_batched(self, spark, media_dir):
        # schema contract is stable regardless of batch contents
        out = extract_media_metadata(read_binary_dir(spark, media_dir))
        assert out.schema.simpleString() == (
            "struct<path:string,length:bigint,format:string,width:int,"
            "height:int,sample_rate:int,duration_ms:bigint>"
        )


RED, GREEN, BLUE, WHITE = (255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 255)


class TestBmpDecode:
    def test_decode_known_pixels(self, spark, tmp_path):
        d = tmp_path / "bmps"
        d.mkdir()
        (d / "img.bmp").write_bytes(make_bmp([[RED, GREEN], [BLUE, WHITE]]))
        df = read_binary_dir(spark, str(d))
        [row] = decode_and_resize(df, 2, 2).collect()
        # top-down row-major RGB triplets
        assert row["pixels"] == [255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255]

    def test_nearest_neighbor_resize(self, spark, tmp_path):
        d = tmp_path / "bmps2"
        d.mkdir()
        # 4x2 image of vertical half-red / half-blue → downsample to 2x1
        rows = [[RED, RED, BLUE, BLUE]] * 2
        (d / "img.bmp").write_bytes(make_bmp(rows))
        df = read_binary_dir(spark, str(d))
        [row] = decode_and_resize(df, 2, 1).collect()
        assert row["pixels"] == [255, 0, 0, 0, 0, 255]

    def test_row_padding_respected(self, spark, tmp_path):
        # width 3 → 9-byte rows padded to 12; padding must not leak in
        d = tmp_path / "bmps3"
        d.mkdir()
        (d / "img.bmp").write_bytes(make_bmp([[RED, GREEN, BLUE]]))
        df = read_binary_dir(spark, str(d))
        [row] = decode_and_resize(df, 3, 1).collect()
        assert row["pixels"] == [255, 0, 0, 0, 255, 0, 0, 0, 255]


def _lzw_encode_simple(mcs, indices):
    """Deliberately-naive GIF LZW encoder for fixtures: emits CLEAR
    before every literal so the code table never grows — an independent
    implementation from the decoder under test."""
    clear, end = 1 << mcs, (1 << mcs) + 1
    width = mcs + 1
    out, acc, accn = bytearray(), 0, 0

    def emit(code):
        nonlocal acc, accn
        acc |= code << accn
        accn += width
        while accn >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            accn -= 8

    emit(clear)
    for i in indices:
        emit(i)
        emit(clear)
    emit(end)
    if accn:
        out.append(acc & 0xFF)
    return bytes(out)


PALETTE4 = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 255)]


def make_animated_gif(frames_indices, w, h, delays_cs, palette=PALETTE4):
    """Animated GIF with a 4-color global palette, full-screen
    non-interlaced frames, one GCE delay per frame."""
    flags = 0x80 | 0x01  # GCT present, 2<<1 = 4 entries
    out = bytearray(b"GIF89a" + struct.pack("<HHBBB", w, h, flags, 0, 0))
    for r, g, b in palette:
        out += bytes((r, g, b))
    for idxs, delay in zip(frames_indices, delays_cs):
        out += b"\x21\xf9\x04\x00" + struct.pack("<H", delay) + b"\x00\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        data = _lzw_encode_simple(2, idxs)
        out += bytes([2])
        for i in range(0, len(data), 255):
            chunk = data[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00\x3b"[:1]
    out += b"\x3b"
    return bytes(out)


def make_sine_wav(sample_rate=16000, seconds=1, freq=1000, amp=0.5):
    import math

    n = sample_rate * seconds
    data = b"".join(
        struct.pack("<h", int(amp * 32767 * math.sin(2 * math.pi * freq * i / sample_rate)))
        for i in range(n)
    )
    return (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16)
        + b"data" + struct.pack("<I", len(data)) + data
    )


class TestAudioFeatures:
    def test_sine_wave_features(self, spark, tmp_path):
        from batch_processing_system_spark.functions.multimodal import (
            extract_audio_features,
        )

        (tmp_path / "s.wav").write_bytes(make_sine_wav())
        row = extract_audio_features(
            read_binary_dir(spark, str(tmp_path))
        ).collect()[0]
        assert (row["sample_rate"], row["channels"], row["bits"]) == (16000, 1, 16)
        assert row["n_samples"] == 16000 and row["duration_ms"] == 1000
        # full-cycle sine: rms = amp/sqrt(2), peak = amp, 2 crossings/cycle
        assert abs(row["rms"] - 0.5 / 2**0.5) < 1e-3
        assert abs(row["peak"] - 0.5) < 1e-3
        assert abs(row["zero_crossings"] - 2000) <= 2

    def test_non_pcm_names_codec_gap(self, spark, media_dir):
        from batch_processing_system_spark.functions.multimodal import (
            extract_audio_features,
        )

        df = read_binary_dir(spark, media_dir, glob="*.png")
        with pytest.raises(Exception, match="codec"):
            extract_audio_features(df).collect()


def _wav_container(fmt_body: bytes, data: bytes) -> bytes:
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


class TestWavSampleFormats:
    """_wav_pcm against hand-packed WAV bytes: 24/32-bit integer PCM,
    IEEE float32/float64 (format tag 3), and WAVE_FORMAT_EXTENSIBLE
    (0xFFFE) unwrapping — each with exactly-representable samples so
    the normalized mono can be asserted bit-for-bit."""

    def _decode(self, wav):
        from batch_processing_system_spark.functions.multimodal import _wav_pcm

        return _wav_pcm(wav)

    def test_pcm24(self):
        import numpy as np

        vals = [1, -1, 0x7FFFFF, -0x800000, 0]
        data = b"".join(struct.pack("<i", v << 8)[1:] for v in vals)
        fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000 * 3, 3, 24)
        sr, ch, bits, mono = self._decode(_wav_container(fmt, data))
        assert (sr, ch, bits) == (8000, 1, 24)
        assert np.array_equal(mono, np.array(vals, dtype=np.float64) / (1 << 23))

    def test_pcm32(self):
        import numpy as np

        vals = [1, -1, 2**31 - 1, -(2**31), 0]
        data = b"".join(struct.pack("<i", v) for v in vals)
        fmt = struct.pack("<HHIIHH", 1, 1, 44100, 44100 * 4, 4, 32)
        sr, ch, bits, mono = self._decode(_wav_container(fmt, data))
        assert (sr, ch, bits) == (44100, 1, 32)
        assert np.array_equal(mono, np.array(vals, dtype=np.float64) / (1 << 31))

    def test_float32_and_float64(self):
        import numpy as np

        vals = [0.5, -0.25, 1.0, -1.0, 0.0]
        f32 = b"".join(struct.pack("<f", v) for v in vals)
        fmt32 = struct.pack("<HHIIHH", 3, 1, 48000, 48000 * 4, 4, 32)
        sr, ch, bits, mono = self._decode(_wav_container(fmt32, f32))
        assert (sr, ch, bits) == (48000, 1, 32)
        assert np.array_equal(mono, np.array(vals))

        f64 = b"".join(struct.pack("<d", v) for v in vals)
        fmt64 = struct.pack("<HHIIHH", 3, 1, 48000, 48000 * 8, 8, 64)
        _, _, bits64, mono64 = self._decode(_wav_container(fmt64, f64))
        assert bits64 == 64 and np.array_equal(mono64, np.array(vals))

    def test_float32_stereo_means_channels(self):
        import numpy as np

        left, right = [0.5, -0.5, 0.25], [0.25, 0.5, -0.75]
        data = b"".join(
            struct.pack("<ff", l, r) for l, r in zip(left, right)
        )
        fmt = struct.pack("<HHIIHH", 3, 2, 16000, 16000 * 8, 8, 32)
        _, ch, _, mono = self._decode(_wav_container(fmt, data))
        assert ch == 2
        assert np.array_equal(
            mono, (np.array(left) + np.array(right)) / 2.0
        )

    def test_extensible_unwraps_to_float(self):
        import numpy as np

        vals = [0.125, -0.375]
        data = b"".join(struct.pack("<f", v) for v in vals)
        # KSDATAFORMAT_SUBTYPE_IEEE_FLOAT: 00000003-0000-0010-8000-00aa00389b71
        guid = struct.pack("<HH", 3, 0) + bytes.fromhex("0000100080000000aa00389b71")[:12]
        fmt = (
            struct.pack("<HHIIHH", 0xFFFE, 1, 22050, 22050 * 4, 4, 32)
            + struct.pack("<HHI", 22, 32, 0x4)  # cbSize, valid bits, mask
            + guid
        )
        sr, ch, bits, mono = self._decode(_wav_container(fmt, data))
        assert (sr, ch, bits) == (22050, 1, 32)
        assert np.array_equal(mono, np.array(vals))

    def test_unknown_format_returns_none(self):
        fmt = struct.pack("<HHIIHH", 0x55, 1, 8000, 1000, 1, 0)  # MP3 tag
        assert self._decode(_wav_container(fmt, b"\x00" * 64)) is None

    def test_g711_tables_match_cpython_audioop(self):
        # independent reference: CPython's C implementation of the
        # same ITU-T G.711 tables (stdlib through 3.12)
        audioop = pytest.importorskip("audioop")
        import numpy as np

        from batch_processing_system_spark.functions.multimodal import (
            _alaw_table,
            _mulaw_table,
        )

        allb = bytes(range(256))
        assert np.array_equal(
            np.frombuffer(audioop.ulaw2lin(allb, 2), dtype="<i2"),
            _mulaw_table(),
        )
        assert np.array_equal(
            np.frombuffer(audioop.alaw2lin(allb, 2), dtype="<i2"),
            _alaw_table(),
        )

    @pytest.mark.parametrize("tag", [6, 7])
    def test_g711_wav_decodes(self, tag):
        import numpy as np

        from batch_processing_system_spark.functions.multimodal import (
            _alaw_table,
            _mulaw_table,
        )

        lut = _alaw_table() if tag == 6 else _mulaw_table()
        data = bytes(range(256))
        fmt = struct.pack("<HHIIHH", tag, 1, 8000, 8000, 1, 8)
        sr, ch, bits, mono = self._decode(_wav_container(fmt, data))
        assert (sr, ch, bits) == (8000, 1, 8)
        assert np.array_equal(
            mono, lut[np.frombuffer(data, dtype=np.uint8)] / 32768.0
        )

    def test_g711_table_structure(self):
        # encoder-independent invariants of the G.711 tables: full
        # sign symmetry and strict monotonicity along each sign ray
        import numpy as np

        from batch_processing_system_spark.functions.multimodal import (
            _alaw_table,
            _mulaw_table,
        )

        for lut in (_mulaw_table(), _alaw_table()):
            vals = np.sort(lut.astype(np.int32))
            neg, pos = vals[:128], vals[128:]
            # symmetric: each negative level mirrors a positive one
            assert np.array_equal(-neg[::-1], pos)
            assert len(np.unique(pos)) == 128  # strictly monotone
        assert int(np.abs(_mulaw_table()).max()) == 32124
        assert int(np.abs(_alaw_table()).max()) == 32256


class TestSpectralFeatures:
    @staticmethod
    def _dft_reference(sr, mono):
        """Independent O(n^2) direct DFT + the same feature formulas
        written from scratch."""
        import math

        n = len(mono)
        nbins = n // 2 + 1
        mags = []
        for k in range(nbins):
            re = sum(mono[t] * math.cos(-2 * math.pi * k * t / n) for t in range(n))
            im = sum(mono[t] * math.sin(-2 * math.pi * k * t / n) for t in range(n))
            mags.append(math.hypot(re, im))
        freqs = [k * sr / n for k in range(nbins)]
        power = [m * m for m in mags[1:]]
        freqs = freqs[1:]
        total = sum(power)
        if total <= 0:
            return (0.0, 0.0, 0.0, 0.0)
        centroid = sum(f * p for f, p in zip(freqs, power)) / total
        bw = math.sqrt(sum((f - centroid) ** 2 * p for f, p in zip(freqs, power)) / total)
        acc, roll = 0.0, freqs[-1]
        for f, p in zip(freqs, power):
            acc += p
            if acc >= 0.85 * total:
                roll = f
                break
        pos = [p for p in power if p > 0]
        gm = math.exp(sum(math.log(p) for p in pos) / len(pos)) if pos else 0.0
        am = total / len(power)
        return (centroid, bw, roll, gm / am if am > 0 else 0.0)

    def test_matches_direct_dft_on_random_signals(self):
        import numpy as np

        from batch_processing_system_spark.functions.multimodal import (
            spectral_features_from_mono,
        )

        rng = np.random.default_rng(5)
        for _ in range(4):
            mono = rng.normal(0, 0.3, size=64)
            got = spectral_features_from_mono(1000, mono)
            want = self._dft_reference(1000, list(mono))
            for g, w in zip(got, want):
                assert abs(g - w) < 1e-6, (got, want)

    def test_pure_sine_centroid_at_frequency(self, spark, tmp_path):
        from batch_processing_system_spark.functions.multimodal import (
            extract_spectral_features,
        )

        (tmp_path / "s.wav").write_bytes(make_sine_wav(16000, 1, freq=1000))
        row = extract_spectral_features(
            read_binary_dir(spark, str(tmp_path))
        ).collect()[0]
        # all energy in the 1 kHz bin: centroid == rolloff == 1000,
        # near-zero bandwidth, near-zero flatness (maximally tonal)
        assert abs(row["spectral_centroid_hz"] - 1000.0) < 1.0
        assert abs(row["spectral_rolloff_hz"] - 1000.0) < 1.0
        assert row["spectral_bandwidth_hz"] < 20.0
        assert row["spectral_flatness"] < 0.01

    def test_silence_is_all_zero(self):
        import numpy as np

        from batch_processing_system_spark.functions.multimodal import (
            spectral_features_from_mono,
        )

        assert spectral_features_from_mono(8000, np.zeros(256)) == (
            0.0, 0.0, 0.0, 0.0,
        )


class TestFrameSampling:
    def _two_frame_gif(self):
        f0 = [0, 1, 2, 3]  # 2x2: red green / blue white
        f1 = [3, 2, 1, 0]
        return make_animated_gif([f0, f1], 2, 2, delays_cs=[5, 5])

    def test_samples_decode_to_palette_rgb(self, spark, tmp_path):
        (tmp_path / "anim.gif").write_bytes(self._two_frame_gif())
        rows = sample_video_frames(
            read_binary_dir(spark, str(tmp_path)), every_ms=50
        ).collect()
        got = {r["frame_idx"]: r for r in rows}
        assert set(got) == {0, 1}
        assert (got[0]["frame_ms"], got[1]["frame_ms"]) == (0, 50)
        assert got[0]["width"] == 2 and got[0]["height"] == 2
        flat = lambda px: b"".join(bytes(PALETTE4[i]) for i in px)
        assert bytes(got[0]["frame_rgb"]) == flat([0, 1, 2, 3])
        assert bytes(got[1]["frame_rgb"]) == flat([3, 2, 1, 0])

    def test_sampling_cadence_skips_frames(self, spark, tmp_path):
        (tmp_path / "anim.gif").write_bytes(self._two_frame_gif())
        rows = sample_video_frames(
            read_binary_dir(spark, str(tmp_path)), every_ms=100
        ).collect()
        assert [r["frame_idx"] for r in rows] == [0]

    def test_non_gif_names_av_dependency(self, spark, media_dir):
        df = read_binary_dir(spark, media_dir, glob="*.wav")
        with pytest.raises(Exception, match="AV decoder"):
            sample_video_frames(df, 1000).collect()


def _png_chunk(ctype, body):
    import zlib

    return (
        struct.pack(">I", len(body)) + ctype + body
        + struct.pack(">I", zlib.crc32(ctype + body))
    )


def make_real_png(pixels, color_type, filters=None, palette=None, split_idat=False):
    """Independent PNG encoder for fixtures: FORWARD-filters each
    scanline (the inverse direction of the decoder under test) with a
    per-row filter type — cycling through all five by default — then
    deflates. ``pixels`` is rows of per-pixel tuples (or ints for
    1-channel types)."""
    import zlib

    ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    h, w = len(pixels), len(pixels[0])
    rows = [
        bytes(
            v
            for px in row
            for v in ((px,) if isinstance(px, int) else tuple(px))
        )
        for row in pixels
    ]
    stride = w * ch
    raw = bytearray()
    prev = bytes(stride)
    for y, row in enumerate(rows):
        ft = (filters or [0, 1, 2, 3, 4])[y % len(filters or [0, 1, 2, 3, 4])]
        raw.append(ft)
        for x in range(stride):
            a = row[x - ch] if x >= ch else 0
            b = prev[x]
            c = prev[x - ch] if x >= ch else 0
            if ft == 0:
                v = row[x]
            elif ft == 1:
                v = row[x] - a
            elif ft == 2:
                v = row[x] - b
            elif ft == 3:
                v = row[x] - ((a + b) >> 1)
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                v = row[x] - (a if pa <= pb and pa <= pc else b if pb <= pc else c)
            raw.append(v & 0xFF)
        prev = row
    png = b"\x89PNG\r\n\x1a\n" + _png_chunk(
        b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    )
    if palette is not None:
        png += _png_chunk(b"PLTE", b"".join(bytes(p) for p in palette))
    z = zlib.compress(bytes(raw))
    if split_idat:  # decoders must concatenate IDAT chunks
        png += _png_chunk(b"IDAT", z[: len(z) // 2]) + _png_chunk(b"IDAT", z[len(z) // 2 :])
    else:
        png += _png_chunk(b"IDAT", z)
    return png + _png_chunk(b"IEND", b"")


def _decode_one(spark, tmp_path, name, data, w, h):
    (tmp_path / name).write_bytes(data)
    [row] = decode_and_resize(read_binary_dir(spark, str(tmp_path)), w, h).collect()
    return list(row["pixels"])


class TestPngDecode:
    """Stdlib PNG decode vs the independent forward-filtering encoder
    above — every filter type and color type the spec's 8-bit
    non-interlaced profile allows."""

    def _pattern(self, h, w, ch):
        # varied gradient so Sub/Up/Average/Paeth all do real work
        return [
            [tuple((13 * y + 29 * x + 57 * k) % 256 for k in range(ch)) for x in range(w)]
            for y in range(h)
        ]

    def test_rgb_all_five_filters(self, spark, tmp_path):
        px = self._pattern(5, 4, 3)  # 5 rows → filters 0..4 each used
        got = _decode_one(spark, tmp_path, "a.png", make_real_png(px, 2), 4, 5)
        assert got == [v for row in px for p in row for v in p]

    def test_rgba_alpha_dropped(self, spark, tmp_path):
        px = self._pattern(5, 3, 4)
        got = _decode_one(spark, tmp_path, "a.png", make_real_png(px, 6), 3, 5)
        assert got == [v for row in px for p in row for v in p[:3]]

    def test_grayscale_replicated(self, spark, tmp_path):
        px = [[(7 * y + 31 * x) % 256 for x in range(4)] for y in range(5)]
        got = _decode_one(spark, tmp_path, "a.png", make_real_png(px, 0), 4, 5)
        assert got == [v for row in px for g in row for v in (g, g, g)]

    def test_gray_alpha(self, spark, tmp_path):
        px = self._pattern(5, 3, 2)
        got = _decode_one(spark, tmp_path, "a.png", make_real_png(px, 4), 3, 5)
        assert got == [v for row in px for p in row for v in (p[0],) * 3]

    def test_palette_lookup(self, spark, tmp_path):
        idx = [[0, 1], [2, 3]]
        data = make_real_png(idx, 3, palette=PALETTE4)
        got = _decode_one(spark, tmp_path, "a.png", data, 2, 2)
        assert got == [v for row in idx for i in row for v in PALETTE4[i]]

    def test_multi_idat_chunks(self, spark, tmp_path):
        px = self._pattern(6, 6, 3)
        data = make_real_png(px, 2, split_idat=True)
        got = _decode_one(spark, tmp_path, "a.png", data, 6, 6)
        assert got == [v for row in px for p in row for v in p]

    def test_resize_matches_bmp_path(self, spark, tmp_path):
        # same 4x2 half-red/half-blue image as the BMP resize test
        px = [[RED, RED, BLUE, BLUE]] * 2
        got = _decode_one(spark, tmp_path, "a.png", make_real_png(px, 2), 2, 1)
        assert got == [255, 0, 0, 0, 0, 255]

    def test_rgb_cannot_be_subbyte(self, spark, tmp_path):
        # sub-byte depths are legal only for gray/palette (spec 11.2.2)
        data = make_real_png(self._pattern(2, 2, 3), 2)
        data = bytearray(data)
        data[8 + 8 + 8] = 4  # IHDR bit-depth byte
        ihdr = bytes(data[8 + 8 : 8 + 8 + 13])
        import zlib as _z

        data[8 + 8 + 13 : 8 + 8 + 17] = struct.pack(">I", _z.crc32(b"IHDR" + ihdr))
        (tmp_path / "d.png").write_bytes(bytes(data))
        with pytest.raises(Exception, match="cannot be 4-bit"):
            decode_and_resize(read_binary_dir(spark, str(tmp_path)), 2, 2).collect()

    def test_16bit_rgb_reduces_to_high_byte(self, spark, tmp_path):
        import zlib as _z

        import numpy as np

        rng = np.random.default_rng(71)
        img16 = rng.integers(0, 65536, (5, 7, 3)).astype(np.uint16)
        raw = bytearray()
        for y in range(5):
            raw.append(0)  # filter: None
            for x in range(7):
                for c in range(3):
                    raw += struct.pack(">H", int(img16[y, x, c]))
        png = b"\x89PNG\r\n\x1a\n" + _png_chunk(
            b"IHDR", struct.pack(">IIBBBBB", 7, 5, 16, 2, 0, 0, 0)
        ) + _png_chunk(b"IDAT", _z.compress(bytes(raw))) + _png_chunk(b"IEND", b"")
        got = _decode_one(spark, tmp_path, "hi.png", png, 7, 5)
        want = [int(v) for v in (img16 >> 8).astype(np.uint8).ravel()]
        assert got == want

    def test_16bit_sub_filter_uses_byte_distance_six(self, spark, tmp_path):
        # the 16-bit-specific decode detail: filters act bytewise at
        # distance bpp = 6 for RGB16, not 3
        import zlib as _z

        import numpy as np

        rng = np.random.default_rng(73)
        img16 = rng.integers(0, 65536, (4, 6, 3)).astype(np.uint16)
        raw = bytearray()
        for y in range(4):
            row = b"".join(
                struct.pack(">H", int(img16[y, x, c]))
                for x in range(6)
                for c in range(3)
            )
            raw.append(1)  # filter: Sub
            for i in range(len(row)):
                prev = row[i - 6] if i >= 6 else 0
                raw.append((row[i] - prev) & 0xFF)
        png = b"\x89PNG\r\n\x1a\n" + _png_chunk(
            b"IHDR", struct.pack(">IIBBBBB", 6, 4, 16, 2, 0, 0, 0)
        ) + _png_chunk(b"IDAT", _z.compress(bytes(raw))) + _png_chunk(b"IEND", b"")
        got = _decode_one(spark, tmp_path, "sub16.png", png, 6, 4)
        want = [int(v) for v in (img16 >> 8).astype(np.uint8).ravel()]
        assert got == want


class TestStubs:
    def test_decode_of_unsupported_format_names_dependency(self, spark, tmp_path):
        # baseline JPEG decodes natively since r3 and baseline TIFF
        # since r6; the stub boundary is now formats NO built-in
        # decoder covers — e.g. WebP — which must still fail naming
        # the missing library
        (tmp_path / "x.webp").write_bytes(
            b"RIFF\x40\x00\x00\x00WEBP" + b"\x00" * 64
        )
        df = read_binary_dir(spark, str(tmp_path))
        with pytest.raises(Exception, match="Pillow"):
            decode_and_resize(df, 8, 8).collect()


class TestLanguageId:
    def test_natural_language_samples(self, spark):
        from batch_processing_system_spark.functions.text import langid_udf

        samples = [
            ("The quick brown fox jumps over the lazy dog and it was fine",),
            ("El perro corre por la calle y no se detiene para nada",),
            ("Der Hund läuft auf der Straße und das ist nicht schlimm",),
            ("Le chien court dans la rue et il est pour les enfants",),
            ("这只狗在街上跑",),
            ("",),
        ]
        df = spark.createDataFrame(samples, "text string")
        out = [r["lang"] for r in df.select(langid_udf("text").alias("lang")).collect()]
        assert out == ["en", "es", "de", "fr", "zh", "unknown"]


# ---- IMA ADPCM (independent encoder; shares only the public spec
# constants with the production decoder) ----

ADPCM_STEPS = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767,
)
ADPCM_IDX_ADJ = (-1, -1, -1, -1, 2, 4, 6, 8)


def _adpcm_encode_channel(samples, idx):
    """Forward-path IMA quantizer: returns (nibbles, final_idx); the
    caller anchors each block on the exact first sample."""
    nibbles = []
    pred = samples[0]
    for s in samples[1:]:
        step = ADPCM_STEPS[idx]
        delta = s - pred
        nib = 8 if delta < 0 else 0
        if delta < 0:
            delta = -delta
        if delta >= step:
            nib |= 4
            delta -= step
        if delta >= step >> 1:
            nib |= 2
            delta -= step >> 1
        if delta >= step >> 2:
            nib |= 1
        diff = step >> 3
        if nib & 1:
            diff += step >> 2
        if nib & 2:
            diff += step >> 1
        if nib & 4:
            diff += step
        pred = pred - diff if nib & 8 else pred + diff
        pred = max(-32768, min(32767, pred))
        idx = max(0, min(88, idx + ADPCM_IDX_ADJ[nib & 7]))
        nibbles.append(nib)
    return nibbles, idx


def make_adpcm_wav(chan_signals, sample_rate=16000):
    """IMA ADPCM WAV from per-channel int16 sample lists: 65 samples
    per block per channel (1 header sample + 64 nibbles in 8 four-byte
    words), words interleaved across channels."""
    channels = len(chan_signals)
    spb = 65
    block_align = channels * (4 + 32)
    n_blocks = len(chan_signals[0]) // spb
    idxs = [0] * channels
    data = bytearray()
    for b in range(n_blocks):
        seg = [cs[b * spb : (b + 1) * spb] for cs in chan_signals]
        nibs = []
        for c in range(channels):
            data += struct.pack("<hBB", seg[c][0], idxs[c], 0)
        for c in range(channels):
            n, idxs[c] = _adpcm_encode_channel(seg[c], idxs[c])
            nibs.append(n)
        for w in range(8):  # 8 words of 8 nibbles per channel
            for c in range(channels):
                for byte_i in range(4):
                    lo = nibs[c][w * 8 + byte_i * 2]
                    hi = nibs[c][w * 8 + byte_i * 2 + 1]
                    data += bytes([(hi << 4) | lo])
    byte_rate = sample_rate * block_align // spb
    fmt = struct.pack(
        "<HHIIHHHH", 0x11, channels, sample_rate, byte_rate, block_align, 4, 2, spb
    )
    return (
        b"RIFF" + struct.pack("<I", 28 + len(fmt) + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + bytes(data)
    )


class TestAdpcmAudio:
    def _sine16(self, sample_rate, seconds, freq, amp):
        import math

        return [
            int(amp * 32767 * math.sin(2 * math.pi * freq * i / sample_rate))
            for i in range(sample_rate * seconds)
        ]

    def test_mono_sine_features_via_spark(self, spark, tmp_path):
        from batch_processing_system_spark.functions.multimodal import (
            extract_audio_features,
        )

        sig = self._sine16(16000, 1, 440, 0.5)
        (tmp_path / "a.wav").write_bytes(make_adpcm_wav([sig]))
        row = extract_audio_features(
            read_binary_dir(spark, str(tmp_path))
        ).collect()[0]
        assert (row["sample_rate"], row["channels"], row["bits"]) == (16000, 1, 4)
        assert row["n_samples"] == (16000 // 65) * 65
        assert abs(row["duration_ms"] - 999) <= 2
        # 4-bit ADPCM is lossy but a sine tracks closely
        assert abs(row["rms"] - 0.5 / 2**0.5) < 0.01
        assert abs(row["peak"] - 0.5) < 0.03
        assert abs(row["zero_crossings"] - 878) <= 6  # 2 per 440Hz cycle

    def test_decode_error_is_small_and_stereo_mixes(self, spark, tmp_path):
        import numpy as np

        from batch_processing_system_spark.functions.multimodal import _wav_pcm

        left = self._sine16(8000, 1, 200, 0.4)
        right = self._sine16(8000, 1, 200, 0.4)
        wav = make_adpcm_wav([left, right], sample_rate=8000)
        sr, ch, bits, mono = _wav_pcm(wav)
        assert (sr, ch, bits) == (8000, 2, 4)
        n = mono.size
        ref = np.array(left[:n], dtype=np.float64) / 32768.0
        # identical channels -> the mono mix must equal one channel to
        # within ADPCM quantization error
        rmse = float(np.sqrt(np.mean((mono - ref) ** 2)))
        assert rmse < 0.01, rmse


# ---- MJPEG-in-AVI (independent container writer; frames encoded by
# the independent JPEG encoder, so neither side shares decoder code) ----

def make_mjpeg_avi(jpegs, us_per_frame=50_000, w=16, h=16):
    avih = struct.pack(
        "<14I", us_per_frame, 0, 0, 0, len(jpegs), 0, 1, 0, w, h, 0, 0, 0, 0
    )
    hdrl_body = b"hdrl" + b"avih" + struct.pack("<I", len(avih)) + avih
    hdrl = b"LIST" + struct.pack("<I", len(hdrl_body)) + hdrl_body
    movi_body = b"movi"
    for j in jpegs:
        movi_body += b"00dc" + struct.pack("<I", len(j)) + j
        if len(j) & 1:
            movi_body += b"\x00"
    movi = b"LIST" + struct.pack("<I", len(movi_body)) + movi_body
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


class TestMjpegAvi:
    def _solid_jpeg(self, r, g, b, w=16, h=16):
        import numpy as np

        from tests._jpeg_encoder import encode_color

        img = np.zeros((h, w, 3), dtype=np.uint8)
        img[:, :] = (r, g, b)
        return encode_color(img, (1, 1))

    def test_frame_sampling_decodes_mjpeg(self, spark, tmp_path):
        from batch_processing_system_spark.functions.multimodal import (
            sample_video_frames,
        )
        from batch_processing_system_spark.sources.binaryfile import (
            read_binary_dir,
        )

        jpegs = [
            self._solid_jpeg(200, 30, 30),
            self._solid_jpeg(30, 200, 30),
            self._solid_jpeg(30, 30, 200),
        ]
        (tmp_path / "v.avi").write_bytes(make_mjpeg_avi(jpegs))
        rows = sorted(
            sample_video_frames(
                read_binary_dir(spark, str(tmp_path), glob="*.avi"), 50
            ).collect(),
            key=lambda r: r["frame_idx"],
        )
        assert [r["frame_idx"] for r in rows] == [0, 1, 2]
        assert [r["frame_ms"] for r in rows] == [0, 50, 100]
        assert all((r["width"], r["height"]) == (16, 16) for r in rows)
        # each sampled frame is its solid color (JPEG-lossy tolerance)
        want = [(200, 30, 30), (30, 200, 30), (30, 30, 200)]
        for r, (er, eg, eb) in zip(rows, want):
            px = r["frame_rgb"][:3]
            assert abs(px[0] - er) <= 6 and abs(px[1] - eg) <= 6 and abs(px[2] - eb) <= 6

    def test_progressive_frames_also_decode(self, spark, tmp_path):
        import numpy as np

        from batch_processing_system_spark.functions.multimodal import (
            sample_video_frames,
        )
        from batch_processing_system_spark.sources.binaryfile import (
            read_binary_dir,
        )
        from tests._jpeg_encoder import encode_color_progressive

        img = np.zeros((16, 16, 3), dtype=np.uint8)
        img[:, :] = (180, 60, 120)
        (tmp_path / "p.avi").write_bytes(
            make_mjpeg_avi([encode_color_progressive(img, (1, 1))])
        )
        [row] = sample_video_frames(
            read_binary_dir(spark, str(tmp_path), glob="*.avi"), 40
        ).collect()
        px = row["frame_rgb"][:3]
        assert abs(px[0] - 180) <= 6 and abs(px[1] - 60) <= 6 and abs(px[2] - 120) <= 6

    def test_non_mjpeg_avi_names_codec(self, spark, tmp_path):
        from batch_processing_system_spark.functions.multimodal import (
            sample_video_frames,
        )
        from batch_processing_system_spark.sources.binaryfile import (
            read_binary_dir,
        )

        (tmp_path / "x.avi").write_bytes(make_mjpeg_avi([b"\x00\x01notjpeg"]))
        with pytest.raises(Exception, match="MJPEG"):
            sample_video_frames(
                read_binary_dir(spark, str(tmp_path), glob="*.avi"), 40
            ).collect()


def make_interlaced_png(pixels, color_type=2):
    """Independent Adam7 encoder: splits the image into the 7 passes,
    filter-0 scanlines per pass, one deflate stream."""
    import zlib

    ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    h, w = len(pixels), len(pixels[0])
    flat = [
        [v for px in row for v in ((px,) if isinstance(px, int) else tuple(px))]
        for row in pixels
    ]
    passes = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
              (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
    raw = bytearray()
    for x0, y0, dx, dy in passes:
        pw = (w - x0 + dx - 1) // dx
        ph = (h - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue
        for y in range(y0, h, dy):
            raw.append(0)  # filter: None
            for x in range(x0, w, dx):
                raw += bytes(flat[y][x * ch : (x + 1) * ch])
    png = b"\x89PNG\r\n\x1a\n" + _png_chunk(
        b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 1)
    )
    png += _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
    return png + _png_chunk(b"IEND", b"")


class TestInterlacedPng:
    def test_adam7_rgb_decodes_exactly(self, spark, tmp_path):
        import numpy as np

        rng = np.random.default_rng(61)
        img = rng.integers(0, 256, (13, 11, 3)).astype(np.uint8)
        pixels = [[tuple(img[y, x]) for x in range(11)] for y in range(13)]
        got = _decode_one(
            spark, tmp_path, "i.png", make_interlaced_png(pixels), 11, 13
        )
        assert got == [int(v) for v in img.ravel()]

    def test_adam7_matches_noninterlaced(self, spark, tmp_path):
        import numpy as np

        rng = np.random.default_rng(67)
        img = rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)
        pixels = [[tuple(img[y, x]) for x in range(16)] for y in range(16)]
        a = _decode_one(
            spark, tmp_path, "plain.png", make_real_png(pixels, 2), 16, 16
        )
        sub = tmp_path / "i"
        sub.mkdir()
        b = _decode_one(
            spark, sub, "inter.png", make_interlaced_png(pixels), 16, 16
        )
        assert a == b

    def test_adam7_tiny_image_skips_empty_passes(self, spark, tmp_path):
        # 2x2: passes 2-5 are empty (their offsets exceed the image)
        pixels = [[(10, 20, 30), (40, 50, 60)], [(70, 80, 90), (5, 6, 7)]]
        got = _decode_one(
            spark, tmp_path, "t.png", make_interlaced_png(pixels), 2, 2
        )
        assert got == [10, 20, 30, 40, 50, 60, 70, 80, 90, 5, 6, 7]


def _pack_subbyte_row(vals, depth):
    """Pack sample values (< 2^depth) MSB-first, padding to a byte."""
    out = bytearray()
    spb = 8 // depth
    for i in range(0, len(vals), spb):
        byte = 0
        for j, v in enumerate(vals[i : i + spb]):
            byte |= (v & ((1 << depth) - 1)) << (8 - depth * (j + 1))
        out.append(byte)
    return bytes(out)


def _forward_filter_packed(packed_rows, filters):
    """Forward-filter PACKED scanlines bytewise at distance 1 (the
    spec's filter distance for sub-byte depths)."""
    raw = bytearray()
    prev = bytes(len(packed_rows[0])) if packed_rows else b""
    for y, row in enumerate(packed_rows):
        ft = filters[y % len(filters)]
        raw.append(ft)
        for x in range(len(row)):
            a = row[x - 1] if x >= 1 else 0
            b = prev[x]
            c = prev[x - 1] if x >= 1 else 0
            if ft == 0:
                v = row[x]
            elif ft == 1:
                v = row[x] - a
            elif ft == 2:
                v = row[x] - b
            elif ft == 3:
                v = row[x] - ((a + b) >> 1)
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                v = row[x] - (a if pa <= pb and pa <= pc else b if pb <= pc else c)
            raw.append(v & 0xFF)
        prev = row
    return raw


def make_subbyte_png(
    samples, depth, color_type, palette=None, interlace=0, filters=(0, 1, 2, 3, 4)
):
    """Independent sub-byte (1/2/4-bit) PNG encoder: packs samples
    MSB-first with per-row byte padding, forward-filters bytewise,
    optionally Adam7-interlaced. ``samples`` is rows of ints."""
    import zlib

    h, w = len(samples), len(samples[0])
    if interlace == 0:
        raw = _forward_filter_packed(
            [_pack_subbyte_row(r, depth) for r in samples], filters
        )
    else:
        passes = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
                  (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
        raw = bytearray()
        for x0, y0, dx, dy in passes:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            rows = [
                [samples[y][x] for x in range(x0, w, dx)]
                for y in range(y0, h, dy)
            ]
            raw += _forward_filter_packed(
                [_pack_subbyte_row(r, depth) for r in rows], filters
            )
    png = b"\x89PNG\r\n\x1a\n" + _png_chunk(
        b"IHDR", struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, interlace)
    )
    if palette is not None:
        png += _png_chunk(b"PLTE", b"".join(bytes(p) for p in palette))
    png += _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
    return png + _png_chunk(b"IEND", b"")


class TestSubbytePng:
    """1/2/4-bit PNG decode (r6 — the last pure-Python still-image gap)
    vs the independent bit-packing encoder above."""

    def test_gray4_all_filters_odd_width(self, spark, tmp_path):
        # w=5 exercises the padded final byte; 5 rows → filters 0..4
        samples = [[(3 * y + 2 * x) % 16 for x in range(5)] for y in range(5)]
        got = _decode_one(
            spark, tmp_path, "g4.png", make_subbyte_png(samples, 4, 0), 5, 5
        )
        want = [v for row in samples for s in row for v in (s * 17,) * 3]
        assert got == want

    def test_gray2(self, spark, tmp_path):
        samples = [[(y + x) % 4 for x in range(7)] for y in range(3)]
        got = _decode_one(
            spark, tmp_path, "g2.png", make_subbyte_png(samples, 2, 0), 7, 3
        )
        want = [v for row in samples for s in row for v in (s * 85,) * 3]
        assert got == want

    def test_gray1_bitmap(self, spark, tmp_path):
        # 1-bit: a 10-wide checkerboard (2 bytes/row, 6 pad bits)
        samples = [[(y + x) % 2 for x in range(10)] for y in range(4)]
        got = _decode_one(
            spark, tmp_path, "g1.png", make_subbyte_png(samples, 1, 0), 10, 4
        )
        want = [v for row in samples for s in row for v in (s * 255,) * 3]
        assert got == want

    def test_palette4(self, spark, tmp_path):
        idx = [[0, 1, 2], [3, 2, 1], [1, 0, 3]]
        got = _decode_one(
            spark, tmp_path, "p4.png",
            make_subbyte_png(idx, 4, 3, palette=PALETTE4), 3, 3,
        )
        assert got == [v for row in idx for i in row for v in PALETTE4[i]]

    def test_palette2_adam7(self, spark, tmp_path):
        # interlaced sub-byte: every pass re-packs and re-pads its own
        # scanlines — 9x9 populates all 7 passes
        idx = [[(y * 2 + x) % 4 for x in range(9)] for y in range(9)]
        got = _decode_one(
            spark, tmp_path, "p2i.png",
            make_subbyte_png(idx, 2, 3, palette=PALETTE4, interlace=1), 9, 9,
        )
        assert got == [v for row in idx for i in row for v in PALETTE4[i]]

    def test_gray1_adam7_matches_noninterlaced(self, spark, tmp_path):
        samples = [[(x * y + x) % 2 for x in range(11)] for y in range(6)]
        a = _decode_one(
            spark, tmp_path, "a.png", make_subbyte_png(samples, 1, 0), 11, 6
        )
        sub = tmp_path / "i"
        sub.mkdir()
        b = _decode_one(
            spark, sub, "b.png",
            make_subbyte_png(samples, 1, 0, interlace=1), 11, 6,
        )
        assert a == b


def make_partial_gif(frame_specs, w, h, palette=PALETTE4, bg_index=0):
    """Animated GIF with per-frame sub-rectangles, disposal methods
    and optional transparency: frame_specs is a list of
    (indices, (left, top, fw, fh), delay_cs, disposal, transparent_idx)."""
    flags = 0x80 | 0x01  # GCT present, 4 entries
    out = bytearray(b"GIF89a" + struct.pack("<HHBBB", w, h, flags, bg_index, 0))
    for r, g, b in palette:
        out += bytes((r, g, b))
    for idxs, (left, top, fw, fh), delay, disposal, transp in frame_specs:
        packed = (disposal << 2) | (1 if transp is not None else 0)
        out += b"\x21\xf9\x04" + bytes([packed]) + struct.pack("<H", delay)
        out += bytes([transp if transp is not None else 0, 0])
        out += b"\x2c" + struct.pack("<HHHHB", left, top, fw, fh, 0)
        data = _lzw_encode_simple(2, idxs)
        out += bytes([2])
        for i in range(0, len(data), 255):
            chunk = data[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


class TestGifComposition:
    """Partial-frame GIF composition: offsets, transparency, and the
    GCE disposal methods (r5 — previously raised)."""

    def _frames(self, spark, tmp_path, data, every_ms=50):
        from batch_processing_system_spark.functions.multimodal import (
            sample_video_frames,
        )

        (tmp_path / "g.gif").write_bytes(data)
        rows = sample_video_frames(
            read_binary_dir(spark, str(tmp_path), glob="*.gif"), every_ms
        ).collect()
        return {r["frame_idx"]: r for r in rows}

    def _px(self, row, x, y, w=4):
        o = 3 * (y * w + x)
        return tuple(row["frame_rgb"][o : o + 3])

    def test_partial_frame_composes_onto_canvas(self, spark, tmp_path):
        # frame 0: full 4x4 of color 1; frame 1: 1x1 patch of color 2
        # at (2,1) — the rest of the canvas must persist
        data = make_partial_gif(
            [
                ([1] * 16, (0, 0, 4, 4), 5, 0, None),
                ([2], (2, 1, 1, 1), 5, 0, None),
            ],
            4, 4,
        )
        frames = self._frames(spark, tmp_path, data)
        assert (frames[0]["width"], frames[0]["height"]) == (4, 4)
        c1, c2 = PALETTE4[1], PALETTE4[2]
        assert self._px(frames[1], 2, 1) == c2
        assert self._px(frames[1], 0, 0) == c1  # persisted
        assert self._px(frames[1], 3, 3) == c1

    def test_disposal_restore_to_background(self, spark, tmp_path):
        # frame 1's patch is disposed before frame 2 — common renderer
        # behavior (browsers, Pillow) treats restore-to-background as
        # TRANSPARENT, which in RGB output is the black sentinel, not
        # the background-color palette entry (r6 ADVICE fix)
        data = make_partial_gif(
            [
                ([1] * 16, (0, 0, 4, 4), 5, 0, None),
                ([2], (0, 0, 1, 1), 5, 2, None),   # disposal 2
                ([3], (3, 3, 1, 1), 5, 0, None),
            ],
            4, 4, bg_index=0,
        )
        frames = self._frames(spark, tmp_path, data)
        assert self._px(frames[1], 0, 0) == PALETTE4[2]  # visible in f1
        assert self._px(frames[2], 0, 0) == (0, 0, 0)  # transparent in f2
        assert self._px(frames[2], 3, 3) == PALETTE4[3]
        assert self._px(frames[2], 1, 1) == PALETTE4[1]  # untouched area

    def test_transparency_leaves_canvas_through(self, spark, tmp_path):
        # frame 1 paints 2x1 at (0,0): [transparent, color 3] — the
        # transparent cell keeps frame 0's color
        data = make_partial_gif(
            [
                ([1] * 16, (0, 0, 4, 4), 5, 0, None),
                ([0, 3], (0, 0, 2, 1), 5, 0, 0),  # index 0 transparent
            ],
            4, 4,
        )
        frames = self._frames(spark, tmp_path, data)
        assert self._px(frames[1], 0, 0) == PALETTE4[1]  # shows through
        assert self._px(frames[1], 1, 0) == PALETTE4[3]

    def test_disposal_restore_previous(self, spark, tmp_path):
        # frame 1 (disposal 3) vanishes entirely before frame 2
        data = make_partial_gif(
            [
                ([1] * 16, (0, 0, 4, 4), 5, 0, None),
                ([2, 2, 2, 2], (1, 1, 2, 2), 5, 3, None),  # disposal 3
                ([3], (0, 0, 1, 1), 5, 0, None),
            ],
            4, 4,
        )
        frames = self._frames(spark, tmp_path, data)
        assert self._px(frames[1], 1, 1) == PALETTE4[2]
        assert self._px(frames[2], 1, 1) == PALETTE4[1]  # restored
        assert self._px(frames[2], 0, 0) == PALETTE4[3]


class TestGifInterlace:
    def test_interlaced_rows_deinterlace(self, spark, tmp_path):
        from batch_processing_system_spark.functions.multimodal import (
            sample_video_frames,
        )

        # 4x9 image, row y painted color (y % 4) — interlace reorders
        # rows in the stream; the decode must restore natural order
        h, w = 9, 4
        rows_natural = [[y % 4] * w for y in range(h)]
        order = (
            list(range(0, h, 8)) + list(range(4, h, 8))
            + list(range(2, h, 4)) + list(range(1, h, 2))
        )
        stream_rows = [rows_natural[y] for y in order]
        idxs = [v for row in stream_rows for v in row]

        flags = 0x80 | 0x01
        out = bytearray(b"GIF89a" + struct.pack("<HHBBB", w, h, flags, 0, 0))
        for r, g, b in PALETTE4:
            out += bytes((r, g, b))
        out += b"\x21\xf9\x04\x00" + struct.pack("<H", 5) + b"\x00\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0x40)  # interlaced
        data = _lzw_encode_simple(2, idxs)
        out += bytes([2])
        for i in range(0, len(data), 255):
            chunk = data[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00\x3b"
        (tmp_path / "i.gif").write_bytes(bytes(out))

        [row] = sample_video_frames(
            read_binary_dir(spark, str(tmp_path), glob="*.gif"), 40
        ).collect()
        rgb = row["frame_rgb"]
        for y in range(h):
            px = tuple(rgb[3 * (y * w) : 3 * (y * w) + 3])
            assert px == PALETTE4[y % 4], (y, px)
