"""FLAC decoder (functions/flac.py) vs the independent encoder in
tests/_flac_encoder.py — both written from the public spec (RFC 9639),
sharing no code. FLAC is lossless, so every comparison is EXACT
sample equality, not a tolerance."""

from __future__ import annotations

import math
import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from batch_processing_system_spark.functions.flac import decode_flac

from ._flac_encoder import encode_flac


def sine(n, f=220, a=12000, sr=8000, ph=0.0):
    return [int(a * math.sin(2 * math.pi * f * i / sr + ph)) for i in range(n)]


def roundtrip(chans, **kw):
    sr, ch, bits, samples = decode_flac(encode_flac(chans, **kw))
    want = [c[i] for i in range(len(chans[0])) for c in chans]
    assert samples.tolist() == want, "decode is not bit-exact"
    return sr, ch, bits


class TestSubframeTypes:
    def test_constant(self):
        roundtrip([[42] * 640], plans={"kind": "constant"})

    def test_verbatim(self):
        roundtrip([sine(500)], plans={"kind": "verbatim"})

    @pytest.mark.parametrize("order", [0, 1, 2, 3, 4])
    def test_fixed_orders(self, order):
        roundtrip([sine(640)], plans={"kind": "fixed", "order": order})

    def test_lpc(self):
        roundtrip(
            [sine(640)],
            plans={"kind": "lpc", "order": 4, "coefs": [10, -6, 3, -1], "shift": 3},
        )

    def test_lpc_zero_shift(self):
        roundtrip(
            [sine(320)], plans={"kind": "lpc", "order": 2, "coefs": [2, -1], "shift": 0}
        )

    def test_wasted_bits(self):
        sig = [s & ~7 for s in sine(640)]  # 3 guaranteed-zero low bits
        roundtrip([sig], plans={"kind": "fixed", "order": 2, "wasted": 3})

    def test_per_frame_plan_mix_and_short_final_frame(self):
        roundtrip(
            [sine(777)],  # 777 = 12 full 64-frames + a 9-sample tail
            plans=[
                {"kind": "fixed", "order": 2},
                {"kind": "verbatim"},
                {"kind": "lpc", "order": 3, "coefs": [3, -3, 1], "shift": 1},
            ],
        )


class TestResidualCoding:
    def test_partitioned_rice(self):
        roundtrip([sine(640)], plans={"kind": "fixed", "order": 2, "partition_order": 2})

    def test_escaped_partition(self):
        roundtrip(
            [sine(640)],
            plans={"kind": "fixed", "order": 2, "partition_order": 1,
                   "escape_partitions": [1]},
        )

    def test_rice2_method(self):
        roundtrip(
            [sine(640)],
            plans={"kind": "fixed", "order": 2, "method": 1, "partition_order": 2},
        )


class TestStereoAndDepths:
    @pytest.mark.parametrize(
        "mode", ["independent", "left_side", "right_side", "mid_side"]
    )
    def test_stereo_decorrelation(self, mode):
        L = sine(900)
        R = sine(900, f=330, a=9000, ph=0.5)
        sr, ch, bits = roundtrip([L, R], stereo_mode=mode)
        assert (sr, ch, bits) == (8000, 2, 16)

    def test_mid_side_odd_sums(self):
        # mid = (l+r)>>1 loses a bit exactly when l+r is odd — force it
        L = [3, -5, 7, 100, -101] * 64
        R = [2, 2, 2, 3, 4] * 64
        roundtrip([L, R], stereo_mode="mid_side")

    def test_8_bit(self):
        sig = [int(100 * math.sin(2 * math.pi * 5 * i / 200)) for i in range(300)]
        assert roundtrip([sig], bits=8)[2] == 8

    def test_24_bit(self):
        sig = [int(4e6 * math.sin(2 * math.pi * 220 * i / 8000)) for i in range(500)]
        assert roundtrip([sig], bits=24)[2] == 24


class TestCorruptStreams:
    def test_not_flac_returns_none(self):
        assert decode_flac(b"RIFF....WAVE") is None
        assert decode_flac(b"") is None

    def test_header_crc_detected(self):
        flac = bytearray(encode_flac([sine(300)]))
        # STREAMINFO block = 4 magic + 4 header + 34 info + 16... find
        # the first frame sync and corrupt a header byte after it
        idx = flac.index(b"\xff\xf8", 4)
        flac[idx + 2] ^= 0x01
        with pytest.raises(ValueError, match="CRC"):
            decode_flac(bytes(flac))

    def test_body_crc_detected(self):
        flac = bytearray(encode_flac([sine(300)]))
        flac[-3] ^= 0x40  # inside the last frame's subframe bits
        with pytest.raises(ValueError, match="CRC"):
            decode_flac(bytes(flac))


class TestPropertyRandomSignals:
    @settings(max_examples=15, deadline=None)
    @given(
        st.lists(st.integers(-30000, 30000), min_size=70, max_size=400),
        st.sampled_from([
            {"kind": "fixed", "order": 2},
            {"kind": "fixed", "order": 4, "partition_order": 1},
            {"kind": "verbatim"},
            {"kind": "lpc", "order": 3, "coefs": [3, -3, 1], "shift": 1},
        ]),
    )
    def test_arbitrary_signals_roundtrip(self, sig, plan):
        roundtrip([sig], plans=plan)


class TestSparkPath:
    def test_audio_features_over_flac(self, spark, tmp_path):
        from batch_processing_system_spark.functions.multimodal import (
            extract_audio_features,
        )
        from batch_processing_system_spark.sources.binaryfile import (
            read_binary_dir,
        )

        sig = sine(8000, f=440, a=int(0.5 * 32767), sr=8000)
        (tmp_path / "a.flac").write_bytes(encode_flac([sig], sample_rate=8000))
        [row] = extract_audio_features(
            read_binary_dir(spark, str(tmp_path), glob="*.flac")
        ).collect()
        assert (row["sample_rate"], row["channels"], row["bits"]) == (8000, 1, 16)
        assert row["n_samples"] == 8000
        # FLAC is lossless: features match the analytic sine exactly
        # (same checks as the PCM-WAV test, tighter than ADPCM's)
        assert abs(row["rms"] - 0.5 / 2**0.5) < 0.005
        assert abs(row["peak"] - 0.5) < 0.005
