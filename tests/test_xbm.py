"""XBM decoder vs an independently written C-source emitter: LSB-first
bit order, row byte padding, X10 short variant, whitespace/comment
tolerance."""

from __future__ import annotations

import numpy as np
import pytest

from batch_processing_system_spark.functions.xbm import decode_xbm_rgb


def encode_xbm(bits_rows, name: str = "img", x10: bool = False) -> bytes:
    h = len(bits_rows)
    w = len(bits_rows[0])
    stride = (w + 7) // 8
    raw = []
    for row in bits_rows:
        for bstart in range(0, w, 8):
            byte = 0
            for i, v in enumerate(row[bstart : bstart + 8]):
                byte |= (v & 1) << i  # LSB first
            raw.append(byte)
    lines = [
        f"#define {name}_width {w}",
        f"#define {name}_height {h}",
    ]
    if x10:
        words = []
        padded = raw + [0] * (len(raw) % 2)
        for i in range(0, len(padded), 2):
            words.append(padded[i] | (padded[i + 1] << 8))
        body = ", ".join(f"0x{v:04x}" for v in words)
        lines.append(f"static short {name}_bits[] = {{ {body} }};")
    else:
        body = ", ".join(f"0x{v:02x}" for v in raw)
        lines.append(
            f"static unsigned char {name}_bits[] = {{ /* bitmap */ {body} }};"
        )
    return ("\n".join(lines) + "\n").encode()


class TestXbm:
    def test_lsb_first_and_padding(self):
        bits = [[1, 0, 0, 1, 1, 0, 1, 0, 1], [0, 1, 1, 0, 0, 1, 0, 1, 0]]
        got = decode_xbm_rgb(encode_xbm(bits))
        expect = (1 - np.array(bits, dtype=np.uint8)) * 255
        assert (got[:, :, 0] == expect).all()
        assert (got[:, :, 0] == got[:, :, 2]).all()

    def test_x10_short_variant(self):
        bits = [[(x + y) % 2 for x in range(19)] for y in range(5)]
        a = decode_xbm_rgb(encode_xbm(bits))
        b = decode_xbm_rgb(encode_xbm(bits, x10=True))
        assert (a == b).all()

    def test_not_xbm_and_truncated(self):
        assert decode_xbm_rgb(b"P1\n2 2\n0110") is None
        assert decode_xbm_rgb(b"\x89PNG\r\n\x1a\n") is None
        data = encode_xbm([[1, 0, 1, 1] * 4] * 4)
        # cut inside the initializer: fewer bytes than width*height need
        cut = data[: data.rfind(b",") - 20] + b"};"
        with pytest.raises(ValueError):
            decode_xbm_rgb(cut)

    def test_random_roundtrip(self):
        import random

        rng = random.Random(63)
        for _ in range(30):
            w, h = rng.randint(1, 20), rng.randint(1, 10)
            bits = [[rng.randint(0, 1) for _ in range(w)] for _ in range(h)]
            got = decode_xbm_rgb(encode_xbm(bits, x10=rng.random() < 0.5))
            expect = (1 - np.array(bits, dtype=np.uint8)) * 255
            assert (got[:, :, 0] == expect).all(), (w, h)
