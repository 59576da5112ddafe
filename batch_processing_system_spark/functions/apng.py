"""Pure-Python APNG (animated PNG) decode from the public APNG spec
(now PNG third edition §4.9-4.12): acTL / fcTL / fdAT chunks, per-frame
regions with x/y offsets, dispose_op none/background/previous,
blend_op source/over, and the default-image rule (an IDAT before the
first fcTL is NOT part of the animation).

Each frame's pixel data is re-wrapped as a standalone PNG (shared
IHDR geometry swapped for the frame's, PLTE/tRNS copied) and decoded
by the repo's own PNG decoder in RGBA mode — every depth/color/filter
combination the still decoder supports works inside animations for
free.

Determinism note (the GIF disposal rule's sibling): blend-over uses
EXACT integer compositing — oa = sa + da*(255-sa)//255 and
oc = (sc*sa*255 + dc*da*(255-sa)) // (oa*255) — where renderers
typically run float premultiplied math; results can differ by 1 in a
channel for semi-transparent overlaps, pinned in tests. Fully
transparent canvas pixels render as the documented black sentinel in
the RGB output, matching the GIF path.

Reference surface: /root/reference/README.md:150-156 (multimodal
ingest). Completes the animated-still-image pair: GIF (LZW lineage)
and APNG (zlib lineage) both compose end-to-end.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from .guard import controlled_decode

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body))
    )


@controlled_decode("APNG")
def decode_apng_frames(data: bytes):
    """Decode an APNG to composed full-canvas frames:
    list of (delay_ms, width, height, rgb_bytes) — or None when the
    bytes are not a PNG at all OR are a plain still PNG (no acTL), so
    sniffing chains fall through to the still-image path."""
    from .multimodal import _decode_png_rgb

    if len(data) < 8 or data[:8] != _SIG:
        return None
    pos = 8
    ihdr_body = None
    plte = trns = None
    n_frames = None
    frames_raw: list[tuple[dict, bytearray]] = []  # (fcTL fields, data)
    cur = None
    seen_idat_before_fctl = False
    expected_seq = 0
    while pos + 8 <= len(data):
        (clen,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + clen]
        pos += 12 + clen
        if ctype == b"IHDR":
            ihdr_body = body
        elif ctype == b"PLTE":
            plte = body
        elif ctype == b"tRNS":
            trns = body
        elif ctype == b"acTL":
            n_frames, _plays = struct.unpack(">II", body[:8])
        elif ctype == b"fcTL":
            (seq, fw, fh, fx, fy, dnum, dden, dispose, blend) = struct.unpack(
                ">IIIIIHHBB", body[:26]
            )
            if seq != expected_seq:
                raise ValueError(
                    f"apng: fcTL sequence {seq}, expected {expected_seq}"
                )
            expected_seq += 1
            cur = {
                "w": fw, "h": fh, "x": fx, "y": fy,
                "dnum": dnum, "dden": dden,
                "dispose": dispose, "blend": blend,
            }
            frames_raw.append((cur, bytearray()))
        elif ctype == b"IDAT":
            if cur is None:
                seen_idat_before_fctl = True  # default image, not a frame
            else:
                frames_raw[-1][1].extend(body)
        elif ctype == b"fdAT":
            if cur is None:
                raise ValueError("apng: fdAT before any fcTL")
            (seq,) = struct.unpack(">I", body[:4])
            if seq != expected_seq:
                raise ValueError(
                    f"apng: fdAT sequence {seq}, expected {expected_seq}"
                )
            expected_seq += 1
            frames_raw[-1][1].extend(body[4:])
        elif ctype == b"IEND":
            break
    if n_frames is None:
        return None  # plain still PNG
    if ihdr_body is None:
        raise ValueError("apng: missing IHDR")
    if len(frames_raw) != n_frames:
        raise ValueError(
            f"apng: acTL declares {n_frames} frames, found {len(frames_raw)}"
        )
    if not frames_raw:
        raise ValueError("apng: zero frames")
    w, h = struct.unpack(">II", ihdr_body[:8])
    # frame 0 special cases: if the default image is the first frame
    # (no IDAT before the first fcTL), it must cover the full canvas;
    # dispose 'previous' on frame 0 acts as 'background'
    canvas = np.zeros((h, w, 4), dtype=np.uint8)
    out = []
    for i, (fc, raw) in enumerate(frames_raw):
        fw, fh, fx, fy = fc["w"], fc["h"], fc["x"], fc["y"]
        if fx + fw > w or fy + fh > h:
            raise ValueError("apng: frame region outside canvas")
        sub_ihdr = struct.pack(">II", fw, fh) + ihdr_body[8:]
        sub = bytearray(_SIG + _chunk(b"IHDR", sub_ihdr))
        if plte is not None:
            sub += _chunk(b"PLTE", plte)
        if trns is not None:
            sub += _chunk(b"tRNS", trns)
        sub += _chunk(b"IDAT", bytes(raw)) + _chunk(b"IEND", b"")
        rgba = _decode_png_rgb(bytes(sub), rgba=True)
        if rgba is None:
            raise ValueError("apng: frame failed to decode")
        region = canvas[fy : fy + fh, fx : fx + fw]
        saved = region.copy() if fc["dispose"] == 2 else None
        if fc["blend"] == 0 or i == 0:  # source (frame 0 over = source)
            blended = rgba
        else:  # over: exact integer alpha compositing (see module doc)
            sa = rgba[:, :, 3:4].astype(np.uint32)
            da = region[:, :, 3:4].astype(np.uint32)
            sc = rgba[:, :, :3].astype(np.uint32)
            dc = region[:, :, :3].astype(np.uint32)
            oa = sa + da * (255 - sa) // 255
            num = sc * sa * 255 + dc * da * (255 - sa)
            den = np.maximum(oa * 255, 1)
            oc = num // den
            blended = np.concatenate([oc, oa], axis=2).astype(np.uint8)
        canvas[fy : fy + fh, fx : fx + fw] = blended
        # emit the composed full canvas as RGB with transparent->black
        rgb = canvas[:, :, :3].copy()
        rgb[canvas[:, :, 3] == 0] = 0
        dden = fc["dden"] or 100
        out.append((fc["dnum"] * 1000 // dden, w, h, rgb.tobytes()))
        # dispose for the NEXT frame
        if fc["dispose"] == 1 or (fc["dispose"] == 2 and i == 0):
            canvas[fy : fy + fh, fx : fx + fw] = 0
        elif fc["dispose"] == 2:
            canvas[fy : fy + fh, fx : fx + fw] = saved
    # silence the unused-variable lint for the default-image marker:
    # its only effect is that frame 0 may be a sub-region (handled)
    del seen_idat_before_fctl
    return out
