"""Independent baseline JPEG ENCODER — test fixture generator.

Written forward-path only (numpy DCT-II, spec Annex K Huffman
tables, byte stuffing, restart markers): shares no code with the
production decoder in functions/jpeg.py, which is what makes the
round-trip tests evidence rather than self-confirmation — the same
independent-encoder pattern as the GIF/BMP/PNG tests."""

from __future__ import annotations

import numpy as np

ZZ = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# Annex K tables (public spec)
DC_LUM_COUNTS = [0,1,5,1,1,1,1,1,1,0,0,0,0,0,0,0]
DC_LUM_SYMS = list(range(12))
AC_LUM_COUNTS = [0,2,1,3,3,2,4,3,5,5,4,4,0,0,1,125]
AC_LUM_SYMS = [
 0x01,0x02,0x03,0x00,0x04,0x11,0x05,0x12,0x21,0x31,0x41,0x06,0x13,0x51,0x61,0x07,
 0x22,0x71,0x14,0x32,0x81,0x91,0xa1,0x08,0x23,0x42,0xb1,0xc1,0x15,0x52,0xd1,0xf0,
 0x24,0x33,0x62,0x72,0x82,0x09,0x0a,0x16,0x17,0x18,0x19,0x1a,0x25,0x26,0x27,0x28,
 0x29,0x2a,0x34,0x35,0x36,0x37,0x38,0x39,0x3a,0x43,0x44,0x45,0x46,0x47,0x48,0x49,
 0x4a,0x53,0x54,0x55,0x56,0x57,0x58,0x59,0x5a,0x63,0x64,0x65,0x66,0x67,0x68,0x69,
 0x6a,0x73,0x74,0x75,0x76,0x77,0x78,0x79,0x7a,0x83,0x84,0x85,0x86,0x87,0x88,0x89,
 0x8a,0x92,0x93,0x94,0x95,0x96,0x97,0x98,0x99,0x9a,0xa2,0xa3,0xa4,0xa5,0xa6,0xa7,
 0xa8,0xa9,0xaa,0xb2,0xb3,0xb4,0xb5,0xb6,0xb7,0xb8,0xb9,0xba,0xc2,0xc3,0xc4,0xc5,
 0xc6,0xc7,0xc8,0xc9,0xca,0xd2,0xd3,0xd4,0xd5,0xd6,0xd7,0xd8,0xd9,0xda,0xe1,0xe2,
 0xe3,0xe4,0xe5,0xe6,0xe7,0xe8,0xe9,0xea,0xf1,0xf2,0xf3,0xf4,0xf5,0xf6,0xf7,0xf8,
 0xf9,0xfa,
]


def build_codes(counts, syms):
    codes, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(counts[ln - 1]):
            codes[syms[k]] = (ln, code)
            code += 1
            k += 1
        code <<= 1
    return codes


class BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, ln, code):
        for i in range(ln - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc = 0
                self.n = 0

    def flush(self):
        while self.n:
            self.write(1, 1)  # pad with 1s


def dct2(block):
    C = np.zeros((8, 8))
    for u in range(8):
        a = (1 / 8) ** 0.5 if u == 0 else (2 / 8) ** 0.5
        for x in range(8):
            C[u, x] = a * np.cos((2 * x + 1) * u * np.pi / 16)
    return C @ block @ C.T


def magnitude(v):
    if v == 0:
        return 0, 0
    t = int(v).bit_length() if v > 0 else int(-v).bit_length()
    base = v if v > 0 else v + (1 << t) - 1
    return t, base


def encode_gray(img, quant=None):
    h, w = img.shape
    q = np.ones(64, dtype=int) if quant is None else np.asarray(quant, int)
    dc_codes = build_codes(DC_LUM_COUNTS, DC_LUM_SYMS)
    ac_codes = build_codes(AC_LUM_COUNTS, AC_LUM_SYMS)

    def seg(marker, payload):
        return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0]) + bytes(int(q[i]) for i in range(64)))
    out += seg(0xC0, bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
               + bytes([1, 1, 0x11, 0]))
    out += seg(0xC4, bytes([0x00]) + bytes(DC_LUM_COUNTS) + bytes(DC_LUM_SYMS))
    out += seg(0xC4, bytes([0x10]) + bytes(AC_LUM_COUNTS) + bytes(AC_LUM_SYMS))
    out += seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))

    bw = BitWriter()
    pred = 0
    ph = -(-h // 8) * 8
    pw = -(-w // 8) * 8
    padded = np.zeros((ph, pw))
    padded[:h, :w] = img
    padded[h:, :w] = img[h - 1:h, :]
    padded[:, w:] = padded[:, w - 1:w]
    for by in range(ph // 8):
        for bx in range(pw // 8):
            block = padded[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] - 128.0
            coef = dct2(block)
            zz = [int(round(coef.flat[ZZ[i]] / q[i])) for i in range(64)]
            diff = zz[0] - pred
            pred = zz[0]
            t, base = magnitude(diff)
            ln, code = dc_codes[t]
            bw.write(ln, code)
            if t:
                bw.write(t, base)
            run = 0
            last_nz = max((i for i in range(1, 64) if zz[i]), default=0)
            for i in range(1, 64):
                if i > last_nz:
                    ln, code = ac_codes[0x00]
                    bw.write(ln, code)
                    break
                if zz[i] == 0:
                    run += 1
                    continue
                while run > 15:
                    ln, code = ac_codes[0xF0]
                    bw.write(ln, code)
                    run -= 16
                t, base = magnitude(zz[i])
                ln, code = ac_codes[(run << 4) | t]
                bw.write(ln, code)
                bw.write(t, base)
                run = 0
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


# Progressive scans need EOBn symbols ((r<<4)|0 for r=1..14) that the
# baseline Annex K AC table does not carry, so the progressive encoder
# ships its own flat canonical tables: every AC symbol at 8 bits
# (176 codes < 256, the all-ones code stays unused as T.81 requires)
# and every DC category at 4 bits (12 < 16).
PROG_DC_COUNTS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
PROG_DC_SYMS = list(range(12))
PROG_AC_SYMS = sorted(
    {(r << 4) | s for r in range(16) for s in range(1, 11)}
    | {0x00, 0xF0}
    | {r << 4 for r in range(1, 15)}
)
PROG_AC_COUNTS = [0, 0, 0, 0, 0, 0, 0, len(PROG_AC_SYMS), 0, 0, 0, 0, 0, 0, 0, 0]


class _ProgState:
    """Per-scan EOB-run state: run length plus the correction bits
    buffered while the run is open (flushed right after its symbol)."""

    def __init__(self, bw, ac_codes):
        self.bw = bw
        self.ac = ac_codes
        self.eobrun = 0
        self.pending = []

    def flush_eobrun(self):
        if self.eobrun > 0:
            nbits = self.eobrun.bit_length() - 1
            ln, code = self.ac[nbits << 4]
            self.bw.write(ln, code)
            if nbits:
                self.bw.write(nbits, self.eobrun - (1 << nbits))
            for b in self.pending:
                self.bw.write(1, b)
            self.pending = []
            self.eobrun = 0


def _ac_first_block(st, zz, ss, se, al):
    """Encode one block's band for an AC first scan (point transform
    = sign-magnitude shift, EOB-run coded across blocks)."""
    bw, ac_codes = st.bw, st.ac
    vals = []
    for k in range(ss, se + 1):
        t = abs(zz[k]) >> al
        vals.append(t if zz[k] >= 0 else -t)
    last = -1
    for i, v in enumerate(vals):
        if v:
            last = i
    if last < 0:
        st.eobrun += 1
        if st.eobrun == 0x7FFF:
            st.flush_eobrun()
        return
    st.flush_eobrun()
    run = 0
    for i in range(last + 1):
        v = vals[i]
        if v == 0:
            run += 1
            continue
        while run > 15:
            ln, code = ac_codes[0xF0]
            bw.write(ln, code)
            run -= 16
        t, base = magnitude(v)
        ln, code = ac_codes[(run << 4) | t]
        bw.write(ln, code)
        bw.write(t, base)
        run = 0
    if last < se - ss:
        st.eobrun += 1
        if st.eobrun == 0x7FFF:
            st.flush_eobrun()


def _ac_refine_block(st, zz, ss, se, al):
    """Encode one block's band for an AC refinement scan (libjpeg
    encode_mcu_AC_refine shape): newly-nonzero coeffs emit (run,1) +
    sign; already-nonzero coeffs buffer a correction bit that rides
    with the next emitted symbol or the EOB run."""
    bw, ac_codes = st.bw, st.ac
    absvals = [abs(zz[k]) >> al for k in range(ss, se + 1)]
    eobpos = -1
    for i, t in enumerate(absvals):
        if t == 1:
            eobpos = i
    run = 0
    br = []
    for i, t in enumerate(absvals):
        if t == 0:
            run += 1
            continue
        while run > 15 and i <= eobpos:
            st.flush_eobrun()
            ln, code = ac_codes[0xF0]
            bw.write(ln, code)
            run -= 16
            for b in br:
                bw.write(1, b)
            br = []
        if t > 1:
            br.append(t & 1)
            continue
        st.flush_eobrun()
        ln, code = ac_codes[(run << 4) | 1]
        bw.write(ln, code)
        bw.write(1, 1 if zz[ss + i] >= 0 else 0)
        for b in br:
            bw.write(1, b)
        br = []
        run = 0
    if run > 0 or br:
        st.eobrun += 1
        st.pending.extend(br)
        if st.eobrun == 0x7FFF:
            st.flush_eobrun()


def _quantized_blocks(plane, q):
    """Row-major (by, bx) -> zigzag-ordered quantized coeff list."""
    ph, pw = plane.shape
    out = {}
    for by in range(ph // 8):
        for bx in range(pw // 8):
            block = plane[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] - 128.0
            coef = dct2(block)
            out[(by, bx)] = [int(round(coef.flat[ZZ[i]] / q[i])) for i in range(64)]
    return out


def encode_gray_progressive(img, quant=None, restart=0):
    """Progressive (SOF2) grayscale stream exercising the full T.81
    Huffman progressive feature set: DC first with point transform,
    spectral-selection AC bands, two successive-approximation AC
    refinement passes per band, DC refinement; with ``restart`` > 0,
    RSTn markers every ``restart`` blocks in EVERY scan (EOB runs and
    DC predictors reset at each)."""
    h, w = img.shape
    q = np.ones(64, dtype=int) if quant is None else np.asarray(quant, int)
    dc_codes = build_codes(PROG_DC_COUNTS, PROG_DC_SYMS)
    ac_codes = build_codes(PROG_AC_COUNTS, PROG_AC_SYMS)

    def seg(marker, payload):
        return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0]) + bytes(int(q[i]) for i in range(64)))
    out += seg(0xC2, bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
               + bytes([1, 1, 0x11, 0]))
    out += seg(0xC4, bytes([0x00]) + bytes(PROG_DC_COUNTS) + bytes(PROG_DC_SYMS))
    out += seg(0xC4, bytes([0x10]) + bytes(PROG_AC_COUNTS) + bytes(PROG_AC_SYMS))
    if restart:
        out += seg(0xDD, restart.to_bytes(2, "big"))

    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.zeros((ph, pw))
    padded[:h, :w] = img
    padded[h:, :w] = img[h - 1:h, :]
    padded[:, w:] = padded[:, w - 1:w]
    blocks = _quantized_blocks(padded, q)
    order = [(by, bx) for by in range(ph // 8) for bx in range(pw // 8)]

    def sos(ss, se, ah, al):
        return seg(0xDA, bytes([1, 1, 0x00, ss, se, (ah << 4) | al]))

    class _Rst:
        """Per-scan restart emitter: flush EOB run + pad + RSTn every
        ``restart`` blocks, cycling the marker index."""

        def __init__(self, bw, st=None):
            self.bw, self.st, self.n = bw, st, 0

        def tick(self, i):
            if restart and i and i % restart == 0:
                if self.st is not None:
                    self.st.flush_eobrun()
                self.bw.flush()
                self.bw.out += bytes([0xFF, 0xD0 + (self.n % 8)])
                self.n += 1
                return True
            return False

    # scan 1: DC first, Al=1
    out += sos(0, 0, 0, 1)
    bw = BitWriter()
    rst = _Rst(bw)
    pred = 0
    for i, pos in enumerate(order):
        if rst.tick(i):
            pred = 0
        v = blocks[pos][0] >> 1
        t, base = magnitude(v - pred)
        pred = v
        ln, code = dc_codes[t]
        bw.write(ln, code)
        if t:
            bw.write(t, base)
    bw.flush()
    out += bw.out

    # scans 2-3: AC first per band, Al=2
    for ss, se in ((1, 5), (6, 63)):
        out += sos(ss, se, 0, 2)
        bw = BitWriter()
        st = _ProgState(bw, ac_codes)
        rst = _Rst(bw, st)
        for i, pos in enumerate(order):
            rst.tick(i)
            _ac_first_block(st, blocks[pos], ss, se, 2)
        st.flush_eobrun()
        bw.flush()
        out += bw.out

    # scans 4-7: AC refinement per band, Ah=2->Al=1 then Ah=1->Al=0
    for ah, al in ((2, 1), (1, 0)):
        for ss, se in ((1, 5), (6, 63)):
            out += sos(ss, se, ah, al)
            bw = BitWriter()
            st = _ProgState(bw, ac_codes)
            rst = _Rst(bw, st)
            for i, pos in enumerate(order):
                rst.tick(i)
                _ac_refine_block(st, blocks[pos], ss, se, al)
            st.flush_eobrun()
            bw.flush()
            out += bw.out

    # scan 8: DC refinement, Ah=1 -> Al=0
    out += sos(0, 0, 1, 0)
    bw = BitWriter()
    rst = _Rst(bw)
    for i, pos in enumerate(order):
        rst.tick(i)
        bw.write(1, blocks[pos][0] & 1)
    bw.flush()
    out += bw.out

    out += b"\xff\xd9"
    return bytes(out)


def encode_color_progressive(rgb, sampling=(1, 1)):
    """Progressive color: interleaved DC first/refine scans over MCUs,
    non-interleaved per-component AC band scans — the canonical
    progressive scan script shape."""
    h, w, _ = rgb.shape
    q = np.ones(64, dtype=int)
    dc_codes = build_codes(PROG_DC_COUNTS, PROG_DC_SYMS)
    ac_codes = build_codes(PROG_AC_COUNTS, PROG_AC_SYMS)
    r, g, b = rgb[:, :, 0].astype(float), rgb[:, :, 1].astype(float), rgb[:, :, 2].astype(float)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128
    sh, sv = sampling

    def seg(marker, payload):
        return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0]) + bytes(int(q[i]) for i in range(64)))
    out += seg(0xC2, bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
               + bytes([3, 1, (sh << 4) | sv, 0, 2, 0x11, 0, 3, 0x11, 0]))
    out += seg(0xC4, bytes([0x00]) + bytes(PROG_DC_COUNTS) + bytes(PROG_DC_SYMS))
    out += seg(0xC4, bytes([0x10]) + bytes(PROG_AC_COUNTS) + bytes(PROG_AC_SYMS))

    mcu_w, mcu_h = 8 * sh, 8 * sv
    mcus_x, mcus_y = -(-w // mcu_w), -(-h // mcu_h)

    def pad(plane, ph, pw):
        p = np.zeros((ph, pw))
        hh, ww = plane.shape
        p[:hh, :ww] = plane
        p[hh:, :ww] = plane[hh - 1:hh, :]
        p[:, ww:] = p[:, ww - 1:ww]
        return p

    ypad = pad(y, mcus_y * mcu_h, mcus_x * mcu_w)
    if (sh, sv) == (1, 1):
        cbp = pad(cb, mcus_y * 8, mcus_x * 8)
        crp = pad(cr, mcus_y * 8, mcus_x * 8)
    else:
        cbp = pad(cb[::sv, ::sh], mcus_y * 8, mcus_x * 8)
        crp = pad(cr[::sv, ::sh], mcus_y * 8, mcus_x * 8)

    planes = [ypad, cbp, crp]
    blocks = [_quantized_blocks(p, q) for p in planes]
    # interleaved MCU block order for the DC scans
    mcu_order = []
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for by in range(sv):
                for bx in range(sh):
                    mcu_order.append((0, my * sv + by, mx * sh + bx))
            mcu_order.append((1, my, mx))
            mcu_order.append((2, my, mx))
    # non-interleaved per-component block rasters for the AC scans
    # (the component's OWN extent, not the MCU-padded one)
    comp_dims = []
    for ci in range(3):
        if ci == 0:
            ch, cw = h, w
        else:
            ch, cw = -(-h // sv), -(-w // sh)
        comp_dims.append((-(-ch // 8), -(-cw // 8)))

    # scan 1: interleaved DC first, Al=1
    out += seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 0, 0x01]))
    bw = BitWriter()
    preds = [0, 0, 0]
    for ci, by, bx in mcu_order:
        v = blocks[ci][(by, bx)][0] >> 1
        t, base = magnitude(v - preds[ci])
        preds[ci] = v
        ln, code = dc_codes[t]
        bw.write(ln, code)
        if t:
            bw.write(t, base)
    bw.flush()
    out += bw.out

    # scans 2-7: per-component AC first (Al=1) then AC refine (Al=0)
    for ci, comp_id in ((0, 1), (1, 2), (2, 3)):
        nbh, nbw = comp_dims[ci]
        raster = [(by, bx) for by in range(nbh) for bx in range(nbw)]
        out += seg(0xDA, bytes([1, comp_id, 0x00, 1, 63, 0x01]))
        bw = BitWriter()
        st = _ProgState(bw, ac_codes)
        for pos in raster:
            _ac_first_block(st, blocks[ci][pos], 1, 63, 1)
        st.flush_eobrun()
        bw.flush()
        out += bw.out
        out += seg(0xDA, bytes([1, comp_id, 0x00, 1, 63, 0x10]))
        bw = BitWriter()
        st = _ProgState(bw, ac_codes)
        for pos in raster:
            _ac_refine_block(st, blocks[ci][pos], 1, 63, 0)
        st.flush_eobrun()
        bw.flush()
        out += bw.out

    # scan 8: interleaved DC refinement, Ah=1 -> Al=0
    out += seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 0, 0x10]))
    bw = BitWriter()
    for ci, by, bx in mcu_order:
        bw.write(1, blocks[ci][(by, bx)][0] & 1)
    bw.flush()
    out += bw.out

    out += b"\xff\xd9"
    return bytes(out)


def encode_color(rgb, sampling=(1, 1), restart=0):
    """4:4:4 when sampling=(1,1); 4:2:0 when (2,2). Luma tables reused
    for chroma (encoder's choice, spec-legal)."""
    h, w, _ = rgb.shape
    q = np.ones(64, dtype=int)
    dc_codes = build_codes(DC_LUM_COUNTS, DC_LUM_SYMS)
    ac_codes = build_codes(AC_LUM_COUNTS, AC_LUM_SYMS)
    r, g, b = rgb[:, :, 0].astype(float), rgb[:, :, 1].astype(float), rgb[:, :, 2].astype(float)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128
    sh, sv = sampling

    def seg(marker, payload):
        return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0]) + bytes(int(q[i]) for i in range(64)))
    out += seg(0xC0, bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
               + bytes([3, 1, (sh << 4) | sv, 0, 2, 0x11, 0, 3, 0x11, 0]))
    out += seg(0xC4, bytes([0x00]) + bytes(DC_LUM_COUNTS) + bytes(DC_LUM_SYMS))
    out += seg(0xC4, bytes([0x10]) + bytes(AC_LUM_COUNTS) + bytes(AC_LUM_SYMS))
    if restart:
        out += seg(0xDD, restart.to_bytes(2, "big"))
    out += seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))

    mcu_w, mcu_h = 8 * sh, 8 * sv
    mcus_x, mcus_y = -(-w // mcu_w), -(-h // mcu_h)

    def pad(plane, ph, pw):
        p = np.zeros((ph, pw))
        hh, ww = plane.shape
        p[:hh, :ww] = plane
        p[hh:, :ww] = plane[hh - 1:hh, :]
        p[:, ww:] = p[:, ww - 1:ww]
        return p

    ypad = pad(y, mcus_y * mcu_h, mcus_x * mcu_w)
    if (sh, sv) == (1, 1):
        cbp = pad(cb, mcus_y * 8, mcus_x * 8)
        crp = pad(cr, mcus_y * 8, mcus_x * 8)
    else:
        cbs = cb[::sv, ::sh]
        crs = cr[::sv, ::sh]
        cbp = pad(cbs, mcus_y * 8, mcus_x * 8)
        crp = pad(crs, mcus_y * 8, mcus_x * 8)

    bw = BitWriter()
    pred = [0, 0, 0]
    n_rst = 0
    mcu_count = 0

    def put_block(plane, by, bx, ci):
        block = plane[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] - 128.0
        coef = dct2(block)
        zz = [int(round(coef.flat[ZZ[i]] / q[i])) for i in range(64)]
        diff = zz[0] - pred[ci]
        pred[ci] = zz[0]
        t, base = magnitude(diff)
        ln, code = dc_codes[t]
        bw.write(ln, code)
        if t:
            bw.write(t, base)
        run = 0
        last_nz = max((i for i in range(1, 64) if zz[i]), default=0)
        for i in range(1, 64):
            if i > last_nz:
                ln, code = ac_codes[0x00]
                bw.write(ln, code)
                break
            if zz[i] == 0:
                run += 1
                continue
            while run > 15:
                ln, code = ac_codes[0xF0]
                bw.write(ln, code)
                run -= 16
            t, base = magnitude(zz[i])
            ln, code = ac_codes[(run << 4) | t]
            bw.write(ln, code)
            bw.write(t, base)
            run = 0

    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart and mcu_count and mcu_count % restart == 0:
                bw.flush()
                out_marker = 0xD0 + (n_rst % 8)
                bw.out += bytes([0xFF, out_marker])
                n_rst += 1
                pred[:] = [0, 0, 0]
            mcu_count += 1
            for by in range(sv):
                for bx in range(sh):
                    put_block(ypad, my * sv + by, mx * sh + bx, 0)
            put_block(cbp, my, mx, 1)
            put_block(crp, my, mx, 2)
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


