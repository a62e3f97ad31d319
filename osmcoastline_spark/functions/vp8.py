"""From-scratch VP8 keyframe (lossy WebP) decoder — RFC 6386.

A lossy WebP file is a RIFF container around a single VP8 key frame
(intra-only), so a still-image decoder needs exactly the keyframe subset
of RFC 6386: the boolean arithmetic decoder (§7), frame/segment/filter/
quantizer headers (§9), intra mode parsing over the keyframe mode trees
(§11), DCT/WHT token decoding with the default probability tables (§13),
dequantization (§14.1), the inverse WHT/DCT (§14.3-14.4), the ten 4x4 and
four 16x16/chroma intra predictors (§12), and the normal + simple in-loop
deblocking filters (§15).  All of that is implemented here from the
public spec; the big constant tables live in vp8_tables.py.

Bit-exactness is verified against the system libwebp via
tests/test_webp_libwebp_oracle.py: for libwebp-encoded lossy streams our
Y/U/V output planes must equal WebPDecodeYUV's byte-for-byte (the YUV
comparison point deliberately excludes libwebp's RGB upsampler, which is
an implementation choice outside the spec).

Decode-only: a lossy VP8 *encoder* (RD-optimising mode search + boolean
arithmetic writer) is out of scope; encode_webp keeps emitting VP8L
lossless streams.

Scale posture: a per-image kernel run inside mapInPandas batches
(functions/image.py) — Python-sequential per image like the PNG/JPEG
codecs, parallel across images.
"""

from __future__ import annotations

import numpy as np

from . import vp8_tables as T

# ------------------------------------------------------------ constants

ZIGZAG = (0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)
# RFC 6386 13.3: coefficient-position -> probability band
BANDS = (0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7)
# RFC 6386 13.2: extra-bit probabilities and base values for DCT_CAT1..6
PCAT = (
    (159,),
    (165, 145),
    (173, 148, 140),
    (176, 155, 140, 135),
    (180, 157, 141, 134, 130),
    (254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129),
)
CAT_BASE = (5, 7, 11, 19, 35, 67)

# 16x16 / chroma modes and 4x4 modes (RFC 6386 11.2)
DC_PRED, V_PRED, H_PRED, TM_PRED, B_PRED = range(5)
B_DC, B_TM, B_VE, B_HE, B_LD, B_RD, B_VR, B_VL, B_HD, B_HU = range(10)

# keyframe mode trees + fixed probabilities (RFC 6386 11.2/11.3: keyframe
# mode probabilities are spec constants, never updated by the stream)
KF_YMODE_TREE = (-B_PRED, 2, 4, 6, -DC_PRED, -V_PRED, -H_PRED, -TM_PRED)
KF_YMODE_PROBS = (145, 156, 163, 128)
UV_MODE_TREE = (-DC_PRED, 2, -V_PRED, 4, -H_PRED, -TM_PRED)
KF_UV_MODE_PROBS = (142, 114, 183)
BMODE_TREE = (
    -B_DC, 2,
    -B_TM, 4,
    -B_VE, 6,
    8, 12,
    -B_HE, 10,
    -B_RD, -B_VR,
    -B_LD, 14,
    -B_VL, 16,
    -B_HD, -B_HU,
)
SEGMENT_TREE = (2, 4, -0, -1, -2, -3)
# context mapping of a 16x16 mode onto the bmode grid (RFC 6386 11.3)
MODE_TO_BMODE = (B_DC, B_VE, B_HE, B_TM)


# ------------------------------------------------------- boolean decoder


class _Bool:
    """RFC 6386 §7.3 boolean arithmetic decoder.  Reading past the end of
    the partition yields zero bytes (the spec's implicit-trailing-zeros
    behaviour)."""

    __slots__ = ("d", "n", "pos", "rng", "val", "cnt")

    def __init__(self, d: bytes):
        self.d = d
        self.n = len(d)
        v = 0
        for i in range(2):
            v = (v << 8) | (d[i] if i < self.n else 0)
        self.val = v
        self.pos = 2
        self.rng = 255
        self.cnt = 0

    def bit(self, prob: int) -> int:
        split = 1 + (((self.rng - 1) * prob) >> 8)
        big = split << 8
        if self.val >= big:
            ret = 1
            self.rng -= split
            self.val -= big
        else:
            ret = 0
            self.rng = split
        while self.rng < 128:
            self.val <<= 1
            self.rng <<= 1
            self.cnt += 1
            if self.cnt == 8:
                self.cnt = 0
                if self.pos < self.n:
                    self.val |= self.d[self.pos]
                    self.pos += 1
        return ret

    def literal(self, nbits: int) -> int:
        v = 0
        for _ in range(nbits):
            v = (v << 1) | self.bit(128)
        return v

    def signed(self, nbits: int) -> int:
        v = self.literal(nbits)
        return -v if self.bit(128) else v

    def tree(self, tree, probs) -> int:
        i = 0
        while True:
            i = tree[i + self.bit(probs[i >> 1])]
            if i <= 0:
                return -i


def _clamp_q(x: int) -> int:
    return 0 if x < 0 else (127 if x > 127 else x)


# ------------------------------------------------------------- residuals


def _decode_coeffs(bd: _Bool, plane_probs, first: int, ctx: int, dq_dc: int, dq_ac: int, out):
    """Decode one 4x4 block's tokens (RFC 6386 §13.2-13.3) into ``out``
    (natural order, dequantized).  Returns the end position n — the
    neighbour-context "nonzero" flag is (n > first), matching the spec's
    decode process."""
    n = first
    p = plane_probs[BANDS[n]][ctx]
    bit = bd.bit
    while n < 16:
        if not bit(p[0]):  # EOB
            return n
        # run of zeros: a DCT_0 token cannot be followed by EOB, so the
        # tree restarts past the EOB branch.
        while not bit(p[1]):
            n += 1
            if n == 16:
                return 16
            p = plane_probs[BANDS[n]][0]
        # nonzero value
        if not bit(p[2]):
            v = 1
        else:
            if not bit(p[3]):
                v = 2 if not bit(p[4]) else 3 + bit(p[5])
            else:
                if not bit(p[6]):
                    cat = bit(p[7])
                elif not bit(p[8]):
                    cat = 2 + bit(p[9])
                else:
                    cat = 4 + bit(p[10])
                extra = 0  # category extra bits, MSB-first
                for cp in PCAT[cat]:
                    extra = (extra << 1) | bit(cp)
                v = CAT_BASE[cat] + extra
        sign = bit(128)
        q = dq_dc if n == 0 else dq_ac
        out[ZIGZAG[n]] = -v * q if sign else v * q
        nctx = 2 if v > 1 else 1
        n += 1
        if n == 16:
            return 16
        p = plane_probs[BANDS[n]][nctx]
    return 16


# ------------------------------------------------------------ transforms


def _iwht4x4(c):
    """RFC 6386 §14.3 inverse Walsh-Hadamard (Y2 DC scattering)."""
    out = [0] * 16
    tmp = [0] * 16
    for i in range(4):
        a1 = c[i] + c[12 + i]
        b1 = c[4 + i] + c[8 + i]
        c1 = c[4 + i] - c[8 + i]
        d1 = c[i] - c[12 + i]
        tmp[i] = a1 + b1
        tmp[4 + i] = c1 + d1
        tmp[8 + i] = a1 - b1
        tmp[12 + i] = d1 - c1
    for i in range(4):
        r = 4 * i
        a1 = tmp[r] + tmp[r + 3]
        b1 = tmp[r + 1] + tmp[r + 2]
        c1 = tmp[r + 1] - tmp[r + 2]
        d1 = tmp[r] - tmp[r + 3]
        out[r] = (a1 + b1 + 3) >> 3
        out[r + 1] = (c1 + d1 + 3) >> 3
        out[r + 2] = (a1 - b1 + 3) >> 3
        out[r + 3] = (d1 - c1 + 3) >> 3
    return out


_COS = 20091  # cospi8sqrt2minus1, Q16 (RFC 6386 §14.4)
_SIN = 35468  # sinpi8sqrt2, Q16


def _idct4x4(c):
    """RFC 6386 §14.4 inverse DCT, exact integer arithmetic.  Returns a
    4x4 numpy int32 residual block."""
    tmp = [0] * 16
    for i in range(4):
        i0, i4, i8, i12 = c[i], c[4 + i], c[8 + i], c[12 + i]
        a1 = i0 + i8
        b1 = i0 - i8
        t1 = (i4 * _SIN) >> 16
        t2 = i12 + ((i12 * _COS) >> 16)
        c1 = t1 - t2
        t1 = i4 + ((i4 * _COS) >> 16)
        t2 = (i12 * _SIN) >> 16
        d1 = t1 + t2
        tmp[i] = a1 + d1
        tmp[12 + i] = a1 - d1
        tmp[4 + i] = b1 + c1
        tmp[8 + i] = b1 - c1
    out = np.empty((4, 4), dtype=np.int32)
    for i in range(4):
        r = 4 * i
        i0, i1, i2, i3 = tmp[r], tmp[r + 1], tmp[r + 2], tmp[r + 3]
        a1 = i0 + i2
        b1 = i0 - i2
        t1 = (i1 * _SIN) >> 16
        t2 = i3 + ((i3 * _COS) >> 16)
        c1 = t1 - t2
        t1 = i1 + ((i1 * _COS) >> 16)
        t2 = (i3 * _SIN) >> 16
        d1 = t1 + t2
        out[i, 0] = (a1 + d1 + 4) >> 3
        out[i, 3] = (a1 - d1 + 4) >> 3
        out[i, 1] = (b1 + c1 + 4) >> 3
        out[i, 2] = (b1 - c1 + 4) >> 3
    return out


# ------------------------------------------------------------ predictors


def _avg2(a, b):
    return (a + b + 1) >> 1


def _avg3(a, b, c):
    return (a + 2 * b + c + 2) >> 2


def _pred4(mode: int, A, L, X):
    """4x4 intra predictor (RFC 6386 §12.3).  A: 8 above pixels (4 above
    + 4 above-right), L: 4 left, X: above-left.  Returns 4x4 int array."""
    B = np.empty((4, 4), dtype=np.int32)
    if mode == B_DC:
        B[:] = (int(A[0]) + A[1] + A[2] + A[3] + L[0] + L[1] + L[2] + L[3] + 4) >> 3
    elif mode == B_TM:
        B[:] = np.clip(L.reshape(4, 1) + A[:4].reshape(1, 4) - X, 0, 255)
    elif mode == B_VE:
        row = [
            _avg3(X, A[0], A[1]),
            _avg3(A[0], A[1], A[2]),
            _avg3(A[1], A[2], A[3]),
            _avg3(A[2], A[3], A[4]),
        ]
        B[:] = np.array(row, dtype=np.int32).reshape(1, 4)
    elif mode == B_HE:
        col = [
            _avg3(X, L[0], L[1]),
            _avg3(L[0], L[1], L[2]),
            _avg3(L[1], L[2], L[3]),
            _avg3(L[2], L[3], L[3]),
        ]
        B[:] = np.array(col, dtype=np.int32).reshape(4, 1)
    elif mode == B_LD:
        for r in range(4):
            for c in range(4):
                d = r + c
                if d < 6:
                    B[r, c] = _avg3(A[d], A[d + 1], A[d + 2])
                else:
                    B[r, c] = _avg3(A[6], A[7], A[7])
    elif mode == B_RD:
        E = [L[3], L[2], L[1], L[0], X, A[0], A[1], A[2], A[3]]
        for r in range(4):
            for c in range(4):
                i = 4 + c - r
                B[r, c] = _avg3(E[i - 1], E[i], E[i + 1])
    elif mode == B_VR:
        B[3, 0] = _avg3(L[2], L[1], L[0])
        B[2, 0] = _avg3(L[1], L[0], X)
        B[3, 1] = B[1, 0] = _avg3(L[0], X, A[0])
        B[2, 1] = B[0, 0] = _avg2(X, A[0])
        B[3, 2] = B[1, 1] = _avg3(X, A[0], A[1])
        B[2, 2] = B[0, 1] = _avg2(A[0], A[1])
        B[3, 3] = B[1, 2] = _avg3(A[0], A[1], A[2])
        B[2, 3] = B[0, 2] = _avg2(A[1], A[2])
        B[1, 3] = _avg3(A[1], A[2], A[3])
        B[0, 3] = _avg2(A[2], A[3])
    elif mode == B_VL:
        B[0, 0] = _avg2(A[0], A[1])
        B[1, 0] = _avg3(A[0], A[1], A[2])
        B[2, 0] = B[0, 1] = _avg2(A[1], A[2])
        B[1, 1] = B[3, 0] = _avg3(A[1], A[2], A[3])
        B[2, 1] = B[0, 2] = _avg2(A[2], A[3])
        B[3, 1] = B[1, 2] = _avg3(A[2], A[3], A[4])
        B[2, 2] = B[0, 3] = _avg2(A[3], A[4])
        B[3, 2] = B[1, 3] = _avg3(A[3], A[4], A[5])
        B[2, 3] = _avg3(A[4], A[5], A[6])
        B[3, 3] = _avg3(A[5], A[6], A[7])
    elif mode == B_HD:
        B[3, 0] = _avg2(L[3], L[2])
        B[3, 1] = _avg3(L[3], L[2], L[1])
        B[2, 0] = B[3, 2] = _avg2(L[2], L[1])
        B[2, 1] = B[3, 3] = _avg3(L[2], L[1], L[0])
        B[1, 0] = B[2, 2] = _avg2(L[1], L[0])
        B[1, 1] = B[2, 3] = _avg3(L[1], L[0], X)
        B[0, 0] = B[1, 2] = _avg2(L[0], X)
        B[0, 1] = B[1, 3] = _avg3(L[0], X, A[0])
        B[0, 2] = _avg3(X, A[0], A[1])
        B[0, 3] = _avg3(A[0], A[1], A[2])
    elif mode == B_HU:
        B[0, 0] = _avg2(L[0], L[1])
        B[0, 1] = _avg3(L[0], L[1], L[2])
        B[0, 2] = B[1, 0] = _avg2(L[1], L[2])
        B[0, 3] = B[1, 1] = _avg3(L[1], L[2], L[3])
        B[1, 2] = B[2, 0] = _avg2(L[2], L[3])
        B[1, 3] = B[2, 1] = _avg3(L[2], L[3], L[3])
        B[2, 2] = B[2, 3] = B[3, 0] = B[3, 1] = B[3, 2] = B[3, 3] = L[3]
    else:  # pragma: no cover
        raise ValueError(f"bad bmode {mode}")
    return B


def _pred_block(mode: int, above, left, above_left, size: int,
                have_above: bool, have_left: bool):
    """16x16 / 8x8 whole-block intra predictor (RFC 6386 §12.2).  DC
    special-cases unavailable edges; V/H/TM use the 127/129 border
    conventions already baked into ``above``/``left``."""
    if mode == DC_PRED:
        if have_above and have_left:
            s = int(above.sum()) + int(left.sum())
            dc = (s + size) >> _dc_shift(size, 2)
        elif have_above:
            dc = (int(above.sum()) + (size >> 1)) >> _dc_shift(size, 1)
        elif have_left:
            dc = (int(left.sum()) + (size >> 1)) >> _dc_shift(size, 1)
        else:
            dc = 128
        return np.full((size, size), dc, dtype=np.int32)
    if mode == V_PRED:
        return np.repeat(above.reshape(1, size), size, axis=0).astype(np.int32)
    if mode == H_PRED:
        return np.repeat(left.reshape(size, 1), size, axis=1).astype(np.int32)
    if mode == TM_PRED:
        return np.clip(
            left.reshape(size, 1).astype(np.int32)
            + above.reshape(1, size).astype(np.int32)
            - int(above_left),
            0,
            255,
        )
    raise ValueError(f"bad 16x16/uv mode {mode}")  # pragma: no cover


def _dc_shift(size: int, nedges: int) -> int:
    # 16x16 both edges: >>5; one edge: >>4.  8x8 both: >>4; one: >>3.
    base = 4 if size == 16 else 3
    return base + (1 if nedges == 2 else 0)


# ------------------------------------------------------------ loop filter


def _c128(x):
    return np.clip(x, -128, 127)


def _u8(x):
    return np.clip(x + 128, 0, 255)


def _lf_mask(p3, p2, p1, p0, q0, q1, q2, q3, edge_limit, interior):
    return (
        (np.abs(p0 - q0) * 2 + np.abs(p1 - q1) // 2 <= edge_limit)
        & (np.abs(p3 - p2) <= interior)
        & (np.abs(p2 - p1) <= interior)
        & (np.abs(p1 - p0) <= interior)
        & (np.abs(q1 - q0) <= interior)
        & (np.abs(q2 - q1) <= interior)
        & (np.abs(q3 - q2) <= interior)
    )


def _gather(plane, y0, x0, horiz, count):
    """Return the 8 pixel lanes p3..q3 across an edge as int32 arrays,
    plus a writer.  ``horiz`` True = horizontal edge (vertical gradient,
    edge between rows y0-1 and y0); False = vertical edge between columns
    x0-1 and x0.  ``count`` lanes along the edge."""
    if horiz:
        rows = [plane[y0 + o, x0 : x0 + count].astype(np.int32) for o in range(-4, 4)]

        def write(idx, vals):
            plane[y0 + idx - 4, x0 : x0 + count] = vals.astype(np.uint8)

    else:
        rows = [plane[y0 : y0 + count, x0 + o].astype(np.int32) for o in range(-4, 4)]

        def write(idx, vals):
            plane[y0 : y0 + count, x0 + idx - 4] = vals.astype(np.uint8)

    return rows, write


def _filter_edge(plane, y0, x0, horiz, count, kind, edge_limit, interior, hev_t):
    """Apply one deblocking filter along an edge.

    kind: 'mb' (normal MB edge, 6-tap), 'sb' (normal subblock edge),
    'simple' (simple filter, 4-tap always)."""
    rows, write = _gather(plane, y0, x0, horiz, count)
    up3, up2, up1, up0, uq0, uq1, uq2, uq3 = rows
    if kind == "simple":
        mask = np.abs(up0 - uq0) * 2 + np.abs(up1 - uq1) // 2 <= edge_limit
    else:
        mask = _lf_mask(up3, up2, up1, up0, uq0, uq1, uq2, uq3, edge_limit, interior)
    if not mask.any():
        return
    # signed domain (RFC 6386 15.2: pixels are biased by -128)
    p2, p1, p0 = up2 - 128, up1 - 128, up0 - 128
    q0, q1, q2 = uq0 - 128, uq1 - 128, uq2 - 128
    if kind == "simple":
        a = _c128(_c128(p1 - q1) + 3 * (q0 - p0))
        f = _c128(a + 4) >> 3
        e = _c128(a + 3) >> 3
        write(3, np.where(mask, _u8(p0 + e), up0))
        write(4, np.where(mask, _u8(q0 - f), uq0))
        return
    hev = (np.abs(up1 - up0) > hev_t) | (np.abs(uq1 - uq0) > hev_t)
    if kind == "sb":
        a = _c128(np.where(hev, _c128(p1 - q1), 0) + 3 * (q0 - p0))
        f = _c128(a + 4) >> 3
        e = _c128(a + 3) >> 3
        new_p0 = np.where(mask, _u8(p0 + e), up0)
        new_q0 = np.where(mask, _u8(q0 - f), uq0)
        a2 = (f + 1) >> 1
        m2 = mask & ~hev
        write(2, np.where(m2, _u8(p1 + a2), up1))
        write(3, new_p0)
        write(4, new_q0)
        write(5, np.where(m2, _u8(q1 - a2), uq1))
        return
    # normal MB edge filter (RFC 6386 15.2 mbfilter)
    mh = mask & hev
    mn = mask & ~hev
    # hev path: common_adjust with outer taps
    a = _c128(_c128(p1 - q1) + 3 * (q0 - p0))
    f = _c128(a + 4) >> 3
    e = _c128(a + 3) >> 3
    # non-hev path: 6-tap wide filter
    w = _c128(_c128(p1 - q1) + 3 * (q0 - p0))
    a0 = _c128((27 * w + 63) >> 7)
    a1 = _c128((18 * w + 63) >> 7)
    a2 = _c128((9 * w + 63) >> 7)
    new_p2 = np.where(mn, _u8(p2 + a2), up2)
    new_p1 = np.where(mn, _u8(p1 + a1), up1)
    new_p0 = np.where(mn, _u8(p0 + a0), np.where(mh, _u8(p0 + e), up0))
    new_q0 = np.where(mn, _u8(q0 - a0), np.where(mh, _u8(q0 - f), uq0))
    new_q1 = np.where(mn, _u8(q1 - a1), uq1)
    new_q2 = np.where(mn, _u8(q2 - a2), uq2)
    write(1, new_p2)
    write(2, new_p1)
    write(3, new_p0)
    write(4, new_q0)
    write(5, new_q1)
    write(6, new_q2)


# ----------------------------------------------------------- frame decode


def decode_vp8(chunk: bytes):
    """Decode a VP8 keyframe chunk (the payload of a WebP ``VP8 `` RIFF
    chunk).  Returns (y, u, v) uint8 planes of shapes (h, w) and
    (ceil(h/2), ceil(w/2)) — bit-exact with WebPDecodeYUV."""
    if len(chunk) < 10:
        raise ValueError("vp8: truncated frame header")
    tag = chunk[0] | (chunk[1] << 8) | (chunk[2] << 16)
    if tag & 1:
        raise ValueError("vp8: still images must be key frames")
    part0_size = tag >> 5
    if chunk[3:6] != b"\x9d\x01\x2a":
        raise ValueError("vp8: bad start code")
    w = (chunk[6] | (chunk[7] << 8)) & 0x3FFF
    h = (chunk[8] | (chunk[9] << 8)) & 0x3FFF
    if w == 0 or h == 0:
        raise ValueError("vp8: zero dimension")
    if w * h > 1 << 26:
        # sanity cap (64 MP, far above any real payload here): a hostile
        # header claiming 16383x16383 would otherwise decode ~1M garbage
        # macroblocks before decode_image's metadata-dims check runs
        raise ValueError(f"vp8: implausible dimensions {w}x{h}")
    if 10 + part0_size > len(chunk):
        raise ValueError("vp8: first partition overruns frame")
    bd = _Bool(chunk[10 : 10 + part0_size])

    bd.literal(1)  # color space (must be 0 for the profile we accept)
    bd.literal(1)  # clamping type (we always clamp; a no-op hint)

    # --- segmentation (RFC 6386 9.3)
    seg_enabled = bd.literal(1)
    update_map = 0
    seg_abs = 0
    seg_q = [0, 0, 0, 0]
    seg_lf = [0, 0, 0, 0]
    seg_tree_probs = [255, 255, 255]
    if seg_enabled:
        update_map = bd.literal(1)
        update_data = bd.literal(1)
        if update_data:
            seg_abs = bd.literal(1)
            for i in range(4):
                if bd.literal(1):
                    seg_q[i] = bd.signed(7)
            for i in range(4):
                if bd.literal(1):
                    seg_lf[i] = bd.signed(6)
        if update_map:
            for i in range(3):
                if bd.literal(1):
                    seg_tree_probs[i] = bd.literal(8)

    # --- loop filter header (9.4)
    filter_type = bd.literal(1)  # 1 = simple
    filter_level = bd.literal(6)
    sharpness = bd.literal(3)
    ref_deltas = [0, 0, 0, 0]
    mode_deltas = [0, 0, 0, 0]
    lf_delta_enabled = bd.literal(1)
    if lf_delta_enabled:
        if bd.literal(1):  # delta update flag
            for i in range(4):
                if bd.literal(1):
                    ref_deltas[i] = bd.signed(6)
            for i in range(4):
                if bd.literal(1):
                    mode_deltas[i] = bd.signed(6)

    # --- token partitions (9.5)
    nparts = 1 << bd.literal(2)
    pos = 10 + part0_size
    sizes_end = pos + 3 * (nparts - 1)
    if sizes_end > len(chunk):
        raise ValueError("vp8: partition size table overruns frame")
    parts = []
    data_pos = sizes_end
    for i in range(nparts - 1):
        o = pos + 3 * i
        psz = chunk[o] | (chunk[o + 1] << 8) | (chunk[o + 2] << 16)
        if data_pos + psz > len(chunk):
            raise ValueError("vp8: token partition overruns frame")
        parts.append(_Bool(chunk[data_pos : data_pos + psz]))
        data_pos += psz
    parts.append(_Bool(chunk[data_pos:]))

    # --- quantizers (9.6 / 14.1)
    base_q = bd.literal(7)
    y1dc_d = bd.signed(4) if bd.literal(1) else 0
    y2dc_d = bd.signed(4) if bd.literal(1) else 0
    y2ac_d = bd.signed(4) if bd.literal(1) else 0
    uvdc_d = bd.signed(4) if bd.literal(1) else 0
    uvac_d = bd.signed(4) if bd.literal(1) else 0

    def quants(seg: int):
        if seg_enabled:
            q = seg_q[seg] if seg_abs else base_q + seg_q[seg]
        else:
            q = base_q
        q = _clamp_q(q)
        y1dc = T.DC_QLOOKUP[_clamp_q(q + y1dc_d)]
        y1ac = T.AC_QLOOKUP[q]
        y2dc = T.DC_QLOOKUP[_clamp_q(q + y2dc_d)] * 2
        y2ac = T.AC_QLOOKUP[_clamp_q(q + y2ac_d)] * 155 // 100
        if y2ac < 8:
            y2ac = 8
        uvdc = T.DC_QLOOKUP[_clamp_q(q + uvdc_d)]
        if uvdc > 132:
            uvdc = 132
        uvac = T.AC_QLOOKUP[_clamp_q(q + uvac_d)]
        return y1dc, y1ac, y2dc, y2ac, uvdc, uvac

    seg_quants = [quants(s) for s in range(4)]

    bd.literal(1)  # refresh_entropy_probs — stateless for a still image

    # --- token probability updates (13.4)
    coeff_probs = [
        [[list(T.DEFAULT_COEFF_PROBS[i][j][k]) for k in range(3)] for j in range(8)]
        for i in range(4)
    ]
    upd = T.COEFF_UPDATE_PROBS
    for i in range(4):
        for j in range(8):
            for k in range(3):
                for lth in range(11):
                    if bd.bit(upd[i][j][k][lth]):
                        coeff_probs[i][j][k][lth] = bd.literal(8)

    mb_no_skip = bd.literal(1)
    prob_skip = bd.literal(8) if mb_no_skip else 0

    # --- frame buffers (1-px virtual border: row 0 = "above" 127s,
    # col 0 = "left" 129s; RFC 6386 12.2 edge conventions)
    mb_w = (w + 15) >> 4
    mb_h = (h + 15) >> 4
    Y = np.empty((mb_h * 16 + 1, mb_w * 16 + 1), dtype=np.uint8)
    U = np.empty((mb_h * 8 + 1, mb_w * 8 + 1), dtype=np.uint8)
    V = np.empty((mb_h * 8 + 1, mb_w * 8 + 1), dtype=np.uint8)
    for P in (Y, U, V):
        P[0, :] = 127
        P[1:, 0] = 129

    # neighbour state
    above_bmodes = np.full((mb_w, 4), B_DC, dtype=np.int64)
    above_nz_y = np.zeros((mb_w, 4), dtype=np.int64)
    above_nz_u = np.zeros((mb_w, 2), dtype=np.int64)
    above_nz_v = np.zeros((mb_w, 2), dtype=np.int64)
    above_nz_y2 = np.zeros(mb_w, dtype=np.int64)

    # per-MB filter metadata
    mb_levels = np.zeros((mb_h, mb_w), dtype=np.int64)
    mb_inner = np.zeros((mb_h, mb_w), dtype=bool)

    probs_y_no_y2 = coeff_probs[3]
    probs_y_with_y2 = coeff_probs[0]
    probs_y2 = coeff_probs[1]
    probs_uv = coeff_probs[2]

    for mby in range(mb_h):
        left_bmodes = [B_DC, B_DC, B_DC, B_DC]
        left_nz_y = [0, 0, 0, 0]
        left_nz_u = [0, 0]
        left_nz_v = [0, 0]
        left_nz_y2 = 0
        tbd = parts[mby % nparts]
        for mbx in range(mb_w):
            # ---------------- mode parsing (partition 0)
            seg = 0
            if update_map:
                seg = bd.tree(SEGMENT_TREE, seg_tree_probs)
            skip = bd.bit(prob_skip) if mb_no_skip else 0
            ymode = bd.tree(KF_YMODE_TREE, KF_YMODE_PROBS)
            if ymode == B_PRED:
                bmodes = [0] * 16
                for sb in range(16):
                    r, c = sb >> 2, sb & 3
                    above_m = (
                        bmodes[sb - 4] if r > 0 else int(above_bmodes[mbx, c])
                    )
                    left_m = bmodes[sb - 1] if c > 0 else left_bmodes[r]
                    bmodes[sb] = bd.tree(BMODE_TREE, T.KF_BMODE_PROBS[above_m][left_m])
                above_bmodes[mbx] = bmodes[12:16]
                left_bmodes = [bmodes[3], bmodes[7], bmodes[11], bmodes[15]]
            else:
                bm = MODE_TO_BMODE[ymode]
                bmodes = None
                above_bmodes[mbx] = bm
                left_bmodes = [bm, bm, bm, bm]
            uvmode = bd.tree(UV_MODE_TREE, KF_UV_MODE_PROBS)

            has_y2 = ymode != B_PRED
            y1dc, y1ac, y2dc, y2ac, uvdc, uvac = seg_quants[seg]

            # ---------------- residuals (token partition for this row)
            ycoeffs = [None] * 16
            ucoeffs = [None] * 4
            vcoeffs = [None] * 4
            mb_nz = 0
            if skip:
                left_nz_y = [0, 0, 0, 0]
                above_nz_y[mbx] = 0
                left_nz_u = [0, 0]
                above_nz_u[mbx] = 0
                left_nz_v = [0, 0]
                above_nz_v[mbx] = 0
                if has_y2:
                    left_nz_y2 = 0
                    above_nz_y2[mbx] = 0
            else:
                dc16 = None
                if has_y2:
                    ctx = left_nz_y2 + int(above_nz_y2[mbx])
                    c2 = [0] * 16
                    n = _decode_coeffs(tbd, probs_y2, 0, ctx, y2dc, y2ac, c2)
                    nzf = 1 if n > 0 else 0
                    left_nz_y2 = nzf
                    above_nz_y2[mbx] = nzf
                    mb_nz |= nzf
                    dc16 = _iwht4x4(c2)
                    first = 1
                    probs_y = probs_y_with_y2
                else:
                    first = 0
                    probs_y = probs_y_no_y2
                ynz = [0] * 16
                for sb in range(16):
                    r, c = sb >> 2, sb & 3
                    lf = left_nz_y[r] if c == 0 else ynz[sb - 1]
                    af = int(above_nz_y[mbx, c]) if r == 0 else ynz[sb - 4]
                    cf = [0] * 16
                    n = _decode_coeffs(tbd, probs_y, first, lf + af, y1dc, y1ac, cf)
                    nzf = 1 if n > first else 0
                    ynz[sb] = nzf
                    if c == 3:
                        left_nz_y[r] = nzf
                    if r == 3:
                        above_nz_y[mbx, c] = nzf
                    mb_nz |= nzf
                    if dc16 is not None:
                        cf[0] = dc16[sb]
                    ycoeffs[sb] = cf
                for coefs, left_nz_p, above_nz_p in (
                    (ucoeffs, left_nz_u, above_nz_u),
                    (vcoeffs, left_nz_v, above_nz_v),
                ):
                    pnz = [0] * 4
                    for sb in range(4):
                        r, c = sb >> 1, sb & 1
                        lf = left_nz_p[r] if c == 0 else pnz[sb - 1]
                        af = int(above_nz_p[mbx, c]) if r == 0 else pnz[sb - 2]
                        cf = [0] * 16
                        n = _decode_coeffs(tbd, probs_uv, 0, lf + af, uvdc, uvac, cf)
                        nzf = 1 if n > 0 else 0
                        pnz[sb] = nzf
                        if c == 1:
                            left_nz_p[r] = nzf
                        if r == 1:
                            above_nz_p[mbx, c] = nzf
                        mb_nz |= nzf
                        coefs[sb] = cf

            # ---------------- filter metadata (15.1/15.2)
            lvl = filter_level
            if seg_enabled:
                lvl = seg_lf[seg] if seg_abs else lvl + seg_lf[seg]
            if lf_delta_enabled:
                lvl += ref_deltas[0]  # intra frame
                if ymode == B_PRED:
                    lvl += mode_deltas[0]
            lvl = 0 if lvl < 0 else (63 if lvl > 63 else lvl)
            mb_levels[mby, mbx] = lvl
            mb_inner[mby, mbx] = (ymode == B_PRED) or bool(mb_nz)

            # ---------------- reconstruction
            ax, ay = mbx * 16, mby * 16  # padded coords of above-left corner
            have_above = mby > 0
            have_left = mbx > 0
            if ymode == B_PRED:
                arr = np.empty((17, 21), dtype=np.int32)
                arr[0, 0] = Y[ay, ax]
                arr[0, 1:17] = Y[ay, ax + 1 : ax + 17]
                if mbx < mb_w - 1:
                    tr = Y[ay, ax + 17 : ax + 21].astype(np.int32)
                else:
                    tr = np.full(4, int(Y[ay, ax + 16]), dtype=np.int32)
                arr[0, 17:21] = tr
                arr[1:17, 0] = Y[ay + 1 : ay + 17, ax]
                for r in range(1, 4):
                    arr[4 * r, 17:21] = tr
                for sb in range(16):
                    r, c = sb >> 2, sb & 3
                    y0, x0 = 4 * r, 4 * c  # arr coords of block top-left -1
                    A = arr[y0, x0 + 1 : x0 + 9]
                    L = arr[y0 + 1 : y0 + 5, x0]
                    X = arr[y0, x0]
                    pred = _pred4(bmodes[sb], A, L, X)
                    if ycoeffs[sb] is not None:
                        pred = pred + _idct4x4(ycoeffs[sb])
                    arr[y0 + 1 : y0 + 5, x0 + 1 : x0 + 5] = np.clip(pred, 0, 255)
                Y[ay + 1 : ay + 17, ax + 1 : ax + 17] = arr[1:17, 1:17].astype(np.uint8)
            else:
                above = Y[ay, ax + 1 : ax + 17].astype(np.int32)
                left = Y[ay + 1 : ay + 17, ax].astype(np.int32)
                pred = _pred_block(
                    ymode, above, left, int(Y[ay, ax]), 16, have_above, have_left
                )
                out = pred.copy()
                if not skip:
                    for sb in range(16):
                        r, c = sb >> 2, sb & 3
                        out[4 * r : 4 * r + 4, 4 * c : 4 * c + 4] += _idct4x4(
                            ycoeffs[sb]
                        )
                Y[ay + 1 : ay + 17, ax + 1 : ax + 17] = np.clip(out, 0, 255).astype(
                    np.uint8
                )
            # chroma
            cax, cay = mbx * 8, mby * 8
            for P, coefs in ((U, ucoeffs), (V, vcoeffs)):
                above = P[cay, cax + 1 : cax + 9].astype(np.int32)
                left = P[cay + 1 : cay + 9, cax].astype(np.int32)
                pred = _pred_block(
                    uvmode, above, left, int(P[cay, cax]), 8, have_above, have_left
                )
                out = pred.copy()
                if not skip:
                    for sb in range(4):
                        r, c = sb >> 1, sb & 1
                        out[4 * r : 4 * r + 4, 4 * c : 4 * c + 4] += _idct4x4(
                            coefs[sb]
                        )
                P[cay + 1 : cay + 9, cax + 1 : cax + 9] = np.clip(out, 0, 255).astype(
                    np.uint8
                )

    # ---------------- loop filter pass (15.1), raster order, same pixel
    # evolution as an in-loop implementation
    Yp = Y[1:, 1:]
    Up = U[1:, 1:]
    Vp = V[1:, 1:]
    if filter_level > 0:
        for mby in range(mb_h):
            for mbx in range(mb_w):
                lvl = int(mb_levels[mby, mbx])
                if lvl == 0:
                    continue
                interior = lvl
                if sharpness:
                    interior >>= 2 if sharpness > 4 else 1
                    if interior > 9 - sharpness:
                        interior = 9 - sharpness
                if interior < 1:
                    interior = 1
                hev_t = 2 if lvl >= 40 else (1 if lvl >= 15 else 0)  # keyframe
                mbe = ((lvl + 2) * 2) + interior
                sbe = (lvl * 2) + interior
                inner = bool(mb_inner[mby, mbx])
                yy, yx = mby * 16, mbx * 16
                cy, cx = mby * 8, mbx * 8
                if filter_type == 1:  # simple: luma only, 4-tap
                    if mbx > 0:
                        _filter_edge(Yp, yy, yx, False, 16, "simple", mbe, 0, 0)
                    if inner:
                        for dx in (4, 8, 12):
                            _filter_edge(Yp, yy, yx + dx, False, 16, "simple", sbe, 0, 0)
                    if mby > 0:
                        _filter_edge(Yp, yy, yx, True, 16, "simple", mbe, 0, 0)
                    if inner:
                        for dy in (4, 8, 12):
                            _filter_edge(Yp, yy + dy, yx, True, 16, "simple", sbe, 0, 0)
                else:  # normal: luma + chroma
                    if mbx > 0:
                        _filter_edge(Yp, yy, yx, False, 16, "mb", mbe, interior, hev_t)
                        _filter_edge(Up, cy, cx, False, 8, "mb", mbe, interior, hev_t)
                        _filter_edge(Vp, cy, cx, False, 8, "mb", mbe, interior, hev_t)
                    if inner:
                        for dx in (4, 8, 12):
                            _filter_edge(Yp, yy, yx + dx, False, 16, "sb", sbe, interior, hev_t)
                        _filter_edge(Up, cy, cx + 4, False, 8, "sb", sbe, interior, hev_t)
                        _filter_edge(Vp, cy, cx + 4, False, 8, "sb", sbe, interior, hev_t)
                    if mby > 0:
                        _filter_edge(Yp, yy, yx, True, 16, "mb", mbe, interior, hev_t)
                        _filter_edge(Up, cy, cx, True, 8, "mb", mbe, interior, hev_t)
                        _filter_edge(Vp, cy, cx, True, 8, "mb", mbe, interior, hev_t)
                    if inner:
                        for dy in (4, 8, 12):
                            _filter_edge(Yp, yy + dy, yx, True, 16, "sb", sbe, interior, hev_t)
                        _filter_edge(Up, cy + 4, cx, True, 8, "sb", sbe, interior, hev_t)
                        _filter_edge(Vp, cy + 4, cx, True, 8, "sb", sbe, interior, hev_t)

    cw, ch = (w + 1) >> 1, (h + 1) >> 1
    return (
        Yp[:h, :w].copy(),
        Up[:ch, :cw].copy(),
        Vp[:ch, :cw].copy(),
    )


# ------------------------------------------------------------ RGB output


def yuv_to_rgb(y: np.ndarray, u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """BT.601 studio-swing YUV420 -> RGB8 with nearest-neighbour chroma
    upsampling.  Deliberately simple: the upsampling/rounding choices of
    libwebp's "fancy" RGB path are implementation details outside RFC
    6386; parity with libwebp is asserted at the YUV plane level and this
    conversion is only used for image feature extraction."""
    h, w = y.shape
    uu = np.repeat(np.repeat(u, 2, axis=0), 2, axis=1)[:h, :w]
    vv = np.repeat(np.repeat(v, 2, axis=0), 2, axis=1)[:h, :w]
    yf = y.astype(np.float64) - 16.0
    uf = uu.astype(np.float64) - 128.0
    vf = vv.astype(np.float64) - 128.0
    r = 1.164 * yf + 1.596 * vf
    g = 1.164 * yf - 0.391 * uf - 0.813 * vf
    b = 1.164 * yf + 2.018 * uf
    out = np.stack([r, g, b], axis=-1)
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)
