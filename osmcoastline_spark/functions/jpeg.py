"""Baseline JPEG (JFIF) codec from scratch — stdlib + numpy only.

Implements the subset of ITU-T T.81 needed for the input_hint's lossy-image
invariant (decoded-pixel PSNR ≥ 40 dB): baseline sequential DCT, 8-bit,
4:4:4 (no chroma subsampling), standard Annex K quantization + Huffman
tables, no restart intervals, no progressive/arithmetic modes. The encoder
exists so tests can produce genuinely lossy byte streams; the decoder is
the production path (functions.image.decode_image fmt='jpeg').

Vectorization: the 2-D DCT/IDCT run as single numpy matmuls over ALL 8×8
blocks of a component at once; quantization, zigzag and level shifts are
whole-array ops. Only the entropy (Huffman) layer is per-symbol Python —
inherently bit-serial, same shape as the round-3 PNG codec's zlib layer.
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------- constants

ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)
UNZIGZAG = np.argsort(ZIGZAG)

# decode-side allocation bound: the coefficient store costs ~12 bytes/px
# (3 planes × int32) before the float64 IDCT, so 64 MP ≈ 0.8 GB — large
# enough for any real photo, small enough that a corrupt SOF can't turn
# one row into a task-killing allocation (same posture as
# image.PNG_MAX_SLOW_FILTER_PIXELS)
JPEG_MAX_DECODE_PIXELS = 64_000_000

# ITU-T T.81 Annex K.1 — example quantization tables
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)
QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

# ITU-T T.81 Annex K.3 — typical Huffman tables: (bits[1..16], values)
HUFF_DC_LUMA = (
    [0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_DC_CHROMA = (
    [0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_AC_LUMA = (
    [0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
HUFF_AC_CHROMA = (
    [0, 0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

# 8-point DCT-II basis matrix: D @ block @ D.T = 2-D DCT
_k = np.arange(8)
_DCT = np.sqrt(2.0 / 8.0) * np.cos((2 * _k[None, :] + 1) * _k[:, None] * np.pi / 16.0)
_DCT[0, :] = 1.0 / np.sqrt(8.0)


def _quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg-compatible quality scaling of a base quantization table."""
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (table * scale + 50) // 100
    return np.clip(q, 1, 255).astype(np.int32)


def _huff_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length) per T.81 C.2 canonical code assignment."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_decoder(bits: list[int], values: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) → symbol."""
    out: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length]):
            out[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return out


def _blocks(comp: np.ndarray) -> np.ndarray:
    """(H, W) component (H, W multiples of 8) → (n, 8, 8) block stack in
    raster order."""
    h, w = comp.shape
    return (
        comp.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )


def _unblocks(blocks: np.ndarray, h: int, w: int) -> np.ndarray:
    return (
        blocks.reshape(h // 8, w // 8, 8, 8).transpose(0, 2, 1, 3).reshape(h, w)
    )


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    r, g, b = (px[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    return np.clip(np.rint(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing (T.81 F.1.2.3)
                self.out.append(0x00)
        # truncate the accumulator to the pending bits — an unmasked
        # Python int grows one byte per write forever, turning every
        # later shift into bigint arithmetic (O(n²) in scan size)
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s


def _magnitude(v: int) -> tuple[int, int]:
    """value → (size category, offset bits) per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def encode_jpeg(pixels: np.ndarray, quality: int = 85) -> bytes:
    """RGB8 HxWx3 → baseline JFIF bytes (4:4:4, Annex K tables)."""
    h, w = pixels.shape[:2]
    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    ycc = _rgb_to_ycbcr(pixels.astype(np.uint8))
    padded = np.empty((ph, pw, 3), dtype=np.float64)
    padded[:h, :w] = ycc
    padded[h:, :w] = ycc[h - 1 : h, :]  # edge-replicate pad
    padded[:, w:] = padded[:, w - 1 : w]

    qt = [_quality_scale(QUANT_LUMA, quality), _quality_scale(QUANT_CHROMA, quality)]
    dc_tabs = [_huff_codes(*HUFF_DC_LUMA), _huff_codes(*HUFF_DC_CHROMA)]
    ac_tabs = [_huff_codes(*HUFF_AC_LUMA), _huff_codes(*HUFF_AC_CHROMA)]

    # all-blocks DCT + quantize per component (one matmul chain each)
    comp_q = []
    for ci in range(3):
        blocks = _blocks(padded[..., ci] - 128.0)
        coef = _DCT @ blocks @ _DCT.T
        q = qt[0 if ci == 0 else 1].reshape(8, 8)
        zz = np.rint(coef / q).astype(np.int32).reshape(-1, 64)[:, ZIGZAG]
        # Baseline entropy coding caps AC size categories at 10 (Annex K AC
        # tables define no size-11 codes); at quality>=99 a scaled quant value
        # of 1 can push an extreme block (e.g. ±128 checkerboard) to |AC|=1024.
        # Real baseline encoders guarantee |AC|<=1023 — clamp to match.
        np.clip(zz[:, 1:], -1023, 1023, out=zz[:, 1:])
        comp_q.append(zz)

    bw = _BitWriter()
    prev_dc = [0, 0, 0]
    n_blocks = comp_q[0].shape[0]
    for bi in range(n_blocks):  # interleaved MCU order == raster (4:4:4)
        for ci in range(3):
            ti = 0 if ci == 0 else 1
            zz = comp_q[ci][bi]
            diff = int(zz[0]) - prev_dc[ci]
            prev_dc[ci] = int(zz[0])
            size, bits = _magnitude(diff)
            code, ln = dc_tabs[ti][size]
            bw.write(code, ln)
            if size:
                bw.write(bits, size)
            run = 0
            nz = np.nonzero(zz[1:])[0]
            last = nz[-1] + 1 if len(nz) else 0
            for k in range(1, last + 1):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = ac_tabs[ti][0xF0]  # ZRL
                    bw.write(code, ln)
                    run -= 16
                size, bits = _magnitude(v)
                code, ln = ac_tabs[ti][(run << 4) | size]
                bw.write(code, ln)
                bw.write(bits, size)
                run = 0
            if last < 63:
                code, ln = ac_tabs[ti][0x00]  # EOB
                bw.write(code, ln)
    bw.flush()

    def marker(tag: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, tag, len(payload) + 2) + payload

    def dht(tc: int, th: int, table: tuple[list[int], list[int]]) -> bytes:
        bits, values = table
        return bytes([tc << 4 | th]) + bytes(bits[1:17]) + bytes(values)

    out = bytearray(b"\xff\xd8")  # SOI
    out += marker(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += marker(0xDB, b"\x00" + bytes(qt[0][ZIGZAG].astype(np.uint8)))
    out += marker(0xDB, b"\x01" + bytes(qt[1][ZIGZAG].astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for cid, tq in ((1, 0), (2, 1), (3, 1)):
        sof += bytes([cid, 0x11, tq])  # 1x1 sampling (4:4:4)
    out += marker(0xC0, sof)
    out += marker(0xC4, dht(0, 0, HUFF_DC_LUMA))
    out += marker(0xC4, dht(1, 0, HUFF_AC_LUMA))
    out += marker(0xC4, dht(0, 1, HUFF_DC_CHROMA))
    out += marker(0xC4, dht(1, 1, HUFF_AC_CHROMA))
    sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    out += marker(0xDA, sos)
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("truncated jpeg scan")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(self.data):
                raise ValueError("truncated jpeg scan")
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1  # stuffed byte
            # else: marker — baseline without restarts shouldn't hit one
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        bit = (self.acc >> self.nbits) & 1
        # drop the consumed bit: without the mask the accumulator keeps
        # every byte ever read and the shifts become bigint-sized
        # (O(n²) in scan length — measured 15 s for a 256×256 decode)
        self.acc &= (1 << self.nbits) - 1
        return bit

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JFIF bytes → RGB8 HxWx3. Supports what encode_jpeg emits
    plus any baseline 4:4:4 3-component stream with table-driven DHT/DQT."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG byte stream")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    h = w = None
    comps: list[tuple[int, int, int]] = []  # (cid, sampling, tq)
    scan_comps: list[tuple[int, int, int]] = []  # (cid, td, ta)
    scan_start = None
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError("jpeg marker expected")
        # any number of 0xFF fill bytes may precede a marker (T.81 B.1.1.2)
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        if pos + 1 >= len(data):
            raise ValueError("truncated jpeg header")
        tag = data[pos + 1]
        if tag == 0xD9:  # EOI
            break
        if pos + 4 > len(data):
            raise ValueError("truncated jpeg header")
        (ln,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        payload = data[pos + 4 : pos + 2 + ln]
        if tag == 0xDB:
            p = 0
            while p < len(payload):
                pq, tq_id = payload[p] >> 4, payload[p] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                if p + 65 > len(payload):
                    raise ValueError("truncated DQT payload")
                tab = np.frombuffer(payload[p + 1 : p + 65], dtype=np.uint8)
                qt[tq_id] = tab.astype(np.int32)[UNZIGZAG]
                p += 65
        elif tag == 0xC4:
            p = 0
            while p < len(payload):
                tc, th = payload[p] >> 4, payload[p] & 0xF
                if p + 17 > len(payload):
                    raise ValueError("truncated DHT payload")
                bits = [0] + list(payload[p + 1 : p + 17])
                nv = sum(bits)
                if p + 17 + nv > len(payload):
                    raise ValueError("truncated DHT payload")
                values = list(payload[p + 17 : p + 17 + nv])
                huff[(tc, th)] = _huff_decoder(bits, values)
                p += 17 + nv
        elif tag == 0xC0:
            if len(payload) < 6:
                raise ValueError("truncated SOF payload")
            _prec, h, w, nc = struct.unpack(">BHHB", payload[:6])
            if len(payload) < 6 + 3 * nc:
                raise ValueError("truncated SOF payload")
            for c in range(nc):
                cid, samp, tq_id = payload[6 + 3 * c : 9 + 3 * c]
                if samp != 0x11:
                    raise NotImplementedError("chroma subsampling")
                comps.append((cid, samp, tq_id))
        elif tag in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise NotImplementedError("non-baseline JPEG mode")
        elif tag == 0xDD:
            raise NotImplementedError("restart intervals")
        elif tag == 0xDA:
            if not payload or len(payload) < 1 + 2 * payload[0]:
                raise ValueError("truncated SOS payload")
            ns = payload[0]
            for c in range(ns):
                cid, tt = payload[1 + 2 * c], payload[2 + 2 * c]
                scan_comps.append((cid, tt >> 4, tt & 0xF))
            scan_start = pos + 2 + ln
            break
        pos += 2 + ln
    if h is None or scan_start is None:
        raise ValueError("missing SOF/SOS")
    if len(comps) != 3 or len(scan_comps) != 3:
        raise NotImplementedError("only 3-component (YCbCr) streams")

    if h * w > JPEG_MAX_DECODE_PIXELS:
        # a corrupt SOF can declare 65535×65535 — without this bound the
        # coefficient store below would be a ~51 GB allocation and the
        # escape would be MemoryError, not the ValueError the per-row
        # drop path catches
        raise ValueError(f"jpeg dims {h}x{w} above decode cap")
    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    nby, nbx = ph // 8, pw // 8
    n_blocks = nby * nbx
    coeffs = [np.zeros((n_blocks, 64), dtype=np.int32) for _ in range(3)]

    br = _BitReader(data[scan_start:])

    def read_symbol(table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | br.bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("bad huffman code")

    # scan order is the SOS component list; map each scan entry back to its
    # SOF component BY ID (a spec-legal stream may list them differently)
    sof_index = {cid: i for i, (cid, _s, _tq) in enumerate(comps)}
    try:
        scan_to_sof = [sof_index[cid] for cid, _td, _ta in scan_comps]
    except KeyError as e:
        raise ValueError(f"SOS references unknown component id {e}") from e

    prev_dc = [0, 0, 0]
    for bi in range(n_blocks):
        for si in range(3):
            ci = scan_to_sof[si]
            _cid, td, ta = scan_comps[si]
            dct = huff.get((0, td))
            act = huff.get((1, ta))
            if dct is None or act is None:
                raise ValueError(f"SOS references undefined huffman table {(td, ta)}")
            zz = coeffs[ci][bi]
            size = read_symbol(dct)
            if size > 11:
                # T.81 table F.1: DC difference categories are 0..11 for
                # 8-bit precision; a corrupt stream decoding to a larger
                # symbol would read `size` raw bits and overflow the
                # int32 coefficient store (OverflowError, not ValueError)
                raise ValueError(f"bad DC size category {size}")
            diff = _extend(br.bits(size), size) if size else 0
            prev_dc[ci] += diff
            if not -2048 <= prev_dc[ci] <= 2047:
                # valid 8-bit baseline DC values fit category 11 (±2047);
                # only corrupt diff chains can walk the accumulator out
                raise ValueError("DC accumulator out of range")
            zz[0] = prev_dc[ci]
            k = 1
            while k <= 63:
                rs = read_symbol(act)
                r, size = rs >> 4, rs & 0xF
                if size == 0:
                    if r == 15:
                        k += 16  # ZRL
                        continue
                    break  # EOB
                k += r
                if k > 63:
                    raise ValueError("bad AC run past end of block")
                if size > 10:
                    # Annex K AC tables define size categories 1..10 only
                    raise ValueError(f"bad AC size category {size}")
                zz[k] = _extend(br.bits(size), size)
                k += 1

    out = np.empty((ph, pw, 3), dtype=np.float64)
    for ci in range(3):
        tq_id = comps[ci][2]
        if tq_id not in qt:
            raise ValueError(f"SOF references undefined quant table {tq_id}")
        deq = (coeffs[ci][:, UNZIGZAG] * qt[tq_id]).reshape(-1, 8, 8)
        spatial = _DCT.T @ deq.astype(np.float64) @ _DCT
        out[..., ci] = _unblocks(spatial + 128.0, ph, pw)
    return _ycbcr_to_rgb(out)[:h, :w]
