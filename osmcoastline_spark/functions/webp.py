"""WebP lossless (VP8L) subset codec — from scratch, public bitstream spec.

Replaces the last stubbed image format (round-5 VERDICT #5, option
"implement VP8L-lossless"). Same playbook as the PNG/JPEG codecs: numpy
batch math + an explicit bit-level entropy coder, no image libraries.

Profile implemented (a strict, documented VP8L subset):

* container: RIFF / WEBP / VP8L chunk; lossy `VP8 ` chunks are decoded
  by the from-scratch RFC 6386 keyframe decoder in ``vp8.py`` (bit-exact
  with libwebp at the YUV plane level); only extended `VP8X` containers
  (animation/alpha/EXIF) raise NotImplementedError;
* encoder: per-channel canonical Huffman codes (DEFLATE bit conventions:
  LSB-first packing, code bits MSB-first) + optional LZ77 backrefs —
  same-value runs (distance 1, close-neighbor code 2) and copy-row-above
  matches (distance = width, close-neighbor code 1, values may vary
  within the match) — + an optional COLOR CACHE (hash-indexed
  recent colors as single green symbols) + ALL FOUR spec transforms:
  SPATIAL-PREDICTOR (per-16x16-block mode image, entropy-coded as a VP8L
  sub-image; modes chosen per block by wrap-aware residual magnitude),
  SUBTRACT-GREEN, the cross-channel COLOR TRANSFORM (per-block int8
  green→red / green→blue / red→blue multipliers by residual-entropy search),
  and COLOR INDEXING (≤256-color palette, subtraction-coded, with pixel
  bundling: ≤16 colors pack 2-8 indices per byte at reduced width);
* decoder: everything the encoder emits — including all 14 predictor
  modes with libwebp border semantics (top-right wraps to the row start
  via flat indexing), all four transforms with inverse application in
  reverse read order at each transform's recorded working width (color
  indexing reduces the width of everything read after it) — plus simple
  1/2-symbol codes, code-length repeats (16/17/18), the max_symbol cap,
  and general LZ77 backrefs at ANY distance symbol: close-neighbor codes
  1..120 go through the spec's 2-D plane-offset table (`_DIST_MAP`,
  dist = dx + dy*width, clamped to ≥1), codes > 120 are scan-line
  distances offset by 120 — and META-HUFFMAN (a block-resolution entropy
  sub-image selects one of N per-group five-code sets per pixel; the
  encoder emits two groups split by per-block distinct-color count).
  Only extended VP8X raises NotImplementedError: every VP8L lossless
  feature in the public bitstream spec is implemented, and lossy VP8
  still images decode through ``vp8.decode_vp8``.

Validation: exhaustive encode→decode roundtrips (lossless: bit-equal
pixels) over both literal and RLE paths plus corrupt-stream fuzzing, AND
cross-validation against the system's real libwebp 1.2.4 via ctypes as a
tests-only oracle (tests/test_webp_libwebp_oracle.py): every stream this
encoder emits decodes bit-exactly in WebPDecodeRGBA across all transform/
cache/meta flag combinations, and WebPEncodeLosslessRGB output decodes
bit-exactly here. The implementation itself never loads libwebp.

Spec: "WebP Lossless Bitstream Specification" (Google, public).
Reference parity: this fills the G17 decode slot of SURVEY.md §2 for the
input-hint's fmt column; reference osmcoastline has no image codecs (the
payload axis comes from BASELINE.json's image+caption input hint).
"""

from __future__ import annotations

import struct

import numpy as np

MAX_HUFF_LEN = 15
# order in which code-length-code lengths are transmitted (spec)
CODE_LENGTH_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]
GREEN_ALPHABET = 256 + 24  # literals + length prefix codes (no color cache)
DIST_ALPHABET = 40
MAX_BACKREF_LEN = 4096


# ----------------------------------------------------------------- bit IO


class _BitWriterLSB:
    """LSB-first bit packer (VP8L convention, same as DEFLATE)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, nbits: int) -> None:
        self.acc |= (value & ((1 << nbits) - 1)) << self.nbits
        self.nbits += nbits
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def write_code(self, code: int, length: int) -> None:
        """Huffman code bits go MSB-first into the LSB-first stream
        (DEFLATE convention; decoder does code = (code<<1)|bit)."""
        for i in range(length - 1, -1, -1):
            self.write((code >> i) & 1, 1)

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc, self.nbits = 0, 0
        return bytes(self.out)


class _BitReaderLSB:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit position

    def bits(self, n: int) -> int:
        end = self.pos + n
        if end > len(self.data) * 8:
            raise ValueError("truncated vp8l stream")
        v = 0
        for i in range(n):
            byte = self.data[(self.pos + i) >> 3]
            v |= ((byte >> ((self.pos + i) & 7)) & 1) << i
        self.pos = end
        return v

    def bit(self) -> int:
        if self.pos >= len(self.data) * 8:
            raise ValueError("truncated vp8l stream")
        b = (self.data[self.pos >> 3] >> (self.pos & 7)) & 1
        self.pos += 1
        return b


# ----------------------------------------------------------------- huffman


def _huffman_code_lengths(freqs: dict[int, int], max_len: int) -> dict[int, int]:
    """Symbol → canonical code length, depth-limited by frequency scaling
    (zlib's approach: halve+1 until the tree fits)."""
    live = {s: f for s, f in freqs.items() if f > 0}
    if not live:
        return {}
    if len(live) == 1:
        return {next(iter(live)): 1}
    import heapq

    f = dict(live)
    while True:
        # standard heap-based huffman; on depth overflow, halve+1 the
        # frequencies and rebuild (zlib's approach)
        heap = [(fr, sym, None, None) for sym, fr in f.items()]
        heapq.heapify(heap)
        cnt = 0
        while len(heap) > 1:
            a = heapq.heappop(heap)
            b = heapq.heappop(heap)
            cnt += 1
            heapq.heappush(heap, (a[0] + b[0], 1 << 20 | cnt, a, b))
        depths: dict[int, int] = {}

        def walk(node, d):
            if node[2] is None:
                depths[node[1]] = max(d, 1)
            else:
                walk(node[2], d + 1)
                walk(node[3], d + 1)

        walk(heap[0], 0)
        if max(depths.values()) <= max_len:
            return depths
        f = {s: (fr // 2) + 1 for s, fr in f.items()}


def _canonical_codes(lengths: dict[int, int]) -> dict[int, tuple[int, int]]:
    """DEFLATE canonical assignment: shorter codes first, then symbol
    order. Returns symbol → (code, length)."""
    by_len: dict[int, list[int]] = {}
    for sym, ln in lengths.items():
        if ln:
            by_len.setdefault(ln, []).append(sym)
    code = 0
    out: dict[int, tuple[int, int]] = {}
    for ln in range(1, MAX_HUFF_LEN + 1):
        for sym in sorted(by_len.get(ln, [])):
            out[sym] = (code, ln)
            code += 1
        code <<= 1
    return out


def _decoder_from_lengths(lengths: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) → symbol for serial decode (code = code<<1 | bit)."""
    codes = _canonical_codes({i: l for i, l in enumerate(lengths) if l})
    return {(ln, code): sym for sym, (code, ln) in codes.items()}


class _HuffDecoder:
    """Serial canonical-huffman reader; single-symbol codes cost 0 bits
    (VP8L simple-code semantics)."""

    def __init__(self, table: dict[tuple[int, int], int], single: int | None = None):
        self.table = table
        self.single = single

    def read(self, br: _BitReaderLSB) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for length in range(1, MAX_HUFF_LEN + 1):
            code = (code << 1) | br.bit()
            sym = self.table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("bad vp8l huffman code")


def _write_huffman(bw: _BitWriterLSB, lengths: dict[int, int], alphabet: int) -> dict[int, tuple[int, int]]:
    """Serialize one huffman code; returns the symbol→(code,len) map."""
    nz = sorted(s for s, l in lengths.items() if l)
    if 1 <= len(nz) <= 2 and all(s <= 255 for s in nz):
        bw.write(1, 1)  # simple code
        bw.write(len(nz) - 1, 1)
        if nz[0] <= 1 and len(nz) == 1:
            bw.write(0, 1)  # first symbol in 1 bit
            bw.write(nz[0], 1)
        else:
            bw.write(1, 1)  # first symbol in 8 bits
            bw.write(nz[0], 8)
        if len(nz) == 2:
            bw.write(nz[1], 8)
        if len(nz) == 1:
            return {nz[0]: (0, 0)}
        return {nz[0]: (0, 1), nz[1]: (1, 1)}
    bw.write(0, 1)  # normal code
    # code lengths for every alphabet symbol, no repeats (legal, simple)
    all_lens = [lengths.get(s, 0) for s in range(alphabet)]
    clc_freq: dict[int, int] = {}
    for ln in all_lens:
        clc_freq[ln] = clc_freq.get(ln, 0) + 1
    clc_lens = _huffman_code_lengths(clc_freq, 7)
    clc_codes = _canonical_codes(clc_lens)
    order_lens = [clc_lens.get(CODE_LENGTH_ORDER[i], 0) for i in range(19)]
    num = 19
    while num > 4 and order_lens[num - 1] == 0:
        num -= 1
    bw.write(num - 4, 4)
    for i in range(num):
        bw.write(order_lens[i], 3)
    bw.write(0, 1)  # no max_symbol cap
    for ln in all_lens:
        code, cl = clc_codes[ln]
        bw.write_code(code, cl)
    return _canonical_codes(lengths)


def _read_huffman(br: _BitReaderLSB, alphabet: int) -> _HuffDecoder:
    if br.bits(1):  # simple
        num_symbols = br.bits(1) + 1
        if br.bits(1):
            s0 = br.bits(8)
        else:
            s0 = br.bits(1)
        if num_symbols == 1:
            # validate like the two-symbol path: an out-of-alphabet
            # single symbol (e.g. distance code 40 in a 0..39 alphabet)
            # would otherwise decode to a huge prefix distance and emit
            # silently-wrong pixels instead of the contract's ValueError
            # (libwebp rejects the stream at table-build time too)
            if s0 >= alphabet:
                raise ValueError("bad vp8l simple code symbols")
            return _HuffDecoder({}, single=s0)
        s1 = br.bits(8)
        lens = [0] * alphabet
        if s0 >= alphabet or s1 >= alphabet or s0 == s1:
            raise ValueError("bad vp8l simple code symbols")
        lens[s0] = lens[s1] = 1
        return _HuffDecoder(_decoder_from_lengths(lens))
    num = br.bits(4) + 4
    clc = [0] * 19
    for i in range(num):
        clc[CODE_LENGTH_ORDER[i]] = br.bits(3)
    clc_dec = _HuffDecoder(_decoder_from_lengths(clc))
    if br.bits(1):  # max_symbol cap present
        length_nbits = 2 + 2 * br.bits(3)
        max_symbol = 2 + br.bits(length_nbits)
    else:
        max_symbol = alphabet
    lens = [0] * alphabet
    sym = 0
    prev = 8
    while sym < alphabet and max_symbol > 0:
        max_symbol -= 1
        cl = clc_dec.read(br)
        if cl < 16:
            lens[sym] = cl
            sym += 1
            if cl:
                prev = cl
        elif cl == 16:
            rep = 3 + br.bits(2)
            for _ in range(rep):
                if sym >= alphabet:
                    raise ValueError("vp8l code-length repeat overflow")
                lens[sym] = prev
                sym += 1
        else:
            rep = (3 + br.bits(3)) if cl == 17 else (11 + br.bits(7))
            sym += rep
            if sym > alphabet:
                raise ValueError("vp8l code-length repeat overflow")
    nz = [s for s, l in enumerate(lens) if l]
    if not nz:
        raise ValueError("empty vp8l huffman code")
    if len(nz) == 1:
        return _HuffDecoder({}, single=nz[0])
    return _HuffDecoder(_decoder_from_lengths(lens))


# --------------------------------------------------------------- prefix LZ


def _prefix_encode(v: int) -> tuple[int, int, int]:
    """value ≥ 1 → (prefix code, extra bits value, extra bit count)."""
    t = v - 1
    if t < 4:
        return t, 0, 0
    e = t.bit_length() - 2
    p = (t >> e) - 2
    return 2 * e + p + 2, t & ((1 << e) - 1), e


def _prefix_decode(code: int, br: _BitReaderLSB) -> int:
    if code < 4:
        return code + 1
    e = (code - 2) >> 1
    offset = (2 + (code & 1)) << e
    return offset + br.bits(e) + 1


# Close-neighbor distance mapping (spec §"Distance Mapping"): distance
# symbols 1..120 address a 2-D neighborhood of the current pixel as
# (dx, dy) offsets; the scan-line distance is dx + dy*width (clamped to
# ≥1).  Symbols beyond 120 are plain scan-line distances offset by 120.
# Transcribed from the public bitstream spec; set membership (8 left-row
# entries, 16 per row dy=1..7) is asserted by tests. Encoder and decoder
# share this constant, so roundtrips are exact independent of listing
# order; foreign-stream ordering parity is additionally verified against
# real libwebp streams in tests/test_webp_libwebp_oracle.py.
_DIST_MAP = [
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (8, 5), (7, 6), (-7, 6), (8, 6), (7, 7), (-7, 7), (8, 7),
]


# ----------------------------------------------------------------- encode


def _cache_key(argb_val: int, cache_bits: int) -> int:
    """VP8L color-cache hash: (0x1e35a7bd * argb) >> (32 - bits), u32."""
    return ((0x1E35A7BD * argb_val) & 0xFFFFFFFF) >> (32 - cache_bits)


def _write_image_data(
    bw: _BitWriterLSB,
    argb: np.ndarray,
    use_backrefs: bool,
    is_level0: bool,
    cache_bits: int = 0,
    img_w: int = 0,
    meta_bits: int = 0,
    meta_groups: np.ndarray | None = None,
) -> None:
    """Entropy-coded image data: [color-cache bit][meta bit (level0 only)
    + entropy sub-image][5 huffman codes × groups][tokens]. `argb` is the
    flat uint32 pixel array.

    With `cache_bits` > 0 a VP8L color cache is maintained: literals whose
    value sits at its hash slot are emitted as cache symbols (green code
    256+24+key). Cache decisions are made ONCE here in the token pass so
    the frequency and emission passes see identical state.

    With `meta_bits` > 0 (level0 only; requires `img_w`) the META-HUFFMAN
    feature is emitted: `meta_groups` assigns each 2^meta_bits-square
    block an entropy-code group; the group map is entropy-coded as a VP8L
    sub-image whose pixels carry (group >> 8) in red and (group & 255) in
    green, and each group gets its own 5 huffman codes. A token uses the
    group of the pixel position where it STARTS (backrefs may span
    blocks)."""
    n = len(argb)
    # ("lit", idx) | ("ref", length, dist_symbol) | ("cache", key)
    tokens: list[tuple] = []
    same = np.zeros(n, dtype=bool)
    vert = np.zeros(n, dtype=bool)
    if use_backrefs:
        same[1:] = argb[1:] == argb[:-1]
        if 0 < img_w < n:  # copy-row-above matches (values may differ)
            vert[img_w:] = argb[img_w:] == argb[:-img_w]
    if cache_bits:
        cache: list[int | None] = [None] * (1 << cache_bits)
        keys = (
            (argb.astype(np.uint64) * np.uint64(0x1E35A7BD)) & np.uint64(0xFFFFFFFF)
        ) >> np.uint64(32 - cache_bits)
    i = 0
    while i < n:
        if use_backrefs and (same[i] or vert[i]):
            j = i
            while j < n and same[j] and j - i < MAX_BACKREF_LEN:
                j += 1
            k = i
            while k < n and vert[k] and k - i < MAX_BACKREF_LEN:
                k += 1
            # _DIST_MAP close-neighbor symbols: (1,0) = 2, (0,1) = 1
            end, dsym = (j, 2) if j >= k else (k, 1)
            if end - i >= 3:
                tokens.append(("ref", end - i, dsym))
                if cache_bits:  # decoder inserts every copied pixel
                    for m in range(i, end):
                        cache[int(keys[m])] = int(argb[m])
                i = end
                continue
        if cache_bits:
            key = int(keys[i])
            v = int(argb[i])
            if cache[key] == v:
                tokens.append(("cache", key))
            else:
                tokens.append(("lit", i))
                cache[key] = v
        else:
            tokens.append(("lit", i))
        i += 1

    a = (argb >> 24) & 0xFF
    r = (argb >> 16) & 0xFF
    g = (argb >> 8) & 0xFF
    b = argb & 0xFF
    if meta_bits:
        if not (is_level0 and img_w):
            raise ValueError("meta-huffman needs a level-0 image with a width")
        ew = (img_w + (1 << meta_bits) - 1) >> meta_bits
        ngroups = int(meta_groups.max()) + 1

        def grp(pos: int) -> int:
            y, x = divmod(pos, img_w)
            return int(meta_groups[(y >> meta_bits) * ew + (x >> meta_bits)])

    else:
        ngroups = 1

        def grp(pos: int) -> int:
            return 0

    freqs = [
        {"g": {}, "r": {}, "b": {}, "a": {}, "d": {}} for _ in range(ngroups)
    ]
    pos = 0
    for t in tokens:
        fr = freqs[grp(pos)]
        if t[0] == "lit":
            i = t[1]
            for ch, arr in (("g", g), ("r", r), ("b", b), ("a", a)):
                v = int(arr[i])
                fr[ch][v] = fr[ch].get(v, 0) + 1
            pos += 1
        elif t[0] == "cache":
            sym = GREEN_ALPHABET + t[1]
            fr["g"][sym] = fr["g"].get(sym, 0) + 1
            pos += 1
        else:
            code, _, _ = _prefix_encode(t[1])
            fr["g"][256 + code] = fr["g"].get(256 + code, 0) + 1
            dcode, _, _ = _prefix_encode(t[2])
            fr["d"][dcode] = fr["d"].get(dcode, 0) + 1
            pos += t[1]
    for fr in freqs:
        for ch in ("g", "r", "b", "a", "d"):
            if not fr[ch]:
                fr[ch][0] = 1  # unused code must still be present

    if cache_bits:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
    else:
        bw.write(0, 1)  # no color cache
    if is_level0:
        if meta_bits:
            bw.write(1, 1)
            bw.write(meta_bits - 2, 3)
            eh = (len(argb) // img_w + (1 << meta_bits) - 1) >> meta_bits
            entropy_px = (
                np.uint32(0xFF000000)
                | ((meta_groups.astype(np.uint32) >> 8) << 16)
                | ((meta_groups.astype(np.uint32) & 0xFF) << 8)
            ).astype(np.uint32)
            assert len(entropy_px) == ew * eh
            _write_image_data(
                bw, entropy_px, use_backrefs=True, is_level0=False, img_w=ew
            )
        else:
            bw.write(0, 1)  # no meta-huffman
    g_alphabet = GREEN_ALPHABET + ((1 << cache_bits) if cache_bits else 0)
    sets = []
    for fr in freqs:
        sets.append(
            {
                "g": _write_huffman(
                    bw, _huffman_code_lengths(fr["g"], MAX_HUFF_LEN), g_alphabet
                ),
                "r": _write_huffman(
                    bw, _huffman_code_lengths(fr["r"], MAX_HUFF_LEN), 256
                ),
                "b": _write_huffman(
                    bw, _huffman_code_lengths(fr["b"], MAX_HUFF_LEN), 256
                ),
                "a": _write_huffman(
                    bw, _huffman_code_lengths(fr["a"], MAX_HUFF_LEN), 256
                ),
                "d": _write_huffman(
                    bw, _huffman_code_lengths(fr["d"], MAX_HUFF_LEN), DIST_ALPHABET
                ),
            }
        )

    pos = 0
    for t in tokens:
        cs = sets[grp(pos)]
        if t[0] == "lit":
            i = t[1]
            for ch, arr in (("g", g), ("r", r), ("b", b), ("a", a)):
                code, ln = cs[ch][int(arr[i])]
                bw.write_code(code, ln)
            pos += 1
        elif t[0] == "cache":
            code, ln = cs["g"][GREEN_ALPHABET + t[1]]
            bw.write_code(code, ln)
            pos += 1
        else:
            code, extra, ebits = _prefix_encode(t[1])
            c, ln = cs["g"][256 + code]
            bw.write_code(c, ln)
            if ebits:
                bw.write(extra, ebits)
            dcode, dextra, debits = _prefix_encode(t[2])
            c, ln = cs["d"][dcode]
            bw.write_code(c, ln)
            if debits:
                bw.write(dextra, debits)
            pos += t[1]


# ------------------------------------------------------- spatial predictors


def _avg2(p: int, q: int) -> int:
    """Per-channel (a+b)>>1 on packed ARGB."""
    return (((p ^ q) & 0xFEFEFEFE) >> 1) + (p & q)


def _clamp_add_sub_full(p: int, q: int, c: int) -> int:
    out = 0
    for sh in (0, 8, 16, 24):
        v = ((p >> sh) & 0xFF) + ((q >> sh) & 0xFF) - ((c >> sh) & 0xFF)
        out |= max(0, min(255, v)) << sh
    return out


def _clamp_add_sub_half(p: int, c: int) -> int:
    out = 0
    for sh in (0, 8, 16, 24):
        a = (p >> sh) & 0xFF
        b = (c >> sh) & 0xFF
        d = a - b
        # C-style truncation toward zero (libwebp AddSubtractComponentHalf)
        half = d // 2 if d >= 0 else -((-d) // 2)
        out |= max(0, min(255, a + half)) << sh
    return out


def _select(t: int, l: int, tl: int) -> int:
    pa = pb = 0
    for sh in (0, 8, 16, 24):
        tc = (t >> sh) & 0xFF
        lc = (l >> sh) & 0xFF
        cc = (tl >> sh) & 0xFF
        pa += abs(lc - cc)  # |p - top| per channel
        pb += abs(tc - cc)  # |p - left|
    return t if pa <= pb else l


def _predict(mode: int, l: int, t: int, tr: int, tl: int) -> int:
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return l
    if mode == 2:
        return t
    if mode == 3:
        return tr
    if mode == 4:
        return tl
    if mode == 5:
        return _avg2(_avg2(l, tr), t)
    if mode == 6:
        return _avg2(l, tl)
    if mode == 7:
        return _avg2(l, t)
    if mode == 8:
        return _avg2(tl, t)
    if mode == 9:
        return _avg2(t, tr)
    if mode == 10:
        return _avg2(_avg2(l, tl), _avg2(t, tr))
    if mode == 11:
        return _select(t, l, tl)
    if mode == 12:
        return _clamp_add_sub_full(l, t, tl)
    if mode == 13:
        return _clamp_add_sub_half(_avg2(l, t), tl)
    raise ValueError(f"bad vp8l predictor mode {mode}")


def _predictor_walk(
    argb: np.ndarray, w: int, h: int, modes: np.ndarray, size_bits: int,
    inverse: bool,
) -> np.ndarray:
    """Apply (encode) or invert (decode) the predictor transform.

    Sequential by construction — the predictor reads RECONSTRUCTED
    neighbors (same row left, previous row), exactly like PNG's Paeth.
    Border rules (libwebp): (0,0) predicts opaque black, row 0 predicts
    L, column 0 predicts T; the top-right neighbor of a row's last pixel
    wraps to the first pixel of the current row (flat-index arithmetic).
    """
    src = [int(v) for v in argb]
    out = [0] * len(src)
    bw_blocks = (w + (1 << size_bits) - 1) >> size_bits
    # `ref` = the reconstructed image both sides agree on: for encode the
    # input IS reconstructed (lossless); for decode we build it as we go
    ref = src if not inverse else out
    for i in range(len(src)):
        y, x = divmod(i, w)
        if x == 0 and y == 0:
            pred = 0xFF000000
        elif y == 0:
            pred = ref[i - 1]
        elif x == 0:
            pred = ref[i - w]
        else:
            mode = int(modes[(y >> size_bits) * bw_blocks + (x >> size_bits)])
            pred = _predict(mode, ref[i - 1], ref[i - w], ref[i - w + 1], ref[i - w - 1])
        v = 0
        for sh in (0, 8, 16, 24):
            s = (src[i] >> sh) & 0xFF
            p = (pred >> sh) & 0xFF
            v |= (((s + p) if inverse else (s - p)) & 0xFF) << sh
        out[i] = v
    return np.array(out, dtype=np.uint32)


def _choose_predictor_modes(
    argb: np.ndarray, w: int, h: int, size_bits: int
) -> np.ndarray:
    """Per-block mode selection by wrap-aware residual magnitude over a
    candidate subset; approximation only affects compression, never
    correctness (residuals are computed exactly afterwards)."""
    flat = argb.astype(np.int64)
    L = np.roll(flat, 1)
    T = np.roll(flat, w)
    TL = np.roll(flat, w + 1)
    cand = {1: L, 2: T, 7: None, 12: None}

    def chans(v):
        return [(v >> sh) & 0xFF for sh in (0, 8, 16)]

    def cost_of(pred):
        c = np.zeros(len(flat), dtype=np.int64)
        for pc, oc in zip(chans(pred), chans(flat)):
            d = np.abs(oc - pc)
            c += np.minimum(d, 256 - d)
        return c

    avg = (((L ^ T) & 0xFEFEFEFE) >> 1) + (L & T)  # per-channel (L+T)>>1
    full = np.zeros_like(flat)
    for sh in (0, 8, 16):
        v = ((L >> sh) & 0xFF) + ((T >> sh) & 0xFF) - ((TL >> sh) & 0xFF)
        full |= np.clip(v, 0, 255) << sh
    cand[7] = avg
    cand[12] = full
    costs = {m: cost_of(p) for m, p in cand.items()}
    nb_x = (w + (1 << size_bits) - 1) >> size_bits
    nb_y = (h + (1 << size_bits) - 1) >> size_bits
    modes = np.zeros(nb_x * nb_y, dtype=np.int64)
    ys, xs = np.divmod(np.arange(len(flat)), w)
    block = (ys >> size_bits) * nb_x + (xs >> size_bits)
    per_block = {m: np.bincount(block, weights=c, minlength=nb_x * nb_y) for m, c in costs.items()}
    keys = list(per_block)
    stacked = np.stack([per_block[m] for m in keys])
    modes = np.array(keys)[np.argmin(stacked, axis=0)]
    return modes


# ------------------------------------------------------- color transform


def _signed8(x: np.ndarray) -> np.ndarray:
    """Reinterpret a 0..255 channel as int8 (VP8L ColorTransformDelta)."""
    return x.astype(np.uint8).astype(np.int8).astype(np.int32)


def _color_transform_apply(
    argb: np.ndarray, w: int, h: int, elems: np.ndarray, size_bits: int,
    inverse: bool,
) -> np.ndarray:
    """Apply (encode) or invert (decode) the VP8L cross-channel color
    transform. Element pixel layout (spec): blue byte = green_to_red,
    green byte = green_to_blue, red byte = red_to_blue, all int8.
    ColorTransformDelta(t, c) = (int8)t * (int8)c >> 5 (arithmetic).

    Fully vectorized — unlike the predictor there is no sequential
    dependency: forward subtracts deltas of ORIGINAL red, inverse
    restores red first and then uses the RESTORED red for blue (libwebp
    VP8LTransformColor / VP8LTransformColorInverse semantics)."""
    bw_blocks = (w + (1 << size_bits) - 1) >> size_bits
    ys, xs = np.divmod(np.arange(len(argb)), w)
    bidx = (ys >> size_bits) * bw_blocks + (xs >> size_bits)
    e = elems[bidx]
    g2r = _signed8(e & 0xFF)
    g2b = _signed8((e >> 8) & 0xFF)
    r2b = _signed8((e >> 16) & 0xFF)
    r = ((argb >> 16) & 0xFF).astype(np.int32)
    g = (argb >> 8) & 0xFF
    b = (argb & 0xFF).astype(np.int32)
    gs = _signed8(g)
    if not inverse:
        new_r = (r - ((g2r * gs) >> 5)) & 0xFF
        new_b = (b - ((g2b * gs) >> 5) - ((r2b * _signed8(r)) >> 5)) & 0xFF
    else:
        new_r = (r + ((g2r * gs) >> 5)) & 0xFF
        new_b = (b + ((g2b * gs) >> 5) + ((r2b * _signed8(new_r)) >> 5)) & 0xFF
    return (
        (argb & np.uint32(0xFF00FF00))
        | (new_r.astype(np.uint32) << 16)
        | new_b.astype(np.uint32)
    ).astype(np.uint32)


_COLOR_CANDS = list(range(-128, 128, 8))


def _choose_color_elements(
    argb: np.ndarray, w: int, h: int, size_bits: int
) -> np.ndarray:
    """Transform elements by candidate search: each multiplier in a
    step-8 int8 grid is scored by the GLOBAL Shannon entropy of the
    transformed channel's residual histogram, and one winner is applied
    to every block. Two deliberate differences from a naive fit: (a) a
    least-squares fit in signed space misses mod-256-linear relationships
    (e.g. r = g/2 is V-shaped in int8 but exactly linear mod 256, with a
    cheap bimodal residual) — entropy scoring sees through the wrap; and
    (b) this encoder has ONE shared huffman code per channel (no
    meta-huffman), so per-block multiplier diversity would widen the
    global histogram and cost more than it saves — libwebp only profits
    from per-block elements because it pairs them with per-block entropy
    codes. The per-block element image stays in the format (the decoder
    handles arbitrary block grids); the encoder just fills it uniformly.
    Approximation only affects compression — the forward transform is
    applied exactly with the chosen elements afterwards."""
    bw_blocks = (w + (1 << size_bits) - 1) >> size_bits
    bh_blocks = (h + (1 << size_bits) - 1) >> size_bits
    nblocks = bw_blocks * bh_blocks
    r = ((argb >> 16) & 0xFF).astype(np.int32)
    b = (argb & 0xFF).astype(np.int32)
    gs = _signed8((argb >> 8) & 0xFF)
    rs = _signed8(r)

    def cost_of(t: int, target_u: np.ndarray, src_s: np.ndarray) -> float:
        resid = (target_u - ((t * src_s) >> 5)) & 0xFF
        n = np.bincount(resid, minlength=256).astype(np.float64)
        nz = n[n > 0]
        return -(nz * np.log2(nz)).sum()  # = N·H(resid) − N·log2 N

    def pick(target_u: np.ndarray, src_s: np.ndarray) -> np.ndarray:
        best_cost, best_t = None, 0
        for t in _COLOR_CANDS:
            cost = cost_of(t, target_u, src_s)
            if best_cost is None or cost < best_cost:
                best_cost, best_t = cost, t
        # fine search around the grid winner (non-multiple-of-8 slopes)
        for t in range(max(-128, best_t - 7), min(128, best_t + 8)):
            cost = cost_of(t, target_u, src_s)
            if cost < best_cost:
                best_cost, best_t = cost, t
        return np.full(nblocks, best_t, dtype=np.int64)

    g2r = pick(r, gs)
    g2b = pick(b, gs)
    # red-to-blue fits the blue residual AFTER green-to-blue, against the
    # ORIGINAL signed red (forward-transform semantics)
    b1 = (b - ((g2b[0] * gs) >> 5)) & 0xFF
    r2b = pick(b1, rs)
    return (
        np.uint32(0xFF000000)
        | (r2b.astype(np.uint32) & 0xFF) << 16
        | (g2b.astype(np.uint32) & 0xFF) << 8
        | (g2r.astype(np.uint32) & 0xFF)
    ).astype(np.uint32)


# --------------------------------------------------------- color indexing


def _palette_width_bits(pal_size: int) -> int:
    """VP8L pixel bundling: indices per byte grows as the palette
    shrinks (≤2 → 8/byte, ≤4 → 4/byte, ≤16 → 2/byte, else 1/byte)."""
    if pal_size <= 2:
        return 3
    if pal_size <= 4:
        return 2
    if pal_size <= 16:
        return 1
    return 0


def _palette_pack(indices: np.ndarray, w: int, h: int, width_bits: int) -> np.ndarray:
    """Bundle per-pixel palette indices into the green channel of a
    reduced-width image (row-wise; rows pad with zero indices)."""
    pack = 1 << width_bits
    bits = 8 >> width_bits
    packed_w = (w + pack - 1) // pack
    padded = np.zeros((h, packed_w * pack), dtype=np.uint32)
    padded[:, :w] = indices.reshape(h, w)
    packed = np.zeros((h, packed_w), dtype=np.uint32)
    for s in range(pack):
        packed |= padded[:, s::pack] << (s * bits)
    return (np.uint32(0xFF000000) | (packed.reshape(-1) << 8)).astype(np.uint32)


def _palette_unpack(
    argb: np.ndarray, full_w: int, h: int, width_bits: int, palette: np.ndarray
) -> np.ndarray:
    """Inverse of the color-indexing transform: split bundled green bytes
    back into indices and map through the palette."""
    pack = 1 << width_bits
    bits = 8 >> width_bits
    packed_w = (full_w + pack - 1) // pack
    rows = ((argb >> 8) & 0xFF).reshape(h, packed_w)
    xs = np.arange(full_w)
    idx = (rows[:, xs >> width_bits] >> ((xs & (pack - 1)) * bits)) & ((1 << bits) - 1)
    if (idx >= len(palette)).any():
        raise ValueError("vp8l palette index out of range")
    return palette[idx.reshape(-1)].astype(np.uint32)


def encode_webp(
    pixels: np.ndarray,
    use_backrefs: bool = True,
    predictor: bool = False,
    subtract_green: bool = False,
    color_transform: bool = False,
    palette: bool = False,
    cache_bits: int = 0,
    meta: bool = False,
) -> bytes:
    """RGB8 HxWx3 → lossless WebP (VP8L, subset profile above).

    Transform flags (all default off — the transform-free profile is the
    fast path; each transform demonstrates spec parity and cuts sizes on
    its target content):

    * `predictor` — spatial-predictor transform (per-16x16-block mode
      image, all-14-mode decoder support); wins on gradients/photos.
    * `subtract_green` — subtract-green transform.
    * `color_transform` — per-block cross-channel transform (green→red,
      green→blue, red→blue int8 multipliers chosen by residual-entropy
      search); wins on channel-correlated content.
    * `palette` — color-indexing transform with pixel bundling (≤16
      colors pack 2-8 indices per byte); exclusive with the three
      transforms above (libwebp practice); raises ValueError on images
      with more than 256 distinct colors.
    * `cache_bits` (0..11) — VP8L color cache: recently-seen colors are
      emitted as single hash-indexed green symbols.
    * `meta` — meta-huffman: 16x16 blocks are split into two entropy-code
      groups by per-block distinct-color count (median threshold), the
      group map is entropy-coded as a sub-image, and each group gets its
      own five huffman codes; wins on images mixing flat and busy
      regions. Applied to the final (post-transform) pixels."""
    h, w = pixels.shape[:2]
    if h < 1 or w < 1 or h > 1 << 14 or w > 1 << 14:
        raise ValueError("vp8l dims out of range")
    if not 0 <= cache_bits <= 11:
        raise ValueError("vp8l cache_bits out of range (0..11)")
    if palette and (predictor or subtract_green or color_transform):
        raise ValueError("vp8l palette transform is exclusive")
    px = pixels.astype(np.uint32)
    argb = (
        (np.uint32(255) << 24)
        | (px[..., 0] << 16)
        | (px[..., 1] << 8)
        | px[..., 2]
    ).reshape(-1)

    bw = _BitWriterLSB()
    SIZE_BITS = 4  # 16x16 predictor blocks
    if palette:
        colors, indices = np.unique(argb, return_inverse=True)
        if len(colors) > 256:
            raise ValueError("vp8l palette: more than 256 distinct colors")
        bw.write(1, 1)  # a transform follows
        bw.write(3, 2)  # type 3: color indexing
        bw.write(len(colors) - 1, 8)
        # palette stored with component-wise subtraction coding
        prev = np.roll(colors, 1)
        prev[0] = 0
        diff = np.zeros_like(colors)
        for sh in (0, 8, 16, 24):
            diff |= ((((colors >> sh) - (prev >> sh)) & 0xFF) << sh).astype(np.uint32)
        _write_image_data(bw, diff, use_backrefs=False, is_level0=False)
        width_bits = _palette_width_bits(len(colors))
        argb = _palette_pack(indices.astype(np.uint32), w, h, width_bits)
        pack = 1 << width_bits
        w_eff = (w + pack - 1) // pack  # bundling reduces the working width
    else:
        w_eff = w
    if predictor:
        modes = _choose_predictor_modes(argb, w, h, SIZE_BITS)
        argb = _predictor_walk(argb, w, h, modes, SIZE_BITS, inverse=False)
        bw.write(1, 1)  # a transform follows
        bw.write(0, 2)  # type 0: predictor
        bw.write(SIZE_BITS - 2, 3)
        mode_argb = (0xFF000000 | (modes.astype(np.uint32) << 8)).astype(np.uint32)
        _write_image_data(bw, mode_argb, use_backrefs=True, is_level0=False)
    if subtract_green:
        g = (argb >> 8) & 0xFF
        r = (((argb >> 16) & 0xFF) - g) & 0xFF
        b = ((argb & 0xFF) - g) & 0xFF
        argb = (argb & 0xFF00FF00) | (r << 16) | b
        bw.write(1, 1)
        bw.write(2, 2)  # type 2: subtract green (no payload)
    if color_transform:
        elems = _choose_color_elements(argb, w, h, SIZE_BITS)
        argb = _color_transform_apply(argb, w, h, elems, SIZE_BITS, inverse=False)
        bw.write(1, 1)
        bw.write(1, 2)  # type 1: color transform
        bw.write(SIZE_BITS - 2, 3)
        _write_image_data(bw, elems, use_backrefs=True, is_level0=False)
    bw.write(0, 1)  # no more transforms
    meta_bits, meta_groups = 0, None
    if meta:
        meta_bits = 4  # 16x16 entropy blocks
        ew = (w_eff + 15) >> 4
        eh = (h + 15) >> 4
        ys, xs = np.divmod(np.arange(len(argb)), w_eff)
        bidx = ((ys >> 4) * ew + (xs >> 4)).astype(np.int64)
        # distinct colors per block via one lexsort (no per-block loops)
        order = np.lexsort((argb, bidx))
        sb, sv = bidx[order], argb[order]
        first = np.ones(len(sv), dtype=bool)
        first[1:] = (sv[1:] != sv[:-1]) | (sb[1:] != sb[:-1])
        counts = np.bincount(sb[first], minlength=ew * eh)
        sums = np.bincount(bidx, weights=(argb >> 8) & 0xFF, minlength=ew * eh)
        means = sums / np.maximum(np.bincount(bidx, minlength=ew * eh), 1)
        chans = np.stack(
            [(argb >> s) & 0xFF for s in (8, 16, 0, 24)]
        ).astype(np.int64)

        def est_bits(groups: np.ndarray) -> float:
            # Shannon cost of the 4 raw channels under per-group codes
            # (backref/cache effects ignored — a split ranking heuristic)
            pg = groups[bidx]
            total = 0.0
            for gi in range(int(groups.max()) + 1):
                sel = chans[:, pg == gi]
                for ch in range(4):
                    hist = np.bincount(sel[ch], minlength=256)
                    nz = hist[hist > 0].astype(np.float64)
                    total += nz.sum() * np.log2(nz.sum()) - (nz * np.log2(nz)).sum()
            return total

        # two candidate block splits; pick by estimated entropy cost
        cands = [
            (counts > np.median(counts)).astype(np.int64),
            (means > np.median(means)).astype(np.int64),
        ]
        cands = [c for c in cands if c.max() > 0] or [
            np.zeros(ew * eh, dtype=np.int64)
        ]
        meta_groups = min(cands, key=est_bits)
    _write_image_data(
        bw,
        argb,
        use_backrefs,
        is_level0=True,
        cache_bits=cache_bits,
        img_w=w_eff,
        meta_bits=meta_bits,
        meta_groups=meta_groups,
    )

    hdr = _BitWriterLSB()
    hdr.write(w - 1, 14)
    hdr.write(h - 1, 14)
    hdr.write(0, 1)  # alpha hint
    hdr.write(0, 3)  # version
    payload = b"\x2f" + hdr.flush() + bw.flush()
    # NOTE: header+data share one bit budget in real VP8L; we flush the
    # 32-bit header exactly (14+14+1+3 = 32 bits, byte-aligned) so the
    # concatenation is bit-exact.
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    riff = b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
    return riff


# ----------------------------------------------------------------- decode


def _read_image_data(
    br: _BitReaderLSB, w: int, h: int, is_level0: bool
) -> np.ndarray:
    """Entropy-decode one image stream (main image or transform
    sub-image) to a flat uint32 ARGB array."""
    cache_bits = 0
    if br.bits(1):
        cache_bits = br.bits(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("bad vp8l color-cache size")
    meta = None
    ngroups = 1
    if is_level0 and br.bits(1):
        # meta-huffman: an entropy sub-image assigns each 2^mbits block an
        # entropy-code group; pixel (red<<8)|green is the group index
        mbits = br.bits(3) + 2
        ew = (w + (1 << mbits) - 1) >> mbits
        eh = (h + (1 << mbits) - 1) >> mbits
        entropy = _read_image_data(br, ew, eh, is_level0=False)
        groups = ((entropy >> 8) & 0xFFFF).astype(np.int64)
        ngroups = int(groups.max()) + 1
        if ngroups > ew * eh:
            raise ValueError("bad vp8l meta-huffman group count")
        meta = (mbits, ew, groups)
    g_alphabet = GREEN_ALPHABET + ((1 << cache_bits) if cache_bits else 0)
    sets = [
        (
            _read_huffman(br, g_alphabet),
            _read_huffman(br, 256),
            _read_huffman(br, 256),
            _read_huffman(br, 256),
            _read_huffman(br, DIST_ALPHABET),
        )
        for _ in range(ngroups)
    ]
    gdec, rdec, bdec, adec, ddec = sets[0]

    n = w * h
    argb = np.zeros(n, dtype=np.uint32)
    # decoder cache starts zeroed (spec); every decoded pixel is inserted
    cache = [0] * (1 << cache_bits) if cache_bits else None
    pos = 0
    while pos < n:
        if meta is not None:
            mbits, ew, groups = meta
            y, x = divmod(pos, w)
            gdec, rdec, bdec, adec, ddec = sets[
                groups[(y >> mbits) * ew + (x >> mbits)]
            ]
        gs = gdec.read(br)
        if gs < 256:
            rv = rdec.read(br)
            bv = bdec.read(br)
            av = adec.read(br)
            px = (av << 24) | (rv << 16) | (gs << 8) | bv
            argb[pos] = px
            if cache_bits:
                cache[_cache_key(px, cache_bits)] = px
            pos += 1
        elif gs < 256 + 24:
            length = _prefix_decode(gs - 256, br)
            dval = _prefix_decode(ddec.read(br), br)
            if dval <= 120:
                dx, dy = _DIST_MAP[dval - 1]
                dist = dx + dy * w
                if dist < 1:
                    dist = 1  # spec clamp
            else:
                dist = dval - 120
            if dist > pos or pos + length > n:
                raise ValueError("vp8l backref out of range")
            for k in range(length):  # may self-overlap (run semantics)
                px = int(argb[pos + k - dist])
                argb[pos + k] = px
                if cache_bits:
                    cache[_cache_key(px, cache_bits)] = px
            pos += length
        else:
            if not cache_bits:
                raise ValueError("vp8l color-cache symbol without a cache")
            argb[pos] = cache[gs - GREEN_ALPHABET]
            pos += 1
    return argb


def decode_webp(data: bytes) -> np.ndarray:
    """Lossless WebP (VP8L subset) → RGB8 HxWx3. Malformed input raises
    ValueError; features outside the subset raise NotImplementedError."""
    if len(data) < 20 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP byte stream")
    pos = 12
    vp8l = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (ln,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + ln]
        if len(body) < ln:
            raise ValueError("truncated WebP chunk")
        if tag == b"VP8L":
            vp8l = body
            break
        if tag == b"VP8 ":
            # lossy still image: a single VP8 keyframe (RFC 6386),
            # decoded by the from-scratch keyframe decoder in vp8.py
            # (bit-exact with libwebp at the YUV plane level).
            from .vp8 import decode_vp8, yuv_to_rgb

            return yuv_to_rgb(*decode_vp8(body))
        if tag == b"VP8X":
            raise NotImplementedError(
                "webp subtype 'VP8X' (extended: animation/alpha/EXIF container) not supported"
            )
        pos += 8 + ln + (ln & 1)
    if vp8l is None:
        raise ValueError("WebP without VP8L chunk")
    if vp8l[0:1] != b"\x2f":
        raise ValueError("bad VP8L signature byte")
    br = _BitReaderLSB(vp8l[1:])
    w = br.bits(14) + 1
    h = br.bits(14) + 1
    # sanity cap BEFORE decoding (same idiom as vp8.py's 64 MP cap, sized
    # for this decoder's per-pixel Python walk): a tiny hostile header
    # claiming up to 16383×16383 (268 MP) would otherwise stall an
    # executor for the whole decode — decode_image's metadata-dims check
    # only runs AFTER the decode returns, so it can never catch this
    if w * h > 1 << 22:
        raise ValueError(f"vp8l: implausible dimensions {w}x{h} (> 4 MP cap)")
    br.bits(1)  # alpha hint
    if br.bits(3) != 0:
        raise ValueError("unknown VP8L version")
    # transforms (applied inversely, in reverse read order, after decode).
    # cur_w tracks the working width: a color-indexing transform bundles
    # pixels, so everything read AFTER it (incl. the main image) uses the
    # reduced width; its inverse restores the full width.
    transforms: list[tuple] = []
    cur_w = w
    seen_types: set[int] = set()
    while br.bits(1):
        ttype = br.bits(2)
        if ttype in seen_types:
            raise ValueError("vp8l transform repeated")
        seen_types.add(ttype)
        if ttype == 0:  # predictor
            size_bits = br.bits(3) + 2
            bw_blocks = (cur_w + (1 << size_bits) - 1) >> size_bits
            bh_blocks = (h + (1 << size_bits) - 1) >> size_bits
            mode_argb = _read_image_data(br, bw_blocks, bh_blocks, is_level0=False)
            modes = (mode_argb >> 8) & 0xFF
            if (modes > 13).any():
                raise ValueError("bad vp8l predictor mode image")
            transforms.append(("predictor", cur_w, size_bits, modes))
        elif ttype == 1:  # cross-channel color transform
            size_bits = br.bits(3) + 2
            bw_blocks = (cur_w + (1 << size_bits) - 1) >> size_bits
            bh_blocks = (h + (1 << size_bits) - 1) >> size_bits
            elems = _read_image_data(br, bw_blocks, bh_blocks, is_level0=False)
            transforms.append(("color_transform", cur_w, size_bits, elems))
        elif ttype == 2:  # subtract green (no payload)
            transforms.append(("subtract_green",))
        else:  # color indexing (palette)
            pal_size = br.bits(8) + 1
            diff = _read_image_data(br, pal_size, 1, is_level0=False)
            pal = np.zeros(pal_size, dtype=np.uint32)
            prev = 0
            for i in range(pal_size):  # component-wise cumulative sum
                cur = 0
                for sh in (0, 8, 16, 24):
                    cur |= (((int(diff[i]) >> sh) + (prev >> sh)) & 0xFF) << sh
                pal[i] = cur
                prev = cur
            width_bits = _palette_width_bits(pal_size)
            transforms.append(("color_indexing", cur_w, width_bits, pal))
            pack = 1 << width_bits
            cur_w = (cur_w + pack - 1) // pack
    argb = _read_image_data(br, cur_w, h, is_level0=True)
    for t in reversed(transforms):
        if t[0] == "subtract_green":
            g = (argb >> 8) & 0xFF
            r = (((argb >> 16) & 0xFF) + g) & 0xFF
            b = ((argb & 0xFF) + g) & 0xFF
            argb = (argb & 0xFF00FF00) | (r << 16) | b
        elif t[0] == "color_transform":
            _, t_w, size_bits, elems = t
            argb = _color_transform_apply(argb, t_w, h, elems, size_bits, inverse=True)
        elif t[0] == "color_indexing":
            _, t_w, width_bits, pal = t
            argb = _palette_unpack(argb, t_w, h, width_bits, pal)
        else:
            _, t_w, size_bits, modes = t
            argb = _predictor_walk(argb, t_w, h, modes, size_bits, inverse=True)
    n = w * h
    out = np.empty((n, 3), dtype=np.uint8)
    out[:, 0] = (argb >> 16) & 0xFF
    out[:, 1] = (argb >> 8) & 0xFF
    out[:, 2] = argb & 0xFF
    return out.reshape(h, w, 3)
