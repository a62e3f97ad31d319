"""WebP lossless (VP8L) subset codec — from scratch, public bitstream spec.

Replaces the last stubbed image format (round-5 VERDICT #5, option
"implement VP8L-lossless"). Same playbook as the PNG/JPEG codecs: numpy
batch math + an explicit bit-level entropy coder, no image libraries.

Profile implemented (a strict, documented VP8L subset):

* container: RIFF / WEBP / VP8L chunk (lossy `VP8 ` and extended `VP8X`
  raise NotImplementedError — VP8 arithmetic coding is out of scope);
* encoder: per-channel canonical Huffman codes (DEFLATE bit conventions:
  LSB-first packing, code bits MSB-first) + optional LZ77 run backrefs
  (distance 1, emitted as prefix value 121 = 1+120 so the close-neighbor
  plane mapping is never needed) + two optional transforms: the
  SPATIAL-PREDICTOR transform (per-16x16-block mode image, entropy-coded
  as a VP8L sub-image; modes chosen per block by wrap-aware residual
  magnitude) and SUBTRACT-GREEN;
* decoder: everything the encoder emits — including all 14 predictor
  modes with libwebp border semantics (top-right wraps to the row start
  via flat indexing) and inverse transforms applied in reverse read
  order — plus simple 1/2-symbol codes, code-length repeats (16/17/18),
  the max_symbol cap, and general LZ77 backrefs with distance prefix
  values > 120. Color transform / color indexing / color cache /
  meta-huffman raise NotImplementedError with the subtype named.

Validation: exhaustive encode→decode roundtrips (lossless: bit-equal
pixels) over both literal and RLE paths plus corrupt-stream fuzzing —
libwebp is not present in this environment, so cross-validation against
a reference decoder is documented as out of scope.

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
    f = dict(live)
    while True:
        # standard heap-free huffman via sorted merge
        import heapq

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


# ----------------------------------------------------------------- encode


def _write_image_data(
    bw: _BitWriterLSB, argb: np.ndarray, use_backrefs: bool, is_level0: bool
) -> None:
    """Entropy-coded image data: [color-cache bit][meta bit (level0 only)]
    [5 huffman codes][tokens]. `argb` is the flat uint32 pixel array."""
    n = len(argb)
    tokens: list[tuple] = []  # ("lit", idx) | ("ref", length)
    if use_backrefs:
        same = np.zeros(n, dtype=bool)
        same[1:] = argb[1:] == argb[:-1]
        i = 0
        while i < n:
            if same[i]:
                j = i
                while j < n and same[j] and j - i < MAX_BACKREF_LEN:
                    j += 1
                if j - i >= 3:
                    tokens.append(("ref", j - i))
                    i = j
                    continue
            tokens.append(("lit", i))
            i += 1
    else:
        tokens = [("lit", i) for i in range(n)]

    a = (argb >> 24) & 0xFF
    r = (argb >> 16) & 0xFF
    g = (argb >> 8) & 0xFF
    b = argb & 0xFF
    gfreq: dict[int, int] = {}
    rfreq: dict[int, int] = {}
    bfreq: dict[int, int] = {}
    afreq: dict[int, int] = {}
    dfreq: dict[int, int] = {}
    for t in tokens:
        if t[0] == "lit":
            i = t[1]
            gfreq[int(g[i])] = gfreq.get(int(g[i]), 0) + 1
            rfreq[int(r[i])] = rfreq.get(int(r[i]), 0) + 1
            bfreq[int(b[i])] = bfreq.get(int(b[i]), 0) + 1
            afreq[int(a[i])] = afreq.get(int(a[i]), 0) + 1
        else:
            code, _, _ = _prefix_encode(t[1])
            gfreq[256 + code] = gfreq.get(256 + code, 0) + 1
            dcode, _, _ = _prefix_encode(1 + 120)  # distance 1, mapped past
            dfreq[dcode] = dfreq.get(dcode, 0) + 1  # the plane-code range
    for fr in (rfreq, bfreq, afreq, dfreq):
        if not fr:
            fr[0] = 1  # unused code must still be present in the stream

    bw.write(0, 1)  # no color cache
    if is_level0:
        bw.write(0, 1)  # no meta-huffman
    gcodes = _write_huffman(bw, _huffman_code_lengths(gfreq, MAX_HUFF_LEN), GREEN_ALPHABET)
    rcodes = _write_huffman(bw, _huffman_code_lengths(rfreq, MAX_HUFF_LEN), 256)
    bcodes = _write_huffman(bw, _huffman_code_lengths(bfreq, MAX_HUFF_LEN), 256)
    acodes = _write_huffman(bw, _huffman_code_lengths(afreq, MAX_HUFF_LEN), 256)
    dcodes = _write_huffman(bw, _huffman_code_lengths(dfreq, MAX_HUFF_LEN), DIST_ALPHABET)

    for t in tokens:
        if t[0] == "lit":
            i = t[1]
            for codes, val in (
                (gcodes, int(g[i])),
                (rcodes, int(r[i])),
                (bcodes, int(b[i])),
                (acodes, int(a[i])),
            ):
                code, ln = codes[val]
                bw.write_code(code, ln)
        else:
            code, extra, ebits = _prefix_encode(t[1])
            c, ln = gcodes[256 + code]
            bw.write_code(c, ln)
            if ebits:
                bw.write(extra, ebits)
            dcode, dextra, debits = _prefix_encode(121)
            c, ln = dcodes[dcode]
            bw.write_code(c, ln)
            if debits:
                bw.write(dextra, debits)


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


def encode_webp(
    pixels: np.ndarray,
    use_backrefs: bool = True,
    predictor: bool = False,
    subtract_green: bool = False,
) -> bytes:
    """RGB8 HxWx3 → lossless WebP (VP8L, subset profile above).

    `predictor` enables the spatial-predictor transform (per-16x16-block
    mode image, all-14-mode decoder support); `subtract_green` the
    subtract-green transform. Both default off — the transform-free
    profile is the fast path; the transforms demonstrate spec parity and
    cut gradient-image sizes substantially."""
    h, w = pixels.shape[:2]
    if h < 1 or w < 1 or h > 1 << 14 or w > 1 << 14:
        raise ValueError("vp8l dims out of range")
    px = pixels.astype(np.uint32)
    argb = (
        (np.uint32(255) << 24)
        | (px[..., 0] << 16)
        | (px[..., 1] << 8)
        | px[..., 2]
    ).reshape(-1)

    bw = _BitWriterLSB()
    SIZE_BITS = 4  # 16x16 predictor blocks
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
    bw.write(0, 1)  # no more transforms
    _write_image_data(bw, argb, use_backrefs, is_level0=True)

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
    if br.bits(1):
        raise NotImplementedError("VP8L color cache not in subset")
    if is_level0 and br.bits(1):
        raise NotImplementedError("VP8L meta-huffman not in subset")
    gdec = _read_huffman(br, GREEN_ALPHABET)
    rdec = _read_huffman(br, 256)
    bdec = _read_huffman(br, 256)
    adec = _read_huffman(br, 256)
    ddec = _read_huffman(br, DIST_ALPHABET)

    n = w * h
    argb = np.zeros(n, dtype=np.uint32)
    pos = 0
    while pos < n:
        gs = gdec.read(br)
        if gs < 256:
            rv = rdec.read(br)
            bv = bdec.read(br)
            av = adec.read(br)
            argb[pos] = (av << 24) | (rv << 16) | (gs << 8) | bv
            pos += 1
        elif gs < 256 + 24:
            length = _prefix_decode(gs - 256, br)
            dval = _prefix_decode(ddec.read(br), br)
            if dval <= 120:
                raise NotImplementedError(
                    "VP8L close-neighbor distance mapping not in subset"
                )
            dist = dval - 120
            if dist > pos or pos + length > n:
                raise ValueError("vp8l backref out of range")
            for k in range(length):  # may self-overlap (run semantics)
                argb[pos + k] = argb[pos + k - dist]
            pos += length
        else:
            raise ValueError("vp8l color-cache symbol without a cache")
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
        if tag in (b"VP8 ", b"VP8X"):
            raise NotImplementedError(
                f"webp subtype {tag.decode().strip()!r} (lossy VP8 / extended) not in the VP8L subset"
            )
        pos += 8 + ln + (ln & 1)
    if vp8l is None:
        raise ValueError("WebP without VP8L chunk")
    if vp8l[0:1] != b"\x2f":
        raise ValueError("bad VP8L signature byte")
    br = _BitReaderLSB(vp8l[1:])
    w = br.bits(14) + 1
    h = br.bits(14) + 1
    br.bits(1)  # alpha hint
    if br.bits(3) != 0:
        raise ValueError("unknown VP8L version")
    # transforms (applied inversely, in reverse read order, after decode)
    transforms: list[tuple] = []
    while br.bits(1):
        ttype = br.bits(2)
        if ttype == 0:  # predictor
            size_bits = br.bits(3) + 2
            bw_blocks = (w + (1 << size_bits) - 1) >> size_bits
            bh_blocks = (h + (1 << size_bits) - 1) >> size_bits
            mode_argb = _read_image_data(br, bw_blocks, bh_blocks, is_level0=False)
            modes = (mode_argb >> 8) & 0xFF
            if (modes > 13).any():
                raise ValueError("bad vp8l predictor mode image")
            transforms.append(("predictor", size_bits, modes))
        elif ttype == 2:  # subtract green (no payload)
            transforms.append(("subtract_green",))
        else:
            name = {1: "color transform", 3: "color indexing"}[ttype]
            raise NotImplementedError(f"VP8L {name} transform not in subset")
    argb = _read_image_data(br, w, h, is_level0=True)
    for t in reversed(transforms):
        if t[0] == "subtract_green":
            g = (argb >> 8) & 0xFF
            r = (((argb >> 16) & 0xFF) + g) & 0xFF
            b = ((argb & 0xFF) + g) & 0xFF
            argb = (argb & 0xFF00FF00) | (r << 16) | b
        else:
            _, size_bits, modes = t
            argb = _predictor_walk(argb, w, h, modes, size_bits, inverse=True)
    n = w * h
    out = np.empty((n, 3), dtype=np.uint8)
    out[:, 0] = (argb >> 16) & 0xFF
    out[:, 1] = (argb >> 8) & 0xFF
    out[:, 2] = argb & 0xFF
    return out.reshape(h, w, 3)
