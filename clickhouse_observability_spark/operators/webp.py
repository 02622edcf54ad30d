"""WebP lossless (VP8L) codec — pure stdlib.

Decoder: the full public VP8L bitstream (RIFF/WEBP container, VP8L
chunk): LSB-first bit reading, simple + normal prefix codes (with the
DEFLATE-style code-length code, repeats and the max_symbol short
form), color cache, meta prefix groups (huffman image), LZ77 with the
120-entry 2D distance neighborhood, and all four inverse transforms —
PREDICTOR (14 modes), COLOR, SUBTRACT_GREEN and COLOR_INDEXING
(including sub-byte pixel bundling). Output is gray rows via BT.601
luma of the ARGB pixels, the decode_image contract.

Encoder: a spec-valid writer used as the round-trip test anchor —
near-flat canonical prefix codes (no histogram optimization; the
bitstream is valid, just not minimal), optional subtract-green,
uniform predictor, palette (color-indexing with bundling), color
cache, a simple run-length LZ77, and an optional 2-group meta split
so the decoder's group switching is exercised. Lossless by
construction.
"""

from __future__ import annotations

import struct


def _luma(r: int, g: int, b: int) -> int:
    return (299 * r + 587 * g + 114 * b) // 1000


# order in which code-length-code lengths are transmitted
_CLC_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16)

# 120-entry 2D distance neighborhood: (dx, dy) pairs, spec order
_DIST_MAP = (
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
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
)


class _BitReader:
    """LSB-first bit reader over the VP8L data bytes."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def read(self, n: int) -> int:
        # batched LSB-first extract over the covering byte slice (the
        # per-bit loop was the decode hot path)
        if n <= 0:
            return 0
        pos = self.pos
        end = pos + n
        first = pos >> 3
        last = (end + 7) >> 3
        if last > len(self.data):
            raise ValueError("truncated VP8L bitstream")
        chunk = int.from_bytes(self.data[first:last], "little")
        self.pos = end
        return (chunk >> (pos & 7)) & ((1 << n) - 1)

    def peek8(self) -> int | None:
        """Next 8 bits without consuming, or None near the tail."""
        pos = self.pos
        last = (pos + 15) >> 3
        if last > len(self.data):
            return None
        chunk = int.from_bytes(self.data[pos >> 3:last], "little")
        return (chunk >> (pos & 7)) & 0xFF


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.bit = 0

    def write(self, v: int, n: int) -> None:
        for i in range(n):
            if self.bit == 0:
                self.out.append(0)
            if (v >> i) & 1:
                self.out[-1] |= 1 << self.bit
            self.bit = (self.bit + 1) & 7


def _canonical_from_lengths(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (nbits, code) canonical code (VP8L/DEFLATE rule:
    shorter codes first, ties by symbol order; code bits are read
    MSB-of-the-code-first through the LSB-first bit reader, i.e. bit
    by bit from the top)."""
    pairs = sorted(
        (ln, sym) for sym, ln in enumerate(lengths) if ln > 0
    )
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    prev_len = 0
    for ln, sym in pairs:
        code <<= ln - prev_len
        codes[sym] = (ln, code)
        code += 1
        prev_len = ln
    return codes


class _PrefixDecoder:
    def __init__(self, lengths: list[int]):
        nz = [ln for ln in lengths if ln > 0]
        if len(nz) == 1:
            # single-symbol code: zero bits per symbol
            self.single = lengths.index(max(lengths))
            self.table = {}
            return
        self.single = None
        self.table = {
            (ln, code): sym
            for sym, (ln, code) in _canonical_from_lengths(lengths).items()
        }
        if not self.table:
            raise ValueError("empty VP8L prefix code")
        # 8-bit first-level LUT (decode hot path): window value ->
        # (symbol, length) for every code of length <= 8. The stream
        # is LSB-first but code bits are read MSB-of-code-first, so
        # the code after i+1 bits is the bit-reversed (i+1)-prefix of
        # the window — simulate the per-bit walk once per window.
        lut: list[tuple[int, int] | None] = [None] * 256
        for w in range(256):
            code = 0
            for i in range(8):
                code = (code << 1) | ((w >> i) & 1)
                sym = self.table.get((i + 1, code))
                if sym is not None:
                    lut[w] = (sym, i + 1)
                    break
        self.lut8 = lut

    def decode(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        w = br.peek8()
        if w is not None:
            hit = self.lut8[w]
            if hit is not None:
                sym, ln = hit
                br.pos += ln
                return sym
            # no code of length <= 8 prefixes this window: consume
            # the 8 bits and continue the per-bit walk from length 9
            br.pos += 8
            code = 0
            for i in range(8):
                code = (code << 1) | ((w >> i) & 1)
            return self._decode_per_bit(br, code, 9)
        return self._decode_per_bit(br, 0, 1)

    def _decode_per_bit(self, br: _BitReader, code: int, start: int) -> int:
        for ln in range(start, 16):
            code = (code << 1) | br.read(1)
            sym = self.table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("bad VP8L prefix code")


def _read_prefix_code(br: _BitReader, alphabet_size: int) -> _PrefixDecoder:
    if br.read(1):  # simple code
        n_syms = br.read(1) + 1
        if br.read(1):  # first symbol in 8 bits
            sym0 = br.read(8)
        else:
            sym0 = br.read(1)
        lengths = [0] * alphabet_size
        if sym0 >= alphabet_size:
            raise ValueError("VP8L simple code symbol out of range")
        if n_syms == 2:
            sym1 = br.read(8)
            if sym1 >= alphabet_size:
                raise ValueError("VP8L simple code symbol out of range")
            lengths[sym0] = 1
            lengths[sym1] = 1
        else:
            lengths[sym0] = 1  # single-symbol: decoder reads 0 bits
            dec = _PrefixDecoder(lengths)
            dec.single = sym0
            return dec
        return _PrefixDecoder(lengths)
    # normal code
    num_clc = 4 + br.read(4)
    clc_lengths = [0] * 19
    for i in range(num_clc):
        clc_lengths[_CLC_ORDER[i]] = br.read(3)
    clc = _PrefixDecoder(clc_lengths)
    if br.read(1):  # max_symbol short form
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev_len = 8
    i = 0
    while i < alphabet_size and max_symbol > 0:
        max_symbol -= 1
        sym = clc.decode(br)
        if sym < 16:
            lengths[i] = sym
            i += 1
            if sym:
                prev_len = sym
        elif sym == 16:
            rep = 3 + br.read(2)
            for _ in range(rep):
                if i < alphabet_size:
                    lengths[i] = prev_len
                    i += 1
        elif sym == 17:
            i += 3 + br.read(3)
        else:  # 18
            i += 11 + br.read(7)
    if i > alphabet_size:
        raise ValueError("VP8L code lengths overflow alphabet")
    return _PrefixDecoder(lengths)


def _prefix_value(br: _BitReader, sym: int) -> int:
    """LZ77 length/distance prefix scheme: symbol -> value."""
    if sym < 4:
        return sym + 1
    extra = (sym - 2) >> 1
    offset = (2 + (sym & 1)) << extra
    return offset + br.read(extra) + 1


def _prefix_sym(value: int) -> tuple[int, int, int]:
    """Inverse of _prefix_value: value -> (symbol, extra_bits, extra)."""
    if value <= 4:
        return value - 1, 0, 0
    v = value - 1
    extra = v.bit_length() - 2
    offset = (2 + ((v >> extra) & 1)) << extra
    return 2 * extra + ((v >> extra) & 1) + 1 + 1, extra, v - offset
    # symbol = 2*extra + high_bit + 2; see test for the exact inverse


def _decode_entropy_image(
    br: _BitReader, w: int, h: int, allow_meta: bool
) -> list[int]:
    """Decode a VP8L entropy-coded ARGB image of w x h pixels (used
    for the main image AND for transform/meta sub-images). Returns a
    flat list of 0xAARRGGBB ints."""
    cache_bits = 0
    cache: list[int] = []
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("bad VP8L color cache size")
        cache = [0] * (1 << cache_bits)
    groups = 1
    huff_img: list[int] | None = None
    huff_bits = 0
    if allow_meta and br.read(1):
        huff_bits = br.read(3) + 2
        hw = (w + (1 << huff_bits) - 1) >> huff_bits
        hh = (h + (1 << huff_bits) - 1) >> huff_bits
        huff_img = _decode_entropy_image(br, hw, hh, False)
        groups = max(((p >> 8) & 0xFFFF) for p in huff_img) + 1
    green_size = 256 + 24 + (1 << cache_bits if cache_bits else 0)
    group_codes = []
    for _ in range(groups):
        g = _read_prefix_code(br, green_size)
        r = _read_prefix_code(br, 256)
        b = _read_prefix_code(br, 256)
        a = _read_prefix_code(br, 256)
        d = _read_prefix_code(br, 40)
        group_codes.append((g, r, b, a, d))
    n = w * h
    out: list[int] = []

    def cache_insert(px: int) -> None:
        if cache_bits:
            cache[(0x1E35A7BD * px & 0xFFFFFFFF) >> (32 - cache_bits)] = px

    while len(out) < n:
        if huff_img is not None:
            x = len(out) % w
            y = len(out) // w
            hp = huff_img[(y >> huff_bits) * ((w + (1 << huff_bits) - 1) >> huff_bits) + (x >> huff_bits)]
            gi = (hp >> 8) & 0xFFFF
        else:
            gi = 0
        gc, rc, bc, ac, dc = group_codes[gi]
        s = gc.decode(br)
        if s < 256:  # literal
            red = rc.decode(br)
            blue = bc.decode(br)
            alpha = ac.decode(br)
            px = (alpha << 24) | (red << 16) | (s << 8) | blue
            out.append(px)
            cache_insert(px)
        elif s < 256 + 24:  # LZ77 backref
            length = _prefix_value(br, s - 256)
            dsym = dc.decode(br)
            dval = _prefix_value(br, dsym)
            if dval <= 120:
                dx, dy = _DIST_MAP[dval - 1]
                dist = dy * w + dx
                if dist < 1:
                    dist = 1
            else:
                dist = dval - 120
            if dist > len(out):
                raise ValueError("VP8L backref before image start")
            for _ in range(length):
                if len(out) >= n:
                    break
                px = out[-dist]
                out.append(px)
                cache_insert(px)
        else:  # color cache
            if not cache_bits:
                raise ValueError("VP8L cache symbol without cache")
            idx = s - 280
            if idx >= len(cache):
                raise ValueError("VP8L cache index out of range")
            out.append(cache[idx])
            # cache hit re-inserts (no-op value-wise)
    return out


def _sub_image_size(size: int, bits: int) -> int:
    return (size + (1 << bits) - 1) >> bits


_GREEN = 0x00FF00


def _avg2(a: int, b: int) -> int:
    return (
        ((((a >> 24) & 0xFF) + ((b >> 24) & 0xFF)) // 2) << 24
        | ((((a >> 16) & 0xFF) + ((b >> 16) & 0xFF)) // 2) << 16
        | ((((a >> 8) & 0xFF) + ((b >> 8) & 0xFF)) // 2) << 8
        | ((a & 0xFF) + (b & 0xFF)) // 2
    )


def _clamp_add_sub_full(a: int, b: int, c: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        v = ((a >> sh) & 0xFF) + ((b >> sh) & 0xFF) - ((c >> sh) & 0xFF)
        v = 0 if v < 0 else (255 if v > 255 else v)
        out |= v << sh
    return out


def _add_px(a: int, b: int) -> int:
    return (
        ((((a >> 24) & 0xFF) + ((b >> 24) & 0xFF)) & 0xFF) << 24
        | ((((a >> 16) & 0xFF) + ((b >> 16) & 0xFF)) & 0xFF) << 16
        | ((((a >> 8) & 0xFF) + ((b >> 8) & 0xFF)) & 0xFF) << 8
        | (((a & 0xFF) + (b & 0xFF)) & 0xFF)
    )


def _sub_px(a: int, b: int) -> int:
    return (
        ((((a >> 24) & 0xFF) - ((b >> 24) & 0xFF)) & 0xFF) << 24
        | ((((a >> 16) & 0xFF) - ((b >> 16) & 0xFF)) & 0xFF) << 16
        | ((((a >> 8) & 0xFF) - ((b >> 8) & 0xFF)) & 0xFF) << 8
        | (((a & 0xFF) - (b & 0xFF)) & 0xFF)
    )


def _predict(mode: int, left: int, top: int, tl: int, tr: int) -> int:
    """VP8L predictor modes 0-13 over the four neighbors (edge
    overrides are the CALLER's job, per the spec: top row always
    predicts from left, first column from top)."""
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return left
    if mode == 2:
        return top
    if mode == 3:
        return tr
    if mode == 4:
        return tl
    if mode == 5:
        return _avg2(_avg2(left, tr), top)
    if mode == 6:
        return _avg2(left, tl)
    if mode == 7:
        return _avg2(left, top)
    if mode == 8:
        return _avg2(tl, top)
    if mode == 9:
        return _avg2(top, tr)
    if mode == 10:
        return _avg2(_avg2(left, tl), _avg2(top, tr))
    if mode == 11:  # Select: the closer of T and L to (T + L - TL)
        p_t = p_l = 0
        for sh in (24, 16, 8, 0):
            pc = ((top >> sh) & 0xFF) + ((left >> sh) & 0xFF) - ((tl >> sh) & 0xFF)
            p_t += abs(pc - ((top >> sh) & 0xFF))
            p_l += abs(pc - ((left >> sh) & 0xFF))
        return top if p_t <= p_l else left
    if mode == 12:
        return _clamp_add_sub_full(left, top, tl)
    if mode == 13:  # ClampAddSubtractHalf(Average2(L, T), TL)
        out = 0
        for sh in (24, 16, 8, 0):
            ave = (((left >> sh) & 0xFF) + ((top >> sh) & 0xFF)) // 2
            d = ave - ((tl >> sh) & 0xFF)
            v = ave + int(d / 2)  # C truncation toward zero, not floor
            v = 0 if v < 0 else (255 if v > 255 else v)
            out |= v << sh
        return out
    raise ValueError(f"bad VP8L predictor mode {mode}")


def _delta(t: int, c: int) -> int:
    """VP8L color-transform delta: (int8)t * (int8)c >> 5 (arithmetic
    shift — python's floor >> matches C's on negatives)."""
    ts = t - 256 if t >= 128 else t
    cs = c - 256 if c >= 128 else c
    return (ts * cs) >> 5


def decode_webp_luma(b: bytes) -> list[list[int]]:
    """Decode a lossless WebP (VP8L) payload to gray pixel rows."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WEBP":
        raise ValueError("bad WebP container")
    pos = 12
    vp8l = None
    while pos + 8 <= len(b):
        tag = b[pos : pos + 4]
        (size,) = struct.unpack_from("<I", b, pos + 4)
        if pos + 8 + size > len(b):
            raise ValueError(f"truncated WebP chunk {tag!r}")
        if tag == b"VP8L":
            vp8l = b[pos + 8 : pos + 8 + size]
            break
        if tag in (b"VP8 ", b"VP8X"):
            raise ValueError("lossy / extended WebP not supported (VP8L only)")
        pos += 8 + size + (size & 1)
    if vp8l is None or len(vp8l) < 5:
        raise ValueError("WebP: no VP8L chunk")
    if vp8l[0] != 0x2F:
        raise ValueError("bad VP8L signature byte")
    br = _BitReader(vp8l[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha hint
    if br.read(3) != 0:
        raise ValueError("bad VP8L version")
    if w * h > 1 << 26:
        raise ValueError("VP8L geometry too large")

    transforms: list[tuple] = []
    seen: set[int] = set()
    cur_w = w
    while br.read(1):
        t = br.read(2)
        if t in seen:
            raise ValueError("VP8L transform repeated")
        seen.add(t)
        if t == 0:  # predictor
            bits = br.read(3) + 2
            img = _decode_entropy_image(
                br, _sub_image_size(cur_w, bits), _sub_image_size(h, bits), False
            )
            transforms.append(("pred", bits, img))
        elif t == 1:  # color
            bits = br.read(3) + 2
            img = _decode_entropy_image(
                br, _sub_image_size(cur_w, bits), _sub_image_size(h, bits), False
            )
            transforms.append(("color", bits, img))
        elif t == 2:
            transforms.append(("subgreen",))
        else:  # color indexing
            n_colors = br.read(8) + 1
            raw = _decode_entropy_image(br, n_colors, 1, False)
            palette = []
            acc = 0
            for p in raw:
                acc = _add_px(acc, p)
                palette.append(acc)
            width_bits = (
                3 if n_colors <= 2 else 2 if n_colors <= 4 else
                1 if n_colors <= 16 else 0
            )
            transforms.append(("palette", width_bits, palette, cur_w))
            cur_w = _sub_image_size(cur_w, width_bits)

    px = _decode_entropy_image(br, cur_w, h, True)

    for tr in reversed(transforms):
        if tr[0] == "palette":
            _, width_bits, palette, full_w = tr
            if width_bits:
                per = 1 << width_bits
                ibits = 8 >> width_bits
                mask = (1 << ibits) - 1
                un: list[int] = []
                for y in range(h):
                    row = px[y * cur_w : (y + 1) * cur_w]
                    cnt = 0
                    for packed in row:
                        g = (packed >> 8) & 0xFF
                        for k in range(per):
                            if cnt >= full_w:
                                break
                            un.append((g >> (k * ibits)) & mask)
                            cnt += 1
                idx = un
            else:
                idx = [(p >> 8) & 0xFF for p in px]
            out = []
            for v in idx:
                if v >= len(palette):
                    out.append(0)  # out-of-range index decodes black
                else:
                    out.append(palette[v])
            px = out
            cur_w = full_w
        elif tr[0] == "subgreen":
            for i, p in enumerate(px):
                g = (p >> 8) & 0xFF
                r = ((p >> 16) + g) & 0xFF
                bl = (p + g) & 0xFF
                px[i] = (p & 0xFF00FF00) | (r << 16) | bl
        elif tr[0] == "color":
            _, bits, img = tr
            tw = _sub_image_size(cur_w, bits)
            for i, p in enumerate(px):
                x, y = i % cur_w, i // cur_w
                cte = img[(y >> bits) * tw + (x >> bits)]
                g2r = cte & 0xFF
                g2b = (cte >> 8) & 0xFF
                r2b = (cte >> 16) & 0xFF
                g = (p >> 8) & 0xFF
                r = ((p >> 16) & 0xFF) + _delta(g2r, g)
                r &= 0xFF
                bl = (p & 0xFF) + _delta(g2b, g)
                bl = (bl + _delta(r2b, r)) & 0xFF
                px[i] = (p & 0xFF00FF00) | (r << 16) | bl
        else:  # predictor
            _, bits, img = tr
            tw = _sub_image_size(cur_w, bits)
            for i in range(len(px)):
                x, y = i % cur_w, i // cur_w
                if x == 0 and y == 0:
                    pred = 0xFF000000
                elif y == 0:
                    pred = px[i - 1]
                elif x == 0:
                    pred = px[i - cur_w]
                else:
                    mode = (img[(y >> bits) * tw + (x >> bits)] >> 8) & 0xFF
                    left = px[i - 1]
                    top = px[i - cur_w]
                    tl = px[i - cur_w - 1]
                    tr_ = px[i - cur_w + 1]  # flat wrap at x == w-1
                    pred = _predict(mode, left, top, tl, tr_)
                px[i] = _add_px(px[i], pred)

    return [
        [
            _luma((p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF)
            for p in px[y * w : (y + 1) * w]
        ]
        for y in range(h)
    ]


# --------------------------------------------------------------- encoder

def _flat_lengths(n: int) -> list[int]:
    """Complete canonical code over n symbols: 2^L - n symbols at
    L-1 bits (the first ones), the rest at L."""
    if n == 1:
        return [1]
    lbits = (n - 1).bit_length()
    k = (1 << lbits) - n
    return [lbits - 1] * k + [lbits] * (n - k)


def _write_code(bw: _BitWriter, codes, sym: int) -> None:
    ln, code = codes[sym]
    for j in range(ln - 1, -1, -1):
        bw.write((code >> j) & 1, 1)


def _write_flat_prefix_header(bw: _BitWriter, lengths: list[int]) -> None:
    """Emit a 'normal' prefix-code header declaring the given
    two-valued (L-1 / L) length array via a 1-bit code-length code."""
    vals = sorted(set(lengths))
    assert 1 <= len(vals) <= 2 and max(vals) <= 15
    if len(vals) == 1:
        # a 1-symbol code-length code is not decodable through the
        # canonical table — declare an unused partner value
        hi = vals[0]
        vals = sorted([hi, hi - 1 if hi > 1 else hi + 1])
    clc_len = {v: 1 for v in vals}
    num_clc = max(_CLC_ORDER.index(v) for v in vals) + 1
    bw.write(0, 1)  # normal code
    bw.write(num_clc - 4, 4)
    for i in range(num_clc):
        bw.write(clc_len.get(_CLC_ORDER[i], 0), 3)
    bw.write(0, 1)  # no max_symbol short form
    clc_codes = _canonical_from_lengths(
        [clc_len.get(s, 0) for s in range(19)]
    )
    for ln in lengths:
        _write_code(bw, clc_codes, ln)


def _encode_entropy_image(
    bw: _BitWriter,
    px: list[int],
    w: int,
    h: int,
    cache_bits: int = 0,
    meta_bits: int = 0,
    lz77: bool = False,
    top_level: bool = False,
) -> None:
    """Encode pixels as a VP8L entropy image with near-flat codes.
    Only the top-level (main) image carries the meta-prefix bit."""
    bw.write(1 if cache_bits else 0, 1)
    if cache_bits:
        bw.write(cache_bits, 4)
        cache = [0] * (1 << cache_bits)
    groups = 1
    hw = half = 0
    if top_level:
        bw.write(1 if meta_bits else 0, 1)
    if meta_bits:
        assert top_level
        bw.write(meta_bits - 2, 3)
        hw = _sub_image_size(w, meta_bits)
        hh = _sub_image_size(h, meta_bits)
        half = max(1, hw // 2)
        himg = [
            (0 if hx < half else 1) << 8
            for _hy in range(hh)
            for hx in range(hw)
        ]
        # decoders derive the group count from the huffman image's
        # MAX group id — a narrow image (hw == 1) has only group 0,
        # so writing 2 code sets would desync the stream
        groups = max((p >> 8) & 0xFFFF for p in himg) + 1
        _encode_entropy_image(bw, himg, hw, hh)
    green_n = 256 + 24 + ((1 << cache_bits) if cache_bits else 0)
    gl = _flat_lengths(green_n)
    ol = _flat_lengths(256)
    dl = _flat_lengths(40)
    g_codes = _canonical_from_lengths(gl)
    o_codes = _canonical_from_lengths(ol)
    d_codes = _canonical_from_lengths(dl)
    for _ in range(groups):
        _write_flat_prefix_header(bw, gl)
        for _ in range(3):
            _write_flat_prefix_header(bw, ol)
        _write_flat_prefix_header(bw, dl)

    def insert(p: int) -> None:
        if cache_bits:
            cache[(0x1E35A7BD * p & 0xFFFFFFFF) >> (32 - cache_bits)] = p

    i = 0
    n = len(px)
    while i < n:
        p = px[i]
        if lz77 and i > 0 and p == px[i - 1]:
            run = 1
            while i + run < n and px[i + run] == px[i - 1]:
                run += 1
            if run >= 3:
                sym, nbits, extra = _prefix_sym(run)
                _write_code(bw, g_codes, 256 + sym)
                if nbits:
                    bw.write(extra, nbits)
                dsym, dnbits, dextra = _prefix_sym(1 + 120)  # dist 1
                _write_code(bw, d_codes, dsym)
                if dnbits:
                    bw.write(dextra, dnbits)
                for k in range(run):
                    insert(px[i + k])
                i += run
                continue
        if cache_bits:
            slot = (0x1E35A7BD * p & 0xFFFFFFFF) >> (32 - cache_bits)
            if cache[slot] == p:
                _write_code(bw, g_codes, 280 + slot)
                i += 1
                continue
        _write_code(bw, g_codes, (p >> 8) & 0xFF)
        _write_code(bw, o_codes, (p >> 16) & 0xFF)
        _write_code(bw, o_codes, p & 0xFF)
        _write_code(bw, o_codes, (p >> 24) & 0xFF)
        insert(p)
        i += 1


def encode_webp(
    rgb_rows: list[list[tuple[int, int, int]]],
    subtract_green: bool = False,
    predictor_mode: int | None = None,
    predictor_bits: int = 4,
    palette: bool = False,
    cache_bits: int = 0,
    lz77: bool = False,
    meta_bits: int = 0,
) -> bytes:
    """Encode RGB pixel rows as a lossless WebP (VP8L) — spec-valid,
    unoptimized; every decoder feature reachable via the options."""
    h = len(rgb_rows)
    w = len(rgb_rows[0]) if h else 0
    if w == 0 or h == 0:
        raise ValueError("empty image")
    px = [
        0xFF000000 | (r << 16) | (g << 8) | b
        for row in rgb_rows
        for (r, g, b) in row
    ]
    bw = _BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # alpha hint
    bw.write(0, 3)  # version
    cur_w = w

    if predictor_mode is not None:
        if not 0 <= predictor_mode <= 13:
            raise ValueError("bad predictor mode")
        bits = predictor_bits
        bw.write(1, 1)
        bw.write(0, 2)  # PREDICTOR
        bw.write(bits - 2, 3)
        tw = _sub_image_size(cur_w, bits)
        th = _sub_image_size(h, bits)
        _encode_entropy_image(
            bw, [0xFF000000 | (predictor_mode << 8)] * (tw * th), tw, th
        )
        # forward: residual against the reconstruction's predictors
        res = list(px)
        for i in range(len(px) - 1, -1, -1):
            x, y = i % cur_w, i // cur_w
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = px[i - 1]
            elif x == 0:
                pred = px[i - cur_w]
            else:
                pred = _predict(
                    predictor_mode,
                    px[i - 1],
                    px[i - cur_w],
                    px[i - cur_w - 1],
                    px[i - cur_w + 1],
                )
            res[i] = _sub_px(px[i], pred)
        px = res

    if subtract_green:
        bw.write(1, 1)
        bw.write(2, 2)  # SUBTRACT_GREEN
        px = [
            (p & 0xFF00FF00)
            | ((((p >> 16) - ((p >> 8) & 0xFF)) & 0xFF) << 16)
            | (((p & 0xFF) - ((p >> 8) & 0xFF)) & 0xFF)
            for p in px
        ]

    if palette:
        colors = []
        index = {}
        for p in px:
            if p not in index:
                index[p] = len(colors)
                colors.append(p)
        if len(colors) > 256:
            raise ValueError("palette mode needs <= 256 distinct colors")
        bw.write(1, 1)
        bw.write(3, 2)  # COLOR_INDEXING
        bw.write(len(colors) - 1, 8)
        deltas = [
            colors[i] if i == 0 else _sub_px(colors[i], colors[i - 1])
            for i in range(len(colors))
        ]
        _encode_entropy_image(bw, deltas, len(colors), 1)
        n = len(colors)
        width_bits = 3 if n <= 2 else 2 if n <= 4 else 1 if n <= 16 else 0
        idx = [index[p] for p in px]
        if width_bits:
            per = 1 << width_bits
            ibits = 8 >> width_bits
            packed = []
            for y in range(h):
                row = idx[y * cur_w : (y + 1) * cur_w]
                for c0 in range(0, cur_w, per):
                    g = 0
                    for k, v in enumerate(row[c0 : c0 + per]):
                        g |= v << (k * ibits)
                    packed.append(0xFF000000 | (g << 8))
            cur_w = _sub_image_size(cur_w, width_bits)
            px = packed
        else:
            px = [0xFF000000 | (v << 8) for v in idx]

    bw.write(0, 1)  # end of transforms
    _encode_entropy_image(
        bw, px, cur_w, h,
        cache_bits=cache_bits, meta_bits=meta_bits, lz77=lz77,
        top_level=True,
    )
    payload = b"\x2f" + bytes(bw.out)
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    body = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(body)) + body
