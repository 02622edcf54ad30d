"""Baseline TIFF 6.0 codec — pure stdlib.

Decoder: both byte orders (II/MM), IFD tag walk, strip-based rasters,
bilevel/gray (1/8-bit) / RGB(A) / palette photometrics, Compression
1 (none), 5 (TIFF-LZW: MSB-first codes with EARLY code-width change —
deliberately different from GIF's LSB-first late-change LZW) and
32773 (PackBits), horizontal-differencing predictor (tag 317 = 2).
Output is gray pixel rows, the decode_image contract. Encoder: the
matching strip writer (none/PackBits/LZW + optional predictor) as the
lossless round-trip test anchor.

Multi-page files decode their FIRST IFD. Tiles (322+), JPEG-in-TIFF,
CCITT fax codings and planar configuration 2 raise ValueError —
decode_image surfaces that as the fake-tile fallback path.
"""

from __future__ import annotations

import struct


def _luma(r: int, g: int, b: int) -> int:
    return (299 * r + 587 * g + 114 * b) // 1000


def _tiff_lzw_decode(data: bytes, max_out: int) -> bytes:
    """TIFF-LZW (spec section 13): 8-bit min code, codes packed
    MSB-first, table grows like GIF's but the code width increments
    ONE CODE EARLY (at 511/1023/2047 table fill, per the spec's
    'early change' that libtiff canonized)."""
    clear, eoi = 256, 257
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    code_size = 9
    acc = nbits = pos = 0
    prev: bytes | None = None
    while len(out) < max_out:
        while nbits < code_size:
            if pos >= len(data):
                raise ValueError("truncated TIFF LZW stream")
            acc = (acc << 8) | data[pos]
            nbits += 8
            pos += 1
        code = (acc >> (nbits - code_size)) & ((1 << code_size) - 1)
        nbits -= code_size
        if code == clear:
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            code_size = 9
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("bad TIFF LZW first code")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:
                table.append(prev + entry[:1])
        elif code == len(table) and len(table) < 4096:
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("bad TIFF LZW code")
        out += entry
        prev = entry
        # EARLY change: width grows when the NEXT code to define would
        # not fit, i.e. at table sizes 511/1023/2047
        if len(table) == (1 << code_size) - 1 and code_size < 12:
            code_size += 1
    if len(out) < max_out:
        raise ValueError("TIFF LZW stream ended before strip complete")
    return bytes(out[:max_out])


def _tiff_lzw_encode(data: bytes) -> bytes:
    """Matching TIFF-LZW compressor (early change, MSB-first)."""
    clear, eoi = 256, 257
    out = bytearray()
    acc = nbits = 0

    def emit(code: int, size: int) -> None:
        nonlocal acc, nbits
        acc = (acc << size) | code
        nbits += size
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8
        acc &= (1 << nbits) - 1

    code_size = 9
    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = eoi + 1
    emit(clear, code_size)
    run = b""
    for byte in data:
        cand = run + bytes([byte])
        if cand in table:
            run = cand
            continue
        emit(table[run], code_size)
        if next_code < 4094:
            table[cand] = next_code
            # early change, mirrored against the decoder's append-time
            # check (same relative timing as the proven GIF pair, with
            # the TIFF threshold one lower)
            if next_code == (1 << code_size) - 1 and code_size < 12:
                code_size += 1
            next_code += 1
        else:
            emit(clear, code_size)
            table = {bytes([i]): i for i in range(256)}
            code_size = 9
            next_code = eoi + 1
        run = bytes([byte])
    if run:
        emit(table[run], code_size)
    emit(eoi, code_size)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _packbits_decode(data: bytes, max_out: int) -> bytes:
    out = bytearray()
    pos = 0
    while len(out) < max_out:
        if pos >= len(data):
            raise ValueError("truncated TIFF PackBits stream")
        n = data[pos]
        pos += 1
        if n < 128:  # literal run of n+1 bytes
            if pos + n + 1 > len(data):
                raise ValueError("truncated TIFF PackBits literal")
            out += data[pos : pos + n + 1]
            pos += n + 1
        elif n > 128:  # repeat next byte 257-n times
            if pos >= len(data):
                raise ValueError("truncated TIFF PackBits repeat")
            out += bytes([data[pos]]) * (257 - n)
            pos += 1
        # n == 128: no-op
    return bytes(out[:max_out])


def _packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data):
        # find a repeat run
        j = i
        while j + 1 < len(data) and data[j + 1] == data[i] and j - i < 126:
            j += 1
        if j > i:  # run of j-i+1 identical bytes
            out.append(257 - (j - i + 1))
            out.append(data[i])
            i = j + 1
            continue
        # literal run until the next repeat of 3+
        j = i
        while (
            j + 2 < len(data)
            and not (data[j + 1] == data[j + 2] == data[j])
            and j - i < 126
        ):
            j += 1
        j = min(j + 1, len(data))  # include at least one byte
        out.append(j - i - 1)
        out += data[i:j]
        i = j
    return bytes(out)


def _parse_tiff(b: bytes) -> list[list[int]]:
    if len(b) < 8:
        raise ValueError("truncated TIFF header")
    if b[:4] == b"II*\x00":
        e = "<"
    elif b[:4] == b"MM\x00*":
        e = ">"
    else:
        raise ValueError("bad TIFF signature")
    (ifd_off,) = struct.unpack_from(f"{e}I", b, 4)
    if ifd_off + 2 > len(b):
        raise ValueError("truncated TIFF IFD")
    (n_tags,) = struct.unpack_from(f"{e}H", b, ifd_off)
    if ifd_off + 2 + 12 * n_tags > len(b):
        raise ValueError("truncated TIFF IFD entries")
    type_size = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}

    tags: dict[int, list[int]] = {}
    for i in range(n_tags):
        tag, typ, cnt = struct.unpack_from(f"{e}HHI", b, ifd_off + 2 + 12 * i)
        voff = ifd_off + 2 + 12 * i + 8
        if typ not in type_size:
            continue  # unknown value type: skip the tag
        total = type_size[typ] * cnt
        if total > 4:
            (voff,) = struct.unpack_from(f"{e}I", b, voff)
        if voff + total > len(b):
            raise ValueError(f"truncated TIFF tag {tag}")
        fmt = {1: "B", 2: "B", 3: "H", 4: "I", 5: "II"}[typ]
        vals: list[int] = []
        for c in range(cnt):
            v = struct.unpack_from(
                f"{e}{fmt}", b, voff + c * type_size[typ]
            )
            vals.append(v[0])
        tags[tag] = vals

    def one(tag: int, default: int | None = None) -> int:
        if tag in tags:
            return tags[tag][0]
        if default is None:
            raise ValueError(f"TIFF missing required tag {tag}")
        return default

    width, height = one(256), one(257)
    if width == 0 or height == 0 or width * height > 1 << 26:
        raise ValueError(f"bad TIFF geometry {width}x{height}")
    compression = one(259, 1)
    photometric = one(262)
    spp = one(277, 1)
    bits = tags.get(258, [1 if photometric in (0, 1) else 8])
    rows_per_strip = one(278, height)
    if one(284, 1) != 1:
        raise ValueError("unsupported TIFF planar configuration")
    tiled = 322 in tags or 323 in tags
    if compression not in (1, 5, 32773):
        raise ValueError(f"unsupported TIFF compression {compression}")
    if any(v not in (1, 8) for v in bits) or len(set(bits)) != 1:
        raise ValueError(f"unsupported TIFF bit depth {bits}")
    depth = bits[0]
    if depth == 1 and spp != 1:
        raise ValueError("bilevel TIFF must be single-sample")
    predictor = one(317, 1)
    if predictor not in (1, 2):
        raise ValueError(f"unsupported TIFF predictor {predictor}")

    def decompress(chunk: bytes, need: int) -> bytes:
        if compression == 1:
            if len(chunk) < need:
                raise ValueError("truncated TIFF segment data")
            return chunk[:need]
        if compression == 5:
            return _tiff_lzw_decode(chunk, need)
        return _packbits_decode(chunk, need)

    row_bytes = (width * spp * depth + 7) // 8
    if tiled:
        tw = one(322)
        tl = one(323)
        if tw == 0 or tl == 0 or tw % 16 or tl % 16:
            raise ValueError("bad TIFF tile geometry")
        offsets = tags.get(324)
        counts = tags.get(325)
        tiles_x = -(-width // tw)
        tiles_y = -(-height // tl)
        if (not offsets or not counts
                or len(offsets) != len(counts)
                or len(offsets) < tiles_x * tiles_y):
            raise ValueError("TIFF missing tile layout")
        tile_row = (tw * spp * depth + 7) // 8
        if depth < 8 and tw % (8 // depth):
            raise ValueError("sub-byte tiles must byte-align")
        raster = bytearray(height * row_bytes)
        for ty in range(tiles_y):
            for tx in range(tiles_x):
                ti = ty * tiles_x + tx
                off, cnt = offsets[ti], counts[ti]
                if off + cnt > len(b):
                    raise ValueError("truncated TIFF tile")
                td = decompress(b[off : off + cnt], tl * tile_row)
                # predictor runs per tile ROW before placement
                # (vectorized r11: horizontal predictor = per-channel
                # mod-256 cumsum along the row, same as PNG Sub)
                if predictor == 2:
                    if depth != 8:
                        raise ValueError("TIFF predictor needs 8-bit samples")
                    import numpy as _np

                    a = _np.frombuffer(
                        bytes(td[: tl * tile_row]), _np.uint8
                    ).astype(_np.uint64)
                    td = bytearray(
                        (a.reshape(tl, tile_row // spp, spp)
                         .cumsum(axis=1) & 0xFF)
                        .astype(_np.uint8).tobytes())
                x_bytes = tx * (tw * spp * depth) // 8
                copy_w = min(tile_row, row_bytes - x_bytes)
                for r in range(min(tl, height - ty * tl)):
                    dst = (ty * tl + r) * row_bytes + x_bytes
                    raster[dst : dst + copy_w] = td[
                        r * tile_row : r * tile_row + copy_w
                    ]
    else:
        offsets = tags.get(273)
        counts = tags.get(279)
        if not offsets or not counts or len(offsets) != len(counts):
            raise ValueError("TIFF missing strip layout")
        raster = bytearray()
        remaining_rows = height
        for off, cnt in zip(offsets, counts):
            if off + cnt > len(b):
                raise ValueError("truncated TIFF strip")
            n_rows = min(rows_per_strip, remaining_rows)
            raster += decompress(b[off : off + cnt], n_rows * row_bytes)
            remaining_rows -= n_rows
        if remaining_rows > 0:
            raise ValueError("TIFF strips do not cover the image")

    if predictor == 2 and not tiled:  # tiles already undid it per row
        if depth != 8:
            raise ValueError("TIFF predictor needs 8-bit samples")
        import numpy as _np

        a = _np.frombuffer(bytes(raster), _np.uint8).astype(_np.uint64)
        raster = bytearray(
            (a.reshape(height, row_bytes // spp, spp)
             .cumsum(axis=1) & 0xFF).astype(_np.uint8).tobytes())

    pal: list[int] | None = None
    if photometric == 3:
        cm = tags.get(320)
        if not cm or len(cm) < 3 * (1 << depth):
            raise ValueError("TIFF palette missing ColorMap")
        n = 1 << depth
        # ColorMap values are 16-bit; high byte is the 8-bit channel
        pal = [
            _luma(cm[i] >> 8, cm[n + i] >> 8, cm[2 * n + i] >> 8)
            for i in range(n)
        ]

    # whole-raster conversion in one numpy shot (r11: was a per-pixel
    # Python loop — same integer math, bit-identical; golden tests
    # unchanged)
    import numpy as _np

    mat = _np.frombuffer(bytes(raster), _np.uint8).reshape(
        height, row_bytes)
    if depth == 1:
        bits = _np.unpackbits(mat, axis=1)[:, :width].astype(_np.int32)
        if pal is not None:  # 1-bit PALETTE image: ColorMap wins
            gray = _np.take(_np.asarray(pal, _np.int32), bits)
        else:
            gray = bits * 255
            if photometric == 0:  # white-is-zero
                gray = 255 - gray
    elif spp == 1:
        v = mat[:, :width].astype(_np.int32)
        if pal is not None:
            gray = _np.take(_np.asarray(pal, _np.int32), v)
        elif photometric == 0:
            gray = 255 - v
        else:
            gray = v
    else:  # RGB(A): first three samples, BT.601 integer luma
        px = mat[:, : width * spp].reshape(height, width, spp) \
            .astype(_np.int32)
        gray = (299 * px[:, :, 0] + 587 * px[:, :, 1]
                + 114 * px[:, :, 2]) // 1000
    return gray.tolist()


def decode_tiff_luma(b: bytes) -> list[list[int]]:
    """Decode a baseline TIFF to gray pixel rows (first IFD)."""
    return _parse_tiff(b)


def encode_tiff(
    rgb_rows: list[list[tuple[int, int, int]]],
    compression: int = 1,
    predictor: bool = False,
    rows_per_strip: int | None = None,
    big_endian: bool = False,
) -> bytes:
    """Encode RGB pixel rows as a strip-based TIFF (compression 1 =
    none, 5 = LZW, 32773 = PackBits; optional horizontal predictor
    with LZW) — lossless round-trip test anchor."""
    h = len(rgb_rows)
    w = len(rgb_rows[0]) if h else 0
    if w == 0 or h == 0:
        raise ValueError("empty image")
    if compression not in (1, 5, 32773):
        raise ValueError(f"bad compression {compression}")
    e = ">" if big_endian else "<"
    rps = rows_per_strip or h
    strips: list[bytes] = []
    for s0 in range(0, h, rps):
        raw = bytearray()
        for r in range(s0, min(s0 + rps, h)):
            line = bytearray()
            for px in rgb_rows[r]:
                line += bytes(px)
            if predictor:
                for c in range(len(line) - 1, 2, -1):
                    line[c] = (line[c] - line[c - 3]) & 0xFF
            raw += line
        if compression == 1:
            strips.append(bytes(raw))
        elif compression == 5:
            strips.append(_tiff_lzw_encode(bytes(raw)))
        else:
            strips.append(_packbits_encode(bytes(raw)))

    n_strips = len(strips)
    entries: list[tuple[int, int, int, int]] = []  # tag, type, count, value

    # layout: header(8) IFD(2+12*n+4) [extra arrays] [strip data]
    n_tags = 11 if predictor else 10
    ifd_off = 8
    extra_off = ifd_off + 2 + 12 * n_tags + 4
    extra = bytearray()

    def arr(values: list[int], typ: int) -> int:
        nonlocal extra
        size = {3: 2, 4: 4}[typ]
        if len(values) * size <= 4:
            v = 0
            for i, x in enumerate(values):
                if e == "<":
                    v |= x << (8 * size * i)
                else:
                    v |= x << (8 * (4 - size * (i + 1)))
            return v
        off = extra_off + len(extra)
        for x in values:
            extra += struct.pack(f"{e}{'H' if typ == 3 else 'I'}", x)
        return off

    strip_data_off = None  # resolved after extra arrays are sized

    # two passes: first size the extra arrays, then write real offsets
    for _pass in range(2):
        extra = bytearray()
        bps_val = arr([8, 8, 8], 3)
        so_base = extra_off + len(extra) if n_strips > 1 else 0
        if n_strips > 1:
            extra += b"\x00" * (4 * n_strips)  # placeholder strip offsets
        sc_val = arr([len(s) for s in strips], 4)
        data_off = extra_off + len(extra)
        offs = []
        o = data_off
        for s in strips:
            offs.append(o)
            o += len(s)
        if n_strips > 1:
            struct.pack_into(
                f"{e}{n_strips}I", extra, so_base - extra_off, *offs
            )
            so_val = so_base
        else:
            so_val = offs[0]
        strip_data_off = data_off
        entries = [
            (256, 4, 1, w),
            (257, 4, 1, h),
            (258, 3, 3, bps_val),
            (259, 3, 1, compression),
            (262, 3, 1, 2),  # RGB
            (273, 4, n_strips, so_val),
            (277, 3, 1, 3),
            (278, 4, 1, rps),
            (279, 4, n_strips, sc_val),
            (284, 3, 1, 1),
        ]
        if predictor:
            entries.append((317, 3, 1, 2))
        entries.sort()

    out = bytearray()
    out += (b"II*\x00" if e == "<" else b"MM\x00*")
    out += struct.pack(f"{e}I", ifd_off)
    out += struct.pack(f"{e}H", n_tags)
    for tag, typ, cnt, val in entries:
        ent = struct.pack(f"{e}HHI", tag, typ, cnt)
        if typ == 3 and cnt == 1:
            # a single SHORT sits in the FIRST two value bytes for
            # both byte orders (the {e} format handles endianness)
            ent += struct.pack(f"{e}HH", val, 0)
        else:
            ent += struct.pack(f"{e}I", val)
        out += ent
    out += struct.pack(f"{e}I", 0)  # next IFD
    out += extra
    assert len(out) == strip_data_off
    for s in strips:
        out += s
    return bytes(out)


def encode_tiff_tiled(
    rgb_rows: list[list[tuple[int, int, int]]],
    tile_width: int = 16,
    tile_length: int = 16,
    compression: int = 1,
    big_endian: bool = False,
) -> bytes:
    """Encode RGB pixel rows as a TILED TIFF (tags 322-325; tiles are
    edge-padded to the 16-multiple tile grid per the spec) — the
    round-trip anchor for the tiled decode path."""
    h = len(rgb_rows)
    w = len(rgb_rows[0]) if h else 0
    if w == 0 or h == 0:
        raise ValueError("empty image")
    if tile_width % 16 or tile_length % 16:
        raise ValueError("TIFF tiles must be multiples of 16")
    if compression not in (1, 5, 32773):
        raise ValueError(f"bad compression {compression}")
    e = ">" if big_endian else "<"
    tiles_x = -(-w // tile_width)
    tiles_y = -(-h // tile_length)
    tiles: list[bytes] = []
    for ty in range(tiles_y):
        for tx in range(tiles_x):
            raw = bytearray()
            for r in range(tile_length):
                y = min(h - 1, ty * tile_length + r)  # edge-replicate pad
                for c in range(tile_width):
                    x = min(w - 1, tx * tile_width + c)
                    raw += bytes(rgb_rows[y][x])
            if compression == 1:
                tiles.append(bytes(raw))
            elif compression == 5:
                tiles.append(_tiff_lzw_encode(bytes(raw)))
            else:
                tiles.append(_packbits_encode(bytes(raw)))

    n_tiles = len(tiles)
    n_tags = 11
    ifd_off = 8
    extra_off = ifd_off + 2 + 12 * n_tags + 4
    extra = bytearray()
    extra += struct.pack(f"{e}3H", 8, 8, 8)  # BitsPerSample
    bps_off = extra_off
    to_off = extra_off + len(extra)
    extra += b"\x00" * (4 * n_tiles)  # tile offsets placeholder
    tc_off = extra_off + len(extra)
    for t in tiles:
        extra += struct.pack(f"{e}I", len(t))
    data_off = extra_off + len(extra)
    offs = []
    o = data_off
    for t in tiles:
        offs.append(o)
        o += len(t)
    struct.pack_into(f"{e}{n_tiles}I", extra, to_off - extra_off, *offs)
    if n_tiles == 1:  # single tile: value fits inline
        to_val, tc_val = offs[0], len(tiles[0])
    else:
        to_val, tc_val = to_off, tc_off
    entries = sorted([
        (256, 4, 1, w), (257, 4, 1, h), (258, 3, 3, bps_off),
        (259, 3, 1, compression), (262, 3, 1, 2), (277, 3, 1, 3),
        (284, 3, 1, 1), (322, 4, 1, tile_width), (323, 4, 1, tile_length),
        (324, 4, n_tiles, to_val), (325, 4, n_tiles, tc_val),
    ])
    out = bytearray(b"II*\x00" if e == "<" else b"MM\x00*")
    out += struct.pack(f"{e}I", ifd_off)
    out += struct.pack(f"{e}H", n_tags)
    for tag, typ, cnt, val in entries:
        out += struct.pack(f"{e}HHI", tag, typ, cnt)
        if typ == 3 and cnt == 1:
            out += struct.pack(f"{e}HH", val, 0)
        else:
            out += struct.pack(f"{e}I", val)
    out += struct.pack(f"{e}I", 0)
    out += extra
    assert len(out) == data_off
    for t in tiles:
        out += t
    return bytes(out)
