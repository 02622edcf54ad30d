"""GIF87a/89a codec — pure stdlib.

Decoder: logical screen descriptor, global/local color tables, full
LZW decompression (variable code width, clear/EOI codes, 12-bit
dictionary cap), interlaced and non-interlaced frames, 89a extension
blocks (graphic control / comment / application / plain text) parsed
and skipped, multi-frame streams. `decode_gif_luma` returns the FIRST
frame as gray pixel rows (the decode_image contract);
`decode_gif_frames` yields every frame for the video/frame-sampling
path. Encoder: real LZW compression (dictionary up to 4096 entries,
reset on overflow) over an exact palette — the round-trip test anchor
and binary-sink helper (GIF is lossless for <=256-color images).
"""

from __future__ import annotations

import struct


def _luma(r: int, g: int, b: int) -> int:
    return (299 * r + 587 * g + 114 * b) // 1000


# interlace pass start rows and steps (GIF89a spec appendix E)
_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def _lzw_decode(min_code_size: int, data: bytes, n_expected: int) -> list[int]:
    """GIF LZW: variable-width codes LSB-first, dictionary rebuilt on
    CLEAR, capped at 12 bits. Returns exactly n_expected indexes (a
    stream may legally end early at EOI or run out of data mid-code;
    short output raises)."""
    if not 2 <= min_code_size <= 11:
        raise ValueError(f"bad GIF LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    out: list[int] = []
    # bit reader state over the concatenated sub-block data
    acc = 0
    nbits = 0
    pos = 0
    code_size = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    prev: bytes | None = None
    while len(out) < n_expected:
        while nbits < code_size:
            if pos >= len(data):
                raise ValueError("truncated GIF LZW stream")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            code_size = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("bad GIF LZW first code")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:
                table.append(prev + entry[:1])
        elif code == len(table) and len(table) < 4096:
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("bad GIF LZW code")
        out.extend(entry)
        prev = entry
        if len(table) == (1 << code_size) and code_size < 12:
            code_size += 1
    if len(out) < n_expected:
        raise ValueError("GIF LZW stream ended before raster complete")
    return out[:n_expected]


def _read_subblocks(b: bytes, pos: int) -> tuple[bytes, int]:
    chunks = []
    while True:
        if pos >= len(b):
            raise ValueError("truncated GIF sub-blocks")
        n = b[pos]
        pos += 1
        if n == 0:
            return b"".join(chunks), pos
        if pos + n > len(b):
            raise ValueError("truncated GIF sub-block")
        chunks.append(b[pos : pos + n])
        pos += n


def decode_gif_frames(b: bytes) -> list[list[list[int]]]:
    """Decode every frame of a GIF to gray pixel rows (each frame
    composited onto the logical screen is NOT attempted — frames are
    returned in their own geometry, the honest primitive; the first
    frame of a well-formed file covers the screen)."""
    if b[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("bad GIF signature")
    if len(b) < 13:
        raise ValueError("truncated GIF header")
    _sw, _sh, packed, _bg, _ar = struct.unpack_from("<HHBBB", b, 6)
    pos = 13
    gct: list[int] | None = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        if pos + 3 * n > len(b):
            raise ValueError("truncated GIF global color table")
        gct = [
            _luma(b[pos + 3 * i], b[pos + 3 * i + 1], b[pos + 3 * i + 2])
            for i in range(n)
        ]
        pos += 3 * n
    frames: list[list[list[int]]] = []
    while pos < len(b):
        block = b[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks
            if pos >= len(b):
                raise ValueError("truncated GIF extension")
            pos += 1  # label byte (F9/FE/FF/01) — parsed-and-skipped
            _, pos = _read_subblocks(b, pos)
            continue
        if block != 0x2C:
            raise ValueError(f"bad GIF block 0x{block:02x}")
        if pos + 9 > len(b):
            raise ValueError("truncated GIF image descriptor")
        _lx, _ly, w, h, ipacked = struct.unpack_from("<HHHHB", b, pos)
        pos += 9
        if w == 0 or h == 0 or w * h > 1 << 26:
            raise ValueError(f"bad GIF frame geometry {w}x{h}")
        ct = gct
        if ipacked & 0x80:  # local color table
            n = 2 << (ipacked & 0x07)
            if pos + 3 * n > len(b):
                raise ValueError("truncated GIF local color table")
            ct = [
                _luma(b[pos + 3 * i], b[pos + 3 * i + 1], b[pos + 3 * i + 2])
                for i in range(n)
            ]
            pos += 3 * n
        if ct is None:
            raise ValueError("GIF frame has no color table")
        if pos >= len(b):
            raise ValueError("truncated GIF image data")
        min_code = b[pos]
        pos += 1
        data, pos = _read_subblocks(b, pos)
        idx = _lzw_decode(min_code, data, w * h)
        nc = len(ct)
        rows = [
            [ct[v] if v < nc else 0 for v in idx[r * w : (r + 1) * w]]
            for r in range(h)
        ]
        if ipacked & 0x40:  # interlaced: rows arrive in 4-pass order
            out = [None] * h
            src = iter(rows)
            for start, step in _INTERLACE:
                for y in range(start, h, step):
                    out[y] = next(src)
            rows = out  # type: ignore[assignment]
        frames.append(rows)
    if not frames:
        raise ValueError("GIF contains no image frames")
    return frames


def decode_gif_luma(b: bytes) -> list[list[int]]:
    """First frame as gray pixel rows (the decode_image contract)."""
    return decode_gif_frames(b)[0]


def _lzw_encode(min_code_size: int, indexes: list[int]) -> bytes:
    """Real GIF LZW compression with dictionary reset at 4096."""
    clear = 1 << min_code_size
    eoi = clear + 1

    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, size: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    code_size = min_code_size + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    emit(clear, code_size)
    run = b""
    for v in indexes:
        cand = run + bytes([v])
        if cand in table:
            run = cand
            continue
        emit(table[run], code_size)
        if next_code < 4096:
            table[cand] = next_code
            # decoder grows its read width when the table FILLS the
            # current code space — mirror exactly
            if next_code == (1 << code_size) and code_size < 12:
                code_size += 1
            next_code += 1
        else:
            emit(clear, code_size)
            table = {bytes([i]): i for i in range(clear)}
            code_size = min_code_size + 1
            next_code = eoi + 1
        run = bytes([v])
    if run:
        emit(table[run], code_size)
    emit(eoi, code_size)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _build_palette(
    frames_rgb: list[list[list[tuple[int, int, int]]]], what: str
) -> tuple[list[tuple[int, int, int]], dict, int, bytes]:
    palette: list[tuple[int, int, int]] = []
    pal_index: dict[tuple[int, int, int], int] = {}
    for fr in frames_rgb:
        for row in fr:
            for px in row:
                if px not in pal_index:
                    pal_index[px] = len(palette)
                    palette.append(px)
    if len(palette) > 256:
        raise ValueError(f"{what} needs <=256 distinct colors")
    depth = max(1, (len(palette) - 1).bit_length())
    min_code = max(2, depth)
    n = 1 << min_code
    gct = bytearray()
    for px in palette:
        gct += bytes(px)
    gct += b"\x00\x00\x00" * (n - len(palette))
    return palette, pal_index, min_code, bytes(gct)


def _emit_frame(
    out: bytearray,
    fr: list[list[tuple[int, int, int]]],
    pal_index: dict,
    min_code: int,
    w: int,
    h: int,
    interlace: bool,
) -> None:
    out += struct.pack(
        "<BHHHHB", 0x2C, 0, 0, w, h, 0x40 if interlace else 0x00
    )
    if interlace:
        order = [y for start, step in _INTERLACE for y in range(start, h, step)]
    else:
        order = list(range(h))
    idx = [pal_index[px] for y in order for px in fr[y]]
    body = _lzw_encode(min_code, idx)
    out.append(min_code)
    for i in range(0, len(body), 255):
        chunk = body[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00"


def _encode_gif_frames(
    frames_rgb: list[list[list[tuple[int, int, int]]]],
    delay_cs: int | None,
    interlace: bool,
    what: str,
) -> bytes:
    """Shared GIF89a writer: one global palette across all frames,
    an optional Graphic Control Extension (delay) before each."""
    if not frames_rgb:
        raise ValueError("no frames")
    h = len(frames_rgb[0])
    w = len(frames_rgb[0][0]) if h else 0
    if w == 0 or h == 0:
        raise ValueError("empty image")
    for fr in frames_rgb:
        if len(fr) != h or any(len(row) != w for row in fr):
            raise ValueError("frames must share one geometry")
    _palette, pal_index, min_code, gct = _build_palette(frames_rgb, what)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (min_code - 1), 0, 0)
    out += gct
    for fr in frames_rgb:
        if delay_cs is not None:
            out += bytes((0x21, 0xF9, 4, 0x00))
            out += struct.pack("<H", delay_cs)
            out += bytes((0x00, 0x00))
        _emit_frame(out, fr, pal_index, min_code, w, h, interlace)
    out += b"\x3b"
    return bytes(out)


def encode_gif(
    rgb_rows: list[list[tuple[int, int, int]]], interlace: bool = False
) -> bytes:
    """Encode RGB pixel rows as a single-frame GIF89a (exact palette,
    <=256 distinct colors, real LZW). Lossless — the round-trip test
    anchor for the decoder."""
    return _encode_gif_frames([rgb_rows], None, interlace, "encode_gif")


def decode_gif_video(b: bytes) -> tuple[int, int, list[list[list[int]]]]:
    """Animated GIF as a video source: (fps_num, fps_den, gray
    frames). Frame timing comes from the FIRST Graphic Control
    Extension's delay (centiseconds; GIF allows per-frame delays —
    the uniform-rate approximation is what a frame-sampling pipeline
    needs); no GCE or a zero delay defaults to 10 fps."""
    delay_cs = _first_gce_delay(b)
    frames = decode_gif_frames(b)
    if delay_cs and delay_cs > 0:
        return 100, delay_cs, frames
    return 10, 1, frames


def _first_gce_delay(b: bytes) -> int | None:
    if b[:6] not in (b"GIF87a", b"GIF89a") or len(b) < 13:
        return None
    packed = b[10]
    pos = 13
    if packed & 0x80:
        pos += 3 * (2 << (packed & 0x07))
    while pos + 1 < len(b):
        block = b[pos]
        pos += 1
        if block != 0x21:
            return None  # image descriptor (or trailer) before any GCE
        label = b[pos]
        pos += 1
        if label == 0xF9 and pos + 5 <= len(b) and b[pos] == 4:
            return b[pos + 2] | (b[pos + 3] << 8)
        try:
            _, pos = _read_subblocks(b, pos)
        except ValueError:
            return None
    return None


def encode_gif_animation(
    frames_rgb: list[list[list[tuple[int, int, int]]]],
    delay_cs: int = 10,
    interlace: bool = False,
) -> bytes:
    """Encode RGB frame sequences as an animated GIF89a: one global
    palette across all frames (<=256 distinct colors total), a
    Graphic Control Extension with the uniform delay before every
    frame. Lossless — the video-pipeline test anchor."""
    return _encode_gif_frames(
        frames_rgb, delay_cs, interlace, "encode_gif_animation"
    )
