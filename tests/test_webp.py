"""VP8L (lossless WebP) codec tests: exact round trips through every
bitstream feature — all 14 predictor modes, color transform decode,
subtract-green, palette bundling widths, color cache, LZ77, 2-group
meta split and feature combinations — plus container/bitstream error
typing and the decode_image dispatch."""

from __future__ import annotations

import random
import struct

import pytest

from clickhouse_observability_spark.operators import multimodal as M
from clickhouse_observability_spark.operators import webp as W


def _lum(rgb):
    return [[W._luma(*px) for px in row] for row in rgb]


def _noise(rnd, w, h):
    return [
        [tuple(rnd.randrange(256) for _ in range(3)) for _ in range(w)]
        for _ in range(h)
    ]


def _smooth(w, h):
    return [[((r * 3 + c) % 256, (c * 5) % 256, (r * 7) % 256)
             for c in range(w)] for r in range(h)]


def test_webp_plain_roundtrip():
    rnd = random.Random(1)
    for w, h in [(1, 1), (5, 4), (16, 11), (33, 7)]:
        rgb = _noise(rnd, w, h)
        assert W.decode_webp_luma(W.encode_webp(rgb)) == _lum(rgb), (w, h)


def test_webp_cache_and_lz77():
    rgb = [[(10, 20, 30) if (r + c) % 7 else (1, 2, 3) for c in range(24)]
           for r in range(18)]
    plain = W.encode_webp(rgb)
    for kw in (dict(cache_bits=4), dict(lz77=True),
               dict(cache_bits=6, lz77=True)):
        enc = W.encode_webp(rgb, **kw)
        assert W.decode_webp_luma(enc) == _lum(rgb), kw
    # LZ77 runs actually shrink the repetitive stream
    assert len(W.encode_webp([[(9, 9, 9)] * 64] * 32, lz77=True)) < len(
        W.encode_webp([[(9, 9, 9)] * 64] * 32)
    ) // 4


@pytest.mark.parametrize("mode", list(range(14)))
def test_webp_every_predictor_mode(mode):
    rnd = random.Random(mode)
    rgb = _smooth(17, 9) if mode % 2 else _noise(rnd, 15, 8)
    enc = W.encode_webp(rgb, predictor_mode=mode, predictor_bits=3)
    assert W.decode_webp_luma(enc) == _lum(rgb)


def test_webp_palette_bundling_widths():
    rnd = random.Random(5)
    # 2/4/16/120 colors: index widths 1, 2, 4 and 8 bits (bundled x8/x4/x2)
    for ncol, w, h in [(2, 19, 7), (4, 13, 9), (16, 21, 6), (120, 12, 10)]:
        pal = [tuple(rnd.randrange(256) for _ in range(3)) for _ in range(ncol)]
        rgb = [[pal[rnd.randrange(ncol)] for _ in range(w)] for _ in range(h)]
        enc = W.encode_webp(rgb, palette=True)
        assert W.decode_webp_luma(enc) == _lum(rgb), ncol
    with pytest.raises(ValueError, match="palette"):
        W.encode_webp(_noise(rnd, 32, 32), palette=True)


def test_webp_meta_groups_and_combo():
    rnd = random.Random(7)
    rgb = _noise(rnd, 40, 12)
    assert W.decode_webp_luma(W.encode_webp(rgb, meta_bits=2)) == _lum(rgb)
    rgb = _smooth(26, 15)
    enc = W.encode_webp(
        rgb, subtract_green=True, predictor_mode=7,
        cache_bits=5, lz77=True, meta_bits=3,
    )
    assert W.decode_webp_luma(enc) == _lum(rgb)


def test_webp_color_transform_decode():
    """The encoder doesn't emit COLOR transforms; hand-splice one so
    the inverse (green_to_red / green_to_blue / red_to_blue with the
    signed >>5 delta) is pinned by construction."""
    w, h = 6, 4
    rgb = _smooth(w, h)
    # apply the FORWARD color transform in python, then build a
    # stream declaring it: decoder must undo it exactly
    g2r, g2b, r2b = 0x12, 0xF0, 0x05  # mixed signs (0xF0 = -16)

    def delta(t, c):
        return W._delta(t, c)

    fwd = []
    for r, g, b in (px for row in rgb for px in row):
        # inverse adds delta(r2b, FINAL red) — so the forward subtracts
        # against the final red, not the transformed one
        nr = (r - delta(g2r, g)) & 0xFF
        nb = (b - delta(g2b, g) - delta(r2b, r)) & 0xFF
        fwd.append((nr, g, nb))
    fwd_rows = [fwd[y * w : (y + 1) * w] for y in range(h)]

    bw = W._BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)
    bw.write(0, 3)
    bw.write(1, 1)
    bw.write(1, 2)  # COLOR transform
    bits = 5  # one block covers the whole image
    bw.write(bits - 2, 3)
    cte = 0xFF000000 | (r2b << 16) | (g2b << 8) | g2r
    W._encode_entropy_image(bw, [cte], 1, 1)
    bw.write(0, 1)  # end of transforms
    px = [0xFF000000 | (r << 16) | (g << 8) | b
          for row in fwd_rows for (r, g, b) in row]
    W._encode_entropy_image(bw, px, w, h, top_level=True)
    payload = b"\x2f" + bytes(bw.out)
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    body = b"WEBP" + chunk
    enc = b"RIFF" + struct.pack("<I", len(body)) + body
    assert W.decode_webp_luma(enc) == _lum(rgb)


def test_webp_rejects_malformed():
    enc = W.encode_webp(_smooth(8, 6))
    with pytest.raises(ValueError, match="container"):
        W.decode_webp_luma(b"XIFF" + enc[4:])
    with pytest.raises(ValueError, match="VP8L only"):
        W.decode_webp_luma(enc[:12] + b"VP8 " + enc[16:])
    for cut in (10, 20, len(enc) - 4):
        with pytest.raises(ValueError):
            W.decode_webp_luma(enc[:cut])


def test_webp_fuzz_only_typed_errors():
    rnd = random.Random(0)
    enc = W.encode_webp(_smooth(20, 14), subtract_green=True,
                        cache_bits=4, lz77=True)
    for t in range(250):
        b = bytearray(enc)
        if t % 2 == 0:
            b = b[: rnd.randrange(len(b))]
        else:
            for _ in range(rnd.randrange(1, 4)):
                b[rnd.randrange(len(b))] ^= rnd.randrange(1, 256)
        try:
            W.decode_webp_luma(bytes(b))
        except ValueError:
            pass  # the only legal failure type


def test_decode_image_dispatches_webp():
    rgb = _smooth(10, 8)
    enc = W.encode_webp(rgb, subtract_green=True)
    assert M.decode_image(enc) == _lum(rgb)
    with pytest.raises(ValueError):
        M.decode_image(enc[:20], fake=False)
    tile = M.decode_image(enc[:20], fake=True)
    assert len(tile) == 8


def test_webp_meta_on_narrow_image():
    """Review r4: meta_bits on an image narrower than one huffman
    block produced a 2-group header over a 1-group huffman image —
    desynced stream. The group count now derives from the image."""
    rgb = [[(r * 9 % 256, 30, 60)] * 3 for r in range(8)]
    enc = W.encode_webp(rgb, meta_bits=2)
    assert W.decode_webp_luma(enc) == _lum(rgb)
