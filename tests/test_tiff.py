"""TIFF codec tests: lossless round trips across compressions, byte
orders and strip layouts; hand-built gray/palette/bilevel variants
for the non-RGB photometrics; predictor; typed-error fuzz; the
decode_image dispatch."""

from __future__ import annotations

import random
import struct

import pytest

from clickhouse_observability_spark.operators import multimodal as M
from clickhouse_observability_spark.operators import tiff as Tf


def _lum(rgb):
    return [[Tf._luma(*px) for px in row] for row in rgb]


def _img(rnd, w, h):
    return [
        [tuple(rnd.randrange(256) for _ in range(3)) for _ in range(w)]
        for _ in range(h)
    ]


@pytest.mark.parametrize("comp", [1, 5, 32773])
@pytest.mark.parametrize("big_endian", [False, True])
def test_tiff_roundtrip_lossless(comp, big_endian):
    rnd = random.Random(comp + (100 if big_endian else 0))
    for w, h, rps in [(1, 1, None), (7, 5, 3), (33, 9, None), (16, 16, 4)]:
        rgb = _img(rnd, w, h)
        enc = Tf.encode_tiff(
            rgb, compression=comp, big_endian=big_endian, rows_per_strip=rps
        )
        assert Tf.decode_tiff_luma(enc) == _lum(rgb), (w, h, rps)


def test_tiff_lzw_predictor_and_dictionary_reset():
    rnd = random.Random(3)
    # smooth: predictor shrinks LZW output; noise 64x64 overflows the
    # 4094-entry dictionary so the CLEAR/reset path runs on both sides
    smooth = [[((r * 3 + c) % 256, (c * 5) % 256, (r * 7) % 256)
               for c in range(40)] for r in range(20)]
    enc = Tf.encode_tiff(smooth, compression=5, predictor=True, rows_per_strip=7)
    assert Tf.decode_tiff_luma(enc) == _lum(smooth)
    assert len(enc) < len(Tf.encode_tiff(smooth, compression=1)) // 2
    noise = _img(rnd, 64, 64)
    enc = Tf.encode_tiff(noise, compression=5)
    assert Tf.decode_tiff_luma(enc) == _lum(noise)


def _ifd(entries, e="<", extra=b"", data=b""):
    """Hand-assemble a minimal single-IFD TIFF."""
    n = len(entries)
    hdr = (b"II*\x00" if e == "<" else b"MM\x00*") + struct.pack(f"{e}I", 8)
    out = bytearray(hdr)
    out += struct.pack(f"{e}H", n)
    for tag, typ, cnt, val in sorted(entries):
        out += struct.pack(f"{e}HHI", tag, typ, cnt)
        if typ == 3 and cnt == 1:
            out += struct.pack(f"{e}HH", val, 0)
        else:
            out += struct.pack(f"{e}I", val)
    out += struct.pack(f"{e}I", 0)
    out += extra
    out += data
    return bytes(out)


def test_tiff_grayscale_and_white_is_zero():
    w, h = 4, 2
    raster = bytes(range(10, 10 + w * h))
    base = 8 + 2 + 12 * 7 + 4
    entries = [
        (256, 4, 1, w), (257, 4, 1, h), (258, 3, 1, 8), (259, 3, 1, 1),
        (262, 3, 1, 1), (273, 4, 1, base), (279, 4, 1, len(raster)),
    ]
    got = Tf.decode_tiff_luma(_ifd(entries, data=raster))
    assert got == [list(raster[:w]), list(raster[w:])]
    # photometric 0: white-is-zero inverts
    entries[4] = (262, 3, 1, 0)
    got = Tf.decode_tiff_luma(_ifd(entries, data=raster))
    assert got == [[255 - v for v in raster[:w]], [255 - v for v in raster[w:]]]


def test_tiff_palette_and_bilevel():
    # 8-bit palette: ColorMap holds 16-bit channels, high byte wins
    w, h = 3, 1
    raster = bytes([0, 1, 1])
    n = 256
    cmap = b""
    for ch_base in (10, 20, 30):  # R, G, B planes
        for i in range(n):
            cmap += struct.pack("<H", ((ch_base + i) % 256) << 8)
    base = 8 + 2 + 12 * 8 + 4
    entries = [
        (256, 4, 1, w), (257, 4, 1, h), (258, 3, 1, 8), (259, 3, 1, 1),
        (262, 3, 1, 3), (273, 4, 1, base + len(cmap)),
        (279, 4, 1, len(raster)), (320, 3, 3 * n, base),
    ]
    got = Tf.decode_tiff_luma(_ifd(entries, extra=cmap, data=raster))
    exp = [Tf._luma(10 + i, 20 + i, 30 + i) for i in (0, 1, 1)]
    assert got == [exp]
    # 1-bit bilevel, black-is-zero, ragged row of 9 -> 2 bytes/row
    w, h = 9, 2
    raster = bytes([0b10110010, 0b10000000, 0b01001101, 0b00000000])
    base = 8 + 2 + 12 * 7 + 4
    entries = [
        (256, 4, 1, w), (257, 4, 1, h), (258, 3, 1, 1), (259, 3, 1, 1),
        (262, 3, 1, 1), (273, 4, 1, base), (279, 4, 1, len(raster)),
    ]
    got = Tf.decode_tiff_luma(_ifd(entries, data=raster))
    assert got == [
        [255, 0, 255, 255, 0, 0, 255, 0, 255],
        [0, 255, 0, 0, 255, 255, 0, 255, 0],
    ]


def test_tiff_rejects_unsupported_and_malformed():
    rnd = random.Random(1)
    good = Tf.encode_tiff(_img(rnd, 8, 6), compression=5)
    with pytest.raises(ValueError, match="signature"):
        Tf.decode_tiff_luma(b"XX\x00*" + good[4:])
    for cut in (3, 10, 40, len(good) - 5):
        with pytest.raises(ValueError):
            Tf.decode_tiff_luma(good[:cut])
    with pytest.raises(ValueError, match="bad compression"):
        Tf.encode_tiff(_img(rnd, 2, 2), compression=6)


def test_tiff_fuzz_only_typed_errors():
    rnd = random.Random(7)
    for comp in (1, 5, 32773):
        base = Tf.encode_tiff(_img(rnd, 12, 9), compression=comp)
        for t in range(150):
            b = bytearray(base)
            if t % 2 == 0:
                b = b[: rnd.randrange(len(b))]
            else:
                for _ in range(rnd.randrange(1, 4)):
                    b[rnd.randrange(len(b))] ^= rnd.randrange(1, 256)
            try:
                Tf.decode_tiff_luma(bytes(b))
            except ValueError:
                pass  # the only legal failure type


def test_decode_image_dispatches_tiff():
    rnd = random.Random(2)
    rgb = _img(rnd, 6, 4)
    for comp in (1, 5, 32773):
        enc = Tf.encode_tiff(rgb, compression=comp)
        assert M.decode_image(enc) == _lum(rgb)
    bad = Tf.encode_tiff(rgb)[:-10]
    with pytest.raises(ValueError):
        M.decode_image(bad, fake=False)
    tile = M.decode_image(bad, fake=True)
    assert len(tile) == 8


def test_tiff_1bit_palette_uses_colormap():
    """Review r4: depth-1 palette TIFFs must resolve through the
    ColorMap, not decode as bilevel black/white."""
    w, h = 4, 1
    raster = bytes([0b01100000])
    n = 2
    cmap = b""
    for luma16 in ((140 << 8, 190 << 8),) * 3:  # same value per channel
        for v in luma16:
            cmap += struct.pack("<H", v)
    base = 8 + 2 + 12 * 8 + 4
    entries = [
        (256, 4, 1, w), (257, 4, 1, h), (258, 3, 1, 1), (259, 3, 1, 1),
        (262, 3, 1, 3), (273, 4, 1, base + len(cmap)),
        (279, 4, 1, len(raster)), (320, 3, 3 * n, base),
    ]
    got = Tf.decode_tiff_luma(_ifd(entries, extra=cmap, data=raster))
    assert got == [[140, 190, 190, 140]]
