"""FLAC codec tests: lossless round trips (mono/stereo with every
decorrelation mode, 8/16-bit, multi-block, constant detection), a
hand-built LPC subframe (the encoder emits FIXED only), CRC and
truncation typing, fuzz, and the decode_audio dispatch."""

from __future__ import annotations

import math
import random
import struct

import pytest

from clickhouse_observability_spark.operators import flac as FL
from clickhouse_observability_spark.operators import multimodal as M


def _chirp(n, amp=12000, rate=8000, f0=300.0, f1=800.0):
    return [
        int(amp * math.sin(2 * math.pi * (f0 + (f1 - f0) * t / n) * t / rate))
        for t in range(n)
    ]


def test_flac_mono_roundtrips():
    for n in (1, 100, 4096, 9000):
        x = _chirp(n)
        rate, got = FL.decode_flac(FL.encode_flac(x, 8000))
        assert rate == 8000 and got == [s / 32768.0 for s in x], n
    x = [5] * 500  # CONSTANT subframe path
    assert FL.decode_flac(FL.encode_flac(x, 16000))[1] == [5 / 32768.0] * 500
    rnd = random.Random(3)
    x = [rnd.randrange(-120, 120) for _ in range(700)]
    assert FL.decode_flac(FL.encode_flac(x, 22050, bps=8))[1] == [
        s / 128.0 for s in x
    ]


@pytest.mark.parametrize(
    "mode", ["independent", "left_side", "right_side", "mid_side"]
)
def test_flac_stereo_decorrelations(mode):
    n = 3000
    left = _chirp(n, amp=9000, f0=200, f1=500)
    right = _chirp(n, amp=7000, f0=350, f1=450)
    inter = [v for pair in zip(left, right) for v in pair]
    enc = FL.encode_flac(inter, 8000, channels=2, stereo_mode=mode,
                         block_size=512)
    rate, got = FL.decode_flac(enc)
    assert rate == 8000
    assert got == [(l + r) / 2 / 32768.0 for l, r in zip(left, right)]


def test_flac_fixed_predictors_actually_compress():
    enc = FL.encode_flac(_chirp(8000), 8000)
    assert len(enc) < 8000 * 2  # smaller than raw PCM16


def test_flac_lpc_subframe_handbuilt():
    """The encoder emits FIXED predictors only; build an LPC subframe
    by hand so the decoder's LPC path (precision, shift, signed
    coefficients) is pinned."""
    n, bps = 64, 16
    order, prec, shift = 2, 12, 4
    coefs = [900, -400]  # prec-bit signed
    # generate a signal, derive residuals under this exact predictor
    sig = [int(500 * math.sin(0.3 * t)) + (t % 7) for t in range(n)]
    res = []
    for i in range(order, n):
        pred = sum(c * sig[i - j - 1] for j, c in enumerate(coefs)) >> shift
        res.append(sig[i] - pred)
    bw = FL._BitWriter()
    bw.write(0x3FFE, 14)
    bw.write(0, 2)
    bw.write(7, 4)   # 16-bit block size field
    bw.write(0, 4)   # rate from STREAMINFO
    bw.write(0, 4)   # mono
    bw.write(4, 3)   # 16-bit samples
    bw.write(0, 1)
    bw.write(0, 8)   # frame 0
    bw.write(n - 1, 16)
    bw.align()
    bw.write(FL._crc8(bytes(bw.out)), 8)
    bw.write(0, 1)
    bw.write(32 + order - 1, 6)  # LPC, order 2
    bw.write(0, 1)  # no wasted bits
    for s in sig[:order]:
        bw.write(s, bps)
    bw.write(prec - 1, 4)
    bw.write(shift, 5)
    for c in coefs:
        bw.write(c, prec)
    bw.write(0, 2)  # residual method 0
    bw.write(0, 4)  # partition order 0
    bw.write(9, 4)  # rice parameter
    for r in res:
        u = (r << 1) if r >= 0 else ((-r) << 1) - 1
        for _ in range(u >> 9):
            bw.write(0, 1)
        bw.write(1, 1)
        bw.write(u & 511, 9)
    bw.align()
    body = bytes(bw.out)
    frame = body + struct.pack(">H", FL._crc16(body))
    si = bytearray()
    si += struct.pack(">HH", n, n) + b"\x00" * 6
    si += bytes(((8000 >> 12) & 0xFF, (8000 >> 4) & 0xFF,
                 ((8000 & 0xF) << 4) | (0 << 1) | ((bps - 1) >> 4),
                 ((bps - 1) & 0xF) << 4))
    si += struct.pack(">I", n) + b"\x00" * 16
    enc = b"fLaC" + bytes((0x80,)) + len(si).to_bytes(3, "big") + bytes(si) + frame
    rate, got = FL.decode_flac(enc)
    assert rate == 8000 and got == [s / 32768.0 for s in sig]


def test_flac_rejects_malformed_and_fuzz():
    good = FL.encode_flac(_chirp(600), 8000)
    with pytest.raises(ValueError, match="marker"):
        FL.decode_flac(b"fLaX" + good[4:])
    for cut in (2, 10, 50, len(good) - 3):
        with pytest.raises(ValueError):
            FL.decode_flac(good[:cut])
    # corrupt a frame byte: CRC-8 or CRC-16 must catch it
    b = bytearray(good)
    b[-10] ^= 0x55
    with pytest.raises(ValueError):
        FL.decode_flac(bytes(b))
    rnd = random.Random(0)
    for t in range(300):
        b = bytearray(good)
        if t % 2 == 0:
            b = b[: rnd.randrange(len(b))]
        else:
            for _ in range(rnd.randrange(1, 4)):
                b[rnd.randrange(len(b))] ^= rnd.randrange(1, 256)
        try:
            FL.decode_flac(bytes(b))
        except ValueError:
            pass  # the only legal failure type


def test_decode_audio_dispatches_flac():
    x = _chirp(1200)
    enc = FL.encode_flac(x, 8000)
    rate, got = M.decode_audio(enc)
    assert rate == 8000 and got == [s / 32768.0 for s in x]
    with pytest.raises(ValueError):
        M.decode_audio(enc[:30], fake=False)
    rate, fakes = M.decode_audio(enc[:30], fake=True)
    assert len(fakes) == 256  # deterministic stand-in
