"""FLAC codec — pure stdlib.

Decoder: the public FLAC format — fLaC marker + metadata blocks
(STREAMINFO parsed, others skipped), frame sync with CRC-8 header /
CRC-16 frame checks, UTF-8-coded frame numbers, all block-size /
sample-rate / sample-size codes, CONSTANT / VERBATIM / FIXED(0-4) /
LPC(1-32) subframes with wasted bits, 4- and 5-bit Rice residual
partitions with raw-bits escapes, and every stereo decorrelation
(independent, left/side, right/side, mid/side). Output:
(sample_rate, mono float samples in [-1, 1]) — the decode_audio
contract (channels downmixed by mean).

Encoder: the matching writer (fixed blocking, independent channels,
per-subframe choice of CONSTANT / VERBATIM / best FIXED order with
Rice residuals, real STREAMINFO including the unencoded-audio MD5)
used as the lossless round-trip test anchor.
"""

from __future__ import annotations

import hashlib
import struct


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


class _BitReader:
    """MSB-first bit reader that remembers byte spans for CRCs."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.bitpos = pos * 8

    def read(self, n: int) -> int:
        # batched: slice the covering bytes once and extract with two
        # integer ops (the per-bit loop was the decode hot path —
        # rice residuals read millions of small fields per track)
        if n <= 0:
            return 0
        bp = self.bitpos
        end = bp + n
        first = bp >> 3
        last = (end + 7) >> 3
        if last > len(self.data):
            raise ValueError("truncated FLAC bitstream")
        chunk = int.from_bytes(self.data[first:last], "big")
        shift = (last - first) * 8 - (end - (first << 3))
        self.bitpos = end
        return (chunk >> shift) & ((1 << n) - 1)

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def unary(self) -> int:
        # byte-at-a-time scan for the terminating 1 bit instead of a
        # per-bit loop (quotients of rice codes are mostly tiny, but
        # the per-call overhead dominated)
        data = self.data
        bp = self.bitpos
        total = len(data) * 8
        start = bp
        while True:
            if bp >= total:
                raise ValueError("truncated FLAC bitstream")
            rem = data[bp >> 3] & (0xFF >> (bp & 7))
            if rem == 0:
                bp = (bp | 7) + 1  # skip to next byte boundary
                continue
            bp = ((bp >> 3) << 3) + (8 - rem.bit_length())
            q = bp - start
            if q > 1 << 24:
                raise ValueError("runaway FLAC unary code")
            self.bitpos = bp + 1  # consume the 1 bit too
            return q

    def align(self) -> None:
        self.bitpos = (self.bitpos + 7) & ~7


_BLOCKSIZES = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
               8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
               13: 8192, 14: 16384, 15: 32768}
_RATES = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
          7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000}
_SIZES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}
_FIXED_COEFS = ((), (1,), (2, -1), (3, -3, 1), (4, -6, 4, -1))


def _read_utf8_number(br: _BitReader) -> int:
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    mask = 0x40
    while b0 & mask:
        n += 1
        mask >>= 1
    if n < 1 or n > 6:
        raise ValueError("bad FLAC UTF-8 frame number")
    v = b0 & (mask - 1)
    for _ in range(n):
        c = br.read(8)
        if c & 0xC0 != 0x80:
            raise ValueError("bad FLAC UTF-8 continuation")
        v = (v << 6) | (c & 0x3F)
    return v


def _read_residual(br: _BitReader, n: int, order: int) -> list[int]:
    method = br.read(2)
    if method > 1:
        raise ValueError("reserved FLAC residual method")
    pbits = 4 + method
    escape = (1 << pbits) - 1
    part_order = br.read(4)
    n_parts = 1 << part_order
    if n % n_parts:
        raise ValueError("FLAC partition does not divide block")
    out: list[int] = []
    for p in range(n_parts):
        count = n // n_parts - (order if p == 0 else 0)
        if count < 0:
            raise ValueError("FLAC partition smaller than predictor order")
        param = br.read(pbits)
        if param == escape:
            raw = br.read(5)
            for _ in range(count):
                out.append(br.read_signed(raw) if raw else 0)
        else:
            for _ in range(count):
                q = br.unary()
                u = (q << param) | br.read(param)
                out.append((u >> 1) ^ -(u & 1))  # zigzag
    return out


def _read_subframe(br: _BitReader, n: int, bps: int) -> list[int]:
    if br.read(1):
        raise ValueError("bad FLAC subframe padding bit")
    t = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.unary() + 1
    bps -= wasted
    if t == 0:  # CONSTANT
        v = br.read_signed(bps)
        samples = [v] * n
    elif t == 1:  # VERBATIM
        samples = [br.read_signed(bps) for _ in range(n)]
    elif 8 <= t <= 12:  # FIXED order 0-4
        order = t - 8
        samples = [br.read_signed(bps) for _ in range(order)]
        res = _read_residual(br, n, order)
        coefs = _FIXED_COEFS[order]
        for r in res:
            pred = sum(c * samples[-i - 1] for i, c in enumerate(coefs))
            samples.append(pred + r)
    elif t >= 32:  # LPC order 1-32
        order = t - 31
        samples = [br.read_signed(bps) for _ in range(order)]
        prec = br.read(4) + 1
        if prec == 16:
            raise ValueError("invalid FLAC LPC precision")
        shift = br.read_signed(5)
        if shift < 0:
            raise ValueError("negative FLAC LPC shift")
        coefs = [br.read_signed(prec) for _ in range(order)]
        res = _read_residual(br, n, order)
        for r in res:
            pred = sum(c * samples[-i - 1] for i, c in enumerate(coefs)) >> shift
            samples.append(pred + r)
    else:
        raise ValueError(f"reserved FLAC subframe type {t}")
    if wasted:
        samples = [s << wasted for s in samples]
    return samples


def decode_flac(b: bytes) -> tuple[int, list[float]]:
    """Decode a FLAC payload to (sample_rate, mono float samples)."""
    if b[:4] != b"fLaC":
        raise ValueError("bad FLAC marker")
    pos = 4
    info = None
    while True:
        if pos + 4 > len(b):
            raise ValueError("truncated FLAC metadata")
        hdr = b[pos]
        last = hdr & 0x80
        btype = hdr & 0x7F
        (ln,) = struct.unpack(">I", b"\x00" + b[pos + 1 : pos + 4])
        if pos + 4 + ln > len(b):
            raise ValueError("truncated FLAC metadata block")
        if btype == 0:  # STREAMINFO
            si = b[pos + 4 : pos + 4 + ln]
            if ln < 34:
                raise ValueError("short FLAC STREAMINFO")
            rate = (si[10] << 12) | (si[11] << 4) | (si[12] >> 4)
            channels = ((si[12] >> 1) & 0x07) + 1
            bps = (((si[12] & 1) << 4) | (si[13] >> 4)) + 1
            total = ((si[13] & 0x0F) << 32) | struct.unpack(
                ">I", si[14:18]
            )[0]
            info = (rate, channels, bps, total)
        pos += 4 + ln
        if last:
            break
    if info is None:
        raise ValueError("FLAC missing STREAMINFO")
    rate, channels, bps, total = info
    if rate == 0 or channels < 1:
        raise ValueError("bad FLAC STREAMINFO")

    out: list[float] = []
    scale = float(1 << (bps - 1))
    while pos < len(b) and (total == 0 or len(out) < total):
        frame_start = pos
        br = _BitReader(b, pos)
        sync = br.read(14)
        if sync != 0x3FFE:
            raise ValueError("bad FLAC frame sync")
        br.read(1)  # reserved
        br.read(1)  # blocking strategy
        bs_code = br.read(4)
        sr_code = br.read(4)
        ch_code = br.read(4)
        sz_code = br.read(3)
        br.read(1)  # reserved
        _read_utf8_number(br)
        if bs_code == 0:
            raise ValueError("reserved FLAC block size code")
        elif bs_code == 6:
            n = br.read(8) + 1
        elif bs_code == 7:
            n = br.read(16) + 1
        else:
            n = _BLOCKSIZES[bs_code]
        if sr_code == 12:
            br.read(8)
        elif sr_code in (13, 14):
            br.read(16)
        elif sr_code == 15:
            raise ValueError("invalid FLAC sample rate code")
        if sz_code in _SIZES:
            fbps = _SIZES[sz_code]
        elif sz_code == 0:
            fbps = bps
        else:
            raise ValueError("reserved FLAC sample size code")
        # CRC-8 over the header bytes
        hdr_end = (br.bitpos + 7) >> 3
        if _crc8(b[frame_start:hdr_end]) != br.read(8):
            raise ValueError("FLAC frame header CRC mismatch")
        if ch_code < 8:
            n_ch = ch_code + 1
            chans = [_read_subframe(br, n, fbps) for _ in range(n_ch)]
        elif ch_code in (8, 9, 10):
            a = _read_subframe(br, n, fbps + (1 if ch_code == 9 else 0))
            c2 = _read_subframe(br, n, fbps + (1 if ch_code != 9 else 0))
            if ch_code == 8:  # left/side
                chans = [a, [left - s for left, s in zip(a, c2)]]
            elif ch_code == 9:  # side/right
                chans = [[r + s for s, r in zip(a, c2)], c2]
            else:  # mid/side
                left = []
                right = []
                for m, s in zip(a, c2):
                    m = (m << 1) | (s & 1)
                    left.append((m + s) >> 1)
                    right.append((m - s) >> 1)
                chans = [left, right]
        else:
            raise ValueError("reserved FLAC channel assignment")
        br.align()
        body_end = br.bitpos >> 3
        if body_end + 2 > len(b):
            raise ValueError("truncated FLAC frame footer")
        (crc16,) = struct.unpack_from(">H", b, body_end)
        if _crc16(b[frame_start:body_end]) != crc16:
            raise ValueError("FLAC frame CRC-16 mismatch")
        pos = body_end + 2
        for i in range(n):
            out.append(sum(ch[i] for ch in chans) / len(chans) / scale)
    if total and len(out) > total:
        out = out[:total]
    return rate, out


# --------------------------------------------------------------- encoder

class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, v: int, n: int) -> None:
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.out.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)


def _write_rice(bw: _BitWriter, res: list[int], param: int) -> None:
    bw.write(0, 2)  # method 0: 4-bit params
    bw.write(0, 4)  # partition order 0
    bw.write(param, 4)
    for r in res:
        u = (r << 1) if r >= 0 else ((-r) << 1) - 1
        q = u >> param
        if q > 1 << 20:
            raise ValueError("rice parameter far too small for residuals")
        for _ in range(q):
            bw.write(0, 1)
        bw.write(1, 1)
        bw.write(u & ((1 << param) - 1), param)


def _best_fixed(samples: list[int]) -> tuple[int, list[int]]:
    """Pick the fixed-predictor order (0-4) minimizing |residual| sum."""
    best = (0, samples[:])
    best_cost = sum(abs(s) for s in samples)
    for order in range(1, 5):
        if len(samples) <= order:
            break
        coefs = _FIXED_COEFS[order]
        res = []
        for i in range(order, len(samples)):
            pred = sum(c * samples[i - j - 1] for j, c in enumerate(coefs))
            res.append(samples[i] - pred)
        cost = sum(abs(r) for r in res)
        if cost < best_cost:
            best_cost = cost
            best = (order, res)
    return best


def _write_subframe(bw: _BitWriter, blk: list[int], bps: int) -> None:
    if all(s == blk[0] for s in blk):
        bw.write(0, 1)
        bw.write(0, 6)  # CONSTANT
        bw.write(0, 1)
        bw.write(blk[0], bps)
        return
    order, res = _best_fixed(blk)
    bw.write(0, 1)
    bw.write(8 + order, 6)  # FIXED
    bw.write(0, 1)  # no wasted bits
    for s in blk[:order]:
        bw.write(s, bps)
    mean = max(1, sum(abs(r) for r in res) // max(1, len(res)))
    param = min(14, max(0, mean.bit_length()))
    _write_rice(bw, res, param)


def encode_flac(
    samples: list[int],
    sample_rate: int = 16000,
    bps: int = 16,
    block_size: int = 4096,
    channels: int = 1,
    stereo_mode: str = "independent",
) -> bytes:
    """Encode integer samples as FLAC (lossless test anchor): fixed
    blocks, best FIXED predictor per subframe with order-0 Rice
    partitions, CONSTANT blocks detected, real STREAMINFO MD5. For
    channels=2 `samples` is interleaved L R L R and stereo_mode picks
    the decorrelation — independent / left_side / right_side /
    mid_side — so every decoder channel-assignment path has a
    round-trip anchor."""
    if not 4 <= bps <= 32:
        raise ValueError("bps out of range")
    if channels not in (1, 2):
        raise ValueError("test encoder handles 1-2 channels")
    modes = {"independent": 1, "left_side": 8, "right_side": 9, "mid_side": 10}
    if stereo_mode not in modes:
        raise ValueError(f"bad stereo_mode {stereo_mode}")
    lo, hi = -(1 << (bps - 1)), (1 << (bps - 1)) - 1
    if any(s < lo or s > hi for s in samples):
        raise ValueError("sample out of range for bps")
    if channels == 2 and len(samples) % 2:
        raise ValueError("odd interleaved stereo sample count")
    n_frames_total = len(samples) // channels
    frames = bytearray()
    frame_no = 0
    i = 0
    while i < n_frames_total:
        n = min(block_size, n_frames_total - i)
        bw = _BitWriter()
        bw.write(0x3FFE, 14)
        bw.write(0, 1)
        bw.write(0, 1)  # fixed blocking
        bw.write(7, 4)  # block size: 16-bit field
        bw.write(0, 4)  # sample rate: from STREAMINFO
        if channels == 1:
            ch_code = 0
        elif stereo_mode == "independent":
            ch_code = 1
        else:
            ch_code = modes[stereo_mode]
        bw.write(ch_code, 4)
        bw.write(4 if bps == 16 else (1 if bps == 8 else 0), 3)
        bw.write(0, 1)
        # UTF-8 frame number (our counts stay small; 2 ranges enough)
        if frame_no < 0x80:
            bw.write(frame_no, 8)
        elif frame_no < 0x800:
            bw.write(0xC0 | (frame_no >> 6), 8)
            bw.write(0x80 | (frame_no & 0x3F), 8)
        else:
            raise ValueError("frame number too large for test encoder")
        bw.write(n - 1, 16)
        bw.align()
        hdr = bytes(bw.out)
        bw.write(_crc8(hdr), 8)
        if channels == 1:
            _write_subframe(bw, samples[i : i + n], bps)
        else:
            left = samples[2 * i : 2 * (i + n) : 2]
            right = samples[2 * i + 1 : 2 * (i + n) : 2]
            if stereo_mode == "independent":
                _write_subframe(bw, left, bps)
                _write_subframe(bw, right, bps)
            elif stereo_mode == "left_side":
                side = [l - r for l, r in zip(left, right)]
                _write_subframe(bw, left, bps)
                _write_subframe(bw, side, bps + 1)
            elif stereo_mode == "right_side":
                side = [l - r for l, r in zip(left, right)]
                _write_subframe(bw, side, bps + 1)
                _write_subframe(bw, right, bps)
            else:  # mid_side
                mid = [(l + r) >> 1 for l, r in zip(left, right)]
                side = [l - r for l, r in zip(left, right)]
                _write_subframe(bw, mid, bps)
                _write_subframe(bw, side, bps + 1)
        bw.align()
        body = bytes(bw.out)
        frames += body + struct.pack(">H", _crc16(body))
        i += n
        frame_no += 1

    raw = b"".join(
        struct.pack("<i", s)[: (bps + 7) // 8] for s in samples
    )
    md5 = hashlib.md5(raw).digest()
    si = bytearray()
    si += struct.pack(">HH", block_size, block_size)  # fixed blocking
    si += b"\x00\x00\x00" * 2  # min/max frame size unknown
    total = len(samples) // channels
    si += bytes(
        (
            (sample_rate >> 12) & 0xFF,
            (sample_rate >> 4) & 0xFF,
            ((sample_rate & 0xF) << 4) | ((channels - 1) << 1)
            | ((bps - 1) >> 4),
            ((bps - 1) & 0xF) << 4 | ((total >> 32) & 0x0F),
        )
    )
    si += struct.pack(">I", total & 0xFFFFFFFF)
    si += md5
    out = bytearray(b"fLaC")
    out += bytes((0x80,)) + len(si).to_bytes(3, "big") + si
    out += frames
    return bytes(out)
