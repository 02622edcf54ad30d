"""GIF codec tests: lossless LZW round trips (plain + interlaced),
dictionary-reset stress, multi-frame decode, malformed-input typing,
and the decode_image dispatch."""

from __future__ import annotations

import random

import pytest

from clickhouse_observability_spark.operators import gif as G
from clickhouse_observability_spark.operators import multimodal as M


def _lum(rgb):
    return [[G._luma(*px) for px in row] for row in rgb]


def _random_image(rnd, w, h, ncol):
    pal = [
        tuple(rnd.randrange(256) for _ in range(3)) for _ in range(ncol)
    ]
    return [[pal[rnd.randrange(ncol)] for _ in range(w)] for _ in range(h)]


@pytest.mark.parametrize(
    "w,h,ncol", [(1, 1, 1), (7, 5, 4), (16, 16, 256), (33, 9, 17), (5, 30, 3)]
)
def test_gif_roundtrip_lossless(w, h, ncol):
    rnd = random.Random(11)
    rgb = _random_image(rnd, w, h, ncol)
    assert G.decode_gif_luma(G.encode_gif(rgb)) == _lum(rgb)
    assert G.decode_gif_luma(G.encode_gif(rgb, interlace=True)) == _lum(rgb)


def test_gif_lzw_dictionary_reset():
    # 256-gray noise over 20k pixels exhausts the 4096-entry table:
    # the encoder emits CLEAR and both sides rebuild in lockstep
    rnd = random.Random(5)
    rgb = [[(rnd.randrange(256),) * 3 for _ in range(200)] for _ in range(100)]
    assert G.decode_gif_luma(G.encode_gif(rgb)) == _lum(rgb)


def test_gif_multi_frame():
    # hand-spliced two-frame stream: frames decode independently
    f1 = [[(255, 0, 0), (0, 255, 0)], [(0, 0, 255), (10, 20, 30)]]
    f2 = [[(1, 2, 3)]]
    e1, e2 = G.encode_gif(f1), G.encode_gif(f2)
    # splice: header+gct+frame1 from e1, descriptor+frame from e2
    spliced = e1[:-1] + e2[13 + 3 * 4 : ]  # drop e1 trailer, e2 head+gct(4)
    frames = G.decode_gif_frames(spliced)
    assert len(frames) == 2
    assert frames[0] == _lum(f1)
    # frame 2 references e2's LOCAL geometry but e1's global table is
    # active; splice keeps e2's color table? No — e2's gct was cut, so
    # indexes resolve through e1's table: only geometry is asserted
    assert len(frames[1]) == 1 and len(frames[1][0]) == 1


def test_gif_rejects_malformed():
    good = G.encode_gif([[(1, 2, 3), (4, 5, 6)], [(7, 8, 9), (1, 2, 3)]])
    with pytest.raises(ValueError, match="signature"):
        G.decode_gif_luma(b"NOTGIF" + good[6:])
    for cut in (10, 20, len(good) - 3):
        with pytest.raises(ValueError):
            G.decode_gif_luma(good[:cut])
    with pytest.raises(ValueError, match="distinct colors"):
        G.encode_gif(
            [[(i % 256, i // 256, 0) for i in range(300)]]
        )


def test_gif_fuzz_only_typed_errors():
    rnd = random.Random(3)
    good = G.encode_gif(_random_image(rnd, 20, 12, 30), interlace=True)
    for t in range(300):
        b = bytearray(good)
        if t % 2 == 0:
            b = b[: rnd.randrange(len(b))]
        else:
            for _ in range(rnd.randrange(1, 4)):
                b[rnd.randrange(len(b))] ^= rnd.randrange(1, 256)
        try:
            G.decode_gif_luma(bytes(b))
        except ValueError:
            pass  # the only legal failure type


def test_decode_image_dispatches_gif():
    rgb = [[(10 * c, 5 * r, 30) for c in range(6)] for r in range(4)]
    enc = G.encode_gif(rgb)
    assert M.decode_image(enc) == _lum(rgb)
    with pytest.raises(ValueError):
        M.decode_image(enc[:15], fake=False)
    tile = M.decode_image(enc[:15], fake=True)
    assert len(tile) == 8


def test_gif_animation_roundtrip_with_timing():
    frames = [
        [[((r + f) % 4 * 64, c % 4 * 64, (r + c) % 4 * 64)
          for c in range(10)] for r in range(8)]
        for f in range(5)
    ]
    lum = [[[G._luma(*px) for px in row] for row in fr] for fr in frames]
    for delay, interlace in ((20, False), (5, True)):
        enc = G.encode_gif_animation(frames, delay_cs=delay,
                                     interlace=interlace)
        num, den, got = G.decode_gif_video(enc)
        assert (num, den) == (100, delay) and got == lum
    # single-frame GIF without a GCE: default 10 fps
    num, den, got = G.decode_gif_video(G.encode_gif(frames[0]))
    assert (num, den) == (10, 1) and got == [lum[0]]


def test_gif_video_through_frame_pipeline(spark):
    from clickhouse_observability_spark.operators import multimodal as M

    frames = [
        [[(((r + f) % 4) * 64, (c % 4) * 64, ((r + c) % 4) * 64)
          for c in range(16)] for r in range(12)]
        for f in range(6)
    ]
    payload = G.encode_gif_animation(frames, delay_cs=10)  # 10 fps
    media = spark.createDataFrame(
        [(0, "video", bytearray(payload), 16, 12, None, 600)],
        M.MEDIA_SCHEMA,
    )
    out = M.extract_frames(media, every_ms=200, fake_decode=False).collect()
    assert [(r.frame_ms, r.frame_idx) for r in out] == [
        (0, 0), (200, 2), (400, 4), (600, 5)
    ]
    import numpy as np

    lum = [[[G._luma(*px) for px in row] for row in fr] for fr in frames]
    fp = {r.frame_idx: r.fphash for r in
          M.frame_phashes(media, every_ms=200, fake_decode=False).collect()}
    for idx, hp in fp.items():
        assert hp == M.phash64(np.asarray(lum[idx], dtype=np.uint8))
