"""Multimodal plumbing tests: schema, Arrow batch shape, stub gating."""

from __future__ import annotations

import pytest

from clickhouse_observability_spark.operators import multimodal as M


@pytest.fixture(scope="module")
def media(spark):
    return M.make_fake_media(spark, n=30)


def test_media_schema(media):
    assert media.schema == M.MEDIA_SCHEMA
    kinds = {r.kind for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_decode_stub_is_gated():
    with pytest.raises(NotImplementedError):
        M.decode_image(b"abc", fake=False)
    tile = M.decode_image(b"abc", fake=True)
    assert len(tile) == 8 and len(tile[0]) == 8
    assert tile == M.decode_image(b"abc", fake=True)  # deterministic


def test_feature_extraction(media):
    feats = M.extract_features(media)
    assert feats.schema == M.FEATURE_SCHEMA
    rows = {r.media_id: r for r in feats.collect()}
    assert len(rows) == 30
    r0 = rows[0]
    assert r0.n_bytes > 0 and 0.0 < r0.byte_entropy <= 8.0
    assert len(r0.payload_sha) == 64
    # deterministic across runs
    again = {r.media_id: r.payload_sha for r in M.extract_features(media).collect()}
    assert again == {k: v.payload_sha for k, v in rows.items()}


def test_metadata_prunes_before_decode(spark, media, tmp_path_factory):
    # metadata-only projection over the at-rest table must NOT read
    # the payload column (ReadSchema excludes it) — decoding cost is
    # zero for filtered-out media.
    path = str(tmp_path_factory.mktemp("media") / "media.parquet")
    media.write.parquet(path)
    plan = (
        spark.read.parquet(path)
        .filter("kind = 'image'")
        .select("media_id", "width")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "ReadSchema" in plan and "payload" not in plan


def test_frame_sample_plan(media):
    plan = M.frame_sample_plan(media, every_ms=500)
    rows = plan.filter("media_id = 2").collect()  # video, duration 1020
    assert [r.frame_ms for r in rows] == [0, 500, 1000]


def test_resize_images_shapes_and_determinism(spark):
    media = M.make_fake_media(spark, n=30)
    out = M.resize_images(media, dst_width=4, dst_height=6).collect()
    # images only (a third of the fake table), metadata intact
    assert len(out) == len([r for r in media.collect() if r.kind == "image"])
    for r in out:
        assert r.dst_width == 4 and r.dst_height == 6
        assert len(bytes(r.resized)) == 4 * 6  # one byte per gray pixel
    again = {r.media_id: r.resized_sha for r in
             M.resize_images(media, dst_width=4, dst_height=6).collect()}
    assert again == {r.media_id: r.resized_sha for r in out}


def test_resize_upscale_and_identity(spark):
    media = M.make_fake_media(spark, n=9)
    # identity-size resize of the 8x8 fake decode reproduces the tile
    ident = {r.media_id: bytes(r.resized) for r in
             M.resize_images(media, 8, 8).collect()}
    for r in media.collect():
        if r.kind != "image":
            continue
        tile = M.decode_image(bytes(r.payload), fake=True)
        flat = bytes(b for row in tile for b in row)
        assert ident[r.media_id] == flat
    up = M.resize_images(media, 16, 16).collect()
    assert all(len(bytes(r.resized)) == 256 for r in up)
