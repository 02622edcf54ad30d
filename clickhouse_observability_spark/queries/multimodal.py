"""Multimodal plumbing as a registry entry (rows-only: binary
payloads + stubbed decode have no SQL oracle; pytest covers the
pipeline invariants)."""

from __future__ import annotations

from clickhouse_observability_spark.operators import multimodal as M
from clickhouse_observability_spark.registry import register


@register("multimodal_features")
def multimodal_features(spark, sf_dir):
    """Arrow-batched feature extraction over a deterministic fake
    media table (testdata ships no binary columns; the plumbing —
    schema, mapInPandas batch shape, entropy/luma/sha features — is
    the real deliverable)."""
    media = M.make_fake_media(spark, n=256)
    return M.extract_features(media, fake_decode=True)


@register(
    "multimodal_frame_plan",
    # Oracle-backed since r12 (verdict #5): the plan is pure column
    # math over the deterministic fake-media metadata (videos are
    # media_id % 3 == 2 with duration 1000 + 10*id; frames every
    # 500 ms, stop-inclusive like Spark's sequence()), so DuckDB
    # re-derives it from range() alone. BIGINT on both sides per the
    # registry hash policy.
    oracle="""
    WITH vids AS (
        SELECT CAST(i AS BIGINT) AS media_id,
               CAST(1000 + 10 * i AS BIGINT) AS duration_ms
        FROM range(256) t(i) WHERE i % 3 = 2
    )
    SELECT media_id, duration_ms,
           unnest(range(0, duration_ms + 1, 500)) AS frame_ms
    FROM vids
    """,
)
def multimodal_frame_plan(spark, sf_dir):
    from pyspark.sql import functions as F

    return M.frame_sample_plan(
        M.make_fake_media(spark, n=256), every_ms=500
    ).select(
        F.col("media_id").cast("long").alias("media_id"),
        F.col("duration_ms").cast("long").alias("duration_ms"),
        F.col("frame_ms").cast("long").alias("frame_ms"),
    )


@register("multimodal_resize")
def multimodal_resize(spark, sf_dir):
    """Nearest-neighbor resize of every image payload to 8x8 via the
    Arrow mapInPandas path — REAL pixels: the media table carries
    actual PPM/BMP bytes decoded by the pure-stdlib parsers (no fake
    fallback needed on this path)."""
    return M.resize_images(M.make_real_image_media(spark, n=256), 8, 8, fake_decode=False)


@register("multimodal_frame_extract")
def multimodal_frame_extract(spark, sf_dir):
    """REAL frame sampling over YUV4MPEG2 payloads (r4): decode, pick
    the frame at each 200 ms mark, emit geometry + mean luma + sha —
    frame_sample_plan materialized over actual decoded frames (no
    fake fallback on this path)."""
    return M.extract_frames(
        M.make_real_video_media(spark, n=256), every_ms=200, fake_decode=False
    )


@register("multimodal_audio_features")
def multimodal_audio_features(spark, sf_dir):
    """Audio triage features (duration/RMS/peak/zero-cross) over REAL
    RIFF/WAVE PCM payloads decoded by the pure-stdlib parser — the
    audio analog of multimodal_resize's real-pixel path (r4; no fake
    fallback on this path)."""
    return M.extract_audio_features(
        M.make_real_audio_media(spark, n=256), fake_decode=False
    )


@register("multimodal_phash_pairs")
def multimodal_phash_pairs(spark, sf_dir):
    """Near-duplicate IMAGE detection (r4): perceptual hash (decode ->
    32x32 -> DCT -> median-threshold 64-bit sketch) over REAL decoded
    pixels, paired with the dedup tier's pigeonhole hamming bucket
    join — the multimodal x dedup bridge. The media table plants
    re-encoded duplicates (PPM/PNG/JPEG of the same picture); the
    result is exactly the within-group pairs, pinned by pytest."""
    media = M.make_neardup_image_media(spark, n_groups=48)
    return M.image_neardup_pairs(media, max_hamming=6, fake_decode=False)


@register("multimodal_audio_fp_pairs")
def multimodal_audio_fp_pairs(spark, sf_dir):
    """Near-duplicate AUDIO detection (r4): spectral-peak fingerprint
    over REAL decoded WAV samples (PCM16 / IEEE-float / G.711 mu-law
    re-encodes of the same clips), paired with the shared pigeonhole
    hamming bucket join — the audio arm of the multimodal x dedup
    bridge. Within-group pairs pinned by pytest."""
    media = M.make_neardup_audio_media(spark, n_groups=48)
    return M.audio_neardup_pairs(media, max_hamming=2, fake_decode=False)


@register("multimodal_video_fp_pairs")
def multimodal_video_fp_pairs(spark, sf_dir):
    """Near-duplicate VIDEO detection (r4): per-frame perceptual
    hashes over real YUV4MPEG2 decode, inverted-index join on frame
    identity with a df-cap, overlap-fraction threshold — catches
    re-encodes, fps-header changes and head/tail trims. The video arm
    of the multimodal x dedup bridge; planted groups pinned by
    pytest."""
    media = M.make_neardup_video_media(spark, n_groups=32)
    return M.video_neardup_pairs(
        media, every_ms=100, min_shared_frac=0.5, fake_decode=False
    )


@register("multimodal_training_pipeline")
def multimodal_training_pipeline(spark, sf_dir):
    """The media corpus -> trainer handoff in one plan — the
    multimodal counterpart of text_training_pipeline:

      1. near-dup collapse: pHash pairs over REAL decoded pixels ->
         greedy keep-first (drop any image pairing with a smaller-id
         mate — the same policy streaming admission uses);
      2. uniform tensorization of the survivors: decode -> 16x16
         nearest-neighbor resample via the Arrow mapInPandas path.

    Output: one row per SURVIVING image with its training tensor
    bytes + content sha. Rows-only (r13 audit): every stage consumes
    REAL codec decodes (JPEG/PNG/GIF entropy decoding) of
    generated-in-Spark binary payloads — DuckDB has no image decoder
    and the media rows never exist as a parquet table it could scan,
    so no deterministic cross-engine projection exists at any stage
    boundary. pytest pins the composition invariants instead
    (survivors == keep-list, tensors match standalone resize)."""
    from pyspark.sql import functions as F

    media = M.make_neardup_image_media(spark, n_groups=48)
    dups = M.image_neardup_pairs(media, max_hamming=6, fake_decode=False)
    drop = dups.select(F.col("media_b").alias("media_id")).distinct()
    keepers = media.join(drop, "media_id", "left_anti")
    return M.resize_images(keepers, 16, 16, fake_decode=False)
