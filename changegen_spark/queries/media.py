"""Real-media decode parity queries over the shipped fixture.

The multimodal contract the reference world cares about — media as opaque
binary columns decoded executor-side — verified on REAL bytes: PNG, GIF,
and baseline JPEG images, PCM/float WAV audio, and Y4M raw video, all
generated without PIL/libav (tools/make_media.py).  The Spark side runs
the actual decode stages from multimodal/assets.py (Arrow-batched
``mapInPandas``, map-only); the DuckDB oracle reads the fixture's expected
columns, which were computed from the raw SOURCE arrays before encoding.
Lossless codecs must reproduce those arrays bit-for-bit, so a hash-match
is end-to-end evidence the decoders are correct — the same
shipped-artifact oracle pattern as ``q_external_decontaminate`` and
``q_reference_goldens``.  JPEG is lossy, so its expected values are a
decode-determinism pin instead (multimodal/jpeg.py docstring has the
two-implementation evidence chain).

Scale notes: every stage is map-only over a binary column (no shuffle, no
driver traffic); at 100 TB the fixture parquet is replaced by the media
lake and the plan is unchanged.  All outputs are integers (e6-scaled) so
the digest/oracle never compares engine float formatting.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from changegen_spark.multimodal.assets import (
    decode_audio,
    decode_images,
    frame_motion,
    sample_frames,
)

FIXDIR = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..", "fixtures")
)
ASSETS_PATH = os.path.join(FIXDIR, "media_assets.parquet")
FRAMES_PATH = os.path.join(FIXDIR, "media_frames.parquet")

FRAME_EVERY = 2  # q_media_frame_stats keeps every 2nd frame


def _assets(spark: SparkSession) -> DataFrame:
    return spark.read.parquet(ASSETS_PATH)


def q_media_image_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every fixture image (PNG: all 5 filters x 4 color types; GIF: palette
    sizes 4..256, plain + interlaced) decoded to (width, height, e6 mean
    luma).  ``sf_dir`` is unused — the fixture is the versioned input."""
    a = _assets(spark)
    dec = decode_images(a).filter(F.col("ok"))
    fmts = a.select("asset_id", "fmt")
    return (
        dec.join(fmts, "asset_id")
        .select(
            "asset_id",
            "fmt",
            "width",
            "height",
            # decode_images computes mean_px as the integer-exact
            # ((sum*1e6 + n/2) // n) / 1e6, so *1e6 rounds back to the
            # builder's integer exactly
            F.round(F.col("mean_px") * 1_000_000).cast("long").alias("mean_e6"),
        )
        .orderBy("asset_id")
    )


Q_MEDIA_IMAGE_SQL = f"""
SELECT asset_id, fmt, CAST(exp_width AS INT) AS width,
       CAST(exp_height AS INT) AS height, exp_mean_e6 AS mean_e6
FROM '{ASSETS_PATH}' WHERE kind = 'image' ORDER BY asset_id
"""


def q_media_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every fixture WAV (PCM 8/16/24/32-bit and IEEE float32, mono+stereo)
    decoded to the shared integer feature set — time-domain (duration,
    rms, peak, zero crossings) AND rfft spectral (centroid, 85%-energy
    rolloff) — from multimodal/wav.py."""
    a = _assets(spark)
    dec = decode_audio(a).filter(F.col("ok"))
    fmts = a.select("asset_id", "fmt")
    return (
        dec.join(fmts, "asset_id")
        .select(
            "asset_id", "fmt", "sample_rate", "n_channels", "n_frames",
            "duration_e6", "rms_e6", "peak_e6", "zero_crossings",
            "centroid_e3", "rolloff_e3",
        )
        .orderBy("asset_id")
    )


Q_MEDIA_AUDIO_SQL = f"""
SELECT asset_id, fmt, CAST(exp_sample_rate AS INT) AS sample_rate,
       CAST(exp_n_channels AS INT) AS n_channels, exp_n_frames AS n_frames,
       exp_duration_e6 AS duration_e6, exp_rms_e6 AS rms_e6,
       exp_peak_e6 AS peak_e6, exp_zero_crossings AS zero_crossings,
       exp_centroid_e3 AS centroid_e3, exp_rolloff_e3 AS rolloff_e3
FROM '{ASSETS_PATH}' WHERE kind = 'audio' ORDER BY asset_id
"""


def q_media_mel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-mel filterbank energies per fixture WAV (8 HTK-mel triangular
    bands, e3 ints) — the canonical audio-ML front end as a decode stage
    (multimodal/assets.extract_mel; shared-definition parity against the
    fixture's pre-encoding arrays, like every media oracle)."""
    from changegen_spark.multimodal.assets import extract_mel

    a = _assets(spark)
    return (
        extract_mel(a)
        .filter(F.col("ok"))
        .select("asset_id", "band", "log_mel_e3")
        .orderBy("asset_id", "band")
    )


Q_MEDIA_MEL_SQL = f"""
SELECT asset_id,
       CAST(generate_subscripts(exp_mel_e3, 1) - 1 AS INT) AS band,
       unnest(exp_mel_e3) AS log_mel_e3
FROM '{ASSETS_PATH}' WHERE kind = 'audio'
ORDER BY asset_id, band
"""


def q_media_frame_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Y4M frame sampling (every 2nd frame, FRAME_EVERY) across chroma
    formats 420/422/444/mono → per-kept-frame integer mean luma."""
    a = _assets(spark)
    kept = sample_frames(a, every=FRAME_EVERY)
    return kept.select(
        "asset_id",
        F.col("frame_idx").cast("long").alias("frame_idx"),
        F.round(F.col("mean_px") * 1_000_000).cast("long").alias("mean_luma_e6"),
    ).orderBy("asset_id", "frame_idx")


Q_MEDIA_FRAMES_SQL = f"""
SELECT asset_id, frame_idx, exp_mean_e6 AS mean_luma_e6
FROM '{FRAMES_PATH}' WHERE frame_idx % {FRAME_EVERY} = 0
ORDER BY asset_id, frame_idx
"""


def q_media_motion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per consecutive frame pair of every Y4M asset: integer-exact mean
    absolute luma difference (the cheap motion metric)."""
    a = _assets(spark)
    return frame_motion(a).select(
        "asset_id",
        F.col("frame_idx").cast("long").alias("frame_idx"),
        "mad_e6",
    ).orderBy("asset_id", "frame_idx")


Q_MEDIA_MOTION_SQL = f"""
SELECT asset_id, frame_idx, exp_mad_e6 AS mad_e6
FROM '{FRAMES_PATH}' WHERE frame_idx >= 1
ORDER BY asset_id, frame_idx
"""


def q_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every fixture image decoded and box-downsampled 2x (the thumbnail /
    preprocessing stage): (asset_id, fmt, rwidth, rheight, rmean_e6).  The
    oracle reads expectations computed by the fixture builder's
    INDEPENDENT plain-Python resizer (numpy block-sum here vs nested
    loops there — tools/make_media.py resize2_expected); lossless formats
    chain source→encode→decode→resize, JPEG chains through its
    decode-determinism pin."""
    from changegen_spark.multimodal.assets import resize_images

    a = _assets(spark)
    res = resize_images(a).filter(F.col("ok"))
    return (
        res.join(a.select("asset_id", "fmt"), "asset_id")
        .select("asset_id", "fmt", "rwidth", "rheight", "rmean_e6")
        .orderBy("asset_id")
    )


Q_MEDIA_RESIZE_SQL = f"""
SELECT asset_id, fmt, CAST(exp_rwidth AS INT) AS rwidth,
       CAST(exp_rheight AS INT) AS rheight, exp_rmean_e6 AS rmean_e6
FROM '{ASSETS_PATH}' WHERE kind = 'image' ORDER BY asset_id
"""


def q_media_dhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every fixture image's perceptual difference hash (dHash, 16 hex
    chars) — the multimodal dedup key.  The oracle reads expectations
    computed by the fixture builder's INDEPENDENT plain-Python
    implementation (tools/make_media.py dhash_expected vs the engine's
    numpy region sums); lossless formats chain source→encode→decode→hash,
    JPEG chains through its decode-determinism pin."""
    from changegen_spark.multimodal.assets import dhash_images

    a = _assets(spark)
    d = dhash_images(a).filter(F.col("ok"))
    return (
        d.join(a.select("asset_id", "fmt"), "asset_id")
        .select("asset_id", "fmt", "dhash")
        .orderBy("asset_id")
    )


Q_MEDIA_DHASH_SQL = f"""
SELECT asset_id, fmt, exp_dhash AS dhash
FROM '{ASSETS_PATH}' WHERE kind = 'image' ORDER BY asset_id
"""


QUERIES = {
    "q_media_dhash": q_media_dhash,
    "q_media_image_decode": q_media_image_decode,
    "q_media_resize": q_media_resize,
    "q_media_audio_features": q_media_audio_features,
    "q_media_mel": q_media_mel,
    "q_media_frame_stats": q_media_frame_stats,
    "q_media_motion": q_media_motion,
}

ORACLES = {
    "q_media_dhash": Q_MEDIA_DHASH_SQL,
    "q_media_image_decode": Q_MEDIA_IMAGE_SQL,
    "q_media_resize": Q_MEDIA_RESIZE_SQL,
    "q_media_audio_features": Q_MEDIA_AUDIO_SQL,
    "q_media_mel": Q_MEDIA_MEL_SQL,
    "q_media_frame_stats": Q_MEDIA_FRAMES_SQL,
    "q_media_motion": Q_MEDIA_MOTION_SQL,
}
