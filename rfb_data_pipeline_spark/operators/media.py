"""Multimodal query surface: driver-visible entries over binary media.

The media table is synthesized deterministically (real P6 PPM images,
real RIFF/PCM16 WAV audio, real MP4 boxes — ``functions/multimodal``),
because the driver's parquet corpus has no binary media column. These
queries are ROWS-ONLY by design: DuckDB has no codec surface to twin
the decode, so the value-level pinning lives in ``tests/
test_multimodal.py`` (decoded pixel means, PCM stats, box walks,
header parses are all asserted against known payloads there), and the
driver records the weaker rowcount+schema check.

Scale: mapInPandas over Arrow batches; one shuffle for the per-kind /
per-format aggregate. Media rows are large, so the batch iterator and
``arrow.maxRecordsPerBatch`` bound executor memory; at 100 TB the
table is partitioned by (kind, size-bucket) so decode skew stays
bounded — see functions/multimodal.py scale notes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rfb_data_pipeline_spark.functions.multimodal import (
    audio_stats,
    image_header_meta,
    image_stats,
    synthetic_media,
    video_meta,
)

_N_MEDIA = 96


def m01_image_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Container-header metadata + decoded-pixel stats, reconciled.

    The header parse (library-free PNG/JPEG/GIF/BMP/PPM walk) and the
    real pixel decode must agree on dimensions for every PPM payload —
    the count gate (A7/A13 idiom) applied to media: disagreement or
    NULL-format rows surface in the output instead of vanishing.
    """
    media = synthetic_media(spark, _N_MEDIA)
    hdr = image_header_meta(media).select(
        "media_id", "format", F.col("width").alias("w_hdr"),
        F.col("height").alias("h_hdr"),
    )
    px = image_stats(media).select(
        "media_id", F.col("width").alias("w_px"), F.col("height").alias("h_px")
    )
    joined = hdr.join(px, "media_id", "left")
    return joined.groupBy("format").agg(
        F.count(F.lit(1)).alias("n_images"),
        F.sum(
            (
                (F.col("w_hdr") == F.col("w_px"))
                & (F.col("h_hdr") == F.col("h_px"))
            ).cast("int")
        ).alias("n_dims_reconciled"),
        F.min("w_hdr").alias("min_width"),
        F.max("h_hdr").alias("max_height"),
    )


def m02_media_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-kind decode summary over the full media table: audio PCM
    stats and video container durations from their REAL decoders,
    unioned into one per-kind report row."""
    media = synthetic_media(spark, _N_MEDIA)
    audio = audio_stats(media).agg(
        F.lit("audio").alias("kind"),
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("duration_s"), 3).alias("total_duration_s"),
        F.round(F.max("peak"), 4).alias("max_metric"),
    )
    video = video_meta(media).agg(
        F.lit("video").alias("kind"),
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("duration_ms_real") / 1000.0, 3).alias("total_duration_s"),
        F.round(F.max("duration_ms_real").cast("double"), 4).alias("max_metric"),
    )
    return audio.unionByName(video)


def m03_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling contract: one row per sampled frame per video
    (1 video → N frames row explosion), summarized per video. Offsets
    come from the typed duration metadata (real codec decode is gated
    — functions/multimodal.py tiers); the row-explosion shape and
    per-video summary are the operator's contract."""
    from rfb_data_pipeline_spark.functions.multimodal import frame_sample

    media = synthetic_media(spark, _N_MEDIA)
    frames = frame_sample(media, every_ms=500)
    return frames.groupBy("media_id").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.min("frame_ms").alias("first_ms"),
        F.max("frame_ms").alias("last_ms"),
    )


def m04_audio_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio windowed-energy contract (the m03 row-explosion shape on
    the audio axis): every clip explodes into 10 ms RMS/peak windows
    from the REAL PCM decode, summarized per clip with an
    active-frame count (RMS above a fixed floor — the VAD pre-filter
    a speech-curation pipeline applies before transcription)."""
    from rfb_data_pipeline_spark.functions.multimodal import audio_frame_energy

    media = synthetic_media(spark, _N_MEDIA)
    frames = audio_frame_energy(media, frame_ms=10)
    return frames.groupBy("media_id").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.round(F.avg("rms"), 4).alias("avg_rms"),
        F.round(F.max("peak"), 4).alias("max_peak"),
        F.sum((F.col("rms") > 0.3).cast("int")).alias("n_active_frames"),
    )


QUERIES = {
    "m01_image_metadata": m01_image_metadata,
    "m02_media_stats": m02_media_stats,
    "m03_frame_sample": m03_frame_sample,
    "m04_audio_frames": m04_audio_frames,
}

# Rows-only by design: no DuckDB codec surface exists to twin the
# decoders; value-level assertions live in tests/test_multimodal.py.
ORACLE: dict[str, str] = {}
