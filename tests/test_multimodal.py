"""Multimodal plumbing tests: schema, Arrow batch shape, deterministic
stub decode, frame-sampling explosion (stub + real MJPEG tiers), and
the fail-loud ValueError gate for formats with no native decode tier.
"""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from rfb_data_pipeline_spark.functions import multimodal as mm


def test_decode_features_shapes_and_determinism(spark):
    media = mm.synthetic_media(spark, n=30)
    feats = mm.decode_features(media)
    rows = feats.collect()
    assert len(rows) == 30
    assert feats.schema == mm.DECODED_SCHEMA
    by_id = {r.media_id: r for r in rows}
    assert all(len(r.features) == mm.FEATURE_DIM for r in rows)
    assert all(0.0 <= x < 1.0 for x in by_id[0].features)
    # deterministic: second run bit-identical
    rows2 = {r.media_id: r.features for r in mm.decode_features(media).collect()}
    assert all(rows2[i] == by_id[i].features for i in by_id)


def test_decode_runs_batched_not_row_at_a_time(spark):
    media = mm.synthetic_media(spark, n=40).repartition(2)
    rows = mm.decode_features(media, with_batch_rows=True).collect()
    # Arrow batches: rows travel in multi-row batches, not one-by-one
    assert max(r.batch_rows for r in rows) > 1
    assert len({r.batch_rows for r in rows}) <= 4  # few distinct batches


def test_frame_sample_explodes_videos_only(spark):
    media = mm.synthetic_media(spark, n=12)
    frames = mm.frame_sample(media, every_ms=1000)
    got = frames.groupBy("media_id").agg(F.count(F.lit(1)).alias("n")).collect()
    # videos have duration 4000ms → 5 sampled frames (0..4000 step 1000)
    assert got and all(r.n == 5 for r in got)
    kinds = dict(
        mm.synthetic_media(spark, 12).select("media_id", "kind").collect()
    )
    assert all(kinds[r.media_id] == "video" for r in got)


def test_frame_sample_real_tier_decodes_mjpeg(spark):
    """decode_stub=False (r09): MJPEG-in-BMFF payloads demux via the
    sample table and each sampled frame is REALLY decoded — per-frame
    channel sums match the pre-encode rasters within the q=100
    codec tolerance (3 per pixel per channel)."""
    import numpy as np

    n_frames, h, w = 4, 8, 10
    rngs = [np.random.default_rng(100 + k) for k in range(n_frames)]
    frames = [
        r.integers(0, 256, (h, w, 3), dtype=np.uint8) for r in rngs
    ]
    mp4 = mm.encode_mjpeg_mp4(frames, frame_dur_ms=500, quality=100)
    media = spark.createDataFrame(
        [(7, "video", bytearray(mp4), (w, h, None, 2000, "mp4"))],
        mm.MEDIA_SCHEMA,
    )
    rows = (
        mm.frame_sample(media, every_ms=500, decode_stub=False)
        .orderBy("frame_ms")
        .collect()
    )
    # ticks 0,500,1000,1500 -> samples 0..3 (last tick == last t)
    assert [r.frame_idx for r in rows] == [0, 1, 2, 3]
    assert all((r.width, r.height) == (w, h) for r in rows)
    tol = 3 * h * w
    for r in rows:
        src = frames[r.frame_idx].astype(np.int64)
        for ch, col in enumerate(("sum_r", "sum_g", "sum_b")):
            assert abs(r[col] - int(src[:, :, ch].sum())) <= tol, (
                r.frame_idx, col
            )
    # a metadata-only container (no trak) fails loud in the worker
    bare = spark.createDataFrame(
        [(8, "video", bytearray(mm.encode_minimal_mp4(1000)),
          (None, None, None, 1000, "mp4"))],
        mm.MEDIA_SCHEMA,
    )
    with pytest.raises(Exception, match="no video track"):
        mm.frame_sample(bare, every_ms=500, decode_stub=False).collect()


def test_real_decode_gate(spark):
    """decode_stub=False (r09): PPM, PNG and baseline JPEG payloads
    all decode natively end-to-end; a format with no native tier
    (GIF here) fails LOUD in the worker, and a corrupt JPEG fails
    with the codec's contract ValueError rather than decoding junk."""
    import numpy as np

    from rfb_data_pipeline_spark.functions.jpeg import encode_jpeg

    img = np.frombuffer(
        mm._md5_chain_bytes("gate-img", 5 * 4 * 3), dtype=np.uint8
    ).reshape(4, 5, 3)
    ok_rows = [
        (0, "image", bytearray(mm.encode_ppm(img)), (5, 4, None, None, "ppm")),
        (1, "image", bytearray(mm.encode_png(img)), (5, 4, None, None, "png")),
        (2, "image", bytearray(encode_jpeg(img, quality=100)),
         (5, 4, None, None, "jpg")),
    ]
    ok = spark.createDataFrame(ok_rows, mm.MEDIA_SCHEMA)
    feats = {
        r.media_id: r.features
        for r in mm.decode_features(ok, decode_stub=False).collect()
    }
    # PPM and PNG of the SAME raster produce the SAME real features
    assert feats[0] == feats[1]
    # the JPEG tier is REAL: q=100 features agree within the codec's
    # round-trip tolerance (3/255 per pixel, so well under 0.02 per
    # thumbnail cell) and are nothing like the md5 stub
    assert max(
        abs(a - b) for a, b in zip(feats[2], feats[0])
    ) < 0.02
    assert feats[2] != mm._fake_features(bytes(ok_rows[2][2]))

    mp3_like = [(3, "audio", bytearray(b"ID3" + b"\x00" * 16),
                 (None, None, None, None, "mp3"))]
    bad = spark.createDataFrame(mp3_like, mm.MEDIA_SCHEMA)
    with pytest.raises(Exception, match="no native decode tier"):
        mm.decode_features(bad, decode_stub=False).collect()
    # GIF has a REAL tier since r10: a junk GIF-prefixed payload now
    # fails as corrupt GIF, not as tier-less
    gif_like = [(5, "image", bytearray(b"GIF89a" + b"\x00" * 16),
                 (None, None, None, None, "gif"))]
    with pytest.raises(Exception, match="GIF"):
        mm.decode_features(
            spark.createDataFrame(gif_like, mm.MEDIA_SCHEMA),
            decode_stub=False,
        ).collect()

    corrupt = [(4, "image", bytearray(b"\xff\xd8\xff\xe0JFIF-ish"),
                (None, None, None, None, "jpg"))]
    with pytest.raises(Exception, match="truncated JPEG|missing SOF"):
        mm.decode_features(
            spark.createDataFrame(corrupt, mm.MEDIA_SCHEMA),
            decode_stub=False,
        ).collect()


# -- PPM real-decode tier ---------------------------------------------------


def test_ppm_roundtrip_identity():
    import numpy as np

    rng = np.arange(6 * 8 * 3, dtype=np.uint8).reshape(6, 8, 3)
    assert np.array_equal(mm.decode_ppm(mm.encode_ppm(rng)), rng)


def test_ppm_header_grammar():
    import numpy as np

    img = np.full((2, 3, 3), 7, dtype=np.uint8)
    # comments and arbitrary whitespace in the header must parse
    raw = b"P6 # a comment\n # another\n 3\t2\n255\n" + img.tobytes()
    assert np.array_equal(mm.decode_ppm(raw), img)
    with pytest.raises(ValueError):
        mm.decode_ppm(b"P5\n1 1\n255\n\x00")  # wrong magic
    with pytest.raises(ValueError):
        mm.decode_ppm(b"P6\n2 2\n255\n\x00\x00")  # truncated raster


def test_resize_nearest_shapes_and_values():
    import numpy as np

    img = np.zeros((4, 4, 3), dtype=np.uint8)
    img[2:, :, :] = 255  # bottom half white
    small = mm.resize_nearest(img, 2, 2)
    assert small.shape == (2, 2, 3)
    assert small[0].max() == 0 and small[1].min() == 255


def test_image_stats_decodes_real_pixels(spark):
    import numpy as np

    media = mm.synthetic_media(spark, n=12)
    stats = {r.media_id: r for r in mm.image_stats(media).collect()}
    metas = {
        r.media_id: r.meta
        for r in media.filter(F.col("kind") == "image").collect()
    }
    assert set(stats) == set(metas)
    for mid, r in stats.items():
        # decoded dimensions agree with the typed metadata
        assert (r.width, r.height) == (metas[mid].width, metas[mid].height)
        # channel means recomputed here from the same deterministic pixels
        img = mm.decode_ppm(mm._synthetic_ppm(mid))
        means = img.astype(np.float64).mean(axis=(0, 1))
        assert abs(r.mean_r - means[0]) < 1e-4
        assert abs(r.mean_g - means[1]) < 1e-4
        assert abs(r.mean_b - means[2]) < 1e-4


def test_decode_features_uses_real_path_for_images(spark):
    media = mm.synthetic_media(spark, n=6)
    rows = {r.media_id: r for r in mm.decode_features(media).collect()}
    # image rows: features are the 4x4 grayscale thumbnail of the
    # DECODED pixels, not the md5 fake over the raw payload bytes
    img0 = mm.decode_ppm(mm._synthetic_ppm(0))
    assert rows[0].features == pytest.approx(mm.ppm_features(img0), abs=1e-6)
    fake = mm._fake_features(mm._synthetic_ppm(0))
    assert rows[0].features != pytest.approx(fake, abs=1e-6)


def test_wav_roundtrip_identity():
    import numpy as np

    samples = np.frombuffer(b"".join(bytes([i, 255 - i]) for i in range(256)), dtype="<i2")
    rate, back = mm.decode_wav(mm.encode_wav(samples, 8000))
    assert rate == 8000
    assert np.array_equal(back, samples)


def test_wav_chunk_walk_skips_extra_chunks():
    """Real WAV files interleave LIST/fact chunks before data and pad
    odd-sized chunks — the decoder must walk, not assume offsets."""
    import numpy as np
    import struct as st

    samples = np.arange(-5, 5, dtype="<i2")
    base = mm.encode_wav(samples, 16000)
    fmt_and_data = base[12:]
    # inject an odd-sized LIST chunk (walks must pad to word boundary)
    extra = b"LIST" + st.pack("<I", 5) + b"INFOx" + b"\x00"
    payload = base[:12] + extra + fmt_and_data
    rate, back = mm.decode_wav(payload)
    assert rate == 16000
    assert np.array_equal(back, samples)


def test_wav_stereo_downmix_and_rejects():
    import numpy as np
    import struct as st

    # hand-build a 2-channel PCM16 file: L=100, R=300 -> mono mean 200
    data = np.array([100, 300, -100, -300], dtype="<i2").tobytes()
    fmt = b"fmt " + st.pack("<IHHIIHH", 16, 1, 2, 16000, 64000, 4, 16)
    payload = (
        b"RIFF" + st.pack("<I", 36 + len(data)) + b"WAVE"
        + fmt + b"data" + st.pack("<I", len(data)) + data
    )
    rate, mono = mm.decode_wav(payload)
    assert list(mono) == [200, -200]
    with pytest.raises(ValueError):
        mm.decode_wav(b"RIFX" + payload[4:])  # wrong magic
    with pytest.raises(ValueError):
        mm.decode_wav(payload.replace(b"data", b"datx"))  # no data chunk


def test_audio_stats_decodes_real_samples(spark):
    """Distributed WAV decode must equal the local numpy reference."""
    import numpy as np

    media = mm.synthetic_media(spark, 12)
    rows = {r["media_id"]: r for r in mm.audio_stats(media).collect()}
    audio_ids = [i for i in range(12) if i % 3 == 1]
    assert set(rows) == set(audio_ids)
    for i in audio_ids:
        rate, samples = mm.decode_wav(mm._synthetic_wav(i))
        dur, rms, peak, zcr = mm.wav_features(rate, samples)
        r = rows[i]
        assert r["sample_rate"] == 16000
        assert r["n_samples"] == len(samples)
        assert abs(r["rms"] - rms) < 1e-12
        assert abs(r["peak"] - peak) < 1e-12
        assert abs(r["zero_cross_rate"] - zcr) < 1e-12
        assert abs(r["duration_s"] - dur) < 1e-12


def test_mp4_box_walk_roundtrip_and_largesize():
    import struct as st

    payload = mm.encode_minimal_mp4(4250, timescale=600)
    brand, timescale, dur = mm.parse_mp4_meta(payload)
    assert (brand, timescale, dur) == ("isom", 600, 4250)

    # real files interleave unknown boxes — the walk must skip them
    free = st.pack(">I", 12) + b"free" + b"\x00" * 4
    ftyp_end = st.unpack(">I", payload[:4])[0]
    injected = payload[:ftyp_end] + free + payload[ftyp_end:]
    assert mm.parse_mp4_meta(injected)[2] == 4250

    # 64-bit largesize moov header (size==1 + 8-byte size)
    moov = payload[ftyp_end:]
    body = moov[8:]
    big = st.pack(">I", 1) + b"moov" + st.pack(">Q", 16 + len(body)) + body
    assert mm.parse_mp4_meta(payload[:ftyp_end] + big)[2] == 4250

    with pytest.raises(ValueError):
        mm.parse_mp4_meta(b"\x00\x00\x00\x08junk")


def test_video_meta_decodes_real_boxes(spark):
    media = mm.synthetic_media(spark, 12)
    rows = {r["media_id"]: r for r in mm.video_meta(media).collect()}
    video_ids = [i for i in range(12) if i % 3 == 2]
    assert set(rows) == set(video_ids)
    for i in video_ids:
        assert rows[i]["major_brand"] == "isom"
        assert rows[i]["duration_ms_real"] == 4000 + (i % 4) * 250


# -- container-header parsing (real, library-free) --------------------------

import struct as _struct

import numpy as _np


def _png(w, h, depth=8):
    return (
        b"\x89PNG\r\n\x1a\n"
        + b"\x00\x00\x00\x0dIHDR"
        + _struct.pack(">II", w, h)
        + bytes([depth, 2, 0, 0, 0])
        + b"\x00" * 4
    )


def _jpeg(w, h, precision=8):
    app0 = b"\xff\xe0\x00\x10JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    sof0 = b"\xff\xc0\x00\x11" + bytes([precision]) + _struct.pack(">HH", h, w)
    return b"\xff\xd8" + app0 + sof0 + b"\x00" * 12


def _gif(w, h, packed=0xF7):
    return b"GIF89a" + _struct.pack("<HH", w, h) + bytes([packed, 0, 0]) + b"\x00" * 4


def _bmp(w, h, bpp=24):
    return (
        b"BM"
        + b"\x00" * 12
        + _struct.pack("<I", 40)
        + _struct.pack("<ii", w, h)
        + _struct.pack("<HH", 1, bpp)
        + b"\x00" * 8
    )


def test_parse_image_header_formats():
    assert mm.parse_image_header(_png(640, 480, 16)) == ("png", 640, 480, 16)
    assert mm.parse_image_header(_jpeg(1024, 768)) == ("jpeg", 1024, 768, 8)
    assert mm.parse_image_header(_gif(320, 200)) == ("gif", 320, 200, 8)
    # packed 0x71: color resolution (bits 4-6) = 8, GCT size exponent
    # (bits 0-2) = 1 — distinguishes the two fields (ADVICE r03: 0xF7
    # has both equal to 7, so it could not catch reading the wrong bits)
    assert mm.parse_image_header(_gif(320, 200, packed=0x71)) == ("gif", 320, 200, 8)
    assert mm.parse_image_header(_gif(16, 16, packed=0x07)) == ("gif", 16, 16, 1)
    # BMP stores bottom-up rows as positive height, top-down as negative
    assert mm.parse_image_header(_bmp(800, -600)) == ("bmp", 800, 600, 24)
    ppm = mm.encode_ppm(_np.zeros((6, 8, 3), dtype=_np.uint8))
    assert mm.parse_image_header(ppm) == ("ppm", 8, 6, 8)


def test_parse_image_header_jpeg_walks_past_segments():
    # SOF behind several APPn/COM segments and restart-style markers
    segs = b"".join(
        b"\xff" + bytes([m]) + _struct.pack(">H", 6) + b"abcd"
        for m in (0xE1, 0xE2, 0xFE, 0xDB)
    )
    sof2 = b"\xff\xc2\x00\x11\x0c" + _struct.pack(">HH", 10, 20)
    raw = b"\xff\xd8" + segs + sof2
    assert mm.parse_image_header(raw) == ("jpeg", 20, 10, 12)


def test_parse_image_header_rejects_garbage_and_truncated():
    assert mm.parse_image_header(b"") == (None, None, None, None)
    assert mm.parse_image_header(b"not an image at all") == (None, None, None, None)
    assert mm.parse_image_header(b"\x89PNG\r\n\x1a\n\x00\x00") == (
        None,
        None,
        None,
        None,
    )
    # JPEG with no SOF before EOF
    assert mm.parse_image_header(b"\xff\xd8\xff\xe0\x00\x04ab") == (
        None,
        None,
        None,
        None,
    )


def test_image_header_meta_keeps_unknown_rows(spark):
    rows = [
        (0, "image", bytearray(_png(9, 7)), None),
        (1, "image", bytearray(_jpeg(33, 44)), None),
        (2, "image", bytearray(b"corrupt payload"), None),
        (3, "audio", bytearray(b"RIFF"), None),  # filtered by kind
    ]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    got = {
        r["media_id"]: r
        for r in mm.image_header_meta(media).collect()
    }
    assert set(got) == {0, 1, 2}  # audio row filtered, corrupt row KEPT
    assert (got[0]["format"], got[0]["width"], got[0]["height"]) == ("png", 9, 7)
    assert (got[1]["format"], got[1]["width"], got[1]["height"]) == ("jpeg", 33, 44)
    assert got[2]["format"] is None and got[2]["width"] is None


def test_audio_frame_energy_matches_numpy(spark):
    """Windowed RMS/peak per 10 ms frame equals a local numpy model,
    including the trailing partial window."""
    import numpy as np

    media = mm.synthetic_media(spark, 12)
    got = {}
    for r in mm.audio_frame_energy(media, frame_ms=10).collect():
        got.setdefault(r["media_id"], []).append(r)
    audio_ids = [i for i in range(12) if i % 3 == 1]
    assert set(got) == set(audio_ids)
    for i in audio_ids:
        rate, samples = mm.decode_wav(mm._synthetic_wav(i))
        x = samples.astype(np.float64) / 32768.0
        step = rate * 10 // 1000  # 160 samples per 10 ms at 16 kHz
        frames = sorted(got[i], key=lambda r: r["frame_idx"])
        n_expect = -(-len(x) // step)  # ceil: trailing partial kept
        assert len(frames) == n_expect
        for k, fr in enumerate(frames):
            w = x[k * step : (k + 1) * step]
            assert fr["start_ms"] == k * step * 1000.0 / rate
            assert abs(fr["rms"] - float(np.sqrt(np.mean(w * w)))) < 1e-12
            assert abs(fr["peak"] - float(np.max(np.abs(w)))) < 1e-12


def test_m04_audio_frames_summary(spark):
    from rfb_data_pipeline_spark.operators.media import m04_audio_frames

    rows = {r["media_id"]: r for r in m04_audio_frames(spark, "").collect()}
    assert rows  # audio rows exist in the synthetic table
    for r in rows.values():
        # 50-90 ms clips at 10 ms windows → 5..9 frames
        assert 5 <= r["n_frames"] <= 9
        assert 0 < r["max_peak_abs"] <= 32768
        assert r["total_energy"] > 0
        assert 0 <= r["n_active_frames"] <= r["n_frames"]
    # activity floor is non-vacuous on stock data: some frames clear
    # it, some don't (a floor that always or never fires would make
    # the oracle row blind to the energy computation)
    total = sum(r["n_frames"] for r in rows.values())
    active = sum(r["n_active_frames"] for r in rows.values())
    assert 0 < active < total


def test_m01_m02_integer_metrics_match_python_model(spark):
    """The rebuilt codec-tier aggregates equal a local numpy model over
    the same synthetic payloads (decode → integer metrics → rollup)."""
    import numpy as np

    from rfb_data_pipeline_spark.operators.media import (
        _N_MEDIA,
        m01_image_metadata,
        m02_media_stats,
    )

    model = {}
    for i in range(0, _N_MEDIA, 3):
        img = mm.decode_ppm(mm._synthetic_ppm(i))
        h, w = img.shape[:2]
        cls = "large" if w * h >= 120 else "small"
        agg = model.setdefault(cls, [0, 0, 10**9, 0, 0, 0, 0])
        sums = img.astype(np.int64).sum(axis=(0, 1))
        agg[0] += 1
        agg[1] += 1
        agg[2] = min(agg[2], w)
        agg[3] = max(agg[3], h)
        agg[4] += int(sums[0])
        agg[5] += int(sums[1])
        agg[6] += int(sums[2])
    got = {
        r["size_class"]: [
            r["n_images"], r["n_dims_reconciled"], r["min_width"],
            r["max_height"], r["sum_r"], r["sum_g"], r["sum_b"],
        ]
        for r in m01_image_metadata(spark, "").collect()
    }
    assert got == model
    assert set(got) == {"large", "small"}  # threshold is non-vacuous

    m02 = {r["kind"]: r for r in m02_media_stats(spark, "").collect()}
    wav_bytes = sum(
        len(mm._synthetic_wav(i)) for i in range(1, _N_MEDIA, 3)
    )
    assert m02["audio"]["total_payload_bytes"] == wav_bytes
    assert m02["video"]["total_payload_bytes"] == sum(
        len(mm.encode_minimal_mp4(4000 + (i % 4) * 250))
        for i in range(2, _N_MEDIA, 3)
    )
    assert m02["audio"]["total_duration_ms"] == sum(
        (800 + (i % 5) * 160) * 1000 // 16000 for i in range(1, _N_MEDIA, 3)
    )
    assert m02["video"]["max_duration_ms"] == 4750


def test_m05_expression_grammar_matches_real_ppm_encoder(spark):
    """m05's shared preamble grammar (PPM_HEADER_RE) parses REAL
    encoder-produced PPM bytes to the same dimensions the full codec
    parser recovers — pinning the oracle-backed metadata tier to the
    codec tier."""
    import re

    import numpy as np

    from rfb_data_pipeline_spark.functions.multimodal import (
        encode_ppm,
        parse_image_header,
    )
    from rfb_data_pipeline_spark.operators.media import PPM_HEADER_RE

    for w, h in ((8, 6), (32, 22), (13, 7)):
        raw = encode_ppm(np.zeros((h, w, 3), dtype=np.uint8))
        fmt, pw, ph, _ = parse_image_header(raw)
        assert (fmt, pw, ph) == ("ppm", w, h)
        m = re.match(PPM_HEADER_RE, raw[:16].decode("utf-8", "replace"))
        assert m and (int(m.group(1)), int(m.group(2))) == (w, h)
        assert int(m.group(3)) == 255


def test_m05_aggregate_matches_python_model(spark):
    """The driver-visible m05 aggregate matches a Python model over
    the actual sf0.001 doc_ids (construction + parse + rollup)."""
    import duckdb

    from rfb_data_pipeline_spark.operators.media import m05_header_parse

    sf = "/root/testdata/sf0.001"
    doc_ids = [
        r[0]
        for r in duckdb.sql(
            f"SELECT doc_id FROM read_parquet('{sf}/documents.parquet')"
        ).fetchall()
    ]
    model = {}
    for i in doc_ids:
        w, h = 8 + i % 25, 6 + i % 17
        cls = "large" if w * h >= 300 else "small"
        agg = model.setdefault(cls, [0, 10**9, 0, 10**9, 0, 0, 0])
        agg[0] += 1
        agg[1], agg[2] = min(agg[1], w), max(agg[2], w)
        agg[3], agg[4] = min(agg[3], h), max(agg[4], h)
        agg[5] += w * h * 3
        agg[6] += 1  # maxval is always 255 in this construction

    got = {
        r["size_class"]: [
            r["n_images"], r["min_width"], r["max_width"], r["min_height"],
            r["max_height"], r["total_px_bytes"], r["n_maxval_255"],
        ]
        for r in m05_header_parse(spark, sf).collect()
    }
    assert got == model


# -- PNG real-decode tier (stdlib zlib, r08) --------------------------------


def test_png_roundtrip_identity_all_filters():
    """encode_png cycles filter types 0..4 per scanline, so a >=5-row
    round-trip exercises every unfilter branch (None/Sub/Up/Average/
    Paeth) against the same source raster."""
    import numpy as np

    rng = np.frombuffer(
        mm._md5_chain_bytes("png-rt", 7 * 9 * 3), dtype=np.uint8
    ).reshape(7, 9, 3)
    payload = mm.encode_png(rng)
    assert payload.startswith(mm.PNG_SIG)
    assert np.array_equal(mm.decode_png(payload), rng)
    # really compressed: a gradient raster deflates below raw size
    grad = np.tile(np.arange(48, dtype=np.uint8), (16, 3)).reshape(16, 48, 3)
    assert len(mm.encode_png(grad)) < grad.size


def test_png_decode_value_pins():
    """m01 reconciliation pattern: decoded pixel sums pinned against
    the encoder's source raster — integer-exact, no tolerance."""
    import numpy as np

    img = np.frombuffer(
        mm._md5_chain_bytes("png-pin", 6 * 11 * 3), dtype=np.uint8
    ).reshape(6, 11, 3)
    dec = mm.decode_png(mm.encode_png(img))
    for ch in range(3):
        assert int(dec[:, :, ch].sum()) == int(img[:, :, ch].sum())
    # the header-parse tier agrees with the real decoder
    kind, w, h = mm.parse_image_header(mm.encode_png(img))[:3]
    assert (kind, w, h) == ("png", 11, 6)


def test_png_decode_rejects_corruption():
    import numpy as np
    import pytest

    img = np.zeros((4, 4, 3), dtype=np.uint8)
    payload = bytearray(mm.encode_png(img))
    # flip one IDAT byte: the chunk CRC must catch it
    idat_at = bytes(payload).index(b"IDAT") + 6
    payload[idat_at] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        mm.decode_png(bytes(payload))
    with pytest.raises(ValueError, match="not a PNG"):
        mm.decode_png(b"P6\n1 1\n255\n\x00\x00\x00")


def test_png_decode_truncated_between_body_and_crc():
    """ADVICE r08 #4: a payload cut between a chunk body and its
    4-byte CRC must raise the contract ValueError, not struct.error
    (or zlib.error) leaking from an internal slice. Sweep EVERY
    truncation point of a valid payload: each either raises the
    contract ValueError or — only when the full raster already
    arrived (cuts inside the trailing IEND) — decodes exactly."""
    import numpy as np

    img = np.arange(4 * 3 * 3, dtype=np.uint8).reshape(4, 3, 3)
    payload = mm.encode_png(img)
    decoded_ok = 0
    for cut in range(len(payload)):
        try:
            dec = mm.decode_png(payload[:cut])
        except ValueError:
            continue
        assert (dec == img).all(), f"cut={cut} decoded wrong pixels"
        decoded_ok += 1
    # only cuts strictly inside the 12-byte IEND chunk may decode
    assert decoded_ok <= 12


def test_png_decode_handles_grayscale_and_rejects_interlace():
    import struct
    import zlib

    import numpy as np
    import pytest

    # hand-built grayscale (color type 0): decodes since r09, channel-
    # replicated to RGB
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    raw = zlib.compress(bytes([0, 1, 2, 0, 3, 4]))
    payload = (
        mm.PNG_SIG
        + mm._png_chunk(b"IHDR", ihdr)
        + mm._png_chunk(b"IDAT", raw)
        + mm._png_chunk(b"IEND", b"")
    )
    dec = mm.decode_png(payload)
    want = np.array([[1, 2], [3, 4]], np.uint8)
    assert np.array_equal(dec, np.stack([want] * 3, axis=2))
    # Adam7 interlace stays out of contract
    ihdr_i = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 1)
    bad = (
        mm.PNG_SIG
        + mm._png_chunk(b"IHDR", ihdr_i)
        + mm._png_chunk(b"IDAT", raw)
        + mm._png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="in contract"):
        mm.decode_png(bad)


def test_m09_verdict_non_vacuous(spark):
    """The m09 round-trip verdict must really measure loss: the codec
    IS lossy on md5-chain noise (max err > 0 somewhere), the verdict
    stays green at the contract tolerance, and it FLIPS (FALSE,
    bucket > 0) when the tolerance is tightened to zero — so a
    decoder regression cannot hide behind a vacuous TRUE."""
    from rfb_data_pipeline_spark.operators.media import (
        _JPEG_N,
        _JPEG_TOL,
        _m09_agg,
    )

    stats = mm.jpeg_roundtrip_stats(spark, _JPEG_N).localCheckpoint()
    errs = [r.max_abs_err for r in stats.collect()]
    assert len(errs) == _JPEG_N
    assert max(errs) > 0, "codec reported zero loss — vacuous verdict"
    assert max(errs) <= _JPEG_TOL
    green = _m09_agg(stats, _JPEG_TOL).collect()
    assert all(r.decode_within_tol and r.err_bucket == 0 for r in green)
    red = _m09_agg(stats, 0).collect()
    assert any(not r.decode_within_tol and r.err_bucket > 0 for r in red)


def test_m10_verdict_non_vacuous(spark):
    """m10's container-loop verdict must really measure loss (the
    frames ARE lossy-decoded noise), stay green at the contract
    tolerance, and flip at tol=0 — a demux or codec regression cannot
    hide behind a vacuous TRUE."""
    from rfb_data_pipeline_spark.operators.media import (
        _JPEG_TOL,
        _MJPEG_N_FRAMES,
        _MJPEG_N_VIDEOS,
        _m10_verdict,
    )

    stats = mm.mjpeg_roundtrip_stats(
        spark, _MJPEG_N_VIDEOS, _MJPEG_N_FRAMES
    ).localCheckpoint()
    rows = stats.collect()
    assert len(rows) == _MJPEG_N_VIDEOS
    assert all(r.n_frames_decoded == _MJPEG_N_FRAMES for r in rows)
    errs = [r.max_abs_err for r in rows]
    assert max(errs) > 0, "zero decoded loss — vacuous verdict"
    assert max(errs) <= _JPEG_TOL
    green = _m10_verdict(stats, _JPEG_TOL).collect()
    assert all(r.decode_within_tol and r.err_bucket == 0 for r in green)
    red = _m10_verdict(stats, 0).collect()
    assert all(not r.decode_within_tol and r.err_bucket > 0 for r in red)


def test_mp4_samples_truncated_table_fails_loud():
    """A sample-table count that runs past its box must raise the
    contract ValueError, not fabricate zero entries from empty
    slices (int.from_bytes(b'') == 0)."""
    import struct

    import numpy as np

    frames = [np.zeros((8, 8, 3), np.uint8)]
    mp4 = bytearray(mm.encode_mjpeg_mp4(frames, frame_dur_ms=500))
    # inflate stsz's sample count without growing the box
    at = bytes(mp4).index(b"stsz")
    # stsz body: version/flags(4) sample_size(4) sample_count(4)
    cnt_at = at + 4 + 8
    mp4[cnt_at:cnt_at + 4] = struct.pack(">I", 1000)
    with pytest.raises(ValueError, match="truncated MP4 sample table"):
        mm.mp4_samples(bytes(mp4))
    # every truncation point of a valid container also fails loud
    good = mm.encode_mjpeg_mp4(frames, frame_dur_ms=500)
    for cut in range(0, len(good), 7):
        try:
            mm.mp4_samples(good[:cut])
        except ValueError:
            continue
        raise AssertionError(f"cut={cut} did not fail loud")


# -- round-9 review regressions: drop-don't-crash and bounded reads --------


def test_mislabeled_rows_drop_instead_of_killing_batch(spark):
    """The magic guards alone can't stop the decoders from raising on
    payloads that pass the magic but are corrupt past it — the
    operators must DROP those rows (the docstring contract), not kill
    the Arrow batch."""
    rows = [
        # AVI passes the RIFF guard but is not WAVE
        (0, "audio", bytearray(b"RIFF" + (1000).to_bytes(4, "little") + b"AVI LIST"),
         (None, None, None, None, "wav")),
        # valid WAV survives alongside it
        (1, "audio", bytearray(mm.encode_wav(np.arange(100, dtype=np.int16))),
         (None, None, 16000, 6, "wav")),
        # truncated PPM passes the P6 guard
        (2, "image", bytearray(b"P6\n8 6\n255\n" + b"\x00" * 10),
         (8, 6, None, None, "ppm")),
        # BMFF cut after ftyp passes the ftyp guard
        (3, "video", bytearray(b"\x00\x00\x00\x14ftypisom\x00\x00\x02\x00isom"),
         (None, None, None, None, "mp4")),
    ]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    audio = mm.audio_stats(media).collect()
    assert [r.media_id for r in audio] == [1]
    frames = mm.audio_frame_energy(media, frame_ms=10).collect()
    assert {r.media_id for r in frames} == {1}
    assert mm.image_stats(media).collect() == []
    assert mm.video_meta(media).collect() == []


def test_truncated_mvhd_and_wav_fail_loud():
    """Bounded reads: int.from_bytes(b'') == 0 must not fabricate
    timescale/duration (mvhd) or silently shorten samples (WAV)."""
    import pytest as _pytest

    full = mm.encode_minimal_mp4(4000)
    mv = full.index(b"mvhd")
    # cut inside mvhd, after timescale but before duration
    with _pytest.raises(ValueError, match="truncated mvhd"):
        mm.parse_mp4_meta(full[: mv + 4 + 16])
    wav = mm.encode_wav(np.arange(200, dtype=np.int16))
    with _pytest.raises(ValueError, match="truncated WAV chunk"):
        mm.decode_wav(wav[:-10])


def test_image_header_jpeg_fill_bytes():
    """0xFF fill bytes before a marker are legal (B.1.1.2); the header
    walk must skip them and still find SOF dimensions."""
    from rfb_data_pipeline_spark.functions.jpeg import encode_jpeg

    img = np.frombuffer(
        mm._md5_chain_bytes("fill-img", 6 * 9 * 3), dtype=np.uint8
    ).reshape(6, 9, 3)
    payload = encode_jpeg(img, quality=100)
    stuffed = payload[:2] + b"\xff\xff" + payload[2:]
    assert mm.parse_image_header(stuffed) == ("jpeg", 9, 6, 8)


def test_mjpeg_timescale_floor_fails_loud():
    """A timescale where frame_dur_ms*timescale < 1000 floors the stts
    delta to 0 (every sample at t=0) — must raise, not mux silence."""
    import pytest as _pytest

    frame = np.zeros((8, 8, 3), dtype=np.uint8)
    with _pytest.raises(ValueError, match="delta"):
        mm.encode_mjpeg_mp4([frame, frame], frame_dur_ms=33, timescale=20)


def test_decode_features_real_tiers_for_wav_and_mjpeg(spark):
    """decode_stub=False now covers WAV (waveform envelope) and
    MJPEG-BMFF (first-frame thumbnail) natively; the default stub path
    keeps the md5 fake ONLY for payloads with nothing to decode
    (metadata-only BMFF)."""
    samples = (np.sin(np.arange(800) / 20.0) * 20000).astype(np.int16)
    frame = np.frombuffer(
        mm._md5_chain_bytes("ft-frame", 16 * 16 * 3), dtype=np.uint8
    ).reshape(16, 16, 3)
    rows = [
        (0, "audio", bytearray(mm.encode_wav(samples)),
         (None, None, 16000, 50, "wav")),
        (1, "video", bytearray(
            mm.encode_mjpeg_mp4([frame], frame_dur_ms=500)),
         (16, 16, None, 500, "mp4")),
        (2, "video", bytearray(mm.encode_minimal_mp4(4000)),
         (640, 480, None, 4000, "mp4")),
    ]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    real = {
        r.media_id: r.features
        for r in mm.decode_features(
            media.filter("media_id < 2"), decode_stub=False
        ).collect()
    }
    # WAV tier: envelope of |sin| ~ 0.39 average, nothing like the fake
    assert 0.2 < sum(real[0]) / len(real[0]) < 0.8
    # features travel as float32 in DECODED_SCHEMA
    assert all(
        abs(a - b) < 1e-6
        for a, b in zip(real[0], mm.wav_embedding(samples))
    )
    # MJPEG tier: q=100 first-frame thumbnail within codec tolerance
    want = mm.ppm_features(frame)
    assert max(abs(a - b) for a, b in zip(real[1], want)) < 0.02
    # metadata-only BMFF: stub default keeps the fake; stub=False raises
    stub = {
        r.media_id: r.features for r in mm.decode_features(media).collect()
    }
    assert all(
        abs(a - b) < 1e-6
        for a, b in zip(stub[2], mm._fake_features(bytes(rows[2][2])))
    )
    import pytest as _pytest

    with _pytest.raises(Exception, match="no decodable samples"):
        mm.decode_features(
            media.filter("media_id = 2"), decode_stub=False
        ).collect()


def test_bm_weak_magic_short_payload_stubs_not_raises(spark):
    """ADVICE r10: a payload shorter than the BMP headers that merely
    STARTS with 'BM' is a weak-magic dispatch false positive — stub
    mode must keep the pre-r10 contract (fake features), reserving
    the loud ValueError for stub=False and for payloads with a valid
    24 bpp header and corrupt pixel data."""
    short_bm = b"BM plain text that is not a bitmap"
    rows = [(7, "image", bytearray(short_bm), (None, None, None, None, "bmp"))]
    df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    got = mm.decode_features(df, decode_stub=True).collect()[0]
    # features travel as array<float>: compare under float32 rounding
    assert all(
        abs(a - b) < 1e-6
        for a, b in zip(got.features, mm._fake_features(short_bm))
    )
    with pytest.raises(Exception, match="too short"):
        mm.decode_features(df, decode_stub=False).collect()
    # corruption with a VALID header still fails loud in BOTH modes
    import numpy as np

    from rfb_data_pipeline_spark.functions.bmpgif import encode_bmp

    img = np.zeros((4, 5, 3), dtype=np.uint8)
    trunc = encode_bmp(img)[:-6]  # inside the pixel data
    bad = spark.createDataFrame(
        [(8, "image", bytearray(trunc), (5, 4, None, None, "bmp"))],
        mm.MEDIA_SCHEMA,
    )
    for stub in (True, False):
        with pytest.raises(Exception, match="truncated BMP"):
            mm.decode_features(bad, decode_stub=stub).collect()
