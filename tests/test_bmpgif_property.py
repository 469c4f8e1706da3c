"""Property-based BMP/GIF codec tests — the PNG/JPEG round-trip suite
repeated for the two formats that were header-parse-only through r09.

Both codecs are LOSSLESS, so the pins are exact equality:
``decode_bmp(encode_bmp(x)) == x`` and
``decode_gif(encode_gif(idx, pal)) == pal[idx]`` — including the
interlaced layout and palettes small enough to exercise the
min-code-size floor.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from rfb_data_pipeline_spark.functions.bmpgif import (
    decode_bmp,
    decode_gif,
    encode_bmp,
    encode_gif,
)
from rfb_data_pipeline_spark.functions.multimodal import parse_image_header

_dims = st.tuples(
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=1, max_value=40),
)


def _raster(seed: int, h: int, w: int) -> np.ndarray:
    return np.random.default_rng(seed).integers(
        0, 256, (h, w, 3), dtype=np.uint8
    )


@settings(max_examples=30, deadline=None)
@given(dims=_dims, seed=st.integers(0, 2**31))
def test_bmp_roundtrip_exact(dims, seed):
    img = _raster(seed, *dims)
    assert (decode_bmp(encode_bmp(img)) == img).all()


def test_bmp_header_parse_agrees_with_decoder():
    img = _raster(3, 11, 19)
    payload = encode_bmp(img)
    assert parse_image_header(payload) == ("bmp", 19, 11, 24)
    # row padding really exercised: width 19 * 3 = 57 -> padded to 60
    assert decode_bmp(payload).shape == (11, 19, 3)


def test_bmp_top_down_variant_decodes():
    import struct

    img = _raster(7, 6, 5)
    payload = bytearray(encode_bmp(img))
    # flip to top-down: negate height, reverse the stored row order
    struct.pack_into("<i", payload, 14 + 8, -6)
    row_bytes = (5 * 3 + 3) & ~3
    off = len(payload) - row_bytes * 6
    rows = [bytes(payload[off + r * row_bytes :][:row_bytes]) for r in range(6)]
    payload[off:] = b"".join(reversed(rows))
    assert (decode_bmp(bytes(payload)) == img).all()


def test_bmp_contract_failures():
    img = _raster(1, 4, 4)
    payload = bytearray(encode_bmp(img))
    with pytest.raises(ValueError, match="not a BMP"):
        decode_bmp(b"GIF89a junk")
    with pytest.raises(ValueError, match="truncated"):
        decode_bmp(bytes(payload[:-4]))  # inside the pixel data
    # ADVICE r10: a 'BM'-prefixed payload too short for the headers is
    # a weak-magic dispatch false positive, not a truncated tier
    # member — classified OUT-OF-TIER (UnsupportedBmpVariant) so stub
    # mode keeps its fake-feature contract; still a ValueError for
    # strict callers.
    from rfb_data_pipeline_spark.functions.bmpgif import (
        UnsupportedBmpVariant,
    )

    with pytest.raises(UnsupportedBmpVariant, match="too short"):
        decode_bmp(bytes(payload[:20]))  # inside the headers
    comp = bytearray(payload)
    comp[14 + 16] = 1  # BI_RLE8 compression
    with pytest.raises(ValueError, match="unsupported BMP variant"):
        decode_bmp(bytes(comp))


@settings(max_examples=25, deadline=None)
@given(
    dims=_dims,
    seed=st.integers(0, 2**31),
    n_colors=st.integers(min_value=2, max_value=256),
    interlace=st.booleans(),
)
def test_gif_roundtrip_exact(dims, seed, n_colors, interlace):
    h, w = dims
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, (n_colors, 3), dtype=np.uint8)
    idx = rng.integers(0, n_colors, (h, w)).astype(np.uint8)
    payload = encode_gif(idx, pal, interlace=interlace)
    assert (decode_gif(payload) == pal[idx]).all()


def test_gif_long_run_exercises_clear_codes():
    """A raster much larger than one LZW table span forces the
    encoder's periodic CLEAR and the decoder's table rebuild."""
    pal = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
    idx = (np.indices((64, 64)).sum(axis=0) % 2).astype(np.uint8)
    assert (decode_gif(encode_gif(idx, pal)) == pal[idx]).all()


def test_gif_header_parse_agrees_with_decoder():
    pal = np.arange(48, dtype=np.uint8).reshape(16, 3)
    idx = (np.arange(15 * 9, dtype=np.uint8) % 16).reshape(9, 15)
    payload = encode_gif(idx, pal)
    fmt, w, h, depth = parse_image_header(payload)
    assert (fmt, w, h) == ("gif", 15, 9)
    assert decode_gif(payload).shape == (9, 15, 3)


def test_gif_skips_extension_blocks():
    """GIF89a graphic-control/comment extensions before the image
    descriptor must be walked over, not tripped on."""
    pal = np.array([[1, 2, 3], [4, 5, 6]], dtype=np.uint8)
    idx = np.zeros((3, 3), dtype=np.uint8)
    payload = bytearray(encode_gif(idx, pal))
    at = payload.index(0x2C, 13)  # first image descriptor
    gce = bytes([0x21, 0xF9, 0x04, 0x00, 0x00, 0x00, 0x00, 0x00])
    comment = bytes([0x21, 0xFE, 0x03]) + b"abc" + b"\x00"
    patched = bytes(payload[:at]) + gce + comment + bytes(payload[at:])
    assert (decode_gif(patched) == pal[idx]).all()


def test_gif_contract_failures():
    pal = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
    idx = np.ones((4, 4), dtype=np.uint8)
    payload = encode_gif(idx, pal)
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"BM junk")
    for cut in (8, 14, len(payload) - 4):
        with pytest.raises(ValueError):
            decode_gif(payload[:cut])
    # trailer with no image frame
    with pytest.raises(ValueError, match="no image frame"):
        decode_gif(payload[:13] + bytes(pal.tobytes().ljust(6, b"\x00")) + b"\x3b")
    # ADVICE r10: a palette past GIF's 256-color cap must fail loud —
    # pal_bits > 8 under the header's 3-bit size field (& 0x07) used
    # to silently emit a corrupt stream (verified: encoded fine,
    # failed decode at an unexpected block byte).
    big_pal = np.zeros((300, 3), dtype=np.uint8)
    big_pal[:, 0] = (np.arange(300) % 256).astype(np.uint8)
    with pytest.raises(ValueError, match="256"):
        encode_gif(np.zeros((2, 2), dtype=np.uint8), big_pal)
    # 256 exactly (the cap itself) still round-trips
    pal256 = np.arange(768, dtype=np.uint8).reshape(256, 3)
    idx256 = (np.arange(16) * 16 % 256).astype(np.uint8).reshape(4, 4)
    assert (decode_gif(encode_gif(idx256, pal256)) == pal256[idx256]).all()


def test_gif_truncation_sweep_fails_closed():
    """Every strict prefix raises ValueError — no IndexError/struct
    errors escape (the PNG/JPEG sweep discipline). The only prefix
    that legitimately decodes is the trailer-less one: the first-frame
    contract returns at the image block's terminator."""
    pal = np.arange(12, dtype=np.uint8).reshape(4, 3)
    idx = (np.arange(36, dtype=np.uint8) % 4).reshape(6, 6)
    payload = encode_gif(idx, pal)
    full = decode_gif(payload)
    for cut in range(len(payload) - 1):
        with pytest.raises(ValueError):
            decode_gif(payload[:cut])
    # losing ONLY the trailer byte still yields the full frame (the
    # sub-block terminator before it is required and swept above)
    assert (decode_gif(payload[: len(payload) - 1]) == full).all()


def test_decode_features_real_tiers_for_bmp_and_gif(spark):
    """The Spark-side plumbing: BMP and GIF payloads of the SAME
    raster produce the SAME real features as the PPM tier — and
    nothing like the md5 stub."""
    from rfb_data_pipeline_spark.functions import multimodal as mm

    img = np.frombuffer(
        mm._md5_chain_bytes("bmpgif-img", 6 * 4 * 3), dtype=np.uint8
    ).reshape(4, 6, 3)
    # GIF needs a palette: build one from the raster's unique colors
    colors, inv = np.unique(img.reshape(-1, 3), axis=0, return_inverse=True)
    assert len(colors) <= 256
    gif = encode_gif(
        inv.astype(np.uint8).reshape(4, 6), colors.astype(np.uint8)
    )
    rows = [
        (0, "image", bytearray(mm.encode_ppm(img)), (6, 4, None, None, "ppm")),
        (1, "image", bytearray(encode_bmp(img)), (6, 4, None, None, "bmp")),
        (2, "image", bytearray(gif), (6, 4, None, None, "gif")),
    ]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    feats = {
        r.media_id: r.features
        for r in mm.decode_features(media, decode_stub=False).collect()
    }
    assert feats[0] == feats[1] == feats[2]
    assert feats[1] != mm._fake_features(bytes(rows[1][2]))


def test_out_of_tier_bmp_variant_keeps_stub_contract(spark):
    """r10 review: a well-formed but out-of-tier BMP (8 bpp paletted)
    must get fake features in stub mode (the pre-r10 contract for
    unhandled formats) and raise only with decode_stub=False; a
    CORRUPT 24 bpp BMP raises in both modes, like PNG/JPEG."""
    import struct

    import pytest

    from rfb_data_pipeline_spark.functions import multimodal as mm
    from rfb_data_pipeline_spark.functions.bmpgif import (
        UnsupportedBmpVariant,
    )

    img = _raster(11, 4, 4)
    paletted = bytearray(encode_bmp(img))
    struct.pack_into("<H", paletted, 14 + 14, 8)  # bpp 24 -> 8
    with pytest.raises(UnsupportedBmpVariant):
        decode_bmp(bytes(paletted))
    rows = [(0, "image", paletted, (4, 4, None, None, "bmp"))]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    got = mm.decode_features(media).collect()[0]  # stub mode: no raise
    # features travel as array<float> (float32): compare post-cast
    assert got.features == [
        float(np.float32(v)) for v in mm._fake_features(bytes(paletted))
    ]
    with pytest.raises(Exception, match="unsupported BMP variant"):
        mm.decode_features(media, decode_stub=False).collect()
    # corruption (truncated pixel data) raises in BOTH modes
    corrupt = bytearray(encode_bmp(img))[:-8]
    bad = spark.createDataFrame(
        [(1, "image", corrupt, (4, 4, None, None, "bmp"))], mm.MEDIA_SCHEMA
    )
    with pytest.raises(Exception, match="truncated BMP"):
        mm.decode_features(bad).collect()
