"""Property-based round-trip for the stdlib PNG codec (r08): ANY RGB8
raster must survive encode → decode bit-exactly. The encoder cycles
filter types 0..4 per scanline, so rasters with >= 5 rows exercise
every unfilter branch (None/Sub/Up/Average/Paeth) on arbitrary pixel
content — including the adversarial cases hand-written fixtures miss
(saturated channels, alternating extremes, constant rows that make
Average/Paeth predictions exact).
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from rfb_data_pipeline_spark.functions import multimodal as mm


@st.composite
def _rasters(draw):
    h = draw(st.integers(min_value=1, max_value=12))
    w = draw(st.integers(min_value=1, max_value=12))
    body = draw(
        st.binary(min_size=h * w * 3, max_size=h * w * 3)
    )
    return np.frombuffer(body, dtype=np.uint8).reshape(h, w, 3)


@settings(max_examples=60, deadline=None)
@given(_rasters())
def test_png_roundtrip_property(img):
    payload = mm.encode_png(img)
    assert payload.startswith(mm.PNG_SIG)
    back = mm.decode_png(payload)
    assert back.shape == img.shape
    assert np.array_equal(back, img)
    # header-parse tier agrees with the codec on dimensions
    kind, w, h = mm.parse_image_header(payload)[:3]
    assert (kind, w, h) == ("png", img.shape[1], img.shape[0])


@settings(max_examples=30, deadline=None)
@given(
    st.integers(min_value=0, max_value=255),
    st.integers(min_value=5, max_value=10),
    st.integers(min_value=1, max_value=10),
)
def test_png_constant_raster_property(v, h, w):
    """Constant rasters make every filter's prediction exact (worst
    case for sign/wraparound bugs in the uint8 delta arithmetic)."""
    img = np.full((h, w, 3), v, dtype=np.uint8)
    assert np.array_equal(mm.decode_png(mm.encode_png(img)), img)


_dims = st.tuples(
    st.integers(min_value=1, max_value=17),
    st.integers(min_value=1, max_value=17),
)


@settings(max_examples=40, deadline=None)
@given(
    dims=_dims,
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    color_type=st.sampled_from([0, 2, 3, 4, 6]),
)
def test_png_all_color_types_roundtrip_exact(dims, seed, color_type):
    """r09: the decoder handles every 8-bit spec color type. PNG is
    lossless, so each round-trip is EXACT: gray / gray+alpha
    replicate the gray channel, palette resolves through PLTE, RGBA
    drops alpha — all against the encoder's five-filter cycle."""
    h, w = dims
    rng = np.random.default_rng(seed)
    if color_type == 0:
        img = rng.integers(0, 256, (h, w), np.uint8)
        dec = mm.decode_png(mm.encode_png(img, color_type=0))
        want = np.stack([img, img, img], axis=2)
    elif color_type == 2:
        img = rng.integers(0, 256, (h, w, 3), np.uint8)
        dec = mm.decode_png(mm.encode_png(img))
        want = img
    elif color_type == 3:
        n_pal = int(rng.integers(1, 257))
        palette = rng.integers(0, 256, (n_pal, 3), np.uint8)
        img = rng.integers(0, n_pal, (h, w)).astype(np.uint8)
        dec = mm.decode_png(
            mm.encode_png(img, color_type=3, palette=palette)
        )
        want = palette[img]
    elif color_type == 4:
        img = rng.integers(0, 256, (h, w, 2), np.uint8)
        dec = mm.decode_png(mm.encode_png(img, color_type=4))
        g = img[:, :, 0]
        want = np.stack([g, g, g], axis=2)
    else:  # 6: RGBA
        img = rng.integers(0, 256, (h, w, 4), np.uint8)
        dec = mm.decode_png(mm.encode_png(img, color_type=6))
        want = img[:, :, :3]
    assert np.array_equal(dec, want), (color_type, h, w, seed)


def test_png_palette_contract_failures():
    import pytest

    img = np.zeros((2, 2), np.uint8)
    pal = np.zeros((1, 3), np.uint8)
    # encoder: out-of-range index / oversized / missing palette
    with pytest.raises(ValueError, match="palette"):
        mm.encode_png(np.full((2, 2), 5, np.uint8), color_type=3,
                      palette=pal)
    with pytest.raises(ValueError, match="palette"):
        mm.encode_png(img, color_type=3)
    with pytest.raises(ValueError, match="256"):
        mm.encode_png(img, color_type=3,
                      palette=np.zeros((300, 3), np.uint8))
    # decoder: strip PLTE from a valid palette payload -> fail loud
    payload = mm.encode_png(img, color_type=3, palette=pal)
    at = payload.index(b"PLTE") - 4
    ln = int.from_bytes(payload[at:at + 4], "big")
    stripped = payload[:at] + payload[at + 12 + ln:]
    with pytest.raises(ValueError, match="missing PLTE"):
        mm.decode_png(stripped)
    # 16-bit depth out of contract (flip IHDR depth byte + fix CRC)
    import struct
    import zlib

    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
    bad = (mm.PNG_SIG + mm._png_chunk(b"IHDR", ihdr)
           + mm._png_chunk(b"IDAT", zlib.compress(b"\x00" * 10))
           + mm._png_chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="in contract"):
        mm.decode_png(bad)
