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
