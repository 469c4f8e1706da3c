"""Property-based baseline-JPEG codec tests (hypothesis) — the PNG
round-trip suite repeated one codec over (VERDICT r08 item 2).

JPEG is lossy, so unlike PNG the pin is a TOLERANCE round-trip: at
quality=100 the quant tables are all ones and the only loss is
coefficient rounding plus two color-transform roundings — measured
max |err| is 2 on adversarial random noise; the property pins <= 3.
Constant rasters quantize exactly (DC only) and pin <= 1.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from rfb_data_pipeline_spark.functions.jpeg import (
    decode_jpeg,
    encode_jpeg,
    quant_tables,
)
from rfb_data_pipeline_spark.functions.multimodal import parse_image_header

_dims = st.tuples(
    st.integers(min_value=1, max_value=21),
    st.integers(min_value=1, max_value=21),
)


def _raster(seed: int, h: int, w: int) -> np.ndarray:
    return np.random.default_rng(seed).integers(
        0, 256, (h, w, 3), dtype=np.uint8
    )


@settings(max_examples=40, deadline=None)
@given(dims=_dims, seed=st.integers(min_value=0, max_value=2**31 - 1))
def test_q100_roundtrip_within_tolerance(dims, seed):
    h, w = dims
    img = _raster(seed, h, w)
    payload = encode_jpeg(img, quality=100)
    dec = decode_jpeg(payload)
    assert dec.shape == img.shape
    err = np.abs(dec.astype(np.int64) - img.astype(np.int64)).max()
    assert err <= 3, f"{h}x{w} seed {seed}: max err {err}"
    # decode is deterministic (bit-identical on a second pass)
    assert (decode_jpeg(payload) == dec).all()


@settings(max_examples=30, deadline=None)
@given(
    dims=_dims,
    rgb=st.tuples(
        st.integers(0, 255), st.integers(0, 255), st.integers(0, 255)
    ),
)
def test_constant_rasters_near_exact(dims, rgb):
    h, w = dims
    img = np.empty((h, w, 3), dtype=np.uint8)
    img[:, :] = rgb
    dec = decode_jpeg(encode_jpeg(img, quality=100))
    err = np.abs(dec.astype(np.int64) - img.astype(np.int64)).max()
    assert err <= 1, f"{rgb}: max err {err}"


@settings(max_examples=20, deadline=None)
@given(dims=_dims, seed=st.integers(min_value=0, max_value=2**31 - 1))
def test_grayscale_roundtrip(dims, seed):
    h, w = dims
    g = np.random.default_rng(seed).integers(0, 256, (h, w), dtype=np.uint8)
    dec = decode_jpeg(encode_jpeg(g, quality=100))
    assert dec.shape == (h, w, 3)
    assert (dec[:, :, 0] == dec[:, :, 1]).all()
    assert (dec[:, :, 1] == dec[:, :, 2]).all()
    err = np.abs(dec[:, :, 0].astype(np.int64) - g.astype(np.int64)).max()
    assert err <= 1, f"gray {h}x{w} seed {seed}: max err {err}"


@settings(max_examples=15, deadline=None)
@given(
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    quality=st.integers(min_value=1, max_value=99),
)
def test_lossy_qualities_decode_cleanly(seed, quality):
    """Any quality tier must produce a decodable, right-shaped file —
    the loss grows but the bitstream stays spec-valid."""
    img = _raster(seed, 12, 17)
    dec = decode_jpeg(encode_jpeg(img, quality=quality))
    assert dec.shape == img.shape and dec.dtype == np.uint8


def _reference_decode(img: np.ndarray, quality: int, subsampling: str):
    """Bitstream-free recompute of what decode_jpeg must produce:
    the SAME transform path (sample → quantize → dequantize → IDCT →
    upsample → color) via the module's own helpers, skipping the
    Huffman/marker/restart layer entirely. decode(encode(x)) must
    equal this BIT-EXACTLY — integer coefficients survive entropy
    coding unchanged and both sides run identical float64 ops in
    identical order — which isolates the bitstream layer as the
    tested delta."""
    from rfb_data_pipeline_spark.functions import jpeg as J

    comps, _, _ = J._encode_planes(img, subsampling)
    ql, qc = J.quant_tables(quality)
    qmap = [ql] + [qc] * (len(comps) - 1)
    hmax = max(hi for _, hi, _ in comps)
    vmax = max(vi for _, _, vi in comps)
    h, w = img.shape[:2]
    planes = []
    for (p, hi, vi), q in zip(comps, qmap):
        zz = J._quantize_blocks(p, q)
        by, bx, _ = zz.shape
        blocks = np.zeros((by * bx, 8, 8), dtype=np.float64)
        blocks[:, J._ZZ_ROWS, J._ZZ_COLS] = zz.reshape(-1, 64).astype(
            np.float64
        )
        blocks *= q.astype(np.float64)[None, :, :]
        spatial = np.einsum("ux,nuv,vy->nxy", J._C, blocks, J._C)
        plane = J._unblockify(spatial, by * 8, bx * 8)
        if vi < vmax:
            plane = np.repeat(plane, vmax // vi, axis=0)
        if hi < hmax:
            plane = np.repeat(plane, hmax // hi, axis=1)
        planes.append(plane[:h, :w] + 128.0)
    if len(planes) == 1:
        y = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return np.stack([y, y, y], axis=2)
    return J._ycbcr_to_rgb(np.stack(planes, axis=2))


@settings(max_examples=40, deadline=None)
@given(
    dims=_dims,
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    quality=st.integers(min_value=1, max_value=100),
    subsampling=st.sampled_from(["444", "420", "422", "440"]),
    dri=st.integers(min_value=0, max_value=3),
)
def test_bitstream_layer_is_exact(dims, seed, quality, subsampling, dri):
    """decode(encode(x)) == the bitstream-free reference recompute,
    BIT-EXACT, across qualities, all four subsampling layouts
    (including the asymmetric 4:2:2/4:4:0 H != V MCU paths), and
    restart intervals 0-3 — a Huffman, marker, byte-stuffing, or
    restart-resync bug of ANY size fails this."""
    h, w = dims
    img = _raster(seed, h, w)
    payload = encode_jpeg(
        img, quality=quality, subsampling=subsampling,
        restart_interval=dri,
    )
    assert np.array_equal(
        decode_jpeg(payload), _reference_decode(img, quality, subsampling)
    )


@settings(max_examples=20, deadline=None)
@given(dims=_dims, seed=st.integers(min_value=0, max_value=2**31 - 1))
def test_420_smooth_roundtrip_within_tolerance(dims, seed):
    """4:2:0 is near-exact on chroma-smooth content (per-2x2-constant
    chroma survives the box mean): build such an image and pin the
    decoded error to the 4:4:4 tolerance."""
    h, w = dims
    rng = np.random.default_rng(seed)
    small = rng.integers(0, 256, (-(-h // 2), -(-w // 2), 3), np.uint8)
    img = np.repeat(np.repeat(small, 2, axis=0), 2, axis=1)[:h, :w]
    dec = decode_jpeg(encode_jpeg(img, quality=100, subsampling="420"))
    err = np.abs(dec.astype(np.int64) - img.astype(np.int64)).max()
    assert err <= 3, f"{h}x{w} seed {seed}: max err {err}"


def test_restart_marker_sequence_enforced():
    img = _raster(9, 16, 16)
    payload = bytearray(encode_jpeg(img, quality=100, restart_interval=1))
    at = bytes(payload).find(b"\xff\xd0")
    assert at > 0
    payload[at + 1] = 0xD5  # out-of-sequence restart number
    with pytest.raises(ValueError, match="out of sequence"):
        decode_jpeg(bytes(payload))


def test_header_parse_agrees_with_decoder():
    img = _raster(5, 11, 19)
    payload = encode_jpeg(img, quality=90)
    fmt, w, h, depth = parse_image_header(payload)
    assert (fmt, w, h, depth) == ("jpeg", 19, 11, 8)


def test_quality_scaling_endpoints():
    ql100, qc100 = quant_tables(100)
    assert (ql100 == 1).all() and (qc100 == 1).all()
    ql50, _ = quant_tables(50)
    assert ql50[0, 0] == 16  # Annex K base at the midpoint
    with pytest.raises(ValueError):
        quant_tables(0)


def test_decoder_contract_failures():
    img = _raster(1, 9, 9)
    payload = bytearray(encode_jpeg(img, quality=100))
    # not a JPEG
    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg(b"P6\n1 1\n255\nabc")
    # progressive SOF out of contract (flip SOF0 -> SOF2)
    sof = payload.index(b"\xff\xc0")
    prog = bytes(payload[:sof]) + b"\xff\xc2" + bytes(payload[sof + 2 :])
    with pytest.raises(ValueError, match="non-baseline"):
        decode_jpeg(prog)
    # truncation inside the entropy stream
    with pytest.raises(ValueError):
        decode_jpeg(bytes(payload[: len(payload) // 2]))
    # sampling factors out of contract: H=4 (only 1 and 2 decode)
    hv_at = sof + 11  # SOF0: marker(2) len(2) P(1) Y(2) X(2) C1(1) -> HV
    sub = bytearray(payload)
    sub[hv_at] = 0x41
    with pytest.raises(ValueError, match="sampling factors"):
        decode_jpeg(bytes(sub))


def test_truncation_sweep_fails_closed():
    """Every strict prefix either raises ValueError or (never, for
    this single-scan layout) decodes — no struct.error/IndexError
    escapes, mirroring the PNG truncation sweep."""
    payload = encode_jpeg(_raster(2, 6, 6), quality=100)
    for cut in range(len(payload)):
        with pytest.raises(ValueError):
            decode_jpeg(payload[:cut])


def test_gray_scan_ignores_declared_sampling_factors():
    """T.81 A.2.2: a one-component scan is non-interleaved — the
    declared sampling factors do not apply. Patching a grayscale
    file's SOF factors from 1x1 to 2x2 must decode to the IDENTICAL
    raster (the pre-fix decoder read the raster-ordered blocks in
    2x2-MCU order, scrambling pixels or claiming truncation)."""
    gray = np.random.default_rng(5).integers(
        0, 256, (32, 16), dtype=np.uint8
    )
    payload = bytearray(encode_jpeg(gray, quality=100))
    base = decode_jpeg(bytes(payload))
    sof = payload.index(b"\xff\xc0")
    assert payload[sof + 11] == 0x11  # grayscale encodes 1x1
    payload[sof + 11] = 0x22
    assert np.array_equal(decode_jpeg(bytes(payload)), base)


def test_fill_bytes_before_markers_accepted():
    """B.1.1.2: any number of 0xFF fill bytes may precede a marker;
    the parser must skip them instead of misreading the length."""
    img = _raster(3, 9, 9)
    payload = encode_jpeg(img, quality=100)
    stuffed = payload[:2] + b"\xff\xff" + payload[2:]
    assert np.array_equal(decode_jpeg(stuffed), decode_jpeg(payload))


def test_trailing_junk_containing_eoi_ignored():
    """The entropy stream ends at the FIRST EOI after the scan; junk
    after the real EOI (even junk containing FF D9, e.g. a second
    concatenated payload) must not move the anchor."""
    img = _raster(4, 9, 9)
    payload = encode_jpeg(img, quality=100)
    junk = b"trailing" + b"\xff\xd9" + b"more"
    assert np.array_equal(decode_jpeg(payload + junk), decode_jpeg(payload))


def test_oversized_raster_fails_loud():
    """SOF0 dimensions are 16-bit: >65535 must raise the contract
    ValueError, not a struct.error from segment assembly."""
    with pytest.raises(ValueError, match="65535"):
        encode_jpeg(np.zeros((70000, 8, 3), dtype=np.uint8))

def test_zrl_landing_exactly_on_64_fails_loud():
    """ADVICE r09: ZRL's 16 zeros must be FOLLOWED by a coefficient at
    an index <= 63 (T.81 F.1.2.2) — a ZRL taking k exactly to 64 is
    invalid baseline data and must raise, not silently end the block
    with the bit reader misaligned."""
    import struct

    import rfb_data_pipeline_spark.functions.jpeg as J

    payload = bytes(encode_jpeg(np.zeros((8, 8), dtype=np.uint8), quality=100))
    sos = payload.find(b"\xff\xda")
    assert sos > 0
    scan_start = sos + 2 + struct.unpack(">H", payload[sos + 2 : sos + 4])[0]
    w = J._BitWriter()
    w.put(*J._DC_CODES[0])  # DC size 0 -> diff 0
    code, ln = J._AC_CODES[0xE1]  # run=14, size=1: place at 15, k -> 16
    w.put(code, ln)
    w.put(1, 1)  # the size-1 magnitude bit
    zrl, zln = J._AC_CODES[0xF0]
    for _ in range(3):  # ZRL x3: k 16 -> 32 -> 48 -> 64, exactly
        w.put(zrl, zln)
    w.flush()
    corrupt = payload[:scan_start] + bytes(w.out) + b"\xff\xd9"
    with pytest.raises(ValueError, match="AC coefficient index overflow"):
        decode_jpeg(corrupt)
