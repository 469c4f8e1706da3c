"""Stdlib-only baseline JPEG codec (ITU-T T.81 sequential DCT).

The last real-decode gap in the media tier (VERDICT r08 item 2): PNG
and PPM decode natively since r07/r08; JPEG-class payloads used to
fail loud behind ``decode_stub=False``. This module is the PNG
pattern repeated one codec over — encode for test fixtures, decode
for the pipeline — with numpy for the 8x8 block transforms and zero
third-party imports.

Scope (fail-loud contract, like decode_png's RGB8-only contract):

- **Decoder**: baseline sequential DCT (SOF0), 8-bit precision, 1 or
  3 components, GENERIC sampling factors H,V ∈ {1, 2} (so 4:4:4,
  4:2:0, 4:2:2 and 4:4:0 all decode, chroma upsampled by
  replication), and restart intervals (DRI + RST0-7 resync with DC
  predictor reset — the marker layout that makes huge JPEGs
  chunk-parallelizable at 100 TB scale). It reconstructs Huffman
  tables canonically from the file's own DHT segments and
  dequantizes with the file's own DQT tables, so it decodes any
  in-contract baseline file, not just this encoder's output.
- **Encoder**: 4:4:4 or 4:2:0 YCbCr (or single-component grayscale),
  optional restart intervals, Annex K quantization tables under the
  classic IJG quality scaling (quality=100 -> all-ones tables,
  near-lossless), and canonical single-length Huffman tables
  generated from the symbol alphabet (every DC category coded in 4
  bits, every AC (run, size) symbol in 8 bits). Single-length tables
  are a perfectly valid DHT — larger output than the Annex K
  defaults, but free of 162 hand-transcribed constants, and any spec
  decoder reads them from the DHT segment.

Pixel math: FDCT/IDCT via the orthonormal DCT-II matrix (exact
float64 inverses); the only loss is coefficient quantization, chroma
downsampling (4:2:0), and the two color-transform roundings. A
quality-100 4:4:4 round-trip is pinned to a small per-pixel tolerance
in tests/test_jpeg_property.py, and decode(encode(x)) is pinned
BIT-EXACTLY against a bitstream-free reference recompute of the same
transform path (quantize→dequantize→IDCT→upsample→color), which
isolates the Huffman/marker/restart layer as the tested delta.

Reference: reference repo has no media tier (281-line CSV ETL); this
extends SURVEY.md §2.3's multimodal family.
"""

from __future__ import annotations

import struct

import numpy as np

SOI = b"\xff\xd8"
EOI = b"\xff\xd9"

# Annex K base quantization tables (ITU-T T.81 Tables K.1 / K.2).
_Q_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int64,
)
_Q_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int64,
)


def _zigzag_order() -> list[tuple[int, int]]:
    """The spec zigzag scan as (row, col) pairs: anti-diagonals with
    alternating direction, starting (0,0),(0,1),(1,0),(2,0),..."""
    order = []
    for s in range(15):
        rows = range(max(0, s - 7), min(s, 7) + 1)
        for r in (rows if s % 2 else reversed(rows)):
            order.append((r, s - r))
    return order


_ZZ = _zigzag_order()
_ZZ_ROWS = np.array([r for r, _ in _ZZ])
_ZZ_COLS = np.array([c for _, c in _ZZ])

# Orthonormal 8-point DCT-II matrix: FDCT is C @ block @ C.T, IDCT is
# the transpose sandwich — exact float64 inverses.
_C = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _C[_u, _x] = np.cos((2 * _x + 1) * _u * np.pi / 16) * (
            np.sqrt(0.125) if _u == 0 else 0.5
        )


def quant_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """IJG quality scaling of the Annex K tables: 100 -> all ones
    (near-lossless), 50 -> the base tables, 1 -> coarsest."""
    if not 1 <= quality <= 100:
        raise ValueError("quality must be in [1, 100]")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    ql = np.clip((_Q_LUMA * scale + 50) // 100, 1, 255)
    qc = np.clip((_Q_CHROMA * scale + 50) // 100, 1, 255)
    return ql.astype(np.int64), qc.astype(np.int64)


# -- canonical Huffman tables ----------------------------------------------

_DC_SYMBOLS = list(range(12))  # DC size categories 0..11
# AC alphabet: EOB (0x00), ZRL (0xF0), and (run 0..15, size 1..10)
_AC_SYMBOLS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]


def _single_length_spec(symbols: list[int]) -> tuple[list[int], list[int]]:
    """(BITS[1..16], HUFFVAL) assigning every symbol one canonical
    code of the same length L = ceil(log2(n + 1)) — the +1 keeps the
    all-ones code unused, as the spec requires."""
    n = len(symbols)
    # 2^bit_length(n) > n always, so the all-ones code (value n at
    # this length) is never assigned — no +1 adjustment needed.
    length = max(1, n.bit_length())
    bits = [0] * 16
    bits[length - 1] = n
    return bits, list(symbols)


def _canonical_codes(
    bits: list[int], huffval: list[int]
) -> dict[int, tuple[int, int]]:
    """DHT (BITS, HUFFVAL) -> {symbol: (code, length)} by the spec's
    canonical code generation (T.81 Annex C)."""
    codes: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            codes[huffval[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return codes


_DC_SPEC = _single_length_spec(_DC_SYMBOLS)
_AC_SPEC = _single_length_spec(_AC_SYMBOLS)
_DC_CODES = _canonical_codes(*_DC_SPEC)
_AC_CODES = _canonical_codes(*_AC_SPEC)


# -- bit I/O with 0xFF byte stuffing ---------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def put(self, value: int, length: int) -> None:
        self._acc = (self._acc << length) | (value & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            byte = (self._acc >> (self._n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # marker-escape stuffing
                self.out.append(0x00)
            self._n -= 8
            self._acc &= (1 << self._n) - 1

    def flush(self) -> None:
        if self._n:
            pad = 8 - self._n
            self.put((1 << pad) - 1, pad)  # pad with 1s per spec

    def restart(self, m: int) -> None:
        """Byte-align and emit RSTm (raw marker, never stuffed)."""
        self.flush()
        self.out += bytes([0xFF, 0xD0 + (m & 7)])


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self._acc = 0
        self._n = 0

    def read(self, length: int) -> int:
        while self._n < length:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG entropy stream")
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                if self.pos >= len(self.data):
                    raise ValueError("truncated JPEG entropy stream")
                nxt = self.data[self.pos]
                if nxt == 0x00:
                    self.pos += 1  # stuffed data byte
                else:
                    raise ValueError(
                        f"unexpected marker 0xFF{nxt:02X} inside scan"
                    )
            self._acc = (self._acc << 8) | byte
            self._n += 8
        out = (self._acc >> (self._n - length)) & ((1 << length) - 1)
        self._n -= length
        self._acc &= (1 << self._n) - 1
        return out

    def sync_restart(self, expected_m: int) -> None:
        """Discard padding bits, then consume the RSTm marker the
        encoder placed at this MCU boundary (T.81 E.1.4)."""
        self._acc = 0
        self._n = 0
        if self.pos + 2 > len(self.data):
            raise ValueError("truncated JPEG entropy stream at restart")
        b0, b1 = self.data[self.pos], self.data[self.pos + 1]
        if b0 != 0xFF or not 0xD0 <= b1 <= 0xD7:
            raise ValueError(
                f"expected restart marker, got 0x{b0:02X}{b1:02X}"
            )
        if b1 - 0xD0 != (expected_m & 7):
            raise ValueError(
                f"restart marker out of sequence: got RST{b1 - 0xD0}, "
                f"expected RST{expected_m & 7}"
            )
        self.pos += 2


def _receive_extend(bits: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: map a size-bit magnitude to its signed
    value (low half of the range is negative)."""
    if size == 0:
        return 0
    if bits < (1 << (size - 1)):
        return bits - (1 << size) + 1
    return bits


# -- color transforms (JFIF / BT.601 full range) ---------------------------


def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    r = img[:, :, 0].astype(np.float64)
    g = img[:, :, 1].astype(np.float64)
    b = img[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168735892 * r - 0.331264108 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418687589 * g - 0.081312411 * b + 128.0
    return np.stack([y, cb, cr], axis=2)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y = ycc[:, :, 0]
    cb = ycc[:, :, 1] - 128.0
    cr = ycc[:, :, 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _blockify(plane: np.ndarray) -> np.ndarray:
    """(H, W) float plane (H, W multiples of 8) -> (n, 8, 8) blocks in
    raster MCU order."""
    h, w = plane.shape
    return (
        plane.reshape(h // 8, 8, w // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
    )


def _unblockify(blocks: np.ndarray, h: int, w: int) -> np.ndarray:
    return (
        blocks.reshape(h // 8, w // 8, 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(h, w)
    )


# -- encoder ----------------------------------------------------------------


def _encode_block(
    writer: _BitWriter, coeffs: np.ndarray, pred: int
) -> int:
    """Huffman-encode one quantized zigzagged block; returns its DC
    coefficient (the next block's predictor)."""
    dc = int(coeffs[0])
    diff = dc - pred
    size = abs(diff).bit_length()
    code, ln = _DC_CODES[size]
    writer.put(code, ln)
    if size:
        writer.put(diff if diff >= 0 else diff + (1 << size) - 1, size)
    run = 0
    for k in range(1, 64):
        v = int(coeffs[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            zrl, zln = _AC_CODES[0xF0]
            writer.put(zrl, zln)
            run -= 16
        size = abs(v).bit_length()
        code, ln = _AC_CODES[(run << 4) | size]
        writer.put(code, ln)
        writer.put(v if v >= 0 else v + (1 << size) - 1, size)
        run = 0
    if run:
        eob, eln = _AC_CODES[0x00]
        writer.put(eob, eln)
    return dc


def _dht_segment(tc: int, th: int, spec: tuple[list[int], list[int]]) -> bytes:
    bits, vals = spec
    body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body


def _dqt_segment(tq: int, table: np.ndarray) -> bytes:
    zz = table[_ZZ_ROWS, _ZZ_COLS].astype(np.uint8).tobytes()
    return b"\xff\xdb" + struct.pack(">H", 2 + 1 + 64) + bytes([tq]) + zz


def _encode_planes(
    img: np.ndarray, subsampling: str
) -> tuple[list[tuple[np.ndarray, int, int]], int, int]:
    """(plane, H, V) per component (level-shifted float64, padded to
    its own block multiple), plus the padded luma dims. The same
    helper feeds the test suite's bitstream-free reference recompute,
    so the codec and its oracle share one sampling definition."""
    gray = img.ndim == 2
    if not gray and (img.ndim != 3 or img.shape[2] != 3):
        raise ValueError("expected (h, w, 3) RGB or (h, w) grayscale")
    h, w = img.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty raster")
    if h > 65535 or w > 65535:
        # the SOF0 dimension fields are 16-bit; without this guard the
        # failure is a cryptic struct.error deep in segment assembly
        raise ValueError("raster exceeds the 65535-pixel JPEG limit")
    if subsampling not in ("444", "420", "422", "440"):
        raise ValueError(
            "subsampling must be one of '444', '420', '422', '440'"
        )
    if gray:
        ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
        y = np.pad(
            img.astype(np.float64), ((0, ph - h), (0, pw - w)), mode="edge"
        )
        return [(y - 128.0, 1, 1)], ph, pw
    ycc = _rgb_to_ycbcr(img)
    if subsampling == "444":
        ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
        planes = [
            np.pad(
                ycc[:, :, i], ((0, ph - h), (0, pw - w)), mode="edge"
            )
            - 128.0
            for i in range(3)
        ]
        return [(p, 1, 1) for p in planes], ph, pw
    # Subsampled layouts: luma padded to the MCU multiple on each
    # subsampled axis; chroma = box mean of the padded full-res plane
    # over the sampling cell (so chroma dims are exact 8-multiples).
    # 420 = 2x2 cell, 422 = horizontal-only 1x2, 440 = vertical-only
    # 2x1 — the two asymmetric layouts keep the decoder's generic
    # H != V MCU path exercised rather than dead.
    fh = 2 if subsampling in ("420", "422") else 1  # luma H factor
    fv = 2 if subsampling in ("420", "440") else 1  # luma V factor
    ph = -(-h // (8 * fv)) * 8 * fv
    pw = -(-w // (8 * fh)) * 8 * fh
    padded = [
        np.pad(ycc[:, :, i], ((0, ph - h), (0, pw - w)), mode="edge")
        for i in range(3)
    ]
    y = padded[0] - 128.0
    chroma = [
        p.reshape(ph // fv, fv, pw // fh, fh).mean(axis=(1, 3)) - 128.0
        for p in padded[1:]
    ]
    return [(y, fh, fv), (chroma[0], 1, 1), (chroma[1], 1, 1)], ph, pw


def _quantize_blocks(
    plane: np.ndarray, q: np.ndarray
) -> np.ndarray:
    """(by, bx, 64) quantized zigzagged coefficients for a padded
    component plane."""
    bh, bw = plane.shape[0] // 8, plane.shape[1] // 8
    blocks = _blockify(plane)
    coeffs = np.einsum("ux,nxy,vy->nuv", _C, blocks, _C)
    quant = np.round(coeffs / q).astype(np.int64)
    return quant[:, _ZZ_ROWS, _ZZ_COLS].reshape(bh, bw, 64)


def encode_jpeg(
    img: np.ndarray,
    quality: int = 90,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """(h, w, 3) uint8 RGB (or (h, w) grayscale) -> baseline JFIF
    bytes. ``subsampling``: '444', '420', '422', or '440' (chroma
    box-mean over the luma sampling cell — 2x2, 1x2, 2x1).
    ``restart_interval`` > 0 emits DRI + RST0-7 every N MCUs — the
    resync-point layout that lets a 100 TB pipeline split one huge
    scan across workers."""
    ql, qc = quant_tables(quality)
    comps, ph, pw = _encode_planes(img, subsampling)
    h, w = img.shape[:2]
    ncomp = len(comps)
    qmap = [ql] + [qc] * (ncomp - 1)
    zz = [_quantize_blocks(p, q) for (p, _, _), q in zip(comps, qmap)]
    hmax = max(hv for _, hv, _ in comps)
    vmax = max(vv for _, _, vv in comps)
    mcu_rows, mcu_cols = ph // (8 * vmax), pw // (8 * hmax)

    writer = _BitWriter()
    preds = [0] * ncomp
    mcus_done = 0
    rst = 0
    for mr in range(mcu_rows):
        for mc in range(mcu_cols):
            if (
                restart_interval
                and mcus_done
                and mcus_done % restart_interval == 0
            ):
                writer.restart(rst)
                rst = (rst + 1) & 7
                preds = [0] * ncomp
            for ci, (_, hi, vi) in enumerate(comps):
                for dr in range(vi):
                    for dc in range(hi):
                        block = zz[ci][mr * vi + dr, mc * hi + dc]
                        preds[ci] = _encode_block(writer, block, preds[ci])
            mcus_done += 1
    writer.flush()

    app0 = (
        b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00"
        + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1) + bytes([0, 0])
    )
    sof_comps = b""
    sos_comps = b""
    for ci, (_, hi, vi) in enumerate(comps):
        tq = 0 if ci == 0 else 1
        sof_comps += bytes([ci + 1, (hi << 4) | vi, tq])
        sos_comps += bytes([ci + 1, 0x00])  # DC table 0, AC table 0
    sof = (
        b"\xff\xc0"
        + struct.pack(">H", 8 + 3 * ncomp)
        + bytes([8])
        + struct.pack(">HH", h, w)
        + bytes([ncomp])
        + sof_comps
    )
    sos = (
        b"\xff\xda"
        + struct.pack(">H", 6 + 2 * ncomp)
        + bytes([ncomp])
        + sos_comps
        + bytes([0, 63, 0])
    )
    out = SOI + app0 + _dqt_segment(0, ql)
    if ncomp == 3:
        out += _dqt_segment(1, qc)
    out += sof
    out += _dht_segment(0, 0, _DC_SPEC) + _dht_segment(1, 0, _AC_SPEC)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += sos + bytes(writer.out) + EOI
    return out


# -- decoder ----------------------------------------------------------------


class _HuffTable:
    """Canonical decode table from a DHT (BITS, HUFFVAL) pair:
    per-length (mincode, maxcode, value pointer) — T.81 Annex F."""

    def __init__(self, bits: list[int], huffval: list[int]) -> None:
        self.huffval = huffval
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code, k = 0, 0
        for ln in range(1, 17):
            if bits[ln - 1]:
                self.valptr[ln] = k
                self.mincode[ln] = code
                code += bits[ln - 1]
                k += bits[ln - 1]
                self.maxcode[ln] = code - 1
            code <<= 1

    def decode(self, reader: _BitReader) -> int:
        code = reader.read(1)
        for ln in range(1, 17):
            if self.maxcode[ln] >= code >= self.mincode[ln]:
                return self.huffval[self.valptr[ln] + code - self.mincode[ln]]
            code = (code << 1) | reader.read(1)
        raise ValueError("invalid JPEG Huffman code")


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG bytes -> (h, w, 3) uint8 RGB (grayscale files
    replicate Y across channels). Contract: SOF0, 8-bit, sampling
    factors H,V in {1, 2} (4:4:4 / 4:2:0 / 4:2:2 / 4:4:0; chroma
    upsampled by replication), restart intervals honored — anything
    else fails loud with ValueError (the decode_png contract
    pattern)."""
    if not payload.startswith(SOI):
        raise ValueError("not a JPEG payload")
    qt: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, _HuffTable] = {}
    ac_tabs: dict[int, _HuffTable] = {}
    frame = None  # (h, w, [(comp_id, h_i, v_i, tq)])
    scan = None  # ([(comp_idx, td, ta)], ecs_start)
    restart_interval = 0
    pos = 2
    while pos + 2 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("malformed JPEG marker stream")
        # any number of 0xFF fill bytes may precede a marker (B.1.1.2)
        while pos + 2 <= len(payload) and payload[pos + 1] == 0xFF:
            pos += 1
        if pos + 2 > len(payload):
            break
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI before any scan
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            # standalone TEM/RSTn: no length field
            pos += 2
            continue
        if pos + 4 > len(payload):
            raise ValueError("truncated JPEG segment")
        (seglen,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        body = payload[pos + 4 : pos + 2 + seglen]
        if len(body) != seglen - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:  # DQT (may hold several tables)
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit DQT out of contract")
                if i + 65 > len(body):
                    raise ValueError("truncated DQT table")
                tab = np.zeros((8, 8), dtype=np.int64)
                vals = np.frombuffer(
                    body[i + 1 : i + 65], dtype=np.uint8
                ).astype(np.int64)
                tab[_ZZ_ROWS, _ZZ_COLS] = vals
                qt[tq] = tab
                i += 65
        elif marker == 0xC4:  # DHT (may hold several tables)
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                if i + 17 > len(body):
                    raise ValueError("truncated DHT header")
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                if i + 17 + n > len(body):
                    raise ValueError("truncated DHT values")
                vals = list(body[i + 17 : i + 17 + n])
                (dc_tabs if tc == 0 else ac_tabs)[th] = _HuffTable(
                    bits, vals
                )
                i += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            precision = body[0]
            h, w = struct.unpack(">HH", body[1:5])
            ncomp = body[5]
            if precision != 8:
                raise ValueError("only 8-bit precision is in contract")
            if ncomp not in (1, 3):
                raise ValueError("only 1 or 3 components are in contract")
            comps = []
            for c in range(ncomp):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                hi, vi = hv >> 4, hv & 0x0F
                if hi not in (1, 2) or vi not in (1, 2):
                    raise ValueError(
                        f"sampling factors {hi}x{vi} out of contract "
                        "(H, V in {1, 2})"
                    )
                comps.append((cid, hi, vi, tq))
            frame = (h, w, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("non-baseline SOF out of contract")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = body[0]
            if ns != len(frame[2]):
                raise ValueError("partial-scan JPEG out of contract")
            scomps = []
            for c in range(ns):
                cs, tt = body[1 + 2 * c : 3 + 2 * c]
                idx = next(
                    (
                        i
                        for i, (cid, *_rest) in enumerate(frame[2])
                        if cid == cs
                    ),
                    None,
                )
                if idx is None:
                    raise ValueError("SOS references unknown component")
                scomps.append((idx, tt >> 4, tt & 0x0F))
            scan = (scomps, pos + 2 + seglen)
            break
        pos += 2 + seglen
    if frame is None or scan is None:
        raise ValueError("JPEG missing SOF/SOS")
    h, w, comps = frame
    if h == 0 or w == 0:
        raise ValueError("empty JPEG raster")
    scomps, ecs_start = scan
    # Entropy-coded bytes run to the FIRST EOI after the scan start:
    # byte stuffing guarantees no FF D9 inside the scan data, and
    # rfind would mis-anchor on trailing junk that happens to contain
    # FF D9 (e.g. concatenated payloads or sloppy container slices).
    end = payload.find(EOI, ecs_start)
    if end < 0:
        raise ValueError("JPEG missing EOI")
    reader = _BitReader(payload[ecs_start:end])

    if len(comps) == 1:
        # A one-component scan is NON-interleaved (T.81 A.2.2): the
        # MCU is a single data unit and the declared sampling factors
        # do not apply — normalize to 1x1 so the MCU grid below IS the
        # component's block grid and restart counting is per data
        # unit. Without this, a grayscale file declaring 2x2 factors
        # would decode its raster-ordered blocks in MCU order.
        cid0, _, _, tq0 = comps[0]
        comps = [(cid0, 1, 1, tq0)]
    hmax = max(hi for _, hi, _, _ in comps)
    vmax = max(vi for _, _, vi, _ in comps)
    mcu_rows = -(-h // (8 * vmax))
    mcu_cols = -(-w // (8 * hmax))
    ncomp = len(comps)
    # per-component block grids (by, bx, 64)
    coeffs = [
        np.zeros((mcu_rows * vi, mcu_cols * hi, 64), dtype=np.int64)
        for _, hi, vi, _ in comps
    ]
    preds = [0] * ncomp
    mcus_done = 0
    rst = 0
    # resolve scan-component tables once; scomps is fixed after SOS
    resolved = []
    for idx, td, ta in scomps:
        if td not in dc_tabs or ta not in ac_tabs:
            raise ValueError("SOS references missing Huffman table")
        _, hi, vi, _ = comps[idx]
        resolved.append((idx, dc_tabs[td], ac_tabs[ta], hi, vi))
    for mr in range(mcu_rows):
        for mc in range(mcu_cols):
            if (
                restart_interval
                and mcus_done
                and mcus_done % restart_interval == 0
            ):
                reader.sync_restart(rst)
                rst = (rst + 1) & 7
                preds = [0] * ncomp
            for idx, dct, act, hi, vi in resolved:
                for dr in range(vi):
                    for dc in range(hi):
                        size = dct.decode(reader)
                        if size > 11:
                            raise ValueError("invalid DC size category")
                        diff = _receive_extend(reader.read(size), size)
                        preds[idx] += diff
                        block = coeffs[idx][mr * vi + dr, mc * hi + dc]
                        block[0] = preds[idx]
                        k = 1
                        while k < 64:
                            rs = act.decode(reader)
                            if rs == 0x00:  # EOB
                                break
                            run, size = rs >> 4, rs & 0x0F
                            if size == 0:
                                if run != 15:
                                    raise ValueError(
                                        "invalid AC run/size symbol"
                                    )
                                k += 16  # ZRL: zeros at k..k+15
                                if k >= 64:
                                    # ZRL's 16 zeros must be FOLLOWED
                                    # by a coefficient at index <= 63
                                    # (T.81 F.1.2.2); landing on 64
                                    # exactly leaves no room for it —
                                    # silent desync territory
                                    raise ValueError(
                                        "AC coefficient index overflow"
                                    )
                                continue
                            if size > 10:
                                # 8-bit baseline AC magnitudes cap at
                                # size 10 (T.81 F.1.2.2.1)
                                raise ValueError(
                                    "invalid AC size category"
                                )
                            k += run
                            if k > 63:
                                raise ValueError(
                                    "AC coefficient index overflow"
                                )
                            block[k] = _receive_extend(
                                reader.read(size), size
                            )
                            k += 1
            mcus_done += 1

    planes = []
    for ci, (_, hi, vi, tq) in enumerate(comps):
        if tq not in qt:
            raise ValueError("SOF references missing quant table")
        by, bx, _ = coeffs[ci].shape
        flat = coeffs[ci].reshape(by * bx, 64)
        blocks = np.zeros((by * bx, 8, 8), dtype=np.float64)
        blocks[:, _ZZ_ROWS, _ZZ_COLS] = flat.astype(np.float64)
        blocks *= qt[tq].astype(np.float64)[None, :, :]
        # IDCT: B[x,y] = sum_{u,v} C[u,x] F[u,v] C[v,y]
        spatial = np.einsum("ux,nuv,vy->nxy", _C, blocks, _C)
        plane = _unblockify(spatial, by * 8, bx * 8)
        # replicate-upsample subsampled components to full padded res
        if vi < vmax:
            plane = np.repeat(plane, vmax // vi, axis=0)
        if hi < hmax:
            plane = np.repeat(plane, hmax // hi, axis=1)
        planes.append(plane[:h, :w] + 128.0)
    if ncomp == 1:
        y = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return np.stack([y, y, y], axis=2)
    return _ycbcr_to_rgb(np.stack(planes, axis=2))
