"""Real decode tiers for BMP and GIF — the last two image formats the
media family handled header-parse-only (m05 tier contract; the r09
verdict listed them as the residual completeness note).

Both are stdlib+numpy, like the PPM/PNG/JPEG/WAV tiers:

- **BMP**: uncompressed 24-bit BITMAPINFOHEADER (the overwhelmingly
  common on-disk variant) — BGR pixel rows, 4-byte row padding,
  bottom-up unless the height is negative (top-down). Lossless, so
  ``decode_bmp(encode_bmp(x)) == x`` exactly.
- **GIF**: 87a/89a, global or local color table, interlaced or not,
  full variable-width LSB-first LZW (CLEAR/EOI, KwKwK case, deferred
  clear at code 4096). ``decode_gif`` returns the FIRST image frame as
  RGB through its palette — the same first-frame contract as the
  MJPEG-BMFF tier. The encoder emits valid fixed-width LZW by issuing
  CLEAR before the decoder's table would force a width grow (the
  classic "uncompressed GIF" technique), so round-trips are exact:
  ``decode_gif(encode_gif(idx, palette)) == palette[idx]``.

Scale note: like the other codec tiers these run inside the Arrow
``mapInPandas`` batches of ``decode_features`` — per-payload CPU work,
no shuffle, embarrassingly parallel over the media table.
"""

from __future__ import annotations

import struct

import numpy as np

# -- BMP ---------------------------------------------------------------------

_BMP_HDR = 14  # BITMAPFILEHEADER
_DIB_HDR = 40  # BITMAPINFOHEADER


class UnsupportedBmpVariant(ValueError):
    """A well-formed BMP OUTSIDE the decode tier (paletted/RLE/16-32
    bpp/pre-BITMAPINFO): distinct from corruption so ``decode_features``
    stub mode can fall back to fake features for out-of-tier variants
    while corrupt payloads still fail loud (r10 review)."""


def encode_bmp(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> 24 bpp uncompressed bottom-up BMP."""
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError("encode_bmp expects (h, w, 3) uint8 RGB")
    h, w = img.shape[:2]
    row_bytes = (w * 3 + 3) & ~3
    pix = bytearray()
    for r in range(h - 1, -1, -1):  # bottom-up
        row = img[r, :, ::-1].tobytes()  # RGB -> BGR
        pix += row + b"\x00" * (row_bytes - len(row))
    off = _BMP_HDR + _DIB_HDR
    head = struct.pack("<2sIHHI", b"BM", off + len(pix), 0, 0, off)
    dib = struct.pack(
        "<IiiHHIIiiII", _DIB_HDR, w, h, 1, 24, 0, len(pix), 2835, 2835, 0, 0
    )
    return head + dib + bytes(pix)


def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24 bpp BITMAPINFOHEADER BMP -> (h, w, 3) uint8 RGB.
    Fails loud (ValueError) on any other BMP variant or truncation."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    if len(payload) < _BMP_HDR + _DIB_HDR:
        # A 'BM'-prefixed payload too short to even carry the headers
        # cannot be ATTRIBUTED to the 24 bpp tier — the 2-byte magic is
        # weak enough that this is routinely a false positive of the
        # dispatch, not a truncated tier member. Classify as out-of-
        # tier so decode_features stub mode keeps its pre-r10 contract
        # (fake features) for weak-magic hits; plain ValueError stays
        # reserved for payloads with a VALID 24 bpp header and
        # truncated/degenerate pixel data (ADVICE r10).
        raise UnsupportedBmpVariant(
            "payload too short for BMP headers (weak 'BM' magic, "
            "cannot attribute to the 24 bpp tier)"
        )
    off = struct.unpack_from("<I", payload, 10)[0]
    dib_size, w, h_raw, planes, bpp, comp = struct.unpack_from(
        "<IiiHHI", payload, _BMP_HDR
    )
    if dib_size < _DIB_HDR:
        raise UnsupportedBmpVariant(
            "unsupported BMP DIB header (pre-BITMAPINFO)"
        )
    if planes != 1 or bpp != 24 or comp != 0:
        raise UnsupportedBmpVariant(
            f"unsupported BMP variant (planes={planes}, bpp={bpp}, "
            f"compression={comp}); only uncompressed 24 bpp decodes"
        )
    if w <= 0 or h_raw == 0:
        raise ValueError("degenerate BMP dimensions")
    top_down = h_raw < 0
    h = -h_raw if top_down else h_raw
    row_bytes = (w * 3 + 3) & ~3
    need = off + row_bytes * h
    if len(payload) < need:
        raise ValueError("truncated BMP pixel data")
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=row_bytes * h, offset=off
    ).reshape(h, row_bytes)
    bgr = rows[:, : w * 3].reshape(h, w, 3)
    rgb = bgr[:, :, ::-1]
    return np.ascontiguousarray(rgb if top_down else rgb[::-1])


# -- GIF ---------------------------------------------------------------------

_GIF_MAX_CODE = 1 << 12  # LZW code width caps at 12 bits


class _LsbReader:
    """LSB-first bit reader over the concatenated image sub-blocks."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def read(self, width: int) -> int:
        while self.n < width:
            if self.pos >= len(self.data):
                raise ValueError("truncated GIF LZW stream")
            self.acc |= self.data[self.pos] << self.n
            self.pos += 1
            self.n += 8
        out = self.acc & ((1 << width) - 1)
        self.acc >>= width
        self.n -= width
        return out


def _lzw_decode(data: bytes, mcs: int, expected: int) -> list[int]:
    """GIF variable-width LZW -> pixel index list of EXACTLY
    ``expected`` entries (extra data past EOI is ignored, a short
    stream raises)."""
    if not 2 <= mcs <= 11:
        raise ValueError(f"invalid GIF LZW minimum code size {mcs}")
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    reader = _LsbReader(data)
    table: list[tuple[int, ...]] = []
    width = mcs + 1
    prev: tuple[int, ...] | None = None
    out: list[int] = []

    def reset() -> None:
        nonlocal table, width, prev
        table = [(i,) for i in range(clear)] + [(), ()]  # clear/eoi slots
        width = mcs + 1
        prev = None

    reset()
    while True:
        code = reader.read(width)
        if code == clear:
            reset()
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= clear:
                raise ValueError("GIF LZW stream starts with a non-literal")
            entry = table[code]
        else:
            if code < len(table):
                entry = table[code]
            elif code == len(table):
                entry = prev + (prev[0],)  # the KwKwK case
            else:
                raise ValueError("GIF LZW code beyond table")
            if len(table) < _GIF_MAX_CODE:
                table.append(prev + (entry[0],))
        out.extend(entry)
        prev = entry
        # width grows when the NEXT code could address the new entry;
        # at 4096 the table freezes until an explicit CLEAR (deferred
        # clear semantics)
        if len(table) == (1 << width) and width < 12:
            width += 1
        if len(out) >= expected:
            # some encoders omit EOI; accept exactly-full output
            if len(out) > expected:
                raise ValueError("GIF LZW produced more pixels than WxH")
            break
    if len(out) != expected:
        raise ValueError(
            f"GIF LZW produced {len(out)} pixels, image needs {expected}"
        )
    return out


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(payload: bytes) -> np.ndarray:
    """First image frame of a GIF87a/89a -> (h, w, 3) uint8 RGB via
    its (local-over-global) color table. Strict: bad signature,
    missing palette, truncation, or LZW inconsistencies raise."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    if len(payload) < 13:
        raise ValueError("truncated GIF header")
    packed = payload[10]
    pos = 13
    global_pal: np.ndarray | None = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        if len(payload) < pos + 3 * n:
            raise ValueError("truncated GIF global color table")
        global_pal = np.frombuffer(
            payload, dtype=np.uint8, count=3 * n, offset=pos
        ).reshape(n, 3)
        pos += 3 * n
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer before any image
            raise ValueError("GIF carries no image frame")
        if block == 0x21:  # extension: label + sub-blocks
            pos += 1
            while True:
                if pos >= len(payload):
                    raise ValueError("truncated GIF extension")
                sz = payload[pos]
                pos += 1 + sz
                if sz == 0:
                    break
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02X}")
        if len(payload) < pos + 9:
            raise ValueError("truncated GIF image descriptor")
        _left, _top, w, h, ipacked = struct.unpack_from("<HHHHB", payload, pos)
        pos += 9
        if w == 0 or h == 0:
            raise ValueError("degenerate GIF frame dimensions")
        pal = global_pal
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            if len(payload) < pos + 3 * n:
                raise ValueError("truncated GIF local color table")
            pal = np.frombuffer(
                payload, dtype=np.uint8, count=3 * n, offset=pos
            ).reshape(n, 3)
            pos += 3 * n
        if pal is None:
            raise ValueError("GIF frame has no color table")
        if pos >= len(payload):
            raise ValueError("truncated GIF before LZW code size")
        mcs = payload[pos]
        pos += 1
        chunks = bytearray()
        while True:
            if pos >= len(payload):
                raise ValueError("truncated GIF image data")
            sz = payload[pos]
            pos += 1
            if sz == 0:
                break
            if pos + sz > len(payload):
                raise ValueError("truncated GIF data sub-block")
            chunks += payload[pos : pos + sz]
            pos += sz
        idx = np.array(_lzw_decode(bytes(chunks), mcs, w * h), dtype=np.int64)
        if idx.max(initial=0) >= len(pal):
            raise ValueError("GIF pixel index beyond color table")
        img = pal[idx].reshape(h, w, 3)
        if ipacked & 0x40:  # interlaced: reorder the 4 passes
            out = np.empty_like(img)
            src = 0
            for start, step in _INTERLACE_PASSES:
                n_rows = len(range(start, h, step))
                out[start::step] = img[src : src + n_rows]
                src += n_rows
            img = out
        return np.ascontiguousarray(img)
    raise ValueError("truncated GIF (no trailer)")


class _LsbWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, width: int) -> None:
        self.acc |= code << self.n
        self.n += width
        while self.n >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def flush(self) -> bytes:
        if self.n:
            self.out.append(self.acc & 0xFF)
            self.acc, self.n = 0, 0
        return bytes(self.out)


def encode_gif(
    indices: np.ndarray, palette: np.ndarray, interlace: bool = False
) -> bytes:
    """(h, w) uint8 index raster + (n, 3) uint8 palette -> GIF89a.
    Fixed-width LZW: a CLEAR is emitted whenever the decoder's table
    is about to force a width grow, so every code stays at
    ``min_code_size + 1`` bits — valid for any conforming decoder and
    losslessly round-trippable."""
    if indices.ndim != 2 or indices.dtype != np.uint8:
        raise ValueError("encode_gif expects a (h, w) uint8 index raster")
    if palette.ndim != 2 or palette.shape[1] != 3 or len(palette) < 2:
        raise ValueError("encode_gif expects a (n>=2, 3) palette")
    if len(palette) > 256:
        # GIF color tables cap at 256 entries; a larger palette makes
        # pal_bits > 8 and the header's 3-bit size field (& 0x07)
        # would silently emit a corrupt stream (ADVICE r10).
        raise ValueError("encode_gif palette exceeds GIF's 256-color cap")
    h, w = indices.shape
    if int(indices.max(initial=0)) >= len(palette):
        raise ValueError("index raster addresses beyond the palette")
    pal_bits = max(1, (len(palette) - 1).bit_length())
    pal_n = 1 << pal_bits
    pal = np.zeros((pal_n, 3), dtype=np.uint8)
    pal[: len(palette)] = palette
    mcs = max(2, pal_bits)
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    width = mcs + 1
    writer = _LsbWriter()
    writer.put(clear, width)
    table_size = eoi + 1
    body = indices
    if interlace:
        rows = [body[start::step] for start, step in _INTERLACE_PASSES]
        body = np.concatenate(rows, axis=0)
    first = True
    for px in body.ravel():
        if not first:
            # the decoder adds one entry per code after the first;
            # clear BEFORE its table reaches the width boundary
            if table_size + 1 == (1 << width):
                writer.put(clear, width)
                table_size = eoi + 1
                first = True
            else:
                table_size += 1
        writer.put(int(px), width)
        first = False
    writer.put(eoi, width)
    data = writer.flush()
    out = bytearray(b"GIF89a")
    # global-table flag + size bits: table carries 2 << size_bits
    # entries == pal_n (NOT derived from mcs, which may exceed
    # pal_bits for tiny palettes)
    out += struct.pack("<HHBBB", w, h, 0x80 | ((pal_bits - 1) & 0x07), 0, 0)
    out += pal.tobytes()
    out += struct.pack(
        "<BHHHHB", 0x2C, 0, 0, w, h, 0x40 if interlace else 0x00
    )
    out.append(mcs)
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)
