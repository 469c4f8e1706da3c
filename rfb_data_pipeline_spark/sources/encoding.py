"""Encoding detection & transcode utilities (reference A4/A5).

The reference sniffs charsets with chardet over the first 100 KB
(src/main.py:134-135) and transcodes line-by-line to utf-8-sig with
errors='replace' (src/main.py:140-148). chardet isn't available here,
so detection is a deterministic heuristic with the same contract:
BOM check → strict-UTF-8 probe → latin-1 fallback (latin-1 decodes any
byte string, mirroring chardet's common answer for RFB files).

These are driver-side, per-file probes — a pre-scan step, not a
distributed operator (SURVEY.md §4: "a pre-scan probe, NOT a Catalyst
rule"). The transcode itself can run distributed via
``transcode_df`` when files are large.
"""

from __future__ import annotations

import codecs
import os

SAMPLE_BYTES = 100_000  # same probe size as the reference

# Python codec name → charset name Spark's CSV reader accepts.
_SPARK_CHARSETS = {
    "latin-1": "iso-8859-1",
    "utf-8-sig": "utf-8",  # read_rfb_csv strips the surviving BOM
    "utf-8": "utf-8",
    "utf-16": "utf-16",
    "cp1252": "windows-1252",
}

# 0x80–0x9F: C1 control characters in latin-1 (never intentional in
# text) but printable punctuation/symbols in windows-1252 — except the
# five codepoints cp1252 leaves undefined.
_CP1252_UNDEFINED = {0x81, 0x8D, 0x8F, 0x90, 0x9D}


def to_spark_charset(encoding: str) -> str:
    return _SPARK_CHARSETS.get(encoding.lower(), encoding)


def sniff_encoding(path: str, sample_bytes: int = SAMPLE_BYTES) -> str:
    """Detect a file's encoding from its first ``sample_bytes``.

    BOM check → strict-UTF-8 probe → windows-1252 vs latin-1
    discrimination over the 0x80–0x9F range (the byte-frequency pass
    chardet does, reference src/main.py:134-135): smart quotes, the
    euro sign, en/em dashes etc. live there in cp1252 while latin-1
    maps them to C1 controls no real text contains.
    """
    with open(path, "rb") as f:
        head = f.read(sample_bytes)
    if head.startswith(codecs.BOM_UTF8):
        return "utf-8-sig"
    if head.startswith(codecs.BOM_UTF16_LE) or head.startswith(codecs.BOM_UTF16_BE):
        return "utf-16"
    try:
        head.decode("utf-8", errors="strict")
        return "utf-8"
    except UnicodeDecodeError as e:
        # The sample boundary can cut a multibyte sequence: a decode
        # error STARTING in the last 3 bytes of a full sample is an
        # incomplete trailing character, not evidence of non-UTF-8 —
        # falling through here misdetected valid UTF-8 files as
        # latin-1 and mojibake'd the whole read (r09 review, verified).
        # But a clean-ASCII-prefix file whose FIRST genuinely non-UTF-8
        # byte happens to fall in that tail would be misdetected the
        # other way (ADVICE r09), so re-sample 4 bytes wider to
        # disambiguate: a truncated character COMPLETES in <= 3 more
        # bytes, junk fails at the same offset regardless.
        if len(head) == sample_bytes and e.start >= len(head) - 3:
            with open(path, "rb") as f:
                ext = f.read(sample_bytes + 4)
            if len(ext) < sample_bytes + 4:
                # the widened window reaches EOF — the file's true
                # tail is in hand. An incremental decode with
                # final=False accepts an incomplete TRAILING character
                # (EOF truncation, damage bounded to the last char
                # under errors=replace) while genuine junk anywhere
                # still raises. This also covers files ending 1-3
                # bytes PAST the sample boundary, which the first
                # version of this fix misdetected (r10 review,
                # reproduced).
                dec = codecs.getincrementaldecoder("utf-8")()
                try:
                    dec.decode(ext, False)
                    return "utf-8"
                except UnicodeDecodeError:
                    pass
            else:
                try:
                    ext.decode("utf-8", errors="strict")
                    return "utf-8"
                except UnicodeDecodeError as e2:
                    # the cut character completed and the WIDER sample
                    # was cut again at its own tail → UTF-8; a failure
                    # at the original offset means real junk → fall
                    # through to the 8-bit discrimination below.
                    # The tail is re-checked with an INCREMENTAL decode
                    # (final=False), which accepts only a valid
                    # incomplete TRAILING character: junk bytes in the
                    # widened tail raise and fall through, instead of
                    # being waved past on a clean prefix (ADVICE r10 —
                    # the prefix-only check re-created the original
                    # boundary ambiguity one window later). Residual,
                    # irreducible ambiguity of any bounded sample: a
                    # tail that IS a valid incomplete multibyte prefix
                    # whose true continuation past the widened window
                    # is junk still reads as utf-8 — damage is bounded
                    # to errors=replace on the junk at transcode time.
                    if e2.start > e.start and e2.start >= len(ext) - 3:
                        dec = codecs.getincrementaldecoder("utf-8")()
                        try:
                            dec.decode(ext, False)
                            return "utf-8"
                        except UnicodeDecodeError:
                            pass
    c1 = [b for b in head if 0x80 <= b <= 0x9F]
    if c1 and all(b not in _CP1252_UNDEFINED for b in c1):
        return "cp1252"
    return "latin-1"


def transcode_file(
    src: str, dst: str, src_encoding: str | None = None, errors: str = "replace"
) -> tuple[int, int]:
    """Line-by-line transcode to UTF-8 (reference errors='replace'
    semantics, src/main.py:145-148). Returns (lines_in, lines_out);
    the caller asserts equality (validation A7). lines_out is an
    INDEPENDENT re-count of the written file — counting inside the
    write loop made the pair (n, n) by construction, so the A7 gate
    could never fail (r09 review).
    """
    enc = src_encoding or sniff_encoding(src)
    lines_in = 0
    with open(src, "r", encoding=enc, errors=errors) as fin, open(
        dst, "w", encoding="utf-8"
    ) as fout:
        for line in fin:
            lines_in += 1
            fout.write(line)
    return lines_in, count_lines(dst)


def count_lines(path: str, encoding: str = "utf-8") -> int:
    """Full-scan line count (reference A6, src/main.py:39-45)."""
    n = 0
    with open(path, "r", encoding=encoding, errors="replace") as f:
        for _ in f:
            n += 1
    return n


def detect_all(
    directory: str, suffix: str | None = None
) -> dict[str, str]:
    """Sniff every matching file in a directory → {path: encoding}.

    Default (``suffix=None``): files that ROUTE to an RFB table —
    real drop members are named like ``K3241...EMPRECSV``, so the old
    '.csv' default matched nothing and returned {} silently (r09
    review). Pass an explicit suffix to filter by extension instead.
    """
    from rfb_data_pipeline_spark.sources.rfb_csv import route_table_py

    out: dict[str, str] = {}
    for name in sorted(os.listdir(directory)):
        if (
            name.lower().endswith(suffix)
            if suffix is not None
            else route_table_py(name) is not None
        ):
            p = os.path.join(directory, name)
            out[p] = sniff_encoding(p)
    return out
