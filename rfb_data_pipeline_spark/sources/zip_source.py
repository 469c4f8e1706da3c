"""Distributed zip ingestion (reference A3, src/main.py:111-119).

Zip is not a splittable codec, so parallelism is per-archive: each
executor task opens whole zip files via the ``binaryFile`` source and
yields decoded member lines through ``mapPartitions``. For the RFB
drop (~37 archives/month) this gives archive-level parallelism, which
matches the reference's work units while removing its serial loop.

Corrupt archives don't fail the job: they surface as rows with
``error`` set, feeding the manifest's self-heal transition
(status_download → 'pendente', src/main.py:116-119).
"""

from __future__ import annotations

import io
import zipfile
from collections.abc import Iterator

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

MEMBER_SCHEMA = StructType(
    [
        StructField("archive", StringType(), False),
        StructField("member", StringType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("error", StringType(), True),
    ]
)

LINE_SCHEMA = StructType(
    [
        StructField("archive", StringType(), False),
        StructField("member", StringType(), False),
        StructField("line", StringType(), True),
    ]
)


def list_zip_members(spark: SparkSession, path: str) -> DataFrame:
    """One row per archive member (or one error row per bad archive)."""
    binaries = spark.read.format("binaryFile").load(path).select("path", "content")

    def scan(rows: Iterator[Row]) -> Iterator[Row]:
        for row in rows:
            try:
                with zipfile.ZipFile(io.BytesIO(row.content)) as zf:
                    for info in zf.infolist():
                        yield Row(
                            archive=row.path,
                            member=info.filename,
                            n_bytes=info.file_size,
                            error=None,
                        )
            except zipfile.BadZipFile as exc:
                yield Row(
                    archive=row.path, member=None, n_bytes=None, error=str(exc)
                )

    return spark.createDataFrame(binaries.rdd.mapPartitions(scan), MEMBER_SCHEMA)


def read_zip_lines(
    spark: SparkSession,
    path: str,
    encoding: str = "utf-8",
    errors: str = "replace",
) -> DataFrame:
    """Decoded text lines of every member of every archive under
    ``path``; corrupt archives are skipped (surface them first via
    ``list_zip_members``). Mirrors the reference's unzip→transcode
    with errors='replace' (src/main.py:111-148) in one distributed
    pass with no intermediate files.
    """
    binaries = spark.read.format("binaryFile").load(path).select("path", "content")

    def lines(rows: Iterator[Row]) -> Iterator[Row]:
        import zlib

        def one_terminator(s: str) -> str:
            # strip exactly ONE line terminator: rstrip("\r\n") also
            # ate a field's own trailing \r before a CRLF (r09 review)
            if s.endswith("\n"):
                s = s[:-1]
            if s.endswith("\r"):
                s = s[:-1]
            return s

        for row in rows:
            try:
                zf = zipfile.ZipFile(io.BytesIO(row.content))
            except zipfile.BadZipFile:
                continue
            with zf:
                for info in zf.infolist():
                    if info.is_dir():
                        continue
                    try:
                        # member-data corruption (CRC mismatch,
                        # garbled deflate) raises DURING the read
                        # loop, not at ZipFile() — buffer the member
                        # inside the guard so one damaged archive
                        # skips instead of killing the job (r09
                        # review, verified: BadZipFile('Bad CRC-32')
                        # and zlib.error both escape mid-iteration)
                        payload = zf.read(info)
                    except (zipfile.BadZipFile, zlib.error, OSError):
                        continue
                    # newline="\n": only LF terminates a line. The
                    # default universal mode also breaks on a BARE \r,
                    # so a field value ending in \r split the row in
                    # two before rstrip even ran (r09 review). RFB
                    # drops are LF/CRLF; \r-only files are out of
                    # contract.
                    text = io.TextIOWrapper(
                        io.BytesIO(payload),
                        encoding=encoding,
                        errors=errors,
                        newline="\n",
                    )
                    for line in text:
                        yield Row(
                            archive=row.path,
                            member=info.filename,
                            line=one_terminator(line),
                        )

    return spark.createDataFrame(binaries.rdd.mapPartitions(lines), LINE_SCHEMA)
