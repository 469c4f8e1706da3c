"""Download stage (reference A2/A21, src/main.py:79-103).

Streamed chunked fetch with bounded retries and linear backoff, per
manifest row. The transport is injected for offline tests; the chunk
size / retry / backoff constants mirror the reference's de-facto
config (BASELINE.md). Downloads run driver-side in a small thread
pool: the work unit is ~40 archives/month (I/O bound), not a
distributed dataset — executor tasks would add scheduling overhead
for zero parallelism gain beyond the pool.
"""

from __future__ import annotations

import os
import time
import urllib.request
from collections.abc import Callable
from concurrent.futures import ThreadPoolExecutor

CHUNK_SIZE = 8_192  # reference src/main.py:90
MAX_ATTEMPTS = 3  # reference src/main.py:85
BACKOFF_SEC = 5.0  # reference src/main.py:96
TIMEOUT_SEC = 60  # reference src/main.py:87


def default_stream(url: str, dest: str, timeout: int = TIMEOUT_SEC) -> int:
    """Stream url → dest in CHUNK_SIZE chunks; returns bytes written."""
    n = 0
    with urllib.request.urlopen(url, timeout=timeout) as resp:  # noqa: S310
        with open(dest, "wb") as f:
            while True:
                chunk = resp.read(CHUNK_SIZE)
                if not chunk:
                    break
                f.write(chunk)
                n += len(chunk)
    return n


def fetch_with_retries(
    url: str,
    dest: str,
    stream: Callable[[str, str], int] = default_stream,
    max_attempts: int = MAX_ATTEMPTS,
    backoff_sec: float = BACKOFF_SEC,
) -> tuple[bool, int, str | None]:
    """(ok, attempts_used, error). Partial files are removed on
    failure so a resume never sees a truncated archive."""
    err: str | None = None
    for attempt in range(1, max_attempts + 1):
        try:
            stream(url, dest)
            return True, attempt, None
        except Exception as exc:  # noqa: BLE001 — retry any transport error
            err = f"{type(exc).__name__}: {exc}"
            if os.path.exists(dest):
                os.remove(dest)
            if attempt < max_attempts:
                time.sleep(backoff_sec)
    return False, max_attempts, err


def download_pending(
    work: list[tuple[str, str, str]],
    stream: Callable[[str, str], int] = default_stream,
    max_workers: int = 4,
    backoff_sec: float = BACKOFF_SEC,
) -> list[dict]:
    """Fetch (arquivo, url, dest) triples concurrently; returns per-file
    results for manifest.apply_updates."""

    def one(item: tuple[str, str, str]) -> dict:
        arquivo, url, dest = item
        ok, attempts, err = fetch_with_retries(
            url, dest, stream=stream, backoff_sec=backoff_sec
        )
        return {
            "arquivo": arquivo,
            "ok": ok,
            "attempts": attempts,
            "caminho_zip": dest if ok else None,
            "error": err,
        }

    with ThreadPoolExecutor(max_workers=max_workers) as pool:
        return list(pool.map(one, work))
