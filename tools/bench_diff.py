"""Per-query bench diff between rounds (VERDICT r04: "the judge
should never again be unable to diff rounds").

Compares min-of-3 timings from two bench payloads. Sources, newest
first: ``BENCH_local.json`` (written by every bench.py run) and the
driver-recorded ``BENCH_r{N}.json`` files (whose ``parsed`` field
holds the payload when the stdout line was machine-readable).

Usage: python tools/bench_diff.py [old] [new]
  with no args: newest two available payloads.
  args may be round numbers ("3"), file paths, or "local".
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(ref: str | None, skip: str | None = None) -> tuple[str, dict]:
    """Resolve a payload reference to (label, payload-with-queries)."""
    candidates: list[str] = []
    if ref is None:
        candidates = sorted(
            glob.glob(os.path.join(ROOT, "BENCH_r*.json")),
            key=lambda p: int(re.search(r"r(\d+)", p).group(1)),
            reverse=True,
        )
        local = os.path.join(ROOT, "BENCH_local.json")
        if os.path.exists(local):
            candidates.insert(0, local)
    elif ref == "local":
        candidates = [os.path.join(ROOT, "BENCH_local.json")]
    elif ref.isdigit():
        candidates = [os.path.join(ROOT, f"BENCH_r{int(ref):02d}.json")]
    else:
        candidates = [ref]
    for path in candidates:
        if skip and os.path.basename(path) == skip:
            continue
        if not os.path.exists(path):
            continue
        with open(path) as fh:
            doc = json.load(fh)
        payload = doc.get("parsed") if isinstance(doc.get("parsed"), dict) else doc
        if payload and isinstance(payload.get("queries"), dict):
            return os.path.basename(path), payload
    raise SystemExit(f"no usable bench payload for {ref!r}")


def main() -> None:
    argv = sys.argv[1:]
    new_label, new = _load(argv[1] if len(argv) > 1 else None)
    old_label, old = _load(argv[0] if argv else None, skip=new_label)
    # prefer the full-registry timing map when a payload has one
    # (bench.py --full), falling back to the headline set
    oq = old.get("queries_full") or old["queries"]
    nq = new.get("queries_full") or new["queries"]
    rows = []
    for name in sorted(set(oq) | set(nq)):
        a, b = oq.get(name), nq.get(name)
        delta = (b - a) if (a is not None and b is not None) else None
        rows.append((name, a, b, delta))
    rows.sort(key=lambda r: -abs(r[3]) if r[3] is not None else 1.0)
    print(f"# min-of-3 seconds: {old_label} -> {new_label}")
    print(f"{'query':34s} {'old':>8s} {'new':>8s} {'delta':>8s}")
    for name, a, b, d in rows:
        fa = f"{a:8.3f}" if a is not None else "       -"
        fb = f"{b:8.3f}" if b is not None else "       -"
        fd = f"{d:+8.3f}" if d is not None else "     new" if a is None else "    gone"
        print(f"{name:34s} {fa} {fb} {fd}")
    both = [r for r in rows if r[3] is not None]
    if both:
        ta = sum(r[1] for r in both)
        tb = sum(r[2] for r in both)
        print(
            f"{'TOTAL (shared queries)':34s} {ta:8.3f} {tb:8.3f} {tb - ta:+8.3f}"
        )


if __name__ == "__main__":
    main()
