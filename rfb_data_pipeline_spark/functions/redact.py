"""PII redaction expressions for training-data preparation.

A corpus scrubber for the common Brazilian-registry + web PII classes
the reference's domain implies (CNPJ/CPF identifiers, e-mails,
phones): pure ``regexp_replace`` chains — JVM-side, codegen-friendly,
no Python in the hot path. The synthetic ``documents`` testdata
contains no PII (an oracle query would pass vacuously), so these are
pinned by fixture tests (tests/test_redact.py) instead of a driver
oracle entry.

Patterns are deliberately conservative (word-boundary anchored) —
a redactor that eats ordinary numbers destroys training data quality.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Order matters: the most specific pattern first so e.g. a formatted
# CNPJ is not half-eaten by the bare-digit rule.
PATTERNS: list[tuple[str, str, str]] = [
    # label, java-regex, replacement token
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    # CNPJ 00.000.000/0000-00 (formatted) or 14 bare digits
    ("cnpj", r"\b\d{2}\.\d{3}\.\d{3}/\d{4}-\d{2}\b", "<CNPJ>"),
    ("cnpj_bare", r"\b\d{14}\b", "<CNPJ>"),
    # CPF 000.000.000-00 (formatted) or 11 bare digits
    ("cpf", r"\b\d{3}\.\d{3}\.\d{3}-\d{2}\b", "<CPF>"),
    ("cpf_bare", r"\b\d{11}\b", "<CPF>"),
    # BR phone (+55 optional, 10-11 digits with separators)
    ("phone", r"(?:\+55\s?)?\(?\d{2}\)?\s?9?\d{4}[-\s]?\d{4}\b", "<PHONE>"),
]


def redact(col: str | Column) -> Column:
    """Text with every PII class replaced by its token."""
    out = F.col(col) if isinstance(col, str) else col
    for _, pattern, token in PATTERNS:
        out = F.regexp_replace(out, pattern, token)
    return out


def redaction_counts(col: str | Column) -> Column:
    """Struct of per-class match counts (pre-redaction) — the audit
    metric a scrubbing pipeline reports per partition."""
    base = F.col(col) if isinstance(col, str) else col
    fields = []
    seen: dict[str, Column] = {}
    text = base
    for label, pattern, _ in PATTERNS:
        cnt = F.size(F.regexp_extract_all(text, F.lit(pattern), F.lit(0)))
        # apply redaction progressively so overlapping classes (cnpj
        # formatted vs bare) are not double-counted
        text = F.regexp_replace(text, pattern, "")
        seen[label] = cnt
        fields.append(cnt.alias(f"n_{label}"))
    return F.struct(*fields)
