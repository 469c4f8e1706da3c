"""Date/locale scalar functions (reference A17, src/main.py:247-255).

The reference sets the process-wide pt_BR.UTF-8 locale to format the
month name for the destination path. A JVM-locale-dependent
``date_format`` would make results environment-sensitive, so the
month name is a 12-entry map expression (SURVEY.md §4: "a non-built-in
... as an expression/map, not a rule") — deterministic everywhere.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_MESES_PT = (
    "Janeiro",
    "Fevereiro",
    "Março",
    "Abril",
    "Maio",
    "Junho",
    "Julho",
    "Agosto",
    "Setembro",
    "Outubro",
    "Novembro",
    "Dezembro",
)


def month_name_ptbr(date_col: str | Column) -> Column:
    """Capitalized Portuguese month name of a date column
    (reference: strftime('%B') under pt_BR + .capitalize())."""
    c = F.col(date_col) if isinstance(date_col, str) else date_col
    mapping = F.create_map(
        *[
            x
            for i, nome in enumerate(_MESES_PT)
            for x in (F.lit(i + 1), F.lit(nome))
        ]
    )
    return F.element_at(mapping, F.month(c))


def ref_ym(date_col: str | Column) -> Column:
    """The month partition value 'YYYYMM' (replaces the reference's
    per-month schema name rfb_YYYYMM, src/main.py:258)."""
    c = F.col(date_col) if isinstance(date_col, str) else date_col
    return F.date_format(c, "yyyyMM")


def month_dir_name(date_col: str | Column) -> Column:
    """The reference's destination directory component
    'M. MonthName' (src/main.py:257)."""
    c = F.col(date_col) if isinstance(date_col, str) else date_col
    return F.concat(
        F.month(c).cast("string"), F.lit(". "), month_name_ptbr(c)
    )
