"""CNPJ identifier functions as native Catalyst expressions.

The CNPJ check-digit (DV) algorithm is public: 12 digits weighted
5,4,3,2,9,8,7,6,5,4,3,2 → first DV; 13 digits weighted
6,5,4,3,2,9,8,7,6,5,4,3,2 → second DV; each DV = 11 - (sum mod 11),
folded to 0 when ≥ 10.

Implemented with substring/cast arithmetic instead of a Python UDF so
validation stays inside whole-stage codegen (SURVEY.md §2.2 UDF
surface: "expressible in native expressions — prefer native"). At
100 TB a per-row Python UDF here would dominate the ingest cost.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_W1 = (5, 4, 3, 2, 9, 8, 7, 6, 5, 4, 3, 2)
_W2 = (6, 5, 4, 3, 2, 9, 8, 7, 6, 5, 4, 3, 2)


def _digit(col: Column, pos: int) -> Column:
    """1-based digit extraction as int."""
    return F.substring(col, pos, 1).cast("int")


def _dv(col: Column, weights: tuple[int, ...]) -> Column:
    total = None
    for i, w in enumerate(weights):
        term = _digit(col, i + 1) * w
        total = term if total is None else total + term
    rem = total % 11
    return F.when(rem < 2, F.lit(0)).otherwise(11 - rem)


def cnpj14(basico: str | Column, ordem: str | Column, dv: str | Column) -> Column:
    """Assemble the 14-digit CNPJ with leading zeros restored."""
    b = F.lpad(F.col(basico) if isinstance(basico, str) else basico, 8, "0")
    o = F.lpad(F.col(ordem) if isinstance(ordem, str) else ordem, 4, "0")
    d = F.lpad(F.col(dv) if isinstance(dv, str) else dv, 2, "0")
    return F.concat(b, o, d)


def cnpj_is_valid(cnpj: str | Column) -> Column:
    """True when the 14-digit CNPJ's two check digits are correct."""
    c = F.col(cnpj) if isinstance(cnpj, str) else cnpj
    well_formed = c.rlike(r"^\d{14}$")
    dv1 = _dv(c, _W1)
    dv2 = _dv(c, _W2)
    return (
        well_formed
        & (_digit(c, 13) == dv1)
        & (_digit(c, 14) == dv2)
    )


def compute_check_digits(first12: str | Column) -> Column:
    """The two check digits for a 12-digit CNPJ prefix, as a string."""
    c = F.col(first12) if isinstance(first12, str) else first12
    dv1 = _dv(c, _W1)
    with_dv1 = F.concat(c, dv1.cast("string"))
    dv2 = _dv(with_dv1, _W2)
    return F.concat(dv1.cast("string"), dv2.cast("string"))
