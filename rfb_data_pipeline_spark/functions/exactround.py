"""Engine-exact rounding for monetary aggregates.

``round(sum(money), 2)`` / ``round(avg(money), 2)`` over doubles is
knife-edge divergent between engines when the TRUE value lands
exactly on a rounding boundary (e.g. an average of two 2-decimal
prices ending .725): Spark rounds the SHORTEST DECIMAL RENDERING of
the double HALF_UP while DuckDB rounds the binary value, so .725
splits into .73 vs .72. The events family solved this for sums with
the integer-cents discipline (e01); this module generalizes it to
sums AND averages on any decimal grid, found in-contract by
tests/test_fuzz_relational.py (q14's monthly average of 2-dec
o_totalprice diverged on a 2-order month with an odd-cent sum).

Recipe: per-row values are lifted to EXACT INTEGER UNITS on their
decimal grid (a 2-dec price → cents; a price×(1−discount) product →
10⁻⁴ units), summed losslessly (decimal(38,0) in Spark, HUGEINT in
DuckDB — no 64-bit overflow at any corpus size), and the final
round-half-up happens in integer arithmetic::

    round_half_up(a / d)  =  (2a + d  −  (2a + d) mod 2d) / 2d    (a, d ≥ 0)

with the sign split off first (balances can be negative). Both
engines evaluate the identical exact formula, so boundary cases are
deterministic by construction, and off-boundary results are
bit-identical to the plain ``round``.

Scale: the per-row lift is one multiply+round inside codegen; the
aggregate is a plain integral sum — partial aggregation (map-side
combine) applies exactly as before.

Accumulator modes (the stage_boundary local/storage pattern):
``long`` (default) keeps everything in 64-bit integers — measured at
~1.1x the plain double-sum cost vs ~2.2x for decimal(38,0) — and is
EXACT while every intermediate stays below 2^52 units: at the finest
grid used (10^-6, q01's sum_charge) that is a per-group sum of
~4.5e15 units = $4.5e9; at cents it is $45e12 per group. Deployments
aggregating beyond that flip ``RFB_EXACTROUND_MODE=decimal`` for
decimal(38,0) accumulators (no code change — same formula, wider
ints); the DuckDB twins always run HUGEINT (native 128-bit, no speed
penalty there). Mode equality is pinned in tests.

Fail-loud guarantee: the engine runs under ANSI mode
(``spark.sql.ansi.enabled=true``, the Spark 4 default — verified in
session), so a long-mode sum that exceeds 2^63 raises
ARITHMETIC_OVERFLOW instead of silently wrapping. A deployment past
the long bound therefore gets an explicit error instructing the
decimal flip — never a wrong rounded value.
"""

from __future__ import annotations

import os

from pyspark.sql import Column
from pyspark.sql import functions as F

_DEC = "decimal(38,0)"


def _mode() -> str:
    m = os.environ.get("RFB_EXACTROUND_MODE", "long")
    if m not in ("long", "decimal"):
        raise ValueError(f"RFB_EXACTROUND_MODE must be long|decimal, got {m!r}")
    return m


def _acc_type() -> str:
    return "long" if _mode() == "long" else _DEC


def _units(expr: Column, grid_decimals: int) -> Column:
    """Exact integer units of a value living on a 10^-g decimal grid."""
    return F.round(expr * F.lit(10 ** grid_decimals)).cast(_acc_type())


def _half_up_div(a: Column, d: Column) -> Column:
    """round(a/d) with ties away from zero, for non-negative exact
    integer a and positive d — integer arithmetic only. In long mode
    the one division is done in double and truncated back: the
    dividend is an exact multiple of the divisor, so the quotient is
    exact whenever it stays below 2^52 (the documented long-mode
    bound); decimal mode divides in decimal."""
    # The division is ALWAYS decimal-exact: in long mode only the
    # per-ROW accumulation stays long (the fast path) — the one
    # division per GROUP row widens to DECIMAL and uses the pmod
    # floor. The old long-mode shortcut divided in double, which is
    # exact only while a < 2^51 units and SILENTLY off-by-one-cent
    # above (r09 review: ANSI overflow fires only past 2^63, a 2048×
    # window with no error); real sums (q01 at sf0.1 ≈ 3×10^16
    # units) live inside that window.
    e = a.cast(_DEC) * 2 + d
    q = (e - F.pmod(e, d * 2)) / (d * 2)
    return q.cast("long") if _mode() == "long" else q


def units(expr: Column, grid_decimals: int) -> Column:
    """Public per-row lift — for operators that pre-aggregate units
    across an intermediate grouping (q04's per-order partial sum)."""
    return _units(expr, grid_decimals)


def finish_sum(s: Column, grid_decimals: int, out_decimals: int) -> Column:
    """Final HALF_UP of an ALREADY-SUMMED exact units column."""
    assert grid_decimals >= out_decimals
    sgn = F.when(s < 0, F.lit(-1)).otherwise(F.lit(1))
    d = F.lit(10 ** (grid_decimals - out_decimals)).cast(_acc_type())
    q = _half_up_div(F.abs(s), d)
    return (sgn * q / F.lit(10 ** out_decimals)).cast("double")


def money_sum(expr: Column, grid_decimals: int, out_decimals: int) -> Column:
    """Engine-exact ``round(sum(expr), out)`` for expr on a 10^-g grid."""
    return finish_sum(
        F.sum(_units(expr, grid_decimals)), grid_decimals, out_decimals
    )


def money_avg(expr: Column, grid_decimals: int, out_decimals: int) -> Column:
    """Engine-exact ``round(avg(expr), out)``; NULL on empty input
    (matching ``avg``). NULL rows are excluded like ``avg`` does."""
    s = F.sum(_units(expr, grid_decimals))
    n = F.count(expr)
    sgn = F.when(s < 0, F.lit(-1)).otherwise(F.lit(1))
    a = F.abs(s) * F.lit(10 ** max(0, out_decimals - grid_decimals))
    d = n.cast(_acc_type()) * F.lit(10 ** max(0, grid_decimals - out_decimals))
    q = _half_up_div(a, d)
    val = (sgn * q / F.lit(10 ** out_decimals)).cast("double")
    return F.when(n > 0, val)


def sql_money_sum(expr: str, grid_decimals: int, out_decimals: int) -> str:
    """DuckDB twin of money_sum — HUGEINT integer math, same formula."""
    assert grid_decimals >= out_decimals
    gp = 10 ** grid_decimals
    d = 10 ** (grid_decimals - out_decimals)
    op = 10 ** out_decimals
    s = f"sum(CAST(round(({expr}) * {gp}) AS HUGEINT))"
    e = f"(abs({s}) * 2 + {d})"
    q = f"(({e} - ({e} % {2 * d})) // {2 * d})"
    sgn = f"(CASE WHEN {s} < 0 THEN -1 ELSE 1 END)"
    return f"(CAST({sgn} * {q} AS DOUBLE) / {op})"


def sql_money_avg(expr: str, grid_decimals: int, out_decimals: int) -> str:
    """DuckDB twin of money_avg."""
    gp = 10 ** grid_decimals
    npow = 10 ** max(0, out_decimals - grid_decimals)
    dpow = 10 ** max(0, grid_decimals - out_decimals)
    op = 10 ** out_decimals
    s = f"sum(CAST(round(({expr}) * {gp}) AS HUGEINT))"
    n = f"count({expr})"
    a = f"(abs({s}) * {npow})"
    d = f"(CAST({n} AS HUGEINT) * {dpow})"
    e = f"({a} * 2 + {d})"
    q = f"(({e} - ({e} % ({d} * 2))) // ({d} * 2))"
    sgn = f"(CASE WHEN {s} < 0 THEN -1 ELSE 1 END)"
    return (
        f"(CASE WHEN {n} > 0"
        f" THEN CAST({sgn} * {q} AS DOUBLE) / {op} ELSE NULL END)"
    )


def ratio_round(
    num: Column, den: Column, out_decimals: int, nonneg: bool = False
) -> Column:
    """Engine-exact ``round(num/den, out)`` for INTEGER-valued columns
    (rates, per-token averages, percentiles). NULL when den <= 0 —
    both engines' SQL twins guard identically, so the zero-denominator
    path can never diverge either. ``nonneg=True`` (valid whenever the
    numerator is provably >= 0 — every count/length ratio) skips the
    per-row abs/sign pair; measured FASTER than the old plain
    ``round`` on the per-row text ratios, because the integer path
    also avoids round()'s per-row BigDecimal conversion."""
    n = num.cast(_acc_type()) * F.lit(10 ** out_decimals)
    d = den.cast(_acc_type())
    if nonneg:
        q = _half_up_div(n, d)
        return F.when(
            den > 0, (q / F.lit(10 ** out_decimals)).cast("double")
        )
    sgn = F.when(n < 0, F.lit(-1)).otherwise(F.lit(1))
    q = _half_up_div(F.abs(n), d)
    return F.when(
        den > 0, (sgn * q / F.lit(10 ** out_decimals)).cast("double")
    )


def sql_ratio_round(
    num: str, den: str, out_decimals: int, nonneg: bool = False
) -> str:
    """DuckDB twin of ratio_round (``nonneg`` mirrors the Spark fast
    path — same formula minus the abs/sign pair)."""
    op = 10 ** out_decimals
    n = f"(CAST({num} AS HUGEINT) * {op})"
    d = f"CAST({den} AS HUGEINT)"
    if nonneg:
        e = f"({n} * 2 + {d})"
        q = f"(({e} - ({e} % ({d} * 2))) // ({d} * 2))"
        return (
            f"(CASE WHEN ({den}) > 0"
            f" THEN CAST({q} AS DOUBLE) / {op} ELSE NULL END)"
        )
    e = f"(abs({n}) * 2 + {d})"
    q = f"(({e} - ({e} % ({d} * 2))) // ({d} * 2))"
    sgn = f"(CASE WHEN {n} < 0 THEN -1 ELSE 1 END)"
    return (
        f"(CASE WHEN ({den}) > 0"
        f" THEN CAST({sgn} * {q} AS DOUBLE) / {op} ELSE NULL END)"
    )
