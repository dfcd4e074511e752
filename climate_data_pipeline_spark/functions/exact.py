"""Exact, order-independent aggregation of fixed-point doubles.

Currency-style columns (k decimal places) sum exactly — and therefore
reproducibly under any partitioning — when aggregated as scaled 64-bit
integers: round(x·10^k) is bit-exact for any value whose true decimal
form has ≤ k places (the representation error of the product is ~10⁹×
smaller than the rounding boundary), and integer sums are associative.
This is ~2× faster than DECIMAL aggregation (measured: 0.68s vs 1.40s on
the sf0.1 flagship aggregate) and keeps the whole pipeline in primitive
longs — the right trade at 100 TB.

Overflow envelope: |x| ≤ 10^(15-k) per row and Σ|x·10^k| < 2^63 ≈ 9.2e18
— comfortable for row counts into the trillions at currency magnitudes.
The SQL mirrors (`sql_exact_sum` / `sql_exact_avg`) compile the identical
arithmetic for the DuckDB oracle (DuckDB's double→BIGINT cast rounds
while Spark's truncates, but after round() the value is integral so both
agree).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def exact_sum(col: Column | str, scale: int = 2) -> Column:
    """Σx as a double, computed exactly via scaled-integer accumulation."""
    c = F.col(col) if isinstance(col, str) else col
    factor = float(10 ** scale)
    return (F.sum(F.round(c * factor).cast("long")) / factor)


def exact_avg(col: Column | str, scale: int = 2) -> Column:
    """Mean as a double with an exact numerator (Σ via scaled integers)."""
    c = F.col(col) if isinstance(col, str) else col
    factor = float(10 ** scale)
    return ((F.sum(F.round(c * factor).cast("long")) / factor)
            / F.count(c))


def sql_exact_sum(expr: str, scale: int = 2) -> str:
    factor = 10 ** scale
    return f"SUM(CAST(round(({expr}) * {factor}) AS BIGINT)) / {factor}.0"


def sql_exact_avg(expr: str, scale: int = 2) -> str:
    factor = 10 ** scale
    return (f"(SUM(CAST(round(({expr}) * {factor}) AS BIGINT)) / {factor}.0)"
            f" / COUNT({expr})")


def round_port(col: Column | str, scale: int = 6) -> Column:
    """Tie-portable decimal rounding for RATIONAL-valued doubles.

    ``round(x, s)`` is not engine-portable when x can land exactly on a
    decimal tie (integer ratios, scaled-integer averages, cents × rate):
    Spark rounds the double's exact binary expansion via BigDecimal
    HALF_UP while DuckDB's decimal round takes a different path, and the
    tie breaks differently (observed only at sf0.1+: more rows → some
    row hits the boundary). Rounding in INTEGER units — round(x·10^s)
    at scale 0, then divide — makes the tie an exactly-representable
    .5 that both engines resolve half-away-from-zero. Transcendental
    values (ln/sqrt/cos outputs) cannot tie and keep plain round.

    The trailing ``+ 0.0`` normalizes IEEE −0.0 (a negative value that
    rounds to zero yields −0.0 here, which Spark prints as 0.0 but
    DuckDB keeps as −0.0) — folded in so the helper is safe for
    possibly-negative inputs by construction."""
    c = F.col(col) if isinstance(col, str) else col
    factor = float(10 ** scale)
    return F.round(c * factor) / factor + F.lit(0.0)


def sql_round_port(expr: str, scale: int = 6) -> str:
    """DuckDB mirror of :func:`round_port` — kept adjacent so the two
    definitions cannot drift (including the −0.0-normalizing
    ``+ 0.0``)."""
    factor = 10 ** scale
    return f"(round(({expr}) * {factor}) / {factor}.0 + 0.0)"
