"""Cross-engine-deterministic numeric display helpers.

``round(x, 6)`` is NOT a portable operation even on bit-identical input
doubles: Spark converts the double through its shortest decimal
representation before HALF_UP (java BigDecimal.valueOf), while DuckDB
rounds the exact binary value — so a quotient whose shortest repr lands
exactly on the half boundary (e.g. 27484/64000 = "0.4294375") rounds UP
in Spark and DOWN in DuckDB. The sf0.1 deep gate caught two live
instances (q_quality_score, q_event_interarrival).

``round6_ratio`` sidesteps float round() entirely for non-negative
integer ratios: the half-up 6-decimal rounding is done in exact int64
arithmetic — ``floor((2·num·10⁶ + den) / (2·den)) / 10⁶`` — where the
floor division is computed as ``(a - pmod(a, b)) / b`` so every
intermediate is an exact integer (no float floor on an inexact
quotient). Both engines then perform ONE identical IEEE division by 10⁶
on identical integers, yielding bit-identical doubles with no rounding
function in the path.

Domain: num ≥ 0, den > 0, and 2·num·10⁶ + den must stay below 2^53
(num ≲ 4.5e9) — Spark's ``/`` converts bigint operands to double, so
every integer flowing into it must be double-exact. For larger
numerators (e.g. microsecond sums), skip
rounding altogether and emit the raw quotient: identical exact-integer
operands through the same IEEE op sequence are already bit-identical
across engines — it is only round() that diverges.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SCALE = 1_000_000  # 6 decimal places


def round_ratio(num: Column, den: Column, scale: int = 6) -> Column:
    """Half-up ``round(num/den, scale)`` for non-negative integer
    columns, computed exactly (see module docstring). Returns double;
    nulls propagate. Domain: 2·num·10^scale + den < 2^53."""
    s = 10 ** scale
    a = num.cast("bigint") * (2 * s) + den.cast("bigint")
    b = den.cast("bigint") * 2
    q = (a - F.pmod(a, b)) / b  # exact: integer-valued double < 2^53
    return q / F.lit(float(s))


def round_ratio_sql(num: str, den: str, scale: int = 6) -> str:
    """The DuckDB mirror of :func:`round_ratio` — integer floor division
    (``//``) keeps every step exact; operand SQL strings are substituted
    verbatim, so parenthesize compound expressions at the call site."""
    s = 10 ** scale
    return (
        f"(((2 * {s} * CAST(({num}) AS BIGINT) + CAST(({den}) AS BIGINT)) "
        f"// (2 * CAST(({den}) AS BIGINT))) / {float(s)})"
    )


def round6_ratio(num: Column, den: Column) -> Column:
    """``round(num/den, 6)`` — see :func:`round_ratio`."""
    return round_ratio(num, den, 6)


def round6_ratio_sql(num: str, den: str) -> str:
    return round_ratio_sql(num, den, 6)


def fixed_units(value: Column, scale: int) -> Column:
    """Exact integer units of a double that is (within accumulated float
    error ≪ half a unit) a multiple of 10^-scale — e.g. cents for a
    2-decimal money column, rev-units (scale 4) for a product of two
    2-decimal columns, micro-units (scale 6) for an already-6-dp-rounded
    score. ``floor(v·10^s + 0.5)`` is engine-deterministic because the
    fractional part sits near 0, never near the 0/1 boundary.

    Summing THESE (bigint, associative, exact) instead of the raw
    doubles is what makes multi-row aggregates cross-engine- and
    partitioning-deterministic: float sums are order-dependent, so two
    engines land ulps apart and a downstream round() can split on a
    boundary value (e.g. a revenue group sum that is exactly x.xx50).
    """
    return F.floor(value * F.lit(float(10 ** scale)) + F.lit(0.5))


def fixed_units_sql(value: str, scale: int) -> str:
    return f"CAST(floor(({value}) * {float(10 ** scale)} + 0.5) AS BIGINT)"


def rescale_units(units: Column, from_scale: int, to_scale: int) -> Column:
    """Half-up round of an exact integer units count (10^-from_scale
    units, e.g. a revenue sum in 1e-4 units) DOWN to to_scale decimals,
    as a double. Dividing down instead of multiplying up keeps every
    intermediate below 2^53 even for large money sums where
    :func:`round_ratio`'s 2·num·10^s would overflow double-exactness."""
    f = 10 ** (from_scale - to_scale)
    a = units.cast("bigint") + (f // 2)
    q = (a - F.pmod(a, F.lit(f))) / F.lit(f)  # exact floor((u + f/2)/f)
    return q / F.lit(float(10 ** to_scale))


def rescale_units_sql(units: str, from_scale: int, to_scale: int) -> str:
    f = 10 ** (from_scale - to_scale)
    return (
        f"(((CAST(({units}) AS BIGINT) + {f // 2}) // {f}) "
        f"/ {float(10 ** to_scale)})"
    )
