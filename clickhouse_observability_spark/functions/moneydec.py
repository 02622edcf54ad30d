"""Boundary-proof money aggregation (r9 structural fix).

Cross-engine ``round(sum(double), 2)`` is a per-group coin flip
whenever a group sum lands exactly on the half-cent boundary: double
summation is order-dependent, the two engines (Spark, DuckDB) sum in
different orders, and the final ulp decides the rounded cent. r8's
``tpch_q9_product_profit`` hit this live — 2 of its 175 group sums sat
exactly on the boundary at sf0.01 (NATION_3/1997 = 1964425.435,
distance 0.0) and the driver hash flipped.

Structural fix (applies to BOTH engines, Spark here and the textual
oracle SQL at each registry site): cast money columns to
DECIMAL(18,4) BEFORE any multiply/sum. The testdata money columns
(l_extendedprice, l_discount, l_quantity, c_acctbal, events.value,
o_totalprice) are exact 2-decimal values, so the double->decimal cast
is exact and engine-identical (the true binary value is within ~1e-11
of the 2dp decimal — nowhere near the 5e-5 cast-rounding boundary);
decimal multiply and sum are exact and order-independent; ``round()``
on the exact decimal agrees bit-for-bit; and the final
``CAST(... AS DOUBLE)`` is the same correctly-rounded conversion on
both engines, so the driver's stringified hash matches regardless of
its float normalization.

Division stays OUTSIDE decimal: Spark and DuckDB round decimal
division results to different engine-chosen scales. For
ratio-of-sums / sum-over-constant outputs, convert the EXACT decimal
sums to double first (bit-identical on both engines), do the IEEE
division (bit-identical), then quantize with ``floor(x * 10^N)``
(bit-identical) rather than ``round`` (Spark rounds the shortest
decimal string HALF_UP; DuckDB rounds the binary value — they diverge
on the same double near boundaries).

ONLY safe for columns whose doubles carry <= 4 decimal digits.
Casting a full-precision double (log-probs, tf-idf weights) to
decimal rounds at the 5th decimal where the two engines' cast
algorithms can disagree — those aggregates keep plain ``round()``
with the residual (documented) boundary risk.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Canonical money-decimal type: 14 integer digits / 4 fractional.
#: Products of two DEC columns widen to at most decimal(38,8) on
#: Spark (18+19+1 precision) and decimal(37,8) on DuckDB (w1+w2) —
#: both inside the 38-digit cap, so no internal rounding ever occurs.
DEC = "decimal(18,4)"


def dec(col: str | Column) -> Column:
    """Exact-cast a 2dp money/quantity double column to DECIMAL(18,4).

    Oracle-SQL counterpart: ``CAST(col AS DECIMAL(18,4))``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(DEC)


def money_sum(expr: str | Column, ndigits: int = 2) -> Column:
    """Order-independent rounded sum of a decimal money expression.

    ``round(sum(dec_expr), n)`` over exact decimals is deterministic;
    the trailing double cast keeps the published schema (and the
    driver's float canonicalization) identical to the historical
    double output. Oracle-SQL counterpart::

        CAST(round(sum(<dec expr>), n) AS DOUBLE)
    """
    return F.round(F.sum(dec(expr) if isinstance(expr, str) else expr), ndigits).cast(
        "double"
    )


def floor_quantize(x: Column, ndigits: int = 2) -> Column:
    """Quantize a bit-identical double with floor(x*10^n)/10^n.

    For division outputs whose INPUT doubles are already bit-identical
    across engines (e.g. exact decimal sums cast to double, then
    divided): multiply+floor+divide are each single IEEE ops, so the
    result is bit-identical too — unlike round(), whose algorithm
    differs between Spark and DuckDB. Oracle-SQL counterpart::

        floor(x * 1e<n>) / 1e<n>
    """
    scale = float(10**ndigits)
    return F.floor(x * F.lit(scale)) / F.lit(scale)
