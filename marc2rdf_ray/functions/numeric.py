"""Numeric kernels shared by operators and the query contract.

SQL ``ROUND()`` (DuckDB, ANSI) rounds ties HALF AWAY FROM ZERO
(112.5 -> 113, -2.5 -> -3), while ``pyarrow.compute.round``'s default mode
is half-to-even (112.5 -> 112).  Every operator that quantizes a float
column for comparison against a SQL oracle (money to cents, quantities to
integers) must use the SQL mode or the advertised bit-for-bit match breaks
on any value whose scaled form is an exact .5 (e.g. 1.125 * 100).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def sql_round_i64(col, factor: float | None = None):
    """``ROUND(col * factor)`` with SQL tie semantics, cast to int64.

    ``factor=100.0`` is the money-to-integer-cents quantization used across
    the engine; ``factor=None`` rounds the column as-is.
    """
    if factor is not None:
        col = pc.multiply(col, factor)
    return pc.cast(
        pc.round(col, round_mode="half_towards_infinity"), pa.int64()
    )
