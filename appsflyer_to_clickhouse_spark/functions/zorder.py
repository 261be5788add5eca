"""Z-order (Morton) keys for multi-dimensional clustering.

A table sorted by ONE column zone-map-prunes on that column only
(tests/test_scale_techniques.py:test_sorted_layout_prunes_row_groups);
sorting by the bit-interleaved key of TWO columns gives every row
group a bounded rectangle in (x, y) space, so range predicates on
EITHER dimension prune from footer stats — the layout decision behind
Delta/Iceberg OPTIMIZE ZORDER, here as plain deterministic integer
arithmetic (identical in Spark and DuckDB, so z-keys are
oracle-checkable cross-engine).

Both helpers expect inputs already normalized to ``bits``-bit
non-negative ints; normalization is a monotone width scale
(x * 2^bits) intdiv (max + 1) — never a modulo, which would destroy
the locality the layout exists to create.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def zorder_interleave(x: Column, y: Column, bits: int = 8) -> Column:
    """Bit-interleaved Morton key: x's bit i lands at position 2i, y's
    at 2i+1. A ~4*bits-term integer expression — one codegen'd Project,
    map-only. Inputs are widened to bigint first: shiftleft preserves
    the input type, so with 32-bit int inputs and bits >= 16 the top
    y-bit would land on the int sign bit — negative z-keys that sort
    FIRST (destroying locality) and disagree with the DuckDB twin's
    64-bit arithmetic."""
    x = x.cast("bigint")
    y = y.cast("bigint")
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i))
        terms.append(
            F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    z = terms[0]
    for t in terms[1:]:
        z = z + t
    return z


def zorder_sql(x: str, y: str, bits: int = 8) -> str:
    """DuckDB twin of ``zorder_interleave`` over SQL fragments ``x``,
    ``y`` (exact integer arithmetic — term order is irrelevant)."""
    terms = [f"((({x} >> {i}) & 1) << {2 * i})" for i in range(bits)] + [
        f"((({y} >> {i}) & 1) << {2 * i + 1})" for i in range(bits)
    ]
    return "(" + " + ".join(terms) + ")"
