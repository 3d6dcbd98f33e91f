"""Z-order (Morton) clustering keys — multi-dimensional data layout.

At 100 TB, range-partitioning on ONE column prunes scans on that
column only; writing files clustered by the Z-order curve of two key
columns makes min/max file statistics selective on BOTH, so either
predicate prunes (the technique behind Delta/Iceberg ``ZORDER BY``).
This module computes the interleaved-bit key as pure JVM bitwise
arithmetic (whole-stage codegen, no UDF): the classic magic-mask
spread doubles each input's bit positions, then the two spreads OR
together with a 1-bit offset.

Inputs must fit in 31 bits (IDs and epoch-days do); the result is a
non-negative BIGINT usable directly in ``repartitionByRange`` /
``sortWithinPartitions`` write layouts.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (shift, mask) ladder spreading a 32-bit int's bits to even positions
SPREAD_MASKS = [
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
]


def spread_bits(c: Column) -> Column:
    """Bit i of c → bit 2i of the result (c < 2^32)."""
    c = c.cast("bigint")
    for sh, m in SPREAD_MASKS:
        c = c.bitwiseOR(F.shiftleft(c, sh)).bitwiseAND(F.lit(m))
    return c


MAX_INPUT = (1 << 31) - 1


def _checked(c: Column, name: str) -> Column:
    """Out-of-range inputs fail LOUDLY: silently spreading bits ≥ 2^31
    would alias distinct keys onto one z-value and quietly break the
    file-stat bounds the layout exists for."""
    c = c.cast("bigint")
    return (F.when((c < 0) | (c > MAX_INPUT),
                   F.raise_error(F.concat(
                       F.lit(f"zvalue: {name} out of range [0, 2^31): "),
                       c.cast("string"))))
            .otherwise(c))


def zvalue(x: Column, y: Column) -> Column:
    """64-bit Morton key interleaving x (even bits) and y (odd bits).
    x, y must be non-negative and < 2^31 so the key stays positive;
    violations raise at execution time instead of aliasing keys."""
    return spread_bits(_checked(x, "x")).bitwiseOR(
        F.shiftleft(spread_bits(_checked(y, "y")), 1))


def compact_bits(c: Column) -> Column:
    """Inverse of ``spread_bits``: bit 2i → bit i (odd bits ignored).
    Runs the mask ladder in reverse; with ``shiftright`` this reads a
    z-key back into its column coordinates (for translating a z-range
    scan bound into per-column bounds)."""
    c = c.cast("bigint").bitwiseAND(F.lit(0x5555555555555555))
    for sh, m in reversed(SPREAD_MASKS):
        # un-double the positions: c holds the spread pattern of the
        # previous level; OR-shift-right then mask restores it
        c = c.bitwiseOR(F.shiftright(c, sh)).bitwiseAND(
            F.lit(_compact_mask(m, sh)))
    return c


def _compact_mask(spread_mask: int, shift: int) -> int:
    """Mask selecting the positions the reverse ladder lands bits on
    after undoing the ``shift`` level of the spread ladder."""
    # the spread ladder at level (shift, m) maps pattern p -> (p | p<<shift) & m;
    # the inverse level maps q -> (q | q>>shift) & p where p is the
    # PREVIOUS level's mask — reconstruct it by inverting the ladder
    masks = {16: 0xFFFFFFFF,                      # after undoing 16: 32 contiguous bits
             8: 0x0000FFFF0000FFFF,
             4: 0x00FF00FF00FF00FF,
             2: 0x0F0F0F0F0F0F0F0F,
             1: 0x3333333333333333}
    return masks[shift]


def unzvalue(z: Column) -> tuple[Column, Column]:
    """z-key → (x, y) column coordinates (exact inverse of
    ``zvalue`` for in-range inputs)."""
    return compact_bits(z), compact_bits(F.shiftright(z.cast("bigint"), 1))


def sql_spread_steps(src_cte: str, cols: tuple[str, ...],
                     keep: str) -> str:
    """DuckDB CTE chain applying the same spread ladder to ``cols``
    (chained steps, not nested expressions — a nested form duplicates
    the operand 2^5 times). ``keep`` lists passthrough columns."""
    steps = []
    prev = src_cte
    for i, (sh, m) in enumerate(SPREAD_MASKS):
        exprs = ", ".join(
            f"(({c} | ({c} << {sh})) & {m}) AS {c}" for c in cols)
        steps.append(f"zs{i} AS (SELECT {keep}, {exprs} FROM {prev})")
        prev = f"zs{i}"
    return ",\n".join(steps)
