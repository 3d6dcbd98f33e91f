"""Mergeable distributed sketches.

``hll_distinct`` is a deterministic HyperLogLog (Flajolet et al. 2007)
built from integer-only expressions so the estimate is bit-identical
across engines (the repo-wide determinism rule: no transcendentals in
checked outputs — see registry.py module docstring):

- hash: the first 48 bits of md5 (identical hex in Spark and DuckDB),
- register index (``hll_reg`` — named to never collide with caller
  group columns): the top ``p`` bits; rank: leading zeros of the low
  ``48 - p`` bits + 1, computed as ``(48 - p) + 1 - length(bin(w))``
  (binary-string length == MSB position — pure integer/string ops),
- the harmonic denominator ``sum(2^-M_j)`` is kept EXACT by scaling:
  ``sum(shiftleft(1, 48 - M_j))`` is an integer (absent registers
  contribute ``2^48`` each), so the only float op is one final
  multiply-free division by the precomputed ``alpha * m^2 * 2^48``
  literal — deterministic in IEEE-754.

Scale shape: two shuffles, both map-side combined — (group, register)
max-aggregation collapses to at most ``m`` rows per group per
partition before the exchange, then a constant ``m``-row reduction per
group. This is the 100 TB substitute for exact ``COUNT(DISTINCT)``
(one wide shuffle of every distinct key): state is O(m) per group and
the registers merge associatively (MAX), which is also why the same
sketch works under Structured Streaming update mode.

The small-range (linear-counting) correction uses ``ln`` and is
deliberately NOT applied to the checked output; the raw estimator plus
``zero_buckets`` is returned so a caller (or the tolerance tests in
tests/test_ext4.py) can apply it. Reference parity: the reference has
no sketches — this is part of the north-star analytics surface
(SURVEY.md §2.9).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

H48 = 2 ** 48  # 12 hex digits of md5 as an integer


def hll_alpha_numerator(p: int) -> float:
    """``alpha_m * m^2 * 2^48`` as one Python-float literal — both the
    Spark plan and the generated oracle SQL embed this exact value, so
    the single division below is the only float op on either side."""
    m = 1 << p
    alpha = 0.7213 / (1 + 1.079 / m)  # valid for m >= 128
    return alpha * m * m * float(H48)


def hll_registers(df: DataFrame, group_cols: Sequence[str], key_col: str,
                  p: int = 8) -> DataFrame:
    """The mergeable half of the sketch: per (group, register index)
    MAX rank. Registers from different partitions, micro-batches, or
    days merge by the same groupBy-MAX — persist these (tiny: ≤ 2^p
    rows per group) and re-merge at read; see
    streaming/jobs.persisted_distinct_rollup."""
    if not 7 <= p <= 14:
        raise ValueError(f"p={p} outside the supported 7..14 range")
    rest = 48 - p
    gcols = list(group_cols)
    h = F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 12),
               16, 10).cast("bigint")
    w = h % F.lit(1 << rest)
    return (df.select(*gcols,
                      F.shiftright(h, rest).alias("hll_reg"),
                      F.when(w == 0, F.lit(rest + 1))
                       .otherwise(F.lit(rest + 1) - F.length(F.bin(w)))
                       .alias("rho"))
            .groupBy(*gcols, "hll_reg")
            .agg(F.max("rho").alias("mreg")))


def hll_estimate(regs: DataFrame, group_cols: Sequence[str],
                 p: int = 8) -> DataFrame:
    """Finalize (group, hll_reg, mreg) registers into the estimate.
    Registers may contain duplicate (group, hll_reg) rows (e.g.
    partials from several micro-batches) — they re-merge here."""
    m = 1 << p
    gcols = list(group_cols)
    merged = (regs.groupBy(*gcols, "hll_reg")
              .agg(F.max("mreg").alias("mreg")))
    # scaled harmonic sum: integers only until the final division
    agg = (merged.groupBy(*gcols)
           .agg(F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 48 - mreg)"))
                .alias("s"),
                F.count(F.lit(1)).alias("nb")))
    denom = (F.col("s")
             + (F.lit(m) - F.col("nb")) * F.lit(H48)).cast("double")
    return agg.select(
        *gcols,
        (F.lit(hll_alpha_numerator(p)) / denom).alias("hll_distinct"),
        (F.lit(m) - F.col("nb")).cast("bigint").alias("zero_buckets"))


def hll_distinct(df: DataFrame, group_cols: Sequence[str], key_col: str,
                 p: int = 8) -> DataFrame:
    """Per-group HyperLogLog distinct-count estimate of ``key_col``.

    Output: group cols + ``hll_distinct`` (double, raw estimator) +
    ``zero_buckets`` (bigint — nonzero means the small-range regime
    where a caller should apply linear counting).
    """
    return hll_estimate(hll_registers(df, group_cols, key_col, p),
                        group_cols, p)
