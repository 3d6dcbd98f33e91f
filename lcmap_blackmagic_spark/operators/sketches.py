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


def histogram_quantiles(df: DataFrame, group_cols: Sequence[str],
                        value_col: str, quantiles: Sequence[float],
                        n_bins: int = 64,
                        lo: float = 0.0, hi: float = 2 ** 20,
                        scale: int = 100) -> DataFrame:
    """Mergeable fixed-bin quantile sketch: values integer-scale
    (``scale``, e.g. 100 for money) and bucket into ``n_bins``
    equal-width bins over [lo, hi); a quantile walks the cumulative
    bin counts and LINEARLY interpolates inside the holding bin —
    integer arithmetic until the one interpolation division, so the
    estimate is bit-identical across engines (GK/t-digest trade this
    determinism for adaptive accuracy; the fixed grid is the
    oracle-checkable twin with the same O(bins) mergeable state).

    Error bound: within one bin width ((hi-lo)/n_bins) of the exact
    ceil(q·n)-th ORDER STATISTIC (the interpolating percentile() can
    legitimately fall between distant values in sparse groups) — pick
    the grid from the column's domain. Out-of-range values clamp to
    the edge bins.

    Scale shape: ONE map-side-combined shuffle to (group, bin) —
    ≤ n_bins rows per group per partition survive to the exchange;
    the finalize is a window cumsum over ≤ n_bins rows per group plus
    one tiny aggregate per quantile (all codegen — no interpreted
    HOFs). Bin counts merge by SUM, so the sketch streams and
    re-merges exactly like the HLL registers above.

    Output: group cols + ``n`` + one ``q_<pct>`` (double) column per
    quantile.
    """
    from pyspark.sql import Window
    gcols = list(group_cols)
    span = int((hi - lo) * scale)
    width = span // n_bins
    if width <= 0:
        raise ValueError(
            f"bin width is zero: span {span} scaled units over "
            f"{n_bins} bins — raise `scale` or widen [lo, hi)")
    lo_s = int(lo * scale)
    v = (F.col(value_col).cast("decimal(18,2)") * scale).cast("bigint")
    b = F.least(F.lit(n_bins - 1),
                F.greatest(F.lit(0),
                           F.expr(f"(v_scaled - {lo_s}) div {width}")))
    bins = (df.select(*gcols, v.alias("v_scaled"))
            .select(*gcols, b.alias("bin"))
            .groupBy(*gcols, "bin")
            .agg(F.count(F.lit(1)).alias("c")))
    w_cum = (Window.partitionBy(*gcols).orderBy("bin")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    w_all = Window.partitionBy(*gcols)
    cum = (bins.withColumn("cum", F.sum("c").over(w_cum))
           .withColumn("n", F.sum("c").over(w_all)))
    out = cum.select(*gcols, "n").distinct()
    for q in quantiles:
        pct = int(q * 100)
        rank = F.ceil(F.col("n") * F.lit(q)).cast("bigint")
        hit = (cum.filter((F.col("cum") >= rank)
                          & (F.col("cum") - F.col("c") < rank))
               .select(*gcols,
                       ((F.lit(lo_s) + F.col("bin") * width
                         + F.lit(width) * (rank - F.col("cum")
                                           + F.col("c")) / F.col("c"))
                        .cast("double") / scale).alias("est"))
               .select(*gcols, F.round("est", 6).alias(f"q_{pct}")))
        out = out.join(hit, gcols)
    return out
