"""Join operators (SURVEY §2.3).

J1 ``combine`` is the reference's only relational join
(segaux.py:113-126): an inner hash join of segments (probe) against the
per-pixel aux dimension (build side, a dict keyed (cx,cy,px,py)).
The dict build means *last write wins* on duplicate aux keys — we
reproduce that with an explicit keyed dedup before the join.

Scale notes: aux is ≤10k rows per chip and bounded per tile, so it is
always broadcast — no shuffle of the (much larger) segments side. At
100 TB the segments fact table stays partitioned by (cx, cy) on disk;
the join never repartitions it.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

CHIP_KEYS = ("cx", "cy", "px", "py")


def last_wins(df: DataFrame, keys: Sequence[str],
              order_col: str | None = None) -> DataFrame:
    """One row per key. With ``order_col``, the row with the greatest
    order value survives — the dict-insertion last-wins semantics of the
    reference's aux build side (segaux.py:89-102). Without it, an
    arbitrary row survives (dropDuplicates), matching the reference when
    the source has no duplicates."""
    if order_col is None:
        return df.dropDuplicates(list(keys))
    w = Window.partitionBy(*keys).orderBy(F.col(order_col).desc())
    return (df.withColumn("__rn", F.row_number().over(w))
              .filter(F.col("__rn") == 1).drop("__rn"))


def salted_join(big: DataFrame, small: DataFrame,
                keys: Sequence[str], how: str = "inner",
                n_salts: int = 16, seed: int = 42) -> DataFrame:
    """Skew-mitigating equi-join for when one join key is hot enough
    that AQE's skew splitting isn't available (e.g. inside a streaming
    foreachBatch, or a hot key above the split threshold).

    The big side gets a uniform random salt in [0, n_salts); the small
    side is replicated n_salts times; the join key becomes
    (keys..., salt), spreading the hot key over n_salts reducers. The
    result set is identical to the unsalted join for any salt
    assignment — correctness does not depend on the RNG.
    """
    if how not in ("inner", "left", "left_outer", "leftouter",
                   "left_semi", "leftsemi", "left_anti", "leftanti"):
        # right/full would emit one row per replica for unmatched
        # small-side rows — semantics diverge, so refuse.
        raise ValueError(f"salted_join preserves only the big side: {how}")
    salted_big = big.withColumn(
        "__salt", (F.rand(seed) * n_salts).cast("int"))
    salted_small = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
    out = salted_big.join(salted_small, on=[*keys, "__salt"], how=how)
    return out.drop("__salt")


def combine(segments: DataFrame, aux: DataFrame,
            keys: Sequence[str] = CHIP_KEYS,
            dedupe_aux: bool = True,
            aux_order_col: str | None = None) -> DataFrame:
    """segments ⋈ aux inner join on (cx, cy, px, py) with the aux side
    broadcast (segaux.py:113-126; unit-tested in the reference at
    test/test_C_segaux.py:93-114)."""
    if dedupe_aux:
        aux = last_wins(aux, keys, aux_order_col)
    return segments.join(F.broadcast(aux), on=list(keys), how="inner")
