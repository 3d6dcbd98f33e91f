"""Aggregation operators (SURVEY §2.4)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def label_statistics(df: DataFrame, label_col: str = "label") -> DataFrame:
    """Distinct label values with count and relative frequency —
    the reference's ``statistics`` (tile.py:191-212,
    ``numpy.unique(return_counts=True)`` then ``cnts/sum``).

    Hash aggregate first (map-side partial combine), then a window over
    the tiny aggregated result (one row per distinct label) for
    pct-of-total — the window never sees the fact table.
    """
    counts = df.groupBy(label_col).agg(F.count(F.lit(1)).alias("cnt"))
    total = Window.partitionBy()
    return counts.withColumn(
        "pct", F.col("cnt") / F.sum("cnt").over(total))
