"""Predicate operators (SURVEY §2.2).

Both are plain Catalyst filters — expressed pre-join so pushdown
reaches the parquet scan (PushedFilters), which the reference did by
hand-ordering stages (tile.py:97-102).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def segments_filter(segments: DataFrame, date: str,
                    sday: str = "sday", eday: str = "eday") -> DataFrame:
    """Keep segments whose closed interval [sday, eday] contains
    ``date`` — the interval-containment predicate of
    blackmagic/blueprints/tile.py:77-85."""
    d = F.to_date(F.lit(date))
    return segments.filter((d >= F.to_date(sday)) & (d <= F.to_date(eday)))


def aux_filter(aux: DataFrame, label_col: str = "nlcdtrn") -> DataFrame:
    """Keep aux pixels with a non-zero training label
    (blackmagic/segaux.py:105-110)."""
    return aux.filter(F.col(label_col) != 0)
