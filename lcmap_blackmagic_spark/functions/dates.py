"""Date helpers — proleptic-Gregorian ordinals and annual date series.

The reference moves between Python ``date.toordinal()`` ints and ISO
strings constantly (segment.py:68-70, segaux.py:189-209). Spark's
DateType is proleptic Gregorian, so the ordinal is a plain datediff
from 0001-01-01 (ordinal 1). All JVM-side — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_EPOCH = "0001-01-01"  # ordinal 1


def ordinal_from_date(col: Column | str) -> Column:
    """ISO date (string or date) → proleptic ordinal int.

    Parity: ``datetime.date.toordinal`` used at segaux.py:194.
    """
    return F.datediff(F.to_date(col), F.to_date(F.lit(_EPOCH))) + F.lit(1)


def date_from_ordinal(col: Column | str) -> Column:
    """Proleptic ordinal int → DateType.

    Parity: ``datetime.date.fromordinal`` at segment.py:68-70.
    """
    c = col if isinstance(col, Column) else F.col(col)
    return F.date_add(F.to_date(F.lit(_EPOCH)), (c - F.lit(1)).cast("int"))


def prediction_dates_array(sday: Column | str, eday: Column | str,
                           month: int, day: int) -> Column:
    """Annual prediction dates within ``[sday, eday]`` as array<date>.

    For each year y in [year(sday), year(eday)], emit date(y, month, day)
    if it falls inside the closed interval. Parity:
    ``prediction_date_fn`` (segaux.py:129-139; golden tests
    test_C_segaux.py:117-209 — including the boundary case where the
    month/day lands outside a partial first/last year).
    """
    s = F.to_date(sday) if isinstance(sday, str) else F.to_date(sday)
    e = F.to_date(eday) if isinstance(eday, str) else F.to_date(eday)
    years = F.sequence(F.year(s), F.year(e))
    candidates = F.transform(
        years, lambda y: F.make_date(y, F.lit(month), F.lit(day)))
    return F.filter(candidates, lambda d: (d >= s) & (d <= e))
