"""The /prediction feature plan (blackmagic/blueprints/prediction.py:129-146)
as one declarative DataFrame query.

Reference shape: segments(read) → aux(read) → combine → prediction_dates
(annual-date row explode, the reference's only row-multiplying operator)
→ average_reflectance → prediction_format. The classifier boundary
(broadcast booster + batch predict) lives in ``ml.predict``; this module
is the pure-relational part, oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.dates import prediction_dates_array
from ..functions.features import average_reflectance, standard_format_array
from ..operators.joins import combine
from ..operators.unions import is_default
from ..schemas import DEFAULT_DAY


def explode_prediction_dates(df: DataFrame, month: int, day: int) -> DataFrame:
    """Per-segment annual date explode (segaux.py:149-163, F4): default
    segments yield exactly one row with the sentinel date; real segments
    yield one row per in-interval annual date (F2)."""
    dates = F.when(
        is_default(), F.array(F.to_date(F.lit(DEFAULT_DAY)))
    ).otherwise(prediction_dates_array("sday", "eday", month, day))
    return df.withColumn("date", F.explode(dates))


def prediction_inputs(segments: DataFrame, aux: DataFrame,
                      month: int, day: int) -> DataFrame:
    """Keys + dates + 68-slot independent feature vector per
    (segment × annual date) — prediction_format (segaux.py:289-298).

    Default segments keep their rows (empty-coef features) and are
    routed around the classifier downstream via group_data (U3).
    """
    joined = combine(segments, aux)
    exploded = explode_prediction_dates(joined, month, day)
    with_ar = average_reflectance(exploded)
    return with_ar.select(
        "cx", "cy", "px", "py", "sday", "eday",
        F.date_format("date", "yyyy-MM-dd").alias("pday"),
        F.slice(standard_format_array(include_label=False), 1, 68)
         .alias("independent"),
    )


def prediction_pipeline(segments: DataFrame, aux: DataFrame,
                        model_bytes: bytes, month: int, day: int) -> DataFrame:
    """End-to-end /prediction (prediction.py:331-345): features →
    defaults/data split (U3) → broadcast batch inference (UD3) →
    defaults rejoin with prob=[] (U2). Output matches the
    PREDICTIONS schema."""
    from ..ml.predict import predict_probabilities
    from ..operators.unions import default_predictions, group_data

    inputs = prediction_inputs(segments, aux, month, day)
    defaults, data = group_data(inputs)
    predicted = (predict_probabilities(data, model_bytes, "independent")
                 .drop("independent"))
    return default_predictions(defaults.drop("independent"), predicted)
