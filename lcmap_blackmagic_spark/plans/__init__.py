from .training import training_data
from .prediction import prediction_inputs, prediction_pipeline
from .tile import tile_pipeline
from .segment import segment_pipeline, pixel_timeseries, detect

__all__ = ["training_data", "prediction_inputs", "prediction_pipeline",
           "tile_pipeline", "segment_pipeline", "pixel_timeseries",
           "detect"]
