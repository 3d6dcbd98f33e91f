from .training import training_data
from .prediction import prediction_inputs

__all__ = ["training_data", "prediction_inputs"]
