from .train import train_model, evaluate
from .predict import predict_probabilities

__all__ = ["train_model", "evaluate", "predict_probabilities"]
