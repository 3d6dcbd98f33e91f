from .filters import segments_filter, aux_filter
from .joins import combine, last_wins
from .stats import label_statistics
from .sampling import stratified_sample, randomize, train_test_split
from .unions import group_data, default_predictions

__all__ = [
    "segments_filter", "aux_filter", "combine", "last_wins",
    "label_statistics", "stratified_sample", "randomize",
    "train_test_split", "group_data", "default_predictions",
]
