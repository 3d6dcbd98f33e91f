"""Model-bytes decoding must be loud (UD2/UD3 hardening): corrupt or
mis-tagged model payloads raise instead of silently falling back, the
driver-side matrix collect fails fast past its byte budget, and the
XGBoost branch runs for real wherever the dep is importable."""

import pickle

import numpy as np
import pytest

from lcmap_blackmagic_spark.ml.predict import (_load, _predict_matrix,
                                               predict_probabilities)
from lcmap_blackmagic_spark.ml.train import (HAVE_XGBOOST, _collect_matrix,
                                             train_model)
from lcmap_blackmagic_spark.schemas import NUM_CLASSES


def test_load_roundtrips_centroid_model():
    m = pickle.dumps({"kind": "centroid",
                      "centroids": np.zeros((NUM_CLASSES, 4)),
                      "seen": np.ones(NUM_CLASSES, dtype=bool)})
    model = _load(m)
    assert model["kind"] == "centroid"


def test_load_rejects_mistagged_pickle():
    with pytest.raises(ValueError, match="not a known model kind"):
        _load(pickle.dumps({"weights": [1, 2, 3]}))
    with pytest.raises(ValueError, match="not a known model kind"):
        _load(pickle.dumps([1, 2, 3]))


@pytest.mark.skipif(HAVE_XGBOOST, reason="xgboost present: raw bytes "
                    "are decoded by the booster path instead")
def test_load_rejects_non_pickle_without_xgboost():
    with pytest.raises(RuntimeError, match="requires xgboost"):
        _load(b"\x00\x01garbage-not-a-model")


def _label_features_df(spark, n=40, width=6):
    rows = [(i % 3, [float(i % 3)] * width) for i in range(n)]
    return spark.createDataFrame(rows, "label int, features array<float>")


def test_collect_matrix_byte_budget(spark):
    df = _label_features_df(spark)
    X, y = _collect_matrix(df)  # default budget: fine
    assert X.shape == (40, 6)
    with pytest.raises(RuntimeError, match="driver-side budget"):
        _collect_matrix(df, max_bytes=100)


@pytest.mark.skipif(not HAVE_XGBOOST, reason="xgboost not importable "
                    "in this environment (reference pins it; branch "
                    "is exercised wherever the dep exists)")
def test_xgboost_branch_end_to_end(spark):
    df = _label_features_df(spark, n=120)
    model_bytes = train_model(df)
    assert model_bytes[:1] != b"\x80"  # raw booster, not a pickle
    booster = _load(model_bytes)
    probs = _predict_matrix(booster, np.zeros((5, 6), dtype=np.float32))
    assert probs.shape == (5, NUM_CLASSES)
    out = predict_probabilities(
        df.withColumnRenamed("features", "independent"), model_bytes)
    row = out.first()
    assert len(row["prob"]) == NUM_CLASSES
