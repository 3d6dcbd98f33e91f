"""UD2 — the training boundary (blackmagic/blueprints/tile.py:287-331).

The reference collects the (stratified-sampled, already bounded ≤
target_samples) matrix and runs one XGBoost fit on the driver — that
stays the design here: sampling/stats/shuffles are distributed, the
fit itself is a driver-local step on the bounded sample.

XGBoost (pinned in the reference at setup.py:34) is not available in
this environment, so the trainer is pluggable: with xgboost importable
it uses the reference's exact params (multi:softprob, num_class 9,
hist, depth 8, 500 rounds, early-stop 10 — blackmagic/__init__.py:13-26);
otherwise a deterministic nearest-centroid classifier with softmax
probabilities keeps every downstream contract testable (model bytes →
broadcast → batch predict → 9-prob vectors).
"""

from __future__ import annotations

import pickle

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schemas import NUM_CLASSES

# Reference parameters (blackmagic/__init__.py:13-26).
XGB_PARAMS = {
    "objective": "multi:softprob",
    "num_class": NUM_CLASSES,
    "max_depth": 8,
    "tree_method": "hist",
    "eval_metric": "mlogloss",
}
NUM_ROUND = 500
EARLY_STOPPING_ROUNDS = 10
TEST_SIZE = 0.2

try:
    import xgboost as xgb
    HAVE_XGBOOST = True
except ImportError:  # environment without the pinned dep
    xgb = None
    HAVE_XGBOOST = False


# Driver-side matrix budget: the reference's deliberate driver-local
# fit collects ≤ target_samples (2e7) × 69 float32 ≈ 5.5 GB; 8 GiB
# bounds that with headroom. Beyond it, the fit no longer belongs on
# the driver — use a distributed trainer (xgboost.spark) or lower the
# sampling budget.
MAX_COLLECT_BYTES = 8 << 30


def _collect_matrix(df: DataFrame,
                    max_bytes: int = MAX_COLLECT_BYTES
                    ) -> tuple[np.ndarray, np.ndarray]:
    """label+features DataFrame → (X float32, y int8). The sample is
    bounded by the stratified sampler before this point; a cheap
    count×width estimate fails fast if a caller bypasses the sampler
    and would otherwise OOM the driver."""
    n = df.count()
    if n:
        width = len(df.select("features").first()["features"])
        est = n * (width * 4 + 1)
        if est > max_bytes:
            raise RuntimeError(
                f"training matrix ≈{est >> 20} MiB ({n} rows × {width} "
                f"features) exceeds the driver-side budget "
                f"({max_bytes >> 20} MiB); shrink the sampling budget or "
                f"use a distributed trainer (e.g. xgboost.spark)")
    rows = df.select("label", "features").collect()
    y = np.array([r["label"] for r in rows], dtype=np.int8)
    X = np.array([r["features"] for r in rows], dtype=np.float32)
    return X, y


def _train_xgboost(train_df: DataFrame, test_df: DataFrame) -> bytes:
    Xtr, ytr = _collect_matrix(train_df)
    Xte, yte = _collect_matrix(test_df)
    dtrain = xgb.DMatrix(Xtr, label=ytr)
    dtest = xgb.DMatrix(Xte, label=yte)
    booster = xgb.train(XGB_PARAMS, dtrain, NUM_ROUND,
                        evals=[(dtrain, "train"), (dtest, "eval")],
                        early_stopping_rounds=EARLY_STOPPING_ROUNDS,
                        verbose_eval=False)
    return booster.save_raw()


def _train_centroid(train_df: DataFrame) -> bytes:
    """Distributed per-class centroids: posexplode the feature array,
    aggregate mean per (label, slot) — no driver-side matrix at all.
    The model is tiny (num_class × n_features)."""
    agg = (train_df
           .select("label", F.posexplode("features").alias("slot", "v"))
           .groupBy("label", "slot").agg(F.avg("v").alias("mu")))
    rows = agg.collect()
    n_slots = max(r["slot"] for r in rows) + 1
    centroids = np.zeros((NUM_CLASSES, n_slots), dtype=np.float64)
    seen = np.zeros(NUM_CLASSES, dtype=bool)
    for r in rows:
        centroids[r["label"], r["slot"]] = r["mu"]
        seen[r["label"]] = True
    return pickle.dumps({"kind": "centroid", "centroids": centroids,
                         "seen": seen})


def _train_spark_ml(train_df: DataFrame, max_iter: int = 50,
                    reg_param: float = 1e-3) -> bytes:
    """Fully distributed trainer: ``pyspark.ml`` multinomial logistic
    regression over the label+features DataFrame — the fit itself runs
    on the executors (L-BFGS over partition-aggregated gradients), so
    unlike the driver-local XGBoost path there is NO driver-side
    matrix and no sampling-budget ceiling. The fitted weights are
    exported to a plain numpy dict so the model-bytes contract (and
    the 9-prob ``mapInPandas`` inference path) is identical to the
    other trainers — executors never need pyspark.ml at predict time.

    Reference watchlist metric parity: blackmagic/blueprints/
    tile.py:303-310 logs mlogloss; ``evaluate`` computes the same
    metric over this model's softmax probabilities.
    """
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.functions import array_to_vector

    ml_df = train_df.select(
        F.col("label").cast("double").alias("label"),
        array_to_vector(F.col("features").cast("array<double>"))
        .alias("features"))
    lr = LogisticRegression(maxIter=max_iter, regParam=reg_param,
                            family="multinomial")
    model = lr.fit(ml_df)
    coef = model.coefficientMatrix.toArray()          # (k, n_features)
    intercept = model.interceptVector.toArray()       # (k,)
    k, n_feat = coef.shape
    # pad to the fixed NUM_CLASSES contract; classes never observed in
    # training get probability 0 at predict time via the seen mask
    W = np.zeros((NUM_CLASSES, n_feat), dtype=np.float64)
    b = np.zeros(NUM_CLASSES, dtype=np.float64)
    W[:k] = coef
    b[:k] = intercept
    seen = np.zeros(NUM_CLASSES, dtype=bool)
    try:
        # the fit already computed per-class counts; reading them off
        # the training summary avoids a second full evaluation of the
        # sampled/split input lineage just to learn ≤ 9 labels
        for lbl in model.summary.labels:
            seen[int(lbl)] = True
    except Exception:  # summary unavailable → one small distinct job
        for r in train_df.select("label").distinct().collect():
            seen[int(r["label"])] = True
    return pickle.dumps({"kind": "logreg", "coef": W, "intercept": b,
                         "seen": seen})


def train_model(train_df: DataFrame, test_df: DataFrame | None = None,
                trainer: str = "auto") -> bytes:
    """Fit on label+features rows; returns opaque model bytes
    (hex-encodable for byte-parity with tile.py:334-356).

    ``trainer``: 'auto' (xgboost if importable, else centroid — the
    reference's driver-local design), 'spark_ml' (distributed
    multinomial logistic regression, no driver matrix), 'xgboost',
    or 'centroid'."""
    if trainer == "spark_ml":
        return _train_spark_ml(train_df)
    if trainer == "xgboost" or (trainer == "auto" and HAVE_XGBOOST):
        if not HAVE_XGBOOST:
            raise RuntimeError("trainer='xgboost' but xgboost is not "
                               "importable in this environment")
        return _train_xgboost(train_df, test_df if test_df is not None
                              else train_df)
    if trainer not in ("auto", "centroid"):
        raise ValueError(f"unknown trainer {trainer!r}")
    return _train_centroid(train_df)


def evaluate(model_bytes: bytes, df: DataFrame) -> float:
    """Multiclass log-loss on a label+features DataFrame (the
    reference's watchlist metric, tile.py:303-310)."""
    from .predict import _load, _predict_matrix
    model = _load(model_bytes)
    X, y = _collect_matrix(df)
    probs = _predict_matrix(model, X)
    eps = 1e-15
    return float(-np.mean(np.log(np.clip(probs[np.arange(len(y)), y],
                                         eps, 1.0))))
