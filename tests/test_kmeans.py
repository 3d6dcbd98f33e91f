"""Full k-means fit: convergence, blob recovery, and the
determinism engineering (identical centroids across reruns AND
across repartitionings — the integer-sum M-step property)."""

import numpy as np
import pytest

from lcmap_blackmagic_spark.ml.kmeans import kmeans_fit


@pytest.fixture(scope="module")
def blobs(spark):
    rng = np.random.RandomState(42)
    centers = np.array([[0.0] * 8, [10.0] * 8, [-10.0, 10.0] * 4])
    rows = []
    vid = 0
    for ci, c in enumerate(centers):
        for _ in range(60):
            v = c + rng.normal(0, 0.5, 8)
            rows.append((vid, [float(x) for x in v], ci))
            vid += 1
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, truth int")


def test_converges_and_recovers_blobs(blobs):
    fit = kmeans_fit(blobs, k=3, max_iters=15)
    assert fit["iters"] < 15            # converged, not exhausted
    assert fit["inertia"] is not None and fit["inertia"] > 0
    # every recovered cluster is PURE w.r.t. the generating blob
    got = (fit["assign"].join(
        blobs.selectExpr("vec_id as id", "truth"), "id")
        .groupBy("cid", "truth").count().collect())
    per_cid = {}
    for r in got:
        per_cid.setdefault(r["cid"], []).append(r["count"])
    assert len(per_cid) == 3
    assert all(len(v) == 1 and v[0] == 60 for v in per_cid.values())


def test_rejects_k_above_distinct_ids(blobs):
    with pytest.raises(ValueError, match="distinct ids"):
        kmeans_fit(blobs.limit(3), k=8)


def test_deterministic_across_runs_and_partitionings(blobs):
    a = kmeans_fit(blobs, k=3, max_iters=15)
    b = kmeans_fit(blobs.repartition(13), k=3, max_iters=15)
    assert a["centroids"] == b["centroids"]   # bit-identical floats
    assert a["iters"] == b["iters"]
    ra = sorted(tuple(r) for r in a["assign"].collect())
    rb = sorted(tuple(r) for r in b["assign"].collect())
    assert ra == rb


def test_rejects_coordinates_outside_exact_envelope(spark):
    """Coordinates past the int64-exact quantization envelope
    (|x| ≳ 1.45e3 at the 2^20 grid) must raise loudly instead of
    letting the E-step's long×long square wrap into silently wrong
    assignments."""
    bad = spark.createDataFrame(
        [(i, [2000.0, -2000.0]) for i in range(6)],
        "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="envelope"):
        kmeans_fit(bad, k=2)
