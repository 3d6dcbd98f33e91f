"""Sketch aggregates: no cross-engine oracle exists (sketch internals
differ), so the contract is a tolerance bound against the exact
answer computed on the same data."""

import os

from pyspark.sql import functions as F

from lcmap_blackmagic_spark.registry import QUERIES


def test_approx_sketches_within_tolerance(spark, sf_dir):
    approx = {r["l_returnflag"]: r for r in
              QUERIES["approx_sketches"]["fn"](spark, sf_dir).collect()}
    l = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    exact = {r["l_returnflag"]: r for r in
             (l.groupBy("l_returnflag")
              .agg(F.countDistinct("l_orderkey").alias("orders"),
                   F.expr("percentile(l_extendedprice, 0.5)")
                   .alias("median"))).collect()}
    assert approx.keys() == exact.keys()
    for k in exact:
        a, e = approx[k], exact[k]
        assert abs(a["approx_orders"] - e["orders"]) <= 0.05 * e["orders"]
        assert abs(a["approx_median"] - e["median"]) <= 0.02 * e["median"]


def test_approx_sketches_deterministic(spark, sf_dir):
    """Same input → same sketch result (needed for the driver's
    rows-only stability check)."""
    fn = QUERIES["approx_sketches"]["fn"]
    a = [tuple(r) for r in fn(spark, sf_dir).collect()]
    b = [tuple(r) for r in fn(spark, sf_dir).collect()]
    assert a == b


def test_kmv_estimates_within_tolerance(spark, sf_dir):
    """The oracle-checkable KMV/hash-sample sketches must also be
    ACCURATE: distinct estimate within the KMV standard-error bound,
    sampled median within a few percent of the exact median."""
    kmv = {r["l_returnflag"]: r for r in
           QUERIES["kmv_sketch"]["fn"](spark, sf_dir).collect()}
    l = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    exact = {r["l_returnflag"]: r for r in
             (l.groupBy("l_returnflag")
              .agg(F.countDistinct("l_orderkey").alias("orders"),
                   F.expr("percentile(l_extendedprice, 0.5)")
                   .alias("median"))).collect()}
    assert kmv.keys() == exact.keys()
    for k in exact:
        a, e = kmv[k], exact[k]
        # KMV rse ~ 1/sqrt(K-2) ≈ 6.3% at K=256; allow 4x
        assert abs(a["kmv_distinct"] - e["orders"]) <= 0.25 * e["orders"]
        assert abs(a["sampled_median"] - e["median"]) <= 0.10 * e["median"]
