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
