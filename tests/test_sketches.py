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


def test_k_smallest_matches_naive_window(spark):
    """Property: the bucket-pyramid exact top-k
    (operators/sketches.k_smallest) returns row-for-row the same
    (group, h, rank) set as the naive
    ``row_number() OVER (PARTITION BY group ORDER BY h)`` it
    replaces — across random hash layouts, groups with fewer than k
    values, k larger than any group, and hashes straddling bucket
    boundaries."""
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from lcmap_blackmagic_spark.operators.sketches import (KMV_BUCKET,
                                                           k_smallest)

    for seed in range(8):
        rng = random.Random(seed)
        rows = set()
        for g in range(rng.randint(1, 4)):
            n = rng.randint(0, 60)
            for _ in range(n):
                if rng.random() < 0.3:
                    # cluster near bucket boundaries — the cutoff
                    # bucket logic's edge
                    b = rng.randint(0, 3) * KMV_BUCKET
                    h = b + rng.randint(-2, 2)
                else:
                    h = rng.randint(0, 2 ** 48 - 1)
                rows.add((f"g{g}", max(0, h)))
        if not rows:
            continue
        df = spark.createDataFrame(sorted(rows), "s string, h long")
        k = rng.choice([1, 3, 16, 100])
        got = sorted(tuple(r) for r in
                     k_smallest(df, ["s"], "h", k)
                     .select("s", "h", "rn").collect())
        w = Window.partitionBy("s").orderBy("h")
        want = sorted(tuple(r) for r in
                      df.withColumn("rn", F.row_number().over(w))
                      .filter(F.col("rn") <= k)
                      .select("s", "h", "rn").collect())
        assert got == want, f"seed {seed}, k={k}"
