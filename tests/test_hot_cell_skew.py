"""Hot-cell guard for the celled joins (round 14, VERDICT item 5).

The SemDeDup / IVF / IVF-PQ scale arguments lean on "AQE splits hot
cells".  Measured on a deliberately skewed fixture (one cell holding
half the vectors), that claim is FALSE in the engine's actual join
shape — a cell equi-join followed by a same-key aggregation —
because OptimizeSkewedJoin declines any split that breaks the
downstream distribution requirement.  It becomes true with
``spark.sql.adaptive.forceOptimizeSkewedJoin`` (one extra shuffle of
the join output, the right trade when a cell is hot), which
ENGINE_CONF now sets.  Both behaviors are pinned here so a Spark
upgrade or conf drift cannot silently revert the guard; results are
asserted identical either way.
"""

from contextlib import contextmanager

from pyspark.sql import functions as F

# thresholds scaled down so a 40k-row fixture triggers the same
# detection a multi-GB hot cell triggers in production
_SKEW_CONF = {
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes":
        "65536",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "65536",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


@contextmanager
def _conf(spark, kv):
    old = {}
    for k, v in kv.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def _skewed_cells(spark, n=40000, cells=64):
    """Half the vectors in cell 0, the rest md5-spread — the
    one-hot-cell worst case for Σ n_c² celled-join work."""
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.when(F.col("id") % 2 == 0, F.lit(0)).otherwise(
            F.pmod(F.conv(F.substring(
                F.md5(F.col("id").cast("string")), 1, 12), 16, 10)
                .cast("long"), F.lit(cells))).alias("cell"),
        F.sha2(F.col("id").cast("string"), 256).alias("payload"))


def _celled_join(df):
    """The SemDeDup/IVF shape: within-cell pair join + same-cell
    aggregation (the downstream requirement that blocks the
    un-forced split)."""
    a, b = df.alias("a"), df.alias("b")
    return (a.join(b, "cell")
            .filter(F.col("a.vec_id") < F.col("b.vec_id"))
            .groupBy("cell").agg(F.count(F.lit(1)).alias("pairs")))


def _run(spark, force):
    with _conf(spark, {**_SKEW_CONF,
                       "spark.sql.adaptive.forceOptimizeSkewedJoin":
                           str(force).lower()}):
        j = _celled_join(_skewed_cells(spark))
        rows = {(r["cell"], r["pairs"]) for r in j.collect()}
        plan = j._jdf.queryExecution().executedPlan().toString()
    return rows, plan


def test_forced_skew_split_engages_and_preserves_results(spark):
    plain_rows, plain_plan = _run(spark, force=False)
    forced_rows, forced_plan = _run(spark, force=True)
    # the documented round-13 assumption, pinned as actually false:
    # without force, the hot cell sails through a skew-enabled AQE
    # join UNSPLIT in this shape
    assert "skew=true" not in plain_plan
    # with force (now in ENGINE_CONF) the hot cell is split
    assert "skew=true" in forced_plan
    assert "skewed" in forced_plan  # AQEShuffleRead ... skewed
    # splitting is a physical re-plan only — bit-identical output
    assert forced_rows == plain_rows
    # the hot cell really is hot: C(n0, 2) pairs for the >half of
    # the corpus assigned to cell 0 (the even ids plus the md5 spill)
    n0 = _skewed_cells(spark).filter("cell = 0").count()
    assert n0 >= 20000
    assert dict(plain_rows)[0] == n0 * (n0 - 1) // 2


def test_engine_conf_carries_the_force_flag(spark):
    from lcmap_blackmagic_spark import ENGINE_CONF
    assert ENGINE_CONF[
        "spark.sql.adaptive.forceOptimizeSkewedJoin"] == "true"
