"""Round-5 session-2 operators: prefix-filter similarity join,
Count-Min sketch, KMV set algebra, funnel, MAD outliers.

Oracle parity for each registry entry is covered by
test_oracle_parity.py; these tests pin the properties the oracle
can't see — plan shapes, mergeability laws, estimator bounds, and
the exactness of prefix filtering against in-Spark brute force."""

import pytest
from pyspark.sql import functions as F

from lcmap_blackmagic_spark.llm.dedup import prefix_jaccard_pairs
from lcmap_blackmagic_spark.operators.sketches import (
    cms_counters, cms_estimate, kmv_set_ops)
from lcmap_blackmagic_spark.registry import QUERIES
from lcmap_blackmagic_spark.registry_ext5 import (
    CMS_D, CMS_W, q_funnel_steps, q_mad_outliers)


# ---------------------------------------- prefix-filter join --------

def test_prefix_join_matches_brute_force(spark, sf_dir):
    """Prefix filtering is LOSSLESS: the candidate restriction must
    reproduce the all-pairs result exactly (same pairs, same
    jaccard), not approximately."""
    d = (spark.read.parquet(f"{sf_dir}/documents.parquet")
         .select("doc_id", "text"))
    fast = {(r.id_a, r.id_b, r.jaccard)
            for r in prefix_jaccard_pairs(d, n=2, t_num=1, t_den=2)
            .collect()}
    # brute force inside Spark with the identical hashing
    from lcmap_blackmagic_spark.llm.dedup import shingles
    sh = F.array_distinct(F.transform(
        shingles("text", 2),
        lambda s: F.conv(F.substring(F.md5(s.cast("binary")), 1, 12),
                         16, 10).cast("bigint")))
    t = d.select("doc_id", sh.alias("sh"))
    a = t.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sa"))
    b = t.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sb"))
    inter = F.size(F.array_intersect("sa", "sb"))
    union = F.size("sa") + F.size("sb") - inter
    brute = {(r.id_a, r.id_b, r.jaccard)
             for r in a.crossJoin(b)
             .filter(F.col("id_a") < F.col("id_b"))
             .filter(inter * 2 >= union)
             .select("id_a", "id_b",
                     F.round(inter / union, 6).alias("jaccard"))
             .collect()}
    assert fast == brute and len(fast) > 0


def test_prefix_join_plan_has_no_cartesian(spark, sf_dir):
    plan = prefix_jaccard_pairs(
        spark.read.parquet(f"{sf_dir}/documents.parquet"),
        n=2)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# ---------------------------------------- count-min sketch ----------

def test_cms_never_underestimates(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    exact = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    counters = cms_counters(e, "user_id", CMS_D, CMS_W)
    est = cms_estimate(counters, exact.select("user_id"), "user_id",
                       CMS_D, CMS_W)
    joined = exact.join(est, "user_id").collect()
    assert len(joined) > 0
    assert all(r.cms_est >= r.n for r in joined)


def test_cms_partials_merge_to_single_pass(spark, sf_dir):
    """Counter grids built on disjoint splits and re-merged must
    estimate identically to one pass over the whole table — the
    mergeability law that lets the sketch roll up across days /
    micro-batches."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    lo = e.filter(F.col("event_id") % 2 == 0)
    hi = e.filter(F.col("event_id") % 2 == 1)
    merged = cms_counters(lo, "user_id", CMS_D, CMS_W).unionAll(
        cms_counters(hi, "user_id", CMS_D, CMS_W))
    keys = e.select("user_id").distinct()
    one = {(r.user_id, r.cms_est) for r in cms_estimate(
        cms_counters(e, "user_id", CMS_D, CMS_W), keys, "user_id",
        CMS_D, CMS_W).collect()}
    two = {(r.user_id, r.cms_est) for r in cms_estimate(
        merged, keys, "user_id", CMS_D, CMS_W).collect()}
    assert one == two


def test_cms_single_exchange_plan(spark, sf_dir):
    """The counter build must shuffle only the (row, col) partials —
    one exchange, partial aggregation before it."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    plan = cms_counters(e, "user_id", CMS_D, CMS_W) \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "partial_count" in plan


# ---------------------------------------- KMV set algebra -----------

def test_kmv_estimates_near_exact(spark, sf_dir):
    l = (spark.read.parquet(f"{sf_dir}/lineitem.parquet")
         .filter(F.col("l_returnflag").isin("A", "N")))
    row = kmv_set_ops(l, "l_orderkey",
                      F.col("l_returnflag") == "A", k=64).collect()[0]
    ex_a = l.filter("l_returnflag = 'A'") \
        .select("l_orderkey").distinct().count()
    ex_b = l.filter("l_returnflag = 'N'") \
        .select("l_orderkey").distinct().count()
    ex_u = l.select("l_orderkey").distinct().count()
    # k=64 → standard error ~1/sqrt(62) ≈ 13%; allow 3 sigma
    for est, exact in ((row.a_est, ex_a), (row.b_est, ex_b),
                       (row.union_est, ex_u)):
        assert abs(est - exact) <= 0.4 * exact + 2
    assert 0.0 <= row.jaccard_est <= 1.0
    assert row.intersect_est <= row.union_est + 1e-9


# ---------------------------------------- funnel --------------------

def test_funnel_is_monotone(spark, sf_dir):
    rows = {r.step: r.users
            for r in q_funnel_steps(spark, sf_dir).collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1] >= rows[2] >= rows[3] >= 0


# ---------------------------------------- MAD outliers --------------

def test_mad_flags_satisfy_threshold(spark, sf_dir):
    out = q_mad_outliers(spark, sf_dir).collect()
    assert len(out) > 0
    for r in out:
        assert abs(r.value_cents - r.median_cents) > 3 * r.mad_cents


def test_mad_broadcasts_the_reduced_medians(spark, sf_dir):
    plan = q_mad_outliers(spark, sf_dir) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


# ---------------------------------------- registry wiring -----------

def test_ext5_entries_registered():
    for name in ("llm_jaccard_prefix", "cms_topk", "kmv_set_ops",
                 "funnel_steps", "mad_outliers"):
        assert name in QUERIES and QUERIES[name].get("sql")
