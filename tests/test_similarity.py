"""ANN variants must agree with the exact brute-force baseline on
shape and achieve usable recall; salted joins must be result-identical
to their unsalted twins."""

import os

import pytest
from pyspark.sql import functions as F

from lcmap_blackmagic_spark.llm.similarity import (cosine_topk,
                                                   ivf_ann_topk,
                                                   lsh_ann_topk)
from lcmap_blackmagic_spark.operators.joins import salted_join


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))


def _pairs(df):
    return {(r["qid"], r["nid"]) for r in df.collect()}


def test_ivf_recall_against_exact(emb):
    qf = F.col("vec_id") % 50 == 0
    exact = _pairs(cosine_topk(emb, qf, k=5))
    approx_df = ivf_ann_topk(emb, qf, k=5, n_cells=8, n_probe=3)
    assert approx_df.columns == ["qid", "nid", "cosine"]
    approx = _pairs(approx_df)
    # probing 3/8 cells must recover a usable share of true neighbors
    assert len(approx & exact) / len(exact) >= 0.4
    # at most k rows per query
    counts = (approx_df.groupBy("qid").count().agg(F.max("count"))
              .first()[0])
    assert counts <= 5


def test_ivf_full_probe_equals_exact(emb):
    """Probing every cell degenerates to the exact search — recall 1."""
    qf = F.col("vec_id") % 100 == 0
    exact = _pairs(cosine_topk(emb, qf, k=3))
    approx = _pairs(ivf_ann_topk(emb, qf, k=3, n_cells=4, n_probe=4))
    assert approx == exact


def test_lsh_recall_against_exact(emb):
    """Synthetic vectors are weakly correlated (top-neighbor cosine
    ~0.5 → 60° angles), so recall needs short codes and many tables:
    sign-LSH collision prob is (1 - θ/π)^planes per table."""
    qf = F.col("vec_id") % 50 == 0
    exact = _pairs(cosine_topk(emb, qf, k=5))
    approx = _pairs(lsh_ann_topk(emb, qf, k=5, n_tables=8, n_planes=2))
    assert len(approx & exact) / len(exact) >= 0.6


def test_salted_join_matches_plain(spark, sf_dir):
    l = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")) \
        .select("l_orderkey", "l_partkey", "l_quantity")
    o = spark.read.parquet(os.path.join(sf_dir, "orders.parquet")) \
        .select(F.col("o_orderkey").alias("l_orderkey"), "o_custkey")
    plain = l.join(o, "l_orderkey").groupBy().agg(
        F.count(F.lit(1)), F.sum("o_custkey"), F.sum("l_partkey")).first()
    salted = salted_join(l, o, ["l_orderkey"], n_salts=8).groupBy().agg(
        F.count(F.lit(1)), F.sum("o_custkey"), F.sum("l_partkey")).first()
    assert tuple(plain) == tuple(salted)


def test_salted_join_rejects_right(spark):
    df = spark.range(5)
    with pytest.raises(ValueError):
        salted_join(df, df, ["id"], how="full")


def test_lsh_neardup_subset_of_exact(emb):
    """The registered near-dup form (LSH candidates + exact verify)
    must emit a SUBSET of the all-pairs exact result with identical
    cosines — precision 1 by construction; banding only costs
    recall."""
    from lcmap_blackmagic_spark.llm.similarity import (
        cosine_neardup_pairs, lsh_neardup_pairs)
    t = 0.42
    exact = {(r["id_a"], r["id_b"]): r["cosine"]
             for r in cosine_neardup_pairs(emb, threshold=t).collect()}
    lsh = {(r["id_a"], r["id_b"]): r["cosine"]
           for r in lsh_neardup_pairs(emb, threshold=t).collect()}
    assert set(lsh) <= set(exact)
    for k, v in lsh.items():
        assert v == exact[k]


def test_lsh_neardup_plan_has_no_nested_loop(emb):
    """Scale guard: the registered near-dup must candidate via an
    equi-join on (table, bucket) — never an n-squared nested-loop or
    cartesian product."""
    from lcmap_blackmagic_spark.llm.similarity import lsh_neardup_pairs
    plan = (lsh_neardup_pairs(emb, threshold=0.42)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
