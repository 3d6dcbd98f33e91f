"""Bucketed co-located joins must plan without a shuffle Exchange and
return exactly the rows of the plain shuffle join."""

import os

import pytest
from pyspark.sql import functions as F

from lcmap_blackmagic_spark.operators.bucketing import (bucketed_join,
                                                        shuffle_exchanges,
                                                        write_bucketed)


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("buckets")
    l = (spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
         .select("l_orderkey", "l_partkey", "l_quantity"))
    o = (spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
         .select(F.col("o_orderkey").alias("l_orderkey"), "o_custkey"))
    write_bucketed(l, "bt_lineitem", ["l_orderkey"], 8,
                   path=str(base / "l"))
    write_bucketed(o, "bt_orders", ["l_orderkey"], 8,
                   path=str(base / "o"))
    yield l, o
    spark.sql("DROP TABLE IF EXISTS bt_lineitem")
    spark.sql("DROP TABLE IF EXISTS bt_orders")


def test_bucketed_join_has_no_shuffle(spark, bucketed):
    j = bucketed_join(spark, "bt_lineitem", "bt_orders", ["l_orderkey"])
    j.collect()
    assert shuffle_exchanges(j) == 0


def test_bucketed_join_matches_plain(spark, bucketed):
    l, o = bucketed
    plain = {tuple(r) for r in l.join(o, "l_orderkey").collect()}
    buck = {tuple(r) for r in bucketed_join(
        spark, "bt_lineitem", "bt_orders", ["l_orderkey"]).collect()}
    assert buck == plain
