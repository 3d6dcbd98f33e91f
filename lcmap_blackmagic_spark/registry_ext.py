"""Extended operator coverage: window functions, join families, and
grouping constructs beyond the reference's own surface (SURVEY §2.3
notes the reference has exactly one join and no windows — a Spark
engine carries the full families; these queries pin their semantics
against the oracle).

Determinism: window orderings always include a unique tie-break
column; money sums go through DECIMAL; time math uses microsecond
integers.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .registry import _t


# ----------------------------------------------------- windows ------

def q_sessionize(spark, sf_dir):
    """Gap-based sessionization (30-min inactivity) via lag + running
    sum — the batch twin of stateful streaming sessions."""
    e = _t(spark, sf_dir, "events")
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(
        F.lag("ts").over(order))
    new_sess = F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), 1) \
        .otherwise(0)
    run = Window.partitionBy("user_id").orderBy("ts", "event_id") \
        .rowsBetween(Window.unboundedPreceding, 0)
    sess = (e.withColumn("new_sess", new_sess)
             .withColumn("session_id", F.sum("new_sess").over(run)))
    return (sess.groupBy("user_id", "session_id")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.min("ts").alias("session_start"),
                 F.max("ts").alias("session_end")))


SQL_SESSIONIZE = """
WITH g AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 30*60*1000000
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
s AS (
  SELECT user_id, event_id, ts,
         CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS session_id
  FROM g)
SELECT user_id, session_id, CAST(COUNT(*) AS BIGINT) AS n_events,
       MIN(ts) AS session_start, MAX(ts) AS session_end
FROM s GROUP BY user_id, session_id
"""


def q_lead_lag(spark, sf_dir):
    """lag/lead with micro-second deltas per user."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id", "user_id",
        (F.unix_micros(F.col("ts"))
         - F.unix_micros(F.lag("ts").over(w))).alias("us_since_prev"),
        F.lead("event_type").over(w).alias("next_type"))


SQL_LEAD_LAG = """
SELECT event_id, user_id,
       epoch_us(ts) - epoch_us(lag(ts) OVER w) AS us_since_prev,
       lead(event_type) OVER w AS next_type
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def q_running_sum(spark, sf_dir):
    """Cumulative per-user spend in exact decimal."""
    e = _t(spark, sf_dir, "events")
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, 0))
    return e.select(
        "event_id", "user_id",
        F.sum(F.col("value").cast("decimal(18,2)")).over(w)
        .cast("double").alias("running_value"))


SQL_RUNNING_SUM = """
SELECT event_id, user_id,
       CAST(SUM(CAST(value AS DECIMAL(18,2)))
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_value
FROM events
"""


def q_topn_per_group(spark, sf_dir):
    """Top-3 events by value per user — windowed top-k with total
    deterministic order."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("value").desc(),
                                              F.col("event_id"))
    return (e.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 3)
            .select("user_id", "event_id", "value",
                    F.col("rn").cast("bigint").alias("rn")))


SQL_TOPN_PER_GROUP = """
SELECT user_id, event_id, value, CAST(rn AS BIGINT) AS rn
FROM (SELECT user_id, event_id, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY value DESC, event_id) AS rn
      FROM events)
WHERE rn <= 3
"""


# ------------------------------------------------- join families ----

def q_asof_join(spark, sf_dir):
    """As-of join as a window composition: each purchase event gets
    the id of the latest error event at-or-before it for the same
    user. Spark lacks a native as-of join — this is the
    union+last_value(ignore nulls) pattern, one shuffle on user_id."""
    e = _t(spark, sf_dir, "events")
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, 0))
    last_err = F.last(
        F.when(F.col("event_type") == "error", F.col("event_id")),
        ignorenulls=True).over(w)
    return (e.withColumn("asof_error_id", last_err)
            .filter(F.col("event_type") == "purchase")
            .select("event_id", "user_id", "asof_error_id"))


SQL_ASOF_JOIN = """
SELECT event_id, user_id, asof_error_id
FROM (SELECT event_id, user_id, event_type,
             last_value(CASE WHEN event_type = 'error' THEN event_id END
                        IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS asof_error_id
      FROM events)
WHERE event_type = 'purchase'
"""


def q_range_join(spark, sf_dir):
    """Range (interval) join: pairs of events from the same user
    within 10 minutes. Spark side runs the bucketed form — join on
    (user, coarse time bucket)±1 then exact filter — which bounds the
    candidate product at scale; the oracle does the naive theta join."""
    e = _t(spark, sf_dir, "events")
    bucket_us = 10 * 60 * 1_000_000
    base = e.select("event_id", "user_id",
                    F.unix_micros(F.col("ts")).alias("us"))
    left = base.withColumn(
        "bkt", F.explode(F.array(
            F.floor(F.col("us") / bucket_us) - 1,
            F.floor(F.col("us") / bucket_us),
            F.floor(F.col("us") / bucket_us) + 1)))
    right = base.withColumn("bkt", F.floor(F.col("us") / bucket_us))
    a, b = left.alias("a"), right.alias("b")
    return (a.join(b, (F.col("a.user_id") == F.col("b.user_id"))
                   & (F.col("a.bkt") == F.col("b.bkt"))
                   & (F.col("a.event_id") < F.col("b.event_id"))
                   & (F.abs(F.col("a.us") - F.col("b.us")) <= bucket_us))
            .select(F.col("a.event_id").alias("id_a"),
                    F.col("b.event_id").alias("id_b"),
                    F.col("a.user_id").alias("user_id"))
            .distinct())


SQL_RANGE_JOIN = """
SELECT DISTINCT a.event_id AS id_a, b.event_id AS id_b, a.user_id
FROM events a JOIN events b
  ON a.user_id = b.user_id
 AND a.event_id < b.event_id
 AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= 10*60*1000000
"""


def q_semi_anti(spark, sf_dir):
    """Left-semi + left-anti in one result: customers flagged by
    whether they have any orders."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    with_orders = (c.join(o, c.c_custkey == o.o_custkey, "left_semi")
                   .select("c_custkey", F.lit(True).alias("has_orders")))
    without = (c.join(o, c.c_custkey == o.o_custkey, "left_anti")
               .select("c_custkey", F.lit(False).alias("has_orders")))
    return with_orders.unionByName(without)


SQL_SEMI_ANTI = """
SELECT c_custkey, TRUE AS has_orders FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
UNION ALL
SELECT c_custkey, FALSE AS has_orders FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
"""


# ------------------------------------------- grouping constructs ----

def q_rollup(spark, sf_dir):
    """ROLLUP over (region, nation) with grouping ids."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    joined = (c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
               .join(F.broadcast(r), n.n_regionkey == r.r_regionkey))
    return (joined.rollup("r_name", "n_name")
            .agg(F.count(F.lit(1)).alias("n_customers"),
                 F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
                 .cast("double").alias("total_acctbal"),
                 F.grouping_id().cast("bigint").alias("gid")))


SQL_ROLLUP = """
SELECT r_name, n_name, CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal,
       CAST(GROUPING(r_name) * 2 + GROUPING(n_name) AS BIGINT) AS gid
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY ROLLUP (r_name, n_name)
"""


def q_distinct_agg(spark, sf_dir):
    """Multiple distinct aggregates per group."""
    l = _t(spark, sf_dir, "lineitem")
    return (l.groupBy("l_returnflag")
            .agg(F.countDistinct("l_suppkey").alias("n_suppliers"),
                 F.countDistinct("l_partkey").alias("n_parts"),
                 F.count(F.lit(1)).alias("n_rows")))


SQL_DISTINCT_AGG = """
SELECT l_returnflag,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers,
       CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM lineitem GROUP BY l_returnflag
"""


def q_percentiles(spark, sf_dir):
    """Exact continuous percentiles (median / p90) per group."""
    o = _t(spark, sf_dir, "orders")
    return (o.groupBy("o_orderstatus")
            .agg(F.round(F.percentile("o_totalprice", F.lit(0.5)), 4)
                 .alias("median_price"),
                 F.round(F.percentile("o_totalprice", F.lit(0.9)), 4)
                 .alias("p90_price")))


SQL_PERCENTILES = """
SELECT o_orderstatus,
       ROUND(quantile_cont(o_totalprice, 0.5), 4) AS median_price,
       ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90_price
FROM orders GROUP BY o_orderstatus
"""


QUERIES_EXT: dict[str, dict] = {
    "sessionize":     {"fn": q_sessionize,     "sql": SQL_SESSIONIZE},
    "lead_lag":       {"fn": q_lead_lag,       "sql": SQL_LEAD_LAG},
    "running_sum":    {"fn": q_running_sum,    "sql": SQL_RUNNING_SUM},
    "topn_per_group": {"fn": q_topn_per_group, "sql": SQL_TOPN_PER_GROUP},
    "asof_join":      {"fn": q_asof_join,      "sql": SQL_ASOF_JOIN},
    "range_join":     {"fn": q_range_join,     "sql": SQL_RANGE_JOIN},
    "semi_anti":      {"fn": q_semi_anti,      "sql": SQL_SEMI_ANTI},
    "rollup":         {"fn": q_rollup,         "sql": SQL_ROLLUP},
    "distinct_agg":   {"fn": q_distinct_agg,   "sql": SQL_DISTINCT_AGG},
    "percentiles":    {"fn": q_percentiles,    "sql": SQL_PERCENTILES},
}
