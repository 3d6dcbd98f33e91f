"""Ninth extension wave — ops tooling + embedding transforms:

- ``skew_profile``: join-key skew diagnostics (the thing you run
  BEFORE deciding between AQE skew-split, salting, and broadcast —
  SCALE.md's partitioning backbone assumes someone measured this),
- ``random_projection``: Johnson-Lindenstrauss ±1 sign projection
  64 → 8 dims — sign matrix derived from md5 at PLAN BUILD time and
  embedded as literals in both engines, unrolled fixed-order sums so
  the doubles are bit-identical,
- ``kmeans_update``: the k-means M-STEP on top of the assign step
  (registry_ext7.q_kmeans_assign): per-cell counts + new centroid
  means for the leading dims, in floor-scaled integer sums so the
  mean is order-free and exact,
- ``attribution``: last-touch marketing attribution — each purchase
  credits the campaign of the most recent preceding click/view by
  the same user (carry-forward via last(..., ignorenulls) — one
  user-partition window, no self-join).

Determinism contract as registry.py.
"""

from __future__ import annotations

import hashlib
import math
from functools import reduce

from pyspark.sql import Window
from pyspark.sql import functions as F

from .registry import _t

# ---------------------------------------------------- skew profile --

SKEW_TOPK = 10


def q_skew_profile(spark, sf_dir):
    """Key-skew diagnostics for a prospective join key
    (lineitem.l_suppkey): the hottest keys with exact counts and
    permille share, plus the corpus-level skew ratio
    (max/mean, scaled ×1000 integer).  Shape: one map-side-combined
    count per key, a tiny all-keys rollup broadcast back, TakeOrdered
    for the hot list — the fact table is scanned once and never
    re-shuffled."""
    li = _t(spark, sf_dir, "lineitem")
    per_key = (li.groupBy("l_suppkey")
               .agg(F.count(F.lit(1)).alias("cnt")))
    totals = per_key.agg(
        F.sum("cnt").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("cnt").alias("max_cnt"))
    return (per_key.crossJoin(F.broadcast(totals))
            .select("l_suppkey", "cnt",
                    F.expr("cnt * 1000 div n_rows").alias("permille"),
                    F.expr("max_cnt * n_keys * 1000 div n_rows")
                    .alias("skew_x1000"))
            .orderBy(F.desc("cnt"), "l_suppkey")
            .limit(SKEW_TOPK))


SQL_SKEW_PROFILE = f"""
WITH per_key AS (
  SELECT l_suppkey, COUNT(*) AS cnt FROM lineitem GROUP BY l_suppkey),
totals AS (
  SELECT CAST(SUM(cnt) AS BIGINT) AS n_rows, COUNT(*) AS n_keys,
         MAX(cnt) AS max_cnt
  FROM per_key)
SELECT l_suppkey, cnt,
       cnt * 1000 // n_rows AS permille,
       max_cnt * n_keys * 1000 // n_rows AS skew_x1000
FROM per_key CROSS JOIN totals
ORDER BY cnt DESC, l_suppkey
LIMIT {SKEW_TOPK}
"""


# ------------------------------------------- JL random projection ---

RP_IN_DIM = 64
RP_OUT_DIM = 8
RP_SCALE = 1.0 / math.sqrt(RP_OUT_DIM)


def _rp_sign(i: int, j: int) -> int:
    """±1 from md5 — computed at plan build, embedded as a literal in
    BOTH the Spark plan and the oracle SQL (no runtime hashing)."""
    return 1 if hashlib.md5(f"rp:{i}:{j}".encode()).digest()[0] % 2 == 0 else -1


def q_random_projection(spark, sf_dir):
    """JL sign-projection of the 64-d embeddings down to 8 dims:
    p_j = (1/√8) Σ_i s_ij · v_i with a fixed ±1 matrix.  Pure
    per-row codegen arithmetic — no shuffle, no UDF; the unrolled
    left-to-right sums and the literal scale factor make the output
    doubles bit-identical across engines (no rounding)."""
    e = _t(spark, sf_dir, "embeddings")

    def proj(j):
        terms = []
        for i in range(1, RP_IN_DIM + 1):
            v = F.element_at("embedding", i).cast("double")
            terms.append(v if _rp_sign(i, j) > 0 else -v)
        return (reduce(lambda a, b: a + b, terms)
                * F.lit(RP_SCALE)).alias(f"p{j}")

    return e.select("vec_id", *[proj(j) for j in range(RP_OUT_DIM)])


def _sql_random_projection() -> str:
    cols = []
    for j in range(RP_OUT_DIM):
        terms = " + ".join(
            ("" if _rp_sign(i, j) > 0 else "-")
            + f"CAST(embedding[{i}] AS DOUBLE)"
            for i in range(1, RP_IN_DIM + 1))
        cols.append(f"({terms}) * {RP_SCALE!r} AS p{j}")
    return f"SELECT vec_id, {', '.join(cols)} FROM embeddings"


# ------------------------------------------------ k-means M-step ----

KM_MEAN_DIMS = 4
KM_Q = 1 << 20  # floor-quantization scale: exact, order-free sums


def q_kmeans_update(spark, sf_dir):
    """The k-means M-step stacked on the assign step: per-cell
    population and the NEW centroid coordinates for the leading
    dims.  Element values are floor-scaled to integers
    (floor(v · 2^20)) before summing, so the per-cell mean is an
    order-free bigint sum with exactly two float divisions at the
    end — the update is bit-identical across engines and across
    cluster re-partitionings (the property that makes distributed
    k-means converge reproducibly).  The E-step itself is the shared
    ``registry_ext7.assign_nearest`` — one copy of the tie-break and
    the unrolled distance across both queries."""
    from .registry_ext7 import assign_nearest
    best = assign_nearest(_t(spark, sf_dir, "embeddings"))
    qcols = [F.floor(F.element_at("embedding", i).cast("double") * KM_Q)
             .alias(f"q{i}") for i in range(1, KM_MEAN_DIMS + 1)]
    quant = best.select("cid", *qcols)
    agg = quant.groupBy("cid").agg(
        F.count(F.lit(1)).alias("n"),
        *[F.sum(f"q{i}").alias(f"s{i}") for i in range(1, KM_MEAN_DIMS + 1)])
    means = [((F.col(f"s{i}").cast("double") / F.col("n")) / KM_Q)
             .alias(f"m{i}") for i in range(1, KM_MEAN_DIMS + 1)]
    return agg.select("cid", "n", *means).orderBy("cid")


def _sql_kmeans_update() -> str:
    from .registry_ext7 import sql_assign_best
    qs = ", ".join(
        f"CAST(FLOOR(CAST(embedding[{i}] AS DOUBLE) * {KM_Q}) AS BIGINT)"
        f" AS q{i}" for i in range(1, KM_MEAN_DIMS + 1))
    sums = ", ".join(f"CAST(SUM(q{i}) AS BIGINT) AS s{i}"
                     for i in range(1, KM_MEAN_DIMS + 1))
    means = ", ".join(
        f"(CAST(s{i} AS DOUBLE) / n) / {KM_Q} AS m{i}"
        for i in range(1, KM_MEAN_DIMS + 1))
    return f"""{sql_assign_best(extra_cols=", e.embedding")},
quant AS (SELECT cid, {qs} FROM best WHERE rn = 1),
agg AS (SELECT cid, COUNT(*) AS n, {sums} FROM quant GROUP BY cid)
SELECT cid, n, {means} FROM agg ORDER BY cid
"""


# ------------------------------------------- last-touch attribution --

def q_attribution(spark, sf_dir):
    """Last-touch attribution: each purchase credits the campaign
    (props.k mod 5) of the most recent preceding click/view by the
    same user; purchases with no prior touch fall into campaign -1.
    One user-partition window with last(..., ignorenulls) — the
    carry-forward idiom — instead of the quadratic self-join the
    naive formulation implies."""
    e = _t(spark, sf_dir, "events")
    campaign = F.when(
        F.col("event_type").isin("click", "view"),
        F.get_json_object("props", "$.k").cast("bigint") % 5)
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, 0))
    touched = e.select(
        "event_id", "user_id", "event_type", "value",
        F.last(campaign, ignorenulls=True).over(w).alias("campaign"))
    purchases = touched.filter(F.col("event_type") == "purchase")
    return (purchases.groupBy(
        F.coalesce("campaign", F.lit(-1)).alias("campaign"))
        .agg(F.count(F.lit(1)).alias("n_purchases"),
             F.sum(F.col("value").cast("decimal(18,2)"))
             .cast("double").alias("revenue"))
        .orderBy("campaign"))


SQL_ATTRIBUTION = """
WITH touched AS (
  SELECT event_id, user_id, event_type, value,
         last_value(CASE WHEN event_type IN ('click', 'view')
                         THEN CAST(props->>'$.k' AS BIGINT) % 5 END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS campaign
  FROM events)
SELECT COALESCE(campaign, -1) AS campaign,
       COUNT(*) AS n_purchases,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM touched WHERE event_type = 'purchase'
GROUP BY COALESCE(campaign, -1) ORDER BY campaign
"""


# ------------------------------------------------------ OHLC bars ---

def q_ohlc_bars(spark, sf_dir):
    """Hourly open/high/low/close/volume bars per event type — the
    time-bucketed rollup every metrics store needs.  Buckets are
    EPOCH-HOUR integers (unix_micros div 3600e6), never
    date_trunc — the events column is LTZ and session-timezone
    truncation silently shifts bars (the cohort_retention timezone
    lesson).  Open/close are first/last over the
    unique (ts, event_id) order via an unbounded window; one
    bar-partition shuffle total."""
    e = _t(spark, sf_dir, "events")
    # integer div, not /: double division truncated can land one off
    # the oracle's floored integer quotient at bucket boundaries
    hr = F.expr("unix_micros(ts) div 3600000000")
    w = (Window.partitionBy("event_type", "hr")
         .orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding,
                      Window.unboundedFollowing))
    base = (e.select("event_type", hr.alias("hr"), "ts", "event_id",
                     F.col("value").cast("decimal(18,2)").alias("v"))
            .select("event_type", "hr", "v",
                    F.first("v").over(w).alias("open"),
                    F.last("v").over(w).alias("close")))
    return (base.groupBy("event_type", "hr")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.max(F.col("open").cast("double")).alias("open"),
                 F.max("v").cast("double").alias("high"),
                 F.min("v").cast("double").alias("low"),
                 F.max(F.col("close").cast("double")).alias("close"),
                 F.sum("v").cast("double").alias("volume")))


SQL_OHLC_BARS = """
WITH base AS (
  SELECT event_type, epoch_us(ts) // 3600000000 AS hr,
         CAST(value AS DECIMAL(18,2)) AS v,
         first_value(CAST(value AS DECIMAL(18,2)))
           OVER (PARTITION BY event_type, epoch_us(ts) // 3600000000
                 ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING
                          AND UNBOUNDED FOLLOWING) AS open,
         last_value(CAST(value AS DECIMAL(18,2)))
           OVER (PARTITION BY event_type, epoch_us(ts) // 3600000000
                 ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING
                          AND UNBOUNDED FOLLOWING) AS close
  FROM events)
SELECT event_type, hr, COUNT(*) AS n,
       CAST(MAX(open) AS DOUBLE) AS open,
       CAST(MAX(v) AS DOUBLE) AS high,
       CAST(MIN(v) AS DOUBLE) AS low,
       CAST(MAX(close) AS DOUBLE) AS close,
       CAST(SUM(v) AS DOUBLE) AS volume
FROM base GROUP BY event_type, hr
"""


# ----------------------------------------------------- RFM scores ---

def q_rfm_scores(spark, sf_dir):
    """RFM (recency / frequency / monetary) customer segmentation:
    quintile each metric over a unique total order, report segment
    populations.  All metrics are integers (epoch days, counts,
    cents); three global ntile sorts at fixture scale — the at-scale
    form swaps ntile for approx-quantile breakpoint broadcast, noted
    here because a global sort per metric is the textbook
    ntile-at-scale trap."""
    o = _t(spark, sf_dir, "orders")
    per_cust = (o.groupBy("o_custkey")
                .agg(F.max(F.datediff(F.to_date("o_orderdate"),
                                      F.lit("1970-01-01").cast("date")))
                     .alias("recency"),
                     F.count(F.lit(1)).alias("frequency"),
                     (F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                      * 100).cast("bigint").alias("monetary")))
    scored = per_cust.select(
        "o_custkey",
        F.ntile(5).over(Window.orderBy("recency", "o_custkey")).alias("r"),
        F.ntile(5).over(Window.orderBy("frequency", "o_custkey")).alias("f"),
        F.ntile(5).over(Window.orderBy("monetary", "o_custkey")).alias("m"))
    return (scored.groupBy("r", "f", "m")
            .agg(F.count(F.lit(1)).alias("n_customers"),
                 F.min("o_custkey").alias("min_cust"),
                 F.max("o_custkey").alias("max_cust")))


SQL_RFM_SCORES = """
WITH per_cust AS (
  SELECT o_custkey,
         MAX(CAST(o_orderdate AS DATE) - DATE '1970-01-01') AS recency,
         COUNT(*) AS frequency,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
           AS monetary
  FROM orders GROUP BY o_custkey),
scored AS (
  SELECT o_custkey,
         ntile(5) OVER (ORDER BY recency, o_custkey) AS r,
         ntile(5) OVER (ORDER BY frequency, o_custkey) AS f,
         ntile(5) OVER (ORDER BY monetary, o_custkey) AS m
  FROM per_cust)
SELECT r, f, m, COUNT(*) AS n_customers,
       MIN(o_custkey) AS min_cust, MAX(o_custkey) AS max_cust
FROM scored GROUP BY r, f, m
"""


QUERIES_EXT8: dict[str, dict] = {
    "skew_profile":      {"fn": q_skew_profile,   "sql": SQL_SKEW_PROFILE},
    "random_projection": {"fn": q_random_projection,
                          "sql": _sql_random_projection()},
    "kmeans_update":     {"fn": q_kmeans_update,
                          "sql": _sql_kmeans_update()},
    "attribution":       {"fn": q_attribution,    "sql": SQL_ATTRIBUTION},
    "ohlc_bars":         {"fn": q_ohlc_bars,      "sql": SQL_OHLC_BARS},
    "rfm_scores":        {"fn": q_rfm_scores,     "sql": SQL_RFM_SCORES},
}
