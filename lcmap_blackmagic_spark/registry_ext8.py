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
    k-means converge reproducibly)."""
    from .registry_ext7 import KM_CENTROIDS, _sq_dist
    e = _t(spark, sf_dir, "embeddings")
    cent = (e.filter(F.col("vec_id") < KM_CENTROIDS)
            .select(F.col("vec_id").alias("cid"),
                    F.col("embedding").alias("c_emb")))
    joined = (e.select("vec_id", "embedding")
              .crossJoin(F.broadcast(cent))
              .select("vec_id", "embedding", "cid",
                      _sq_dist("embedding", "c_emb").alias("dist")))
    w = Window.partitionBy("vec_id").orderBy("dist", "cid")
    best = (joined.select("vec_id", "embedding", "cid",
                          F.row_number().over(w).alias("rn"))
            .filter(F.col("rn") == 1))
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
    from .registry_ext7 import KM_CENTROIDS, KM_DIM
    terms = " + ".join(
        f"(CAST(e.embedding[{i}] AS DOUBLE) - CAST(c.embedding[{i}] AS DOUBLE))"
        f" * (CAST(e.embedding[{i}] AS DOUBLE) - CAST(c.embedding[{i}] AS DOUBLE))"
        for i in range(1, KM_DIM + 1))
    qs = ", ".join(
        f"CAST(FLOOR(CAST(embedding[{i}] AS DOUBLE) * {KM_Q}) AS BIGINT)"
        f" AS q{i}" for i in range(1, KM_MEAN_DIMS + 1))
    sums = ", ".join(f"CAST(SUM(q{i}) AS BIGINT) AS s{i}"
                     for i in range(1, KM_MEAN_DIMS + 1))
    means = ", ".join(
        f"(CAST(s{i} AS DOUBLE) / n) / {KM_Q} AS m{i}"
        for i in range(1, KM_MEAN_DIMS + 1))
    return f"""
WITH dists AS (
  SELECT e.vec_id, e.embedding, c.vec_id AS cid, {terms} AS dist
  FROM embeddings e JOIN embeddings c ON c.vec_id < {KM_CENTROIDS}),
best AS (
  SELECT vec_id, embedding, cid,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
  FROM dists),
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


QUERIES_EXT8: dict[str, dict] = {
    "skew_profile":      {"fn": q_skew_profile,   "sql": SQL_SKEW_PROFILE},
    "random_projection": {"fn": q_random_projection,
                          "sql": _sql_random_projection()},
    "kmeans_update":     {"fn": q_kmeans_update,
                          "sql": _sql_kmeans_update()},
    "attribution":       {"fn": q_attribution,    "sql": SQL_ATTRIBUTION},
}
