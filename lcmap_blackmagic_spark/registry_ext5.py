"""Sixth extension wave — round-5 session-2 operators:

- ``llm_jaccard_prefix``: EXACT set-similarity self-join via prefix
  filtering (AllPairs/PPJoin family) — the lossless scale technique
  beside LSH banding and blocked brute force (llm/dedup.py),
- ``cms_topk``: Count-Min sketch frequency estimates beside exact
  heavy-hitter counts — the mergeable per-key-frequency twin of the
  HLL registers (operators/sketches.py),
- ``kmv_set_ops``: union / intersection / Jaccard cardinality
  estimates from K-minimum-values sketch algebra,
- ``funnel_steps``: ordered-event funnel conversion (signup →
  click → purchase) over the event stream,
- ``mad_outliers``: robust per-group outlier flags via median
  absolute deviation, in integer-cent arithmetic.

Same determinism contract as the rest of the registry (registry.py
docstring): md5 48-bit integer hashes, integer math until a final
division, money through DECIMAL cents, no rounding of raw doubles.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .llm.dedup import prefix_jaccard_pairs
from .operators.sketches import H48, cms_counters, cms_estimate, kmv_set_ops
from .registry import _t

# ------------------------------------------- prefix-filter join -----

SQL_TOKS = "string_split(lower(trim(text)), ' ')"
# word bigrams, hashed to 48-bit ints — the shared shingle contract
SQL_BIGRAMS = f"""
CASE WHEN len({SQL_TOKS}) >= 2 THEN
  list_distinct(list_transform(generate_series(1, len({SQL_TOKS}) - 1),
    i -> CAST('0x' || substr(md5(array_to_string(
           list_slice({SQL_TOKS}, i, i + 1), ' ')), 1, 12) AS BIGINT)))
ELSE CAST([] AS BIGINT[]) END
"""


def q_jaccard_prefix(spark, sf_dir):
    """All document pairs with word-bigram Jaccard ≥ 1/2, computed by
    the prefix-filter join (rarest-gram prefixes → equi-join → exact
    verify). The oracle is the BRUTE-FORCE all-pairs SQL: prefix
    filtering is exact, so any divergence is a bug in the filter
    derivation, not estimator noise. Plan guard in
    tests/test_ext5.py asserts no cartesian product appears."""
    d = _t(spark, sf_dir, "documents")
    return prefix_jaccard_pairs(d, n=2, t_num=1, t_den=2)


SQL_JACCARD_PREFIX = f"""
WITH tk AS (SELECT doc_id, {SQL_BIGRAMS} AS sh FROM documents)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       ROUND(len(list_intersect(a.sh, b.sh)) * 1.0 /
             (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))),
             6) AS jaccard
FROM tk a JOIN tk b ON a.doc_id < b.doc_id
WHERE len(list_intersect(a.sh, b.sh)) * 2 >=
      (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) * 1
"""

# ------------------------------------------- count-min sketch -------

CMS_D = 4
CMS_W = 256
CMS_TOPK = 10


def q_cms_topk(spark, sf_dir):
    """Top-10 exact per-user event counts beside their Count-Min
    estimates. The estimate is a deterministic function of md5, so it
    is bit-identical in the oracle; est ≥ exact always (one-sided
    error — property-tested in tests/test_ext5.py). At 100 TB only
    the ≤ d·w-cell grid is ever shuffled (map-side combined), and the
    grid from each day/stream/partition merges by SUM."""
    e = _t(spark, sf_dir, "events")
    counters = cms_counters(e, "user_id", depth=CMS_D, width=CMS_W)
    exact = (e.groupBy("user_id")
             .agg(F.count(F.lit(1)).alias("exact_cnt"))
             .orderBy(F.desc("exact_cnt"), "user_id")
             .limit(CMS_TOPK))
    est = cms_estimate(counters, exact, "user_id",
                       depth=CMS_D, width=CMS_W)
    return (exact.join(est, "user_id")
            .select("user_id", "exact_cnt", "cms_est"))


SQL_CMS_TOPK = f"""
WITH js AS (SELECT unnest(range(0, {CMS_D})) AS j),
cells AS (
  SELECT j AS cms_row,
         CAST('0x' || substr(md5(CAST(j AS VARCHAR) || ':' ||
              CAST(user_id AS VARCHAR)), 1, 12) AS BIGINT)
           % {CMS_W} AS cms_col,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events CROSS JOIN js GROUP BY 1, 2),
top AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS exact_cnt
        FROM events GROUP BY user_id
        ORDER BY exact_cnt DESC, user_id LIMIT {CMS_TOPK}),
probes AS (
  SELECT t.user_id, t.exact_cnt, j.j AS cms_row,
         CAST('0x' || substr(md5(CAST(j.j AS VARCHAR) || ':' ||
              CAST(t.user_id AS VARCHAR)), 1, 12) AS BIGINT)
           % {CMS_W} AS cms_col
  FROM top t CROSS JOIN js j)
SELECT p.user_id, p.exact_cnt,
       MIN(COALESCE(c.c, 0)) AS cms_est
FROM probes p LEFT JOIN cells c
  ON p.cms_row = c.cms_row AND p.cms_col = c.cms_col
GROUP BY p.user_id, p.exact_cnt
"""

# ------------------------------------------- KMV set algebra --------

KMV_SET_K = 64


def q_kmv_set_ops(spark, sf_dir):
    """Cardinality algebra between the 'A'-returnflag and
    'N'-returnflag orderkey sets: per-set KMV estimates, the merged
    union sketch, and the sketch-Jaccard intersection estimate.
    Estimator accuracy vs exact counts is tolerance-tested in
    tests/test_ext5.py; THIS query pins the sketch math bit-exactly
    against the oracle."""
    l = _t(spark, sf_dir, "lineitem")
    return kmv_set_ops(l.filter(F.col("l_returnflag").isin("A", "N")),
                       "l_orderkey", F.col("l_returnflag") == "A",
                       k=KMV_SET_K)


_KMV_NUM = repr(float((KMV_SET_K - 1) * H48))

SQL_KMV_SET_OPS = f"""
WITH h AS (
  SELECT CAST('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 12)
              AS BIGINT) AS h,
         MAX(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS a,
         MAX(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END) AS b
  FROM lineitem WHERE l_returnflag IN ('A', 'N') GROUP BY 1),
ska AS (SELECT h FROM h WHERE a = 1 ORDER BY h LIMIT {KMV_SET_K}),
skb AS (SELECT h FROM h WHERE b = 1 ORDER BY h LIMIT {KMV_SET_K}),
ea AS (SELECT CASE WHEN COUNT(*) < {KMV_SET_K}
              THEN CAST(COUNT(*) AS DOUBLE)
              ELSE {_KMV_NUM} / MAX(h) END AS a_est FROM ska),
eb AS (SELECT CASE WHEN COUNT(*) < {KMV_SET_K}
              THEN CAST(COUNT(*) AS DOUBLE)
              ELSE {_KMV_NUM} / MAX(h) END AS b_est FROM skb),
mrg AS (SELECT h, MAX(ia) AS ia, MAX(ib) AS ib FROM (
          SELECT h, 1 AS ia, 0 AS ib FROM ska
          UNION ALL SELECT h, 0 AS ia, 1 AS ib FROM skb)
        GROUP BY h ORDER BY h LIMIT {KMV_SET_K}),
ue AS (SELECT CASE WHEN COUNT(*) < {KMV_SET_K}
              THEN CAST(COUNT(*) AS DOUBLE)
              ELSE {_KMV_NUM} / MAX(h) END AS union_est,
              SUM(CASE WHEN ia = 1 AND ib = 1 THEN 1 ELSE 0 END) * 1.0
                / COUNT(*) AS jaccard_est
       FROM mrg)
SELECT a_est, b_est, union_est, jaccard_est,
       jaccard_est * union_est AS intersect_est
FROM ea, eb, ue
"""

# ------------------------------------------- funnel analysis --------

FUNNEL = ["signup", "click", "purchase"]


def q_funnel_steps(spark, sf_dir):
    """Ordered-event funnel over the event stream: users who signed
    up, then clicked strictly after their first signup, then
    purchased strictly after that first qualifying click. The classic
    product-analytics rollup; each stage is a per-user MIN aggregate
    (map-side combined) joined to the previous stage's reduced
    (users × 1 row) output — no window over raw events, no self-join
    of the fact table against itself."""
    e = _t(spark, sf_dir, "events")
    stage = None
    counts = []
    for i, ev in enumerate(FUNNEL):
        cur = e.filter(F.col("event_type") == ev)
        if stage is None:
            stage = (cur.groupBy("user_id")
                     .agg(F.min("ts").alias("t0")))
        else:
            stage = (cur.join(stage, "user_id")
                     .filter(F.col("ts") > F.col("t0"))
                     .groupBy("user_id")
                     .agg(F.min("ts").alias("t0")))
        counts.append(stage.agg(
            F.lit(i + 1).alias("step"),
            F.lit(" > ".join(FUNNEL[:i + 1])).alias("path"),
            F.count(F.lit(1)).alias("users")))
    out = counts[0]
    for c in counts[1:]:
        out = out.unionAll(c)
    return out


SQL_FUNNEL_STEPS = """
WITH s1 AS (SELECT user_id, MIN(ts) AS t0 FROM events
            WHERE event_type = 'signup' GROUP BY user_id),
s2 AS (SELECT e.user_id, MIN(e.ts) AS t0 FROM events e
       JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t0
       WHERE e.event_type = 'click' GROUP BY e.user_id),
s3 AS (SELECT e.user_id, MIN(e.ts) AS t0 FROM events e
       JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t0
       WHERE e.event_type = 'purchase' GROUP BY e.user_id)
SELECT 1 AS step, 'signup' AS path,
       CAST(COUNT(*) AS BIGINT) AS users FROM s1
UNION ALL
SELECT 2, 'signup > click', CAST(COUNT(*) AS BIGINT) FROM s2
UNION ALL
SELECT 3, 'signup > click > purchase', CAST(COUNT(*) AS BIGINT) FROM s3
"""

# ------------------------------------------- MAD outliers -----------

MAD_K = 3  # flag |v - median| > K * MAD


def q_mad_outliers(spark, sf_dir):
    """Robust per-event-type outlier flags: |value − median| >
    3 × MAD (median absolute deviation). All arithmetic in integer
    CENTS (value is 2-decimal money): medians of integers interpolate
    to exact .5 halves, deviations subtract exactly, and the single
    3× threshold compare is integer-scaled — bit-identical across
    engines without rounding any raw double (SCALE.md float policy).
    Two map-side-combined aggregates over the fact table plus reduced
    joins — the fact table never self-joins."""
    e = _t(spark, sf_dir, "events")
    cents = (e.select("event_id", "event_type",
                      (F.col("value").cast("decimal(18,2)") * 100)
                      .cast("bigint").alias("v")))
    med = (cents.groupBy("event_type")
           .agg(F.percentile("v", F.lit(0.5)).alias("med")))
    dev = (cents.join(F.broadcast(med), "event_type")
           .withColumn("adev", F.abs(F.col("v") - F.col("med"))))
    mad = (dev.groupBy("event_type")
           .agg(F.percentile("adev", F.lit(0.5)).alias("mad")))
    return (dev.join(F.broadcast(mad), "event_type")
            .filter(F.col("adev") > F.lit(MAD_K) * F.col("mad"))
            .select("event_id", "event_type",
                    F.col("v").alias("value_cents"),
                    F.col("med").alias("median_cents"),
                    F.col("mad").alias("mad_cents")))


SQL_MAD_OUTLIERS = f"""
WITH cents AS (SELECT event_id, event_type,
                      CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                        AS v
               FROM events),
med AS (SELECT event_type, median(v) AS med FROM cents
        GROUP BY event_type),
dev AS (SELECT c.event_id, c.event_type, c.v, m.med,
               ABS(c.v - m.med) AS adev
        FROM cents c JOIN med m USING (event_type)),
mad AS (SELECT event_type, median(adev) AS mad FROM dev
        GROUP BY event_type)
SELECT d.event_id, d.event_type, d.v AS value_cents,
       d.med AS median_cents, a.mad AS mad_cents
FROM dev d JOIN mad a USING (event_type)
WHERE d.adev > {MAD_K} * a.mad
"""

QUERIES_EXT5: dict[str, dict] = {
    "llm_jaccard_prefix": {"fn": q_jaccard_prefix,
                           "sql": SQL_JACCARD_PREFIX},
    "cms_topk":           {"fn": q_cms_topk, "sql": SQL_CMS_TOPK},
    "kmv_set_ops":        {"fn": q_kmv_set_ops,
                           "sql": SQL_KMV_SET_OPS},
    "funnel_steps":       {"fn": q_funnel_steps,
                           "sql": SQL_FUNNEL_STEPS},
    "mad_outliers":       {"fn": q_mad_outliers,
                           "sql": SQL_MAD_OUTLIERS},
}
