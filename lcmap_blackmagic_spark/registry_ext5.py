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
    tests/test_ext5.py asserts no cartesian product appears.

    Uses the STAGED form (llm/dedup.py:prefix_jaccard_pairs_staged):
    the ranked-gram aggregate has three consumers, and materializing
    it once is 2.5× faster end to end (the minhash-pipeline
    lesson)."""
    from .llm.dedup import prefix_jaccard_pairs_staged
    from .registry import _staging
    d = _t(spark, sf_dir, "documents")
    return prefix_jaccard_pairs_staged(d, _staging(sf_dir, "prefix_ranked"),
                                       n=2, t_num=1, t_den=2)


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

# ------------------------------------------- multimodal analysis ----


def q_mm_phash_pairs(spark, sf_dir):
    """Image near-duplicate pairs by perceptual hash: decode (fake
    deterministic decoder — the real codecs swap in via decoder=) →
    32×32 DCT pHash in one Arrow pass → byte-block pigeonhole
    banding → exact hamming on candidates, all JVM-side.  FULL
    oracle since round 12: the DCT is SCALED-INTEGER
    (multimodal.PHASH_DCT_SCALE — basis rounded to 1/2^16, raster
    quantized to 1/16 grey levels, median as the exact 32nd order
    statistic), so DuckDB replays the hash bit-for-bit from the same
    rounded basis embedded as literals, INCLUDING the banding
    candidate step (radius 10 > the pigeonhole-complete 7, so the
    oracle must replicate the shares-a-byte-block condition, not
    compute all-pairs)."""
    from .llm.multimodal import attach_payloads, phash_images, phash_pairs
    from .registry import _staging
    docs = _t(spark, sf_dir, "documents")
    media = attach_payloads(docs)
    # the banding self-join consumes the hash table twice; staging the
    # (media_id, phash) rows runs the Python DCT pass ONCE (the
    # minhash/prefix staging lesson — measured 4.1 s → ~2 s at sf0.1)
    staging = _staging(sf_dir, "phash")
    phash_images(media).write.mode("overwrite").parquet(staging)
    hashes = spark.read.parquet(staging)
    return (phash_pairs(hashes, max_hamming=10)
            .orderBy("id_a", "id_b"))


def q_mm_audio_features(spark, sf_dir):
    """Clip-level audio descriptors (RMS / zero-crossing rate /
    spectral centroid / rolloff) over opaque payloads — rows-only
    (numpy rFFT: transcendental twiddles + pairwise float summation
    no SQL engine replays); the sine-wave golden test pins the DSP
    math against closed-form expectations, and since round 12 the
    ORACLE-CHECKED twin ``mm_audio_descriptors_bp``
    (registry_ext17) pins the same descriptor family bit-exactly via
    a scaled-integer DFT."""
    from .llm.multimodal import attach_payloads, audio_features
    docs = _t(spark, sf_dir, "documents")
    media = attach_payloads(docs.filter(F.col("doc_id") < 200))
    return audio_features(media)




# ------------------------------------------- triangle counting ------

TRI_TOPK = 10


def q_triangle_count(spark, sf_dir):
    """Top-10 users by triangle participation in the behavioral
    interaction graph (same lead-window edge derivation as
    ``pagerank`` — operators/graph.py:triangle_counts). The a<b<c
    enumeration join materializes each triangle once; everything is
    integer, so the check is hash-exact."""
    from .operators.graph import behavioral_edges, triangle_counts
    e = _t(spark, sf_dir, "events")
    # day-rekeyed lead with boundary stitch — identical pair set to
    # the naive whole-type window (operators/graph.behavioral_edges)
    edges = behavioral_edges(e).select("src", "dst")
    return (triangle_counts(edges)
            .orderBy(F.desc("triangles"), "node")
            .limit(TRI_TOPK))


SQL_TRIANGLE_COUNT = f"""
WITH seq AS (
  SELECT user_id,
         LEAD(user_id) OVER (PARTITION BY event_type
                             ORDER BY ts, event_id) AS nxt
  FROM events),
e AS (SELECT DISTINCT LEAST(user_id, nxt) AS a,
                      GREATEST(user_id, nxt) AS b
      FROM seq WHERE nxt IS NOT NULL AND nxt <> user_id
                 AND LEAST(user_id, nxt) <> GREATEST(user_id, nxt)),
tri AS (SELECT ab.a AS ta, ab.b AS tb, bc.b AS tc
        FROM e ab JOIN e bc ON ab.b = bc.a
                  JOIN e ac ON ac.a = ab.a AND ac.b = bc.b),
corners AS (SELECT ta AS node FROM tri UNION ALL
            SELECT tb FROM tri UNION ALL SELECT tc FROM tri)
SELECT node, CAST(COUNT(*) AS BIGINT) AS triangles
FROM corners GROUP BY node
ORDER BY triangles DESC, node LIMIT {TRI_TOPK}
"""

# ------------------------------------------- market basket ----------

BASKET_TOPK = 20


def q_item_cooccurrence(spark, sf_dir):
    """Market-basket pair analysis over orders: the top-20 part
    pairs by co-occurrence count, with support counts and LIFT
    (n·c_ab / (c_a·c_b)). The self-join runs on the order key — pair
    fan-out is bounded by basket size (TPC-H ≤ 7 lines), never the
    catalog; item marginals broadcast back onto the reduced pair
    aggregate. Lift divides exact bigint counts cast to double — one
    deterministic IEEE op per side, no rounding."""
    l = _t(spark, sf_dir, "lineitem")
    # localCheckpoint: the distinct basket table feeds FOUR consumers
    # (both self-join sides, the marginals, the order count) — one
    # distinct shuffle instead of per-consumer re-execution.  Lazy
    # (r15): all four sit inside the single final action
    items = (l.select("l_orderkey", "l_partkey").distinct()
             .localCheckpoint(eager=False))
    n_orders = items.select("l_orderkey").distinct() \
        .agg(F.count(F.lit(1)).alias("n"))
    a = items.select("l_orderkey", F.col("l_partkey").alias("pk_a"))
    b = items.select("l_orderkey", F.col("l_partkey").alias("pk_b"))
    pairs = (a.join(b, "l_orderkey")
             .filter(F.col("pk_a") < F.col("pk_b"))
             .groupBy("pk_a", "pk_b")
             .agg(F.count(F.lit(1)).alias("c_ab")))
    marg = items.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("c"))
    return (pairs
            .join(F.broadcast(marg.withColumnsRenamed(
                {"l_partkey": "pk_a", "c": "c_a"})), "pk_a")
            .join(F.broadcast(marg.withColumnsRenamed(
                {"l_partkey": "pk_b", "c": "c_b"})), "pk_b")
            .crossJoin(F.broadcast(n_orders))
            .select("pk_a", "pk_b", "c_ab", "c_a", "c_b",
                    ((F.col("c_ab") * F.col("n")).cast("double")
                     / (F.col("c_a") * F.col("c_b")).cast("double"))
                    .alias("lift"))
            .orderBy(F.desc("c_ab"), "pk_a", "pk_b")
            .limit(BASKET_TOPK))


SQL_ITEM_COOCCURRENCE = f"""
WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
n AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n FROM items),
pairs AS (SELECT a.l_partkey AS pk_a, b.l_partkey AS pk_b,
                 CAST(COUNT(*) AS BIGINT) AS c_ab
          FROM items a JOIN items b ON a.l_orderkey = b.l_orderkey
                                   AND a.l_partkey < b.l_partkey
          GROUP BY 1, 2),
marg AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS c FROM items
         GROUP BY 1)
SELECT pk_a, pk_b, c_ab, ma.c AS c_a, mb.c AS c_b,
       CAST(c_ab * n.n AS DOUBLE) / CAST(ma.c * mb.c AS DOUBLE) AS lift
FROM pairs JOIN marg ma ON pairs.pk_a = ma.l_partkey
           JOIN marg mb ON pairs.pk_b = mb.l_partkey
           CROSS JOIN n
ORDER BY c_ab DESC, pk_a, pk_b LIMIT {BASKET_TOPK}
"""

# ------------------------------------------- chi-square A/B ---------


def q_chi2_abtest(spark, sf_dir):
    """Two-proportion A/B analysis in the closed chi-square form:
    variant = user_id parity (a deterministic assignment), conversion
    = the user made a purchase above 150 (nearly every user has SOME
    purchase, so the raw event would make conversion degenerate).
    χ² = n(ad−bc)²/((a+b)(c+d)(a+c)(b+d)) needs no transcendentals —
    the contingency counts are two tiny aggregates, and the statistic
    is computed in doubles cast from exact bigints with a pinned op
    order (identical IEEE results in both engines; at 10⁹-user scale
    the intermediate products overflow bigint, which is why the
    arithmetic is double). A degenerate margin yields NULL, not a
    divide-by-zero, identically on both sides."""
    e = _t(spark, sf_dir, "events")
    users = e.select("user_id").distinct() \
        .withColumn("variant", (F.col("user_id") % 2 == 0))
    conv = (e.filter((F.col("event_type") == "purchase")
                     & (F.col("value") >= 150.0))
            .select("user_id").distinct()
            .withColumn("converted", F.lit(True)))
    cells = (users.join(conv.select("user_id", "converted"),
                        "user_id", "left")
             .select("variant",
                     F.coalesce("converted", F.lit(False))
                     .alias("converted"))
             .groupBy()
             .agg(*[F.sum(F.when((F.col("variant") == va)
                                 & (F.col("converted") == co), 1)
                          .otherwise(0)).alias(nm)
                    for nm, va, co in (("a", True, True),
                                       ("b", True, False),
                                       ("c", False, True),
                                       ("d", False, False))]))
    A, B, C, D = [F.col(x).cast("double") for x in "abcd"]
    n = A + B + C + D
    num = n * (A * D - B * C) * (A * D - B * C)
    den = (A + B) * (C + D) * (A + C) * (B + D)
    return cells.select("a", "b", "c", "d",
                        F.when(den != 0, num / den).alias("chi2"))


SQL_CHI2_ABTEST = """
WITH users AS (SELECT DISTINCT user_id, user_id % 2 = 0 AS variant
               FROM events),
conv AS (SELECT DISTINCT user_id, TRUE AS converted FROM events
         WHERE event_type = 'purchase' AND value >= 150.0),
cells AS (
  SELECT CAST(SUM(CASE WHEN variant AND COALESCE(converted, FALSE)
                  THEN 1 ELSE 0 END) AS BIGINT) AS a,
         CAST(SUM(CASE WHEN variant AND NOT COALESCE(converted, FALSE)
                  THEN 1 ELSE 0 END) AS BIGINT) AS b,
         CAST(SUM(CASE WHEN NOT variant AND COALESCE(converted, FALSE)
                  THEN 1 ELSE 0 END) AS BIGINT) AS c,
         CAST(SUM(CASE WHEN NOT variant AND NOT COALESCE(converted, FALSE)
                  THEN 1 ELSE 0 END) AS BIGINT) AS d
  FROM users LEFT JOIN conv USING (user_id))
SELECT a, b, c, d,
       CASE WHEN (CAST(a AS DOUBLE) + CAST(b AS DOUBLE))
               * (CAST(c AS DOUBLE) + CAST(d AS DOUBLE))
               * (CAST(a AS DOUBLE) + CAST(c AS DOUBLE))
               * (CAST(b AS DOUBLE) + CAST(d AS DOUBLE)) = 0 THEN NULL
       ELSE
       ((CAST(a AS DOUBLE) + CAST(b AS DOUBLE) + CAST(c AS DOUBLE)
         + CAST(d AS DOUBLE))
        * (CAST(a AS DOUBLE) * CAST(d AS DOUBLE)
           - CAST(b AS DOUBLE) * CAST(c AS DOUBLE))
        * (CAST(a AS DOUBLE) * CAST(d AS DOUBLE)
           - CAST(b AS DOUBLE) * CAST(c AS DOUBLE)))
       / ((CAST(a AS DOUBLE) + CAST(b AS DOUBLE))
          * (CAST(c AS DOUBLE) + CAST(d AS DOUBLE))
          * (CAST(a AS DOUBLE) + CAST(c AS DOUBLE))
          * (CAST(b AS DOUBLE) + CAST(d AS DOUBLE)))
       END AS chi2
FROM cells
"""

# ------------------------------------------- data profiling ---------

PROFILE_COLS = ["o_orderkey", "o_custkey", "o_totalprice",
                "o_orderdate", "o_orderpriority"]


def q_profile_table(spark, sf_dir):
    """One-pass table profiler over orders: per column, row/null/
    distinct counts and min/max (stringified — one schema for every
    type). ONE aggregate computes all columns' stats (Catalyst plans
    multi-distinct via Expand — a single scan), then `stack` unpivots
    to (column, metric…) rows. At 100 TB swap the exact distinct for
    the HLL sketch twin (`hll_sketch`); everything else is the same
    one-pass shape.  The profiled columns are ``_spread`` before the
    aggregate: the multi-distinct Expand (×|cols|) otherwise runs
    entirely inside a single-task bench scan; at production split
    counts the spread is a no-op."""
    from .llm.dedup import _spread
    o = _spread(_t(spark, sf_dir, "orders").select(*PROFILE_COLS))
    aggs = []
    for c in PROFILE_COLS:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .alias(f"{c}__nulls"),
            F.count_distinct(F.col(c)).alias(f"{c}__distinct"),
            F.min(F.col(c).cast("string")).alias(f"{c}__min"),
            F.max(F.col(c).cast("string")).alias(f"{c}__max"),
        ]
    wide = o.agg(*aggs)
    stack = ", ".join(
        f"'{c}', {c}__n, {c}__nulls, {c}__distinct, {c}__min, {c}__max"
        for c in PROFILE_COLS)
    return wide.select(F.expr(
        f"stack({len(PROFILE_COLS)}, {stack}) AS "
        "(column_name, n_rows, n_nulls, n_distinct, min_str, max_str)"))


def _sql_profile_table() -> str:
    parts = [f"""
SELECT '{c}' AS column_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_nulls,
       CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
       MIN(CAST({c} AS VARCHAR)) AS min_str,
       MAX(CAST({c} AS VARCHAR)) AS max_str
FROM orders""" for c in PROFILE_COLS]
    return "\nUNION ALL\n".join(parts)


# ------------------------------------------- incremental view maint -


def q_ivm_agg(spark, sf_dir):
    """Incremental maintenance of the per-status (count, total)
    rollup under the SAME U/D/I change set as ``merge_upsert`` — and
    checked against the SAME oracle: re-aggregating the fully merged
    table must equal base aggregate + change-derived delta
    (operators/merge.py:incremental_agg_update). The incremental path
    touches only the change rows, the touched base keys, and the tiny
    aggregate table — never re-scans the merged facts."""
    from .operators.merge import incremental_agg_update
    from .registry_ext4 import _order_changes
    o = (_t(spark, sf_dir, "orders")
         .select("o_orderkey", "o_orderstatus",
                 F.col("o_totalprice").cast("decimal(18,2)")
                 .alias("price")))
    base_agg = (o.groupBy("o_orderstatus")
                .agg(F.count(F.lit(1)).alias("n_orders"),
                     F.sum("price").alias("total_dec")))
    out = incremental_agg_update(o, base_agg, _order_changes(o),
                                 "o_orderkey", "o_orderstatus",
                                 "price")
    return out.select("o_orderstatus", "n_orders",
                      F.col("total_dec").cast("double")
                      .alias("total_price"))


def _sql_ivm_agg() -> str:
    from .registry_ext4 import SQL_MERGE_UPSERT
    return SQL_MERGE_UPSERT


def _sql_mm_phash_pairs() -> str:
    """DuckDB replay of the ENTIRE pHash pipeline: sha256 pseudo-
    raster (fake_decoder: 16×16 of digest-byte values, raster cell
    (y,x) = byte (16·(y%2)+x)), exact 2× upsample to 32×32, the
    scaled-integer 2-D DCT with the SAME rounded basis phash64 uses
    (embedded below as 1024 literals), the 8×8 block / 32nd-order-
    statistic median / sign bits, then the byte-block pigeonhole
    banding and exact hamming ≤ 10 — false negatives of the banding
    included, because the oracle replays the banding, not all-pairs.
    HUGEINT carries the unsigned hash; the signed two's-complement
    BIGINT is what both engines emit."""
    from .llm.multimodal import _dctn_matrix_int
    dlist = ",".join(str(int(x)) for x in _dctn_matrix_int(32).ravel())
    return f"""
WITH dm AS (
  SELECT (k // 32) AS u, (k % 32) AS i, d[k + 1] AS c
  FROM (SELECT [{dlist}] AS d), generate_series(0, 1023) t(k)),
b AS (
  SELECT doc_id AS media_id, sha256(text) AS hx
  FROM documents WHERE doc_id % 3 <> 1),
pix AS (
  SELECT media_id, i.i AS i, j.j AS j,
         CAST('0x' || substr(hx,
              2 * ((16 * ((i.i // 2) % 2) + (j.j // 2)) % 32) + 1, 2)
              AS BIGINT) * 16 AS v
  FROM b, generate_series(0, 31) i(i), generate_series(0, 31) j(j)),
t1 AS (
  SELECT p.media_id, dm.u, p.j, SUM(dm.c * p.v) AS s
  FROM pix p JOIN dm ON dm.i = p.i WHERE dm.u < 8
  GROUP BY p.media_id, dm.u, p.j),
t2 AS (
  SELECT t1.media_id, t1.u, dm.u AS w, SUM(t1.s * dm.c) AS s
  FROM t1 JOIN dm ON dm.i = t1.j WHERE dm.u < 8
  GROUP BY t1.media_id, t1.u, dm.u),
blk AS (SELECT media_id, u * 8 + w AS idx, s FROM t2),
med AS (
  SELECT media_id, s AS med FROM (
    SELECT media_id, s,
           ROW_NUMBER() OVER (PARTITION BY media_id ORDER BY s) AS rn
    FROM blk WHERE idx > 0) WHERE rn = 32),
h AS (
  SELECT blk.media_id,
         SUM(CASE WHEN blk.s > med.med
             THEN CAST(1 AS HUGEINT) << (63 - blk.idx)
             ELSE CAST(0 AS HUGEINT) END) AS ub
  FROM blk JOIN med USING (media_id) GROUP BY blk.media_id),
hh AS (
  SELECT media_id, ub,
         CAST(CASE WHEN ub >= CAST(1 AS HUGEINT) << 63
              THEN ub - (CAST(1 AS HUGEINT) << 64)
              ELSE ub END AS BIGINT) AS phash
  FROM h),
blocks AS (
  SELECT media_id, phash, bb.b AS blk,
         CAST((ub >> (8 * bb.b)) & 255 AS BIGINT) AS v
  FROM hh, generate_series(0, 7) bb(b)),
cand AS (
  SELECT DISTINCT a.media_id AS id_a, b2.media_id AS id_b,
         a.phash AS ha, b2.phash AS hb
  FROM blocks a JOIN blocks b2 ON a.blk = b2.blk AND a.v = b2.v
  WHERE a.media_id < b2.media_id)
SELECT id_a, id_b, CAST(bit_count(xor(ha, hb)) AS INT) AS hamming
FROM cand WHERE bit_count(xor(ha, hb)) <= 10
ORDER BY id_a, id_b
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
    "mm_phash_pairs":     {"fn": q_mm_phash_pairs,
                           "sql": _sql_mm_phash_pairs()},
    "mm_audio_features":  {"fn": q_mm_audio_features,  "sql": None},
    "triangle_count":     {"fn": q_triangle_count,
                           "sql": SQL_TRIANGLE_COUNT},
    "item_cooccurrence":  {"fn": q_item_cooccurrence,
                           "sql": SQL_ITEM_COOCCURRENCE},
    "chi2_abtest":        {"fn": q_chi2_abtest,  "sql": SQL_CHI2_ABTEST},
    "profile_table":      {"fn": q_profile_table,
                           "sql": _sql_profile_table()},
    "ivm_agg":            {"fn": q_ivm_agg, "sql": _sql_ivm_agg()},
}
