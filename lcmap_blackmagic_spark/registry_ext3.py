"""Fourth extension wave — reshaping, time-series, analytics, and
data-engineering shapes: unpivot, struct assembly/disassembly,
time-grid gap fill with forward fill, hashing-trick feature buckets,
repetition ratio, conversion funnel, map functions, histogram
binning, benchmark decontamination, snapshot reconciliation diff,
SCD2 interval builder, Spark 4 VARIANT extraction, cohort retention,
and event transition counts.

Same determinism contract as the rest of the registry: money/value
sums in DECIMAL with one final double cast, hash buckets via md5
digest slices (identical hex in both engines), every collected list
sorted by a unique key before use.  Events-table time bucketing is
epoch-day/epoch-micros arithmetic, never session-timezone-dependent
string casts or date_trunc (two live TZ bugs found by the
America/Chicago verify probe — see the verify skill's gotchas).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .registry import _t

# ------------------------------------------------------- unpivot ---


def q_unpivot(spark, sf_dir):
    """Wide→long reshaping: the four lineitem measures melt into
    (metric, val) rows — Spark's ``unpivot`` (Expand node: one pass,
    4 output rows per input, no shuffle at all)."""
    l = (_t(spark, sf_dir, "lineitem")
         .filter(F.col("l_linenumber") == 1)
         .select("l_orderkey", "l_quantity", "l_extendedprice",
                 "l_discount", "l_tax"))
    return l.unpivot(
        "l_orderkey",
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "metric", "val")


SQL_UNPIVOT = """
UNPIVOT (SELECT l_orderkey, l_quantity, l_extendedprice, l_discount, l_tax
         FROM lineitem WHERE l_linenumber = 1)
ON l_quantity, l_extendedprice, l_discount, l_tax
INTO NAME metric VALUE val
"""


# -------------------------------------------------- struct family --


def q_struct_funcs(spark, sf_dir):
    """Struct assembly → ordered collect → explode back: lineitems
    roll up into a per-order array<struct<ln,qty>> (sorted by line
    number — collect_list alone is order-nondeterministic) and then
    flatten back out.  One shuffle (the groupBy); the explode is a
    Generate node, no further exchange."""
    l = _t(spark, sf_dir, "lineitem")
    per_order = (
        l.groupBy("l_orderkey")
         .agg(F.sort_array(F.collect_list(F.struct(
              F.col("l_linenumber").alias("ln"),
              F.col("l_quantity").alias("qty")))).alias("items")))
    ex = per_order.select(
        "l_orderkey",
        F.size("items").alias("n_items"),
        F.explode("items").alias("it"))
    return ex.select("l_orderkey", "n_items",
                     F.col("it.ln").alias("ln"),
                     F.col("it.qty").alias("qty"))


SQL_STRUCT_FUNCS = """
WITH per_order AS (
  SELECT l_orderkey,
         list_sort(list(struct_pack(ln := l_linenumber,
                                    qty := l_quantity))) AS items
  FROM lineitem GROUP BY l_orderkey)
SELECT l_orderkey, CAST(len(items) AS INT) AS n_items,
       u.it.ln AS ln, u.it.qty AS qty
FROM per_order, UNNEST(items) AS u(it)
"""


# ------------------------------------------------------ gap fill ---


def _hourly_purchase_grid(spark, sf_dir):
    """Shared assembly for the regular-grid time-series queries
    (gap_fill, interpolate): hourly purchase totals per user LEFT-
    joined onto an explicit hour grid from each user's first to last
    active hour (``sequence`` + explode — generated distributed,
    never on the driver). One shuffle for the rollup; the grid
    explode reuses the per-user partitioning.

    Window bounds as epoch micros, NOT string literals: a string cast
    to timestamp parses in the SESSION timezone, silently shifting
    the window on any non-UTC session (caught by the America/Chicago
    verify probe); epoch micros pin the instants."""
    t_lo = F.timestamp_micros(F.lit(1704067200000000))  # 2024-01-01T00Z
    t_hi = F.timestamp_micros(F.lit(1704240000000000))  # 2024-01-03T00Z
    e = (_t(spark, sf_dir, "events")
         .filter((F.col("event_type") == "purchase")
                 & (F.col("ts") >= t_lo) & (F.col("ts") < t_hi)))
    hourly = (e.groupBy("user_id", F.date_trunc("hour", "ts").alias("h"))
               .agg(F.sum(F.col("value").cast("decimal(18,2)"))
                     .cast("double").alias("v")))
    bounds = hourly.groupBy("user_id").agg(F.min("h").alias("h0"),
                                           F.max("h").alias("h1"))
    grid = bounds.select(
        "user_id",
        F.explode(F.sequence("h0", "h1", F.expr("interval 1 hour"))).alias("h"))
    return grid.join(hourly, ["user_id", "h"], "left")


# the matching DuckDB CTE prefix, shared by both oracles
_SQL_HOURLY_GRID = """
WITH hourly AS (
  SELECT user_id, date_trunc('hour', ts) AS h,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
  FROM events
  WHERE event_type = 'purchase'
    AND ts >= TIMESTAMP '2024-01-01 00:00:00'
    AND ts <  TIMESTAMP '2024-01-03 00:00:00'
  GROUP BY user_id, date_trunc('hour', ts)),
bounds AS (
  SELECT user_id, MIN(h) AS h0, MAX(h) AS h1 FROM hourly GROUP BY user_id),
grid AS (
  SELECT user_id, UNNEST(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
  FROM bounds)"""


def q_gap_fill(spark, sf_dir):
    """Time-series gap fill over the shared hourly grid: missing
    hours forward-filled with ``last(..., ignorenulls)`` per user (no
    unpartitioned window). The classic prep step for regularly-
    sampled model inputs."""
    joined = _hourly_purchase_grid(spark, sf_dir)
    w = (Window.partitionBy("user_id").orderBy("h")
               .rowsBetween(Window.unboundedPreceding, 0))
    return joined.select(
        "user_id", "h",
        F.last("v", ignorenulls=True).over(w).alias("v_filled"),
        F.col("v").isNull().alias("was_gap"))


SQL_GAP_FILL = _SQL_HOURLY_GRID + """
SELECT g.user_id, g.h,
       last_value(hr.v IGNORE NULLS)
         OVER (PARTITION BY g.user_id ORDER BY g.h
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled,
       hr.v IS NULL AS was_gap
FROM grid g LEFT JOIN hourly hr ON g.user_id = hr.user_id AND g.h = hr.h
"""


def q_interpolate(spark, sf_dir):
    """Linear-interpolation resampling: gap_fill's regular hourly grid,
    but missing hours take the LINE between the surrounding
    observations instead of carrying the last one forward (edges clamp
    to the nearest observation). Two per-user windows (running last /
    running first, both ignore-nulls) — no self-join, no UDF. The
    interpolation touches exactly two observed values per output row,
    so the float expression is a fixed-size formula both engines
    evaluate identically — no summation-order divergence, no rounding
    needed."""
    j = _hourly_purchase_grid(spark, sf_dir)
    t = F.unix_micros(F.col("h"))
    te = F.when(F.col("v").isNotNull(), t)
    wp = (Window.partitionBy("user_id").orderBy("h")
                .rowsBetween(Window.unboundedPreceding, 0))
    wn = (Window.partitionBy("user_id").orderBy("h")
                .rowsBetween(0, Window.unboundedFollowing))
    vp = F.last("v", ignorenulls=True).over(wp)
    tp = F.last(te, ignorenulls=True).over(wp)
    vn = F.first("v", ignorenulls=True).over(wn)
    tn = F.first(te, ignorenulls=True).over(wn)
    interp = (F.when(F.col("v").isNotNull(), F.col("v"))
              .when(vp.isNull(), vn)
              .when(vn.isNull(), vp)
              .otherwise(vp + (vn - vp) * ((t - tp) / (tn - tp))))
    return j.select("user_id", "h", interp.alias("v_interp"),
                    F.col("v").isNull().alias("was_gap"))


SQL_INTERPOLATE = _SQL_HOURLY_GRID + """,
w AS (
  SELECT g.user_id, g.h, hr.v, epoch_us(g.h) AS t,
         last_value(hr.v IGNORE NULLS)
           OVER (PARTITION BY g.user_id ORDER BY g.h
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS vp,
         last_value(CASE WHEN hr.v IS NOT NULL THEN epoch_us(g.h) END
                    IGNORE NULLS)
           OVER (PARTITION BY g.user_id ORDER BY g.h
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tp,
         first_value(hr.v IGNORE NULLS)
           OVER (PARTITION BY g.user_id ORDER BY g.h
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS vn,
         first_value(CASE WHEN hr.v IS NOT NULL THEN epoch_us(g.h) END
                     IGNORE NULLS)
           OVER (PARTITION BY g.user_id ORDER BY g.h
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS tn
  FROM grid g LEFT JOIN hourly hr ON g.user_id = hr.user_id AND g.h = hr.h)
SELECT user_id, h,
       CASE WHEN v IS NOT NULL THEN v
            WHEN vp IS NULL THEN vn
            WHEN vn IS NULL THEN vp
            ELSE vp + (vn - vp) * ((t - tp) / (tn - tp)) END AS v_interp,
       v IS NULL AS was_gap
FROM w
"""


def q_rolling_corr(spark, sf_dir):
    """Trailing-window Pearson correlation per customer between order
    value and order date — windowed statistics done DETERMINISTICALLY:
    the built-in ``corr`` accumulates co-moments in floats (summation
    order diverges across engines), so the sums here are exact
    integers (epoch days × money in cents) over a 10-row trailing
    window, combined closed-form with one double conversion per term —
    the same bit-exact recipe as the segment-detect OLS. Zero-variance
    windows yield NULL."""
    o = _t(spark, sf_dir, "orders")
    base = o.select(
        "o_custkey", "o_orderkey",
        F.datediff(F.to_date("o_orderdate"),
                   F.lit("1970-01-01").cast("date"))
        .cast("bigint").alias("x"),
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint").alias("y"))
    w = (Window.partitionBy("o_custkey").orderBy("x", "o_orderkey")
               .rowsBetween(-9, 0))
    n = F.count(F.lit(1)).over(w)
    sx = F.sum("x").over(w)
    sy = F.sum("y").over(w)
    sxx = F.sum(F.col("x") * F.col("x")).over(w)
    syy = F.sum(F.col("y") * F.col("y")).over(w)
    sxy = F.sum(F.col("x") * F.col("y")).over(w)
    num = (n * sxy - sx * sy).cast("double")
    d1 = n * sxx - sx * sx
    d2 = n * syy - sy * sy
    corr = F.when((d1 > 0) & (d2 > 0),
                  F.round(num / (F.sqrt(d1.cast("double"))
                                 * F.sqrt(d2.cast("double"))), 6))
    return base.select("o_custkey", "o_orderkey",
                       n.alias("n_win"), corr.alias("corr_10"))


SQL_ROLLING_CORR = """
WITH base AS (
  SELECT o_custkey, o_orderkey,
         CAST(date_diff('day', DATE '1970-01-01',
                        CAST(o_orderdate AS DATE)) AS BIGINT) AS x,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS y
  FROM orders),
s AS (
  SELECT o_custkey, o_orderkey,
         COUNT(*) OVER w AS n,
         SUM(x) OVER w AS sx, SUM(y) OVER w AS sy,
         SUM(x*x) OVER w AS sxx, SUM(y*y) OVER w AS syy,
         SUM(x*y) OVER w AS sxy
  FROM base
  WINDOW w AS (PARTITION BY o_custkey ORDER BY x, o_orderkey
               ROWS BETWEEN 9 PRECEDING AND CURRENT ROW))
SELECT o_custkey, o_orderkey, n AS n_win,
       CASE WHEN n*sxx - sx*sx > 0 AND n*syy - sy*sy > 0
            THEN ROUND(CAST(n*sxy - sx*sy AS DOUBLE)
                       / (sqrt(CAST(n*sxx - sx*sx AS DOUBLE))
                          * sqrt(CAST(n*syy - sy*sy AS DOUBLE))), 6)
            END AS corr_10
FROM s
"""


# -------------------------------------------------- feature hash ---

N_FEATURE_BUCKETS = 256


def q_feature_hash(spark, sf_dir):
    """Hashing-trick featurization: tokens hash into a fixed bucket
    space (md5 digest slice — the repo's engine-portable hash idiom)
    and counts aggregate per (doc, bucket).  Explode → codegen hash →
    map-side partial count → one shuffle on (doc_id, bucket); the
    fixed bucket space is what keeps the feature matrix bounded at
    corpus scale."""
    d = _t(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim("text")), " ")).alias("tok"))
    bucket = (F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10)
              .cast("long") % N_FEATURE_BUCKETS)
    return (tok.select("doc_id", bucket.alias("bucket"))
               .groupBy("doc_id", "bucket")
               .agg(F.count(F.lit(1)).alias("cnt")))


SQL_FEATURE_HASH = f"""
SELECT doc_id,
       CAST(('0x' || substr(md5(tok), 1, 8))::UBIGINT
            % {N_FEATURE_BUCKETS} AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS cnt
FROM (SELECT doc_id, UNNEST(string_split(lower(trim(text)), ' ')) AS tok
      FROM documents) t
GROUP BY doc_id, CAST(('0x' || substr(md5(tok), 1, 8))::UBIGINT
                      % {N_FEATURE_BUCKETS} AS BIGINT)
"""


# ------------------------------------------- repetition ratio ------


def q_repetition(spark, sf_dir):
    """Corpus-quality repetition signal (the Gopher-style duplicate
    n-gram fraction): per document, the share of word 3-grams that
    are repeats, plus the count of the most-repeated gram.

    Grams come from posexplode + two ``lead`` windows (codegen
    projections around one per-doc sort) — NOT an interpreted
    ``transform`` HOF, per the house rule for hot text paths.  All
    three aggregation steps key on doc_id, so every shuffle carries
    the same partitioning and the heavy strings reduce map-side."""
    d = _t(spark, sf_dir, "documents")
    words = d.select(
        "doc_id",
        F.posexplode(F.split(F.lower(F.trim("text")), " "))
         .alias("pos", "w"))
    win = Window.partitionBy("doc_id").orderBy("pos")
    grams = (words
             .withColumn("w1", F.lead("w", 1).over(win))
             .withColumn("w2", F.lead("w", 2).over(win))
             .filter(F.col("w2").isNotNull())
             .select("doc_id",
                     F.concat_ws(" ", "w", "w1", "w2").alias("g")))
    gram_counts = grams.groupBy("doc_id", "g").agg(
        F.count(F.lit(1)).alias("c"))
    return (gram_counts.groupBy("doc_id")
            .agg(F.sum("c").alias("n_grams"),
                 F.count(F.lit(1)).alias("n_distinct"),
                 F.round(F.lit(1.0)
                         - F.count(F.lit(1)) / F.sum("c"), 6)
                  .alias("rep_ratio"),
                 F.max("c").alias("max_rep")))


SQL_REPETITION = """
WITH grams AS (
  SELECT doc_id,
         UNNEST(list_transform(generate_series(1, len(ws) - 2),
                i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS g
  FROM (SELECT doc_id, string_split(lower(trim(text)), ' ') AS ws
        FROM documents) t),
gc AS (SELECT doc_id, g, COUNT(*) AS c FROM grams GROUP BY doc_id, g)
SELECT doc_id,
       CAST(SUM(c) AS BIGINT)   AS n_grams,
       CAST(COUNT(*) AS BIGINT) AS n_distinct,
       ROUND(1.0 - COUNT(*) * 1.0 / SUM(c), 6) AS rep_ratio,
       CAST(MAX(c) AS BIGINT)   AS max_rep
FROM gc GROUP BY doc_id
"""


# --------------------------------------------------------- funnel ---


def q_funnel(spark, sf_dir):
    """Ordered event-sequence funnel: users who viewed, then clicked
    within 12 h of the first view, then purchased within 12 h of that
    click — each stage anchored to the previous stage's time.  Each
    stage is a conditional min-timestamp aggregate joined back on
    user_id — three shuffles all on the same key (co-partitioned, so
    AQE reuses the exchange), never a per-user sort of the whole
    event stream."""
    ev = _t(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    t1 = (ev.filter(F.col("event_type") == "view")
            .groupBy("user_id").agg(F.min("ts").alias("t1")))
    t2 = (ev.filter(F.col("event_type") == "click")
            .join(t1, "user_id")
            .filter((F.col("ts") > F.col("t1"))
                    & (F.col("ts") <= F.col("t1")
                       + F.expr("interval 12 hours")))
            .groupBy("user_id").agg(F.min("ts").alias("t2")))
    t3 = (ev.filter(F.col("event_type") == "purchase")
            .join(t2, "user_id")
            .filter((F.col("ts") > F.col("t2"))
                    & (F.col("ts") <= F.col("t2")
                       + F.expr("interval 12 hours")))
            .groupBy("user_id").agg(F.min("ts").alias("t3")))
    return (t1.join(t2, "user_id", "left").join(t3, "user_id", "left")
              .agg(F.count("t1").alias("n_view"),
                   F.count("t2").alias("n_click_after_view"),
                   F.count("t3").alias("n_purchase_after_click")))


SQL_FUNNEL = """
WITH t1 AS (
  SELECT user_id, MIN(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id),
t2 AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN t1 ON e.user_id = t1.user_id
  WHERE e.event_type = 'click' AND e.ts > t1.t1
    AND e.ts <= t1.t1 + INTERVAL 12 HOUR
  GROUP BY e.user_id),
t3 AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN t2 ON e.user_id = t2.user_id
  WHERE e.event_type = 'purchase' AND e.ts > t2.t2
    AND e.ts <= t2.t2 + INTERVAL 12 HOUR
  GROUP BY e.user_id)
SELECT CAST(COUNT(t1.t1) AS BIGINT) AS n_view,
       CAST(COUNT(t2.t2) AS BIGINT) AS n_click_after_view,
       CAST(COUNT(t3.t3) AS BIGINT) AS n_purchase_after_click
FROM t1
LEFT JOIN t2 ON t1.user_id = t2.user_id
LEFT JOIN t3 ON t1.user_id = t3.user_id
"""


# ----------------------------------------------------- map family ---


def q_map_funcs(spark, sf_dir):
    """Map-type functions: construction from arrays, hit and miss
    lookups (miss → NULL), cardinality, key listing.  Output stays
    scalar — map VALUES never cross the oracle boundary, because the
    engines serialize maps differently (DuckDB renders a lookup as a
    one-element list; Spark as the element)."""
    o = _t(spark, sf_dir, "orders")
    m = F.map_from_arrays(
        F.array(F.lit("open"), F.lit("total")),
        F.array((F.col("o_orderkey") % 7).cast("double"),
                F.col("o_totalprice")))
    return o.select(
        "o_orderkey",
        F.element_at(m, "total").alias("total_v"),
        F.element_at(m, "missing").alias("missing_v"),
        F.size(m).alias("m_size"),
        F.array_join(F.map_keys(m), ",").alias("keys_csv"))


SQL_MAP_FUNCS = """
SELECT o_orderkey,
       (map(['open', 'total'],
            [CAST(o_orderkey % 7 AS DOUBLE), o_totalprice])['total'])[1]
         AS total_v,
       (map(['open', 'total'],
            [CAST(o_orderkey % 7 AS DOUBLE), o_totalprice])['missing'])[1]
         AS missing_v,
       CAST(cardinality(map(['open', 'total'],
            [CAST(o_orderkey % 7 AS DOUBLE), o_totalprice])) AS INT)
         AS m_size,
       array_to_string(map_keys(map(['open', 'total'],
            [CAST(o_orderkey % 7 AS DOUBLE), o_totalprice])), ',')
         AS keys_csv
FROM orders
"""


# ------------------------------------------------ histogram bins ----

BIN_WIDTH = 50_000


def q_histogram_bins(spark, sf_dir):
    """Equal-width numeric histogram: orders bucket by total price
    (integer floor division — identical in both engines, no float
    boundary ambiguity), count + exact decimal mass per bin.  The
    groupBy on the derived bin is one narrow shuffle of (bin) keys
    with map-side partial aggregation."""
    o = _t(spark, sf_dir, "orders")
    b = F.floor(F.col("o_totalprice") / BIN_WIDTH).cast("bigint")
    return (o.groupBy(b.alias("bin"))
             .agg(F.count(F.lit(1)).alias("n_orders"),
                  F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                   .cast("double").alias("mass"))
             .select((F.col("bin") * BIN_WIDTH).alias("bin_lo"),
                     "n_orders", "mass")
             .orderBy("bin_lo"))


SQL_HISTOGRAM_BINS = f"""
SELECT CAST(floor(o_totalprice / {BIN_WIDTH}) AS BIGINT) * {BIN_WIDTH}
         AS bin_lo,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS mass
FROM orders
GROUP BY CAST(floor(o_totalprice / {BIN_WIDTH}) AS BIGINT)
ORDER BY bin_lo
"""


# ------------------------------------------- decontamination --------


def q_decontaminate(spark, sf_dir):
    """Benchmark decontamination: flag corpus documents sharing any
    word 5-gram with the held-out set (source 'src0' plays the
    benchmark) — the standard pre-training hygiene pass.

    Scale shape: the BENCHMARK gram set is the small side (benchmark
    suites are tiny next to a corpus), so it broadcasts and the
    corpus-side grams stream through the semi-join without a shuffle;
    the only exchange is the per-doc count."""
    from .llm.dedup import shingles
    d = _t(spark, sf_dir, "documents")
    bench = (d.filter(F.col("source") == "src0")
              .select(F.explode(shingles("text", 5)).alias("g"))
              .distinct())
    corpus = (d.filter(F.col("source") != "src0")
               .select("doc_id", F.explode(shingles("text", 5)).alias("g")))
    return (corpus.join(F.broadcast(bench), "g")
                  .groupBy("doc_id")
                  .agg(F.count_distinct("g").alias("n_shared"))
                  .orderBy("doc_id"))


SQL_DECONTAMINATE = """
WITH toks AS (
  SELECT doc_id, source, string_split(lower(trim(text)), ' ') AS ws
  FROM documents),
grams AS (
  SELECT doc_id, source,
         UNNEST(list_transform(generate_series(1, len(ws) - 4),
                i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' '
                     || ws[i+3] || ' ' || ws[i+4])) AS g
  FROM toks),
bench AS (SELECT DISTINCT g FROM grams WHERE source = 'src0'),
corpus AS (SELECT doc_id, g FROM grams WHERE source <> 'src0')
SELECT doc_id, CAST(COUNT(DISTINCT corpus.g) AS BIGINT) AS n_shared
FROM corpus JOIN bench ON corpus.g = bench.g
GROUP BY doc_id
ORDER BY doc_id
"""


# ------------------------------------------------ reconciliation ----


def q_table_diff(spark, sf_dir):
    """Snapshot reconciliation: classify every key across two dataset
    versions as unchanged / changed / only-left / only-right — the
    anti-entropy check run after any backfill or migration.  The
    'right' snapshot is derived deterministically from orders (drop
    keys ≡0 mod 97, perturb totalprice for keys ≡0 mod 101) so both
    engines diff identical inputs.

    One full-outer join on the key, classification in a codegen CASE;
    the count rollup is a 4-group aggregate."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    left = o.select(F.col("o_orderkey").alias("k"),
                    F.col("o_totalprice").alias("lv"))
    right = (o.filter(F.col("o_orderkey") % 97 != 0)
              .select(F.col("o_orderkey").alias("rk"),
                      F.when(F.col("o_orderkey") % 101 == 0,
                             F.col("o_totalprice") + F.lit(1.0))
                       .otherwise(F.col("o_totalprice")).alias("rv")))
    j = left.join(right, left.k == right.rk, "full_outer")
    klass = (F.when(F.col("k").isNull(), "only_right")
              .when(F.col("rk").isNull(), "only_left")
              .when(F.col("lv") == F.col("rv"), "same")
              .otherwise("changed"))
    return (j.groupBy(klass.alias("diff_class"))
             .agg(F.count(F.lit(1)).alias("n"))
             .orderBy("diff_class"))


SQL_TABLE_DIFF = """
WITH l AS (SELECT o_orderkey AS k, o_totalprice AS lv FROM orders),
r AS (SELECT o_orderkey AS rk,
             CASE WHEN o_orderkey % 101 = 0 THEN o_totalprice + 1.0
                  ELSE o_totalprice END AS rv
      FROM orders WHERE o_orderkey % 97 <> 0)
SELECT CASE WHEN k IS NULL THEN 'only_right'
            WHEN rk IS NULL THEN 'only_left'
            WHEN lv = rv THEN 'same'
            ELSE 'changed' END AS diff_class,
       CAST(COUNT(*) AS BIGINT) AS n
FROM l FULL OUTER JOIN r ON l.k = r.rk
GROUP BY diff_class
ORDER BY diff_class
"""


# ----------------------------------------------------- SCD2 build ---


def q_scd2_intervals(spark, sf_dir):
    """Slowly-changing-dimension (type 2) builder: collapse each
    user's event-type sequence into validity intervals — a new row
    only when the type CHANGES, valid_to = next change (NULL while
    current).  Change detection is lag + conditional flag, run ids a
    running sum, interval bounds min/max per run — the sessionize
    machinery applied to dimension versioning.  All windows and the
    final group share the user_id partitioning."""
    e = _t(spark, sf_dir, "events").select("user_id", "ts", "event_id",
                                           "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = Window.partitionBy("user_id").orderBy("ts", "event_id") \
                .rowsBetween(Window.unboundedPreceding, 0)
    chg = F.when(F.lag("event_type").over(w).isNull()
                 | (F.lag("event_type").over(w) != F.col("event_type")),
                 1).otherwise(0)
    runs = e.withColumn("rid", F.sum(chg).over(run))
    iv = (runs.groupBy("user_id", "rid")
              .agg(F.first("event_type").alias("event_type"),
                   F.min("ts").alias("valid_from"),
                   F.count(F.lit(1)).alias("n_events")))
    nxt = Window.partitionBy("user_id").orderBy("rid")
    return (iv.select("user_id",
                      F.col("rid").cast("bigint").alias("version"),
                      "event_type", "valid_from",
                      F.lead("valid_from").over(nxt).alias("valid_to"),
                      "n_events"))


SQL_SCD2_INTERVALS = """
WITH flagged AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN lag(event_type) OVER w IS NULL
                OR lag(event_type) OVER w <> event_type THEN 1
              ELSE 0 END AS chg
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
runs AS (
  SELECT user_id, ts, event_type,
         CAST(SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS BIGINT) AS rid
  FROM flagged),
iv AS (
  SELECT user_id, rid, MIN(event_type) AS event_type,
         MIN(ts) AS valid_from, CAST(COUNT(*) AS BIGINT) AS n_events
  FROM runs GROUP BY user_id, rid)
SELECT user_id, rid AS version, event_type, valid_from,
       lead(valid_from) OVER (PARTITION BY user_id ORDER BY rid)
         AS valid_to,
       n_events
FROM iv
"""


# --------------------------------------------------- variant type ---


def q_variant_funcs(spark, sf_dir):
    """Spark 4 VARIANT path for semi-structured data: ``parse_json``
    into a variant value, typed extraction with ``try_variant_get``
    (missing paths → NULL, not an error).  Unlike the string-walking
    ``get_json_object`` (see ``events_json``), the variant parses
    ONCE into a binary-encoded form and every extraction reads the
    encoded tree — the right shape when many fields come out of one
    payload at corpus scale."""
    e = _t(spark, sf_dir, "events")
    v = F.parse_json("props")
    return e.select(
        "event_id",
        F.try_variant_get(v, "$.k", "int").alias("k"),
        F.try_variant_get(v, "$.missing", "int").alias("missing_k"),
        F.try_variant_get(v, "$.k", "string").alias("k_str"))


SQL_VARIANT_FUNCS = """
SELECT event_id,
       CAST(props->>'$.k' AS INTEGER) AS k,
       CAST(props->>'$.missing' AS INTEGER) AS missing_k,
       props->>'$.k' AS k_str
FROM events
"""


# ------------------------------------------------ cohort retention --


def q_cohort_retention(spark, sf_dir):
    """Cohort retention matrix: users grouped by first-activity week,
    counted as retained in each later week they act — the standard
    product-analytics triangle.  Two aggregates and one join, all
    keyed on user_id.  Week bucketing is pure epoch-day arithmetic
    (Monday-aligned: day − ((day+3) mod 7)) — ``date_trunc('week')``
    on the events timestamp would truncate in the SESSION timezone
    and shift boundary events on non-UTC sessions (caught by the
    America/Chicago verify probe); epoch days are timezone-free."""
    e = _t(spark, sf_dir, "events").select("user_id", "ts")
    day = F.floor(F.unix_micros(F.col("ts")) / F.lit(86_400_000_000))
    wk = F.date_from_unix_date(
        (day - (day + 3) % 7).cast("int"))
    acts = e.select("user_id", wk.alias("week")).distinct()
    first = acts.groupBy("user_id").agg(F.min("week").alias("cohort"))
    return (acts.join(first, "user_id")
            .select("cohort",
                    (F.datediff("week", "cohort") / 7)
                    .cast("int").alias("week_offset"))
            .groupBy("cohort", "week_offset")
            .agg(F.count(F.lit(1)).alias("n_users"))
            .orderBy("cohort", "week_offset"))


SQL_COHORT_RETENTION = """
WITH acts AS (
  SELECT DISTINCT user_id,
         DATE '1970-01-01'
           + CAST(d - ((d + 3) % 7) AS INT) AS week
  FROM (SELECT user_id,
               CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS d
        FROM events) t),
first AS (SELECT user_id, MIN(week) AS cohort FROM acts GROUP BY user_id)
SELECT cohort,
       CAST(date_diff('day', cohort, week) / 7 AS INT) AS week_offset,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM acts JOIN first USING (user_id)
GROUP BY cohort, week_offset
ORDER BY cohort, week_offset
"""


# --------------------------------------------- event transitions ----


def q_event_transitions(spark, sf_dir):
    """First-order transition counts (the Markov matrix of user
    behavior): for each consecutive event pair within a user's
    timeline, count (from_type → to_type).  One lead window per user
    + one narrow aggregate — the path-analysis primitive."""
    e = _t(spark, sf_dir, "events").select("user_id", "ts", "event_id",
                                           "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (e.withColumn("next_type", F.lead("event_type").over(w))
             .filter(F.col("next_type").isNotNull())
             .groupBy(F.col("event_type").alias("from_type"),
                      F.col("next_type").alias("to_type"))
             .agg(F.count(F.lit(1)).alias("n"))
             .orderBy("from_type", "to_type"))


SQL_EVENT_TRANSITIONS = """
WITH seq AS (
  SELECT event_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS next_type
  FROM events)
SELECT event_type AS from_type, next_type AS to_type,
       CAST(COUNT(*) AS BIGINT) AS n
FROM seq WHERE next_type IS NOT NULL
GROUP BY event_type, next_type
ORDER BY from_type, to_type
"""


def q_record_linkage(spark, sf_dir):
    """Blocked fuzzy record linkage (entity resolution): match dirtied
    records back to the clean table by edit distance WITHIN a blocking
    key — never the n² cross product. The dirty side is derived
    in-query (one deterministic character typo per name at a
    key-dependent position outside the block suffix, mirrored in the
    oracle). Plan: equi-join on the block key, codegen ``levenshtein``
    filter ≤ 2, best match per dirty record by (distance, key) window.
    At 100 TB the block key is the unit of shuffle — block sizing
    bounds the quadratic inside each block exactly like
    ``ngram_jaccard_pairs``' grid."""
    c = _t(spark, sf_dir, "customer")
    # typo at 1-based position 10..14 (digits 1-5); block = last 4 chars
    dirty = c.selectExpr(
        "c_custkey AS dirty_id",
        "concat(substring(c_name, 1, cast(c_custkey % 5 + 10 as int) - 1), "
        "'x', substring(c_name, cast(c_custkey % 5 + 10 as int) + 1)) "
        "AS dname").withColumn("blk", F.substring("dname", 15, 4))
    clean = c.select("c_custkey", "c_name",
                     F.substring("c_name", 15, 4).alias("blk"))
    dist = F.levenshtein(F.col("c_name"), F.col("dname"))
    w = Window.partitionBy("dirty_id").orderBy("dist", "c_custkey")
    return (dirty.join(clean, "blk")
            .withColumn("dist", dist)
            .filter(F.col("dist") <= 2)
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("dirty_id", F.col("c_custkey").alias("matched_key"),
                    "dist"))


SQL_RECORD_LINKAGE = """
WITH dirty AS (
  SELECT c_custkey AS dirty_id,
         substr(c_name, 1, CAST(c_custkey % 5 + 10 AS INT) - 1) || 'x' ||
         substr(c_name, CAST(c_custkey % 5 + 10 AS INT) + 1) AS dname
  FROM customer),
db AS (SELECT dirty_id, dname, substr(dname, 15, 4) AS blk FROM dirty),
cb AS (SELECT c_custkey, c_name, substr(c_name, 15, 4) AS blk FROM customer),
scored AS (
  SELECT db.dirty_id, cb.c_custkey,
         levenshtein(cb.c_name, db.dname) AS dist
  FROM db JOIN cb USING (blk)
  WHERE levenshtein(cb.c_name, db.dname) <= 2)
SELECT dirty_id, c_custkey AS matched_key, dist
FROM (SELECT dirty_id, c_custkey, dist,
             ROW_NUMBER() OVER (PARTITION BY dirty_id
                                ORDER BY dist, c_custkey) AS rn
      FROM scored)
WHERE rn = 1
"""


# email-ish then phone-ish; Java and DuckDB (RE2-ish) both support
# these constructs identically (no lookaround, no backrefs)
PII_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PII_PHONE_RE = "\\+?[0-9]{3}[- .][0-9]{3}[- .][0-9]{4}"


def q_pii_scrub(spark, sf_dir):
    """Corpus PII scrubbing: redact email addresses and phone-shaped
    numbers with typed placeholders and report per-doc hit counts —
    the standard pre-training cleanup pass. Pure regexp_replace /
    regexp_count (JVM codegen, one narrow projection, no shuffle);
    the patterns avoid lookarounds so Java and DuckDB regex engines
    agree character-for-character.

    The synthetic corpus carries no PII, so every third doc gets a
    deterministic contact line injected IN-QUERY (doc_id-derived
    email + phone, mirrored verbatim in the oracle) — the scrub then
    demonstrably fires: those docs report hits and a changed digest,
    the rest pass through untouched."""
    d = _t(spark, sf_dir, "documents")
    contact = F.concat(
        F.lit(" contact user"), F.col("doc_id").cast("string"),
        F.lit("@example.com or 555-"),
        F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
        F.lit("-2345."))
    text = F.when(F.col("doc_id") % 3 == 0,
                  F.concat(F.col("text"), contact)) \
            .otherwise(F.col("text"))
    scrubbed = F.regexp_replace(
        F.regexp_replace(text, PII_EMAIL_RE, "<EMAIL>"),
        PII_PHONE_RE, "<PHONE>")
    return d.select(
        "doc_id",
        F.regexp_count(text, F.lit(PII_EMAIL_RE)).alias("n_email"),
        F.regexp_count(text, F.lit(PII_PHONE_RE)).alias("n_phone"),
        F.md5(scrubbed.cast("binary")).alias("scrubbed_md5"),
        F.length(scrubbed).alias("scrubbed_len"))


_SQL_PII_TEXT = ("CASE WHEN doc_id % 3 = 0 THEN text || ' contact user' "
                 "|| doc_id || '@example.com or 555-' "
                 "|| lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') "
                 "|| '-2345.' ELSE text END")

SQL_PII_SCRUB = f"""
WITH t AS (SELECT doc_id, {_SQL_PII_TEXT} AS text FROM documents)
SELECT doc_id,
       len(regexp_extract_all(text, '{PII_EMAIL_RE}')) AS n_email,
       len(regexp_extract_all(text, '{PII_PHONE_RE}')) AS n_phone,
       md5(regexp_replace(regexp_replace(text, '{PII_EMAIL_RE}', '<EMAIL>', 'g'),
                          '{PII_PHONE_RE}', '<PHONE>', 'g')) AS scrubbed_md5,
       length(regexp_replace(regexp_replace(text, '{PII_EMAIL_RE}', '<EMAIL>', 'g'),
                             '{PII_PHONE_RE}', '<PHONE>', 'g')) AS scrubbed_len
FROM t
"""


def q_zorder_key(spark, sf_dir):
    """Z-order (Morton) clustering key over (o_custkey, order epoch
    day) — the data-layout primitive for multi-column scan pruning at
    scale (functions/zorder.py). Output keeps both inputs plus the
    interleaved key; production writes would
    ``repartitionByRange(zval).sortWithinPartitions(zval)`` so file
    min/max stats prune on EITHER column."""
    from .functions.zorder import zvalue
    o = _t(spark, sf_dir, "orders")
    day = F.datediff(F.to_date("o_orderdate"),
                     F.lit("1970-01-01").cast("date"))
    return (o.select(
        "o_orderkey",
        F.col("o_custkey").alias("x"),
        day.cast("bigint").alias("y"),
        zvalue(F.col("o_custkey"), day).alias("zval")))


def _sql_zorder_key() -> str:
    from .functions.zorder import sql_spread_steps
    steps = sql_spread_steps("zsrc", ("x", "y"), "o_orderkey, x0, y0")
    return f"""
WITH zsrc AS (
  SELECT o_orderkey,
         CAST(o_custkey AS BIGINT) AS x0,
         CAST(date_diff('day', DATE '1970-01-01',
                        CAST(o_orderdate AS DATE)) AS BIGINT) AS y0,
         CAST(o_custkey AS BIGINT) AS x,
         CAST(date_diff('day', DATE '1970-01-01',
                        CAST(o_orderdate AS DATE)) AS BIGINT) AS y
  FROM orders),
{steps}
SELECT o_orderkey, x0 AS x, y0 AS y, (x | (y << 1)) AS zval
FROM zs4
"""


SQL_ZORDER_KEY = _sql_zorder_key()


QUERIES_EXT3: dict[str, dict] = {
    "zorder_key":       {"fn": q_zorder_key,    "sql": SQL_ZORDER_KEY},
    "llm_pii_scrub":    {"fn": q_pii_scrub,     "sql": SQL_PII_SCRUB},
    "record_linkage":   {"fn": q_record_linkage, "sql": SQL_RECORD_LINKAGE},
    "unpivot":          {"fn": q_unpivot,       "sql": SQL_UNPIVOT},
    "struct_funcs":     {"fn": q_struct_funcs,  "sql": SQL_STRUCT_FUNCS},
    "gap_fill":         {"fn": q_gap_fill,      "sql": SQL_GAP_FILL},
    "interpolate":      {"fn": q_interpolate,   "sql": SQL_INTERPOLATE},
    "rolling_corr":     {"fn": q_rolling_corr,  "sql": SQL_ROLLING_CORR},
    "llm_feature_hash": {"fn": q_feature_hash,  "sql": SQL_FEATURE_HASH},
    "llm_repetition":   {"fn": q_repetition,    "sql": SQL_REPETITION},
    "funnel":           {"fn": q_funnel,        "sql": SQL_FUNNEL},
    "map_funcs":        {"fn": q_map_funcs,     "sql": SQL_MAP_FUNCS},
    "histogram_bins":   {"fn": q_histogram_bins, "sql": SQL_HISTOGRAM_BINS},
    "llm_decontaminate": {"fn": q_decontaminate, "sql": SQL_DECONTAMINATE},
    "table_diff":       {"fn": q_table_diff,    "sql": SQL_TABLE_DIFF},
    "scd2_intervals":   {"fn": q_scd2_intervals, "sql": SQL_SCD2_INTERVALS},
    "variant_funcs":    {"fn": q_variant_funcs, "sql": SQL_VARIANT_FUNCS},
    "cohort_retention": {"fn": q_cohort_retention,
                         "sql": SQL_COHORT_RETENTION},
    "event_transitions": {"fn": q_event_transitions,
                          "sql": SQL_EVENT_TRANSITIONS},
}
