"""Twelfth extension wave — training-data mixing, streamed anomaly
flags, and the remaining relational surface a curation pipeline
leans on:

- ``source_mix_weights``: temperature-sampling mixture weights per
  corpus source (w_s ∝ n_s^0.5, the data-mixing rule used for
  multi-source LM training sets) with planned per-source sample
  counts — sqrt is integer-scaled (floor(sqrt·2^20)) so the
  normalizing sum is order-free across engines,
- ``class_weights``: inverse-frequency class weights
  N/(K·n_c) over the language label — the loss-weighting table a
  trainer broadcasts,
- ``rolling_zscore``: per-type rolling-window anomaly flags over the
  event stream — mean/variance from integer-cent sums over the
  trailing 32 rows, the 3σ test cross-multiplied to ONE integer
  comparison ((n·x−S)² > 9(n·Q−S²)) so no sqrt/float enters,
- ``group_median_bp``: EXACT per-group median without any sort —
  the grouped form of the registry_ext10 prefix-sum pyramid (every
  level equi-shaped once a group key exists),
- ``mode_per_group``: most-frequent value per group with a
  deterministic (count desc, value asc) tie-break,
- ``unpivot_long``: wide→long melt of the per-customer RFM metrics
  via native ``DataFrame.unpivot`` (one Expand, no join),
- ``doc_length_hist``: power-of-two document-length histogram —
  floor(log2) via binary-string length, no floating log,
- ``dup_ratio_by_source``: exact-duplicate share per source from a
  distinct-md5 count.

Determinism contract as registry.py: integer math until one final
division, ROUND(·, 6) on emitted doubles, md5 as the only hash.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .registry import _t
from .registry_ext10 import _sql_cum, cum_below

# ------------------------------------- source mixture weights ------

MIX_ALPHA_SCALE = 1 << 20  # sqrt(n) fixed-point scale


def _mix_plan(per_src):
    """The n^0.5 temperature-mixing plan, shared by
    ``source_mix_weights`` and the composed ``llm_trainprep``
    (one definition, so the pipeline cannot desynchronize from the
    operator it composes): fixed-point sqrt weights, order-free
    integer normalizer, and the exact planned-docs quotient.
    w_fix·n_tot exceeds int64 once a source passes ~4×10^8 docs
    (w_fix ≈ sqrt(n)·2^20), so the product runs in DECIMAL(38,0)
    and `div` returns the exact bigint quotient — the ab_ttest
    wide-intermediate rule applied to planning math."""
    scaled = per_src.withColumn(
        "w_fix", F.floor(F.sqrt(F.col("n_docs").cast("double"))
                         * MIX_ALPHA_SCALE).cast("bigint"))
    tot = scaled.agg(F.sum("w_fix").alias("w_tot"),
                     F.sum("n_docs").alias("n_tot"))
    return (scaled.join(F.broadcast(tot))
            .withColumn("planned_docs",
                        F.expr("(CAST(w_fix AS DECIMAL(38,0)) * n_tot)"
                               " div w_tot")))


def _sql_mix(src: str) -> str:
    """DuckDB CTE block mirroring ``_mix_plan`` over ``src``; emits
    CTE ``mixplan``(source, n_docs, w_fix, w_tot, n_tot,
    planned_docs) — HUGEINT intermediates as the Spark side's
    DECIMAL(38,0)."""
    return f"""
scaled AS (
  SELECT source, n_docs,
         CAST(floor(sqrt(CAST(n_docs AS DOUBLE)) * {MIX_ALPHA_SCALE})
              AS BIGINT) AS w_fix
  FROM {src}),
tot AS (SELECT CAST(SUM(w_fix) AS BIGINT) AS w_tot,
               CAST(SUM(n_docs) AS BIGINT) AS n_tot FROM scaled),
mixplan AS (
  SELECT source, n_docs, w_fix, w_tot, n_tot,
         CAST((CAST(w_fix AS HUGEINT) * n_tot) // w_tot AS BIGINT)
           AS planned_docs
  FROM scaled CROSS JOIN tot)"""


def q_source_mix_weights(spark, sf_dir):
    """Temperature-sampling mixture weights per source, α = 1/2:
    w_s = n_s^α / Σ n_t^α.  sqrt(bigint→double) is correctly
    rounded in IEEE-754 (both engines), and floor(·2^20) makes each
    term an exact bigint, so the normalizer is an order-free integer
    sum — the final division is the only float op.  planned_docs
    resamples the corpus to its own size under the mixture."""
    d = _t(spark, sf_dir, "documents")
    per_src = (d.groupBy("source")
               .agg(F.count(F.lit(1)).alias("n_docs")))
    return (_mix_plan(per_src)
            .select("source", "n_docs",
                    F.round(F.col("w_fix") / F.col("w_tot"), 6)
                    .alias("weight"),
                    "planned_docs")
            .orderBy("source"))


SQL_SOURCE_MIX_WEIGHTS = f"""
WITH per_src AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM documents GROUP BY source),
{_sql_mix("per_src")}
SELECT source, n_docs,
       ROUND(CAST(w_fix AS DOUBLE) / w_tot, 6) AS weight,
       planned_docs
FROM mixplan ORDER BY source
"""


# --------------------------------------------- class weights -------

def q_class_weights(spark, sf_dir):
    """Inverse-frequency class weights over the language label:
    w_c = N / (K · n_c) — integers until the one division.  The
    output is the tiny table a trainer broadcasts into its loss."""
    d = _t(spark, sf_dir, "documents")
    per_lang = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    tot = per_lang.agg(F.sum("n_docs").alias("n_tot"),
                       F.count(F.lit(1)).alias("k"))
    return (per_lang.join(F.broadcast(tot))
            .select("lang", "n_docs",
                    F.round(F.col("n_tot")
                            / (F.col("k") * F.col("n_docs")), 6)
                    .alias("weight"))
            .orderBy("lang"))


SQL_CLASS_WEIGHTS = """
WITH per_lang AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM documents GROUP BY lang),
tot AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS n_tot,
               CAST(COUNT(*) AS BIGINT) AS k FROM per_lang)
SELECT lang, n_docs,
       ROUND(CAST(n_tot AS DOUBLE) / (k * n_docs), 6) AS weight
FROM per_lang CROSS JOIN tot ORDER BY lang
"""


# ------------------------------------------- rolling z-score -------

ZS_WIN = 32     # trailing window rows
ZS_MIN_N = 8    # minimum history before flagging
ZS_K = 3        # |x - μ| > 3σ


def q_rolling_zscore(spark, sf_dir):
    """Per-type rolling anomaly flags: an event is anomalous when
    its cents value deviates > 3σ from the trailing-32-row mean.
    The test is cross-multiplied to one integer comparison,
    (n·x − S)² > 9·(n·Q − S²), evaluated in DECIMAL(38,0) (Spark) /
    HUGEINT (DuckDB) so cents² sums can never wrap (the ab_ttest
    lesson) — no float, no sqrt, bit-identical flags.  Window is
    partitioned by event_type and ordered by the epoch-microsecond
    integer (never calendar functions — the events column is LTZ).

    Scale note: event_type is a 5-value key, so these window
    partitions cap parallelism at 5 — fine for the oracle shape; the
    AT-SCALE form is ``rolling_zscore_bp`` (registry_ext12.py),
    re-keyed by (event_type, epoch_day) with an exact 32-row
    boundary carry."""
    e = _t(spark, sf_dir, "events")
    # null values are excluded OUTRIGHT (not null-skipped inside the
    # sums) so the row count n and the moment sums always describe
    # the same window — and the streaming twin (zscore_stream) can
    # mirror the semantics exactly
    base = e.filter(F.col("value").isNotNull()).select(
        "event_id", "event_type",
        F.expr("unix_micros(ts)").alias("t_us"),
        (F.col("value").cast("decimal(18,2)") * 100)
        .cast("bigint").alias("cents"))
    w = (Window.partitionBy("event_type").orderBy("t_us", "event_id")
         .rowsBetween(-ZS_WIN, -1))
    # the moment sums themselves accumulate in DECIMAL(38,0): a
    # single cents·cents product wraps int64 at ~$30M values, and
    # casting only AFTER the sum would inherit the wrap
    dcents = F.col("cents").cast("decimal(38,0)")
    stats = base.select(
        "event_id", "event_type", "cents",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum(dcents).over(w).alias("s"),
        F.sum(dcents * F.col("cents")).over(w).alias("q"))
    dn = F.col("n").cast("decimal(38,0)")
    dx = F.col("cents").cast("decimal(38,0)")
    ds = F.col("s")
    dq = F.col("q")
    dev = dn * dx - ds
    var_n2 = dn * dq - ds * ds
    return (stats
            .filter((F.col("n") >= ZS_MIN_N)
                    & (dev * dev > ZS_K * ZS_K * var_n2))
            .select("event_id", "event_type", "cents", "n"))


SQL_ROLLING_ZSCORE = f"""
WITH base AS (
  SELECT event_id, event_type, epoch_us(ts) AS t_us,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM events WHERE value IS NOT NULL),
stats AS (
  SELECT event_id, event_type, cents,
         CAST(COUNT(*) OVER w AS BIGINT) AS n,
         SUM(CAST(cents AS HUGEINT)) OVER w AS s,
         SUM(CAST(cents AS HUGEINT) * cents) OVER w AS q
  FROM base
  WINDOW w AS (PARTITION BY event_type ORDER BY t_us, event_id
               ROWS BETWEEN {ZS_WIN} PRECEDING AND 1 PRECEDING))
SELECT event_id, event_type, cents, n
FROM stats
WHERE n >= {ZS_MIN_N}
  AND (CAST(n AS HUGEINT) * cents - s) * (CAST(n AS HUGEINT) * cents - s)
      > {ZS_K * ZS_K} * (CAST(n AS HUGEINT) * q - s * s)
"""


# ------------------------------------- exact per-group median ------

def q_group_median_bp(spark, sf_dir):
    """EXACT per-group median order value (cents) with NO sort in
    the plan: the grouped prefix-sum pyramid (registry_ext10) gives
    each distinct value its below-count, and the median is the
    smallest value whose inclusive count reaches half the group —
    2·(cum_lt + c) ≥ n.  With a group key every pyramid level is an
    equi-join, so the plan is shuffle-bounded by the distinct-value
    table, never a global ordering."""
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("grp"),
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint").alias("cents"))
    cum = cum_below(o, "cents", by=("grp",))
    n = o.groupBy("grp").agg(F.count(F.lit(1)).alias("n_grp"))
    return (cum.join(F.broadcast(n), "grp")
            .filter(2 * (F.col("cum_lt") + F.col("c"))
                    >= F.col("n_grp"))
            .groupBy("grp", "n_grp")
            .agg(F.min("v").alias("median_cents"))
            .orderBy("grp"))


SQL_GROUP_MEDIAN_BP = f"""
WITH src AS (
  SELECT o_orderpriority AS grp,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           AS cents
  FROM orders),
{_sql_cum("src", "cents", "g_", by=("grp",))},
n AS (SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_grp
      FROM src GROUP BY grp)
SELECT c.grp, n.n_grp, MIN(c.v) AS median_cents
FROM g_cum c JOIN n ON c.grp = n.grp
WHERE 2 * (c.cum_lt + c.c) >= n.n_grp
GROUP BY c.grp, n.n_grp ORDER BY c.grp
"""


def q_group_quartiles_bp(spark, sf_dir):
    """p25/p50/p75 per group in ONE pass over the same grouped
    prefix-sum pyramid as ``group_median_bp``: quartile k is the
    smallest value whose inclusive count reaches k/4 of the group,
    so all three emerge as conditional MINs of one aggregate — no
    sort, no percentile UDF, one extra comparison per threshold."""
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("grp"),
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint").alias("cents"))
    cum = cum_below(o, "cents", by=("grp",))
    n = o.groupBy("grp").agg(F.count(F.lit(1)).alias("n_grp"))
    j = cum.join(F.broadcast(n), "grp")
    incl4 = 4 * (F.col("cum_lt") + F.col("c"))

    def q_at(k, name):
        return F.min(F.when(incl4 >= k * F.col("n_grp"),
                            F.col("v"))).alias(name)

    return (j.groupBy("grp", "n_grp")
            .agg(q_at(1, "q25_cents"), q_at(2, "q50_cents"),
                 q_at(3, "q75_cents"))
            .orderBy("grp"))


SQL_GROUP_QUARTILES_BP = f"""
WITH src AS (
  SELECT o_orderpriority AS grp,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           AS cents
  FROM orders),
{_sql_cum("src", "cents", "q_", by=("grp",))},
n AS (SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_grp
      FROM src GROUP BY grp)
SELECT c.grp, n.n_grp,
       MIN(CASE WHEN 4 * (c.cum_lt + c.c) >= 1 * n.n_grp
                THEN c.v END) AS q25_cents,
       MIN(CASE WHEN 4 * (c.cum_lt + c.c) >= 2 * n.n_grp
                THEN c.v END) AS q50_cents,
       MIN(CASE WHEN 4 * (c.cum_lt + c.c) >= 3 * n.n_grp
                THEN c.v END) AS q75_cents
FROM q_cum c JOIN n ON c.grp = n.grp
GROUP BY c.grp, n.n_grp ORDER BY c.grp
"""


# ----------------------------------------------- grouped mode ------

def q_mode_per_group(spark, sf_dir):
    """Most-frequent order priority per order status, deterministic
    tie-break (highest count, then lexicographically smallest
    value) — the categorical summary ``mode()`` gives in one engine
    and a two-level aggregate gives portably.  The rank window runs
    over the COUNTS table (groups × values), never the fact rows."""
    o = _t(spark, sf_dir, "orders")
    counts = (o.groupBy("o_orderstatus", "o_orderpriority")
              .agg(F.count(F.lit(1)).alias("n")))
    w = (Window.partitionBy("o_orderstatus")
         .orderBy(F.desc("n"), "o_orderpriority"))
    return (counts.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("o_orderstatus",
                    F.col("o_orderpriority").alias("mode_priority"),
                    F.col("n").alias("n_mode"))
            .orderBy("o_orderstatus"))


SQL_MODE_PER_GROUP = """
WITH counts AS (
  SELECT o_orderstatus, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n
  FROM orders GROUP BY o_orderstatus, o_orderpriority),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY o_orderstatus
                               ORDER BY n DESC, o_orderpriority) AS rn
  FROM counts)
SELECT o_orderstatus, o_orderpriority AS mode_priority, n AS n_mode
FROM ranked WHERE rn = 1 ORDER BY o_orderstatus
"""


# -------------------------------------------- wide→long melt -------

def q_unpivot_long(spark, sf_dir):
    """Wide→long melt of the per-customer RFM metrics via native
    ``DataFrame.unpivot`` (one Expand node — row-generating
    projection, no join, pipelines into the downstream aggregate),
    then per-metric summary stats.  The relational surface every
    feature store needs for metric-at-a-time processing."""
    o = _t(spark, sf_dir, "orders")
    per_cust = (o.groupBy("o_custkey")
                .agg(F.max(F.datediff(
                        F.to_date("o_orderdate"),
                        F.lit("1970-01-01").cast("date")))
                     .cast("bigint").alias("recency"),
                     F.count(F.lit(1)).alias("frequency"),
                     (F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                      * 100).cast("bigint").alias("monetary")))
    long = per_cust.unpivot(
        ["o_custkey"], ["recency", "frequency", "monetary"],
        "metric", "val")
    return (long.groupBy("metric")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.min("val").alias("min_val"),
                 F.max("val").alias("max_val"),
                 F.sum("val").alias("sum_val"))
            .orderBy("metric"))


SQL_UNPIVOT_LONG = """
WITH per_cust AS (
  SELECT o_custkey,
         CAST(MAX(CAST(o_orderdate AS DATE) - DATE '1970-01-01')
              AS BIGINT) AS recency,
         COUNT(*) AS frequency,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
           AS monetary
  FROM orders GROUP BY o_custkey),
long AS (
  SELECT o_custkey, 'recency' AS metric, recency AS val FROM per_cust
  UNION ALL
  SELECT o_custkey, 'frequency', frequency FROM per_cust
  UNION ALL
  SELECT o_custkey, 'monetary', monetary FROM per_cust)
SELECT metric, COUNT(*) AS n, MIN(val) AS min_val,
       MAX(val) AS max_val, CAST(SUM(val) AS BIGINT) AS sum_val
FROM long GROUP BY metric ORDER BY metric
"""


# ------------------------------------ doc length histogram ---------

def q_doc_length_hist(spark, sf_dir):
    """Power-of-two document-length histogram: bucket =
    floor(log2(n_chars + 1)) computed as the LENGTH OF THE BINARY
    STRING minus one — both engines print minimal binary (no
    leading zeros), so no floating log ever runs."""
    d = _t(spark, sf_dir, "documents")
    bucket = (F.length(F.expr("bin(n_chars + 1)")) - 1).cast("bigint")
    return (d.groupBy(bucket.alias("log2_bucket"))
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.min("n_chars").alias("min_chars"),
                 F.max("n_chars").alias("max_chars"))
            .orderBy("log2_bucket"))


SQL_DOC_LENGTH_HIST = """
SELECT CAST(length(bin(n_chars + 1)) - 1 AS BIGINT) AS log2_bucket,
       COUNT(*) AS n_docs, MIN(n_chars) AS min_chars,
       MAX(n_chars) AS max_chars
FROM documents GROUP BY 1 ORDER BY 1
"""


# ---------------------------------- exact-dup share by source ------

def q_dup_ratio_by_source(spark, sf_dir):
    """Exact-duplicate share per corpus source: 1 − distinct/total
    over the md5 text digest — the per-slice health metric behind
    the global ``dedup_exact`` operator.  COUNT(DISTINCT md5) is a
    16-byte-key distinct aggregate, map-side partial, no full-text
    shuffle."""
    d = _t(spark, sf_dir, "documents")
    return (d.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.countDistinct(F.md5("text")).alias("n_distinct"))
            .select("source", "n_docs", "n_distinct",
                    F.round((F.col("n_docs") - F.col("n_distinct"))
                            .cast("double") / F.col("n_docs"), 6)
                    .alias("dup_ratio"))
            .orderBy("source"))


SQL_DUP_RATIO_BY_SOURCE = """
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_distinct,
       ROUND(CAST(COUNT(*) - COUNT(DISTINCT md5(text)) AS DOUBLE)
             / COUNT(*), 6) AS dup_ratio
FROM documents GROUP BY source ORDER BY source
"""


# ------------------------------------- hour-of-day seasonality -----

def q_seasonal_profile(spark, sf_dir):
    """Hour-of-day seasonality profile per event type — the weekly/
    daily load-shape table behind capacity planning and anomaly
    baselines.  Hour-of-day comes from EPOCH-HOUR integers
    ((unix_micros div 3600e6) mod 24, UTC by definition) — never
    calendar extraction, which would shift under the session
    timezone on the LTZ events column."""
    e = _t(spark, sf_dir, "events")
    hod = F.expr("(unix_micros(ts) div 3600000000) % 24")
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("bigint")
    return (e.select("event_type", hod.alias("hour_of_day"),
                     cents.alias("cents"))
            .groupBy("event_type", "hour_of_day")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum("cents").cast("double")
                         / (100 * F.count(F.lit(1))), 6)
                 .alias("mean_value"),
                 F.max("cents").alias("max_cents"))
            .orderBy("event_type", "hour_of_day"))


SQL_SEASONAL_PROFILE = """
WITH base AS (
  SELECT event_type, (epoch_us(ts) // 3600000000) % 24 AS hour_of_day,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM events)
SELECT event_type, hour_of_day, COUNT(*) AS n,
       ROUND(CAST(CAST(SUM(cents) AS BIGINT) AS DOUBLE)
             / (100 * COUNT(*)), 6) AS mean_value,
       MAX(cents) AS max_cents
FROM base GROUP BY event_type, hour_of_day
ORDER BY event_type, hour_of_day
"""


# --------------------------------------- rank-ratio windows --------

def q_rank_ratios(spark, sf_dir):
    """percent_rank and cume_dist per order priority over a UNIQUE
    total order (cents, orderkey) — the relative-standing columns a
    feature pipeline derives per entity.  With a unique order both
    ratios are exact rationals ((rn−1)/(N−1), rn/N); identical
    integer divisions give identical IEEE doubles in both engines,
    no rounding needed.

    Scale note: o_orderpriority is a 5-value key, so this sorts the
    whole table under 5 window partitions — fine for the oracle
    shape; the AT-SCALE form is ``rank_ratios_bp``
    (registry_ext12.py), exact tie-collapsed rationals from a
    prefix-sum pyramid with no table-sized per-key sort."""
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderpriority").alias("grp"),
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint").alias("cents"))
    w = Window.partitionBy("grp").orderBy("cents", "k")
    return (o.select("k", "grp", "cents",
                     F.percent_rank().over(w).alias("pct_rank"),
                     F.cume_dist().over(w).alias("cume"))
            .filter(F.col("k") % 7 == 0))


SQL_RANK_RATIOS = """
WITH src AS (
  SELECT o_orderkey AS k, o_orderpriority AS grp,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           AS cents
  FROM orders)
SELECT k, grp, cents,
       percent_rank() OVER w AS pct_rank,
       cume_dist() OVER w AS cume
FROM src
WINDOW w AS (PARTITION BY grp ORDER BY cents, k)
QUALIFY k % 7 = 0
"""


# ------------------------- training-prep mixing pipeline -----------

TP_HASH_MOD = 1 << 20


def q_llm_trainprep(spark, sf_dir):
    """COMPOSED training-prep pipeline: quality cut → temperature
    mixture weights over the survivors (w ∝ n^0.5, the
    source_mix_weights rule) → DETERMINISTIC per-source Bernoulli
    sampling at each source's planned rate (keep doc iff
    md48('mix:'||doc_id) mod 2^20 < (planned·2^20) div n — an exact
    integer threshold, so the sample is reproducible across shards,
    engines, and reruns).  Emits the per-source funnel: survivors,
    fixed-point weight, planned docs, actually-sampled docs and
    their token mass — the plan-vs-actual table a data-mixing job
    reports.  Every stage is integer-exact end to end."""
    from .registry_ext6 import _md48
    from .registry_pipelines import CURATE_TOK_MAX, CURATE_TOK_MIN
    d = _t(spark, sf_dir, "documents")
    ntok = F.size(F.split(F.lower(F.trim("text")), " ")).cast("bigint")
    q = d.withColumn("n_tok", ntok).filter(
        F.col("n_tok").between(CURATE_TOK_MIN, CURATE_TOK_MAX))
    per_src = (q.groupBy("source")
               .agg(F.count(F.lit(1)).alias("n_docs")))
    # planned·2^20 also clears int64 at large corpus sizes — same
    # DECIMAL(38,0) rule as inside _mix_plan
    plan = (_mix_plan(per_src)
            .withColumn("keep_thresh",
                        F.expr("(CAST(planned_docs AS DECIMAL(38,0))"
                               f" * {TP_HASH_MOD}) div n_docs"))
            .select("source", "n_docs", "w_fix", "planned_docs",
                    "keep_thresh"))
    h = _md48(F.concat(F.lit("mix:"), F.col("doc_id"))) % TP_HASH_MOD
    sampled = (q.join(F.broadcast(plan), "source")
               .filter(h < F.col("keep_thresh")))
    samp_stats = (sampled.groupBy("source")
                  .agg(F.count(F.lit(1)).alias("n_sampled"),
                       F.sum("n_tok").alias("tok_sampled")))
    return (plan.join(samp_stats, "source", "left")
            .select("source", "n_docs", "w_fix", "planned_docs",
                    F.coalesce("n_sampled", F.lit(0)).alias("n_sampled"),
                    F.coalesce("tok_sampled", F.lit(0))
                    .alias("tok_sampled"))
            .orderBy("source"))


from .registry_pipelines import CURATE_TOK_MAX as _TPMAX  # noqa: E402
from .registry_pipelines import CURATE_TOK_MIN as _TPMIN  # noqa: E402

SQL_LLM_TRAINPREP = f"""
WITH q AS (
  SELECT source, doc_id,
         CAST(length(lower(trim(text)))
              - length(replace(lower(trim(text)), ' ', '')) + 1
              AS BIGINT) AS n_tok
  FROM documents
  WHERE CAST(length(lower(trim(text)))
             - length(replace(lower(trim(text)), ' ', '')) + 1
             AS BIGINT) BETWEEN {{tpmin}} AND {{tpmax}}),
per_src AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM q GROUP BY source),
{_sql_mix("per_src")},
plan AS (
  SELECT source, n_docs, w_fix, planned_docs,
         CAST((CAST(planned_docs AS HUGEINT) * {TP_HASH_MOD})
              // n_docs AS BIGINT) AS keep_thresh
  FROM mixplan),
sampled AS (
  SELECT q.source, CAST(COUNT(*) AS BIGINT) AS n_sampled,
         CAST(SUM(q.n_tok) AS BIGINT) AS tok_sampled
  FROM q JOIN plan ON q.source = plan.source
  WHERE CAST('0x' || substr(md5('mix:' || CAST(q.doc_id AS VARCHAR)),
                            1, 12) AS BIGINT) % {TP_HASH_MOD}
        < plan.keep_thresh
  GROUP BY q.source)
SELECT p.source, p.n_docs, p.w_fix, p.planned_docs,
       COALESCE(s.n_sampled, 0) AS n_sampled,
       COALESCE(s.tok_sampled, 0) AS tok_sampled
FROM plan p LEFT JOIN sampled s ON p.source = s.source
ORDER BY p.source
""".format(tpmin=_TPMIN, tpmax=_TPMAX)


# ----------------------------- label-propagation communities -------

LPA_ROUNDS = 3


def q_label_propagation(spark, sf_dir):
    """Synchronous label-propagation community detection on the
    behavioral interaction graph (same lead-window edge derivation
    as pagerank/triangle_count) — the lightweight community
    assignment beside the exact connected components.

    Fully deterministic: labels start as node ids; each round every
    node adopts the MODE of its neighbors' labels with a (count
    desc, label asc) tie-break — one equi-join + one count aggregate
    + one partitioned rank window per round, rounds unrolled (3).
    Nodes are (event_type, user) composites, so communities are
    scoped per behavior stream — the whole-user graph is so dense
    that LPA collapses it to a single label (verified), which would
    make the check vacuous.  String labels compare byte-wise
    identically in both engines."""
    from .operators.graph import behavioral_edges
    e = _t(spark, sf_dir, "events")
    # day-rekeyed lead with boundary stitch — identical pair set to
    # the naive whole-type window (operators/graph.behavioral_edges)
    seq = behavioral_edges(e)
    node = lambda c: F.concat("event_type", F.lit(":"),  # noqa: E731
                              F.col(c).cast("string"))
    und = (seq.select(F.least(node("src"), node("dst")).alias("a"),
                      F.greatest(node("src"), node("dst"))
                      .alias("b"))
           .distinct())
    # localCheckpoint: the undirected edge table feeds every LPA
    # round's neighbor join PLUS the label init — without it the
    # lead-window edge derivation re-executes once per consumer
    # inside the single final plan (4× at LPA_ROUNDS=3)
    und = (und.select(F.col("a").alias("src"), F.col("b").alias("dst"))
           .unionByName(und.select(F.col("b").alias("src"),
                                   F.col("a").alias("dst")))
           # lazy (r15): every consumer sits inside the single final
           # action — blocks persist at its first touch, no blocking
           # materialization job; plan delta (88 → 24 Exchanges) kept
           .localCheckpoint(eager=False))
    labels = und.select(F.col("src").alias("u")).distinct() \
        .withColumn("lbl", F.col("u"))
    wmode = None
    for _ in range(LPA_ROUNDS):
        nbr = (und.join(labels, und["dst"] == labels["u"])
               .select("src", "lbl"))
        cnt = nbr.groupBy("src", "lbl").agg(F.count(F.lit(1)).alias("n"))
        wmode = Window.partitionBy("src").orderBy(F.desc("n"), "lbl")
        labels = (cnt.withColumn("rn", F.row_number().over(wmode))
                  .filter(F.col("rn") == 1)
                  .select(F.col("src").alias("u"), "lbl"))
    return (labels.groupBy("lbl")
            .agg(F.count(F.lit(1)).alias("community_size"),
                 F.min("u").alias("min_member"),
                 F.max("u").alias("max_member"))
            .orderBy(F.desc("community_size"), "lbl"))


def _sql_label_propagation() -> str:
    rounds = []
    prev = "l0"
    for r in range(1, LPA_ROUNDS + 1):
        rounds.append(f"""
cnt{r} AS MATERIALIZED (
  SELECT u.src, p.lbl, CAST(COUNT(*) AS BIGINT) AS n
  FROM und u JOIN {prev} p ON u.dst = p.u
  GROUP BY u.src, p.lbl),
l{r} AS MATERIALIZED (
  SELECT src AS u, lbl FROM (
    SELECT src, lbl,
           row_number() OVER (PARTITION BY src
                              ORDER BY n DESC, lbl) AS rn
    FROM cnt{r}) WHERE rn = 1)""")
        prev = f"l{r}"
    return f"""
WITH seq AS MATERIALIZED (
  SELECT event_type, user_id,
         LEAD(user_id) OVER (PARTITION BY event_type
                             ORDER BY ts, event_id) AS nxt
  FROM events),
edges AS MATERIALIZED (
  SELECT DISTINCT
         LEAST(event_type || ':' || CAST(user_id AS VARCHAR),
               event_type || ':' || CAST(nxt AS VARCHAR)) AS a,
         GREATEST(event_type || ':' || CAST(user_id AS VARCHAR),
                  event_type || ':' || CAST(nxt AS VARCHAR)) AS b
  FROM seq WHERE nxt IS NOT NULL AND nxt <> user_id),
und AS MATERIALIZED (
  SELECT a AS src, b AS dst FROM edges
  UNION ALL SELECT b, a FROM edges),
l0 AS MATERIALIZED (
  SELECT DISTINCT src AS u, src AS lbl FROM und),
{",".join(rounds)}
SELECT lbl, CAST(COUNT(*) AS BIGINT) AS community_size,
       MIN(u) AS min_member, MAX(u) AS max_member
FROM {prev} GROUP BY lbl
ORDER BY community_size DESC, lbl
"""


SQL_LABEL_PROPAGATION = _sql_label_propagation()


# --------------------------- k-center diversity sampling -----------

KC_K = 8         # centers to select
KC_QSCALE = 1024  # 2^10 coordinate quantization (exact: double*2^10)
KC_DIM = 64


def q_kcenter_diverse(spark, sf_dir):
    """Greedy k-center (farthest-point) diversity sampling over the
    embedding corpus — the coverage-maximizing subset selection a
    curation pipeline uses to pick representative documents (2-approx
    of the optimal k-center cover).

    Determinism without a single float: coordinates are quantized
    ONCE by floor(x · 2^10) — multiplying a double by a power of two
    is exact, so the bigint grid is bit-identical across engines —
    and every distance is thereafter an exact integer squared-L2.
    Greedy rounds: seed = min vec_id; each next center is the point
    with the MAXIMUM distance to its nearest chosen center
    (tie-break min vec_id).  Each round is a SHUFFLE-FREE scan:
    per-center squared-L2 via aggregate(zip_with(qa, lit_center, …))
    higher-order functions — HOF lambdas evaluate as closures, not
    inlined codegen, so the 8-center×64-dim expression tree never
    hits janino's 64 KB method limit (which killed the fully
    unrolled first cut and forced rounds 6-11 through an
    explode + broadcast-join + double-aggregate long form; the HOF
    plan drops both shuffles AND the per-row 64-struct collect_list
    the long form paid to carry winner coordinates).  least() picks
    the nearest-center distance, TakeOrdered(1) ends the round, and
    the winner's own quantized array rides along — chosen centers
    re-enter as literal arrays (an 8-row model, not a data collect).
    The quantized (vec_id, qa) form is staged once so all K rounds
    re-scan a narrow parquet.  The DuckDB oracle recomputes the
    identical greedy pyramid from scratch as unrolled materialized
    CTEs."""
    from .registry import _staging
    e = _t(spark, sf_dir, "embeddings")
    arr = e.select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * KC_QSCALE)
            .cast("bigint")).alias("qa"))
    # all K greedy rounds re-scan the quantized form: stage it once
    # and every round reads the narrow parquet
    staging = _staging(sf_dir, "kcenter_arr")
    arr.write.mode("overwrite").parquet(staging)
    arrq = spark.read.parquet(staging)
    seed = (arrq.orderBy("vec_id").limit(1).collect())[0]
    picked = [(0, int(seed["vec_id"]), None)]
    cur, prev = arrq, None
    center = [int(v) for v in seed["qa"]]
    for r in range(1, KC_K):
        # fold ONLY the newest center into the persisted best-so-far
        # column: O(K·N·D) lambda evals total instead of the
        # O(K²·N·D) a recompute-all-centers round chain pays
        cur = kcenter_step(cur, center, have_best=r > 1).persist()
        far = (cur.orderBy(F.desc("best"), "vec_id")
               .limit(1).collect()[0])
        if prev is not None:
            prev.unpersist()
        prev = cur
        center = [int(v) for v in far["qa"]]
        picked.append((r, int(far["vec_id"]), int(far["best"])))
    if prev is not None:
        prev.unpersist()
    return spark.createDataFrame(
        picked, "sel_round int, vec_id long, d2 long")


def kcenter_step(df, center, have_best) -> "F.DataFrame":
    """ONE lazy greedy round, incremental form: fold the squared-L2
    distance to the SINGLE newest center into each vector's
    best-distance-so-far — (vec_id, qa, best), where qa rides along
    so the caller's TakeOrdered pick needs NO second corpus scan to
    re-fetch the winner.  Pure narrow plan: scan → project (one
    aggregate(zip_with(...)) against a literal center array,
    least() with the persisted best column) → TakeOrdered.  No
    join, no exchange, no aggregate — each greedy round is
    embarrassingly parallel over input partitions, which is exactly
    the shape that survives a 10^10-vector corpus (the only
    cross-partition traffic is K winner rows, and each round touches
    each coordinate exactly once).  Split out of q_kcenter_diverse
    because the selection loop must execute eagerly (each pick feeds
    the next round), which makes the registry-level plan audit see
    only the final 8-row literal: tests/test_plan_shapes.py audits
    THIS plan instead (no exchange/cartesian/row-UDF)."""
    from .ml.intlloyd import dist_to_sql
    dnew = F.expr(dist_to_sql(center))  # one parsed SQL string
    best = F.least(F.col("best"), dnew) if have_best else dnew
    return df.select("vec_id", "qa", best.alias("best"))


def _sql_kcenter() -> str:
    """Unrolled greedy pyramid: cN selects round N's center from the
    min-distance-to-priors table; AS MATERIALIZED stops DuckDB from
    inlining the pyramid exponentially (the BPE/PageRank lesson)."""
    gs = f"generate_series(1, {KC_DIM})"
    quant = (f"list_transform(embedding, x -> CAST(floor("
             f"CAST(x AS DOUBLE) * {KC_QSCALE}) AS BIGINT))")
    parts = [f"q AS MATERIALIZED (SELECT vec_id, {quant} AS qv "
             f"FROM embeddings)",
             "c0 AS MATERIALIZED (SELECT vec_id, qv FROM q "
             "ORDER BY vec_id LIMIT 1)"]
    for r in range(1, KC_K):
        dists = ", ".join(
            f"CAST(list_sum(list_transform({gs}, i -> "
            f"(q.qv[i] - c{j}.qv[i]) * (q.qv[i] - c{j}.qv[i]))) "
            f"AS BIGINT) AS d{j}" for j in range(r))
        froms = ", ".join(f"c{j}" for j in range(r))
        dmin = (f"LEAST({', '.join(f'd{j}' for j in range(r))})"
                if r > 1 else "d0")
        parts.append(
            f"t{r} AS MATERIALIZED (SELECT q.vec_id, q.qv, {dists} "
            f"FROM q, {froms})")
        parts.append(
            f"c{r} AS MATERIALIZED (SELECT vec_id, qv, {dmin} AS d "
            f"FROM t{r} ORDER BY {dmin} DESC, vec_id LIMIT 1)")
    rows = ["SELECT 0 AS sel_round, vec_id, CAST(NULL AS BIGINT) "
            "AS d2 FROM c0"]
    rows += [f"SELECT {r}, vec_id, d FROM c{r}"
             for r in range(1, KC_K)]
    return ("WITH " + ",\n".join(parts) + "\n"
            + "\nUNION ALL\n".join(rows))


SQL_KCENTER_DIVERSE = _sql_kcenter()


# ------------------------------ recursive hierarchy rollup ---------

# The Spark side spells integer division `div`, DuckDB spells it
# `//` — otherwise the two recursive texts are identical.
_RECURSIVE_ROLLUP = """
WITH RECURSIVE up(user_id, anc, lvl) AS (
  SELECT user_id, user_id, 0 FROM {src}
  UNION ALL
  SELECT user_id, anc {intdiv} 10, lvl + 1 FROM up WHERE anc > 0
),
roll AS (
  SELECT lvl, anc, CAST(SUM(n_events) AS BIGINT) AS sub_events,
         CAST(SUM(cents) AS BIGINT) AS sub_cents
  FROM up JOIN {src} USING (user_id) GROUP BY lvl, anc)
SELECT lvl, COUNT(*) AS n_nodes,
       CAST(MAX(sub_events) AS BIGINT) AS max_sub_events,
       CAST(SUM(sub_events) AS BIGINT) AS sum_events,
       CAST(SUM(sub_cents) AS BIGINT) AS sum_cents
FROM roll GROUP BY lvl ORDER BY lvl
"""


def q_recursive_rollup(spark, sf_dir):
    """Hierarchical subtree rollup via a RECURSIVE CTE (the Spark 4
    UnionLoop operator — org-chart/BOM recursion, new SQL surface):
    each user id climbs its decimal-radix ancestor chain (parent =
    id div 10, a functional graph — one parent per node, so the
    UNION ALL recursion is linear, never a path explosion) and event
    counts/cents roll up into every ancestor at every level.  All
    emitted values are order-free integer sums — hash-exact against
    DuckDB's recursive evaluation of the same text."""
    e = _t(spark, sf_dir, "events")
    (e.groupBy("user_id")
     .agg(F.count(F.lit(1)).alias("n_events"),
          F.sum((F.col("value").cast("decimal(18,2)") * 100)
                .cast("bigint")).alias("cents"))
     .createOrReplaceTempView("rr_per_user"))
    return spark.sql(_RECURSIVE_ROLLUP.format(src="rr_per_user",
                                              intdiv="div"))


# same recursive text, DuckDB spelling, with the per-user aggregate
# prepended to the (shared) WITH RECURSIVE list
SQL_RECURSIVE_ROLLUP = (
    "WITH RECURSIVE per_user AS (SELECT user_id, "
    "CAST(COUNT(*) AS BIGINT) AS n_events, "
    "CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) "
    "AS BIGINT) AS cents FROM events GROUP BY user_id),\n"
    + _RECURSIVE_ROLLUP.format(src="per_user", intdiv="//")
    .strip().replace("WITH RECURSIVE up", "up", 1)
)


# ----------------------------------------------- ORC roundtrip -----

def q_src_orc(spark, sf_dir):
    """ORC source/sink surface (the second columnar format Spark
    ships a vectorized reader for): write a typed projection of
    orders — including a DATE column — as ORC, read it back, and
    aggregate.  The oracle aggregates the parquet directly, so the
    hash-match proves the ORC writer/reader pair is lossless for
    integers, strings, and dates (the src_csv contract, columnar
    edition)."""
    from .registry import _staging
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus",
        F.to_date("o_orderdate").alias("odate"),
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint").alias("cents"))
    path = _staging(sf_dir, "orc_orders")
    o.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    return (back.groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.min("odate").alias("first_date"),
                 F.max("odate").alias("last_date"),
                 (F.sum("cents").cast("double") / 100).alias("total"))
            .orderBy("o_orderstatus"))


SQL_SRC_ORC = """
SELECT o_orderstatus, COUNT(*) AS n,
       MIN(CAST(o_orderdate AS DATE)) AS first_date,
       MAX(CAST(o_orderdate AS DATE)) AS last_date,
       CAST(CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                          AS BIGINT)) AS DOUBLE) / 100 AS DOUBLE)
         AS total
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


# ------------------------------------ snapshot-store roundtrip -----

def q_src_snapshot(spark, sf_dir):
    """Versioned-snapshot roundtrip under the correctness gate:
    write a typed projection of orders as snapshot v1, APPEND the
    rest as v2, read the LATEST snapshot back, and aggregate.  The
    oracle aggregates the parquet directly, so the hash-match proves
    the commit-dir + manifest store is lossless and the append
    lineage reconstructs the full table (the src_csv/src_orc
    write-then-read contract, table-format edition)."""
    from .registry import _staging
    from .storage import read_snapshot, write_snapshot
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus",
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint").alias("cents"))
    table = _staging(sf_dir, "snap_orders")
    # double-run stability WITHIN a process: running this query
    # twice appends two more versions, and the overwrite commit
    # makes LATEST = exactly this run's pair while plans pinned to
    # older versions keep reading their own commit dirs — the
    # store's immutability doing the work other staged queries need
    # overwrite discipline for.  (Cross-build accumulation doesn't
    # arise: _staging is per-(uid,pid) and atexit-reaped, so each
    # process starts from an empty table dir.)
    write_snapshot(o.filter(F.col("o_orderkey") % 2 == 0), table)
    write_snapshot(o.filter(F.col("o_orderkey") % 2 == 1), table,
                   mode="append")
    back = read_snapshot(spark, table)
    return (back.groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"),
                 (F.sum("cents").cast("double") / 100).alias("total"))
            .orderBy("o_orderstatus"))


SQL_SRC_SNAPSHOT = """
SELECT o_orderstatus, COUNT(*) AS n,
       CAST(CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                          AS BIGINT)) AS DOUBLE) / 100 AS DOUBLE)
         AS total
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


QUERIES_EXT11: dict[str, dict] = {
    "source_mix_weights": {"fn": q_source_mix_weights,
                           "sql": SQL_SOURCE_MIX_WEIGHTS},
    "class_weights":      {"fn": q_class_weights,
                           "sql": SQL_CLASS_WEIGHTS},
    "rolling_zscore":     {"fn": q_rolling_zscore,
                           "sql": SQL_ROLLING_ZSCORE},
    "group_median_bp":    {"fn": q_group_median_bp,
                           "sql": SQL_GROUP_MEDIAN_BP},
    "mode_per_group":     {"fn": q_mode_per_group,
                           "sql": SQL_MODE_PER_GROUP},
    "unpivot_long":       {"fn": q_unpivot_long,
                           "sql": SQL_UNPIVOT_LONG},
    "doc_length_hist":    {"fn": q_doc_length_hist,
                           "sql": SQL_DOC_LENGTH_HIST},
    "dup_ratio_by_source": {"fn": q_dup_ratio_by_source,
                            "sql": SQL_DUP_RATIO_BY_SOURCE},
    "group_quartiles_bp": {"fn": q_group_quartiles_bp,
                           "sql": SQL_GROUP_QUARTILES_BP},
    "kcenter_diverse":    {"fn": q_kcenter_diverse,
                           "sql": SQL_KCENTER_DIVERSE},
    "seasonal_profile":   {"fn": q_seasonal_profile,
                           "sql": SQL_SEASONAL_PROFILE},
    "rank_ratios":        {"fn": q_rank_ratios,
                           "sql": SQL_RANK_RATIOS},
    "label_propagation":  {"fn": q_label_propagation,
                           "sql": SQL_LABEL_PROPAGATION},
    "llm_trainprep":      {"fn": q_llm_trainprep,
                           "sql": SQL_LLM_TRAINPREP},
    "recursive_rollup":   {"fn": q_recursive_rollup,
                           "sql": SQL_RECURSIVE_ROLLUP},
    "src_orc":            {"fn": q_src_orc, "sql": SQL_SRC_ORC},
    "src_snapshot":       {"fn": q_src_snapshot,
                           "sql": SQL_SRC_SNAPSHOT},
}
