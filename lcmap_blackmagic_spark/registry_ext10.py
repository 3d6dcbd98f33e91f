"""Eleventh extension wave — at-scale quantile bucketing.

``quality_deciles`` / ``rfm_scores`` (registry_ext7/8) rank with a
global ``ntile`` — a single-partition sort that is fine as an oracle
twin but a straight OOM at 10^12 rows.  This wave adds their
``_bp`` (breakpoint) twins: EXACT value-threshold bucketing computed
from per-value counts with a three-level distributed prefix sum, so
the physical plan contains

- no unpartitioned WindowExec at all (the audit bans them),
- no global sort — every join is equi-shaped except one
  BroadcastNestedLoopJoin over the level-2 group totals, whose row
  count is bounded by value_domain / 2^20, not by table size.

Semantics differ from ``ntile`` only on ties: all rows sharing a
value land in the same bucket (bucket = floor(nb * count_below / N)
+ 1), which is the bucketing every at-scale system actually ships
(tied keys cannot be split deterministically without a total-order
sort).  Both engines compute the identical integer formula, so the
oracles are exact, not approximate.

Values must be non-negative integers (epoch days, counts, cents,
char counts) so Spark ``div`` and DuckDB ``//`` agree; every metric
here is.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .registry import _t

# Coarse-group widths for the three-level prefix sum.  Level-0 joins
# values within a g1 group (≤ 1024 distinct values), level-1 joins g1
# totals within a g2 group (≤ 1024 groups), level-2 prefixes the g2
# totals with a tiny broadcast NLJ (domain / 2^20 rows).
_G1 = 1024
_G2 = 1024 * 1024


def _strict_prefix(tbl: DataFrame, eq: list, ltc: str, sumc: str,
                   outc: str, keep: list,
                   broadcast_b: bool = False) -> DataFrame:
    """For each row of ``tbl``: the sum of ``sumc`` over rows with
    equal ``eq`` keys and a strictly smaller ``ltc`` — one level of
    the prefix-sum pyramid.  Equi-shaped whenever ``eq`` is
    non-empty; the single keyless level joins a provably tiny,
    broadcast side."""
    a, b = tbl.alias("a"), tbl.alias("b")
    cond = F.col(f"b.{ltc}") < F.col(f"a.{ltc}")
    for c in eq:
        cond = (F.col(f"a.{c}") == F.col(f"b.{c}")) & cond
    side = F.broadcast(b) if broadcast_b else b
    return (a.join(side, cond, "left")
            .groupBy(*[F.col(f"a.{c}").alias(c) for c in keep])
            .agg(F.coalesce(F.sum(f"b.{sumc}"), F.lit(0)).alias(outc)))


def cum_below(df: DataFrame, vcol: str, by: tuple = ()) -> DataFrame:
    """(by..., v, c, cum_lt) — for each distinct value of ``vcol``
    (within each ``by`` group), its row count and the EXACT number
    of rows with a strictly smaller value, via per-value counts and
    a three-level prefix sum.

    Levels 0 and 1 are PARTITIONED windows (≤1024 rows per
    partition by construction — a bounded local sort, never the
    global-ntile single-partition trap and never a pair blowup: the
    first cut of this helper self-joined within each level and hit
    ~50M compared pairs on dense cent domains, 8 s at sf0.1 vs
    sub-second for the window form).  Only the level-2 prefix over
    the g2 group totals is a join — domain / 2^20 rows, broadcast
    in the keyless case, equi-shaped once ``by`` keys exist.  All
    integer math either way."""
    by = list(by)
    from pyspark.sql import Window
    cnt = (df.groupBy(*by, F.col(vcol).alias("v"))
           .agg(F.count(F.lit(1)).alias("c"))
           .select(*by, "v", "c",
                   F.expr("v div {}".format(_G1)).alias("g1"),
                   F.expr("v div {}".format(_G2)).alias("g2")))
    # level-0 strict prefix within each g1 partition (≤1024 distinct
    # values — v is unique within cnt, so the ROWS frame is exact)
    w0 = (Window.partitionBy(*by, "g1").orderBy("v")
          .rowsBetween(Window.unboundedPreceding, -1))
    cnt = cnt.withColumn(
        "below0", F.coalesce(F.sum("c").over(w0), F.lit(0)))
    # level-1 strict prefix of g1 totals within each g2 partition
    t1 = cnt.groupBy(*by, "g1", "g2").agg(F.sum("c").alias("tc1"))
    w1 = (Window.partitionBy(*by, "g2").orderBy("g1")
          .rowsBetween(Window.unboundedPreceding, -1))
    p1 = t1.withColumn(
        "below1", F.coalesce(F.sum("tc1").over(w1), F.lit(0)))
    # level-2 strict prefix: rows = distinct g2 = domain / 2^20 per
    # by-group — tiny; broadcast NLJ only in the keyless case
    t2 = t1.groupBy(*by, "g2").agg(F.sum("tc1").alias("tc2"))
    p2 = _strict_prefix(t2, by, "g2", "tc2", "below2", by + ["g2"],
                        broadcast_b=not by)
    return (cnt
            .join(p1.select(*by, "g1", "g2", "below1"),
                  by + ["g1", "g2"])
            .join(p2, by + ["g2"])
            .select(*by, "v", "c",
                    (F.col("below0") + F.col("below1")
                     + F.col("below2")).alias("cum_lt")))


def bucketize(df: DataFrame, vcol: str, n_buckets: int,
              out: str) -> DataFrame:
    """Add ``out`` = floor(n_buckets * cum_lt(v) / N) + 1 — exact
    tie-collapsed quantile bucket of ``vcol``.  The bucket map joins
    back on the value (shuffle equi-join: distinct-value cardinality
    can approach table size for near-unique metrics like monetary
    cents, so it is NOT broadcast); N rides along as a one-row
    broadcast."""
    cum = cum_below(df, vcol).select("v", "cum_lt")
    n = df.agg(F.count(F.lit(1)).alias("n_total"))
    return (df.join(cum, df[vcol] == cum["v"])
            .join(F.broadcast(n))
            .withColumn(out, F.expr(
                "(({} * cum_lt) div n_total) + 1".format(n_buckets)))
            .drop("v", "cum_lt", "n_total"))


def _sql_cum(src: str, vexpr: str, pfx: str, by: tuple = ()) -> str:
    """DuckDB CTE block mirroring cum_below over ``src``(``vexpr``),
    optionally per ``by`` group; emits CTE ``{pfx}cum``(by..., v, c,
    cum_lt)."""
    by = list(by)
    bsel = "".join(f"{c}, " for c in by)               # leading cols
    absel = "".join(f"a.{c}, " for c in by)            # a-qualified
    p0b = "".join(f"p0.{c}, " for c in by)
    eq = " AND ".join(f"a.{c} = b.{c}" for c in by)
    eq_and = f"{eq} AND " if eq else ""
    j01 = " AND ".join([f"p0.{c} = p1.{c}" for c in by]
                       + ["p0.g1 = p1.g1", "p0.g2 = p1.g2"])
    j02 = " AND ".join([f"p0.{c} = p2.{c}" for c in by]
                       + ["p0.g2 = p2.g2"])
    return f"""
{pfx}cnt AS (
  SELECT {bsel}{vexpr} AS v, CAST(COUNT(*) AS BIGINT) AS c,
         {vexpr} // {_G1} AS g1, {vexpr} // {_G2} AS g2
  FROM {src} GROUP BY ALL),
{pfx}t1 AS (SELECT {bsel}g1, g2, CAST(SUM(c) AS BIGINT) AS tc1
            FROM {pfx}cnt GROUP BY ALL),
{pfx}t2 AS (SELECT {bsel}g2, CAST(SUM(tc1) AS BIGINT) AS tc2
            FROM {pfx}t1 GROUP BY ALL),
{pfx}p2 AS (
  SELECT {absel}a.g2, COALESCE(CAST(SUM(b.tc2) AS BIGINT), 0) AS below2
  FROM {pfx}t2 a LEFT JOIN {pfx}t2 b ON {eq_and}b.g2 < a.g2
  GROUP BY ALL),
{pfx}p1 AS (
  SELECT {absel}a.g1, a.g2,
         COALESCE(CAST(SUM(b.tc1) AS BIGINT), 0) AS below1
  FROM {pfx}t1 a LEFT JOIN {pfx}t1 b
    ON {eq_and}a.g2 = b.g2 AND b.g1 < a.g1
  GROUP BY ALL),
{pfx}p0 AS (
  SELECT {absel}a.v, a.c, a.g1, a.g2,
         COALESCE(CAST(SUM(b.c) AS BIGINT), 0) AS below0
  FROM {pfx}cnt a LEFT JOIN {pfx}cnt b
    ON {eq_and}a.g1 = b.g1 AND b.v < a.v
  GROUP BY ALL),
{pfx}cum AS (
  SELECT {p0b}p0.v, p0.c, below0 + below1 + below2 AS cum_lt
  FROM {pfx}p0 p0
  JOIN {pfx}p1 p1 ON {j01}
  JOIN {pfx}p2 p2 ON {j02})"""


# -------------------------------------- quality deciles, at scale ---

def q_quality_deciles_bp(spark, sf_dir):
    """At-scale twin of ``quality_deciles``: decile = exact
    tie-collapsed value bucket from the distributed prefix sum —
    no global ntile sort anywhere in the plan (the ntile form stays
    registered as the oracle-parity twin; this is the form you run
    at 10^12 rows)."""
    d = _t(spark, sf_dir, "documents")
    b = bucketize(d, "n_chars", 10, "decile")
    return (b.groupBy("decile")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.min("n_chars").alias("min_chars"),
                 F.max("n_chars").alias("max_chars"),
                 F.countDistinct("lang").alias("n_langs"))
            .orderBy("decile"))


SQL_QUALITY_DECILES_BP = f"""
WITH {_sql_cum("documents", "n_chars", "d_")},
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM documents),
b AS (
  SELECT d.doc_id, d.n_chars, d.lang,
         (10 * c.cum_lt) // n.n_total + 1 AS decile
  FROM documents d
  JOIN d_cum c ON d.n_chars = c.v CROSS JOIN n)
SELECT decile, COUNT(*) AS n, MIN(n_chars) AS min_chars,
       MAX(n_chars) AS max_chars, COUNT(DISTINCT lang) AS n_langs
FROM b GROUP BY decile ORDER BY decile
"""


# ------------------------------------------- RFM scores, at scale ---

def q_rfm_scores_bp(spark, sf_dir):
    """At-scale twin of ``rfm_scores``: the three quintile scores
    come from three exact breakpoint bucketings instead of three
    global ntile sorts.  per-customer metrics are staged to parquet
    once (seven plan consumers would otherwise re-aggregate orders
    seven times — the minhash staging lesson); every downstream join
    is equi-shaped."""
    from .registry import _staging
    o = _t(spark, sf_dir, "orders")
    per_cust = (o.groupBy("o_custkey")
                .agg(F.max(F.datediff(
                        F.to_date("o_orderdate"),
                        F.lit("1970-01-01").cast("date")))
                     .alias("recency"),
                     F.count(F.lit(1)).alias("frequency"),
                     (F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                      * 100).cast("bigint").alias("monetary")))
    staging = _staging(sf_dir, "rfm_percust")
    per_cust.write.mode("overwrite").parquet(staging)
    pc = spark.read.parquet(staging)
    n = pc.agg(F.count(F.lit(1)).alias("n_total"))

    # one bucket MAP per metric, each computed straight from the
    # staged scan (chaining bucketize() would fold each previous
    # join into the next pyramid's lineage and re-execute it), then
    # one 3-way join of the maps onto the staged rows
    def bucket_map(vcol: str, out: str):
        return (cum_below(pc, vcol)
                .join(F.broadcast(n))
                .select(F.col("v").alias(f"__{out}_v"),
                        F.expr("((5 * cum_lt) div n_total) + 1")
                        .alias(out)))

    r = bucket_map("recency", "r")
    f = bucket_map("frequency", "f")
    m = bucket_map("monetary", "m")
    b = (pc.join(r, pc["recency"] == r["__r_v"])
         .join(f, pc["frequency"] == f["__f_v"])
         .join(m, pc["monetary"] == m["__m_v"]))
    return (b.groupBy("r", "f", "m")
            .agg(F.count(F.lit(1)).alias("n_customers"),
                 F.min("o_custkey").alias("min_cust"),
                 F.max("o_custkey").alias("max_cust")))


SQL_RFM_SCORES_BP = f"""
WITH per_cust AS (
  SELECT o_custkey,
         MAX(CAST(o_orderdate AS DATE) - DATE '1970-01-01') AS recency,
         COUNT(*) AS frequency,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
           AS monetary
  FROM orders GROUP BY o_custkey),
{_sql_cum("per_cust", "recency", "r_")},
{_sql_cum("per_cust", "frequency", "f_")},
{_sql_cum("per_cust", "monetary", "m_")},
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM per_cust),
b AS (
  SELECT p.o_custkey,
         (5 * rc.cum_lt) // n.n_total + 1 AS r,
         (5 * fc.cum_lt) // n.n_total + 1 AS f,
         (5 * mc.cum_lt) // n.n_total + 1 AS m
  FROM per_cust p
  JOIN r_cum rc ON p.recency = rc.v
  JOIN f_cum fc ON p.frequency = fc.v
  JOIN m_cum mc ON p.monetary = mc.v
  CROSS JOIN n)
SELECT r, f, m, COUNT(*) AS n_customers,
       MIN(o_custkey) AS min_cust, MAX(o_custkey) AS max_cust
FROM b GROUP BY r, f, m
"""


QUERIES_EXT10: dict[str, dict] = {
    "quality_deciles_bp": {"fn": q_quality_deciles_bp,
                           "sql": SQL_QUALITY_DECILES_BP},
    "rfm_scores_bp":      {"fn": q_rfm_scores_bp,
                           "sql": SQL_RFM_SCORES_BP},
}
