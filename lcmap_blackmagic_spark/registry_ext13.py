"""Fourteenth extension wave — incremental materialized-view
maintenance under the correctness gate.

``snapshot_mv`` drives the full MV lifecycle (mv.py) against a real
snapshot table: build the source in three commits, refresh the view
after each (first refresh = full build, the next two = incremental
merges that read ONLY the new commit dirs), replay the last refresh
to prove tag-idempotency, then return the finalized view.  The
oracle aggregates the source parquet directly — the hash-match
proves three incremental merges compose to exactly the one-shot
aggregate (the algebraic-IVM correctness property), not merely that
the plumbing runs.

Reference anchor: the per-tile rollups lcmap-blackmagic recomputes
wholesale per request (blackmagic/blueprints/prediction.py) — this
is the log-driven incremental form of that shape.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import _t

MV_KEYS = ["o_orderstatus"]
MV_SPEC = [
    ("count", "*",          "n_orders"),
    ("sum",   "cents",      "sum_cents"),
    ("min",   "o_orderkey", "min_key"),
    ("max",   "o_orderkey", "max_key"),
    ("avg",   "cents",      "avg_cents"),
]


def q_snapshot_mv(spark, sf_dir):
    """Source commits split by o_orderkey % 3; a refresh after every
    commit, plus one replayed refresh (must be a tag-suppressed
    no-op).  The returned view therefore passed through two genuine
    incremental merges before finalization."""
    from .mv import mv_read, mv_refresh, mv_watermark
    from .registry import _staging
    from .storage import latest_version, write_snapshot

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus",
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint").alias("cents"))
    src = _staging(sf_dir, "mv_src_orders")
    mv = _staging(sf_dir, "mv_orders_by_status")
    write_snapshot(o.filter(F.col("o_orderkey") % 3 == 0), src,
                   collect_stats=False)
    mv_refresh(spark, src, mv, MV_KEYS, MV_SPEC)          # full build
    write_snapshot(o.filter(F.col("o_orderkey") % 3 == 1), src,
                   mode="append", collect_stats=False)
    mv_refresh(spark, src, mv, MV_KEYS, MV_SPEC)          # incremental
    write_snapshot(o.filter(F.col("o_orderkey") % 3 == 2), src,
                   mode="append", collect_stats=False)
    v = mv_refresh(spark, src, mv, MV_KEYS, MV_SPEC)      # incremental
    replay = mv_refresh(spark, src, mv, MV_KEYS, MV_SPEC)
    if replay is not None:            # replayed refresh must be no-op
        raise AssertionError("replayed MV refresh committed a version")
    # compare against the LIVE latest version, not a literal: a
    # second run in the same process appends three more source
    # versions onto the per-process staging table (double-run
    # stability), and the watermark must track whatever is current
    if mv_watermark(mv) != latest_version(src) or v is None:
        raise AssertionError("MV watermark does not track the source")
    return (mv_read(spark, mv, MV_KEYS, MV_SPEC)
            .orderBy("o_orderstatus"))


SQL_SNAPSHOT_MV = """
SELECT o_orderstatus,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                     AS BIGINT)) AS BIGINT) AS sum_cents,
       MIN(o_orderkey) AS min_key,
       MAX(o_orderkey) AS max_key,
       CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                     AS BIGINT)) AS DOUBLE)
         / COUNT(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                      AS BIGINT)) AS avg_cents
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


def q_snapshot_mv_hll(spark, sf_dir):
    """Incrementally maintained approx-distinct: an MV with an
    ``hll`` aggregate (dense 256-register partials, element-wise-MAX
    merge) refreshed across three source commits must finalize to
    the one-shot sketch's exact estimate — the oracle recomputes the
    registers over the FULL table in SQL (the registry_ext4
    hll_sketch construction re-pointed at orders), so the hash-match
    proves register merging is lossless across refreshes, not just
    that the estimate is plausible."""
    from .mv import mv_read, mv_refresh
    from .registry import _staging
    from .storage import write_snapshot

    o = _t(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_custkey",
        (F.col("o_orderkey") % 3).alias("slice"))
    src = _staging(sf_dir, "mv_hll_src")
    mv = _staging(sf_dir, "mv_hll_view")
    keys = ["o_orderstatus"]
    spec = [("count", "*", "n_orders"),
            ("hll", "o_custkey", "approx_customers")]
    for s in range(3):
        write_snapshot(o.filter(F.col("slice") == s).drop("slice"), src,
                       mode="overwrite" if s == 0 else "append",
                       collect_stats=False)
        mv_refresh(spark, src, mv, keys, spec)
    return (mv_read(spark, mv, keys, spec)
            .orderBy("o_orderstatus"))


def _sql_snapshot_mv_hll() -> str:
    from .mv import MV_HLL_P
    from .operators.sketches import H48, hll_alpha_numerator
    p = MV_HLL_P
    m = 1 << p
    rest = 48 - p
    wmod = 1 << rest
    return f"""
WITH h AS (
  SELECT o_orderstatus,
         CAST('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 12)
              AS BIGINT) AS h
  FROM orders),
r AS (
  SELECT o_orderstatus, h // {wmod} AS bucket,
         CASE WHEN h % {wmod} = 0 THEN {rest + 1}
              ELSE {rest + 1} - length(bin(h % {wmod})) END AS rho
  FROM h),
mx AS (SELECT o_orderstatus, bucket, MAX(rho) AS mreg
       FROM r GROUP BY o_orderstatus, bucket),
a AS (SELECT o_orderstatus,
             SUM(CAST(1 AS BIGINT) << (48 - mreg)) AS s,
             COUNT(*) AS nb
      FROM mx GROUP BY o_orderstatus),
n AS (SELECT o_orderstatus, COUNT(*) AS n_orders
      FROM orders GROUP BY o_orderstatus)
SELECT n.o_orderstatus, n.n_orders,
       {hll_alpha_numerator(p)!r}
         / CAST(a.s + ({m} - a.nb) * {H48} AS DOUBLE)
         AS approx_customers
FROM n JOIN a USING (o_orderstatus)
ORDER BY o_orderstatus
"""


def q_snapshot_merge(spark, sf_dir):
    """Copy-on-write MERGE INTO on a snapshot table
    (storage.merge_into_snapshot) under the gate: orders lands in two
    key-ranged commits, the merge_upsert U/D/I change set
    (registry_ext4._order_changes) is applied as a ``merge`` commit,
    and the merged snapshot is read back and summarized per status —
    deletes, +5%% updates, and inserts all visible in the aggregate.
    Shares the change-set oracle with ``merge_upsert``
    (registry_ext4.SQL_MERGE_UPSERT), so the two entries pin that the
    table-format COW path and the plain DataFrame path produce the
    identical relation; dir-level rewrite pruning is pinned
    separately by tests/test_snapshot_merge.py."""
    from .registry import _staging
    from .registry_ext4 import _order_changes
    from .storage import merge_into_snapshot, read_snapshot, write_snapshot

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus",
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"))
    mid = 3_000_000   # splits every sf's key space into two commits
    table = _staging(sf_dir, "snap_merge_orders")
    write_snapshot(o.filter(F.col("o_orderkey") <= mid), table)
    write_snapshot(o.filter(F.col("o_orderkey") > mid), table,
                   mode="append")
    merge_into_snapshot(spark, table, _order_changes(o), "o_orderkey")
    merged = read_snapshot(spark, table)
    return (merged.groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 F.sum("price").cast("double").alias("total_price")))


def _sql_snapshot_merge() -> str:
    from .registry_ext4 import SQL_MERGE_UPSERT
    return SQL_MERGE_UPSERT


def q_snapshot_mv_quantiles(spark, sf_dir):
    """Incrementally maintained approx-quantiles: an MV with q50/q90
    aggregates (dense bin-count partials summed across refreshes)
    over three source commits must finalize to the one-shot
    fixed-bin sketch's exact estimate — the oracle recomputes bins +
    the rank/interpolation walk over the FULL table in SQL, so the
    hash-match proves bin-array merging is lossless."""
    from .mv import mv_read, mv_refresh
    from .registry import _staging
    from .storage import write_snapshot

    o = _t(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_totalprice",
        (F.col("o_orderkey") % 3).alias("slice"))
    src = _staging(sf_dir, "mv_q_src")
    mv = _staging(sf_dir, "mv_q_view")
    keys = ["o_orderstatus"]
    spec = [("count", "*", "n_orders"),
            ("q50", "o_totalprice", "median_price"),
            ("q90", "o_totalprice", "p90_price")]
    for s in range(3):
        write_snapshot(o.filter(F.col("slice") == s).drop("slice"), src,
                       mode="overwrite" if s == 0 else "append",
                       collect_stats=False)
        mv_refresh(spark, src, mv, keys, spec)
    return (mv_read(spark, mv, keys, spec)
            .orderBy("o_orderstatus"))


def _sql_snapshot_mv_quantiles() -> str:
    from .mv import MV_HIST_BINS, MV_HIST_HI, MV_HIST_LO, MV_HIST_SCALE
    width = int((MV_HIST_HI - MV_HIST_LO) * MV_HIST_SCALE) // MV_HIST_BINS
    lo_s = int(MV_HIST_LO * MV_HIST_SCALE)
    qsel, qjoin = [], []
    for q, alias in ((0.5, "median_price"), (0.9, "p90_price")):
        pct = int(q * 100)
        qsel.append(f"""q{pct} AS (
  SELECT o_orderstatus,
         ROUND(CAST({lo_s} + bin * {width}
                    + ({width} * (CAST(CEIL(n * {q}) AS BIGINT)
                                  - cum + c)) / c AS DOUBLE)
               / {MV_HIST_SCALE}, 6) AS {alias}
  FROM cum
  WHERE cum >= CAST(CEIL(n * {q}) AS BIGINT)
    AND cum - c < CAST(CEIL(n * {q}) AS BIGINT))""")
        qjoin.append(f"JOIN q{pct} USING (o_orderstatus)")
    return f"""
WITH s AS (
  SELECT o_orderstatus,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * {MV_HIST_SCALE}
              AS BIGINT) AS v
  FROM orders WHERE o_totalprice IS NOT NULL),
b AS (
  SELECT o_orderstatus,
         LEAST({MV_HIST_BINS - 1},
               GREATEST(0, (v - {lo_s}) // {width})) AS bin
  FROM s),
bc AS (SELECT o_orderstatus, bin, COUNT(*) AS c FROM b GROUP BY 1, 2),
cum AS (SELECT o_orderstatus, bin, c,
               SUM(c) OVER (PARTITION BY o_orderstatus
                            ORDER BY bin) AS cum,
               SUM(c) OVER (PARTITION BY o_orderstatus) AS n
        FROM bc),
base AS (SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_orders
         FROM orders GROUP BY o_orderstatus),
{",".join(qsel)}
SELECT base.o_orderstatus, base.n_orders, median_price, p90_price
FROM base {" ".join(qjoin)}
ORDER BY o_orderstatus
"""


def q_snapshot_compact(spark, sf_dir):
    """OPTIMIZE under the gate: orders lands as FOUR appended
    commits, compact_snapshot rewrites them into one key-clustered
    dir, and the aggregate of the compacted latest must equal the
    plain orders aggregate — content neutrality proven against the
    source-of-truth oracle, not against the pre-compaction read.
    The CDF zero-diff and stats-tightening halves are pinned in
    tests/test_snapshot_changes.py."""
    from .registry import _staging
    from .storage import (compact_snapshot, latest_version,
                          read_snapshot, write_snapshot)

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus",
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint").alias("cents"))
    table = _staging(sf_dir, "compact_orders")
    for s in range(4):
        write_snapshot(o.filter(F.col("o_orderkey") % 4 == s), table,
                       mode="overwrite" if s == 0 else "append",
                       collect_stats=False)
    v = compact_snapshot(spark, table, sort_by="o_orderkey")
    if v != latest_version(table):
        raise AssertionError("compaction did not publish latest")
    back = read_snapshot(spark, table)
    return (back.groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("cents").alias("sum_cents"),
                 F.min("o_orderkey").alias("min_key"),
                 F.max("o_orderkey").alias("max_key"))
            .orderBy("o_orderstatus"))


SQL_SNAPSHOT_COMPACT = """
SELECT o_orderstatus, COUNT(*) AS n,
       CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                     AS BIGINT)) AS BIGINT) AS sum_cents,
       MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


def q_snapshot_cdf(spark, sf_dir):
    """Change-data-feed under the gate, BOTH physical paths in one
    result: step 'append' diffs a pure-append range (fast path —
    delta commit dirs only, every change an insert) and step
    'overwrite' diffs across an overwrite (general path — join-free
    ±1 multiset diff).  Versions come from write_snapshot's returns,
    never literals, so a second run in the same process (three more
    versions on the staging table) diffs its own commits.  The
    oracle recomputes both deltas from the slice predicates — the
    hash-match proves the feed is exactly state difference."""
    from .registry import _staging
    from .storage import snapshot_changes, write_snapshot

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus",
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint").alias("cents"))
    k = F.col("o_orderkey")
    table = _staging(sf_dir, "cdf_orders")
    v1 = write_snapshot(o.filter(k % 3 == 0), table,
                        collect_stats=False)
    v2 = write_snapshot(o.filter(k % 3 == 1), table, mode="append",
                        collect_stats=False)
    v3 = write_snapshot(o.filter(k % 3 != 0), table,
                        collect_stats=False)

    def agg(df, step):
        return (df.groupBy("_change_type")
                .agg(F.sum("_n").alias("n_changes"),
                     F.sum(F.col("cents") * F.col("_n")).alias("cents_sum"),
                     F.min("o_orderkey").alias("min_key"),
                     F.max("o_orderkey").alias("max_key"))
                .select(F.lit(step).alias("step"), "_change_type",
                        "n_changes", "cents_sum", "min_key", "max_key"))

    return (agg(snapshot_changes(spark, table, v1, v2), "append")
            .unionByName(agg(snapshot_changes(spark, table, v1, v3),
                             "overwrite"))
            .orderBy("step", "_change_type"))


SQL_SNAPSHOT_CDF = """
WITH base AS (
  SELECT o_orderkey AS k,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           AS cents
  FROM orders),
ch AS (
  -- append range v1->v2: state adds exactly the k%3=1 slice
  SELECT 'append' AS step, 'insert' AS _change_type, k, cents
  FROM base WHERE k % 3 = 1
  UNION ALL
  -- overwrite range v1->v3: k%3=0 leaves, k%3 IN (1,2) arrives
  SELECT 'overwrite', 'delete', k, cents FROM base WHERE k % 3 = 0
  UNION ALL
  SELECT 'overwrite', 'insert', k, cents FROM base WHERE k % 3 <> 0)
SELECT step, _change_type,
       CAST(COUNT(*) AS BIGINT) AS n_changes,
       CAST(SUM(cents) AS BIGINT) AS cents_sum,
       MIN(k) AS min_key, MAX(k) AS max_key
FROM ch GROUP BY step, _change_type ORDER BY step, _change_type
"""


QUERIES_EXT13: dict[str, dict] = {
    "snapshot_mv":     {"fn": q_snapshot_mv, "sql": SQL_SNAPSHOT_MV},
    "snapshot_mv_hll": {"fn": q_snapshot_mv_hll,
                        "sql": _sql_snapshot_mv_hll()},
    "snapshot_merge":  {"fn": q_snapshot_merge,
                        "sql": _sql_snapshot_merge()},
    "snapshot_cdf":    {"fn": q_snapshot_cdf, "sql": SQL_SNAPSHOT_CDF},
    "snapshot_compact": {"fn": q_snapshot_compact,
                         "sql": SQL_SNAPSHOT_COMPACT},
    "snapshot_mv_quantiles": {"fn": q_snapshot_mv_quantiles,
                              "sql": _sql_snapshot_mv_quantiles()},
}
