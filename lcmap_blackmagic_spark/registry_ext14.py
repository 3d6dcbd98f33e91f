"""Fifteenth extension wave (round 9) — merge-on-read equality
deletes under the correctness gate.

``snapshot_delete`` drives storage.delete_from_snapshot end-to-end:
orders lands in two commits, every order row of a customer-key
residue class is equality-deleted WITHOUT rewriting a data file, and
a later append re-introduces rows carrying those same customer keys —
which must SURVIVE (sequence-number scoping, the Iceberg v2 rule).
The oracle reconstructs the final state declaratively, so the
hash-match proves both halves: the delete subtracted exactly the
pre-delete rows, and the post-delete append subtracted nothing.

Reference anchor: the reference's only delete shape is the
chip-level delete-then-insert overwrite (blackmagic/data.py); this is
its row-level, GDPR-shaped generalization on the repo's own table
format.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import _t


def q_snapshot_delete(spark, sf_dir):
    """Two data commits -> equality-delete by o_custkey (keys taken
    FROM the live table, so the delete set exactly covers the
    residue class) -> append the remaining slice (same custkeys
    present: must survive) -> aggregate the MOR read."""
    from .registry import _staging
    from .storage import (delete_from_snapshot, read_snapshot,
                          write_snapshot)

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus",
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint").alias("cents"))
    k = F.col("o_orderkey")
    table = _staging(sf_dir, "mor_orders")
    write_snapshot(o.filter(k % 3 == 0), table, collect_stats=False)
    write_snapshot(o.filter(k % 3 == 1), table, mode="append",
                   collect_stats=False)
    doomed = (read_snapshot(spark, table)
              .filter(F.col("o_custkey") % 10 == 3)
              .select("o_custkey"))
    delete_from_snapshot(spark, table, doomed, "o_custkey")
    write_snapshot(o.filter(k % 3 == 2), table, mode="append",
                   collect_stats=False)
    final = read_snapshot(spark, table)
    return (final.groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 F.sum("cents").alias("sum_cents"),
                 F.min("o_orderkey").alias("min_key"),
                 F.max("o_orderkey").alias("max_key"))
            .orderBy("o_orderstatus"))


SQL_SNAPSHOT_DELETE = """
WITH o AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           AS cents
  FROM orders),
kept AS (
  -- the two pre-delete commits minus the deleted residue class ...
  SELECT * FROM o
  WHERE o_orderkey % 3 IN (0, 1) AND o_custkey % 10 <> 3
  UNION ALL
  -- ... plus the post-delete append, UNTOUCHED by the older delete
  SELECT * FROM o WHERE o_orderkey % 3 = 2)
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(cents) AS BIGINT) AS sum_cents,
       MIN(o_orderkey) AS min_key,
       MAX(o_orderkey) AS max_key
FROM kept GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


def q_snapshot_zorder(spark, sf_dir):
    """OPTIMIZE ZORDER under the gate: orders lands unclustered,
    compact_snapshot_zorder rewrites it into 8 Morton-range commit
    dirs over (o_custkey, o_orderkey/10) — orderkey spans 10× the
    custkey range, so the narrower side is interleaved against the
    normalized wider one (the operator's documented contract) — and
    the result is a PRUNED point read on each key column.  The
    assertion inside checks the manifest pruner actually skipped
    dirs on BOTH columns (the z-layout property); the oracle pins
    that pruning changed nothing about the answer.  Thresholds are
    SF-relative (bottom tenth of custkeys, top tenth of orderkeys)
    so one fixed oracle covers every fixture."""
    from .registry import _staging
    from .storage import (SNAP_MANIFESTS, compact_snapshot_zorder,
                          read_snapshot, write_snapshot)

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey",
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint").alias("cents"))
    table = _staging(sf_dir, "zorder_orders")
    write_snapshot(o, table, collect_stats=False)
    v = compact_snapshot_zorder(
        spark, table, "o_custkey",
        F.floor(F.col("o_orderkey") / 10).cast("bigint"), n_dirs=8)
    import json
    import os
    with open(os.path.join(table, SNAP_MANIFESTS, f"v{v}.json")) as fh:
        n_dirs = len(json.load(fh)["dirs"])
    # planning scalars (one tiny agg): the SF-relative thresholds the
    # oracle recomputes as subqueries
    mx = o.agg(F.max("o_custkey").alias("ck"),
               F.max("o_orderkey").alias("ok")).collect()[0]
    thr_ck, thr_ok = mx["ck"] // 10, mx["ok"] - mx["ok"] // 10

    def pruned(col, op, val, step):
        df = read_snapshot(spark, table, where=(col, op, val))
        scanned = {f.split("/data/")[-1].split("/")[0]
                   for f in df.inputFiles()}
        if not 0 < len(scanned) < n_dirs:
            raise AssertionError(
                f"z-order manifest pruning ineffective on {col}: "
                f"{len(scanned)}/{n_dirs} dirs scanned")
        return (df.agg(F.count(F.lit(1)).alias("n_orders"),
                       F.sum("cents").alias("sum_cents"),
                       F.min("o_orderkey").alias("min_key"),
                       F.max("o_orderkey").alias("max_key"))
                .select(F.lit(step).alias("step"), "*"))

    return (pruned("o_custkey", "<=", thr_ck, "by_custkey")
            .unionByName(pruned("o_orderkey", ">=", thr_ok,
                                "by_orderkey"))
            .orderBy("step"))


SQL_SNAPSHOT_ZORDER = """
WITH o AS (
  SELECT o_orderkey, o_custkey,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           AS cents
  FROM orders),
thr AS (SELECT MAX(o_custkey) // 10 AS ck,
               MAX(o_orderkey) - MAX(o_orderkey) // 10 AS ok
        FROM o),
sides AS (
  SELECT 'by_custkey' AS step, o_orderkey, cents
  FROM o WHERE o_custkey <= (SELECT ck FROM thr)
  UNION ALL
  SELECT 'by_orderkey', o_orderkey, cents
  FROM o WHERE o_orderkey >= (SELECT ok FROM thr))
SELECT step, CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(cents) AS BIGINT) AS sum_cents,
       MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key
FROM sides GROUP BY step ORDER BY step
"""


QUERIES_EXT14: dict[str, dict] = {
    "snapshot_delete": {"fn": q_snapshot_delete,
                        "sql": SQL_SNAPSHOT_DELETE},
    "snapshot_zorder": {"fn": q_snapshot_zorder,
                        "sql": SQL_SNAPSHOT_ZORDER},
}
