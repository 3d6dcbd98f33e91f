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


QUERIES_EXT14: dict[str, dict] = {
    "snapshot_delete": {"fn": q_snapshot_delete,
                        "sql": SQL_SNAPSHOT_DELETE},
}
