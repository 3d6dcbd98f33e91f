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
    from .storage import write_snapshot

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus",
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint").alias("cents"))
    src = _staging(sf_dir, "mv_src_orders")
    mv = _staging(sf_dir, "mv_orders_by_status")
    write_snapshot(o.filter(F.col("o_orderkey") % 3 == 0), src,
                   collect_stats=False)
    from .mv import mv_refresh as _r  # noqa: F401 (import locality)
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
    if mv_watermark(mv) != 3 or v is None:
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


QUERIES_EXT13: dict[str, dict] = {
    "snapshot_mv": {"fn": q_snapshot_mv, "sql": SQL_SNAPSHOT_MV},
}
