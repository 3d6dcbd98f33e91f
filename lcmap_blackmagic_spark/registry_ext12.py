"""Thirteenth extension wave — scale-safe twins for the
low-cardinality-partition window family (round-6 verdict, "What's
wrong #1").

``rank_ratios`` and ``rolling_zscore`` (registry_ext11) are
oracle-exact but window over partition keys with ~5 distinct values
(o_orderpriority / event_type): at 10^12 rows each window partition
is ~2x10^11 rows sorted in ONE task — the global-ntile trap with a
constant factor of 5.  This wave ships their at-scale twins; the
originals stay as parity forms (the quality_deciles/_bp
arrangement):

- ``rank_ratios_bp``: percent_rank / cume_dist as EXACT integer
  rationals from the registry_ext10 prefix-sum pyramid —
  pct_rank = cum_lt/(N-1), cume = (cum_lt+c)/N per distinct value,
  tie-collapsed (ORDER BY cents alone), which is precisely the
  standard SQL definition of both functions under ties.  The
  oracle is DuckDB's NATIVE percent_rank()/cume_dist() window — a
  genuinely independent implementation — and matches bit-exactly
  because both sides perform the same two integer-to-double
  divisions (operands < 2^53, IEEE division is correctly rounded).
  No window partition in the plan exceeds 1024 rows.

- ``rolling_zscore_bp``: the trailing-32-row 3-sigma flags re-keyed
  by (event_type, epoch_day) with an EXACT cross-day carry, so the
  biggest window partition is one day's volume for one type — the
  honest streaming-scale bound — instead of a whole type's history.
  The construction (all auxiliary steps are day-level or <=1024-row
  partitions):

    1. candidates  = last <=32 rows of each active (type, day)
       (row_number over the composite key, partition = one day);
    2. active days get a per-type index (window over the DAY-LEVEL
       table: #days rows per type, independent of row count);
    3. each candidate is exploded into the next 32 ACTIVE day
       indexes (array explode — no join blowup, day-level volume
       x32x32) and equi-joined back to real target days;
    4. per target day, carries are truncated to the top 32 by
       (t_us, event_id) desc (partition <= 32x32 = 1024 rows);
    5. carries (flagged) union the day's own rows; the trailing
       frame runs within (type, day) and carry rows are dropped
       from the output.

  EXACTNESS: the global trailing-32 of any row lives entirely in
  the carried top-32-of-prefix plus same-day predecessors.  Proof
  sketch: a prefix row >32 active days back is dominated by >=1 row
  from each of the 32 newer active days; within its own day a
  prefix row outside the day's last-32 is dominated by 32 same-day
  rows.  So the carry superset contains the true top-32 of the
  prefix, truncation keeps exactly it, and the (-32,-1) frame over
  [carries, day rows] reproduces the global frame row-for-row —
  which is why the ORACLE is the naive global-window SQL verbatim
  (SQL_ROLLING_ZSCORE), not a mirror of this construction.

Reference anchor: the ranking family feeds SURVEY §2.5's window
build (A1 pct-of-total pattern); the anomaly flags are the batch
twin of streaming/jobs.py zscore_stream.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .registry import _t
from .registry_ext10 import cum_below
from .registry_ext11 import ZS_K, ZS_MIN_N, ZS_WIN, SQL_ROLLING_ZSCORE

# ------------------------------------ rank ratios, at scale --------


def q_rank_ratios_bp(spark, sf_dir):
    """At-scale twin of ``rank_ratios``: the two relative-standing
    ratios from per-value counts instead of a per-priority (5
    partitions!) table-sized sort.  Tie-collapsed semantics (ORDER
    BY cents alone) — the definitionally correct percent_rank/
    cume_dist under ties, and the only one computable without a
    total order.  The value->rank map joins back on (grp, cents)
    (shuffle equi-join — cents is near-unique, so it is NOT
    broadcast); N per group rides along as a 5-row broadcast."""
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderpriority").alias("grp"),
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint").alias("cents"))
    cum = cum_below(o, "cents", by=("grp",)).select(
        "grp", F.col("v").alias("cents"), "c", "cum_lt")
    n = o.groupBy("grp").agg(F.count(F.lit(1)).alias("n_grp"))
    return (o.filter(F.col("k") % 7 == 0)
            .join(cum, ["grp", "cents"])
            .join(F.broadcast(n), "grp")
            .select(
                "k", "grp", "cents",
                # percent_rank := (rank-1)/(N-1); rank-1 = cum_lt.
                # N=1 => 0 by definition (both engines agree)
                F.when(F.col("n_grp") == 1, F.lit(0.0))
                .otherwise(F.col("cum_lt").cast("double")
                           / (F.col("n_grp") - 1).cast("double"))
                .alias("pct_rank"),
                # cume_dist := rows <= v / N = (cum_lt + c)/N
                ((F.col("cum_lt") + F.col("c")).cast("double")
                 / F.col("n_grp").cast("double")).alias("cume")))


SQL_RANK_RATIOS_BP = """
WITH src AS (
  SELECT o_orderkey AS k, o_orderpriority AS grp,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           AS cents
  FROM orders)
SELECT k, grp, cents,
       percent_rank() OVER w AS pct_rank,
       cume_dist() OVER w AS cume
FROM src
WINDOW w AS (PARTITION BY grp ORDER BY cents)
QUALIFY k % 7 = 0
"""


# ---------------------------------- rolling z-score, at scale ------

ZS_DAY_US = 86_400_000_000  # epoch-day bucketing in integer math


def q_rolling_zscore_bp(spark, sf_dir):
    """At-scale twin of ``rolling_zscore``: identical flags (same
    trailing-32 3-sigma test, same DECIMAL(38,0) moment math), but
    every window partitions by (event_type, epoch_day) — biggest
    sorted partition = one day of one type — with an exact carry of
    the top-32 prefix rows across day boundaries (see module
    docstring for the construction + exactness proof).  Day
    bucketing is integer epoch-day from unix_micros — never a
    calendar function (the events column is LTZ; the cohort_
    retention lesson)."""
    e = _t(spark, sf_dir, "events")
    base = (e.filter(F.col("value").isNotNull())
            .select("event_id", "event_type",
                    F.expr("unix_micros(ts)").alias("t_us"),
                    (F.col("value").cast("decimal(18,2)") * 100)
                    .cast("bigint").alias("cents"))
            .withColumn("day", F.expr(f"t_us div {ZS_DAY_US}")))

    # active-day index per type — DAY-LEVEL table (rows = distinct
    # (type, day)), so the per-type window is bounded by #days, not
    # by event volume
    days = base.select("event_type", "day").distinct()
    wd = Window.partitionBy("event_type").orderBy("day")
    days = days.select("event_type", "day",
                       F.row_number().over(wd).alias("didx"))

    # last <=32 rows of each active (type, day): composite-key
    # partition, one day's volume max
    wtail = (Window.partitionBy("event_type", "day")
             .orderBy(F.desc("t_us"), F.desc("event_id")))
    cand = (base.withColumn("rn_desc", F.row_number().over(wtail))
            .filter(F.col("rn_desc") <= ZS_WIN).drop("rn_desc")
            .join(days.select("event_type", "day", "didx"),
                  ["event_type", "day"]))

    # explode each candidate into the next 32 ACTIVE day indexes
    # (generator, not a join) and map indexes back to real days —
    # the inner join drops targets past the last active day
    offsets = F.array(*[F.lit(j) for j in range(1, ZS_WIN + 1)])
    carry = (cand
             .withColumn("j", F.explode(offsets))
             .withColumn("tidx", F.col("didx") + F.col("j"))
             .join(days.select("event_type",
                               F.col("didx").alias("tidx"),
                               F.col("day").alias("tday")),
                   ["event_type", "tidx"])
             .select("event_type", F.col("tday").alias("day"),
                     "event_id", "t_us", "cents"))

    # truncate to the true top-32-of-prefix per target day
    # (partition <= 32x32 rows by construction)
    wc = (Window.partitionBy("event_type", "day")
          .orderBy(F.desc("t_us"), F.desc("event_id")))
    carry = (carry.withColumn("rn", F.row_number().over(wc))
             .filter(F.col("rn") <= ZS_WIN).drop("rn")
             .withColumn("is_carry", F.lit(True)))

    u = base.withColumn("is_carry", F.lit(False)).unionByName(carry)
    w = (Window.partitionBy("event_type", "day")
         .orderBy("t_us", "event_id").rowsBetween(-ZS_WIN, -1))
    # identical moment math to rolling_zscore: DECIMAL(38,0) sums
    # (cents^2 wraps int64 at ~$30M), one cross-multiplied integer
    # comparison, no float/sqrt
    dcents = F.col("cents").cast("decimal(38,0)")
    stats = u.select(
        "event_id", "event_type", "cents", "is_carry",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum(dcents).over(w).alias("s"),
        F.sum(dcents * F.col("cents")).over(w).alias("q"))
    dn = F.col("n").cast("decimal(38,0)")
    dx = F.col("cents").cast("decimal(38,0)")
    dev = dn * dx - F.col("s")
    var_n2 = dn * F.col("q") - F.col("s") * F.col("s")
    return (stats
            .filter((~F.col("is_carry"))
                    & (F.col("n") >= ZS_MIN_N)
                    & (dev * dev > ZS_K * ZS_K * var_n2))
            .select("event_id", "event_type", "cents", "n"))


def q_src_snapshot_stream(spark, sf_dir):
    """The snapshot store's STREAMING reader under the correctness
    gate (sources/snapshotstream.py): write a typed orders projection
    as an overwrite version plus an append version, TAIL the commit
    log from just before the overwrite with a real Structured
    Streaming query (availableNow drain into parquet), and aggregate
    the drained rows.  The overwrite version re-emits its full
    content and the append version streams its delta, so the drain
    reconstructs the table exactly once per row — the oracle
    aggregates the source parquet directly, proving end-to-end
    exactly-once delivery through manifest-offset tracking, not just
    storage losslessness (that is ``src_snapshot``'s job)."""
    import os
    import uuid

    from .registry import _staging
    from .sources.snapshotstream import read_snapshot_stream
    from .storage import write_snapshot

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus",
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint").alias("cents"))
    table = _staging(sf_dir, "snap_stream_orders")
    # start tailing just before this run's overwrite: double-running
    # the query appends two MORE versions, and the overwrite+delta
    # pair after start_version always reconstructs exactly one copy
    v_over = write_snapshot(o.filter(F.col("o_orderkey") % 2 == 0),
                            table)
    write_snapshot(o.filter(F.col("o_orderkey") % 2 == 1), table,
                   mode="append")
    # run-unique sink/checkpoint UNDER the reaped staging root (a
    # reused file sink would accumulate across double-runs; a bare
    # mkdtemp would leak past the process)
    run_dir = os.path.join(_staging(sf_dir, "snap_stream_runs"),
                           uuid.uuid4().hex[:12])
    out = os.path.join(run_dir, "out")
    q = (read_snapshot_stream(spark, table, start_version=v_over - 1)
         .writeStream.format("parquet").option("path", out)
         .option("checkpointLocation", os.path.join(run_dir, "ck"))
         .trigger(availableNow=True).start())
    if not q.awaitTermination(300):
        # awaitTermination returns False on TIMEOUT (it does not
        # raise) — reading the sink now would see a partial drain
        q.stop()
        raise TimeoutError("snapshot stream drain did not finish")
    back = spark.read.parquet(out)
    return (back.groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"),
                 (F.sum("cents").cast("double") / 100).alias("total"),
                 F.count_distinct("_snapshot_version")
                 .cast("bigint").alias("n_versions"))
            .orderBy("o_orderstatus"))


SQL_SRC_SNAPSHOT_STREAM = """
SELECT o_orderstatus, COUNT(*) AS n,
       CAST(CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                          AS BIGINT)) AS DOUBLE) / 100 AS DOUBLE)
         AS total,
       CAST(2 AS BIGINT) AS n_versions
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


QUERIES_EXT12: dict[str, dict] = {
    "rank_ratios_bp": {"fn": q_rank_ratios_bp,
                       "sql": SQL_RANK_RATIOS_BP},
    # oracle = the NAIVE global-window SQL: the re-keyed plan must
    # reproduce it row-for-row, per the exactness proof above
    "rolling_zscore_bp": {"fn": q_rolling_zscore_bp,
                          "sql": SQL_ROLLING_ZSCORE},
    "src_snapshot_stream": {"fn": q_src_snapshot_stream,
                            "sql": SQL_SRC_SNAPSHOT_STREAM},
}
