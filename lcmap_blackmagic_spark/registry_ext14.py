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


# --------------------------------------------------------------------
# Gopher/C4-style document filter: the composed keep/drop DECISION
# (llm_quality exposes the raw scores; this is the ruleset applied,
# with a per-rule breakdown so a curation run can report WHY a
# document fell).  All five rules are integer-exact — ratios become
# cross-multiplied integer comparisons — so the whole filter carries
# a bit-exact oracle.

GOPHER_TOK_MIN, GOPHER_TOK_MAX = 30, 80     # token-count band
GOPHER_MWL_MIN, GOPHER_MWL_MAX = 3, 10      # mean word length band
GOPHER_MIN_STOP = 2                         # >= 2 stopword hits
# >= 80% of tokens contain a letter; symbol('#' or '...')-to-word
# ratio <= 10%
GOPHER_ALPHA_NUM, GOPHER_ALPHA_DEN = 4, 5
GOPHER_SYM_NUM, GOPHER_SYM_DEN = 1, 10


def q_llm_gopher_filter(spark, sf_dir):
    """Per-document rule verdicts + the final keep flag, all in
    whole-stage codegen (regexp counts over the space-padded lowered
    text — the llm/text.quality_scores technique; no interpreted
    higher-order functions): token-count band, mean-word-length band
    (3n <= sum_len <= 10n, where sum_len = len - n + 1 exactly
    because split(' ') partitions the string), minimum stopword
    hits, alpha-bearing token share, and symbol-to-word ratio."""
    import re

    from .llm.text import STOPWORDS

    d = _t(spark, sf_dir, "documents")
    lowered = F.lower(F.trim("text"))
    n = F.size(F.split(lowered, " "))
    sum_len = F.length(lowered) - n + 1
    padded = F.concat(F.lit(" "), lowered, F.lit(" "))
    stop_re = ("(?<= )(?:" + "|".join(re.escape(w) for w in STOPWORDS)
               + ")(?= )")
    stop_hits = F.regexp_count(padded, F.lit(stop_re))
    # one count per token containing a letter: the lookbehind pins
    # the match to a token start, the lazy [^ ]*? consumes up to the
    # first letter, and the rest of the token cannot re-match (no
    # preceding space inside a token)
    alpha_toks = F.regexp_count(padded, F.lit("(?<= )[^ ]*?[a-z]"))
    hashes = (F.length(lowered)
              - F.length(F.regexp_replace(lowered, "#", "")))
    ellipses = F.regexp_count(lowered, F.lit(r"\.\.\."))
    sym = hashes + ellipses
    rules = {
        "r_len": n.between(GOPHER_TOK_MIN, GOPHER_TOK_MAX),
        "r_mwl": (sum_len >= GOPHER_MWL_MIN * n)
        & (sum_len <= GOPHER_MWL_MAX * n),
        "r_stop": stop_hits >= GOPHER_MIN_STOP,
        "r_alpha": alpha_toks * GOPHER_ALPHA_DEN >= n * GOPHER_ALPHA_NUM,
        "r_sym": sym * GOPHER_SYM_DEN <= n * GOPHER_SYM_NUM,
    }
    out = d.select("doc_id", n.cast("bigint").alias("n_tokens"),
                   *[v.alias(k) for k, v in rules.items()])
    keep = F.lit(True)
    for k in rules:
        keep = keep & F.col(k)
    return out.withColumn("keep", keep).orderBy("doc_id")


def _sql_llm_gopher_filter() -> str:
    from .llm.text import STOPWORDS
    toks = "string_split(lower(trim(text)), ' ')"
    stop_list = ",".join(f"'{w}'" for w in STOPWORDS)
    return f"""
WITH base AS (
  SELECT doc_id,
         CAST(len({toks}) AS BIGINT) AS n,
         CAST(length(lower(trim(text))) - len({toks}) + 1 AS BIGINT)
           AS sum_len,
         CAST(len(list_filter({toks}, t -> t IN ({stop_list})))
              AS BIGINT) AS stop_hits,
         CAST(len(list_filter({toks}, t -> regexp_matches(t, '[a-z]')))
              AS BIGINT) AS alpha_toks,
         CAST(length(lower(trim(text)))
              - length(replace(lower(trim(text)), '#', ''))
              + len(regexp_extract_all(lower(trim(text)), '\\.\\.\\.'))
              AS BIGINT) AS sym
  FROM documents),
rules AS (
  SELECT doc_id, n AS n_tokens,
         n BETWEEN {GOPHER_TOK_MIN} AND {GOPHER_TOK_MAX} AS r_len,
         sum_len >= {GOPHER_MWL_MIN} * n
           AND sum_len <= {GOPHER_MWL_MAX} * n AS r_mwl,
         stop_hits >= {GOPHER_MIN_STOP} AS r_stop,
         alpha_toks * {GOPHER_ALPHA_DEN} >= n * {GOPHER_ALPHA_NUM}
           AS r_alpha,
         sym * {GOPHER_SYM_DEN} <= n * {GOPHER_SYM_NUM} AS r_sym
  FROM base)
SELECT doc_id, n_tokens, r_len, r_mwl, r_stop, r_alpha, r_sym,
       (r_len AND r_mwl AND r_stop AND r_alpha AND r_sym) AS keep
FROM rules ORDER BY doc_id
"""


def q_twavg(spark, sf_dir):
    """TIME-WEIGHTED average per user over the event stream — the
    TimescaleDB ``time_weight('LOCF')`` shape: each reading's value
    holds until the next reading, so the mean weights every value by
    its holding interval, not its sample count (the right aggregate
    for irregularly-sampled series; the arithmetic mean over-weights
    bursts).

    Integer-exact end to end: instants via unix_micros (TZ-safe on
    the LTZ events column), money in cents, the numerator
    accumulated in DECIMAL(38,0) (cents × a months-long microsecond
    interval overflows nothing at 38 digits), and the final average
    scaled to micro-cents by integer ``div`` — truncation toward
    zero agrees between engines (verified), where a rounded DECIMAL
    division would not.  One window (partitioned by the
    high-cardinality user_id) + one aggregate: two shuffles on the
    same key, no collect.  Streaming twin: streaming/jobs.py
    twavg_stream (O(1) LOCF state per user, last emission bit-equal
    to this query — flag-exact test in tests/test_streaming.py)."""
    from pyspark.sql import Window
    e = _t(spark, sf_dir, "events").select(
        "user_id", "event_id",
        F.unix_micros("ts").alias("us"),
        (F.col("value").cast("decimal(18,2)") * 100)
        .cast("bigint").alias("cents"))
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    iv = (e.withColumn("dt", F.lead("us").over(w) - F.col("us"))
          .filter(F.col("dt").isNotNull()))
    return (iv.groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n_intervals"),
                 F.sum("dt").alias("total_us"),
                 F.sum((F.col("cents").cast("decimal(20,0)")
                        * F.col("dt")).cast("decimal(38,0)"))
                 .alias("num"))
            .select("user_id", "n_intervals", "total_us",
                    F.expr("CAST(CAST(num * 1000000 AS DECIMAL(38,0)) "
                           "div CAST(total_us AS DECIMAL(38,0)) "
                           "AS BIGINT)").alias("twa_microcents"))
            .orderBy("user_id"))


SQL_TWAVG = """
WITH s AS (
  SELECT user_id, event_id, epoch_us(ts) AS us,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM events),
iv AS (
  SELECT user_id, cents,
         lead(us) OVER (PARTITION BY user_id
                        ORDER BY us, event_id) - us AS dt
  FROM s)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_intervals,
       CAST(SUM(dt) AS BIGINT) AS total_us,
       CAST((SUM(CAST(cents AS HUGEINT) * dt) * 1000000) // SUM(dt)
            AS BIGINT) AS twa_microcents
FROM iv WHERE dt IS NOT NULL
GROUP BY user_id ORDER BY user_id
"""


def q_snapshot_bloom(spark, sf_dir):
    """Per-commit BLOOM SIDECARS under the gate: orders lands in 4
    append commits HASH-split on o_custkey (custkey % 4 — every dir's
    custkey [min, max] spans the whole key space, so manifest stats
    cannot prune an id equality), each commit written with
    ``bloom_cols=["o_custkey"]``.  A point read of a planned custkey
    must scan a STRICT SUBSET of the commit dirs (asserted in-query —
    the bloom finds the one hash bucket the key lives in), and a
    probe past the key space must bloom-exclude essentially
    everything; the oracle pins that pruning changed no answer.
    Complements ``snapshot_zorder`` (range pruning on clustered
    columns) with the id-lookup half of data skipping."""
    from .registry import _staging
    from .storage import read_snapshot, write_snapshot

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey",
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint").alias("cents"))
    table = _staging(sf_dir, "bloom_orders")
    for b in range(4):
        write_snapshot(o.filter(F.col("o_custkey") % 4 == b), table,
                       mode="append" if b else "overwrite",
                       bloom_cols=["o_custkey"])
    # planned probes (one tiny agg): the custkey of the smallest
    # orderkey (definitely present), and one past the key space
    row = o.agg(F.min("o_orderkey").alias("ok0"),
                F.max("o_custkey").alias("mx")).collect()[0]
    ck0 = o.filter(F.col("o_orderkey") == row["ok0"]) \
           .agg(F.max("o_custkey")).collect()[0][0]
    absent = row["mx"] + 1009

    def probe(ck, step, max_dirs):
        df = read_snapshot(spark, table, where=("o_custkey", "=", ck))
        scanned = {f.split("/data/")[-1].split("/")[0]
                   for f in df.inputFiles()}
        if len(scanned) > max_dirs:
            raise AssertionError(
                f"bloom pruning ineffective for {step}: "
                f"{len(scanned)} dirs scanned (cap {max_dirs})")
        return (df.agg(F.count(F.lit(1)).alias("n_orders"),
                       F.sum("cents").alias("sum_cents"),
                       F.min("o_orderkey").alias("min_key"),
                       F.max("o_orderkey").alias("max_key"))
                .select(F.lit(step).alias("step"), "*"))

    # present key: its hash bucket (+~0.8% fp per other dir); absent
    # key: everything excluded up to the same fp allowance
    return (probe(ck0, "present", max_dirs=2)
            .unionByName(probe(absent, "absent", max_dirs=1))
            .orderBy("step"))


SQL_SNAPSHOT_BLOOM = """
WITH o AS (
  SELECT o_orderkey, o_custkey,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           AS cents
  FROM orders),
ck AS (SELECT MAX(o_custkey) AS v FROM o
       WHERE o_orderkey = (SELECT MIN(o_orderkey) FROM o)),
absent AS (SELECT MAX(o_custkey) + 1009 AS v FROM o)
SELECT 'absent' AS step, CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(cents) AS BIGINT) AS sum_cents,
       MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key
FROM o WHERE o_custkey = (SELECT v FROM absent)
UNION ALL
SELECT 'present', CAST(COUNT(*) AS BIGINT),
       CAST(SUM(cents) AS BIGINT),
       MIN(o_orderkey), MAX(o_orderkey)
FROM o WHERE o_custkey = (SELECT v FROM ck)
ORDER BY step
"""


QUERIES_EXT14: dict[str, dict] = {
    "snapshot_delete": {"fn": q_snapshot_delete,
                        "sql": SQL_SNAPSHOT_DELETE},
    "snapshot_zorder": {"fn": q_snapshot_zorder,
                        "sql": SQL_SNAPSHOT_ZORDER},
    "snapshot_bloom":  {"fn": q_snapshot_bloom,
                        "sql": SQL_SNAPSHOT_BLOOM},
    "llm_gopher_filter": {"fn": q_llm_gopher_filter,
                          "sql": _sql_llm_gopher_filter()},
    "twavg": {"fn": q_twavg, "sql": SQL_TWAVG},
}


def q_state_agg(spark, sf_dir):
    """TIME-IN-STATE per (user, event_type) — the TimescaleDB
    ``state_agg`` shape under LOCF semantics: a user is "in" the
    state of their latest event until the next event, so each
    state's dwell time is the sum of its holding intervals.  Emits
    dwell microseconds, period count, and the share of the user's
    total tracked time in integer BASIS POINTS (state_us·10000 div
    user_us — exact integer division, engine-agreed truncation).

    Shape: the same single lead window as ``twavg`` (partitioned by
    the high-cardinality user), one aggregate on (user, state), and
    a user-total window over the AGGREGATED frame — whose partitions
    are at most |event_type| rows per user, so the second window is
    group-cardinality-sized, never event-sized.  Streaming twin:
    streaming/jobs.py state_agg_stream (bounded per-state dwell
    table, shares finalized from the last emissions — exactness test
    in tests/test_streaming.py)."""
    from pyspark.sql import Window
    e = _t(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type",
        F.unix_micros("ts").alias("us"))
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    iv = (e.withColumn("dt", F.lead("us").over(w) - F.col("us"))
          .filter(F.col("dt").isNotNull()))
    agg = (iv.groupBy("user_id", "event_type")
           .agg(F.count(F.lit(1)).alias("n_periods"),
                F.sum("dt").alias("state_us")))
    return (agg.withColumn(
        "share_bp",
        F.expr("CAST(state_us * 10000 div "
               "SUM(state_us) OVER (PARTITION BY user_id) AS BIGINT)"))
        .orderBy("user_id", "event_type"))


SQL_STATE_AGG = """
WITH s AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS us
  FROM events),
iv AS (
  SELECT user_id, event_type,
         lead(us) OVER (PARTITION BY user_id
                        ORDER BY us, event_id) - us AS dt
  FROM s),
agg AS (
  SELECT user_id, event_type,
         CAST(COUNT(*) AS BIGINT) AS n_periods,
         CAST(SUM(dt) AS BIGINT) AS state_us
  FROM iv WHERE dt IS NOT NULL GROUP BY user_id, event_type)
SELECT user_id, event_type, n_periods, state_us,
       CAST(state_us * 10000 //
            SUM(state_us) OVER (PARTITION BY user_id) AS BIGINT)
         AS share_bp
FROM agg ORDER BY user_id, event_type
"""

QUERIES_EXT14["state_agg"] = {"fn": q_state_agg, "sql": SQL_STATE_AGG}
