"""Twenty-fourth extension wave (round 14) — the SCHEDULING surface
of the training-data pipeline: after curation picks the documents and
mixing picks the domain shares, these three decide what the loader
actually reads, in what order, with which boilerplate excised.

- ``llm_line_dedup``: line-level corpus REWRITE — the C4 rule
  ("discard all but boilerplate spans that repeat across the
  corpus"; Raffel et al. 2020 §2.2, RefinedWeb / Dolma line dedup)
  re-expressed over segments: every document is cut into consecutive
  ``LINE_W``-token segments (the fixtures carry no newlines, so the
  deterministic segmentation stands in for line breaks — on real
  corpora the split expression swaps for ``split(text, '\\n')`` and
  nothing else changes), a segment occurring ≥ ``LINE_MAXOCC`` times
  corpus-wide is boilerplate, and every document is REASSEMBLED from
  its surviving segments in order.  Unlike ``substring_dup_stats``
  (llm/dedup.py — the per-doc duplication PROFILE), this emits the
  cleaned corpus itself: (doc_id, n_segs, n_kept, cleaned).

- ``llm_epoch_shuffle``: the deterministic multi-epoch SHUFFLE
  SCHEDULE a distributed loader consumes — per epoch a fresh
  pseudorandom permutation, keyed md5(epoch, doc) so every engine,
  shard count, and rerun agrees (the repo-wide _md48 contract).
  Order materializes as (shard, pos-in-shard): shard = key mod
  ``SHUFFLE_SHARDS``, position = a window over ONE (epoch, shard)
  group.  At 100 TB the shard count is the knob (∝ corpus / target
  shard size, exactly like MIX_BUCKET in registry_ext22) so no
  window partition ever exceeds the target shard size; a single
  corpus-wide row_number would serialize the epoch into one task —
  the plan-audit trap this shape exists to avoid.

- ``llm_curriculum``: length-curriculum tier assignment (Bengio et
  al. 2009 easy-first ordering; short-to-long is the standard LM
  pacing axis): tier = floor(TIERS · rank_lt / N) with rank_lt the
  TIE-COLLAPSED strict rank of the doc's token count — computed from
  the per-value count table via the registry_ext10 ``cum_below``
  three-level prefix pyramid, never a corpus-wide rank window (ties
  on a dense integer domain make per-value groups unbounded; the
  collapsed rank is both the definitionally stable choice and the
  only one computable without a total order).  Within a tier the
  read order is the same shard-and-key shuffle as
  ``llm_epoch_shuffle``, so the loader streams tiers easy→hard with
  deterministic intra-tier randomness.

Two more round out the wave's tail: ``llm_seq_pack_bestfit`` (the
quality tier of the packing family — best-fit-decreasing with the
free-list recursive-CTE oracle's LATERAL swapped for an argmin) and
``eval_mrr_map`` (grouped MRR + MAP, the two classic ranked-retrieval
metrics the eval family lacked, tie-collapsed competition ranks from
the cum_below pyramid — never a per-group corpus sort window).

Reference anchor: nothing in lcmap-blackmagic — scheduling is an
engine-first addition for the training-data pipeline (brief §LLM-ops),
composing with llm_mix_epochs (how many epochs) and llm_seq_pack
(what fills each sequence).  All entries carry full DuckDB oracles;
token semantics are llm_token_count's ws_tokens.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .llm.dedup import LINE_MAXOCC, LINE_W, line_dedup_rewrite
from .registry import _t
from .registry_ext6 import _md48
from .registry_ext10 import cum_below
from .registry_ext22 import _doc_tokens

EPOCHS = 3        # epochs scheduled by llm_epoch_shuffle
SHUFFLE_SHARDS = 16   # ∝ corpus size at scale — see module docstring

CURR_TIERS = 4    # curriculum difficulty tiers


def q_llm_line_dedup(spark, sf_dir):
    """C4-style line-level dedup with corpus reassembly.

    Plan shape at scale: segmentation is one Generate (explode of a
    per-doc integer sequence) — no shuffle; the occurrence table is
    a groupBy on the segment (map-side combined, so within-partition
    repeats collapse before the exchange; at 100 TB the group key
    swaps for the 16-byte md5 of the segment — same exchange, fixed-
    width rows); the join back REUSES that hash partitioning, with
    ultra-common segments being heavy-hitter keys the partial agg
    absorbs on the count side and AQE skew-join splits on the probe
    side (the substring_dup_stats argument, llm/dedup.py:463).
    Reassembly groups by doc_id — bounded by document length, the
    same per-doc bound every packer/chunker in the registry carries.
    Documents whose every segment is boilerplate survive with
    n_kept = 0 and an empty cleaned string (the left join), so the
    output is a total function of the corpus — downstream filters
    decide whether empty docs drop.  Implementation shared with the
    STREAMING line store (llm/dedup.py:line_segments /
    line_rewrite_segments; streaming/jobs.py:line_dedup_stream)."""
    return line_dedup_rewrite(_t(spark, sf_dir, "documents"))


SQL_LINE_DEDUP = f"""
WITH t AS (
  SELECT doc_id, string_split(lower(trim(text)), ' ') AS toks
  FROM documents
), b AS (
  SELECT doc_id, toks,
         CAST((len(toks) + {LINE_W - 1}) // {LINE_W} AS BIGINT)
           AS n_segs
  FROM t
), s AS (
  SELECT doc_id, n_segs, i,
         array_to_string(
           toks[(i * {LINE_W} + 1):(i * {LINE_W} + {LINE_W})],
           ' ') AS seg
  FROM b, LATERAL (SELECT unnest(range(n_segs)) AS i) u
), c AS (
  SELECT seg, COUNT(*) AS occ FROM s GROUP BY seg
), k AS (
  SELECT s.doc_id, s.i, s.seg
  FROM s JOIN c USING (seg) WHERE c.occ < {LINE_MAXOCC}
), r AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
         string_agg(seg, ' ' ORDER BY i) AS cleaned
  FROM k GROUP BY doc_id
)
SELECT b.doc_id, b.n_segs,
       COALESCE(r.n_kept, 0) AS n_kept,
       COALESCE(r.cleaned, '') AS cleaned
FROM b LEFT JOIN r USING (doc_id)
"""


def q_llm_epoch_shuffle(spark, sf_dir):
    """Deterministic multi-epoch shard-and-shuffle schedule.  One
    Generate (epochs per doc), one projection (key, shard), one
    window over (epoch, shard) groups whose size the shard count
    bounds — see module docstring for the ∝-N shard argument."""
    d = _t(spark, sf_dir, "documents").select("doc_id")
    e = d.withColumn(
        "epoch",
        F.explode(F.array(*[F.lit(i).cast("long")
                            for i in range(EPOCHS)])))
    k = _md48(F.concat(F.lit("e"), F.col("epoch").cast("string"),
                       F.lit(":"), F.col("doc_id").cast("string")))
    keyed = (e.withColumn("shuffle_key", k)
             .withColumn("shard",
                         F.col("shuffle_key") % SHUFFLE_SHARDS))
    w = (Window.partitionBy("epoch", "shard")
         .orderBy("shuffle_key", "doc_id"))
    return (keyed.withColumn("pos", F.row_number().over(w))
            .select("epoch", "shard", "pos", "doc_id", "shuffle_key"))


SQL_EPOCH_SHUFFLE = f"""
WITH e AS (
  SELECT doc_id, i AS epoch
  FROM documents, LATERAL (SELECT unnest(range({EPOCHS})) AS i) u
), k AS (
  SELECT epoch, doc_id,
         CAST('0x' || substr(md5('e' || epoch || ':' || doc_id),
                             1, 12) AS BIGINT) AS shuffle_key
  FROM e
)
SELECT epoch, shuffle_key % {SHUFFLE_SHARDS} AS shard,
       ROW_NUMBER() OVER (
         PARTITION BY epoch, shuffle_key % {SHUFFLE_SHARDS}
         ORDER BY shuffle_key, doc_id) AS pos,
       doc_id, shuffle_key
FROM k
"""


def q_llm_curriculum(spark, sf_dir):
    """Length-curriculum tier assignment + intra-tier shuffle order.
    The tie-collapsed strict rank comes from cum_below's per-value
    count table (three bounded-partition prefix levels, integer all
    the way); the only forced broadcast is the one-row global count.
    The join back on the token-count value is a plain equi-join —
    the count table is value-domain-sized, AQE decides its side."""
    t = _doc_tokens(spark, sf_dir).select("doc_id", "tok")
    cb = cum_below(t, "tok").select(
        F.col("v").alias("tok"), "cum_lt")
    n = t.agg(F.count(F.lit(1)).alias("n_docs"))
    ranked = (t.join(cb, "tok")
              .crossJoin(F.broadcast(n))
              .withColumn("tier", F.expr(
                  f"({CURR_TIERS} * cum_lt) div n_docs"))
              .withColumn("shuffle_key", _md48(
                  F.concat(F.lit("c:"),
                           F.col("doc_id").cast("string"))))
              .withColumn("shard",
                          F.col("shuffle_key") % SHUFFLE_SHARDS))
    w = (Window.partitionBy("tier", "shard")
         .orderBy("shuffle_key", "doc_id"))
    return (ranked.withColumn("pos", F.row_number().over(w))
            .select("doc_id", "tok", "tier", "shard", "pos"))


SQL_CURRICULUM = f"""
WITH t AS (
  SELECT doc_id,
         CAST(len(string_split(lower(trim(text)), ' ')) AS BIGINT)
           AS tok
  FROM documents
), r AS (
  SELECT doc_id, tok,
         CAST({CURR_TIERS} * (RANK() OVER (ORDER BY tok) - 1)
              // (SELECT COUNT(*) FROM t) AS BIGINT) AS tier,
         CAST('0x' || substr(md5('c:' || doc_id), 1, 12) AS BIGINT)
           AS shuffle_key
  FROM t
)
SELECT doc_id, tok, tier,
       shuffle_key % {SHUFFLE_SHARDS} AS shard,
       ROW_NUMBER() OVER (
         PARTITION BY tier, shuffle_key % {SHUFFLE_SHARDS}
         ORDER BY shuffle_key, doc_id) AS pos
FROM r
"""


def q_llm_seq_pack_bestfit(spark, sf_dir):
    """BEST-fit-decreasing sequence packing — the quality tier of
    the packing family (llm_seq_pack = first-fit-decreasing,
    llm_seq_pack_nextfit = next-fit): each document goes to the open
    bin with the SMALLEST remaining capacity that still fits (ties →
    lowest bin index), minimizing the slack each placement strands.
    Same distribution contract as the siblings: md5-hash-sharded,
    one sequential ``applyInPandas`` pass per shard (packing is
    inherently sequential within a bin; the shard is the parallel
    unit and bins never span shards), identical output schema.  The
    oracle replays the SAME free-list recursive walk as
    llm_seq_pack's, with the first-fit LATERAL swapped for the
    argmin: ``list_position(rems, list_min(list_filter(rems,
    r -> r >= n)))`` — first position of the minimal fitting
    remainder, NULL (→ new bin) when nothing fits."""
    import pandas as pd

    from .registry_llm2 import PACK_CAPACITY

    d = _t(spark, sf_dir, "documents")
    n_shards = 16
    toks = F.size(F.split(F.lower(F.trim("text")), " "))
    base = d.select(
        "doc_id",
        F.least(toks, F.lit(PACK_CAPACITY)).cast("int").alias("n_tok"),
        (F.conv(F.substring(F.md5(F.col("doc_id").cast("string")),
                            1, 12), 16, 10).cast("bigint")
         % n_shards).cast("int").alias("shard"))

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["n_tok", "doc_id"],
                              ascending=[False, True]).reset_index(drop=True)
        bins: list[int] = []   # remaining capacity per bin
        out_bin, out_off = [], []
        for n in pdf["n_tok"]:
            n = int(n)
            best = -1
            for i, rem in enumerate(bins):   # best fit, first-on-tie
                if rem >= n and (best < 0 or rem < bins[best]):
                    best = i
            if best >= 0:
                out_bin.append(best)
                out_off.append(PACK_CAPACITY - bins[best])
                bins[best] -= n
            else:
                out_bin.append(len(bins))
                out_off.append(0)
                bins.append(PACK_CAPACITY - n)
        pdf["bin"] = out_bin
        pdf["off"] = out_off
        return pdf[["shard", "doc_id", "n_tok", "bin", "off"]]

    return (base.groupBy("shard").applyInPandas(
        pack, schema="shard int, doc_id long, n_tok int, bin int, off int"))


def _sql_seq_pack_bestfit() -> str:
    from .registry_llm2 import PACK_CAPACITY
    return f"""
WITH RECURSIVE ordered AS (
  SELECT CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12)
              AS BIGINT) % 16 AS INT) AS shard,
         doc_id,
         CAST(least(len(string_split(lower(trim(text)), ' ')),
                    {PACK_CAPACITY}) AS INT) AS n_tok,
         ROW_NUMBER() OVER (
           PARTITION BY CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                            1, 12) AS BIGINT) % 16
           ORDER BY least(len(string_split(lower(trim(text)), ' ')),
                          {PACK_CAPACITY}) DESC, doc_id) AS rn
  FROM documents),
walk AS (
  -- best-fit replayed exactly: same free-list state as the
  -- first-fit oracle, argmin placement instead of first-fit
  SELECT shard, doc_id, n_tok, rn,
         0 AS bin, 0 AS off, [{PACK_CAPACITY} - n_tok] AS rems
  FROM ordered WHERE rn = 1
  UNION ALL
  SELECT o.shard, o.doc_id, o.n_tok, o.rn,
         CASE WHEN fit.idx IS NOT NULL THEN fit.idx - 1
              ELSE len(w.rems) END,
         CASE WHEN fit.idx IS NOT NULL
              THEN {PACK_CAPACITY} - w.rems[fit.idx] ELSE 0 END,
         CASE WHEN fit.idx IS NOT NULL
              THEN w.rems[:fit.idx-1] || [w.rems[fit.idx] - o.n_tok]
                   || w.rems[fit.idx+1:]
              ELSE w.rems || [{PACK_CAPACITY} - o.n_tok] END
  FROM walk w
  JOIN ordered o ON o.shard = w.shard AND o.rn = w.rn + 1
  CROSS JOIN LATERAL (
    SELECT list_position(w.rems,
             list_min(list_filter(w.rems, r -> r >= o.n_tok)))
           AS idx) fit)
SELECT shard, doc_id, n_tok, CAST(bin AS INT) AS bin,
       CAST(off AS INT) AS off
FROM walk
"""


MRR_SCORE_DOM = 1 << 20   # score domain — keeps cum_below's
#                           level-2 prefix constant-bounded
MRR_PPM = 1_000_000


def q_eval_mrr_map(spark, sf_dir):
    """Grouped MRR + MAP — the two classic ranked-retrieval metrics
    missing from the eval family (beside eval_auc / eval_ndcg /
    eval_confusion): per order-priority "query", candidates carry a
    deterministic md5 score and a 10% md5 relevance coin, and the
    group reports the first-relevant rank, the reciprocal rank, and
    mean average precision.

    Exactness + scale contract: ranks are TIE-COLLAPSED competition
    ranks — rank(d) = 1 + #candidates with strictly greater score,
    rel_le(d) = #relevant with score ≥ — both derived from
    cum_below's per-value count pyramid (never a per-priority
    corpus-sized sort window: 5 partitions at 10^12 rows is the
    plan-audit trap).  Every AP term is the integer division
    (PPM·rel_le) div rank, summed as bigints and divided once per
    group, so both engines land on identical integers with no float
    accumulation order anywhere.  The per-group count frames are
    ≤5-row broadcasts (audited)."""
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("grp"),
        F.col("o_orderkey").alias("k"),
        (_md48(F.concat(F.lit("r:"), F.col("o_orderkey")))
         % MRR_SCORE_DOM).alias("score"),
        (_md48(F.concat(F.lit("y:"), F.col("o_orderkey"))) % 10 == 0)
        .alias("rel"))
    cb = cum_below(o, "score", by=("grp",)).select(
        "grp", F.col("v").alias("score"), "c", "cum_lt")
    n = o.groupBy("grp").agg(F.count(F.lit(1)).alias("n_cands"))
    rel = o.filter("rel")
    rcb = cum_below(rel, "score", by=("grp",)).select(
        "grp", F.col("v").alias("score"),
        F.col("cum_lt").alias("rel_lt"))
    rtot = rel.groupBy("grp").agg(F.count(F.lit(1)).alias("n_rel"))
    j = (rel.join(cb, ["grp", "score"])
         .join(rcb, ["grp", "score"])
         .join(F.broadcast(n), "grp")
         .join(F.broadcast(rtot), "grp")
         .withColumn("rnk", F.col("n_cands") - F.col("cum_lt")
                     - F.col("c") + 1)
         .withColumn("rel_le", F.col("n_rel") - F.col("rel_lt"))
         .withColumn("term", F.expr(
             f"(CAST({MRR_PPM} AS BIGINT) * rel_le) div rnk")))
    agg = j.groupBy("grp").agg(
        F.first("n_cands").alias("n_cands"),
        F.first("n_rel").alias("n_rel"),
        F.min("rnk").alias("first_rel_rank"),
        F.sum("term").alias("ap_sum"))
    return agg.select(
        "grp", "n_cands", "n_rel", "first_rel_rank",
        F.expr(f"CAST({MRR_PPM} AS BIGINT) div first_rel_rank")
        .alias("rr_ppm"),
        F.expr("ap_sum div n_rel").alias("map_ppm"))


SQL_EVAL_MRR_MAP = f"""
WITH c AS (
  SELECT o_orderpriority AS grp, o_orderkey AS k,
         CAST('0x' || substr(md5('r:' || o_orderkey), 1, 12)
              AS BIGINT) % {MRR_SCORE_DOM} AS score,
         (CAST('0x' || substr(md5('y:' || o_orderkey), 1, 12)
               AS BIGINT) % 10 = 0) AS rel
  FROM orders),
ranked AS (
  SELECT grp, k, score, rel,
         RANK() OVER (PARTITION BY grp ORDER BY score DESC) AS rnk
  FROM c),
relranked AS (
  SELECT grp, k, score, rnk,
         COUNT(*) OVER (PARTITION BY grp ORDER BY score DESC
                        RANGE BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) AS rel_le
  FROM ranked WHERE rel),
agg AS (
  SELECT grp, COUNT(*) AS n_rel,
         MIN(rnk) AS first_rel_rank,
         SUM((CAST({MRR_PPM} AS BIGINT) * rel_le) // rnk) AS ap_sum
  FROM relranked GROUP BY grp),
n AS (SELECT grp, COUNT(*) AS n_cands FROM c GROUP BY grp)
SELECT n.grp, n.n_cands, a.n_rel,
       CAST(a.first_rel_rank AS BIGINT) AS first_rel_rank,
       CAST({MRR_PPM} // a.first_rel_rank AS BIGINT) AS rr_ppm,
       CAST(a.ap_sum // a.n_rel AS BIGINT) AS map_ppm
FROM n JOIN agg a USING (grp)
"""


def q_llm_pack_efficiency(spark, sf_dir):
    """The packing-quality LADDER, measured: one report row per
    strategy (best-fit / first-fit / next-fit over the identical
    md5-sharded decreasing order) with its bin count, packed tokens,
    and utilization in basis points — the comparison a batch-shape
    tuner actually reads (packed_tok is identical across strategies
    by construction; n_bins and util_bp are where they differ).
    Integer-exact: utilization = packed·10^4 div (bins·capacity).
    The oracle nests all three recursive free-list/state walks as
    derived tables under one WITH — the sql_dedup_groups nesting
    trick, three replays in one statement."""
    from .registry_llm2 import (PACK_CAPACITY, q_seq_pack,
                                q_seq_pack_nextfit)
    parts = [fn(spark, sf_dir).withColumn("strategy", F.lit(nm))
             for nm, fn in (("best_fit", q_llm_seq_pack_bestfit),
                            ("first_fit", q_seq_pack),
                            ("next_fit", q_seq_pack_nextfit))]
    u = parts[0].unionByName(parts[1]).unionByName(parts[2])
    return (u.groupBy("strategy")
            .agg(F.countDistinct("shard", "bin").alias("n_bins"),
                 F.sum("n_tok").cast("bigint").alias("packed_tok"))
            .withColumn("util_bp", F.expr(
                f"packed_tok * 10000 div (n_bins * {PACK_CAPACITY})"))
            .orderBy("strategy"))


def _sql_pack_efficiency() -> str:
    from .registry_llm2 import (PACK_CAPACITY, SQL_SEQ_PACK,
                                SQL_SEQ_PACK_NEXTFIT)
    return f"""
WITH bf AS (SELECT * FROM ({_sql_seq_pack_bestfit()}) x),
ff AS (SELECT * FROM ({SQL_SEQ_PACK}) x),
nf AS (SELECT * FROM ({SQL_SEQ_PACK_NEXTFIT}) x),
u AS (
  SELECT 'best_fit' AS strategy, shard, bin, n_tok FROM bf
  UNION ALL SELECT 'first_fit', shard, bin, n_tok FROM ff
  UNION ALL SELECT 'next_fit', shard, bin, n_tok FROM nf)
SELECT strategy,
       CAST(COUNT(DISTINCT (shard, bin)) AS BIGINT) AS n_bins,
       CAST(SUM(n_tok) AS BIGINT) AS packed_tok,
       CAST(SUM(n_tok) * 10000
            // (COUNT(DISTINCT (shard, bin)) * {PACK_CAPACITY})
            AS BIGINT) AS util_bp
FROM u GROUP BY strategy ORDER BY strategy
"""


QUERIES_EXT23: dict[str, dict] = {
    "llm_line_dedup": {"fn": q_llm_line_dedup,
                       "sql": SQL_LINE_DEDUP},
    "llm_epoch_shuffle": {"fn": q_llm_epoch_shuffle,
                          "sql": SQL_EPOCH_SHUFFLE},
    "llm_curriculum": {"fn": q_llm_curriculum,
                       "sql": SQL_CURRICULUM},
    "llm_seq_pack_bestfit": {"fn": q_llm_seq_pack_bestfit,
                             "sql": _sql_seq_pack_bestfit()},
    "eval_mrr_map": {"fn": q_eval_mrr_map,
                     "sql": SQL_EVAL_MRR_MAP},
    "llm_pack_efficiency": {"fn": q_llm_pack_efficiency,
                            "sql": _sql_pack_efficiency()},
}
