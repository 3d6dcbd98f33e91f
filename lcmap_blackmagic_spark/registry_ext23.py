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

Reference anchor: nothing in lcmap-blackmagic — scheduling is an
engine-first addition for the training-data pipeline (brief §LLM-ops),
composing with llm_mix_epochs (how many epochs) and llm_seq_pack
(what fills each sequence).  All three carry full DuckDB oracles;
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


QUERIES_EXT23: dict[str, dict] = {
    "llm_line_dedup": {"fn": q_llm_line_dedup,
                       "sql": SQL_LINE_DEDUP},
    "llm_epoch_shuffle": {"fn": q_llm_epoch_shuffle,
                          "sql": SQL_EPOCH_SHUFFLE},
    "llm_curriculum": {"fn": q_llm_curriculum,
                       "sql": SQL_CURRICULUM},
}
