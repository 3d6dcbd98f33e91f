"""Sixteenth extension wave (round 10) — Gopher REPETITION rules.

The round-9 ``llm_gopher_filter`` applies the quality half of the
Gopher ruleset (Rae et al. 2021, Table A1: length / mean-word-length /
stopwords / alpha / symbol ratios); this wave adds the REPETITION
half — the "too much repeated content" signals a pre-training
curation pass drops boilerplate and spam on (named llm_gopher_repetition: the
registry's earlier ``llm_repetition`` is the 3-gram repeat-ratio
profile in registry_ext3 — this entry is the composed Gopher-
thresholded DECISION over 2- and 5-grams):

- top 2-gram share: fraction of the document's tokens covered by its
  single most frequent word 2-gram (Gopher drops > 0.20);
- duplicate 5-gram fraction: fraction of 5-gram positions whose gram
  occurs more than once in the document (Gopher drops > 0.15).

Both are integer-exact (counts and basis-point integer divisions —
``div`` truncates toward zero identically in both engines), so the
whole query carries a bit-exact DuckDB oracle.  Reference anchor:
nothing in lcmap-blackmagic — this is the LLM-data-pipeline surface
the brief adds as first-class.

Scale shape: one explode per n, counts keyed (doc_id, gram) with
map-side partial combine, then a doc-keyed aggregate — nothing wider
than a document's gram set ever groups together, no windows, no
collects.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import _t

TOP2_MAX_BP = 2000      # Gopher: top 2-gram share <= 0.20
DUP5_MAX_BP = 1500      # Gopher: duplicate 5-gram fraction <= 0.15


def _gram_col(n: int):
    """Word n-grams WITH multiplicity (llm/dedup.shingles is the
    distinct-set form used for Jaccard; repetition needs counts)."""
    toks = F.split(F.lower(F.trim("text")), " ")
    k = F.size(toks) - F.lit(n - 1)
    grams = F.transform(
        F.sequence(F.lit(1), k),
        lambda i: F.array_join(F.slice(toks, i, n), " "))
    return F.when(k >= 1, grams).otherwise(
        F.array().cast("array<string>"))


def q_llm_repetition(spark, sf_dir):
    """Per-document repetition profile + the composed keep flag."""
    d = _t(spark, sf_dir, "documents")
    base = d.select(
        "doc_id",
        F.size(F.split(F.lower(F.trim("text")), " "))
        .cast("bigint").alias("n_tokens"))

    def gram_counts(n):
        return (d.select("doc_id", F.explode(_gram_col(n)).alias("g"))
                .groupBy("doc_id", "g")
                .agg(F.count(F.lit(1)).alias("c")))

    top2 = (gram_counts(2).groupBy("doc_id")
            .agg(F.max("c").alias("top2_count")))
    dup5 = (gram_counts(5).groupBy("doc_id")
            .agg(F.sum(F.when(F.col("c") >= 2, F.col("c"))
                       .otherwise(0)).alias("dup5"),
                 F.sum("c").alias("pos5")))
    out = (base.join(top2, "doc_id", "left")
           .join(dup5, "doc_id", "left")
           .select(
               "doc_id", "n_tokens",
               F.coalesce("top2_count", F.lit(0)).alias("top2_count"),
               F.expr("coalesce(top2_count, 0) * 2 * 10000 "
                      "div n_tokens").alias("top2_share_bp"),
               F.expr("CASE WHEN coalesce(pos5, 0) > 0 THEN "
                      "coalesce(dup5, 0) * 10000 div pos5 "
                      "ELSE CAST(0 AS BIGINT) END")
               .alias("dup5_share_bp")))
    return (out.select(
        "*",
        ((F.col("top2_share_bp") <= TOP2_MAX_BP)
         & (F.col("dup5_share_bp") <= DUP5_MAX_BP)).alias("keep"))
        .orderBy("doc_id"))


def _sql_llm_repetition() -> str:
    toks = "string_split(lower(trim(text)), ' ')"
    g2 = ("UNNEST(list_transform(generate_series(1, len(ws) - 1), "
          "i -> ws[i] || ' ' || ws[i+1]))")
    g5 = ("UNNEST(list_transform(generate_series(1, len(ws) - 4), "
          "i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' "
          "|| ws[i+3] || ' ' || ws[i+4]))")
    return f"""
WITH base AS (
  SELECT doc_id, CAST(len({toks}) AS BIGINT) AS n_tokens,
         {toks} AS ws
  FROM documents),
c2 AS (
  SELECT doc_id, g, COUNT(*) AS c
  FROM (SELECT doc_id, {g2} AS g FROM base WHERE len(ws) >= 2)
  GROUP BY doc_id, g),
t2 AS (SELECT doc_id, MAX(c) AS top2_count FROM c2 GROUP BY doc_id),
c5 AS (
  SELECT doc_id, g, COUNT(*) AS c
  FROM (SELECT doc_id, {g5} AS g FROM base WHERE len(ws) >= 5)
  GROUP BY doc_id, g),
d5 AS (SELECT doc_id,
              SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) AS dup5,
              SUM(c) AS pos5
       FROM c5 GROUP BY doc_id),
prof AS (
  SELECT b.doc_id, b.n_tokens,
         CAST(COALESCE(t2.top2_count, 0) AS BIGINT) AS top2_count,
         CAST(COALESCE(t2.top2_count, 0) * 2 * 10000
              // b.n_tokens AS BIGINT) AS top2_share_bp,
         CAST(CASE WHEN COALESCE(d5.pos5, 0) > 0
                   THEN COALESCE(d5.dup5, 0) * 10000 // d5.pos5
                   ELSE 0 END AS BIGINT) AS dup5_share_bp
  FROM base b
  LEFT JOIN t2 ON t2.doc_id = b.doc_id
  LEFT JOIN d5 ON d5.doc_id = b.doc_id)
SELECT *, (top2_share_bp <= {TOP2_MAX_BP}
           AND dup5_share_bp <= {DUP5_MAX_BP}) AS keep
FROM prof ORDER BY doc_id
"""


def q_llm_vocab_stats(spark, sf_dir):
    """Per-SOURCE vocabulary profile — the corpus-analysis numbers a
    tokenizer/mixture design reads first: token count, distinct
    vocabulary size, hapax legomena (frequency-1 tokens, the Zipf
    tail mass), the modal token's share in basis points, and the
    type-token ratio in basis points.  All integers and truncating
    divisions — bit-exact oracle.

    Scale shape: one explode, counts keyed (source, token) with
    map-side combine, then one source-keyed aggregate — vocabulary-
    sized state per source, never corpus-sized."""
    d = _t(spark, sf_dir, "documents")
    toks = (d.select("source",
                     F.explode(F.split(F.lower(F.trim("text")), " "))
                     .alias("w"))
            .groupBy("source", "w")
            .agg(F.count(F.lit(1)).alias("c")))
    return (toks.groupBy("source")
            .agg(F.sum("c").alias("n_tokens"),
                 F.count(F.lit(1)).alias("n_vocab"),
                 F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
                 .alias("n_hapax"),
                 F.max("c").alias("top_count"))
            .select("source", "n_tokens", "n_vocab", "n_hapax",
                    F.expr("top_count * 10000 div n_tokens")
                    .alias("top_share_bp"),
                    F.expr("n_vocab * 10000 div n_tokens")
                    .alias("ttr_bp"))
            .orderBy("source"))


SQL_LLM_VOCAB_STATS = """
WITH toks AS (
  SELECT source, UNNEST(string_split(lower(trim(text)), ' ')) AS w
  FROM documents),
c AS (SELECT source, w, COUNT(*) AS c FROM toks GROUP BY source, w)
SELECT source,
       CAST(SUM(c) AS BIGINT) AS n_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_vocab,
       CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_hapax,
       CAST(MAX(c) * 10000 // SUM(c) AS BIGINT) AS top_share_bp,
       CAST(COUNT(*) * 10000 // SUM(c) AS BIGINT) AS ttr_bp
FROM c GROUP BY source ORDER BY source
"""


EXPECT_MIN_CHARS = 120
EXPECT_LANGS = ("en", "de", "fr")


def q_snapshot_expectations(spark, sf_dir):
    """CHECK constraints under the gate: documents land in a snapshot
    table through the QUARANTINE expectation policy (two registered
    constraints — a min-length rule and a language allowlist), and
    the query emits the ingestion funnel: rows kept, rows
    dead-lettered, and per-constraint violation counts read back from
    the quarantine table's ``__violated`` reasons.  Every number is a
    deterministic integer function of the documents table, so the
    whole flow carries a bit-exact oracle.  Self-contained staging
    (registry._staging), built ONCE per process: quarantine appends
    per commit, so an unconditional rebuild would double the
    dead-letter counts — the latest_version gate keeps double runs
    byte-stable (the pattern every snapshot_* query uses)."""
    import os

    from .registry import _staging
    from .storage import (SNAP_QUARANTINE, latest_version,
                          read_snapshot, set_snapshot_constraint,
                          write_snapshot)

    d = _t(spark, sf_dir, "documents")
    table = _staging(sf_dir, "expect_docs")
    if latest_version(table) is None:
        set_snapshot_constraint(table, "min_len",
                                f"n_chars >= {EXPECT_MIN_CHARS}")
        set_snapshot_constraint(
            table, "lang_allowed",
            "lang IN ("
            + ", ".join(f"'{x}'" for x in EXPECT_LANGS) + ")")
        write_snapshot(d.select("doc_id", "lang", "n_chars"), table,
                       on_violation="quarantine")
    kept = read_snapshot(spark, table)
    dead = read_snapshot(spark, os.path.join(table, SNAP_QUARANTINE))
    funnel = (kept.agg(F.lit("kept").alias("bucket"),
                       F.count(F.lit(1)).alias("n"))
              .unionByName(
                  dead.agg(F.lit("quarantined").alias("bucket"),
                           F.count(F.lit(1)).alias("n")))
              .unionByName(
                  dead.select(F.explode("__violated").alias("c"))
                  .groupBy("c")
                  .agg(F.count(F.lit(1)).alias("n"))
                  .select(F.concat(F.lit("violated:"), F.col("c"))
                          .alias("bucket"), "n")))
    return funnel.orderBy("bucket")


def _sql_snapshot_expectations() -> str:
    langs = ", ".join(f"'{x}'" for x in EXPECT_LANGS)
    return f"""
WITH d AS (
  SELECT doc_id, lang, n_chars,
         n_chars >= {EXPECT_MIN_CHARS} AS ok_len,
         lang IN ({langs}) AS ok_lang
  FROM documents)
SELECT 'kept' AS bucket, CAST(COUNT(*) AS BIGINT) AS n
FROM d WHERE ok_len AND ok_lang
UNION ALL
SELECT 'quarantined', CAST(COUNT(*) AS BIGINT)
FROM d WHERE NOT (ok_len AND ok_lang)
UNION ALL
SELECT 'violated:min_len', CAST(COUNT(*) AS BIGINT)
FROM d WHERE NOT ok_len
UNION ALL
SELECT 'violated:lang_allowed', CAST(COUNT(*) AS BIGINT)
FROM d WHERE NOT ok_lang
ORDER BY bucket
"""


QUERIES_EXT15: dict[str, dict] = {
    "llm_gopher_repetition": {"fn": q_llm_repetition,
                              "sql": _sql_llm_repetition()},
    "snapshot_expectations": {"fn": q_snapshot_expectations,
                              "sql": _sql_snapshot_expectations()},
    "llm_vocab_stats": {"fn": q_llm_vocab_stats,
                        "sql": SQL_LLM_VOCAB_STATS},
}
