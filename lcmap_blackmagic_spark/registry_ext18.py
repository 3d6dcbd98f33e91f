"""Nineteenth extension wave (round 12, session 2) — shallow clone
for the snapshot table format, MOSS-style winnowing fingerprints,
and DSIR-style importance scoring, each under the correctness gate:

- ``snapshot_clone``: Delta-style SHALLOW CLONE as a metadata-only
  commit (storage.clone_snapshot — the clone's v1 manifest
  re-references the source's commit dirs in place; zero data
  movement).  The query clones mid-history, then diverges BOTH
  sides with further appends; the oracle recomputes every read's
  content from slice arithmetic, so a clone that leaked writes
  across tables, mis-referenced dirs, or broke time travel inside
  the clone could not hash-match.

- ``llm_winnow_pairs``: robust-winnowing document fingerprints
  (Schleimer/Wilkerson/Aiken, the MOSS algorithm): md5 over the
  positional word k-gram sequence, minimum per sliding window of w
  — guaranteeing any shared run of ≥ w+k-1 words leaves a common
  fingerprint — then near-dup pairs via the inverted fingerprint
  index.  The oracle replays the identical selection (md5 hex
  strings order lexicographically the same in both engines).

- ``llm_dsir_score``: data-selection importance scoring in the DSIR
  shape (Xie et al. 2023): hashed unigram features, per-feature
  target/raw likelihood ratio, per-document mean.  Log-free
  rational twin of the log-ratio (same ranking signal, no
  transcendentals in checked outputs — the rarity_scores /
  lm_score precedent): per-feature weight is an integer
  basis-point ratio of smoothed counts, per-doc score an exact
  bigint mean.

Reference anchor: nothing in lcmap-blackmagic — the snapshot store
and LLM-curation surfaces are the engine's own first-class
additions (brief §LLM-ops / §scale)."""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import _t

# ------------------------------------------------- shallow clone ----

CLN_SLICES = 4


def q_snapshot_clone(spark, sf_dir):
    """Stage a snapshot table (overwrite slice 0, append slice 1),
    SHALLOW-CLONE it, then diverge: append slice 2 to the CLONE and
    slice 3 to the SOURCE.  Emits (side, n_orders, sum_cents) for
    the source's latest read, the clone's latest read, and the
    clone's own v1 (time travel INSIDE the clone) — three contents
    that only come out right if the clone referenced exactly the
    pre-divergence dirs and neither side's append leaked into the
    other.  The clone target is a fresh uuid dir per call (a clone
    is a new table; re-runs must not collide), while the source
    follows the snapshot_restore convention: reads pin THIS run's
    returned versions, so a second run in the same process sees
    identical content."""
    import os
    import uuid

    from .registry import _staging
    from .storage import clone_snapshot, read_snapshot, write_snapshot

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint").alias("cents"))

    def sl(s):
        return o.filter(F.col("o_orderkey") % CLN_SLICES == s)

    src = _staging(sf_dir, "cln_orders")
    write_snapshot(sl(0), src, mode="overwrite", collect_stats=False)
    v2 = write_snapshot(sl(1), src, mode="append", collect_stats=False)
    # clone targets must be fresh (a clone is a NEW table), but
    # repeated runs must not leak one slice-2 data copy per call:
    # drop the previous runs' clones before creating this one
    # (registry queries execute sequentially per process, and the
    # staging root is per-process, so nothing can hold a live scan)
    import shutil
    clone_base = _staging(sf_dir, "cln_clone")
    shutil.rmtree(clone_base, ignore_errors=True)
    dst = os.path.join(clone_base, uuid.uuid4().hex[:12])
    clone_snapshot(src, dst, version=v2)
    write_snapshot(sl(2), dst, mode="append", collect_stats=False)
    v_src = write_snapshot(sl(3), src, mode="append",
                           collect_stats=False)

    def side(name, df):
        return df.agg(F.lit(name).alias("side"),
                      F.count(F.lit(1)).alias("n_orders"),
                      F.sum("cents").alias("sum_cents"))

    return (side("clone_latest", read_snapshot(spark, dst))
            .unionByName(side("clone_v1",
                              read_snapshot(spark, dst, version=1)))
            .unionByName(side("src_latest",
                              read_snapshot(spark, src, version=v_src)))
            .orderBy("side"))


SQL_SNAPSHOT_CLONE = f"""
WITH c AS (
  SELECT o_orderkey % {CLN_SLICES} AS s,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           AS cents
  FROM orders),
sides(side) AS (
  SELECT UNNEST(['clone_latest', 'clone_v1', 'src_latest'])),
sel AS (
  -- clone_latest: slices 0,1 (cloned) + 2 (clone-side append);
  -- clone_v1: slices 0,1; src_latest: slices 0,1 + 3
  SELECT sd.side, c.cents,
         CASE WHEN c.s < 2 THEN 1
              WHEN sd.side = 'clone_latest' AND c.s = 2 THEN 1
              WHEN sd.side = 'src_latest' AND c.s = 3 THEN 1
              ELSE 0 END AS copies
  FROM sides sd, c)
SELECT side, CAST(SUM(copies) AS BIGINT) AS n_orders,
       CAST(SUM(copies * cents) AS BIGINT) AS sum_cents
FROM sel GROUP BY side ORDER BY side
"""

# ------------------------------------------- winnowing (MOSS) -------
# helpers + constants live in llm/dedup.py (shared with the
# streaming ingest twin, streaming/jobs.winnow_dedup_stream)

from .llm.dedup import (WIN_K, WIN_MAXDF, WIN_T,  # noqa: E402
                        WIN_W, winnow_cross_flags,  # noqa: F401
                        winnow_fingerprints)


def q_llm_winnow_pairs(spark, sf_dir):
    """Near-duplicate pairs via ROBUST WINNOWING fingerprints — the
    MOSS selection rule (Schleimer, Wilkerson & Aiken, SIGMOD'03):
    hash every POSITIONAL word k-gram (md5 — both engines emit the
    same lowercase hex, and hex strings order lexicographically the
    same, so "minimum hash in window" is engine-portable without a
    single numeric cast), slide a w-window over the hash sequence,
    keep each window's minimum, dedupe per doc.  Guarantee: any
    shared word run of length ≥ w+k-1 contributes a common
    fingerprint, while storage is ~2/(w+1) of the gram count.
    Pairs come from the inverted index: explode (doc_id, fp),
    self-join on fp, count shared fingerprints ≥ WIN_T.

    Scale shape: fingerprinting is embarrassingly parallel (one
    projection, no shuffle); the pair join shuffles on fp with
    per-key fan-out bounded by the WIN_MAXDF document-frequency cap
    — boilerplate fingerprints shared by hundreds of docs (license
    headers, navigation chrome) are dropped BEFORE the join, the
    same df-cap every production near-dup index applies, so no hot
    fp key can quadratically blow a reducer.  Docs shorter than
    k+w-1 words degrade to one whole-doc window (the min of all
    their gram hashes) — MOSS's natural boundary case.  Short docs
    (< k words) have no grams and no fingerprints."""
    from .llm.dedup import winnow_pairs
    return winnow_pairs(_t(spark, sf_dir, "documents"))


SQL_LLM_WINNOW_PAIRS = f"""
WITH base AS (
  SELECT doc_id, string_split(lower(trim(text)), ' ') AS ws
  FROM documents),
g AS (
  SELECT doc_id,
         CASE WHEN len(ws) - {WIN_K - 1} >= 1 THEN
           list_transform(generate_series(1, len(ws) - {WIN_K - 1}),
             i -> md5(array_to_string(
                    list_slice(ws, i, i + {WIN_K - 1}), ' ')))
         ELSE CAST([] AS VARCHAR[]) END AS h
  FROM base),
fp AS (
  SELECT DISTINCT doc_id, fp FROM (
    SELECT doc_id,
           UNNEST(list_transform(
             generate_series(1, GREATEST(len(h) - {WIN_W - 1}, 1)),
             p -> list_min(list_slice(h, p, p + {WIN_W - 1})))) AS fp
    FROM g WHERE len(h) >= 1)),
keep AS (SELECT fp FROM fp GROUP BY fp
         HAVING COUNT(*) <= {WIN_MAXDF}),
pf AS (SELECT f.doc_id, f.fp FROM fp f JOIN keep USING (fp))
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(COUNT(*) AS BIGINT) AS n_shared
FROM pf a JOIN pf b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY 1, 2
HAVING COUNT(*) >= {WIN_T}
"""

# ------------------------------------- DSIR importance scoring ------

# constants + helpers live in llm/text.py (shared with the
# streaming scorer, streaming/jobs.dsir_score_stream)
from .llm.text import (DSIR_B, DSIR_SCALE,  # noqa: E402,F401
                       dsir_doc_scores, dsir_weights)


def q_llm_dsir_score(spark, sf_dir):
    """Data-selection importance scoring in the DSIR shape (Xie et
    al. 2023, "Data Selection for Language Models via Importance
    Resampling"): hash every token into DSIR_B buckets, estimate
    per-feature target (source='src0') vs raw (everything else)
    frequencies with add-one smoothing, and score each raw document
    by its mean per-token importance ratio — high = looks like the
    target distribution.  Log-free rational twin of the log-ratio
    (the rarity_scores / lm_score precedent — same ranking signal,
    zero transcendentals in checked outputs): the per-feature weight
    is the exact integer

        w(f) = ((ct+1) · (NR+B) · 10000) div ((cr+1) · (NT+B))

    and the per-doc score is sum(w) div n_tok — bigint end-to-end,
    bit-exact across engines.

    Scale shape: token hashing is a projection; the two count
    aggregates are map-side combined; the weight table is AT MOST
    DSIR_B = 4096 rows — bounded by a constant, not by data — so
    the forced broadcast back onto the token stream is safe at any
    corpus size (the corpus never shuffles).  Range bound: the
    weight numerator (ct+1)·(NR+B)·10^4 must stay below 2^63.  With
    balanced buckets (ct ≈ NT/DSIR_B) that is NT·NR ≲ 3.8·10^18;
    the assumption-free worst case (one bucket holding every target
    token, ct = NT) is NT·NR ≲ 9.2·10^14.  Past either bound, drop
    DSIR_SCALE a decade per decade of growth or move the two scaled
    products to DECIMAL(38,0) — the estimator is unchanged, but do
    it in BOTH engines: non-ANSI Spark wraps int64 silently while
    DuckDB raises, so an overflow is a cross-engine divergence the
    oracle only catches once the data is big enough to trip it."""
    d = _t(spark, sf_dir, "documents")
    target = d.filter(F.col("source") == "src0")
    raw = d.filter(F.col("source") != "src0")
    return dsir_doc_scores(raw, dsir_weights(target, raw))


SQL_LLM_DSIR_SCORE = f"""
WITH tl AS (
  SELECT doc_id, source,
         CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT)
           % {DSIR_B} AS f
  FROM (SELECT doc_id, source,
               UNNEST(string_split(lower(trim(text)), ' ')) AS tok
        FROM documents)
  WHERE tok <> ''),
ct AS (SELECT f, COUNT(*) AS ct FROM tl
       WHERE source = 'src0' GROUP BY f),
cr AS (SELECT f, COUNT(*) AS cr FROM tl
       WHERE source <> 'src0' GROUP BY f),
tot AS (SELECT
  (SELECT COUNT(*) FROM tl WHERE source = 'src0') AS nt,
  (SELECT COUNT(*) FROM tl WHERE source <> 'src0') AS nr),
w AS (
  SELECT f,
         ((COALESCE(ct, 0) + 1) * (nr + {DSIR_B}) * {DSIR_SCALE})
           // ((COALESCE(cr, 0) + 1) * (nt + {DSIR_B})) AS w
  FROM ct FULL JOIN cr USING (f), tot)
SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tok,
       CAST(SUM(w.w) AS BIGINT) AS wsum,
       CAST(SUM(w.w) // COUNT(*) AS BIGINT) AS score_bp
FROM tl t JOIN w USING (f)
WHERE t.source <> 'src0'
GROUP BY t.doc_id
"""


QUERIES_EXT18: dict[str, dict] = {
    "snapshot_clone":   {"fn": q_snapshot_clone,
                         "sql": SQL_SNAPSHOT_CLONE},
    "llm_winnow_pairs": {"fn": q_llm_winnow_pairs,
                         "sql": SQL_LLM_WINNOW_PAIRS},
    "llm_dsir_score":   {"fn": q_llm_dsir_score,
                         "sql": SQL_LLM_DSIR_SCORE},
}
