"""Third wave of training-data-pipeline operators: TF-IDF, corpus
n-gram top-k, text normalization, int8 embedding quantization, and
SQL-family completeness (GROUPING SETS, map functions).

Cross-engine exactness rules used here (same contract as the rest of
the registry):

- no transcendentals in checked outputs (JVM ``Math.log`` and libm
  may differ in the last ulp) — TF-IDF uses the log-free rational idf
  ``(N+1)/(df+1)``, monotone in the classic idf, so rankings match;
- no ROUND on raw doubles at decision points — quantization rounds
  via ``floor(x + 0.5)``, which is exact IEEE arithmetic in any
  engine;
- array outputs exploded to scalar rows (driver canonicalization
  cannot hash lists).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .registry import _t

# --------------------------------------------------------- TF-IDF ---

TFIDF_TOPK = 5
# shared tokenizer: lowercase, split on single spaces (the corpus
# contract used by the dedup/fingerprint family)
_SQL_TOKS = "string_split(lower(trim(text)), ' ')"


def q_tfidf_topk(spark, sf_dir):
    """Top-k characteristic terms per document by TF-IDF.

    Plan shape (the 100 TB pattern): one explode → (doc, term)
    aggregate for term frequencies; document frequencies derived from
    the SAME aggregate (no second scan) by a term-level count; idf
    joined back on term (shuffle join — the df table is term-sized,
    which can exceed broadcast range on a web corpus); top-k per doc
    via row_number. idf is the log-free rational form (N+1)/(df+1) —
    monotone in ln((N+1)/(df+1)), so the ranking is the classic one
    while staying bit-exact across engines."""
    d = _t(spark, sf_dir, "documents")
    n_docs = d.count()  # scalar, known before planning (one cheap agg)
    toks = F.explode(F.split(F.lower(F.trim("text")), " ")).alias("term")
    tf = (d.select("doc_id", toks)
          .groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf")))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.lit(float(n_docs + 1)) / (F.col("df") + F.lit(1)).cast("double")
    scored = (tf.join(df_, "term")
              .select("doc_id", "term", "tf",
                      (F.col("tf").cast("double") * idf).alias("tfidf")))
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "term")
    return (scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= TFIDF_TOPK)
            .select("doc_id", "term", F.col("tf").cast("bigint").alias("tf"),
                    "tfidf", F.col("rn").cast("int").alias("rn")))


def sql_tfidf_topk() -> str:
    return f"""
WITH tf AS (
  SELECT doc_id, u.term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM documents, UNNEST({_SQL_TOKS}) AS u(term)
  GROUP BY doc_id, u.term),
df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf,
         CAST(tf.tf AS DOUBLE) *
         (CAST(n.n_docs + 1 AS DOUBLE) / CAST(df.df + 1 AS DOUBLE)) AS tfidf
  FROM tf JOIN df ON tf.term = df.term CROSS JOIN n)
SELECT doc_id, term, tf, tfidf, CAST(rn AS INT) AS rn
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                   ORDER BY tfidf DESC, term) AS rn
      FROM scored)
WHERE rn <= {TFIDF_TOPK}
"""


# ------------------------------------------------- n-gram top-k -----

NGRAM_TOPK = 20


def q_ngram_topk(spark, sf_dir):
    """Corpus-level top-k word bigrams: explode → hash aggregate →
    TakeOrderedAndProject (orderBy+limit plans as a per-partition
    top-k merge on the driver, never a full sort — the scale-safe
    global top-k). Deterministic tie-break by the bigram itself."""
    d = _t(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.trim("text")), " ")
    # bigram i = tok[i] + ' ' + tok[i+1]; slice+zip free of HOF lambdas
    pairs = F.zip_with(F.slice(toks, 1, F.size(toks) - 1),
                       F.slice(toks, 2, F.size(toks) - 1),
                       lambda a, b: F.concat_ws(" ", a, b))
    return (d.select(F.explode(pairs).alias("bigram"))
            .groupBy("bigram").agg(F.count(F.lit(1)).alias("cnt"))
            .orderBy(F.col("cnt").desc(), "bigram")
            .limit(NGRAM_TOPK))


def sql_ngram_topk() -> str:
    return f"""
WITH t AS (SELECT {_SQL_TOKS} AS toks FROM documents),
b AS (SELECT toks[u.i] || ' ' || toks[u.i + 1] AS bigram
      FROM t, UNNEST(generate_series(1, len(toks) - 1)) AS u(i))
SELECT bigram, CAST(COUNT(*) AS BIGINT) AS cnt
FROM b GROUP BY bigram
ORDER BY cnt DESC, bigram
LIMIT {NGRAM_TOPK}
"""


# -------------------------------------------- text normalization ----

# Java-regex ∩ RE2 subset, identical semantics in both engines
_PUNCT_RE = "[^a-z0-9 ]"
_WS_RE = " +"


def q_text_normalize(spark, sf_dir):
    """Cleaning pass of a training-data pipeline: lowercase → strip
    non-alphanumerics → collapse whitespace → trim. Pure codegen
    string ops, pipelined into the scan (no shuffle)."""
    d = _t(spark, sf_dir, "documents")
    norm = F.trim(F.regexp_replace(
        F.regexp_replace(F.lower("text"), _PUNCT_RE, " "), _WS_RE, " "))
    return d.select(
        "doc_id", norm.alias("norm"),
        F.length(norm).cast("bigint").alias("norm_len"),
        (F.length("text") - F.length(norm)).cast("bigint")
        .alias("chars_removed"))


def sql_text_normalize() -> str:
    return f"""
WITH x AS (
  SELECT doc_id, text,
         trim(regexp_replace(regexp_replace(lower(text), '{_PUNCT_RE}',
                                            ' ', 'g'),
                             '{_WS_RE}', ' ', 'g')) AS norm
  FROM documents)
SELECT doc_id, norm,
       CAST(length(norm) AS BIGINT) AS norm_len,
       CAST(length(text) - length(norm) AS BIGINT) AS chars_removed
FROM x
"""


# ---------------------------------------- embedding quantization ----

def q_embed_quantize(spark, sf_dir):
    """Symmetric int8 quantization of the embedding column — the
    storage form for large ANN corpora (4× smaller than float32,
    dot products in integer SIMD). Per-vector scale = max|x| / 127;
    q = clamp(floor(x/scale + 0.5)) — floor arithmetic, not ROUND,
    so the halfway cases are decided identically in any engine.
    Output exploded to (vec_id, pos, q) scalars + the scale, so the
    driver can hash it; reconstruction error is pinned by
    tests/test_llm_ops.py."""
    e = _t(spark, sf_dir, "embeddings")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    amax = F.greatest(F.array_max(v), -F.array_min(v))
    # all-zero vectors quantize to zeros with scale 1 (no 0/0 NaN,
    # whose ordering under greatest/least is engine-dependent)
    scale = F.when(amax == 0, F.lit(1.0)) \
        .otherwise(amax / F.lit(127.0)).alias("scale")
    base = e.select("vec_id", v.alias("v"), scale)
    q = F.transform(
        F.col("v"), lambda x: F.greatest(
            F.lit(-127.0),
            F.least(F.lit(127.0),
                    F.floor(x / F.col("scale") + F.lit(0.5))
                    .cast("double"))).cast("int"))
    return (base.select("vec_id", "scale",
                        F.posexplode(q).alias("pos", "qv"))
            .withColumn("pos", F.col("pos").cast("int")))


def sql_embed_quantize() -> str:
    return """
WITH e AS (SELECT vec_id,
                  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
s AS (SELECT vec_id, v,
             CASE WHEN greatest(list_max(v), -list_min(v)) = 0
                  THEN CAST(1 AS DOUBLE)
                  ELSE greatest(list_max(v), -list_min(v))
                       / CAST(127 AS DOUBLE) END AS scale
      FROM e),
q AS (SELECT vec_id, scale,
             list_transform(v, x -> CAST(greatest(CAST(-127 AS DOUBLE),
                 least(CAST(127 AS DOUBLE),
                       CAST(floor(x / scale + 0.5) AS DOUBLE))) AS INT))
               AS qs
      FROM s)
SELECT vec_id, scale, CAST(u.i - 1 AS INT) AS pos, qs[u.i] AS qv
FROM q, UNNEST(generate_series(1, len(qs))) AS u(i)
"""


# ---------------------------------------------- document chunking --

CHUNK_SIZE = 64    # tokens per chunk
CHUNK_STRIDE = 48  # start-to-start distance (16-token overlap)


def q_chunk(spark, sf_dir):
    """Strided document chunking — the RAG / pre-training windowing
    step: each doc yields overlapping token windows of ``CHUNK_SIZE``
    every ``CHUNK_STRIDE`` tokens (final partial window kept iff ≥
    half size, the common convention). One narrow projection + one
    Generate (posexplode) — no shuffle, no UDF; chunk text is hashed
    (md5) so the checked output stays compact."""
    d = _t(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.trim("text")), " ")
    n = F.size(toks)
    # window starts: 1, 1+stride, ... while start ≤ n - size/2
    n_chunks = F.greatest(
        F.lit(1),
        (F.floor((n - F.lit(CHUNK_SIZE // 2)) / CHUNK_STRIDE) + 1)
        .cast("int"))
    starts = F.transform(F.sequence(F.lit(0), n_chunks - 1),
                         lambda i: i * CHUNK_STRIDE + 1)
    chunks = F.transform(
        starts, lambda s: F.struct(
            s.alias("start"),
            F.least(F.lit(CHUNK_SIZE), n - s + 1).alias("len"),
            F.md5(F.array_join(F.slice(toks, s, CHUNK_SIZE), " ")
                  .cast("binary")).alias("h")))
    return (d.select("doc_id", F.posexplode(chunks).alias("chunk_id", "c"))
            .select("doc_id", "chunk_id",
                    F.col("c.start").alias("start"),
                    F.col("c.len").alias("n_tokens"),
                    F.col("c.h").alias("chunk_md5")))


SQL_CHUNK = f"""
WITH t AS (
  SELECT doc_id, string_split(lower(trim(text)), ' ') AS toks,
         len(string_split(lower(trim(text)), ' ')) AS n
  FROM documents),
c AS (
  SELECT doc_id, toks, n,
         GREATEST(1, CAST(FLOOR((n - {CHUNK_SIZE // 2})
                               / {CHUNK_STRIDE}) + 1 AS INT)) AS n_chunks
  FROM t)
SELECT doc_id, CAST(u.i AS INT) AS chunk_id,
       CAST(u.i * {CHUNK_STRIDE} + 1 AS INT) AS start,
       CAST(LEAST({CHUNK_SIZE}, n - (u.i * {CHUNK_STRIDE} + 1) + 1) AS INT)
         AS n_tokens,
       md5(array_to_string(list_slice(toks, u.i * {CHUNK_STRIDE} + 1,
                                      u.i * {CHUNK_STRIDE} + {CHUNK_SIZE}),
                           ' ')) AS chunk_md5
FROM c, UNNEST(generate_series(0, n_chunks - 1)) AS u(i)
"""


# ------------------------------------------------- sequence packing -

PACK_CAPACITY = 512  # tokens per training sequence (context window)


def q_seq_pack(spark, sf_dir):
    """Greedy sequence packing: assign documents to fixed-capacity
    training windows (first-fit over a deterministic order) —
    the step that turns a tokenized corpus into dense batches.

    Shape: documents are hash-sharded (md5 48-bit prefix — the
    engine-portable hash every other sharded operator uses, so DuckDB
    replays the shard assignment exactly); packing runs per shard in
    one ``applyInPandas`` pass (packing is inherently sequential
    WITHIN a bin, so the parallel unit is the shard; bins never span
    shards — exactly how distributed packing is run in production).
    Output is one row per document: (shard, bin, off, len).  FULL
    oracle since round 12: the bin free-list that "defeats SQL" fits
    in a DuckDB recursive-CTE LIST column — the walk carries the
    per-shard remaining-capacity list and replays first-fit decision
    by decision (invariants additionally property-tested in
    tests/test_llm_ops.py)."""
    import pandas as pd

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
            for i, rem in enumerate(bins):  # first fit
                if rem >= n:
                    out_bin.append(i)
                    out_off.append(PACK_CAPACITY - rem)
                    bins[i] = rem - n
                    break
            else:
                out_bin.append(len(bins))
                out_off.append(0)
                bins.append(PACK_CAPACITY - n)
        pdf["bin"] = out_bin
        pdf["off"] = out_off
        return pdf[["shard", "doc_id", "n_tok", "bin", "off"]]

    return (base.groupBy("shard").applyInPandas(
        pack, schema="shard int, doc_id long, n_tok int, bin int, off int"))


def q_seq_pack_nextfit(spark, sf_dir):
    """Oracle-checked packing variant: NEXT-fit over the same
    decreasing order.  Unlike first-fit (whose per-bin free-list
    state defeats SQL), next-fit carries only (current bin, fill) —
    small enough for a recursive-CTE oracle to replay row by row.

    Same distribution shape as ``q_seq_pack``: hash-sharded, one
    sequential ``applyInPandas`` pass per shard, bins never span
    shards."""
    import pandas as pd

    d = _t(spark, sf_dir, "documents")
    n_shards = 16
    toks = F.size(F.split(F.lower(F.trim("text")), " "))
    base = d.select(
        "doc_id",
        F.least(toks, F.lit(PACK_CAPACITY)).cast("int").alias("n_tok"),
        (F.col("doc_id") % n_shards).cast("int").alias("shard"))

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["n_tok", "doc_id"],
                              ascending=[False, True]).reset_index(drop=True)
        cur_bin, fill = 0, 0
        out_bin, out_off = [], []
        for n in pdf["n_tok"]:
            n = int(n)
            if fill + n <= PACK_CAPACITY:
                out_bin.append(cur_bin)
                out_off.append(fill)
                fill += n
            else:
                cur_bin += 1
                out_bin.append(cur_bin)
                out_off.append(0)
                fill = n
        pdf["bin"] = out_bin
        pdf["off"] = out_off
        return pdf[["shard", "doc_id", "n_tok", "bin", "off"]]

    return (base.groupBy("shard").applyInPandas(
        pack, schema="shard int, doc_id long, n_tok int, bin int, off int"))


SQL_SEQ_PACK = f"""
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
  -- first-fit replayed exactly: the recursive state is the bin
  -- free-list itself (remaining capacity per bin, a LIST column);
  -- each step scans for the first bin that fits, updates it in
  -- place, or opens a new one
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
    SELECT NULLIF(list_position(
             list_transform(w.rems, r -> r >= o.n_tok), true),
           0) AS idx) fit)
SELECT shard, doc_id, n_tok, CAST(bin AS INT) AS bin,
       CAST(off AS INT) AS off
FROM walk
"""


SQL_SEQ_PACK_NEXTFIT = f"""
WITH RECURSIVE ordered AS (
  SELECT CAST(doc_id % 16 AS INT) AS shard, doc_id,
         CAST(least(len(string_split(lower(trim(text)), ' ')),
                    {PACK_CAPACITY}) AS INT) AS n_tok,
         ROW_NUMBER() OVER (PARTITION BY doc_id % 16
                            ORDER BY least(len(string_split(lower(trim(text)), ' ')),
                                           {PACK_CAPACITY}) DESC, doc_id) AS rn
  FROM documents),
walk AS (
  SELECT shard, doc_id, n_tok, rn,
         0 AS bin, 0 AS off, n_tok AS fill
  FROM ordered WHERE rn = 1
  UNION ALL
  SELECT o.shard, o.doc_id, o.n_tok, o.rn,
         CASE WHEN w.fill + o.n_tok <= {PACK_CAPACITY} THEN w.bin
              ELSE w.bin + 1 END,
         CASE WHEN w.fill + o.n_tok <= {PACK_CAPACITY} THEN w.fill
              ELSE 0 END,
         CASE WHEN w.fill + o.n_tok <= {PACK_CAPACITY} THEN w.fill + o.n_tok
              ELSE o.n_tok END
  FROM walk w JOIN ordered o ON o.shard = w.shard AND o.rn = w.rn + 1)
SELECT shard, doc_id, n_tok, CAST(bin AS INT) AS bin, CAST(off AS INT) AS off
FROM walk
"""


# ------------------------------------------ duplicate clustering ----

def q_dedup_groups(spark, sf_dir):
    """Near-duplicate CLUSTERS, not just pairs: connected components
    over the MinHash-verified pair graph via iterative min-label
    propagation (llm/dedup.dedup_components). Every document gets a
    component id = the smallest doc_id in its duplicate cluster (the
    canonical survivor); singletons label themselves. The oracle
    computes the same fixpoint with a recursive CTE.

    Uses the STAGED pair form (llm/dedup.minhash_pairs_staged, the
    llm_curation precedent): the pure form's md5-heavy per-doc
    aggregate executes twice end to end (Catalyst specializes the
    shared subtree per consumer — see minhash_pairs' NOTE), and this
    query materializes the pair table anyway inside
    dedup_components' localCheckpoint.  Identical output/oracle."""
    from .llm.dedup import dedup_components, minhash_pairs_staged
    from .registry import _staging
    d = _t(spark, sf_dir, "documents")
    pairs = minhash_pairs_staged(d, _staging(sf_dir, "dedup_groups_minhash"),
                                 threshold=0.2)
    return (dedup_components(pairs, d.select("doc_id"))
            .select("doc_id",
                    F.col("component").cast("bigint").alias("component")))


def sql_dedup_groups() -> str:
    from .registry_llm import SQL_MINHASH_PAIRS
    return f"""
WITH RECURSIVE
pairs AS ({SQL_MINHASH_PAIRS}),
edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
walk(node, label) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.dst, w.label FROM walk w JOIN edges e ON e.src = w.node)
SELECT node AS doc_id, CAST(MIN(label) AS BIGINT) AS component
FROM walk GROUP BY node
"""


QUERIES_LLM2: dict[str, dict] = {
    "llm_tfidf_topk":   {"fn": q_tfidf_topk,     "sql": sql_tfidf_topk()},
    "llm_ngram_topk":   {"fn": q_ngram_topk,     "sql": sql_ngram_topk()},
    "llm_normalize":    {"fn": q_text_normalize, "sql": sql_text_normalize()},
    "llm_embed_quant":  {"fn": q_embed_quantize, "sql": sql_embed_quantize()},
    "llm_seq_pack":     {"fn": q_seq_pack,       "sql": SQL_SEQ_PACK},
    "llm_chunk":        {"fn": q_chunk,          "sql": SQL_CHUNK},
    "llm_seq_pack_nextfit": {"fn": q_seq_pack_nextfit,
                             "sql": SQL_SEQ_PACK_NEXTFIT},
    "llm_dedup_groups": {"fn": q_dedup_groups,   "sql": sql_dedup_groups()},
}
