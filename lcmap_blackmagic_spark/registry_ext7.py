"""Eighth extension wave — training-pipeline utilities:

- ``kfold_split``: deterministic hash k-fold assignment (the
  cross-validation twin of SM3's train_test_split,
  operators/sampling.py:139) with per-fold balance stats,
- ``kmeans_assign``: the k-means ASSIGN step against fixed
  centroids — nearest-centroid cells over the embedding table with
  bit-exact unrolled distances (the iterative trainer lives in
  llm/similarity.py ``ivf_ann_topk``; this is its oracle-checkable
  single step),
- ``salted_join``: the skew-mitigation join (operators/joins.py:39)
  exposed as a registry query — the oracle is the PLAIN join, which
  is the whole point: salting must not change the answer,
- ``dedup_reps``: cluster-representative selection — one survivor
  per near-duplicate component (largest text, then smallest id), the
  step that turns dedup_groups output into a cleaned corpus,
- ``ewma_smooth``: truncated exponentially-weighted moving average
  per user over the event stream — dyadic weights (2^-1 .. 2^-8)
  keep every product exact, so both engines produce bit-identical
  doubles with no rounding at all,
- ``quality_deciles``: percent-rank bucketing of a quality score
  into deciles with per-bucket stats — the "keep the top-N% of the
  corpus" curation cut.

Determinism contract as registry.py: md5 48-bit hashes, integer math
until a final division, identical expression order both engines.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Window
from pyspark.sql import functions as F

from .registry import _t
from .registry_ext6 import _md48

# ------------------------------------------------- k-fold split -----

KFOLDS = 5


def q_kfold_split(spark, sf_dir):
    """Hash-deterministic k-fold CV assignment over documents with
    per-fold balance stats. fold = md5_48('f:'||doc_id) % k — stable
    under re-runs, shards, and engine (no RNG state), so a 1000-node
    job and a laptop agree on every row's fold.  One small shuffle
    (k rows out)."""
    d = _t(spark, sf_dir, "documents")
    fold = (_md48(F.concat(F.lit("f:"), F.col("doc_id"))) % KFOLDS)
    return (d.select(fold.alias("fold"), "doc_id", "n_chars", "lang")
            .groupBy("fold")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("n_chars").alias("sum_chars"),
                 F.countDistinct("lang").alias("n_langs"),
                 F.min("doc_id").alias("min_doc"),
                 F.max("doc_id").alias("max_doc"))
            .orderBy("fold"))


SQL_KFOLD_SPLIT = f"""
SELECT CAST('0x' || substr(md5('f:' || doc_id), 1, 12) AS BIGINT)
         % {KFOLDS} AS fold,
       COUNT(*) AS n,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       COUNT(DISTINCT lang) AS n_langs,
       MIN(doc_id) AS min_doc,
       MAX(doc_id) AS max_doc
FROM documents
GROUP BY 1 ORDER BY 1
"""


def q_group_split(spark, sf_dir):
    """GROUP-level train/test holdout: whole USERS hash to a split
    (md5 permille < 800 → train), so no user's events leak across
    the boundary — the GroupShuffleSplit to kfold_split's row-level
    folds.  The split is a per-row expression on the grouping key:
    no join, no shuffle beyond the 2-row rollup."""
    e = _t(spark, sf_dir, "events")
    split = F.when(
        _md48(F.concat(F.lit("g:"), F.col("user_id"))) % 1000 < 800,
        F.lit("train")).otherwise(F.lit("test"))
    return (e.select(split.alias("split"), "user_id", "event_type")
            .groupBy("split")
            .agg(F.countDistinct("user_id").alias("n_users"),
                 F.count(F.lit(1)).alias("n_events"),
                 F.sum((F.col("event_type") == "purchase").cast("bigint"))
                 .alias("n_purchases"))
            .orderBy("split"))


SQL_GROUP_SPLIT = """
SELECT CASE WHEN CAST('0x' || substr(md5('g:' || user_id), 1, 12)
                 AS BIGINT) % 1000 < 800
            THEN 'train' ELSE 'test' END AS split,
       COUNT(DISTINCT user_id) AS n_users,
       COUNT(*) AS n_events,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_purchases
FROM events
GROUP BY 1 ORDER BY 1
"""


# ------------------------------------------- k-means assign step ----

KM_DIM = 64
KM_CENTROIDS = 8  # embeddings with vec_id < 8 act as fixed centroids


def _sq_dist(e_col: str, c_col: str):
    """Unrolled 64-term squared-L2 — fixed left-to-right addition
    order, each float element cast to double first, so Spark and the
    oracle run the identical IEEE sequence (the same recipe as
    llm/similarity._dot; HOF aggregate() would interpret per-row)."""
    def term(i):
        d = (F.element_at(F.col(e_col), i).cast("double")
             - F.element_at(F.col(c_col), i).cast("double"))
        return d * d
    return reduce(lambda a, b: a + b, [term(i) for i in range(1, KM_DIM + 1)])


def assign_nearest(e):
    """The k-means E-STEP as a reusable DataFrame transform: one row
    per vector with its nearest fixed centroid (vec_id, embedding,
    cid, dist) — shared by the assign query here and the M-step in
    registry_ext8 so the tie-break and distance unrolling exist
    exactly once.  Centroids broadcast (k rows); vectors are never
    shuffled until the k-row-per-vector argmin window — at 100 TB
    the argmin swaps to the groupBy(min_by) form so the only shuffle
    is the k-row cell rollup."""
    cent = (e.filter(F.col("vec_id") < KM_CENTROIDS)
            .select(F.col("vec_id").alias("cid"),
                    F.col("embedding").alias("c_emb")))
    joined = (e.select("vec_id", "embedding")
              .crossJoin(F.broadcast(cent))
              .select("vec_id", "embedding", "cid",
                      _sq_dist("embedding", "c_emb").alias("dist")))
    w = Window.partitionBy("vec_id").orderBy("dist", "cid")
    return (joined.select("vec_id", "embedding", "cid", "dist",
                          F.row_number().over(w).alias("rn"))
            .filter(F.col("rn") == 1).drop("rn"))


def sql_assign_best(extra_cols: str = "") -> str:
    """The matching dists/best CTE prefix for the oracle SQL —
    ONE generated copy of the 64-term unrolled distance."""
    terms = " + ".join(
        f"(CAST(e.embedding[{i}] AS DOUBLE) - CAST(c.embedding[{i}] AS DOUBLE))"
        f" * (CAST(e.embedding[{i}] AS DOUBLE) - CAST(c.embedding[{i}] AS DOUBLE))"
        for i in range(1, KM_DIM + 1))
    return f"""
WITH dists AS (
  SELECT e.vec_id{extra_cols}, c.vec_id AS cid, {terms} AS dist
  FROM embeddings e JOIN embeddings c ON c.vec_id < {KM_CENTROIDS}),
best AS (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
  FROM dists)"""


def q_kmeans_assign(spark, sf_dir):
    """Nearest-centroid assignment (the k-means E-step,
    ``assign_nearest``) of every embedding to 8 fixed centroids,
    reported as per-cell population plus exact min/max distance."""
    best = assign_nearest(_t(spark, sf_dir, "embeddings"))
    return (best.groupBy("cid")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.min("dist").alias("min_dist"),
                 F.max("dist").alias("max_dist"))
            .orderBy("cid"))


def _sql_kmeans_assign() -> str:
    return f"""{sql_assign_best()}
SELECT cid, COUNT(*) AS n, MIN(dist) AS min_dist, MAX(dist) AS max_dist
FROM best WHERE rn = 1
GROUP BY cid ORDER BY cid
"""


# --------------------------------------------------- salted join ----

def q_salted_join(spark, sf_dir):
    """The skew-mitigation join as a query: lineitem (big, salted)
    joined to orders (small, replicated 8×) on the order key, rolled
    up per order priority.  The oracle is the PLAIN join — the salt
    spreads each hot key over 8 reducers without changing a single
    output row, which is exactly the property worth oracle-checking.
    operators/joins.py:39 documents when to reach for this over AQE
    skew splitting."""
    from .operators.joins import salted_join
    li = (_t(spark, sf_dir, "lineitem")
          .select("l_orderkey",
                  (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
                  .cast("bigint").alias("cents")))
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority")
    joined = salted_join(li, o, ["l_orderkey"], n_salts=8)
    return (joined.groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n_items"),
                 (F.sum("cents").cast("double") / 100).alias("revenue"))
            .orderBy("o_orderpriority"))


SQL_SALTED_JOIN = """
SELECT o.o_orderpriority, COUNT(*) AS n_items,
       CAST(CAST(SUM(CAST(l.l_extendedprice * 100 AS BIGINT)) AS DOUBLE)
            / 100 AS DOUBLE) AS revenue
FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority
"""


# ------------------------------------- cluster representatives ------

def q_dedup_reps(spark, sf_dir):
    """One representative per near-duplicate cluster: the largest
    document (ties to the smallest id) survives, everything else in
    the component is dropped — the final step of the dedup pipeline
    (pairs → components → survivors).  Emits one row per CLUSTER
    (component, representative, size) so the cleaned-corpus cut is
    ``semi-join docs on rep_doc_id``."""
    from .llm.dedup import dedup_components, minhash_pairs
    d = _t(spark, sf_dir, "documents")
    pairs = minhash_pairs(d, threshold=0.2)
    comp = dedup_components(pairs, d.select("doc_id"))
    sized = comp.join(d.select("doc_id", "n_chars"), "doc_id")
    w = (Window.partitionBy("component")
         .orderBy(F.desc("n_chars"), "doc_id"))
    return (sized.select(
        F.col("component").cast("bigint").alias("component"),
        "doc_id", "n_chars",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("component"))
        .alias("cluster_size"))
        .filter(F.col("rn") == 1)
        .select("component", F.col("doc_id").alias("rep_doc_id"),
                F.col("n_chars").alias("rep_chars"), "cluster_size"))


def _sql_dedup_reps() -> str:
    from .registry_llm2 import sql_dedup_groups
    return f"""
WITH sized AS (
  SELECT g.component, g.doc_id, d.n_chars,
         ROW_NUMBER() OVER (PARTITION BY g.component
                            ORDER BY d.n_chars DESC, g.doc_id) AS rn,
         COUNT(*) OVER (PARTITION BY g.component) AS cluster_size
  FROM ({sql_dedup_groups()}) g JOIN documents d USING (doc_id))
SELECT component, doc_id AS rep_doc_id, n_chars AS rep_chars,
       CAST(cluster_size AS BIGINT) AS cluster_size
FROM sized WHERE rn = 1
"""


# -------------------------------------------------- EWMA smoothing --

EWMA_DEPTH = 8
# 1 - 2^-m for m = 1..8: exact dyadic literals, so both engines parse
# the identical double and no pow() implementation is in the loop
_WSUM = [1 - 2 ** -(m) for m in range(1, EWMA_DEPTH + 1)]


def q_ewma_smooth(spark, sf_dir):
    """Truncated EWMA (depth 8, alpha 1/2) of event values per user —
    the streaming-friendly smoother: weights 2^-1 .. 2^-8 over the
    last 8 observations, renormalized by the exact partial weight sum
    at the sequence head.  Every constant is a dyadic rational and
    the addition order is pinned, so Spark and DuckDB emit
    bit-identical doubles — NO rounding anywhere.  One user-partition
    window, no other shuffle; the streaming twin keeps one running
    state value per user instead of 8 lags."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    terms = [F.coalesce(F.lag("value", j).over(w), F.lit(0.0))
             * F.lit(2.0 ** -(j + 1)) for j in range(EWMA_DEPTH)]
    raw = reduce(lambda a, b: a + b, terms)
    m = F.least(F.row_number().over(w), F.lit(EWMA_DEPTH))
    wsum = F.element_at(F.array(*[F.lit(v) for v in _WSUM]), m)
    return e.select("event_id", "user_id", (raw / wsum).alias("ewma"))


def _sql_ewma_smooth() -> str:
    terms = " + ".join(
        f"COALESCE(lag(value, {j}) OVER w, 0.0) * {2.0 ** -(j + 1)!r}"
        for j in range(EWMA_DEPTH))
    wsum = ", ".join(repr(v) for v in _WSUM)
    return f"""
SELECT event_id, user_id,
       ({terms})
       / ([{wsum}])[LEAST(ROW_NUMBER() OVER w, {EWMA_DEPTH})] AS ewma
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


# ---------------------------------------------- quality deciles -----

def q_quality_deciles(spark, sf_dir):
    """Decile bucketing of a corpus quality score (n_chars as the
    stand-in integer score) — the "train on the top 30%" curation
    cut.  ntile(10) over a UNIQUE total order (score, doc_id) is
    engine-deterministic; per-bucket stats are all integers."""
    d = _t(spark, sf_dir, "documents")
    w = Window.orderBy("n_chars", "doc_id")
    return (d.select("doc_id", "n_chars", "lang",
                     F.ntile(10).over(w).alias("decile"))
            .groupBy("decile")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.min("n_chars").alias("min_chars"),
                 F.max("n_chars").alias("max_chars"),
                 F.countDistinct("lang").alias("n_langs"))
            .orderBy("decile"))


SQL_QUALITY_DECILES = """
WITH ranked AS (
  SELECT doc_id, n_chars, lang,
         ntile(10) OVER (ORDER BY n_chars, doc_id) AS decile
  FROM documents)
SELECT decile, COUNT(*) AS n, MIN(n_chars) AS min_chars,
       MAX(n_chars) AS max_chars, COUNT(DISTINCT lang) AS n_langs
FROM ranked GROUP BY decile ORDER BY decile
"""


QUERIES_EXT7: dict[str, dict] = {
    "kfold_split":     {"fn": q_kfold_split,     "sql": SQL_KFOLD_SPLIT},
    "group_split":     {"fn": q_group_split,     "sql": SQL_GROUP_SPLIT},
    "kmeans_assign":   {"fn": q_kmeans_assign,
                        "sql": _sql_kmeans_assign()},
    "salted_join":     {"fn": q_salted_join,     "sql": SQL_SALTED_JOIN},
    "dedup_reps":      {"fn": q_dedup_reps,      "sql": _sql_dedup_reps()},
    "ewma_smooth":     {"fn": q_ewma_smooth,     "sql": _sql_ewma_smooth()},
    "quality_deciles": {"fn": q_quality_deciles,
                        "sql": SQL_QUALITY_DECILES},
}
