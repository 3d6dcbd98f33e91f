"""Twenty-third extension wave (round 14) — data-MIXING operators:
the selection step that turns a deduplicated, quality-filtered corpus
into a training mixture with controlled per-domain token shares.
Curation (llm_curation / llm_curation_sem) decides WHICH documents
are good; these decide HOW MUCH of each domain the training run
actually consumes — the knob the mixture-design literature tunes
(GPT-3's weighted sampling, The Pile's per-subset epochs, Xie et
al.'s DoReMi reweighting, Muennighoff et al. 2023's data-constrained
repeats).

- ``llm_mix_balanced``: balanced-domain selection — every ``source``
  contributes the SAME number of tokens (half the smallest domain's
  total), taken greedily in ingest (doc_id) order.  The running
  token count is a DISTRIBUTED TWO-PHASE PREFIX SUM, not one window
  partition per domain: a window partitioned by source alone puts an
  entire domain in ONE task (the classic 100 TB window failure —
  a web-crawl domain can be most of the corpus); instead, documents
  are bucketed by ``doc_id div MIX_BUCKET``, the within-bucket
  running sum is a window over bounded-size (source, bucket) groups,
  and each bucket's starting offset comes from a per-(source,bucket)
  SUM aggregate — corpus/MIX_BUCKET rows — cumulated and joined
  back on the same (source, bucket) keys the big side is already
  shuffled on.  At production scale MIX_BUCKET is chosen ~2^20 so
  the offset frame is millions of times smaller than the corpus and
  AQE broadcasts it; the fixture value keeps several buckets alive
  at sf0.001.

- ``llm_mix_epochs``: the data-constrained mixture plan (Muennighoff
  et al. 2023 shape): given a global token budget (80% of the
  corpus) split UNIFORMLY across domains, emit per domain its total
  tokens, its target share, and the EPOCH COUNT ceil(target/total)
  — domains smaller than their share repeat (epochs > 1), larger
  ones truncate (epochs = 1).  Pure integer arithmetic (ceil
  division as (a + b - 1) div b), one aggregate over the corpus —
  the plan an actual sampler (stratified_sample / priority_sample)
  then executes.

Reference anchor: nothing in lcmap-blackmagic — mixture design is an
engine-first addition for the training-data pipeline (brief
§LLM-ops).  Both entries carry full DuckDB oracles; token semantics
are llm_token_count's ws_tokens (split on single space, lowered,
trimmed) so the mixing and counting surfaces agree.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .registry import _t

MIX_BUCKET = 64      # docs per prefix-sum bucket (2^20 at scale)
MIX_SHARE_PCT = 80   # llm_mix_epochs: global budget, % of corpus


def _doc_tokens(spark, sf_dir):
    """(doc_id, source, tok): whitespace token counts — identical
    semantics to llm_token_count's ws_tokens column."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id", "source",
        F.size(F.split(F.lower(F.trim(F.col("text"))), " "))
        .cast("long").alias("tok"))


def q_llm_mix_balanced(spark, sf_dir):
    """Balanced-domain mixture selection via a distributed prefix
    sum.  Selection rule: within each source, docs are taken in
    doc_id order while the running total BEFORE the doc is under the
    budget (so the crossing doc is included — every domain reaches
    its budget exactly once); budget = min(domain totals) div 2, the
    same for every domain.  Output: the selected docs with their
    running totals — the exact frame a downstream packer consumes.

    Plan shape (see module docstring): one shuffle to (source,
    bucket) for the bounded within-bucket window, one small
    aggregate + window over corpus/MIX_BUCKET rows for the offsets,
    one equi-join back on the keys the big side is already
    partitioned by, and a 1-row budget frame cross-joined (always
    broadcast).  No window partition ever exceeds MIX_BUCKET docs,
    no matter how skewed the domain sizes are."""
    t = _doc_tokens(spark, sf_dir)
    b = t.withColumn("bucket", F.expr(f"doc_id div {MIX_BUCKET}"))

    w_in = Window.partitionBy("source", "bucket").orderBy("doc_id")
    local = b.withColumn("local_cum", F.sum("tok").over(w_in))

    sums = b.groupBy("source", "bucket").agg(F.sum("tok").alias("bs"))
    w_off = Window.partitionBy("source").orderBy("bucket")
    offs = (sums
            .withColumn("off", F.sum("bs").over(w_off) - F.col("bs"))
            .select("source", "bucket", "off"))

    cum = (local.join(offs, ["source", "bucket"])
           .withColumn("cum_tok", F.col("local_cum") + F.col("off")))

    budget = (t.groupBy("source").agg(F.sum("tok").alias("total"))
              .agg(F.expr("min(total) div 2").alias("budget")))
    return (cum.crossJoin(F.broadcast(budget))
            .filter(F.col("cum_tok") - F.col("tok") < F.col("budget"))
            .select("doc_id", "source", "tok", "cum_tok"))


SQL_MIX_BALANCED = """
WITH t AS (
  SELECT doc_id, source,
         CAST(len(string_split(lower(trim(text)), ' ')) AS BIGINT)
           AS tok
  FROM documents
), c AS (
  SELECT doc_id, source, tok,
         CAST(SUM(tok) OVER (PARTITION BY source ORDER BY doc_id)
              AS BIGINT) AS cum_tok
  FROM t
), b AS (
  SELECT CAST(MIN(total) // 2 AS BIGINT) AS budget
  FROM (SELECT SUM(tok) AS total FROM t GROUP BY source)
)
SELECT doc_id, source, tok, cum_tok
FROM c, b
WHERE cum_tok - tok < budget
"""


def q_llm_mix_epochs(spark, sf_dir):
    """Data-constrained mixture plan: uniform target share per
    domain out of a global budget of MIX_SHARE_PCT% of corpus
    tokens; epochs = ceil(target / total) in exact integer
    arithmetic.  One corpus aggregate + a 1-row broadcast of the
    (grand total, domain count) pair."""
    t = _doc_tokens(spark, sf_dir)
    per = t.groupBy("source").agg(F.sum("tok").alias("total_tok"))
    g = per.agg(
        F.sum("total_tok").alias("grand"),
        F.count(F.lit(1)).alias("k"))
    return (per.crossJoin(F.broadcast(g))
            .withColumn("target_tok", F.expr(
                f"(grand * {MIX_SHARE_PCT} div 100) div k"))
            .withColumn("epochs", F.expr(
                "(target_tok + total_tok - 1) div total_tok"))
            .select("source", "total_tok", "target_tok", "epochs"))


SQL_MIX_EPOCHS = f"""
WITH t AS (
  SELECT source,
         CAST(len(string_split(lower(trim(text)), ' ')) AS BIGINT)
           AS tok
  FROM documents
), per AS (
  SELECT source, SUM(tok) AS total_tok FROM t GROUP BY source
), g AS (
  SELECT SUM(total_tok) AS grand, COUNT(*) AS k FROM per
)
SELECT source, CAST(total_tok AS BIGINT) AS total_tok,
       CAST((grand * {MIX_SHARE_PCT} // 100) // k AS BIGINT)
         AS target_tok,
       CAST((((grand * {MIX_SHARE_PCT} // 100) // k) + total_tok - 1)
            // total_tok AS BIGINT) AS epochs
FROM per, g
"""


MIX_SQ_SCALE = 10 ** 8   # isqrt(n·10^8) ≈ √n·10^4 — α=0.5 weights


def q_llm_mix_temperature(spark, sf_dir):
    """Temperature-scaled domain sampling weights — w_s ∝ n_s^α with
    α = 0.5, the multilingual mixing rule (mBERT / XLM-R / mT5
    exponential smoothing): upsample small domains, damp the giant
    ones.  Emitted per source: total tokens, the α=1 proportional
    share (basis points), and the α=0.5 temperature weight (basis
    points) — the flattening is the delta between the two columns.

    The sqrt is EXACT-integer despite both engines computing it in
    doubles: s0 = floor(sqrt(double(n·10^8))) can be off by at most
    ±1 (the conversion error is ≤ 1 ulp relative, so the absolute
    error in s stays ≪ 1 for s < 2^52), and two integer correction
    steps — subtract 1 while s² > x, add 1 while (s+1)² ≤ x — land
    both engines on THE integer sqrt regardless of how their libm
    rounded.  All downstream arithmetic is bigint div.  (n·10^8
    must stay under 2^63: fine to ~9·10^10 tokens per domain; past
    that, widen to DECIMAL(38,0) — the snapshot-store pattern.)
    One corpus aggregate; the per-source frame is domain-count
    sized; the 1-row denominators broadcast."""
    t = _doc_tokens(spark, sf_dir)
    per = t.groupBy("source").agg(F.sum("tok").alias("total_tok"))
    x = F.col("total_tok") * F.lit(MIX_SQ_SCALE)
    s0 = F.floor(F.sqrt(x.cast("double"))).cast("bigint")
    s1 = s0 - F.when(s0 * s0 > x, F.lit(1)).otherwise(F.lit(0))
    s = s1 + F.when((s1 + 1) * (s1 + 1) <= x,
                    F.lit(1)).otherwise(F.lit(0))
    withs = per.withColumn("sq", s)
    g = withs.agg(F.sum("total_tok").alias("grand"),
                  F.sum("sq").alias("sq_sum"))
    return (withs.crossJoin(F.broadcast(g))
            .withColumn("share_bp",
                        F.expr("total_tok * 10000 div grand"))
            .withColumn("w_half_bp",
                        F.expr("sq * 10000 div sq_sum"))
            .select("source", "total_tok", "share_bp", "w_half_bp"))


SQL_MIX_TEMPERATURE = f"""
WITH t AS (
  SELECT source,
         CAST(len(string_split(lower(trim(text)), ' ')) AS BIGINT)
           AS tok
  FROM documents
), per AS (
  SELECT source, CAST(SUM(tok) AS BIGINT) AS total_tok
  FROM t GROUP BY source
), sq AS (
  SELECT source, total_tok,
         (SELECT s1 + (CASE WHEN (s1 + 1) * (s1 + 1) <= x
                            THEN 1 ELSE 0 END)
          FROM (SELECT s0 - (CASE WHEN s0 * s0 > x
                                  THEN 1 ELSE 0 END) AS s1, x
                FROM (SELECT CAST(floor(sqrt(CAST(
                        total_tok * {MIX_SQ_SCALE} AS DOUBLE)))
                        AS BIGINT) AS s0,
                        total_tok * {MIX_SQ_SCALE} AS x))) AS sq
  FROM per
), g AS (
  SELECT SUM(total_tok) AS grand, SUM(sq) AS sq_sum FROM sq
)
SELECT source, total_tok,
       CAST(total_tok * 10000 // grand AS BIGINT) AS share_bp,
       CAST(sq * 10000 // sq_sum AS BIGINT) AS w_half_bp
FROM sq, g
"""


# ----------------------------------------------- retrieval surface --

ANN_FILTER_MOD = 2   # llm_ann_filtered: neighbors with label % 2 = 0
RRF_K = 60           # the standard reciprocal-rank-fusion constant
RRF_SCALE = 10 ** 9  # integer-exact 1/(k+rank) as SCALE div (k+rank)
RRF_TOPK = 15


def q_llm_ann_filtered(spark, sf_dir):
    """FILTERED vector search — the one-index-many-filters
    deployment every retrieval stack needs (FAISS IDSelector /
    vector-DB metadata filters): the SAME IVF index as
    ``llm_ann_ivf_exact`` (identical centroids, probes, ranking)
    with candidates PRE-filtered to vectors whose ``label %
    ANN_FILTER_MOD == 0`` before ranking.  Pre-filtering keeps
    recall (post-filtering a top-k can starve); the filter is a
    column-pruned (vec_id, label) scan semi-joined into the
    postings, so the index itself is shared across every predicate.
    See q_llm_ann_ivf_exact's docstring for the exact-integer
    ranking contract."""
    from .registry_ext19 import q_llm_ann_ivf_exact
    return q_llm_ann_ivf_exact(spark, sf_dir,
                               label_mod=ANN_FILTER_MOD)


def q_llm_rrf_fusion(spark, sf_dir):
    """HYBRID retrieval: reciprocal-rank fusion (Cormack et al.
    2009) of the lexical BM25 ranking (``bm25_topk``'s fixed query
    over documents) and a vector cosine ranking (the lowest-id
    nonzero embedding as the query vector, exact-integer comparator
    — the registry's dot/q2/n2 contract), ids aligned doc_id ≡
    vec_id as in llm_curation_sem.  RRF is rank-arithmetic only, so
    it fuses float-scored BM25 with integer-scored cosine without a
    score-calibration step — exactly why production stacks use it —
    and here it is INTEGER-exact: each list contributes RRF_SCALE
    div (RRF_K + rank), missing membership contributes 0.  Scale
    shape: both first stages are scan → project → TakeOrdered (the
    vector side swaps in the IVF probe at index scale); fusion
    joins two ≤20-row frames."""
    from pyspark.sql import Window

    from .registry_ext6 import BM25_TOPK, q_bm25_topk
    from .registry_ext19 import IVX_QS

    lex = q_bm25_topk(spark, sf_dir)
    wl = Window.orderBy(F.desc("bm25"), "doc_id")
    lexr = (lex.withColumn("lex_rank", F.row_number().over(wl))
            .select(F.col("doc_id").alias("id"), "lex_rank"))

    e = _t(spark, sf_dir, "embeddings")
    arr = e.select(
        "vec_id",
        F.transform("embedding",
                    lambda x: F.floor(x.cast("double") * IVX_QS)
                    .cast("bigint")).alias("qa"))
    sq = F.aggregate(F.col("qa"), F.lit(0).cast("bigint"),
                     lambda a, v: a + v * v)
    n = arr.withColumn("n2", sq)
    qv = (n.filter(F.col("n2") > 0).orderBy("vec_id").limit(1)
          .select(F.col("vec_id").alias("qid"),
                  F.col("qa").alias("qqa"), F.col("n2").alias("q2")))
    dot = F.aggregate(
        F.zip_with(F.col("qqa"), F.col("qa"), lambda x, y: x * y),
        F.lit(0).cast("bigint"), lambda a, v: a + v)
    score = (F.when(F.col("dot") >= 0, F.col("dot") * F.col("dot"))
             .otherwise(-(F.col("dot") * F.col("dot")))
             .cast("double")
             / (F.col("q2") * F.col("n2")).cast("double"))
    # top-20 via orderBy+limit (TakeOrderedAndProject — per-partition
    # heaps, no global sort), THEN rank the ≤20-row cut; a row_number
    # window over the corpus would serialize the scan into one task
    vec_top = (n.filter(F.col("n2") > 0).crossJoin(F.broadcast(qv))
               .filter(F.col("vec_id") != F.col("qid"))
               .withColumn("dot", dot)
               .withColumn("score", score)
               .orderBy(F.desc("score"), "vec_id").limit(BM25_TOPK))
    wv = Window.orderBy(F.desc("score"), "vec_id")
    vecr = (vec_top.withColumn("vec_rank", F.row_number().over(wv))
            .select(F.col("vec_id").alias("id"), "vec_rank"))

    part_l = F.expr(f"CAST({RRF_SCALE} AS BIGINT)"
                    f" div ({RRF_K} + lex_rank)")
    part_v = F.expr(f"CAST({RRF_SCALE} AS BIGINT)"
                    f" div ({RRF_K} + vec_rank)")
    return (lexr.join(vecr, "id", "full")
            .withColumn("rrf", F.coalesce(part_l, F.lit(0))
                        + F.coalesce(part_v, F.lit(0)))
            .orderBy(F.desc("rrf"), "id").limit(RRF_TOPK)
            .select("id", "lex_rank", "vec_rank", "rrf"))


def _sql_rrf_fusion() -> str:
    from .registry_ext6 import BM25_TOPK, _sql_bm25_topk
    from .registry_ext19 import IVX_DIM, IVX_QS
    gs = f"generate_series(1, {IVX_DIM})"
    quant = (f"list_transform(embedding, x -> CAST(floor("
             f"CAST(x AS DOUBLE) * {IVX_QS}) AS BIGINT))")
    return f"""
WITH bm AS MATERIALIZED ({_sql_bm25_topk()}),
lexr AS (SELECT doc_id AS id,
                ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id)
                  AS lex_rank
         FROM bm),
arr AS MATERIALIZED (SELECT vec_id, {quant} AS qa,
         list_sum(list_transform({quant}, x -> x * x)) AS n2
       FROM embeddings),
qv AS (SELECT vec_id AS qid, qa AS qqa, n2 AS q2 FROM arr
       WHERE n2 > 0 ORDER BY vec_id LIMIT 1),
sc AS (SELECT a.vec_id AS id,
              list_sum(list_transform({gs},
                i -> qv.qqa[i] * a.qa[i])) AS dot,
              qv.q2 AS q2, a.n2 AS n2
       FROM arr a, qv WHERE a.n2 > 0 AND a.vec_id <> qv.qid),
vecr AS (SELECT id, vec_rank FROM (
           SELECT id, ROW_NUMBER() OVER (ORDER BY
             CAST(CASE WHEN dot >= 0 THEN dot * dot
                  ELSE -(dot * dot) END AS DOUBLE)
             / CAST(q2 * n2 AS DOUBLE) DESC, id) AS vec_rank
           FROM sc) WHERE vec_rank <= {BM25_TOPK})
SELECT COALESCE(l.id, v.id) AS id, l.lex_rank, v.vec_rank,
       (COALESCE({RRF_SCALE} // ({RRF_K} + l.lex_rank), 0)
        + COALESCE({RRF_SCALE} // ({RRF_K} + v.vec_rank), 0)) AS rrf
FROM lexr l FULL JOIN vecr v ON l.id = v.id
ORDER BY rrf DESC, id LIMIT {RRF_TOPK}
"""


def _sql_ann_filtered() -> str:
    from .registry_ext19 import _sql_ivf_exact
    return _sql_ivf_exact(label_mod=ANN_FILTER_MOD)


QUERIES_EXT22: dict[str, dict] = {
    "llm_mix_balanced": {"fn": q_llm_mix_balanced,
                         "sql": SQL_MIX_BALANCED},
    "llm_mix_epochs": {"fn": q_llm_mix_epochs,
                       "sql": SQL_MIX_EPOCHS},
    "llm_mix_temperature": {"fn": q_llm_mix_temperature,
                            "sql": SQL_MIX_TEMPERATURE},
    "llm_ann_filtered": {"fn": q_llm_ann_filtered,
                         "sql": _sql_ann_filtered()},
    "llm_rrf_fusion": {"fn": q_llm_rrf_fusion,
                       "sql": _sql_rrf_fusion()},
}
