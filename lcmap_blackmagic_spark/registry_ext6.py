"""Seventh extension wave — round-5 session-3 operators.

Two families the training-data story was still missing:

**Model evaluation** (the metrics a training pipeline computes after
``ml/train.py`` fits anything — the reference's only metric is the
xgboost eval round, blackmagic/blueprints/tile.py:287-331):

- ``eval_auc``: grouped ROC-AUC via the rank-sum (Mann-Whitney U)
  identity, tie-corrected with average ranks — all-integer until the
  single final division,
- ``eval_confusion``: per-class confusion counts + precision /
  recall / F1, each ratio one integer division,
- ``eval_calibration``: reliability bins (predicted-probability
  deciles vs observed positive rate) with per-bin |gap|.

**Information retrieval** (corpus-side text search beside the
TF-IDF / rarity scores in llm/text.py):

- ``bm25_topk``: Okapi BM25 (k1=1.2, b=0.75) of a fixed query
  against the documents corpus, top-k by ROUNDED score so the float
  tail can never reorder the cut,
- ``inverted_index``: term -> (df, sorted postings list) — the
  string-serialized form the oracle comparator can hash,
- ``pmi_bigrams``: top adjacent-word collocations ranked by a
  scaled integer PMI ratio (log-free: monotone in PMI, exact in
  int64 up to ~sf10 corpora).

Determinism contract is the registry-wide one (registry.py): md5
48-bit hashes for pseudo-randomness, integer math until one final
division, ROUND(x, 6) on every emitted double, identical expression
shape (and evaluation order) in the Spark plan and the DuckDB SQL.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .registry import _t


def _md48(col):
    """48-bit integer prefix of md5 — the repo-wide deterministic
    hash (operators/sampling.py:137, same DuckDB twin)."""
    return F.conv(F.substring(F.md5(col), 1, 12), 16, 10).cast("bigint")


# ------------------------------------------------- grouped ROC-AUC --

def q_eval_auc(spark, sf_dir):
    """Per-priority ROC-AUC of "o_totalprice predicts completed
    status" via the rank-sum identity AUC = (U / (P*N)) with
    tie-corrected average ranks.

    Shape: one sort per group (the rank window), one partial-agg
    reduction — no per-pair work, so it scales as a sort, not as the
    O(P*N) pair expansion the naive AUC definition implies.  The
    tied-block average rank is kept integral by doubling:
    2*avg_rank = 2*rank + ties - 1, so the only float op is the
    final division."""
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("grp"),
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint").alias("score"),
        (F.col("o_orderstatus") == "F").cast("int").alias("pos"))
    w_rank = Window.partitionBy("grp").orderBy("score")
    w_tie = Window.partitionBy("grp", "score")
    ranked = o.select(
        "grp", "pos",
        (2 * F.rank().over(w_rank) + F.count(F.lit(1)).over(w_tie) - 1)
        .alias("rank2"))
    agg = ranked.groupBy("grp").agg(
        F.sum("pos").alias("p"),
        (F.count(F.lit(1)) - F.sum("pos")).alias("n"),
        F.sum(F.col("pos") * F.col("rank2")).alias("sum2"))
    return agg.select(
        "grp", F.col("p").alias("n_pos"), F.col("n").alias("n_neg"),
        F.round((F.col("sum2") - F.col("p") * (F.col("p") + 1))
                .cast("double") / (2 * F.col("p") * F.col("n")), 6)
        .alias("auc"))


SQL_EVAL_AUC = """
WITH ranked AS (
  SELECT o_orderpriority AS grp,
         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS pos,
         2 * RANK() OVER (PARTITION BY o_orderpriority
                          ORDER BY CAST(o_totalprice * 100 AS BIGINT))
           + COUNT(*) OVER (PARTITION BY o_orderpriority,
                                         CAST(o_totalprice * 100 AS BIGINT))
           - 1 AS rank2
  FROM orders),
agg AS (
  SELECT grp, CAST(SUM(pos) AS BIGINT) AS p,
         CAST(COUNT(*) - SUM(pos) AS BIGINT) AS n,
         CAST(SUM(pos * rank2) AS BIGINT) AS sum2
  FROM ranked GROUP BY grp)
SELECT grp, p AS n_pos, n AS n_neg,
       ROUND(CAST(sum2 - p * (p + 1) AS DOUBLE) / (2 * p * n), 6) AS auc
FROM agg
"""


# ------------------------------------------- confusion matrix / F1 --

SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
            "MACHINERY"]  # public TPC-H segment list, sorted


def _confusion_base(spark, sf_dir):
    """(actual, predicted) per customer: the deterministic noisy
    classifier — keep the true segment when md5 says so (7/10),
    else pick a pseudo-random one."""
    c = _t(spark, sf_dir, "customer")
    h = _md48(F.concat(F.lit("p:"), F.col("c_custkey")))
    seg_arr = F.array(*[F.lit(s) for s in SEGMENTS])
    pred = F.when(h % 10 < 7, F.col("c_mktsegment")).otherwise(
        F.element_at(seg_arr, (h % 5 + 1).cast("int")))
    return c.select(F.col("c_mktsegment").alias("actual"),
                    pred.alias("predicted"))


def q_eval_confusion(spark, sf_dir):
    """Per-class precision / recall / F1 from the confusion counts.
    One small shuffle on the (actual, predicted) pair — at most
    |classes|^2 rows reach the driver-side arithmetic; F1 uses the
    harmonic identity f1 = 2tp / (2tp + fp + fn) so each emitted
    ratio is a single integer division."""
    pairs = (_confusion_base(spark, sf_dir)
             .groupBy("actual", "predicted").agg(F.count(F.lit(1)).alias("c")))
    tp = (pairs.filter(F.col("actual") == F.col("predicted"))
          .select(F.col("actual").alias("cls"), F.col("c").alias("tp")))
    by_actual = (pairs.groupBy("actual").agg(F.sum("c").alias("n_actual"))
                 .withColumnRenamed("actual", "cls"))
    by_pred = (pairs.groupBy("predicted").agg(F.sum("c").alias("n_pred"))
               .withColumnRenamed("predicted", "cls"))
    j = (by_actual.join(by_pred, "cls", "full")
         .join(tp, "cls", "left")
         .select("cls",
                 F.coalesce("tp", F.lit(0)).alias("tp"),
                 (F.coalesce("n_pred", F.lit(0))
                  - F.coalesce("tp", F.lit(0))).alias("fp"),
                 (F.coalesce("n_actual", F.lit(0))
                  - F.coalesce("tp", F.lit(0))).alias("fn")))
    return j.select(
        "cls", "tp", "fp", "fn",
        F.round(F.col("tp").cast("double") / (F.col("tp") + F.col("fp")), 6)
        .alias("prec"),
        F.round(F.col("tp").cast("double") / (F.col("tp") + F.col("fn")), 6)
        .alias("recall"),
        F.round((2 * F.col("tp")).cast("double")
                / (2 * F.col("tp") + F.col("fp") + F.col("fn")), 6)
        .alias("f1"))


SQL_EVAL_CONFUSION = f"""
WITH base AS (
  SELECT c_mktsegment AS actual,
         CASE WHEN CAST('0x' || substr(md5('p:' || c_custkey), 1, 12)
                        AS BIGINT) % 10 < 7
              THEN c_mktsegment
              ELSE (ARRAY{SEGMENTS!r})[
                CAST(CAST('0x' || substr(md5('p:' || c_custkey), 1, 12)
                          AS BIGINT) % 5 + 1 AS INT)]
         END AS predicted
  FROM customer),
pairs AS (SELECT actual, predicted, COUNT(*) AS c
          FROM base GROUP BY actual, predicted),
tp AS (SELECT actual AS cls, c AS tp FROM pairs WHERE actual = predicted),
a AS (SELECT actual AS cls, CAST(SUM(c) AS BIGINT) AS n_actual
      FROM pairs GROUP BY actual),
p AS (SELECT predicted AS cls, CAST(SUM(c) AS BIGINT) AS n_pred
      FROM pairs GROUP BY predicted)
SELECT cls,
       CAST(COALESCE(tp, 0) AS BIGINT) AS tp,
       CAST(COALESCE(n_pred, 0) - COALESCE(tp, 0) AS BIGINT) AS fp,
       CAST(COALESCE(n_actual, 0) - COALESCE(tp, 0) AS BIGINT) AS fn,
       ROUND(CAST(COALESCE(tp, 0) AS DOUBLE)
             / (COALESCE(tp, 0) + COALESCE(n_pred, 0) - COALESCE(tp, 0)), 6)
         AS prec,
       ROUND(CAST(COALESCE(tp, 0) AS DOUBLE)
             / (COALESCE(tp, 0) + COALESCE(n_actual, 0) - COALESCE(tp, 0)), 6)
         AS recall,
       ROUND(CAST(2 * COALESCE(tp, 0) AS DOUBLE)
             / (2 * COALESCE(tp, 0)
                + COALESCE(n_pred, 0) - COALESCE(tp, 0)
                + COALESCE(n_actual, 0) - COALESCE(tp, 0)), 6) AS f1
FROM a FULL JOIN p USING (cls) LEFT JOIN tp USING (cls)
"""


# --------------------------------------------- calibration bins -----

def q_eval_calibration(spark, sf_dir):
    """Reliability diagram: bucket a deterministic predicted
    probability (md5 permille of the order key) into deciles and
    compare against the deterministic outcome draw (a second,
    independent md5 stream with true rate 0.1 + 0.8 p).  Per-bin
    |gap| is the reliability residual; everything is integer until
    the three per-bin divisions."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey")
    h1 = _md48(F.concat(F.lit("p:"), F.col("o_orderkey"))) % 1000
    h2 = _md48(F.concat(F.lit("y:"), F.col("o_orderkey"))) % 1000
    base = o.select(h1.alias("p_mille"), h2.alias("draw")).select(
        F.expr("p_mille div 100").alias("bin"),
        "p_mille",
        # integer div, not /: the oracle floors, so must we
        (F.col("draw") < 100 + F.expr("(p_mille * 8) div 10"))
        .cast("int").alias("y"))
    agg = base.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("p_mille").alias("sum_p"),
        F.sum("y").alias("pos"))
    mean_p = F.col("sum_p").cast("double") / (1000 * F.col("n"))
    frac = F.col("pos").cast("double") / F.col("n")
    return agg.select(
        "bin", "n", "pos",
        F.round(mean_p, 6).alias("mean_pred"),
        F.round(frac, 6).alias("frac_pos"),
        F.round(F.abs(mean_p - frac), 6).alias("gap"))


SQL_EVAL_CALIBRATION = """
WITH base AS (
  SELECT CAST('0x' || substr(md5('p:' || o_orderkey), 1, 12) AS BIGINT)
           % 1000 AS p_mille,
         CAST('0x' || substr(md5('y:' || o_orderkey), 1, 12) AS BIGINT)
           % 1000 AS draw
  FROM orders),
agg AS (
  SELECT p_mille // 100 AS bin, COUNT(*) AS n,
         CAST(SUM(p_mille) AS BIGINT) AS sum_p,
         CAST(SUM(CASE WHEN draw < 100 + (p_mille * 8) // 10
                       THEN 1 ELSE 0 END) AS BIGINT) AS pos
  FROM base GROUP BY p_mille // 100)
SELECT bin, n, pos,
       ROUND(CAST(sum_p AS DOUBLE) / (1000 * n), 6) AS mean_pred,
       ROUND(CAST(pos AS DOUBLE) / n, 6) AS frac_pos,
       ROUND(ABS(CAST(sum_p AS DOUBLE) / (1000 * n)
                 - CAST(pos AS DOUBLE) / n), 6) AS gap
FROM agg
"""


# ------------------------------------------------------ BM25 topk ---

BM25_TERMS = ["spark", "vector", "window", "stream"]
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 20


def q_bm25_topk(spark, sf_dir):
    """Okapi BM25 of a fixed query over the corpus, top-k.

    Scale shape: NO explode and no wide shuffle at all — per-term tf
    comes from codegen ``regexp_count`` with zero-width boundary
    lookarounds (the stopword-count trick, llm/text.py:47-50), the
    corpus stats (n_docs, Σdl, per-term df) are ONE single-row
    reduction that broadcasts back, and the per-document score is a
    straight-line projection summing the |q| per-term contributions
    (a tf=0 term contributes exactly 0.0).  The whole query is
    scan → project → tiny agg ⨝ → TakeOrdered: it would run on
    100 TB without shuffling the corpus once.

    Float policy: the oracle's SUM accumulates the matched terms in
    engine order, so the two engines can differ in the last ulp of a
    per-doc score; both sides ROUND to 6 before the cut (and the
    cut orders by the rounded score, then doc_id), leaving only the
    astronomically thin round-boundary window — the documented
    residual risk of every ln-bearing query in this registry (the
    integer-exact operators avoid even that)."""
    import re as _re
    d = _t(spark, sf_dir, "documents")
    lowered = F.lower(F.trim("text"))
    padded = F.concat(F.lit(" "), lowered, F.lit(" "))
    tf_cols = [F.regexp_count(
        padded, F.lit(f"(?<= ){_re.escape(t)}(?= )")).alias(f"tf_{i}")
        for i, t in enumerate(BM25_TERMS)]
    base = d.select("doc_id",
                    F.size(F.split(lowered, " ")).alias("dl"), *tf_cols)
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("total_dl"),
        *[F.sum((F.col(f"tf_{i}") > 0).cast("bigint")).alias(f"df_{i}")
          for i in range(len(BM25_TERMS))])
    joined = base.crossJoin(F.broadcast(stats))
    dl_norm = (F.col("dl") * F.col("n_docs")).cast("double") / F.col("total_dl")
    denom_k = BM25_K1 * (1 - BM25_B + BM25_B * dl_norm)

    def term_score(i):
        tf, df = F.col(f"tf_{i}"), F.col(f"df_{i}")
        idf = F.log((2 * F.col("n_docs") + 2).cast("double")
                    / (2 * df + 1))
        return idf * ((tf * (BM25_K1 + 1)) / (tf + denom_k))

    from functools import reduce
    score = reduce(lambda a, b: a + b,
                   [term_score(i) for i in range(len(BM25_TERMS))])
    hits = reduce(lambda a, b: a + b,
                  [(F.col(f"tf_{i}") > 0).cast("bigint")
                   for i in range(len(BM25_TERMS))])
    per_doc = joined.select(
        "doc_id", F.round(score, 6).alias("bm25"), hits.alias("n_terms"))
    return (per_doc.filter(F.col("n_terms") > 0)
            .orderBy(F.desc("bm25"), "doc_id")
            .limit(BM25_TOPK))


def _sql_bm25_topk() -> str:
    terms = ", ".join(f"'{t}'" for t in BM25_TERMS)
    return f"""
WITH toks AS (
  SELECT doc_id, len(string_split(lower(trim(text)), ' ')) AS dl,
         unnest(string_split(lower(trim(text)), ' ')) AS tok
  FROM documents),
matched AS (SELECT * FROM toks WHERE tok IN ({terms})),
tf AS (SELECT doc_id, dl, tok, COUNT(*) AS tf
       FROM matched GROUP BY doc_id, dl, tok),
df_t AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
corpus AS (SELECT COUNT(*) AS n_docs,
                  SUM(len(string_split(lower(trim(text)), ' '))) AS total_dl
           FROM documents)
SELECT doc_id,
       ROUND(SUM(
         ln(CAST(2 * n_docs + 2 AS DOUBLE) / (2 * df + 1))
         * ((tf * ({BM25_K1} + 1))
            / (tf + {BM25_K1}
               * (1 - {BM25_B}
                  + {BM25_B} * (CAST(dl * n_docs AS DOUBLE) / total_dl))))
       ), 6) AS bm25,
       COUNT(*) AS n_terms
FROM tf JOIN df_t USING (tok) CROSS JOIN corpus
GROUP BY doc_id
ORDER BY bm25 DESC, doc_id
LIMIT {BM25_TOPK}
"""


# -------------------------------------------------- inverted index --

def q_inverted_index(spark, sf_dir):
    """Term -> (document frequency, sorted postings list) over the
    corpus — the search-index build step.  Postings are serialized
    to a comma string because the oracle comparator hashes scalar
    cells only (tests/oracle.py).  One explode + one (term) shuffle;
    collect_list is bounded per term by corpus df — the at-scale
    form shards wide terms by (term, doc_id // B) before the final
    concat, noted here rather than built since df ≤ |docs| in the
    fixtures."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim("text")), " ")).alias("tok"))
    return (toks.distinct()
            .groupBy("tok")
            .agg(F.count(F.lit(1)).alias("df"),
                 F.concat_ws(",", F.sort_array(F.collect_list("doc_id")))
                 .alias("postings"))
            .filter(F.col("df") >= 5))


SQL_INVERTED_INDEX = """
WITH toks AS (
  SELECT DISTINCT doc_id,
         unnest(string_split(lower(trim(text)), ' ')) AS tok
  FROM documents)
SELECT tok, COUNT(*) AS df,
       array_to_string(list_sort(array_agg(doc_id)), ',') AS postings
FROM toks GROUP BY tok HAVING COUNT(*) >= 5
"""


# ----------------------------------------------- PMI collocations ---

PMI_MIN_COUNT = 5
PMI_TOPK = 40


def q_pmi_bigrams(spark, sf_dir):
    """Top adjacent-word collocations by a scaled-integer PMI ratio:
    score = ((c_xy * 10^6) // c_x) * N_bi // c_y — monotone in
    pointwise mutual information (log is monotone), exact in int64
    through ~sf10 corpora, and log-free so both engines agree
    bit-for-bit.

    Shape: bigrams come from codegen ``arrays_zip``/``slice`` over
    the token array — NO per-document window sort, no shuffle before
    the (tok, tok2) count; the bigram total is derived arithmetically
    (Σ tokens − n_docs), so the corpus is token-exploded exactly
    twice (unigrams + bigrams), each a single pass."""
    d = _t(spark, sf_dir, "documents")
    arr = d.select("doc_id",
                   F.split(F.lower(F.trim("text")), " ").alias("toks"))
    bi = arr.select(F.expr(
        "inline(arrays_zip(slice(toks, 1, size(toks) - 1),"
        "                  slice(toks, 2, size(toks) - 1)))")) \
        .toDF("tok", "tok2")
    c_xy = bi.groupBy("tok", "tok2").agg(F.count(F.lit(1)).alias("c_xy"))
    uni = (arr.select(F.explode("toks").alias("tok"))
           .groupBy("tok").agg(F.count(F.lit(1)).alias("c")))
    n_docs = d.groupBy().agg(F.count(F.lit(1)).alias("n_docs"))
    n_bi = (uni.groupBy().agg(F.sum("c").alias("n_tok"))
            .crossJoin(n_docs)
            .select((F.col("n_tok") - F.col("n_docs")).alias("n_bi")))
    # the unigram-count joins are UNFORCED: `uni` is word-vocabulary
    # sized — Heaps-law sublinear but unbounded at 10^10 docs — so
    # AQE must pick broadcast only when the dictionary actually fits
    # (n_bi stays an explicit one-row broadcast)
    scored = (c_xy.filter(F.col("c_xy") >= PMI_MIN_COUNT)
              .join(uni.withColumnRenamed("c", "c_x"), "tok")
              .join(uni.select(F.col("tok").alias("tok2"),
                               F.col("c").alias("c_y")), "tok2")
              .crossJoin(F.broadcast(n_bi)))
    # integer div throughout (Spark's / is float; the oracle uses //)
    scored = scored.select(
        F.concat_ws(" ", "tok", "tok2").alias("bigram"),
        "c_xy", "c_x", "c_y",
        (F.expr("((c_xy * 1000000) div c_x) * n_bi div c_y")
         .alias("pmi_score")))
    return (scored.orderBy(F.desc("pmi_score"), "bigram")
            .limit(PMI_TOPK))


SQL_PMI_BIGRAMS = f"""
WITH toks AS (
  SELECT doc_id, pos, tok
  FROM (SELECT doc_id,
               generate_subscripts(string_split(lower(trim(text)), ' '), 1)
                 AS pos,
               unnest(string_split(lower(trim(text)), ' ')) AS tok
        FROM documents)),
bi AS (
  SELECT tok, lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS tok2
  FROM toks),
bi2 AS (SELECT * FROM bi WHERE tok2 IS NOT NULL),
c_xy AS (SELECT tok, tok2, COUNT(*) AS c_xy FROM bi2 GROUP BY tok, tok2),
uni AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
n AS (SELECT COUNT(*) AS n_bi FROM bi2)
SELECT x.tok || ' ' || x.tok2 AS bigram, x.c_xy,
       u1.c AS c_x, u2.c AS c_y,
       ((x.c_xy * 1000000) // u1.c) * n.n_bi // u2.c AS pmi_score
FROM c_xy x
JOIN uni u1 ON u1.tok = x.tok
JOIN uni u2 ON u2.tok = x.tok2
CROSS JOIN n
WHERE x.c_xy >= {PMI_MIN_COUNT}
ORDER BY pmi_score DESC, bigram
LIMIT {PMI_TOPK}
"""


# ------------------------------------------------- Brier score ------

def q_eval_brier(spark, sf_dir):
    """Brier score (mean squared error of the predicted probability)
    per order priority, over the same deterministic
    prediction/outcome streams as the calibration bins.  With p in
    permille, (p − 1000·y)² is an exact integer, so the group score
    is one bigint sum and ONE final division — a probabilistic
    metric with a bit-exact distributed form."""
    o = _t(spark, sf_dir, "orders")
    h1 = _md48(F.concat(F.lit("p:"), F.col("o_orderkey"))) % 1000
    h2 = _md48(F.concat(F.lit("y:"), F.col("o_orderkey"))) % 1000
    base = (o.select(F.col("o_orderpriority").alias("grp"),
                     h1.alias("p_mille"), h2.alias("draw"))
            .select("grp", "p_mille",
                    (F.col("draw") < 100 + F.expr("(p_mille * 8) div 10"))
                    .cast("bigint").alias("y")))
    sq = (F.col("p_mille") - 1000 * F.col("y"))
    agg = base.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(sq * sq).alias("ss"))
    return (agg.select(
        "grp", "n",
        F.round(F.col("ss").cast("double") / (F.col("n") * 1000000), 6)
        .alias("brier"))
        .orderBy("grp"))


SQL_EVAL_BRIER = """
WITH base AS (
  SELECT o_orderpriority AS grp,
         CAST('0x' || substr(md5('p:' || o_orderkey), 1, 12) AS BIGINT)
           % 1000 AS p_mille,
         CASE WHEN CAST('0x' || substr(md5('y:' || o_orderkey), 1, 12)
                        AS BIGINT) % 1000
                   < 100 + (CAST('0x' || substr(md5('p:' || o_orderkey),
                                                1, 12) AS BIGINT)
                            % 1000 * 8) // 10
              THEN 1 ELSE 0 END AS y
  FROM orders),
agg AS (
  SELECT grp, COUNT(*) AS n,
         CAST(SUM((p_mille - 1000 * y) * (p_mille - 1000 * y)) AS BIGINT)
           AS ss
  FROM base GROUP BY grp)
SELECT grp, n, ROUND(CAST(ss AS DOUBLE) / (n * 1000000), 6) AS brier
FROM agg ORDER BY grp
"""


# ---------------------------------------- data-quality checks -------

def q_dq_checks(spark, sf_dir):
    """Declarative data-quality expectations (the dbt-tests /
    Deequ-style constraint sweep) over the orders/customer pair:
    per rule, rows checked and rows violating.  Three scans total,
    each irreducible: ONE conditional aggregate covers every row-level
    rule (unpivoted to rows via stack — NOT one union branch per rule,
    which would re-execute the scan per rule), one groupBy for the
    uniqueness rule, one anti-join (+ count reuse) for referential
    integrity — the constraint report a 100 TB ingest job runs before
    publishing a partition."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    single = o.agg(
        F.count(F.lit(1)).alias("checked"),
        F.sum(F.col("o_orderkey").isNull().cast("bigint"))
        .alias("null_key"),
        F.sum((F.col("o_totalprice") <= 0).cast("bigint"))
        .alias("nonpos_price"),
        F.sum((~F.col("o_orderstatus").isin("F", "O", "P"))
              .cast("bigint")).alias("bad_status"))
    row_rules = single.select(F.expr(
        "stack(3, 'orderkey_not_null', checked, null_key, "
        "         'price_positive', checked, nonpos_price, "
        "         'status_accepted', checked, bad_status) "
        "AS (rule, checked, violations)"))
    dup = (o.groupBy("o_orderkey").agg(F.count(F.lit(1)).alias("k"))
           .agg(F.count(F.lit(1)).alias("checked"),
                F.sum((F.col("k") > 1).cast("bigint")).alias("viol"))
           .select(F.lit("orderkey_unique").alias("rule"),
                   "checked", F.col("viol").alias("violations")))
    orphan = (o.join(c, o["o_custkey"] == c["c_custkey"], "left_anti")
              .agg(F.count(F.lit(1)).alias("viol"))
              .crossJoin(o.agg(F.count(F.lit(1)).alias("checked")))
              .select(F.lit("custkey_in_customer").alias("rule"),
                      "checked", F.col("viol").alias("violations")))
    return row_rules.unionByName(dup).unionByName(orphan).orderBy("rule")


SQL_DQ_CHECKS = """
WITH single AS (
  SELECT COUNT(*) AS checked,
         CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS null_key,
         CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS nonpos_price,
         CAST(SUM(CASE WHEN o_orderstatus NOT IN ('F', 'O', 'P')
                       THEN 1 ELSE 0 END) AS BIGINT) AS bad_status
  FROM orders),
dup AS (
  SELECT COUNT(*) AS checked,
         CAST(SUM(CASE WHEN k > 1 THEN 1 ELSE 0 END) AS BIGINT) AS viol
  FROM (SELECT o_orderkey, COUNT(*) AS k FROM orders GROUP BY o_orderkey)),
orphan AS (
  SELECT (SELECT COUNT(*) FROM orders) AS checked,
         (SELECT COUNT(*) FROM orders o
          WHERE NOT EXISTS (SELECT 1 FROM customer c
                            WHERE c.c_custkey = o.o_custkey)) AS viol)
SELECT 'custkey_in_customer' AS rule, checked, viol AS violations
FROM orphan
UNION ALL SELECT 'orderkey_not_null', checked, null_key FROM single
UNION ALL SELECT 'orderkey_unique', checked, viol FROM dup
UNION ALL SELECT 'price_positive', checked, nonpos_price FROM single
UNION ALL SELECT 'status_accepted', checked, bad_status FROM single
ORDER BY rule
"""


# ------------------------------------------- n-gram LM scoring ------

def q_lm_score(spark, sf_dir):
    """Bigram language-model log-probability per document (add-one
    smoothing), trained on the corpus itself — the model-based
    quality signal beside the log-free unigram rarity
    (llm/text.rarity_scores).  avg_logprob = Σ ln((c12+1)/(c1+V))/n
    over the doc's bigrams.

    Shape: bigrams via codegen arrays_zip (the pmi_bigrams pass); the
    bigram/unigram count tables are vocabulary-sized, joined UNFORCED
    (AQE broadcasts while they fit); one (doc) aggregate.  ln enters only through ratios of exact
    integers, and the per-doc sum is wrapped in ROUND(6) — the
    cross-engine float policy the BM25 scorer documents."""
    d = _t(spark, sf_dir, "documents")
    arr = d.select("doc_id",
                   F.split(F.lower(F.trim("text")), " ").alias("toks"))
    bi = (arr.select("doc_id", F.expr(
        "inline(arrays_zip(slice(toks, 1, size(toks) - 1),"
        "                  slice(toks, 2, size(toks) - 1)))"))
        .toDF("doc_id", "tok", "tok2"))
    c_xy = bi.groupBy("tok", "tok2").agg(F.count(F.lit(1)).alias("c_xy"))
    uni = (arr.select(F.explode("toks").alias("tok"))
           .groupBy("tok").agg(F.count(F.lit(1)).alias("c_x")))
    vocab = uni.groupBy().agg(F.count(F.lit(1)).alias("v"))
    # count-table joins UNFORCED: c_xy is bigram-vocabulary sized and
    # uni unigram-vocabulary sized — both unbounded at corpus scale;
    # AQE broadcasts them only while they fit (vocab is one row)
    scored = (bi.join(c_xy, ["tok", "tok2"])
              .join(uni, "tok")
              .crossJoin(F.broadcast(vocab)))
    logp = F.log((F.col("c_xy") + 1).cast("double")
                 / (F.col("c_x") + F.col("v")))
    return (scored.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_bigrams"),
                 F.round(F.sum(logp)
                         / F.count(F.lit(1)), 6).alias("avg_logprob"))
            .orderBy("doc_id"))


SQL_LM_SCORE = """
WITH arr AS (
  SELECT doc_id, string_split(lower(trim(text)), ' ') AS ws
  FROM documents),
bi AS (
  SELECT doc_id,
         UNNEST(list_transform(generate_series(1, len(ws) - 1),
                               i -> ws[i])) AS tok,
         UNNEST(list_transform(generate_series(1, len(ws) - 1),
                               i -> ws[i + 1])) AS tok2
  FROM arr),
c_xy AS (SELECT tok, tok2, COUNT(*) AS c_xy FROM bi GROUP BY tok, tok2),
uni AS (
  SELECT tok, COUNT(*) AS c_x
  FROM (SELECT UNNEST(ws) AS tok FROM arr) GROUP BY tok),
vocab AS (SELECT COUNT(*) AS v FROM uni)
SELECT doc_id, COUNT(*) AS n_bigrams,
       ROUND(SUM(ln(CAST(c_xy + 1 AS DOUBLE) / (c_x + v)))
             / COUNT(*), 6) AS avg_logprob
FROM bi JOIN c_xy USING (tok, tok2) JOIN uni USING (tok)
CROSS JOIN vocab
GROUP BY doc_id ORDER BY doc_id
"""


QUERIES_EXT6: dict[str, dict] = {
    "llm_lm_score":     {"fn": q_lm_score,         "sql": SQL_LM_SCORE},
    "eval_brier":       {"fn": q_eval_brier,       "sql": SQL_EVAL_BRIER},
    "dq_checks":        {"fn": q_dq_checks,        "sql": SQL_DQ_CHECKS},
    "eval_auc":         {"fn": q_eval_auc,         "sql": SQL_EVAL_AUC},
    "eval_confusion":   {"fn": q_eval_confusion,
                         "sql": SQL_EVAL_CONFUSION},
    "eval_calibration": {"fn": q_eval_calibration,
                         "sql": SQL_EVAL_CALIBRATION},
    "bm25_topk":        {"fn": q_bm25_topk,        "sql": _sql_bm25_topk()},
    "inverted_index":   {"fn": q_inverted_index,
                         "sql": SQL_INVERTED_INDEX},
    "pmi_bigrams":      {"fn": q_pmi_bigrams,      "sql": SQL_PMI_BIGRAMS},
}
