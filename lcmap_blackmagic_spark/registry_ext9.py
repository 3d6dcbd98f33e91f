"""Tenth extension wave — statistics & ranking evaluation:

- ``eval_ndcg``: NDCG@10 of the BM25 ranking against deterministic
  md5 relevance grades — the ranking-quality metric beside the
  classification metrics in registry_ext6; log2 discounts enter as
  build-time literals so both engines multiply identical doubles,
- ``bootstrap_ci``: percentile bootstrap of the mean via
  DETERMINISTIC Poisson(1) resample weights (inverse-CDF on the md5
  permille — integer thresholds, no RNG state): B=32 replicate
  means from integer-cent sums, exact to the final division; the
  one-pass weighted form of the classic resampling loop,
- ``ab_ttest``: Welch's t-test between two hash-assigned arms —
  integer-cent moment sums (order-free exact), one closed-form
  float expression per group pair at the end.

Determinism contract as registry.py: md5 48-bit hashes, integer
sums, ROUND(·, 6) on emitted floats, identical expression order.
"""

from __future__ import annotations

import math

from pyspark.sql import Window
from pyspark.sql import functions as F

from .registry import _t
from .registry_ext6 import _md48

# ---------------------------------------------------- NDCG@10 -------

NDCG_K = 10
# 1/log2(i+1) discounts as exact build-time literals (repr round-trips
# to the same double in Python, Spark, and DuckDB)
_DISC = [1.0 / math.log2(i + 1) for i in range(1, NDCG_K + 1)]


def q_eval_ndcg(spark, sf_dir):
    """NDCG@10 of the BM25 top-k (registry_ext6.q_bm25_topk) scored
    against md5-derived relevance grades (0-3).  DCG sums the
    graded gains with literal 1/log2(i+1) discounts in rank order;
    IDCG re-sorts the same 10 grades descending.  One row out; all
    the heavy lifting is the BM25 query's own shuffle-free plan plus
    two 10-row windows."""
    from functools import reduce

    from .registry_ext6 import q_bm25_topk
    top = q_bm25_topk(spark, sf_dir)  # ranked: bm25 desc, doc_id
    rel = (_md48(F.concat(F.lit("rel:"), F.col("doc_id"))) % 4)
    w_rank = Window.orderBy(F.desc("bm25"), "doc_id")
    ranked = (top.select(
        "doc_id", rel.alias("rel"),
        F.row_number().over(w_rank).alias("pos"))
        .filter(F.col("pos") <= NDCG_K))
    w_ideal = Window.orderBy(F.desc("rel"), "doc_id")
    both = ranked.select(
        "rel", "pos", F.row_number().over(w_ideal).alias("ipos"))
    # pivot the ≤10 (position, grade) pairs to integer columns, THEN
    # combine with the discount literals in ONE pinned-order
    # expression: a float SUM over rows accumulates in engine order
    # and flipped a ROUND boundary between engines (caught live by
    # the vanilla-session verify probe)
    pivot = both.agg(
        *[F.sum(F.when(F.col("pos") == i, F.col("rel")).otherwise(0))
          .alias(f"r{i}") for i in range(1, NDCG_K + 1)],
        *[F.sum(F.when(F.col("ipos") == i, F.col("rel")).otherwise(0))
          .alias(f"s{i}") for i in range(1, NDCG_K + 1)])
    dcg = reduce(lambda a, b: a + b,
                 [F.col(f"r{i}") * F.lit(_DISC[i - 1])
                  for i in range(1, NDCG_K + 1)])
    idcg = reduce(lambda a, b: a + b,
                  [F.col(f"s{i}") * F.lit(_DISC[i - 1])
                   for i in range(1, NDCG_K + 1)])
    return pivot.select(
        F.round(dcg, 6).alias("dcg"),
        F.round(idcg, 6).alias("idcg"),
        F.round(dcg / idcg, 6).alias("ndcg"))


def _sql_eval_ndcg() -> str:
    from .registry_ext6 import _sql_bm25_topk
    rcols = ", ".join(
        f"CAST(SUM(CASE WHEN pos = {i} THEN rel ELSE 0 END) AS BIGINT)"
        f" AS r{i}" for i in range(1, NDCG_K + 1))
    scols = ", ".join(
        f"CAST(SUM(CASE WHEN ipos = {i} THEN rel ELSE 0 END) AS BIGINT)"
        f" AS s{i}" for i in range(1, NDCG_K + 1))
    dcg = " + ".join(f"r{i} * CAST({_DISC[i - 1]!r} AS DOUBLE)"
                     for i in range(1, NDCG_K + 1))
    idcg = " + ".join(f"s{i} * CAST({_DISC[i - 1]!r} AS DOUBLE)"
                      for i in range(1, NDCG_K + 1))
    return f"""
WITH top AS ({_sql_bm25_topk()}),
ranked AS (
  SELECT * FROM (
    SELECT doc_id,
           CAST('0x' || substr(md5('rel:' || doc_id), 1, 12) AS BIGINT)
             % 4 AS rel,
           ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS pos
    FROM top)
  WHERE pos <= {NDCG_K}),
ranks2 AS (
  SELECT rel, pos,
         ROW_NUMBER() OVER (ORDER BY rel DESC, doc_id) AS ipos
  FROM ranked),
wide AS (SELECT {rcols}, {scols} FROM ranks2)
SELECT ROUND({dcg}, 6) AS dcg,
       ROUND({idcg}, 6) AS idcg,
       ROUND(({dcg}) / ({idcg}), 6) AS ndcg
FROM wide
"""


# ---------------------------------------------- bootstrap CI --------

BOOT_B = 32
# inverse-CDF thresholds for Poisson(1) on a 12-bit (0..4095) draw:
# cumulative P(X<=k) * 4096 for k = 0..4
_POIS = [1507, 3014, 3767, 4018, 4081]
_BOOT_DIGESTS = 4  # 10 twelve-bit lanes per md5; 4 digests cover B=32


def _pois_weight(h):
    w = F.lit(5)
    for k in range(len(_POIS) - 1, -1, -1):
        w = F.when(h < _POIS[k], k).otherwise(w)
    return w


def q_bootstrap_ci(spark, sf_dir):
    """Percentile-bootstrap 90% CI of mean order value, one pass:
    each of B=32 replicates weights every row by a DETERMINISTIC
    Poisson(1) draw (md5 through an integer inverse-CDF — the
    standard multinomial→Poisson bootstrap approximation, and the
    only distributed-bootstrap form that needs no shuffle of the
    data).  Replicate means are exact integer-cent ratios; the CI
    bounds are order statistics of the 32 means.

    Hash-lane trick (the minhash wide-digest lesson, llm/dedup.py):
    the naive form hashes B times per row; here FOUR md5 digests per
    row are sliced into ten 12-bit lanes each — 8× less hashing for
    the dominant stage (measured 8.8 → ~2 s at sf0.1).  Explode
    factor B on a projected row; at 100 TB the scan stays one pass
    and the only shuffle is B rows.  The narrow (key, cents)
    projection is ``_spread`` first — a single-row-group bench file
    scans as ONE task, which would serialize the md5 fan on one core
    (measured 3.3 → 0.8 s at sf0.1); on a many-split production scan
    the spread is a no-op."""
    from .llm.dedup import _spread
    o = _spread(_t(spark, sf_dir, "orders").select(
        "o_orderkey",
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint").alias("cents")))
    digests = o.select(
        "cents",
        *[F.md5(F.concat(F.lit(f"boot{r}:"), F.col("o_orderkey")))
          .alias(f"d{r}") for r in range(_BOOT_DIGESTS)])
    rep = digests.select(
        "cents", *[f"d{r}" for r in range(_BOOT_DIGESTS)],
        F.explode(F.sequence(F.lit(0), F.lit(BOOT_B - 1))).alias("b"))
    digest = F.element_at(
        F.array(*[F.col(f"d{r}") for r in range(_BOOT_DIGESTS)]),
        F.expr("cast(b div 10 + 1 as int)"))
    h = F.conv(F.substring(digest, F.expr("3 * (b % 10) + 1"), F.lit(3)),
               16, 10).cast("bigint")
    weighted = rep.select("b", "cents", _pois_weight(h).alias("w"))
    means = (weighted.groupBy("b")
             .agg((F.sum(F.col("w") * F.col("cents")).cast("double")
                   / (F.sum("w") * 100)).alias("mean")))
    w_rank = Window.orderBy("mean")
    ranked = means.select("mean", F.row_number().over(w_rank).alias("r"))
    lo_r = max(1, int(BOOT_B * 0.05))
    hi_r = int(math.ceil(BOOT_B * 0.95))
    return (ranked.agg(
        F.round(F.min(F.when(F.col("r") == lo_r, F.col("mean"))), 6)
        .alias("ci_lo"),
        F.round(F.min(F.when(F.col("r") == hi_r, F.col("mean"))), 6)
        .alias("ci_hi"),
        F.count(F.lit(1)).alias("n_replicates")))


def _sql_bootstrap_ci() -> str:
    lo_r = max(1, int(BOOT_B * 0.05))
    hi_r = int(math.ceil(BOOT_B * 0.95))
    cases = "".join(
        f"WHEN h < {t} THEN {k} " for k, t in enumerate(_POIS))
    digests = ", ".join(f"md5('boot{r}:' || o_orderkey) AS d{r}"
                        for r in range(_BOOT_DIGESTS))
    pick = ("CASE b // 10 "
            + " ".join(f"WHEN {r} THEN d{r}"
                       for r in range(_BOOT_DIGESTS)) + " END")
    return f"""
WITH rows0 AS (
  SELECT CAST(o_totalprice * 100 AS BIGINT) AS cents, {digests}
  FROM orders),
rep AS (
  SELECT b, cents,
         CAST('0x' || substr({pick}, 3 * (b % 10) + 1, 3) AS BIGINT) AS h
  FROM rows0 CROSS JOIN (SELECT UNNEST(generate_series(0, {BOOT_B - 1}))
                         AS b)),
weighted AS (SELECT b, cents, CASE {cases}ELSE 5 END AS w FROM rep),
means AS (
  SELECT b, CAST(SUM(w * cents) AS DOUBLE) / (SUM(w) * 100) AS mean
  FROM weighted GROUP BY b),
ranked AS (SELECT mean, ROW_NUMBER() OVER (ORDER BY mean) AS r
           FROM means)
SELECT ROUND(MIN(CASE WHEN r = {lo_r} THEN mean END), 6) AS ci_lo,
       ROUND(MIN(CASE WHEN r = {hi_r} THEN mean END), 6) AS ci_hi,
       COUNT(*) AS n_replicates
FROM ranked
"""


# ------------------------------------------------ Welch t-test ------

def q_ab_ttest(spark, sf_dir):
    """Welch's t-test on order value between two md5-assigned arms —
    the continuous-metric A/B companion to the chi-square proportion
    test (registry_ext5.q_chi2_abtest).  Moments are integer-cent
    sums (order-free exact); the t statistic and Welch dof are ONE
    closed-form float expression over the six exact integers, so
    both engines evaluate bit-identically before the final
    ROUND."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint").alias("cents"))
    arm = F.when(
        _md48(F.concat(F.lit("arm:"), F.col("o_orderkey"))) % 2 == 0,
        "A").otherwise("B")
    # cents² sums exceed int64 at sf0.1 (DuckDB silently promotes to
    # HUGEINT, Spark bigint would WRAP — caught in design review):
    # accumulate the second moment in DECIMAL(38,0), exact in both
    agg = (o.select(arm.alias("arm"), "cents")
           .groupBy("arm")
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum("cents").alias("s"),
                F.sum((F.col("cents") * F.col("cents"))
                      .cast("decimal(38,0)")).alias("ss")))
    a = agg.filter(F.col("arm") == "A").select(
        F.col("n").alias("na"), F.col("s").alias("sa"),
        F.col("ss").alias("ssa"))
    b = agg.filter(F.col("arm") == "B").select(
        F.col("n").alias("nb"), F.col("s").alias("sb"),
        F.col("ss").alias("ssb"))
    j = a.crossJoin(b)
    ma = F.col("sa").cast("double") / F.col("na")
    mb = F.col("sb").cast("double") / F.col("nb")
    # all-double moment algebra in pinned order: s² would overflow
    # int64 too, so square the double (both engines round the same
    # product identically)
    va = ((F.col("ssa").cast("double")
           - F.col("sa").cast("double") * F.col("sa") / F.col("na"))
          / (F.col("na") - 1))
    vb = ((F.col("ssb").cast("double")
           - F.col("sb").cast("double") * F.col("sb") / F.col("nb"))
          / (F.col("nb") - 1))
    se2 = va / F.col("na") + vb / F.col("nb")
    t = (ma - mb) / F.sqrt(se2)
    dof = (se2 * se2) / (
        (va / F.col("na")) * (va / F.col("na")) / (F.col("na") - 1)
        + (vb / F.col("nb")) * (vb / F.col("nb")) / (F.col("nb") - 1))
    return j.select(
        "na", "nb",
        F.round(ma / 100, 6).alias("mean_a"),
        F.round(mb / 100, 6).alias("mean_b"),
        F.round(t, 6).alias("t_stat"),
        F.round(dof, 6).alias("welch_dof"))


SQL_AB_TTEST = """
WITH base AS (
  SELECT CASE WHEN CAST('0x' || substr(md5('arm:' || o_orderkey), 1, 12)
                   AS BIGINT) % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
         CAST(o_totalprice * 100 AS BIGINT) AS cents
  FROM orders),
agg AS (
  SELECT arm, COUNT(*) AS n, CAST(SUM(cents) AS BIGINT) AS s,
         SUM(cents * cents) AS ss
  FROM base GROUP BY arm),
j AS (
  SELECT a.n AS na, a.s AS sa, CAST(a.ss AS DOUBLE) AS ssa,
         b.n AS nb, b.s AS sb, CAST(b.ss AS DOUBLE) AS ssb
  FROM (SELECT * FROM agg WHERE arm = 'A') a
  CROSS JOIN (SELECT * FROM agg WHERE arm = 'B') b),
v AS (
  SELECT na, nb, sa, sb,
         (ssa - CAST(sa AS DOUBLE) * sa / na) / (na - 1) AS va,
         (ssb - CAST(sb AS DOUBLE) * sb / nb) / (nb - 1) AS vb
  FROM j)
SELECT na, nb,
       ROUND(CAST(sa AS DOUBLE) / na / 100, 6) AS mean_a,
       ROUND(CAST(sb AS DOUBLE) / nb / 100, 6) AS mean_b,
       ROUND((CAST(sa AS DOUBLE) / na - CAST(sb AS DOUBLE) / nb)
             / SQRT(va / na + vb / nb), 6) AS t_stat,
       ROUND((va / na + vb / nb) * (va / na + vb / nb)
             / ((va / na) * (va / na) / (na - 1)
                + (vb / nb) * (vb / nb) / (nb - 1)), 6) AS welch_dof
FROM v
"""


# ------------------------------------- semantic decontamination -----

SEM_THRESH = 0.35  # cosine flag level for the weakly-clustered fixture
SEM_BENCH_MOD = 50  # ~2% of vectors play the benchmark (they're small)


def q_semantic_decon(spark, sf_dir):
    """Embedding-space decontamination: flag corpus vectors whose
    cosine against ANY benchmark vector (vec_id % SEM_BENCH_MOD == 0,
    ~2% of the corpus, plays the held-out set) clears the threshold — the semantic companion to
    the exact 5-gram decontaminate (registry_ext3).  The benchmark
    side is tiny and broadcast (benchmarks always are); norms are
    computed once per row before the join; cosines are rounded
    BEFORE the max on both engines so the flag can never flip on the
    float tail."""
    from .llm.similarity import _as_double, _dot
    e = _t(spark, sf_dir, "embeddings")
    bench = (e.filter(F.col("vec_id") % SEM_BENCH_MOD == 0)
             .select(_as_double(F.col("embedding")).alias("bvec")))
    bench = bench.withColumn(
        "bnorm", F.sqrt(_dot(F.col("bvec"), F.col("bvec"))))
    corpus = (e.filter(F.col("vec_id") % SEM_BENCH_MOD != 0)
              .select("vec_id", _as_double(F.col("embedding"))
                      .alias("qvec")))
    corpus = corpus.withColumn(
        "qnorm", F.sqrt(_dot(F.col("qvec"), F.col("qvec"))))
    cos = F.round(_dot(F.col("qvec"), F.col("bvec"))
                  / (F.col("qnorm") * F.col("bnorm")), 6)
    return (corpus.crossJoin(F.broadcast(bench))
            .select("vec_id", cos.alias("cos"))
            .groupBy("vec_id")
            .agg(F.max("cos").alias("max_sim"))
            .select("vec_id", "max_sim",
                    (F.col("max_sim") >= SEM_THRESH).cast("int")
                    .alias("contaminated")))


_SQL_DOT9 = ("list_sum(list_transform(generate_series(1, 64), "
             "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))")

SQL_SEMANTIC_DECON = f"""
WITH bench AS (
  SELECT embedding AS bv FROM embeddings WHERE vec_id % {SEM_BENCH_MOD} = 0),
corpus AS (
  SELECT vec_id, embedding AS qv FROM embeddings WHERE vec_id % {SEM_BENCH_MOD} <> 0),
pairs AS (
  SELECT vec_id,
         ROUND({_SQL_DOT9.format(a='qv', b='bv')} /
               (sqrt({_SQL_DOT9.format(a='qv', b='qv')}) *
                sqrt({_SQL_DOT9.format(a='bv', b='bv')})), 6) AS cos
  FROM corpus, bench)
SELECT vec_id, MAX(cos) AS max_sim,
       CASE WHEN MAX(cos) >= {SEM_THRESH} THEN 1 ELSE 0 END
         AS contaminated
FROM pairs GROUP BY vec_id
"""


# ----------------------------------------------- CSV roundtrip ------

def q_src_csv(spark, sf_dir):
    """CSV source/sink surface: write a projection of orders as
    headered CSV (integer cents — text floats don't round-trip),
    read it back with an explicit schema, and aggregate.  The oracle
    aggregates the parquet directly, so the hash-match proves the
    CSV writer/reader pair is lossless for the typed projection —
    the same write-then-read contract the gzip-JSON object sink
    tests byte-wise (storage.py)."""
    from .registry import _staging
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus",
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint").alias("cents"))
    path = _staging(sf_dir, "csv_orders")
    o.write.mode("overwrite").option("header", True).csv(path)
    back = (spark.read.option("header", True)
            .schema("o_orderkey long, o_orderstatus string, cents long")
            .csv(path))
    return (back.groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"),
                 (F.sum("cents").cast("double") / 100).alias("total"))
            .orderBy("o_orderstatus"))


SQL_SRC_CSV = """
SELECT o_orderstatus, COUNT(*) AS n,
       CAST(CAST(SUM(CAST(o_totalprice * 100 AS BIGINT)) AS DOUBLE)
            / 100 AS DOUBLE) AS total
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


# ------------------------------------- incremental-ingest dedup -----

def q_incremental_dedup(spark, sf_dir):
    """Cross-corpus dedup — the INCREMENTAL-INGEST form: which
    incoming documents ('src1' plays the new batch) near-duplicate
    any document already in the corpus?  Built on the same MinHash
    band machinery as the self-join pairs (llm/dedup.minhash_pairs);
    the production form stages the EXISTING corpus signatures once
    (the signature store minhash_pairs_staged writes) and only the
    incoming batch is hashed per ingest.  Output: one row per
    flagged incoming doc with its duplicate-partner count and the
    canonical existing partner."""
    from .llm.dedup import minhash_pairs
    d = _t(spark, sf_dir, "documents")
    pairs = minhash_pairs(d, threshold=0.2)
    src = d.select("doc_id", (F.col("source") == "src1").alias("inc"))
    j = (pairs
         .join(src.withColumnsRenamed({"doc_id": "id_a", "inc": "inc_a"}),
               "id_a")
         .join(src.withColumnsRenamed({"doc_id": "id_b", "inc": "inc_b"}),
               "id_b"))
    cross = j.filter(F.col("inc_a") != F.col("inc_b")).select(
        F.when(F.col("inc_a"), F.col("id_a")).otherwise(F.col("id_b"))
        .alias("incoming_id"),
        F.when(F.col("inc_a"), F.col("id_b")).otherwise(F.col("id_a"))
        .alias("existing_id"))
    return (cross.groupBy("incoming_id")
            .agg(F.count(F.lit(1)).alias("n_partners"),
                 F.min("existing_id").alias("canonical_partner"))
            .orderBy("incoming_id"))


def _sql_incremental_dedup() -> str:
    from .registry_llm import SQL_MINHASH_PAIRS
    return f"""
WITH pairs AS ({SQL_MINHASH_PAIRS}),
src AS (SELECT doc_id, source = 'src1' AS inc FROM documents),
cross_pairs AS (
  SELECT CASE WHEN a.inc THEN p.id_a ELSE p.id_b END AS incoming_id,
         CASE WHEN a.inc THEN p.id_b ELSE p.id_a END AS existing_id
  FROM pairs p
  JOIN src a ON a.doc_id = p.id_a
  JOIN src b ON b.doc_id = p.id_b
  WHERE a.inc <> b.inc)
SELECT incoming_id, COUNT(*) AS n_partners,
       MIN(existing_id) AS canonical_partner
FROM cross_pairs GROUP BY incoming_id ORDER BY incoming_id
"""


# ------------------------------------------------ focal (3x3) ------

GRID_N = 32


def q_focal_mean(spark, sf_dir):
    """Spatial FOCAL statistics — the chip-grid neighborhood rollup
    of the reference's domain (every LCMAP chip has 8 neighbors on
    the ARD grid): hash events onto a 32×32 cell grid, aggregate per
    cell, then 3×3 focal count/mean per cell.

    Scale shape: the corpus is touched ONCE (the per-cell
    aggregate); the 9-way neighbor expansion explodes the
    GRID-sized aggregate (1024 rows), never the events — at 100 TB
    the focal pass costs the same as at 1 GB.  Edge cells keep their
    partial neighborhoods (no wraparound)."""
    e = _t(spark, sf_dir, "events")
    x = _md48(F.concat(F.lit("x:"), F.col("user_id"))) % GRID_N
    y = _md48(F.concat(F.lit("y:"), F.col("user_id"))) % GRID_N
    grid = (e.select(x.alias("x"), y.alias("y"),
                     F.col("value").cast("decimal(18,2)").alias("v"))
            .groupBy("x", "y")
            .agg(F.count(F.lit(1)).alias("n"),
                 (F.sum("v") * 100).cast("bigint").alias("cents")))
    offsets = F.expr(
        "explode(array(" + ", ".join(
            f"struct({dx} as dx, {dy} as dy)"
            for dx in (-1, 0, 1) for dy in (-1, 0, 1)) + "))")
    contrib = (grid.select("x", "y", "n", "cents", offsets.alias("o"))
               .select((F.col("x") + F.col("o.dx")).alias("tx"),
                       (F.col("y") + F.col("o.dy")).alias("ty"),
                       "n", "cents")
               .filter((F.col("tx") >= 0) & (F.col("tx") < GRID_N)
                       & (F.col("ty") >= 0) & (F.col("ty") < GRID_N)))
    focal = (contrib.groupBy("tx", "ty")
             .agg(F.sum("n").alias("focal_n"),
                  F.sum("cents").alias("focal_cents")))
    return (grid.join(focal, (grid["x"] == focal["tx"])
                      & (grid["y"] == focal["ty"]))
            .select("x", "y", "n", "focal_n",
                    F.round(F.col("focal_cents").cast("double")
                            / (100 * F.col("focal_n")), 6)
                    .alias("focal_mean")))


SQL_FOCAL_MEAN = f"""
WITH grid AS (
  SELECT CAST('0x' || substr(md5('x:' || user_id), 1, 12) AS BIGINT)
           % {GRID_N} AS x,
         CAST('0x' || substr(md5('y:' || user_id), 1, 12) AS BIGINT)
           % {GRID_N} AS y,
         COUNT(*) AS n,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
  FROM events GROUP BY 1, 2),
offs AS (SELECT dx, dy FROM (VALUES (-1), (0), (1)) a(dx)
         CROSS JOIN (VALUES (-1), (0), (1)) b(dy)),
contrib AS (
  SELECT g.x + o.dx AS tx, g.y + o.dy AS ty, g.n, g.cents
  FROM grid g CROSS JOIN offs o
  WHERE g.x + o.dx BETWEEN 0 AND {GRID_N - 1}
    AND g.y + o.dy BETWEEN 0 AND {GRID_N - 1}),
focal AS (
  SELECT tx, ty, CAST(SUM(n) AS BIGINT) AS focal_n,
         CAST(SUM(cents) AS BIGINT) AS focal_cents
  FROM contrib GROUP BY tx, ty)
SELECT g.x, g.y, g.n, f.focal_n,
       ROUND(CAST(f.focal_cents AS DOUBLE) / (100 * f.focal_n), 6)
         AS focal_mean
FROM grid g JOIN focal f ON f.tx = g.x AND f.ty = g.y
"""


# ------------------------------------------ CUSUM changepoints ------

def q_cusum_changepoints(spark, sf_dir):
    """Declarative CUSUM mean-shift detection per user — the
    streaming-light cousin of the reference's per-pixel change
    detection (PyCCD segments; plans/segment.py carries the science
    core).  The CUSUM recursion s_t = max(0, s_{t-1} + dev_t) is NOT
    window-expressible directly, but the prefix-min identity
    s_t = cum_t − min(0, min_{j≤t} cum_j) turns it into two exact
    integer windows (running sum + running min) — no recursion, no
    UDF, engine-identical.  Deviations are against the user's own
    integer mean (sum div n); a flag fires when the CUSUM exceeds
    4× the mean.  Output: per-user change summary."""
    e = _t(spark, sf_dir, "events")
    base = e.select(
        "user_id", "ts", "event_id",
        (F.col("value").cast("decimal(18,2)") * 100)
        .cast("bigint").alias("cents"))
    mu = (base.groupBy("user_id")
          .agg(F.expr("sum(cents) div count(1)").alias("mu"),
               F.count(F.lit(1)).alias("n_events")))
    j = base.join(F.broadcast(mu), "user_id")
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, 0))
    # two window LEVELS (nested window functions are illegal in both
    # engines); the second window sorts the already-sorted partition,
    # so it costs a pass, not a second shuffle
    cummed = j.select("user_id", "n_events", "mu", "ts", "event_id",
                      F.sum(F.col("cents") - F.col("mu")).over(w)
                      .alias("cum"))
    cusum = F.col("cum") - F.least(F.min("cum").over(w), F.lit(0))
    scored = cummed.select("user_id", "n_events", "mu",
                           cusum.alias("cusum"))
    return (scored.groupBy("user_id")
            .agg(F.max("n_events").alias("n_events"),
                 F.max("cusum").alias("max_cusum"),
                 F.sum((F.col("cusum") > 4 * F.col("mu"))
                       .cast("bigint")).alias("n_flags"))
            .filter(F.col("n_flags") > 0))


SQL_CUSUM = """
WITH base AS (
  SELECT user_id, ts, event_id,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM events),
mu AS (SELECT user_id, SUM(cents) // COUNT(*) AS mu,
              COUNT(*) AS n_events
       FROM base GROUP BY user_id),
cummed AS (
  SELECT b.user_id, m.n_events, m.mu, b.ts, b.event_id,
         SUM(b.cents - m.mu) OVER w AS cum
  FROM base b JOIN mu m USING (user_id)
  WINDOW w AS (PARTITION BY b.user_id ORDER BY b.ts, b.event_id
               ROWS UNBOUNDED PRECEDING)),
scored AS (
  SELECT user_id, n_events, mu,
         cum - LEAST(MIN(cum) OVER w2, 0) AS cusum
  FROM cummed
  WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id
                ROWS UNBOUNDED PRECEDING))
SELECT user_id, MAX(n_events) AS n_events,
       CAST(MAX(cusum) AS BIGINT) AS max_cusum,
       CAST(SUM(CASE WHEN cusum > 4 * mu THEN 1 ELSE 0 END) AS BIGINT)
         AS n_flags
FROM scored GROUP BY user_id
HAVING SUM(CASE WHEN cusum > 4 * mu THEN 1 ELSE 0 END) > 0
"""


# ---------------------------------------- week-over-week growth -----

def q_wow_growth(spark, sf_dir):
    """Week-over-week revenue growth in integer basis points — the
    period-over-period report every metrics pipeline ships.  Weeks
    are epoch-day integer division (Monday-agnostic but TZ-proof and
    engine-identical); growth = (cur − prev)·10⁴ div prev stays in
    int64.  One date-bucket aggregate + one ordered window over the
    (tiny) weekly rollup."""
    o = _t(spark, sf_dir, "orders")
    wk = F.expr("datediff(to_date(o_orderdate), date'1970-01-01') div 7")
    weekly = (o.select(wk.alias("wk"),
                       (F.col("o_totalprice").cast("decimal(18,2)") * 100)
                       .cast("bigint").alias("cents"))
              .groupBy("wk")
              .agg(F.count(F.lit(1)).alias("n_orders"),
                   F.sum("cents").alias("cents")))
    return (weekly.select(
        "wk", "n_orders",
        (F.col("cents").cast("double") / 100).alias("revenue"),
        F.expr("(cents - lag(cents) over (order by wk)) * 10000 "
               "div lag(cents) over (order by wk)").alias("growth_bp"))
        .orderBy("wk"))


SQL_WOW_GROWTH = """
WITH weekly AS (
  SELECT (CAST(o_orderdate AS DATE) - DATE '1970-01-01') // 7 AS wk,
         COUNT(*) AS n_orders,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT)
           AS cents
  FROM orders GROUP BY 1)
SELECT wk, n_orders,
       CAST(cents AS DOUBLE) / 100 AS revenue,
       (cents - lag(cents) OVER (ORDER BY wk)) * 10000
         // lag(cents) OVER (ORDER BY wk) AS growth_bp
FROM weekly ORDER BY wk
"""


QUERIES_EXT9: dict[str, dict] = {
    "focal_mean":     {"fn": q_focal_mean,   "sql": SQL_FOCAL_MEAN},
    "cusum_changepoints": {"fn": q_cusum_changepoints,
                           "sql": SQL_CUSUM},
    "llm_incremental_dedup": {"fn": q_incremental_dedup,
                              "sql": _sql_incremental_dedup()},
    "wow_growth":     {"fn": q_wow_growth,   "sql": SQL_WOW_GROWTH},
    "semantic_decon": {"fn": q_semantic_decon,
                       "sql": SQL_SEMANTIC_DECON},
    "src_csv":        {"fn": q_src_csv, "sql": SQL_SRC_CSV},
    "eval_ndcg":    {"fn": q_eval_ndcg,    "sql": _sql_eval_ndcg()},
    "bootstrap_ci": {"fn": q_bootstrap_ci, "sql": _sql_bootstrap_ci()},
    "ab_ttest":     {"fn": q_ab_ttest,     "sql": SQL_AB_TTEST},
}
