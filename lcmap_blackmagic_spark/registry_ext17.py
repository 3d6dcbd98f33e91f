"""Eighteenth extension wave (round 12) — table-format RESTORE, the
pass@k evaluation metric, and the split-distinct skew rewrite, each
under the correctness gate:

- ``snapshot_restore``: Delta-style RESTORE TO VERSION AS OF as a
  METADATA-ONLY commit (storage.restore_snapshot — the new manifest
  re-references the old commit dirs; zero data movement).  The
  oracle recomputes every pinned version's content from slice
  arithmetic, so a restore that re-wrote, mis-referenced, or
  truncated history could not hash-match.

- ``eval_pass_at_k``: the standard LLM-eval estimator
  pass@k = 1 − C(n−c, k)/C(n, k) (Chen et al. 2021, the HumanEval
  combinatorial form) in EXACT integer arithmetic: n ≤ 20 so the
  binomials evaluate via ``factorial`` (exact ≤ 20! < 2^63 in both
  engines) and the output is basis points by integer div — no float
  anywhere, bit-exact across engines.

- ``skew_distinct_split``: COUNT(DISTINCT) under key skew via the
  two-stage bucket split — per (key, hash-bucket) distinct partials
  that ADD exactly because the buckets partition the value space.
  The oracle is the plain COUNT(DISTINCT), pinning that the rewrite
  changes the plan (no single giant per-key distinct reducer), not
  the answer.

Reference anchor: nothing in lcmap-blackmagic — the snapshot store
and the eval/scale surfaces are the engine's own first-class
additions (brief §LLM-ops / §scale)."""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import _t

# ------------------------------------------------------- restore ----

RST_SLICES = 4


def q_snapshot_restore(spark, sf_dir):
    """Commit RST_SLICES key-sliced appends, RESTORE to the second
    commit (metadata-only), then append the first slice AGAIN —
    duplicating its rows, which makes the post-restore lineage
    distinguishable from every pre-restore version.  Reads every
    version of THIS run by its returned version number (not an
    absolute constant), so a second run in the same process — whose
    versions continue the staged table's log — sees the same six
    contents (the first write is an overwrite)."""
    from .registry import _staging
    from .storage import read_snapshot, restore_snapshot, write_snapshot

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint").alias("cents"))
    t = _staging(sf_dir, "rst_orders")
    versions = []
    for s in range(RST_SLICES):
        versions.append(write_snapshot(
            o.filter(F.col("o_orderkey") % RST_SLICES == s), t,
            mode="append" if s else "overwrite", collect_stats=False))
    versions.append(restore_snapshot(t, versions[1]))   # back to k=2
    versions.append(write_snapshot(                     # slice 0 again
        o.filter(F.col("o_orderkey") % RST_SLICES == 0), t,
        mode="append", collect_stats=False))
    out = None
    for step, v in enumerate(versions, start=1):
        part = (read_snapshot(spark, t, version=v)
                .agg(F.lit(step).alias("step"),
                     F.count(F.lit(1)).alias("n_orders"),
                     F.sum("cents").alias("sum_cents")))
        out = part if out is None else out.unionByName(part)
    return out.orderBy("step")


SQL_SNAPSHOT_RESTORE = f"""
WITH c AS (
  SELECT o_orderkey % {RST_SLICES} AS s,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           AS cents
  FROM orders),
steps(step) AS (SELECT UNNEST(range(1, 7))),
sel AS (
  -- steps 1..4: slices 0..step-1; step 5 (restore to v2): slices
  -- 0..1; step 6: slices 0..1 plus slice 0 a second time
  SELECT st.step, c.cents,
         CASE WHEN st.step <= {RST_SLICES} AND c.s < st.step THEN 1
              WHEN st.step = 5 AND c.s < 2 THEN 1
              WHEN st.step = 6 AND c.s < 2 THEN 1
              ELSE 0 END
         + CASE WHEN st.step = 6 AND c.s = 0 THEN 1 ELSE 0 END
           AS copies
  FROM steps st, c)
SELECT step, CAST(SUM(copies) AS BIGINT) AS n_orders,
       CAST(SUM(copies * cents) AS BIGINT) AS sum_cents
FROM sel GROUP BY step ORDER BY step
"""

# ------------------------------------------------------ pass@k ------

PASS_TASKS = 40
PASS_TRIALS = 20          # n ≤ 20: factorial stays exact in int64
PASS_KS = (1, 5, 10)


def q_eval_pass_at_k(spark, sf_dir):
    """pass@k over synthesized eval runs: orders group into
    PASS_TASKS tasks (o_custkey mod), the first PASS_TRIALS orders
    per task (by o_orderkey) are the trials, and a trial "passes"
    when its deterministic md5 coin lands in the 20% stratum.  The
    unbiased estimator 1 − C(n−c,k)/C(n,k) is computed in exact
    integers (factorial ≤ 20!, basis points via integer div) — the
    numerically-stable product form matters at real n (thousands),
    but at n ≤ 20 the binomial form is exact and ORACLE-CHECKABLE,
    which is the point of this entry.

    Scale shape: one narrow projection, one rank window partitioned
    by task (≤ PASS_TRIALS winners per task), one per-task
    aggregate; the binomial arithmetic is constant-time per task."""
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders")
    trials = (o.select(
        (F.col("o_custkey") % PASS_TASKS).cast("int").alias("task"),
        "o_orderkey",
        (F.conv(F.substring(F.md5(F.concat(
            F.lit("pk:"), F.col("o_orderkey").cast("string"))),
            1, 12), 16, 10).cast("bigint") % 5 == 0)
        .cast("int").alias("correct"))
        .withColumn("rn", F.row_number().over(
            Window.partitionBy("task").orderBy("o_orderkey")))
        .filter(F.col("rn") <= PASS_TRIALS))
    agg = (trials.groupBy("task")
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum("correct").alias("c"))
           .filter(F.col("n") == PASS_TRIALS))
    cols = [F.col("task"), F.col("n"), F.col("c")]
    for k in PASS_KS:
        # C(n-c,k)/C(n,k) in exact integers; n-c < k → pass@k = 1
        expr = (f"CASE WHEN n - c < {k} THEN CAST(10000 AS BIGINT) "
                f"ELSE CAST(10000 AS BIGINT) - (10000 * "
                f"(factorial(CAST(n - c AS INT)) div "
                f"(factorial({k}) * factorial(CAST(n - c - {k} AS INT))))"
                f") div (factorial(CAST(n AS INT)) div "
                f"(factorial({k}) * factorial(CAST(n - {k} AS INT)))) "
                f"END")
        cols.append(F.expr(expr).alias(f"pass{k}_bp"))
    return agg.select(*cols).orderBy("task")


def _sql_pass_at_k() -> str:
    # the outer CAST matters: DuckDB's factorial returns HUGEINT,
    # which would otherwise propagate to the CASE result and reach
    # pandas consumers as float64 (exact values, wrong dtype)
    passes = ",\n       ".join(
        f"CAST(CASE WHEN n - c < {k} THEN CAST(10000 AS BIGINT) "
        f"ELSE CAST(10000 AS BIGINT) - (10000 * "
        f"(factorial(CAST(n - c AS INT)) // "
        f"(factorial({k}) * factorial(CAST(n - c - {k} AS INT))))) // "
        f"(factorial(CAST(n AS INT)) // "
        f"(factorial({k}) * factorial(CAST(n - {k} AS INT)))) "
        f"END AS BIGINT) AS pass{k}_bp"
        for k in PASS_KS)
    return f"""
WITH trials AS (
  SELECT CAST(o_custkey % {PASS_TASKS} AS INT) AS task,
         CASE WHEN CAST('0x' || substr(md5('pk:' || o_orderkey), 1, 12)
                   AS BIGINT) % 5 = 0 THEN 1 ELSE 0 END AS correct,
         ROW_NUMBER() OVER (PARTITION BY o_custkey % {PASS_TASKS}
                            ORDER BY o_orderkey) AS rn
  FROM orders),
agg AS (
  SELECT task, COUNT(*) AS n, SUM(correct) AS c
  FROM trials WHERE rn <= {PASS_TRIALS}
  GROUP BY task HAVING COUNT(*) = {PASS_TRIALS})
SELECT task, CAST(n AS BIGINT) AS n, CAST(c AS BIGINT) AS c,
       {passes}
FROM agg ORDER BY task
"""

# ------------------------------------------ split distinct ----------

SPLIT_BUCKETS = 32


def q_skew_distinct_split(spark, sf_dir):
    """COUNT(DISTINCT supplier) per returnflag via the two-stage
    BUCKET SPLIT — the standard skew rewrite for exact distinct
    aggregation: stage 1 groups by (key, value-hash-bucket) and
    distinct-counts WITHIN each bucket; stage 2 SUMS the partials,
    which is exact because the buckets partition the value space.
    At 10^12 rows a plain per-key distinct funnels each hot key's
    whole value set through one reducer; the split bounds every
    reducer at 1/SPLIT_BUCKETS of a key's values while adding only a
    (key × bucket)-sized second stage.  The oracle is the PLAIN
    COUNT(DISTINCT) — pinning that the rewrite changes the plan, not
    the answer."""
    li = _t(spark, sf_dir, "lineitem")
    stage1 = (li.groupBy(
        "l_returnflag",
        (F.col("l_suppkey") % SPLIT_BUCKETS).alias("__b"))
        .agg(F.count_distinct("l_suppkey").alias("__d")))
    return (stage1.groupBy("l_returnflag")
            .agg(F.sum("__d").alias("n_suppliers"))
            .orderBy("l_returnflag"))


SQL_SKEW_DISTINCT_SPLIT = """
SELECT l_returnflag,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


# ------------------------------------------ dedup self-eval ---------

DEDUP_EVAL_T = 0.25        # exactly-representable threshold: the
#                            float verify (i/u >= 0.25) and the
#                            integer ground truth (4i >= u) cannot
#                            disagree on a boundary pair


def q_llm_dedup_eval(spark, sf_dir):
    """RECALL OF THE BANDED MINHASH DEDUP, measured against exact
    ground truth — the self-evaluation a production dedup pipeline
    ships with: ground truth is the EXACT trigram-Jaccard pair set at
    threshold 1/4 computed by the prefix-filter join (PPJoin — exact,
    no cross product), the system under test is the 8-band MinHash
    candidate+verify pipeline at the same threshold OVER THE SAME
    48-bit hashed gram space (both sides hash md5(gram)[:12] of the
    identical tokens()-derived trigrams, so the Jaccard values are
    definitionally comparable).  Verified MinHash pairs are a SUBSET
    of ground truth by construction (the verify step recomputes the
    same exact Jaccard); what banding can lose is recall — pairs
    above threshold sharing none of the 8 band minhashes.  Output:
    one row (n_exact, n_found, n_false_band, recall_bp).

    Scale shape: both sides are the already-audited scale-safe joins
    (prefix-filter equi-join; banded self-join + verify); the eval
    adds one left-anti join on pair ids and a one-row aggregate."""
    from .llm.dedup import minhash_pairs, prefix_jaccard_pairs

    d = _t(spark, sf_dir, "documents")
    exact = (prefix_jaccard_pairs(d, n=3, t_num=1, t_den=4)
             .select("id_a", "id_b", F.lit(1).alias("e")))
    # broadcast_docs=False: the verify side's per-doc shingle-set
    # table is data-dependent and O(corpus) — at the 100 TB scale
    # this eval's docstring argues for, the forced broadcast default
    # is exactly what the round-12 broadcast audit bans (it hides
    # behind the parameter, so the AST sweep can't see it)
    found = (minhash_pairs(d, threshold=DEDUP_EVAL_T,
                           broadcast_docs=False)
             .select("id_a", "id_b", F.lit(1).alias("f")))
    # one declarative plan: full outer join on pair ids, indicator
    # aggregate — no driver-side counts; every sum coalesces so a
    # pair-free corpus yields (0,0,0,0) like the oracle, not NULLs
    both = exact.join(found, ["id_a", "id_b"], "full_outer")
    return both.agg(
        F.coalesce(F.sum("e"), F.lit(0)).cast("bigint")
        .alias("n_exact"),
        F.coalesce(F.sum("f"), F.lit(0)).cast("bigint")
        .alias("n_found"),
        F.coalesce(F.sum(F.when(F.col("f").isNotNull()
                                & F.col("e").isNull(), 1)
                         .otherwise(0)), F.lit(0)).cast("bigint")
        .alias("n_false_band"),
        F.expr("coalesce((10000 * sum(if(e is not null and f is not"
               " null, 1, 0))) div sum(e), 0)").alias("recall_bp"))


def _sql_dedup_eval() -> str:
    from .registry_llm import SQL_SHINGLES, sql_minhash_pairs
    return f"""
WITH found AS ({sql_minhash_pairs(DEDUP_EVAL_T)}),
shx AS (SELECT doc_id, {SQL_SHINGLES} AS sh FROM documents),
ints AS (
  SELECT doc_id,
         list_distinct(list_transform(sh,
           s -> CAST('0x' || substr(md5(s), 1, 12) AS BIGINT))) AS si
  FROM shx WHERE len(sh) > 0),
exact AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM ints a JOIN ints b ON a.doc_id < b.doc_id
  WHERE 4 * len(list_intersect(a.si, b.si)) >=
        (len(a.si) + len(b.si) - len(list_intersect(a.si, b.si)))),
common AS (SELECT * FROM found WHERE (id_a, id_b) IN
           (SELECT (id_a, id_b) FROM exact))
SELECT CAST((SELECT COUNT(*) FROM exact) AS BIGINT) AS n_exact,
       CAST((SELECT COUNT(*) FROM found) AS BIGINT) AS n_found,
       CAST((SELECT COUNT(*) FROM found) -
            (SELECT COUNT(*) FROM common) AS BIGINT) AS n_false_band,
       CAST(CASE WHEN (SELECT COUNT(*) FROM exact) = 0 THEN 0 ELSE
         (10000 * (SELECT COUNT(*) FROM common)) //
         (SELECT COUNT(*) FROM exact) END AS BIGINT) AS recall_bp
"""

# ------------------------------------------------- novelty ----------

NOVELTY_N = 3


def q_llm_novelty(spark, sf_dir):
    """Per-document n-gram NOVELTY — the training-data curation
    signal for ordering/filtering a corpus by marginal information:
    the fraction of a doc's distinct word trigrams whose FIRST
    corpus occurrence (by doc_id order — the canonical ingest order)
    is this document.  Early docs score high, near-duplicates of
    earlier material score near zero; unlike pairwise dedup this is
    a per-doc score computable in two aggregates.

    Shape: explode→distinct (doc, gram), per-gram min(doc_id) (one
    map-side-combinable aggregate), one UNFORCED join back on gram
    (the first-occurrence table is gram-vocabulary-sized — AQE
    broadcasts it only while it fits), one per-doc aggregate.  Docs
    shorter than the gram order produce no grams and are absent —
    the scoreless-doc policy the oracle shares."""
    from .llm.dedup import shingles

    d = _t(spark, sf_dir, "documents")
    grams = (d.select("doc_id",
                      F.explode(shingles("text", NOVELTY_N)).alias("g"))
             .distinct())
    first = grams.groupBy("g").agg(F.min("doc_id").alias("first_doc"))
    return (grams.join(first, "g")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_grams"),
                 F.sum(F.when(F.col("first_doc") == F.col("doc_id"), 1)
                       .otherwise(0)).cast("bigint").alias("n_novel"))
            .select("doc_id", "n_grams", "n_novel",
                    F.expr("(10000 * n_novel) div n_grams")
                    .alias("novelty_bp"))
            .orderBy("doc_id"))


SQL_LLM_NOVELTY = f"""
WITH grams AS (
  SELECT DISTINCT doc_id,
         UNNEST(list_transform(generate_series(1, len(ws) - {NOVELTY_N - 1}),
           i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS g
  FROM (SELECT doc_id, string_split(lower(trim(text)), ' ') AS ws
        FROM documents)),
first AS (SELECT g, MIN(doc_id) AS first_doc FROM grams GROUP BY g)
SELECT grams.doc_id,
       COUNT(*) AS n_grams,
       CAST(SUM(CASE WHEN first.first_doc = grams.doc_id
                THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
       CAST((10000 * SUM(CASE WHEN first.first_doc = grams.doc_id
                         THEN 1 ELSE 0 END)) // COUNT(*) AS BIGINT)
         AS novelty_bp
FROM grams JOIN first USING (g)
GROUP BY grams.doc_id ORDER BY grams.doc_id
"""

# --------------------------------------- audio descriptors (bp) -----

AUDIO_DFT_SCALE = 1 << 14       # twiddle fixed point: |re| ≤ 32·128·2^14 = 2^26
AUDIO_DFT_N = 32                # the sha-wave's true period (digest bytes)
AUDIO_DFT_BINS = 16


def _audio_twiddles():
    """Scaled-integer DFT basis for the 32-sample wave, rounded ONCE
    here and embedded as literals in BOTH engines' plans — the same
    determinism move as phash64's DCT.  (The fake 256-sample wave is
    the digest repeated 8×, so its 256-point spectrum is exactly the
    32-point spectrum of the digest at every 8th bin — the 32-point
    DFT loses nothing.)"""
    import numpy as np
    k = np.arange(AUDIO_DFT_BINS + 1).reshape(-1, 1)
    i = np.arange(AUDIO_DFT_N).reshape(1, -1)
    ang = 2 * np.pi * k * i / AUDIO_DFT_N
    tc = np.rint(np.cos(ang) * AUDIO_DFT_SCALE).astype(np.int64)
    ts = np.rint(-np.sin(ang) * AUDIO_DFT_SCALE).astype(np.int64)
    return tc, ts


def q_mm_audio_descriptors_bp(spark, sf_dir):
    """Engine-portable INTEGER twin of ``mm_audio_features``
    (llm/multimodal.audio_feature_vector — the float/FFT operator the
    sine golden test pins): the same descriptor family — energy,
    zero-crossing rate, spectral centroid, 85% rolloff — defined so
    every value is an exact integer any engine reproduces:

    - the wave is the 32 centered digest bytes (the fake 256-sample
      wave repeats them 8×, see _audio_twiddles);
    - the spectrum is a scaled-integer 32-point DFT (re/im exact
      int64, |re| ≤ 2^26 so re²+im² ≤ 2^53 stays exact), magnitudes
      floor(IEEE sqrt) — bit-identical across engines;
    - outputs are milli-/basis-point integers via integer div; the
      two IEEE float steps (sqrt, ×1000) are deterministic given
      exact-integer inputs.

    Fully DECLARATIVE — the whole DFT runs as codegen'd array
    expressions (transform/aggregate/zip_with), no Python worker at
    all, unlike the Arrow-batched float operator.  One narrow
    projection, no shuffle, no join."""
    tc, ts = _audio_twiddles()
    tc_csv = ",".join(str(v) for v in tc.ravel())
    ts_csv = ",".join(str(v) for v in ts.ravel())
    d = (_t(spark, sf_dir, "documents")
         .filter((F.col("doc_id") < 200) & (F.col("doc_id") % 3 == 1)))
    n, bins = AUDIO_DFT_N, AUDIO_DFT_BINS
    base = d.select(
        F.col("doc_id").alias("media_id"),
        F.sha2(F.col("text").cast("binary"), 256).alias("hx"))
    xs = (f"transform(sequence(0,{n - 1}), i -> "
          f"cast(conv(substring(hx, 2*i+1, 2), 16, 10) as bigint)"
          f" - 128)")
    w = base.select(
        "media_id",
        F.expr(xs).alias("xs"),
        F.expr(f"array({tc_csv})").alias("tc"),
        F.expr(f"array({ts_csv})").alias("tsn"))
    spec = (w
            .withColumn("sumsq", F.expr(
                "aggregate(xs, 0L, (a, v) -> a + v * v)"))
            .withColumn("zc", F.expr(
                f"aggregate(sequence(2,{n}), 0L, (a, i) -> a + "
                f"if((element_at(xs,i) < 0) != (element_at(xs,i-1) < 0),"
                f" 1L, 0L))"))
            .withColumn("re", F.expr(
                f"transform(sequence(1,{bins}), k -> "
                f"aggregate(sequence(1,{n}), 0L, (a, i) -> a + "
                f"element_at(xs,i) * element_at(tc,(k)*{n} + i)))"))
            .withColumn("im", F.expr(
                f"transform(sequence(1,{bins}), k -> "
                f"aggregate(sequence(1,{n}), 0L, (a, i) -> a + "
                f"element_at(xs,i) * element_at(tsn,(k)*{n} + i)))"))
            .withColumn("mag", F.expr(
                "zip_with(re, im, (r, s) -> cast(floor(sqrt("
                "cast(r*r + s*s as double))) as bigint))"))
            .withColumn("tot", F.expr(
                "aggregate(mag, 0L, (a, v) -> a + v)")))
    return (spec.select(
        "media_id", "sumsq",
        F.expr("cast(floor(sqrt(sumsq / 32.0D) * 1000.0D) as bigint)")
        .alias("rms_mbp"),
        F.expr("(10000L * zc) div 31").alias("zcr_bp"),
        F.expr(f"if(tot = 0, 0L, (10000L * aggregate(sequence(1,{bins}),"
               f" 0L, (a, k) -> a + k * element_at(mag, k)))"
               f" div ({bins} * tot))").alias("centroid_bp"),
        F.expr(f"if(tot = 0, 0L, 1L + size(filter(sequence(1,{bins}),"
               f" k -> 20 * aggregate(slice(mag, 1, k), 0L,"
               f" (a, v) -> a + v) < 17 * tot)))").alias("rolloff_bin"))
        .orderBy("media_id"))


def _sql_audio_descriptors_bp() -> str:
    tc, ts = _audio_twiddles()
    tc_csv = ",".join(str(v) for v in tc.ravel())
    ts_csv = ",".join(str(v) for v in ts.ravel())
    n, bins = AUDIO_DFT_N, AUDIO_DFT_BINS
    return f"""
WITH m AS (
  SELECT doc_id AS media_id, sha256(text) AS hx
  FROM documents WHERE doc_id < 200 AND doc_id % 3 = 1),
x AS (
  SELECT media_id,
         list_transform(generate_series(0, {n - 1}),
           i -> CAST('0x' || substr(hx, 2*i + 1, 2) AS BIGINT) - 128)
           AS xs
  FROM m),
tw AS (SELECT [{tc_csv}] AS tc, [{ts_csv}] AS tsn),
reim AS (
  -- each bin's re/im sum computed ONCE (the magnitude expression
  -- would otherwise evaluate every O(n) sum twice)
  SELECT media_id,
         list_sum(list_transform(xs, v -> v * v)) AS sumsq,
         list_sum(list_transform(generate_series(2, {n}),
           i -> CASE WHEN (xs[i] < 0) <> (xs[i-1] < 0)
                THEN 1 ELSE 0 END)) AS zc,
         list_transform(generate_series(1, {bins}), k ->
           list_sum(list_transform(generate_series(1, {n}),
             i -> xs[i] * tc[k*{n} + i]))) AS re,
         list_transform(generate_series(1, {bins}), k ->
           list_sum(list_transform(generate_series(1, {n}),
             i -> xs[i] * tsn[k*{n} + i]))) AS im
  FROM x, tw),
spec AS (
  SELECT media_id, sumsq, zc,
         list_transform(generate_series(1, {bins}), k ->
           CAST(floor(sqrt(CAST(re[k]*re[k] + im[k]*im[k]
                           AS DOUBLE))) AS BIGINT)) AS mag
  FROM reim),
agg AS (SELECT *, list_sum(mag) AS tot FROM spec)
SELECT media_id, CAST(sumsq AS BIGINT) AS sumsq,
  CAST(floor(sqrt(sumsq / 32.0) * 1000.0) AS BIGINT) AS rms_mbp,
  CAST((10000 * zc) // 31 AS BIGINT) AS zcr_bp,
  CAST(CASE WHEN tot = 0 THEN 0 ELSE
    (10000 * list_sum(list_transform(generate_series(1, {bins}),
      k -> k * mag[k]))) // ({bins} * tot) END AS BIGINT)
    AS centroid_bp,
  CAST(CASE WHEN tot = 0 THEN 0 ELSE
    1 + len(list_filter(generate_series(1, {bins}),
      k -> 20 * list_sum(mag[:k]) < 17 * tot)) END AS BIGINT)
    AS rolloff_bin
FROM agg ORDER BY media_id
"""


QUERIES_EXT17: dict[str, dict] = {
    "snapshot_restore":    {"fn": q_snapshot_restore,
                            "sql": SQL_SNAPSHOT_RESTORE},
    "eval_pass_at_k":      {"fn": q_eval_pass_at_k,
                            "sql": _sql_pass_at_k()},
    "skew_distinct_split": {"fn": q_skew_distinct_split,
                            "sql": SQL_SKEW_DISTINCT_SPLIT},
    "mm_audio_descriptors_bp": {"fn": q_mm_audio_descriptors_bp,
                                "sql": _sql_audio_descriptors_bp()},
    "llm_novelty":         {"fn": q_llm_novelty,
                            "sql": SQL_LLM_NOVELTY},
    "llm_dedup_eval":      {"fn": q_llm_dedup_eval,
                            "sql": _sql_dedup_eval()},
}
