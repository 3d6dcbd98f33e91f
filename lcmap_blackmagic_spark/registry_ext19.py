"""Twentieth extension wave (round 12, session 2) — generation-eval
and table-format history surfaces, each under the correctness gate:

- ``eval_rouge_n``: ROUGE-2 (Lin 2004) between candidate documents
  and their deterministically paired references — CLIPPED bigram
  overlap (per-gram min of candidate/reference counts, the actual
  ROUGE-N definition, not plain intersection), recall / precision /
  F1 in exact integer basis points.  The generation-quality metric
  an eval pipeline runs at corpus scale.

- ``snapshot_history``: DESCRIBE HISTORY for the snapshot table
  format (storage.snapshot_history) — the manifest log as a
  DataFrame.  The query stages a table through all four commit
  modes (overwrite, append, restore, append) and joins each
  history row with its version's actual content aggregate, so a
  history that misreported versions, modes, dir counts, or lineage
  annotations could not hash-match.

Reference anchor: nothing in lcmap-blackmagic — eval and the
snapshot store are the engine's own first-class additions (brief
§LLM-ops / §scale)."""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import _t

# ---------------------------------------------------- ROUGE-2 -------

ROUGE_MOD = 10       # docs with doc_id % MOD == 0 are references
ROUGE_SCALE = 10_000


def q_eval_rouge_n(spark, sf_dir):
    """ROUGE-2 over deterministic candidate→reference pairs: every
    doc whose id is ≡0 (mod ROUGE_MOD) is a reference; every other
    doc scores against the reference at floor-to-MOD of its own id
    (pairs whose reference doc does not exist are skipped — ids are
    not assumed dense).  Overlap is the CLIPPED bigram count —
    sum over grams of min(candidate count, reference count), the
    ROUGE-N definition — computed as one inner join on
    (ref_id, gram) between the two count tables.  recall =
    overlap/ref_total, precision = overlap/cand_total, F1 =
    2·overlap/(ref_total+cand_total), each in exact integer basis
    points (0 when the denominator is 0: a token-poor doc has no
    bigrams).  Zero-overlap pairs are kept via a left join from the
    pair universe.

    Scale shape: per-doc bigram counting is one explode + one
    map-side-combined aggregate; the overlap join shuffles on
    (ref_id, gram) — per-reference keys, so reducers are bounded by
    a single reference's vocabulary, never the corpus's.  No
    broadcast of anything data-sized."""
    d = _t(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.trim("text")), " ")
    n_bi = F.size(toks) - F.lit(1)
    bigr = F.when(
        n_bi >= 1,
        F.transform(F.sequence(F.lit(1), n_bi),
                    lambda i: F.array_join(F.slice(toks, i, 2), " "))
    ).otherwise(F.array().cast("array<string>"))
    bg = (d.select("doc_id", F.explode(bigr).alias("g"))
          .groupBy("doc_id", "g").agg(F.count(F.lit(1)).alias("c")))
    refs_ids = (d.filter(F.col("doc_id") % ROUGE_MOD == 0)
                .select(F.col("doc_id").alias("ref_id")))
    # pair universe: every non-reference doc whose reference EXISTS
    pairs = (d.filter(F.col("doc_id") % ROUGE_MOD != 0)
             .select("doc_id",
                     (F.col("doc_id") - F.col("doc_id") % ROUGE_MOD)
                     .alias("ref_id"))
             .join(refs_ids, "ref_id"))
    ctot = bg.groupBy("doc_id").agg(F.sum("c").alias("cand_tot"))
    rtot = (bg.withColumnRenamed("doc_id", "ref_id")
            .groupBy("ref_id").agg(F.sum("c").alias("ref_tot")))
    cg = (pairs.join(bg, "doc_id")
          .select("doc_id", "ref_id", "g", "c"))
    rg = (bg.select(F.col("doc_id").alias("ref_id"), "g",
                    F.col("c").alias("rc")))
    ov = (cg.join(rg, ["ref_id", "g"])
          .groupBy("doc_id", "ref_id")
          .agg(F.sum(F.least("c", "rc")).alias("overlap")))
    out = (pairs
           .join(ov, ["doc_id", "ref_id"], "left")
           .join(ctot, "doc_id", "left")
           .join(rtot, "ref_id", "left")
           .select("doc_id", "ref_id",
                   F.coalesce("overlap", F.lit(0)).cast("bigint")
                   .alias("overlap"),
                   F.coalesce("cand_tot", F.lit(0)).cast("bigint")
                   .alias("cand_tot"),
                   F.coalesce("ref_tot", F.lit(0)).cast("bigint")
                   .alias("ref_tot")))
    z = F.lit(0).cast("bigint")
    return out.select(
        "doc_id", "ref_id", "overlap",
        F.when(F.col("ref_tot") > 0,
               F.expr(f"(overlap * {ROUGE_SCALE}) div ref_tot"))
        .otherwise(z).alias("recall_bp"),
        F.when(F.col("cand_tot") > 0,
               F.expr(f"(overlap * {ROUGE_SCALE}) div cand_tot"))
        .otherwise(z).alias("precision_bp"),
        F.when(F.col("cand_tot") + F.col("ref_tot") > 0,
               F.expr(f"(2 * overlap * {ROUGE_SCALE}) div "
                      f"(cand_tot + ref_tot)"))
        .otherwise(z).alias("f1_bp"))


SQL_EVAL_ROUGE_N = f"""
WITH base AS (
  SELECT doc_id, string_split(lower(trim(text)), ' ') AS ws
  FROM documents),
bg AS (
  SELECT doc_id, g, COUNT(*) AS c FROM (
    SELECT doc_id,
           UNNEST(list_transform(generate_series(1, len(ws) - 1),
                  i -> ws[i] || ' ' || ws[i+1])) AS g
    FROM base WHERE len(ws) - 1 >= 1)
  GROUP BY doc_id, g),
pairs AS (
  SELECT d.doc_id, d.doc_id - d.doc_id % {ROUGE_MOD} AS ref_id
  FROM documents d
  WHERE d.doc_id % {ROUGE_MOD} <> 0
    AND EXISTS (SELECT 1 FROM documents r
                WHERE r.doc_id = d.doc_id - d.doc_id % {ROUGE_MOD})),
ctot AS (SELECT doc_id, SUM(c) AS cand_tot FROM bg GROUP BY doc_id),
rtot AS (SELECT doc_id AS ref_id, SUM(c) AS ref_tot FROM bg
         GROUP BY doc_id),
ov AS (
  SELECT p.doc_id, p.ref_id, SUM(LEAST(cb.c, rb.c)) AS overlap
  FROM pairs p
  JOIN bg cb ON cb.doc_id = p.doc_id
  JOIN bg rb ON rb.doc_id = p.ref_id AND rb.g = cb.g
  GROUP BY p.doc_id, p.ref_id),
j AS (
  SELECT p.doc_id, p.ref_id,
         CAST(COALESCE(o.overlap, 0) AS BIGINT) AS overlap,
         CAST(COALESCE(ct.cand_tot, 0) AS BIGINT) AS cand_tot,
         CAST(COALESCE(rt.ref_tot, 0) AS BIGINT) AS ref_tot
  FROM pairs p
  LEFT JOIN ov o ON o.doc_id = p.doc_id AND o.ref_id = p.ref_id
  LEFT JOIN ctot ct ON ct.doc_id = p.doc_id
  LEFT JOIN rtot rt ON rt.ref_id = p.ref_id)
SELECT doc_id, ref_id, overlap,
       CAST(CASE WHEN ref_tot > 0
                 THEN (overlap * {ROUGE_SCALE}) // ref_tot
                 ELSE 0 END AS BIGINT) AS recall_bp,
       CAST(CASE WHEN cand_tot > 0
                 THEN (overlap * {ROUGE_SCALE}) // cand_tot
                 ELSE 0 END AS BIGINT) AS precision_bp,
       CAST(CASE WHEN cand_tot + ref_tot > 0
                 THEN (2 * overlap * {ROUGE_SCALE})
                      // (cand_tot + ref_tot)
                 ELSE 0 END AS BIGINT) AS f1_bp
FROM j
"""


# ------------------------------------------------ DESCRIBE HISTORY --

HIST_SLICES = 3


def q_snapshot_history(spark, sf_dir):
    """Drive a staged table through all four commit modes —
    overwrite, append, RESTORE, append — then read the manifest log
    back through storage.snapshot_history and join each history row
    with its version's actual content aggregate.  A history that
    misreported modes, dir counts, delete counts, or order could not
    hash-match the slice arithmetic.  Follows the snapshot_restore
    re-run convention: history rows are filtered to THIS run's
    returned versions and renumbered to steps 1-4, so a second run
    in the same process (whose versions continue the staged log)
    emits identical rows."""
    from .registry import _staging
    from .storage import (read_snapshot, restore_snapshot,
                          snapshot_history, write_snapshot)

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint").alias("cents"))

    def sl(s):
        return o.filter(F.col("o_orderkey") % HIST_SLICES == s)

    t = _staging(sf_dir, "hist_orders")
    va = write_snapshot(sl(0), t, mode="overwrite",
                        collect_stats=False)
    vb = write_snapshot(sl(1), t, mode="append", collect_stats=False)
    vc = restore_snapshot(t, va)
    vd = write_snapshot(sl(2), t, mode="append", collect_stats=False)
    vs = [va, vb, vc, vd]
    steps = spark.createDataFrame(
        [(v, i + 1) for i, v in enumerate(vs)], "version int, step int")
    hist = (snapshot_history(spark, t)
            .filter(F.col("version").isin(vs))
            .join(F.broadcast(steps), "version")
            .select("step", "mode", "n_dirs", "n_deletes"))
    content = None
    for i, v in enumerate(vs, start=1):
        part = (read_snapshot(spark, t, version=v)
                .agg(F.lit(i).alias("step"),
                     F.count(F.lit(1)).alias("n_rows"),
                     F.sum("cents").alias("sum_cents")))
        content = part if content is None else content.unionByName(part)
    return hist.join(content, "step").orderBy("step")


SQL_SNAPSHOT_HISTORY = f"""
WITH c AS (
  SELECT o_orderkey % {HIST_SLICES} AS s,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           AS cents
  FROM orders),
steps(step, mode, n_dirs, n_deletes) AS (
  VALUES (1, 'overwrite', 1, 0), (2, 'append', 2, 0),
         (3, 'restore', 1, 0), (4, 'append', 2, 0)),
sel AS (
  -- step 1: slice 0; step 2: slices 0,1; step 3 (restore to step
  -- 1): slice 0; step 4 (append onto the restore): slices 0,2
  SELECT st.step, st.mode, st.n_dirs, st.n_deletes, c.cents,
         CASE WHEN st.step = 1 AND c.s = 0 THEN 1
              WHEN st.step = 2 AND c.s < 2 THEN 1
              WHEN st.step = 3 AND c.s = 0 THEN 1
              WHEN st.step = 4 AND c.s IN (0, 2) THEN 1
              ELSE 0 END AS copies
  FROM steps st, c)
SELECT step, mode, CAST(n_dirs AS INTEGER) AS n_dirs,
       CAST(n_deletes AS INTEGER) AS n_deletes,
       CAST(SUM(copies) AS BIGINT) AS n_rows,
       CAST(SUM(copies * cents) AS BIGINT) AS sum_cents
FROM sel GROUP BY step, mode, n_dirs, n_deletes ORDER BY step
"""


# -------------------------------------------- Pareto skyline --------

SKY_BUCKETS = 32
SKY_SCALE = 10_000


def q_pareto_skyline(spark, sf_dir):
    """PARETO FRONTIER (skyline) over two maximize-criteria per
    document — token count (x) and type-token ratio in basis points
    (y = distinct·10⁴ div n, exact integer), the length-vs-
    vocabulary-richness trade-off a multi-criteria curation pass
    selects on (anti-correlated by construction, so the frontier is
    a real curve, not one corner point).  Emits the non-dominated
    (x, y) points with their doc multiplicity: a point survives iff
    no other point has x' ≥ x AND y' ≥ y with one strict.

    The PLAN is the point (the skew_distinct_split precedent): a
    naive skyline is an all-pairs dominance anti-join (quadratic)
    or one GLOBAL x-ordered window (a single reducer walks the
    whole table — the shape the registry plan audit bans).  Instead:

      1. distinct (x, y) points (map-side combined),
      2. x-RANGE buckets from a one-row (min, max) broadcast —
         bucket id is monotone in x, so every point in a higher
         bucket has strictly larger x than every point below
         (equal x always lands in one bucket),
      3. LOCAL skyline per bucket: window partitioned by bucket,
         ordered (x DESC, y DESC) — over distinct points a row is
         dominated iff the running max of y over preceding rows
         is ≥ its own y,
      4. cross-bucket pass: per-bucket y-maxima (≤ SKY_BUCKETS
         rows, a constant-bounded collect like the k-center
         centers) fold into a literal suffix-max CASE — a local
         survivor is global iff its y exceeds the best y of every
         higher bucket.

    Every stage is bounded: reducers see one bucket's points,
    never a global order, and the only cross-bucket state is
    SKY_BUCKETS integers.  The DuckDB oracle replays the same
    dominance rule as one ordered window (single-node, where a
    global window is fine), so a bucketing bug that dropped or
    resurrected a frontier point cannot hash-match."""
    from pyspark.sql import Window

    d = _t(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.trim("text")), " ")
    n = F.size(toks).cast("bigint")
    ttr = F.expr(f"(cast(size(array_distinct(split(lower(trim(text))"
                 f", ' '))) as bigint) * {SKY_SCALE}) div "
                 f"cast(size(split(lower(trim(text)), ' ')) as bigint)")
    pts = (d.select(n.alias("x"), ttr.alias("y"))
           .groupBy("x", "y")
           .agg(F.count(F.lit(1)).alias("n_docs"))
           # three consumers (min/max collect, the local skyline,
           # the bucket-maxima collect) — checkpoint the distinct
           # points once instead of re-scanning + re-tokenizing the
           # corpus per consumer (the tile_train precedent); the
           # table is distinct (x, y) pairs, tiny at any corpus size.
           # Lazy (r15): the min/max collect right below is the
           # first action and materializes it in the same job
           .localCheckpoint(eager=False))
    lo, hi = pts.agg(F.min("x"), F.max("x")).collect()[0]
    if lo is None:
        # empty documents table: the frontier is empty, not a crash
        return spark.createDataFrame([], "x long, y long, n_docs long")
    span = max(int(hi) - int(lo) + 1, 1)
    bx = ((F.col("x") - F.lit(int(lo))) * SKY_BUCKETS / span) \
        .cast("int")
    w = (Window.partitionBy("b").orderBy(F.desc("x"), F.desc("y"))
         .rowsBetween(Window.unboundedPreceding, -1))
    local = (pts.withColumn("b", bx)
             .withColumn("prev_maxy", F.max("y").over(w))
             .filter(F.col("prev_maxy").isNull()
                     | (F.col("prev_maxy") < F.col("y"))))
    # per-bucket y maxima: ≤ SKY_BUCKETS rows, bounded by a constant
    bmax = {int(r["b"]): int(r["my"]) for r in
            (pts.withColumn("b", bx).groupBy("b")
             .agg(F.max("y").alias("my")).collect())}
    suffix = {}
    best = None
    for b in sorted(bmax, reverse=True):
        suffix[b] = best           # best y of any STRICTLY higher bucket
        best = bmax[b] if best is None else max(best, bmax[b])
    expr = F.lit(None).cast("bigint")
    for b, s in suffix.items():
        if s is not None:
            expr = F.when(F.col("b") == b, F.lit(s)).otherwise(expr)
    return (local.withColumn("hi_y", expr)
            .filter(F.col("hi_y").isNull()
                    | (F.col("y") > F.col("hi_y")))
            .select("x", "y", "n_docs"))


SQL_PARETO_SKYLINE = """
WITH pts AS (
  SELECT CAST(len(ws) AS BIGINT) AS x,
         (CAST(len(list_distinct(ws)) AS BIGINT) * 10000)
           // CAST(len(ws) AS BIGINT) AS y,
         CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM (SELECT string_split(lower(trim(text)), ' ') AS ws
        FROM documents)
  GROUP BY 1, 2),
r AS (
  SELECT x, y, n_docs,
         MAX(y) OVER (ORDER BY x DESC, y DESC
                      ROWS BETWEEN UNBOUNDED PRECEDING
                      AND 1 PRECEDING) AS prev_maxy
  FROM pts)
SELECT x, y, n_docs FROM r
WHERE prev_maxy IS NULL OR prev_maxy < y
"""


# ------------------------------------- exact-replay integer IVF -----

IVX_CELLS = 8     # coarse cells (Voronoi partitions)
IVX_PROBE = 2     # cells probed per query
IVX_K = 3         # neighbors returned per query
IVX_ITERS = 2     # unrolled integer Lloyd iterations
IVX_QS = 1024     # 2^10 coordinate quantization (exact: double*2^10)
IVX_DIM = 64
IVX_STRIDE = 50   # every 50th vec_id is a query


def q_llm_ann_ivf_exact(spark, sf_dir, label_mod: int | None = None):
    """IVF approximate nearest neighbors with a FULL oracle — the
    bit-exact sibling of ``llm_ann_ivf`` (whose float k-means is
    unreplayable by design, the registry's adjudicated rows-only
    entry).  Every step is integer arithmetic both engines replay
    identically:

      1. coordinates quantized once by floor(x·2^10) (exact —
         the kcenter_diverse grid),
      2. IVX_ITERS unrolled integer Lloyd iterations from
         deterministic seeds (the vectors whose vec_id is below
         IVX_CELLS — the testdata ids are dense from 0, so these
         exist; on a sparse/offset id space seed instead from
         orderBy(vec_id).limit(IVX_CELLS) and mirror the oracle):
         assignment = argmin exact squared-L2 (tie → smaller cell),
         centroid update = per-dimension ``sum div count`` (both
         engines truncate toward zero — the fuzz-pinned rule);
         an emptied cell keeps its previous centroid,
      3. queries (every IVX_STRIDE-th id) probe their IVX_PROBE
         nearest cells, candidates come from probed cells only,
      4. ranking by true cosine WITHOUT a transcendental: the
         comparator is sign(dot)·dot² / (|q|²·|n|²) — all three
         int64-exact and < 2^53, so the ONE IEEE double division is
         bit-identical across engines; output columns are the
         INTEGERS (dot, q2, n2), never the ratio.  The 2^53 bound
         ASSUMES |component| ≤ 1 (true of the testdata embeddings):
         |qa_i| ≤ 2^10 gives |dot| ≤ 64·2^20 = 2^26, so dot² and
         q2·n2 are ≤ 2^52 — a 2× margin that embeddings with
         magnitude > 1 silently void; re-derive the bound (or lower
         IVX_QS) before pointing this at unnormalized vectors.

    Zero-norm vectors are excluded up front (a NaN comparator would
    order differently across engines).  Scale shape is the IVF
    shape: the centroid table is a constant (IVX_CELLS×IVX_DIM
    ints, collected like the k-center model); per Lloyd iteration
    the only shuffle is the (cell, dim) rollup — IVX_CELLS·IVX_DIM
    rows out; candidate ranking shuffles per query id with fan-out
    bounded by the probed cells' population.

    ``label_mod`` turns this into FILTERED vector search (the
    one-index-many-filters deployment): neighbors are restricted to
    vectors whose metadata ``label % label_mod == 0`` via a PRE-
    filter semi-join applied to the postings side BEFORE ranking —
    the index (centroids, cell assignment, probe choice) is built on
    and serves the FULL corpus, so one index answers every filter,
    and pre-filtering (unlike post-filtering the top-k) cannot
    return fewer than k results while eligible candidates exist in
    the probed cells.  The filter frame is a (vec_id) projection of
    the base table — column-pruned scan, co-keyed with the postings
    join."""
    from pyspark.sql import Window

    from .ml.intlloyd import cell_of, dist_to_sql, integer_lloyd, sumsq
    e = _t(spark, sf_dir, "embeddings")
    arr = e.select(
        "vec_id",
        F.transform("embedding",
                    lambda x: F.floor(x.cast("double") * IVX_QS)
                    .cast("bigint")).alias("qa"))
    # lazy localCheckpoint replaces the r14 parquet staging: the same
    # materialize-once multi-consumer barrier (Lloyd scans, corpus
    # side, query side), but its materialization rides the Lloyd
    # SEED collect — the first job that touches it — instead of
    # paying a blocking parquet write + read-back round trip (r15
    # driver-bound fix: 2 fewer sequential jobs, no disk detour)
    arrq = arr.localCheckpoint(eager=False)

    cents = integer_lloyd(arrq, IVX_CELLS, IVX_ITERS, IVX_DIM)
    sq = sumsq()
    corpus = (arrq.withColumn("cell", cell_of(cents))
              .withColumn("n2", sq).filter(F.col("n2") > 0)
              .select(F.col("vec_id").alias("nid"),
                      F.col("qa").alias("nqa"), "cell", "n2"))
    if label_mod is not None:
        ok = (e.filter(F.col("label") % label_mod == 0)
              .select(F.col("vec_id").alias("nid")))
        corpus = corpus.join(ok, "nid", "semi")
    # one parsed SQL string (ml/intlloyd.dist_to_sql rationale),
    # projected BELOW the explode: a generator re-evaluates its
    # select-list per OUTPUT row, so inlining the probe sort in the
    # explode select would pay the 8-cell argmin sort ×IVX_PROBE
    pc = F.expr("slice(array_sort(array(" + ",".join(
        f"named_struct('d', {dist_to_sql(c)}, 'cid', {int(cid)})"
        for cid, c in cents) + f")), 1, {IVX_PROBE})")
    qs = (arrq.filter(F.col("vec_id") % IVX_STRIDE == 0)
          .withColumn("q2", sq).filter(F.col("q2") > 0)
          .withColumn("__pc", F.transform(pc, lambda s: s["cid"]))
          .select(F.col("vec_id").alias("qid"),
                  F.col("qa").alias("qqa"), "q2",
                  F.explode("__pc").alias("cell")))
    dot = F.aggregate(
        F.zip_with(F.col("qqa"), F.col("nqa"), lambda x, y: x * y),
        F.lit(0).cast("bigint"), lambda a, v: a + v)
    cand = (qs.join(corpus, "cell")
            .filter(F.col("qid") != F.col("nid"))
            .select("qid", "nid", "q2", "n2", dot.alias("dot")))
    score = (F.when(F.col("dot") >= 0, F.col("dot") * F.col("dot"))
             .otherwise(-(F.col("dot") * F.col("dot")))
             .cast("double")
             / (F.col("q2") * F.col("n2")).cast("double"))
    w = Window.partitionBy("qid").orderBy(score.desc(), "nid")
    return (cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= IVX_K)
            .select("qid", "rank", "nid", "dot", "q2", "n2"))


def _sql_ivf_exact(label_mod: int | None = None) -> str:
    from .ml.intlloyd import sql_l2, sql_lloyd_ctes
    gs = f"generate_series(1, {IVX_DIM})"
    flt = ("" if label_mod is None else
           f" AND vec_id IN (SELECT vec_id FROM embeddings "
           f"WHERE label % {label_mod} = 0)")

    def l2(a, b):
        return sql_l2(gs, a, b)

    parts, prev = sql_lloyd_ctes(IVX_CELLS, IVX_ITERS, IVX_DIM, IVX_QS)

    def nrm(a):
        return f"list_sum(list_transform({a}.qa, x -> x * x))"

    parts.append(
        f"af AS MATERIALIZED (SELECT vec_id AS nid, qa, cid, n2 "
        f"FROM (SELECT v.vec_id, v.qa, c.cid, {nrm('v')} AS n2, "
        f"ROW_NUMBER() OVER (PARTITION BY v.vec_id "
        f"ORDER BY {l2('v', 'c')}, c.cid) AS rn "
        f"FROM q v, {prev} c) WHERE rn = 1 AND n2 > 0{flt})")
    parts.append(
        f"qs AS MATERIALIZED (SELECT vec_id AS qid, q.qa AS qa, "
        f"{nrm('q')} AS q2 "
        f"FROM q WHERE vec_id % {IVX_STRIDE} = 0 AND {nrm('q')} > 0)")
    parts.append(
        f"pr AS MATERIALIZED (SELECT qid, cid FROM ("
        f"SELECT v.qid, c.cid, ROW_NUMBER() OVER (PARTITION BY v.qid "
        f"ORDER BY {l2('v', 'c')}, c.cid) AS rn "
        f"FROM qs v, {prev} c) WHERE rn <= {IVX_PROBE})")
    dot = (f"list_sum(list_transform({gs}, i -> "
           f"qq.qa[i] * a.qa[i]))")
    parts.append(
        f"sc AS MATERIALIZED (SELECT qq.qid, a.nid, qq.q2, a.n2, "
        f"{dot} AS dot FROM pr p "
        f"JOIN qs qq ON qq.qid = p.qid "
        f"JOIN af a ON a.cid = p.cid AND a.nid <> qq.qid)")
    return ("WITH " + ",\n".join(parts) + "\n"
            "SELECT qid, CAST(rn AS INT) AS rank, nid, "
            "CAST(dot AS BIGINT) AS dot, CAST(q2 AS BIGINT) AS q2, "
            "CAST(n2 AS BIGINT) AS n2 FROM ("
            "SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY "
            "CAST(CASE WHEN dot >= 0 THEN dot * dot "
            "ELSE -(dot * dot) END AS DOUBLE) "
            "/ CAST(q2 * n2 AS DOUBLE) DESC, nid) AS rn FROM sc) "
            f"WHERE rn <= {IVX_K}")


SQL_LLM_ANN_IVF_EXACT = _sql_ivf_exact()


QUERIES_EXT19: dict[str, dict] = {
    "eval_rouge_n":      {"fn": q_eval_rouge_n,
                          "sql": SQL_EVAL_ROUGE_N},
    "snapshot_history":  {"fn": q_snapshot_history,
                          "sql": SQL_SNAPSHOT_HISTORY},
    "pareto_skyline":    {"fn": q_pareto_skyline,
                          "sql": SQL_PARETO_SKYLINE},
    "llm_ann_ivf_exact": {"fn": q_llm_ann_ivf_exact,
                          "sql": SQL_LLM_ANN_IVF_EXACT},
}
