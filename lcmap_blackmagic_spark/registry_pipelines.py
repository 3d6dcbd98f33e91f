"""Pipeline registry entries: compositions whose core is a pandas-UDF
or ML boundary (UD1 detect, UD2 train, UD3 predict, multimodal decode,
ANN). Most are rows-only — no SQL oracle exists (seeded Spark-side
fixtures / approximate sketches), so the driver records the weaker
rows-only check and golden tests in tests/test_pipelines.py pin
correctness. Exceptions: ``kmv_sketch`` and ``llm_ann_topk`` are
deterministic functions of the driver tables and carry full generated
oracles.

All inputs are deterministic (seeded synthetic fixtures or the
provided tables), so row counts and schemas are stable across runs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import _t


def q_lcmap_segment_detect(spark, sf_dir):
    """UD1: raster → time-series assembly → per-pixel detection →
    38-col segments (plans/segment.py). Fully oracle-checked: the
    input chip is the md5-hash fixture (synth_ard_hash) and the
    detector is closed-form integer-sum OLS, so DuckDB regenerates
    the identical raster in SQL and reproduces the fitted slope /
    intercept / RMSE bit-for-bit (_sql_segment_detect)."""
    from .plans.segment import segment_pipeline
    from .sources.fixtures import synth_ard_hash
    ard = synth_ard_hash(spark, side=10)
    return segment_pipeline(ard, side=10).select(
        "cx", "cy", "px", "py", "sday", "eday", "curqa",
        F.col("recoef")[0].alias("reslope"), "reint", "rermse")


def _sql_segment_detect(side: int = 10, n_acq: int = 40) -> str:
    """DuckDB twin of ``q_lcmap_segment_detect``: regenerates the
    md5-hash chip (same keys as sources/fixtures.synth_ard_hash) and
    fits the red band with the SAME left-associative float expression
    order as plans/segment.stub_detector — exact integer sums, one
    double division for the slope, Σresid² expanded over the sums —
    so both engines run the identical IEEE-754 sequence."""
    h = "CAST('0x' || substr(md5({key}), 1, 8) AS BIGINT)"
    qa_h = h.format(key="'qa:' || pos || ':' || day")
    red_h = h.format(key="'red:' || c.pos || ':' || c.day")
    return f"""
WITH days AS (SELECT 17 + 311 * a AS day FROM range({n_acq}) t(a)),
pix AS (SELECT CAST(p AS INT) AS pos FROM range({side * side}) t(p)),
qa AS (
  SELECT pos, day,
         CASE WHEN {qa_h} % 100 < 15 THEN 322 ELSE 66 END AS qaval
  FROM pix, days),
clear AS (SELECT pos, day, 724276 + day AS x FROM qa WHERE qaval = 66),
vals AS (
  SELECT c.pos, c.x, 500 + {red_h} % 3000 AS y
  FROM clear c),
stats AS (
  -- LEFT JOIN from the pixel universe: a pixel with ZERO clear
  -- observations must still produce a (default) output row, exactly
  -- as the Spark pipeline emits a default segment for every pixel
  SELECT p.pos, COUNT(v.x) AS n,
         CAST(COALESCE(SUM(v.x), 0) AS BIGINT) AS sx,
         CAST(COALESCE(SUM(v.x * v.x), 0) AS BIGINT) AS sxx,
         CAST(COALESCE(SUM(v.y), 0) AS BIGINT) AS sy,
         CAST(COALESCE(SUM(v.y * v.y), 0) AS BIGINT) AS syy,
         CAST(COALESCE(SUM(v.x * v.y), 0) AS BIGINT) AS sxy,
         MIN(v.x) AS minx, MAX(v.x) AS maxx
  FROM pix p LEFT JOIN vals v ON v.pos = p.pos
  GROUP BY p.pos),
fit AS (
  SELECT *, CAST(n * sxy - sx * sy AS DOUBLE) / (n * sxx - sx * sx) AS m
  FROM stats),
fit2 AS (SELECT *, (sy - m * sx) / n AS b FROM fit),
fit3 AS (
  SELECT *, syy - 2.0*b*sy - 2.0*m*sxy + n*b*b + 2.0*m*b*sx + m*m*sxx AS ss
  FROM fit2)
SELECT CAST(0 AS BIGINT) AS cx, CAST(0 AS BIGINT) AS cy,
       CAST((pos % {side}) * 30 AS BIGINT) AS px,
       CAST(-(pos // {side}) * 30 AS BIGINT) AS py,
       CASE WHEN n >= 12
            THEN strftime(DATE '0001-01-01' + CAST(minx - 1 AS INT), '%Y-%m-%d')
            ELSE '0001-01-01' END AS sday,
       CASE WHEN n >= 12
            THEN strftime(DATE '0001-01-01' + CAST(maxx - 1 AS INT), '%Y-%m-%d')
            ELSE '0001-01-01' END AS eday,
       CASE WHEN n >= 12 THEN 66 ELSE 0 END AS curqa,
       CASE WHEN n >= 12 THEN m ELSE NULL END AS reslope,
       CASE WHEN n >= 12 THEN b ELSE 0.0 END AS reint,
       CASE WHEN n >= 12 THEN CASE WHEN ss > 0 THEN sqrt(ss / n) ELSE 0.0 END
            ELSE 0.0 END AS rermse
FROM fit3
"""


def q_lcmap_prediction(spark, sf_dir):
    """UD2+UD3: train (fallback classifier) then batch-predict with
    defaults routing — the full /prediction composition at probe
    scale (side=8; the bench-scale twin is ``lcmap_predict_chip``).
    FULLY ORACLE-CHECKED since round 11: the md5-hash fixtures
    regenerate in SQL and the compared columns (keys, segment dates,
    exploded prediction dates, prob arity) are closed-form
    (_sql_predict_chip(side=8)); the tile_pipeline fit — including
    its seeded sample/split, which only shape the MODEL, never the
    compared columns — still runs as the workload."""
    from .plans.prediction import prediction_pipeline
    from .plans.tile import tile_pipeline
    from .sources.fixtures import synth_aux_hash, synth_segments_hash
    segs = synth_segments_hash(spark, side=8)
    aux = synth_aux_hash(spark, side=8)
    model, _ = tile_pipeline(segs, aux, "2001-07-01", target_samples=200,
                             class_min=5, class_max=40)
    preds = prediction_pipeline(segs, aux, model, 7, 1)
    return preds.select("cx", "cy", "px", "py", "sday", "eday", "pday",
                        F.size("prob").alias("n_probs"))


def q_lcmap_detect_chip(spark, sf_dir):
    """BENCH-SCALE /segment: one FULL 100×100-pixel chip — the
    reference's unit of work (blackmagic/blueprints/segment.py:253-264
    runs detection chip-at-a-time) — through the same assembly →
    per-pixel detect → 38-col projection as ``lcmap_segment_detect``.
    Fully oracle-checked at this scale too: the md5-hash chip and the
    closed-form integer-sum OLS detector regenerate bit-for-bit in
    DuckDB (_sql_segment_detect(side=100)).  This is the engine's
    published number for the reference's detect path; BASELINE.md's
    only anchor (~970 s/chip, prediction.py:203-207) is the companion
    prediction path benched by ``lcmap_predict_chip``."""
    from .plans.segment import segment_pipeline
    from .sources.fixtures import synth_ard_hash
    ard = synth_ard_hash(spark, side=100)
    return segment_pipeline(ard, side=100).select(
        "cx", "cy", "px", "py", "sday", "eday", "curqa",
        F.col("recoef")[0].alias("reslope"), "reint", "rermse")


def q_lcmap_tile_train(spark, sf_dir):
    """BENCH-SCALE /tile training prep (blackmagic/blueprints/
    tile.py:391-404): training-data assembly → label statistics →
    stratified sample → holdout split → model fit over one full
    100×100 chip's segments + aux.  The call itself runs the fit
    (UD2, fallback trainer when xgboost is absent); the returned
    DataFrame is the per-label statistics plus the sampled split
    sizes — the verifiable summary a training job reports.

    FULLY ORACLE-CHECKED (round 11): the fixtures are the md5-hash
    twins (synth_segments_hash / synth_aux_hash — regenerable in
    SQL), sampling orders by an md5 column (the stratified_sample
    order_col determinism contract) and the holdout coin is
    train_test_split_hash, so every count in the output is a closed
    -form function DuckDB reproduces (_sql_tile_train)."""
    from .ml.train import train_model
    from .operators.sampling import (stratified_sample,
                                     train_test_split_hash)
    from .operators.stats import label_statistics
    from .plans.training import training_data
    from .sources.fixtures import synth_aux_hash, synth_segments_hash
    segs = synth_segments_hash(spark, side=100)
    aux = synth_aux_hash(spark, side=100)
    # tile_pipeline's stages, shared instead of recomputed: assembly →
    # stats → sample → split → fit (plans/tile.py:tile_pipeline
    # verbatim; inlined so the summary below reuses the same frames)
    # localCheckpoint: FOUR downstream consumers share the assembled
    # matrix (stats, the sample, the fit's collect, the split counts) —
    # without it Catalyst re-runs the segments⨝aux assembly per
    # consumer.  ~20k rows × 69 features: sample-sized, not tile-sized.
    # Lazy (r15): the fit's matrix collect is the first action and
    # materializes it in the same job; the returned stats/split
    # aggregates then read blocks under the caller's action.
    ordc = F.conv(F.substring(F.md5(F.concat_ws(
        ":", F.lit("ord"), F.col("px").cast("string"),
        F.col("py").cast("string"))), 1, 12), 16, 10).cast("bigint")
    data = (training_data(segs, aux, "2001-07-01", keep_keys=True)
            .withColumn("__ord", ordc).localCheckpoint(eager=False))
    stats = label_statistics(data, "label")
    sample = stratified_sample(data, "label", 20_000, 50, 4_000,
                               order_col="__ord")
    train, test = train_test_split_hash(sample, ["px", "py"], 0.2)
    train_model(train.select("label", "features"),
                test.select("label", "features"))  # UD2: the fit
    splits = (train.agg(F.lit("train").alias("split"),
                        F.count(F.lit(1)).alias("n"))
              .unionByName(test.agg(F.lit("test").alias("split"),
                                    F.count(F.lit(1)).alias("n"))))
    return (stats.select(F.concat(F.lit("label:"),
                                  F.col("label").cast("string"))
                         .alias("split"),
                         F.col("cnt").alias("n"))
            .unionByName(splits).orderBy("split"))


def q_lcmap_predict_chip(spark, sf_dir):
    """BENCH-SCALE /prediction: train-then-predict over one FULL
    100×100 chip — the exact workload behind BASELINE.md's only
    published number (~970 s/chip for the superseded per-row loop,
    blackmagic/blueprints/prediction.py:203-207; the batch path this
    engine implements is prediction.py:331-345).  Broadcast model +
    Arrow-batched mapInPandas inference; defaults routed around the
    model exactly as ``lcmap_prediction`` does at probe scale.

    FULLY ORACLE-CHECKED (round 11): md5-hash fixtures + the
    deterministic sample/split; the compared columns (keys, segment
    dates, exploded prediction dates, and the prob-vector arity —
    NUM_CLASSES for modeled rows, 0 for default segments) are
    closed-form in DuckDB (_sql_predict_chip).  The fit and the
    mapInPandas inference still RUN — their probabilities are the
    ML boundary the oracle deliberately does not hash."""
    from .ml.train import train_model
    from .operators.sampling import (stratified_sample,
                                     train_test_split_hash)
    from .plans.prediction import prediction_pipeline
    from .plans.training import training_data
    from .sources.fixtures import synth_aux_hash, synth_segments_hash
    # localCheckpoint the fixture frames: BOTH the training assembly
    # and prediction_inputs below consume segs+aux, and each
    # checkpoint materialization re-ran the md5 fixture generation.
    # ALL FOUR checkpoints here are LAZY since r15: this query's only
    # unavoidable driver actions are the fit's matrix collect and the
    # final inference job, and every checkpoint's first consumer sits
    # under one of them — the fit's collect materializes segs, aux
    # and data in ONE job; the final job materializes inputs.  The
    # r14 eager forms ran four extra blocking jobs for the same reuse
    # (driver bench 13.3 s, scaling ratio 0.74 — action-bound).
    segs = synth_segments_hash(spark, side=100) \
        .localCheckpoint(eager=False)
    aux = synth_aux_hash(spark, side=100).localCheckpoint(eager=False)
    # tile_pipeline's fit stages with the training matrix checkpointed
    # once (sample + the fit's collect re-ran the assembly)
    ordc = F.conv(F.substring(F.md5(F.concat_ws(
        ":", F.lit("ord"), F.col("px").cast("string"),
        F.col("py").cast("string"))), 1, 12), 16, 10).cast("bigint")
    data = (training_data(segs, aux, "2001-07-01", keep_keys=True)
            .withColumn("__ord", ordc).localCheckpoint(eager=False))
    sample = stratified_sample(data, "label", 20_000, 50, 4_000,
                               order_col="__ord")
    train, test = train_test_split_hash(sample, ["px", "py"], 0.2)
    model = train_model(train.select("label", "features"),
                        test.select("label", "features"))
    # prediction_pipeline's stages, inlined (the tile_train precedent)
    # to cut the final job's contention surface: the defaults/data
    # union otherwise re-runs the fixture assembly + feature build in
    # BOTH branches (a 64-task stage), and the modeled branch spawns
    # one Python worker per upstream partition for a ~20 MB matrix.
    # Checkpointing the assembled inputs once and coalescing the
    # Arrow side to 8 partitions keeps the inference stage at 8
    # Python tasks over staged rows — the shape that stayed flat
    # under driver-suite load (r12's 5.9→14 s swing; SCALE.md r13).
    # Chip-scale only: the real tile path (prediction_pipeline) keeps
    # full parallelism — there the matrix is tile-sized, not 20 MB.
    from .ml.predict import predict_probabilities
    from .operators.unions import default_predictions, group_data
    from .plans.prediction import prediction_inputs
    inputs = prediction_inputs(segs, aux, 7, 1) \
        .localCheckpoint(eager=False)
    defaults, data = group_data(inputs)
    predicted = (predict_probabilities(data.coalesce(8), model,
                                       "independent")
                 .drop("independent"))
    preds = default_predictions(defaults.drop("independent"), predicted)
    return preds.select("cx", "cy", "px", "py", "sday", "eday", "pday",
                        F.size("prob").alias("n_probs"))


def _h8sql(key: str) -> str:
    return f"CAST('0x' || substr(md5({key}), 1, 8) AS BIGINT)"


def _h12sql(key: str) -> str:
    return f"CAST('0x' || substr(md5({key}), 1, 12) AS BIGINT)"


# The hash-fixture CTE prefix shared by both bench-pipeline oracles:
# regenerates synth_aux_hash's label column and synth_segments_hash's
# per-pixel segment layout (is_def, n_seg, interval base/step) from
# the same md5 coins the Spark fixtures draw.
def _sql_hash_fixtures(side: int) -> str:
    return f"""
pix AS (SELECT CAST(p AS BIGINT) AS p FROM range({side * side}) t(p)),
aux AS (
  SELECT p,
         CASE WHEN {_h8sql("'aux:lab:' || p")} % 100 < 70
              THEN 1 + {_h8sql("'aux:trn:' || p")} % 8
              ELSE 0 END AS label
  FROM pix),
segp AS (
  SELECT p,
         {_h8sql("'seg:def:' || p")} % 100 < 8 AS is_def,
         1 + {_h8sql("'seg:n:' || p")} % 3 AS n_seg,
         1986 + {_h8sql("'seg:b:' || p")} % 10 AS b0,
         2 + {_h8sql("'seg:s:' || p")} % 6 AS st
  FROM pix),
real AS (
  SELECT p, b0 + s * st AS y0, b0 + (s + 1) * st AS y1
  FROM (SELECT p, b0, st, UNNEST(range(n_seg)) AS s
        FROM segp WHERE NOT is_def))"""


def _sql_tile_train(side: int = 100, cx: int = -2061585,
                    cy: int = 1922805, date: str = "2001-07-01",
                    target: int = 20_000, cmin: int = 50,
                    cmax: int = 4_000, test_size: float = 0.2) -> str:
    """Oracle for ``q_lcmap_tile_train``: regenerates the hash
    fixtures, replays training-data assembly (spanning-segment join ×
    labeled aux — the fixture's disjoint intervals guarantee ≤ 1
    spanning segment per pixel), label statistics, the order_col
    stratified sample (row_number ≤ ceil/clip cap), and the md5
    holdout coin (operators/sampling.train_test_split_hash)."""
    from .operators.sampling import HASH_MOD
    thr = int(test_size * HASH_MOD)
    ordk = _h12sql("'ord:' || px || ':' || py")
    coink = _h12sql("'split:' || px || ':' || py")
    return f"""
WITH {_sql_hash_fixtures(side)},
spans AS (
  SELECT DISTINCT p FROM real
  WHERE make_date(CAST(y0 AS INT), 3, 1) <= DATE '{date}'
    AND DATE '{date}' <= make_date(CAST(y1 AS INT), 2, 1)),
data AS (
  SELECT a.label,
         {cx} + (a.p % {side}) * 30 AS px,
         {cy} - (a.p // {side}) * 30 AS py
  FROM aux a JOIN spans s ON s.p = a.p
  WHERE a.label <> 0),
stats AS (SELECT label, COUNT(*) AS cnt FROM data GROUP BY label),
caps AS (
  SELECT label,
         LEAST(GREATEST(CAST(CEIL({target} * (CAST(cnt AS DOUBLE) /
               (SELECT SUM(cnt) FROM stats))) AS BIGINT),
               {cmin}), {cmax}) AS cap
  FROM stats),
ranked AS (
  SELECT label, {coink} AS coin,
         ROW_NUMBER() OVER (PARTITION BY label ORDER BY {ordk}) AS rn
  FROM data),
sample AS (
  SELECT r.label, r.coin FROM ranked r
  JOIN caps c ON r.label = c.label AND r.rn <= c.cap)
SELECT 'label:' || label AS split, cnt AS n FROM stats
UNION ALL SELECT 'test', COUNT(*) FROM sample WHERE coin < {thr}
UNION ALL SELECT 'train', COUNT(*) FROM sample WHERE coin >= {thr}
ORDER BY split
"""


def _sql_predict_chip(side: int = 100, cx: int = -2061585,
                      cy: int = 1922805) -> str:
    """Oracle for ``q_lcmap_predict_chip``: the hash fixtures'
    segment rows exploded to annual July-1 prediction dates (a real
    segment [Mar y0, Feb y1] contains July 1 of exactly the years
    y0..y1-1; a default segment yields one sentinel row), with the
    prob-vector arity — NUM_CLASSES for modeled rows, 0 for defaults
    (operators/unions.default_predictions)."""
    from .schemas import NUM_CLASSES
    return f"""
WITH {_sql_hash_fixtures(side)},
rows_real AS (
  SELECT p,
         CAST(y0 AS VARCHAR) || '-03-01' AS sday,
         CAST(y1 AS VARCHAR) || '-02-01' AS eday,
         CAST(UNNEST(range(y0, y1)) AS VARCHAR) || '-07-01' AS pday,
         CAST({NUM_CLASSES} AS INT) AS n_probs
  FROM real),
rows_def AS (
  SELECT p, '0001-01-01' AS sday, '0001-01-01' AS eday,
         '0001-01-01' AS pday, CAST(0 AS INT) AS n_probs
  FROM segp WHERE is_def),
allrows AS (SELECT * FROM rows_real UNION ALL SELECT * FROM rows_def)
SELECT CAST({cx} AS BIGINT) AS cx, CAST({cy} AS BIGINT) AS cy,
       {cx} + (p % {side}) * 30 AS px,
       {cy} - (p // {side}) * 30 AS py,
       sday, eday, pday, n_probs
FROM allrows
"""


def q_llm_minhash_pipeline(spark, sf_dir):
    """Pipeline form of ``llm_minhash_pairs``: the md5-heavy per-doc
    (band-MINs + hashed-shingle-set) aggregate is materialized to a
    staging parquet ONCE, and both the LSH candidate join and the
    exact-Jaccard verify derive from the staged scan — the pure-query
    form executes that pass twice (Catalyst specializes the shared
    aggregate per consumer; llm/dedup.py NOTE). Identical output and
    oracle to ``llm_minhash_pairs``. The staging dir is a fixed temp
    path overwritten per run — in production it would be the
    signature store a dedup job checkpoints to anyway."""
    from .llm.dedup import minhash_pairs_staged
    from .registry import _staging
    d = _t(spark, sf_dir, "documents")
    return minhash_pairs_staged(d, _staging(sf_dir, "minhash_agg"),
                                threshold=0.2)


def q_llm_ann_topk(spark, sf_dir):
    """LSH-bucketed approximate nearest neighbors (the scale path of
    llm_cosine_topk; recall < 1 vs TRUE neighbors by design, but the
    candidate set and ranking are a deterministic function of the
    data, so the query has a full oracle — the DuckDB side replays
    the same ±1 sign planes, bucket join, and rounded-cosine
    ranking)."""
    from .llm.similarity import lsh_ann_topk
    e = _t(spark, sf_dir, "embeddings")
    return lsh_ann_topk(e, F.col("vec_id") % 50 == 0, k=5)


def _sql_ann_topk(n_tables: int = 4, n_planes: int = 8,
                  k: int = 5) -> str:
    """Generated oracle for ``q_llm_ann_topk`` — same plane weights,
    same bucket join, same round-then-rank order as the Spark form
    (mirrors registry_ext2._sql_embed_neardup)."""
    from .registry_ext2 import _DOT, _sql_bucket
    keyed = "\n  UNION ALL\n  ".join(
        f"SELECT vec_id, v, {t} AS tbl, {_sql_bucket(t, n_planes)} AS bucket FROM e"
        for t in range(n_tables))
    cos = (f"{_DOT.format(a='x.v', b='y.v')} / "
           f"(sqrt({_DOT.format(a='x.v', b='x.v')}) * "
           f"sqrt({_DOT.format(a='y.v', b='y.v')}))")
    return f"""
WITH e AS (SELECT vec_id,
                  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
k AS (
  {keyed}
),
cand AS (
  SELECT DISTINCT q.vec_id AS qid, c.vec_id AS nid
  FROM k q JOIN k c ON q.tbl = c.tbl AND q.bucket = c.bucket
  WHERE q.vec_id % 50 = 0 AND q.vec_id <> c.vec_id),
scored AS (
  SELECT cand.qid, cand.nid, ROUND({cos}, 6) AS cosine
  FROM cand JOIN e x ON x.vec_id = cand.qid
            JOIN e y ON y.vec_id = cand.nid)
SELECT qid, nid, cosine FROM (
  SELECT qid, nid, cosine,
         ROW_NUMBER() OVER (PARTITION BY qid
                            ORDER BY cosine DESC, nid) AS rn
  FROM scored) t
WHERE rn <= {k}
"""


def q_llm_ann_ivf(spark, sf_dir):
    """IVF approximate nearest neighbors (k-means cells, n_probe
    probing) — the partition-pruned scale path; recall < 1 by design."""
    from .llm.similarity import ivf_ann_topk
    e = _t(spark, sf_dir, "embeddings")
    return ivf_ann_topk(e, F.col("vec_id") % 50 == 0, k=5)


# approx_sketches tolerance contract (VERDICT r12 item 7): the
# sketches are DETERMINISTIC functions of the data (hash-based HLL,
# deterministic GK), so their error on a given fixture is fixed — the
# bound below is a real invariant, not a probabilistic hope.  Measured
# worst cases across sf0.001/0.01/0.1: distinct-count relative error
# 1.65×rsd (sf0.1 flag R), median rank offset exactly 1.0 theoretical
# unit (sf0.01, the n/accuracy guarantee boundary) — the multiples
# give ≥ 1.8× headroom while still failing on a broken sketch.
SKETCH_CD_TOL_BP = 600    # |approx−exact| ≤ 600 bp of exact (3 × rsd)
SKETCH_PCT_ACC = 10_000   # percentile_approx accuracy (rank err n/acc)
SKETCH_PCT_TOL = 2        # rank tolerance in n/accuracy units


def q_approx_sketches(spark, sf_dir):
    """Sketch aggregates — the 100 TB substitute for exact distinct
    counts and exact percentiles (one pass, bounded memory, mergeable
    across partitions) — re-registered as an ORACLE-CHECKED
    approximation contract (formerly rows-only): the query emits the
    exact aggregates (hash-pinned by DuckDB) alongside per-group
    booleans asserting the sketch outputs sit inside their documented
    error bounds, computed IN the plan with integer arithmetic:

    - ``orders_ok``: |approx_count_distinct − exact|·10⁴ ≤ exact·600
      (HLL rsd 0.02, 3× tolerance),
    - ``median_ok``: the exact rank interval of the GK-returned
      median value (cnt< , cnt≤ against the cents column) stays
      within ±2 n/accuracy units of n/2 — percentile_approx's own
      rank guarantee with 2× slack.

    The oracle computes the exact side and expects TRUE: a sketch
    that drifts outside its contract hash-mismatches.  Scale shape:
    the sketches and exact counts are one grouped pass; the rank
    check joins the ≤ |flags| medians back for a second grouped pass
    — verification-harness cost, not the production sketch path
    (which is the first aggregate alone)."""
    l = _t(spark, sf_dir, "lineitem")
    cents = (F.col("l_extendedprice").cast("decimal(18,2)") * 100) \
        .cast("bigint")
    base = l.select("l_returnflag", "l_orderkey", cents.alias("cents"))
    ap = base.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("a_cd"),
        F.percentile_approx("cents", F.lit(0.5),
                            F.lit(SKETCH_PCT_ACC)).alias("a_med"),
        F.countDistinct("l_orderkey").alias("exact_orders"),
        F.count(F.lit(1)).alias("n_rows"))
    ranks = (base.join(ap.select("l_returnflag", "a_med"),
                       "l_returnflag")
             .groupBy("l_returnflag")
             .agg(F.sum(F.when(F.col("cents") <= F.col("a_med"), 1)
                        .otherwise(0)).alias("cle"),
                  F.sum(F.when(F.col("cents") < F.col("a_med"), 1)
                        .otherwise(0)).alias("clt")))
    half = SKETCH_PCT_ACC // 2
    return (ap.join(ranks, "l_returnflag")
            .select(
                "l_returnflag", "n_rows", "exact_orders",
                (F.abs(F.col("a_cd") - F.col("exact_orders")) * 10_000
                 <= F.col("exact_orders") * SKETCH_CD_TOL_BP)
                .alias("orders_ok"),
                ((F.col("cle") * SKETCH_PCT_ACC
                  >= F.col("n_rows") * (half - SKETCH_PCT_TOL))
                 & (F.col("clt") * SKETCH_PCT_ACC
                    <= F.col("n_rows") * (half + SKETCH_PCT_TOL)))
                .alias("median_ok"))
            .orderBy("l_returnflag"))


SQL_APPROX_SKETCHES = """
SELECT l_returnflag,
       COUNT(*) AS n_rows,
       COUNT(DISTINCT l_orderkey) AS exact_orders,
       TRUE AS orders_ok,
       TRUE AS median_ok
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


# ------------------------------------------- deterministic sketches -

KMV_K = 256
_H48 = 2 ** 48          # 12 hex digits of md5 as an integer
KMV_SAMPLE_THRESH = 2 ** 45  # 1/8 hash-sample for the median sketch


def q_kmv_sketch(spark, sf_dir):
    """Oracle-checkable sketch twin of ``approx_sketches``: both
    estimators are *deterministic functions of md5*, so Spark and
    DuckDB produce bit-identical doubles —

    - KMV distinct count: the K smallest distinct 48-bit hashes per
      group; estimate (K-1)·2^48 / h_(K) (the classic k-minimum-values
      estimator). Exact when a group has < K distinct keys.
    - hash-sampled median: rank-based (no interpolation arithmetic)
      median of a 1/8 deterministic hash sample.

    The production form at 100 TB is ``approx_sketches`` (HLL/GK are
    one-pass, mergeable, bounded-memory); this query pins the sketch
    *pattern* against the oracle, and its estimates are themselves
    tolerance-tested against exact values in tests/test_sketches.py.
    Scale shapes (round 7): the K smallest hashes come from the
    bucket-pyramid top-k (operators/sketches.k_smallest — only one
    4096th of each group's hash space is ever sorted, vs the old
    row_number window funneling every distinct hash of a 3-value
    group through one task), and the sampled median is read off the
    cum_below prefix pyramid instead of a per-flag rank window over
    the whole 1/8 sample."""
    from .operators.sketches import k_smallest
    from .registry_ext10 import cum_below
    l = _t(spark, sf_dir, "lineitem")
    h = F.conv(F.substring(F.md5(F.col("l_orderkey").cast("string")),
                           1, 12), 16, 10).cast("bigint")
    # localCheckpoint: k_smallest consumes its input twice (bucket
    # counts + the rank join) — without the barrier the md5 scan +
    # distinct shuffle execute per consumer.  LAZY (r15, VERDICT
    # item 4): both consumers sit inside the single final action, so
    # blocks persist at first touch there; the r14 eager form paid a
    # blocking materialization job that cost more than the saved
    # re-scan at bench scale (driver 2.8 → 3.7 s) while the plan's
    # scan-reduction (lineitem 7× → 2×) is retained unchanged.
    dist = (l.select("l_returnflag", h.alias("h")).distinct()
            .localCheckpoint(eager=False))
    topk = k_smallest(dist, ["l_returnflag"], "h", KMV_K)
    kmv = (topk.groupBy("l_returnflag")
           .agg(F.max("h").alias("hk"), F.count(F.lit(1)).alias("k"))
           .select("l_returnflag",
                   F.when(F.col("k") < KMV_K, F.col("k").cast("double"))
                   .otherwise(F.lit(float(KMV_K - 1)) * F.lit(float(_H48))
                              / F.col("hk"))
                   .alias("kmv_distinct")))
    hs = F.conv(F.substring(F.md5(F.concat_ws(
        "-", F.col("l_orderkey").cast("string"),
        F.col("l_linenumber").cast("string"))), 1, 12), 16, 10) \
        .cast("bigint")
    # localCheckpoint: the sample feeds the per-flag count AND the
    # cum_below pyramid (which derives three tables from it) — the
    # md5 sample filter re-ran per consumer.  Lazy: see `dist`.
    samp = (l.filter(hs < KMV_SAMPLE_THRESH).select(
        "l_returnflag",
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("bigint").alias("cents"))
        .localCheckpoint(eager=False))
    # median VALUE at rank ceil(n/2) is tie-break-free: the smallest
    # cents value whose cumulative count reaches the rank — read off
    # the prefix pyramid (every window partition ≤1024 rows) instead
    # of ranking the whole per-flag sample in one task
    n_g = samp.groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n"))
    cum = cum_below(samp, "cents", by=("l_returnflag",))
    med = (cum.join(F.broadcast(n_g), "l_returnflag")
           .filter(F.col("cum_lt") + F.col("c")
                   >= F.ceil(F.col("n") / 2))
           .groupBy("l_returnflag")
           .agg(F.min("v").alias("mc"))
           .select("l_returnflag",
                   (F.col("mc") / 100).cast("double")
                   .alias("sampled_median")))
    return kmv.join(med, "l_returnflag")


SQL_KMV_SKETCH = f"""
WITH d AS (
  SELECT DISTINCT l_returnflag,
         CAST('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 12)
              AS BIGINT) AS h
  FROM lineitem),
r AS (SELECT l_returnflag, h,
             ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY h) AS rn
      FROM d),
kmv AS (SELECT l_returnflag, MAX(h) AS hk, COUNT(*) AS k
        FROM r WHERE rn <= {KMV_K} GROUP BY l_returnflag),
kv AS (SELECT l_returnflag,
              CASE WHEN k < {KMV_K} THEN CAST(k AS DOUBLE)
                   ELSE CAST({KMV_K - 1} AS DOUBLE) * CAST({_H48} AS DOUBLE)
                        / hk END AS kmv_distinct
       FROM kmv),
s AS (SELECT l_returnflag, CAST(l_extendedprice AS DECIMAL(18,2)) AS price,
             l_orderkey, l_linenumber
      FROM lineitem
      WHERE CAST('0x' || substr(md5(concat_ws('-',
                  CAST(l_orderkey AS VARCHAR),
                  CAST(l_linenumber AS VARCHAR))), 1, 12) AS BIGINT)
            < {KMV_SAMPLE_THRESH}),
m AS (SELECT l_returnflag, CAST(price AS DOUBLE) AS sampled_median
      FROM (SELECT l_returnflag, price,
                   ROW_NUMBER() OVER (PARTITION BY l_returnflag
                       ORDER BY price, l_orderkey, l_linenumber) AS rn,
                   COUNT(*) OVER (PARTITION BY l_returnflag) AS n
            FROM s)
      WHERE rn = CAST(CEIL(n / 2.0) AS BIGINT))
SELECT kv.l_returnflag, kv.kmv_distinct, m.sampled_median
FROM kv JOIN m ON kv.l_returnflag = m.l_returnflag
"""


def q_src_chipmunk(spark, sf_dir):
    """S1 as a Spark 4 Python DataSource: chip-grain partitions with
    (cx, cy) filter pushdown. Output: per-chip acquisition counts."""
    from .session import ensure_worker_imports
    from .sources.chipmunk import ChipmunkDataSource
    ensure_worker_imports(spark)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(ChipmunkDataSource)
    df = (spark.read.format("chipmunk")
          .options(nx=2, ny=2, side=10, n_acq=20).load())
    return (df.groupBy("cx", "cy", "ubid")
            .agg(F.count(F.lit(1)).alias("n_acq"))
            .orderBy("cx", "cy", "ubid"))


def _sql_src_chipmunk() -> str:
    """Oracle for ``q_src_chipmunk``: the source's key space and
    per-(chip, ubid) acquisition counts are a deterministic function
    of the grid options (2×2 chips at 3 km pitch from the fixture
    origin, 8 ubids, 20 acquisitions each) — raster VALUES are
    RNG-synthesized and stay pinned by tests instead. This checks the
    partition/grid/pushdown plumbing delivers exactly one row per
    (chip, ubid, acquisition)."""
    from .sources.fixtures import UBID_BANDS
    ubids = ", ".join(f"('{u}')" for u in sorted(UBID_BANDS))
    return f"""
WITH ij AS (SELECT a.i AS i, b.j AS j
            FROM range(2) a(i), range(2) b(j)),
u AS (SELECT * FROM (VALUES {ubids}) t(ubid))
SELECT CAST(-2061585 + i * 3000 AS BIGINT) AS cx,
       CAST(1922805 - j * 3000 AS BIGINT) AS cy,
       ubid, CAST(20 AS BIGINT) AS n_acq
FROM ij, u
ORDER BY cx, cy, ubid
"""


def q_mm_extract_features(spark, sf_dir):
    """Multimodal decode→feature plumbing over binary payloads.
    FULLY ORACLE-CHECKED (round 11): the deterministic fake decoder
    is sha256-derived and DuckDB has sha256 — the 16-slot pooled
    means over the (digest × 8) pseudo-raster reduce to the two
    half-digest byte means interleaved, all dyadic (exact in
    float32), so the whole Arrow decode/pool path hash-matches
    (_sql_mm_features).  Real codecs ride the same plumbing with
    decoder= (library_decoder)."""
    from .llm.multimodal import attach_payloads, extract_features
    docs = _t(spark, sf_dir, "documents")
    media = attach_payloads(docs.filter(F.col("doc_id") < 120))
    return extract_features(media, n_features=16)


def q_mm_resize(spark, sf_dir):
    """Raster resize plumbing: decode → area-downsample to 8×8.
    FULLY ORACLE-CHECKED (round 11): on the 16×16 sha-raster every
    2×2 block mean is a four-byte dyadic mean of digest bytes —
    closed-form in SQL (_sql_mm_resize)."""
    from .llm.multimodal import attach_payloads, resize_images
    docs = _t(spark, sf_dir, "documents")
    media = attach_payloads(docs.filter(F.col("doc_id") < 120))
    return resize_images(media, out_h=8, out_w=8)


_MM_BYTES = ("list_transform(generate_series(0, 31), "
             "i -> CAST('0x' || substr(hx, 2*i + 1, 2) AS INT))")


def _sql_mm_features() -> str:
    """DuckDB replay of fake_decoder + extract_features(16): the
    pseudo-raster is the sha256 digest repeated 8× (256 bytes);
    pooled slot j means CONSECUTIVE bytes 16j..16j+15, i.e. the
    first half-digest mean when j is even, the second when odd."""
    return f"""
WITH m AS (
  SELECT doc_id AS media_id,
         ['image', 'audio', 'video'][CAST(doc_id % 3 AS INT) + 1]
           AS kind,
         octet_length(encode(text)) AS n_bytes,
         sha256(text) AS hx
  FROM documents WHERE doc_id < 120),
b AS (SELECT *, {_MM_BYTES} AS bytes FROM m),
ab AS (SELECT *,
              CAST(list_sum(bytes[1:16]) AS DOUBLE) / 16 AS a,
              CAST(list_sum(bytes[17:32]) AS DOUBLE) / 16 AS bb
       FROM b)
SELECT media_id, kind, CAST(n_bytes AS INT) AS n_bytes,
       list_transform(generate_series(1, 16),
         j -> CAST(CASE WHEN j % 2 = 1 THEN a ELSE bb END AS FLOAT))
         AS feat
FROM ab
"""


def _sql_mm_resize() -> str:
    """DuckDB replay of fake_decoder + resize_images(8, 8): raster
    cell (y, x) is digest byte 16·(y mod 2) + x, so the 2×2 block
    mean at (r, c) is (h[2c] + h[2c+1] + h[16+2c] + h[16+2c+1]) / 4 —
    the same 8 values for every output row."""
    return f"""
WITH m AS (
  SELECT doc_id AS media_id,
         ['image', 'audio', 'video'][CAST(doc_id % 3 AS INT) + 1]
           AS kind,
         sha256(text) AS hx
  FROM documents WHERE doc_id < 120 AND doc_id % 3 <> 1),
b AS (SELECT *, {_MM_BYTES} AS bytes FROM m),
rowvals AS (
  SELECT media_id, kind,
         list_transform(generate_series(0, 7),
           c -> CAST((bytes[2*c + 1] + bytes[2*c + 2]
                      + bytes[16 + 2*c + 1] + bytes[16 + 2*c + 2])
                     AS DOUBLE) / 4) AS rw
  FROM b)
SELECT media_id, kind, CAST(8 AS INT) AS h, CAST(8 AS INT) AS w,
       flatten(list_transform(generate_series(1, 8),
         r -> list_transform(rw, v -> CAST(v AS FLOAT)))) AS pixels
FROM rowvals
"""


def q_mm_frame_sample(spark, sf_dir):
    """Video frame-sampling plumbing: one row per sampled frame.
    FULLY ORACLE-CHECKED (round 12): the per-frame fake-decode input
    is now ``payload || '|f{i}'`` (a PRINTABLE suffix — the old raw
    4-byte big-endian counter was the one thing DuckDB's
    VARCHAR-only sha256 could not take), so the whole
    sample-enumeration + per-frame feature path replays in SQL
    (_sql_mm_frame_sample).  Real MP4 payloads ride the metadata/
    real-decode branches instead, pinned by the golden codec tests."""
    from .llm.multimodal import attach_payloads, frame_sample
    docs = _t(spark, sf_dir, "documents")
    media = attach_payloads(docs.filter(F.col("doc_id") < 120))
    return frame_sample(media)


def _sql_mm_frame_sample() -> str:
    """DuckDB replay of frame_sample over non-MP4 payloads: videos
    (doc_id % 3 = 2) sample max(1, n_bytes // 100) frames; frame i's
    feature is the 16 column means of fake_decoder(payload||'|f'||i)
    — column x of the sha-raster holds bytes x and 16+x, so the mean
    is their dyadic average (exact in float32)."""
    return """
WITH m AS (
  SELECT doc_id AS media_id, text,
         octet_length(encode(text)) AS n_bytes
  FROM documents WHERE doc_id < 120 AND doc_id % 3 = 2),
frames AS (
  SELECT media_id,
         CAST(UNNEST(range(greatest(n_bytes // 100, 1))) AS INT)
           AS frame_idx,
         text
  FROM m),
hx AS (
  SELECT media_id, frame_idx,
         sha256(text || '|f' || frame_idx) AS h
  FROM frames)
SELECT media_id, frame_idx,
       list_transform(generate_series(0, 15),
         x -> CAST((CAST('0x' || substr(h, 2*x + 1, 2) AS INT)
                    + CAST('0x' || substr(h, 2*(x+16) + 1, 2) AS INT))
                   / 2.0 AS FLOAT)) AS feat
FROM hx ORDER BY media_id, frame_idx
"""


def _sql_minhash_pipeline() -> str:
    from .registry_llm import SQL_MINHASH_PAIRS
    return SQL_MINHASH_PAIRS


CURATE_TOK_MIN = 30
CURATE_TOK_MAX = 100


def _curation_stages(spark, sf_dir, q, staging_key):
    """Quality frame → (repd, clean): the MinHash-dedup and
    5-gram-decontam stages shared by llm_curation and
    llm_curation_lines (the latter feeds the line-rewritten corpus
    through the identical machinery)."""
    from pyspark.sql import Window

    from .llm.dedup import dedup_components, minhash_pairs_staged, shingles
    from .registry import _staging
    pairs = minhash_pairs_staged(q, _staging(sf_dir, staging_key),
                                 threshold=0.2)
    comp = dedup_components(pairs, q.select("doc_id"))
    sized = comp.join(q.select("doc_id", "n_chars"), "doc_id")
    w = Window.partitionBy("component").orderBy(F.desc("n_chars"), "doc_id")
    # localCheckpoint: rep_ids is consumed by THREE downstream
    # branches (the dedup funnel row, the decontam gram explode, and
    # the final anti-join) — without it Catalyst re-runs the
    # component-sizing join + window once per consumer.  The table is
    # one id per surviving doc, so the checkpoint is corpus-count
    # sized, not corpus-bytes sized.  (Timing-neutral at sf0.1 where
    # the window costs ~0.3 s — this is a 100 TB-shape fix, measured
    # and kept honest, not a local win.)
    rep_ids = (sized.select("doc_id", F.row_number().over(w).alias("rn"))
               .filter(F.col("rn") == 1).select("doc_id")
               # lazy (r15): all three consumers sit inside the
               # caller's final action — no blocking job needed
               .localCheckpoint(eager=False))
    repd = q.join(rep_ids, "doc_id")

    corpus = repd.filter(F.col("source") != "src0")
    bench = (q.filter(F.col("source") == "src0")
             .select(F.explode(shingles("text", 5)).alias("g")).distinct())
    cont = (corpus.select("doc_id", F.explode(shingles("text", 5)).alias("g"))
            .join(F.broadcast(bench), "g").select("doc_id").distinct())
    clean = corpus.join(cont, "doc_id", "left_anti")
    return repd, clean


def q_llm_curation(spark, sf_dir):
    """END-TO-END corpus curation — the pipeline a pre-training data
    job actually runs, composed from this repo's own operators:

      1. quality cut: token count in [30, 100] (integer rule —
         the oracle-safe core of llm/text.quality_scores),
      2. near-dup dedup: MinHash LSH pairs (STAGED single-pass form,
         llm/dedup.minhash_pairs_staged, threshold 0.2) → pointer-
         jumping connected components → one representative per
         cluster (largest n_chars, then smallest id),
      3. decontamination: drop survivors sharing any word 5-gram
         with the 'src0' benchmark split (broadcast gram semi-join),
         benchmark docs themselves leave the corpus here.

    Emits the per-stage funnel (docs + tokens surviving) — the
    verifiable summary a curation run reports.  Every stage is
    integer-exact, so the WHOLE pipeline carries a composed DuckDB
    oracle (the dedup stage embeds the recursive-CTE components
    oracle re-pointed at the quality-filtered CTE)."""
    d = _t(spark, sf_dir, "documents")
    ntok = F.size(F.split(F.lower(F.trim("text")), " "))
    q = (d.withColumn("n_tok", ntok.cast("bigint"))
         .filter(ntok.between(CURATE_TOK_MIN, CURATE_TOK_MAX)))

    repd, clean = _curation_stages(spark, sf_dir, q, "curation_minhash")

    def stage(i, name, df):
        return df.agg(F.lit(i).alias("stage_id"),
                      F.lit(name).alias("stage"),
                      F.count(F.lit(1)).alias("n_docs"),
                      F.sum(F.size(F.split(F.lower(F.trim("text")), " "))
                            .cast("bigint")).alias("n_tokens"))

    return (stage(1, "start", d)
            .unionByName(stage(2, "quality", q.drop("n_tok")))
            .unionByName(stage(3, "dedup", repd))
            .unionByName(stage(4, "decontam", clean))
            .orderBy("stage_id"))


def _sql_llm_curation() -> str:
    from .registry_llm2 import sql_dedup_groups
    groups = sql_dedup_groups().replace("FROM documents", "FROM qdocs")
    gram5 = ("UNNEST(list_transform(generate_series(1, len(ws) - 4), "
             "i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' "
             "|| ws[i+3] || ' ' || ws[i+4]))")
    tok = "len(string_split(lower(trim(text)), ' '))"
    return f"""
WITH qdocs AS (
  SELECT * FROM documents
  WHERE {tok} BETWEEN {CURATE_TOK_MIN} AND {CURATE_TOK_MAX}),
comp AS (SELECT * FROM ({groups}) g),
reps AS (
  SELECT c.doc_id,
         ROW_NUMBER() OVER (PARTITION BY c.component
                            ORDER BY d.n_chars DESC, c.doc_id) AS rn
  FROM comp c JOIN qdocs d USING (doc_id)),
repd AS (SELECT d.* FROM qdocs d
         JOIN reps r ON r.doc_id = d.doc_id AND r.rn = 1),
corpus AS (SELECT * FROM repd WHERE source <> 'src0'),
bench AS (
  SELECT DISTINCT {gram5} AS g
  FROM (SELECT string_split(lower(trim(text)), ' ') AS ws
        FROM qdocs WHERE source = 'src0')),
cont AS (
  SELECT DISTINCT doc_id
  FROM (SELECT doc_id, {gram5} AS g
        FROM (SELECT doc_id, string_split(lower(trim(text)), ' ') AS ws
              FROM corpus)) cg
  JOIN bench USING (g)),
clean AS (SELECT * FROM corpus
          WHERE doc_id NOT IN (SELECT doc_id FROM cont))
SELECT 1 AS stage_id, 'start' AS stage, COUNT(*) AS n_docs,
       CAST(SUM({tok}) AS BIGINT) AS n_tokens FROM documents
UNION ALL SELECT 2, 'quality', COUNT(*), CAST(SUM({tok}) AS BIGINT)
FROM qdocs
UNION ALL SELECT 3, 'dedup', COUNT(*), CAST(SUM({tok}) AS BIGINT)
FROM repd
UNION ALL SELECT 4, 'decontam', COUNT(*), CAST(SUM({tok}) AS BIGINT)
FROM clean
ORDER BY stage_id
"""


def q_llm_curation_lines(spark, sf_dir):
    """END-TO-END curation with the LINE-LEVEL boilerplate rewrite
    as the funnel's FIRST stage — the batch twin of
    ``curation_stream(line_store_dir=…)`` and the C4 ordering
    (cleaning precedes filtering, so quality/dedup/decontam all
    judge the CLEANED text): documents are rewritten through
    llm/dedup.line_dedup_rewrite (segments occurring ≥ LINE_MAXOCC
    times excised, survivors reassembled), fully-boilerplate docs
    drop, and the surviving corpus runs through the IDENTICAL
    quality → MinHash-dedup → decontam machinery as llm_curation
    (_curation_stages — shared code, separate staging key).
    Representative choice still orders by the ORIGINAL n_chars
    column (document identity, not post-rewrite size).  Every stage
    stays integer/string-exact, so the whole five-stage funnel
    carries one composed DuckDB oracle."""
    from .llm.dedup import line_dedup_rewrite

    d = _t(spark, sf_dir, "documents")
    rew = line_dedup_rewrite(d)
    # localCheckpoint: the rewritten corpus feeds EVERY downstream
    # consumer (the linededup funnel row, the quality filter, and —
    # through q — the signature hash, rep join, bench grams, and
    # three more stage metrics); without it the segment-count
    # groupBy + reassembly re-run once per consumer (measured 11.4 s
    # → 8.5 s solo median at sf0.1)
    cdocs = (d.drop("text")
             .join(rew.filter(F.col("n_kept") > 0)
                   .select("doc_id", F.col("cleaned").alias("text")),
                   # lazy (r15): materializes under the staged
                   # minhash write — the first action that reads it
                   "doc_id").localCheckpoint(eager=False))
    ntok = F.size(F.split(F.lower(F.trim("text")), " "))
    q = cdocs.filter(ntok.between(CURATE_TOK_MIN, CURATE_TOK_MAX))

    repd, clean = _curation_stages(spark, sf_dir, q,
                                   "curation_lines_minhash")

    def stage(i, name, df):
        return df.agg(F.lit(i).alias("stage_id"),
                      F.lit(name).alias("stage"),
                      F.count(F.lit(1)).alias("n_docs"),
                      F.sum(F.size(F.split(F.lower(F.trim("text")), " "))
                            .cast("bigint")).alias("n_tokens"))

    return (stage(1, "start", d)
            .unionByName(stage(2, "linededup", cdocs))
            .unionByName(stage(3, "quality", q))
            .unionByName(stage(4, "dedup", repd))
            .unionByName(stage(5, "decontam", clean))
            .orderBy("stage_id"))


def _sql_llm_curation_lines() -> str:
    from .llm.dedup import LINE_MAXOCC, LINE_W
    from .registry_llm2 import sql_dedup_groups
    groups = sql_dedup_groups().replace("FROM documents", "FROM qdocs")
    gram5 = ("UNNEST(list_transform(generate_series(1, len(ws) - 4), "
             "i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' "
             "|| ws[i+3] || ' ' || ws[i+4]))")
    tok = "len(string_split(lower(trim(text)), ' '))"
    return f"""
WITH toks0 AS (
  SELECT doc_id, string_split(lower(trim(text)), ' ') AS toks
  FROM documents),
segb AS (
  SELECT doc_id, toks,
         CAST((len(toks) + {LINE_W - 1}) // {LINE_W} AS BIGINT)
           AS n_segs
  FROM toks0),
segs AS (
  SELECT doc_id, n_segs, i,
         array_to_string(
           toks[(i * {LINE_W} + 1):(i * {LINE_W} + {LINE_W})],
           ' ') AS seg
  FROM segb, LATERAL (SELECT unnest(range(n_segs)) AS i) u),
segc AS (SELECT seg, COUNT(*) AS occ FROM segs GROUP BY seg),
segk AS (
  SELECT s.doc_id, s.i, s.seg
  FROM segs s JOIN segc USING (seg) WHERE segc.occ < {LINE_MAXOCC}),
segr AS (
  SELECT doc_id, string_agg(seg, ' ' ORDER BY i) AS cleaned
  FROM segk GROUP BY doc_id),
cdocs AS (
  -- inner join = docs with ≥1 surviving segment (n_kept > 0)
  SELECT d.doc_id, r.cleaned AS text, d.lang, d.source, d.n_chars
  FROM documents d JOIN segr r USING (doc_id)),
qdocs AS (
  SELECT * FROM cdocs
  WHERE {tok} BETWEEN {CURATE_TOK_MIN} AND {CURATE_TOK_MAX}),
comp AS (SELECT * FROM ({groups}) g),
reps AS (
  SELECT c.doc_id,
         ROW_NUMBER() OVER (PARTITION BY c.component
                            ORDER BY d.n_chars DESC, c.doc_id) AS rn
  FROM comp c JOIN qdocs d USING (doc_id)),
repd AS (SELECT d.* FROM qdocs d
         JOIN reps r ON r.doc_id = d.doc_id AND r.rn = 1),
corpus AS (SELECT * FROM repd WHERE source <> 'src0'),
bench AS (
  SELECT DISTINCT {gram5} AS g
  FROM (SELECT string_split(lower(trim(text)), ' ') AS ws
        FROM qdocs WHERE source = 'src0')),
cont AS (
  SELECT DISTINCT doc_id
  FROM (SELECT doc_id, {gram5} AS g
        FROM (SELECT doc_id, string_split(lower(trim(text)), ' ') AS ws
              FROM corpus)) cg
  JOIN bench USING (g)),
clean AS (SELECT * FROM corpus
          WHERE doc_id NOT IN (SELECT doc_id FROM cont))
SELECT 1 AS stage_id, 'start' AS stage, COUNT(*) AS n_docs,
       CAST(SUM({tok}) AS BIGINT) AS n_tokens FROM documents
UNION ALL SELECT 2, 'linededup', COUNT(*), CAST(SUM({tok}) AS BIGINT)
FROM cdocs
UNION ALL SELECT 3, 'quality', COUNT(*), CAST(SUM({tok}) AS BIGINT)
FROM qdocs
UNION ALL SELECT 4, 'dedup', COUNT(*), CAST(SUM({tok}) AS BIGINT)
FROM repd
UNION ALL SELECT 5, 'decontam', COUNT(*), CAST(SUM({tok}) AS BIGINT)
FROM clean
ORDER BY stage_id
"""


QUERIES_PIPELINES: dict[str, dict] = {
    "llm_curation":         {"fn": q_llm_curation,
                             "sql": _sql_llm_curation()},
    "llm_curation_lines":   {"fn": q_llm_curation_lines,
                             "sql": _sql_llm_curation_lines()},
    "lcmap_segment_detect": {"fn": q_lcmap_segment_detect,
                             "sql": _sql_segment_detect()},
    "lcmap_detect_chip":    {"fn": q_lcmap_detect_chip,
                             "sql": _sql_segment_detect(side=100)},
    "lcmap_tile_train":     {"fn": q_lcmap_tile_train,
                             "sql": _sql_tile_train()},
    "lcmap_predict_chip":   {"fn": q_lcmap_predict_chip,
                             "sql": _sql_predict_chip()},
    "llm_minhash_pipeline": {"fn": q_llm_minhash_pipeline,
                             "sql": _sql_minhash_pipeline()},
    "lcmap_prediction":     {"fn": q_lcmap_prediction,
                             "sql": _sql_predict_chip(side=8)},
    "llm_ann_topk":         {"fn": q_llm_ann_topk,         "sql": _sql_ann_topk()},
    "llm_ann_ivf":          {"fn": q_llm_ann_ivf,          "sql": None},
    "src_chipmunk":         {"fn": q_src_chipmunk,
                             "sql": _sql_src_chipmunk()},
    "approx_sketches":      {"fn": q_approx_sketches,
                             "sql": SQL_APPROX_SKETCHES},
    "kmv_sketch":           {"fn": q_kmv_sketch,           "sql": SQL_KMV_SKETCH},
    "mm_extract_features":  {"fn": q_mm_extract_features,
                             "sql": _sql_mm_features()},
    "mm_resize":            {"fn": q_mm_resize,
                             "sql": _sql_mm_resize()},
    "mm_frame_sample":      {"fn": q_mm_frame_sample,
                             "sql": _sql_mm_frame_sample()},
}
