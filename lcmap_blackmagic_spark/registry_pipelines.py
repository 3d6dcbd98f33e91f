"""Rows-only registry entries: compositions whose core is a pandas-UDF
or ML boundary (UD1 detect, UD2 train, UD3 predict, multimodal decode,
LSH ANN). No SQL oracle exists for these — the driver records the
weaker rows-only check; correctness is pinned by the golden tests in
tests/test_pipelines.py instead.

All inputs are deterministic (seeded synthetic fixtures or the
provided tables), so row counts and schemas are stable across runs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import _t


def q_lcmap_segment_detect(spark, sf_dir):
    """UD1: raster → time-series assembly → per-pixel detection
    (stub detector) → 38-col segments (plans/segment.py)."""
    from .plans.segment import segment_pipeline
    from .sources.fixtures import synth_ard
    ard = synth_ard(spark, side=10, seed=7)
    return segment_pipeline(ard, side=10).select(
        "cx", "cy", "px", "py", "sday", "eday", "curqa")


def q_lcmap_prediction(spark, sf_dir):
    """UD2+UD3: train (fallback classifier) then batch-predict with
    defaults routing — the full /prediction composition."""
    from .plans.prediction import prediction_pipeline
    from .plans.tile import tile_pipeline
    from .sources.fixtures import synth_aux, synth_segments
    segs = synth_segments(spark, side=8)
    aux = synth_aux(spark, side=8)
    model, _ = tile_pipeline(segs, aux, "2001-07-01", target_samples=200,
                             class_min=5, class_max=40)
    preds = prediction_pipeline(segs, aux, model, 7, 1)
    return preds.select("cx", "cy", "px", "py", "sday", "eday", "pday",
                        F.size("prob").alias("n_probs"))


def q_llm_ann_topk(spark, sf_dir):
    """LSH-bucketed approximate nearest neighbors (the scale path of
    llm_cosine_topk; recall < 1 by design, candidates only)."""
    from .llm.similarity import lsh_ann_topk
    e = _t(spark, sf_dir, "embeddings")
    return lsh_ann_topk(e, F.col("vec_id") % 50 == 0, k=5)


def q_llm_ann_ivf(spark, sf_dir):
    """IVF approximate nearest neighbors (k-means cells, n_probe
    probing) — the partition-pruned scale path; recall < 1 by design."""
    from .llm.similarity import ivf_ann_topk
    e = _t(spark, sf_dir, "embeddings")
    return ivf_ann_topk(e, F.col("vec_id") % 50 == 0, k=5)


def q_approx_sketches(spark, sf_dir):
    """Sketch aggregates — the 100 TB substitute for exact distinct
    counts and exact percentiles (one pass, bounded memory, mergeable
    across partitions). Rows-only: HLL/GK sketch internals differ
    across engines, so no hash oracle exists; the tolerance contract
    is pinned by tests/test_sketches.py instead."""
    l = _t(spark, sf_dir, "lineitem")
    return (l.groupBy("l_returnflag")
            .agg(F.approx_count_distinct("l_orderkey", rsd=0.02)
                 .alias("approx_orders"),
                 F.percentile_approx("l_extendedprice", F.lit(0.5),
                                     F.lit(10000)).alias("approx_median"),
                 F.count(F.lit(1)).alias("n_rows"))
            .orderBy("l_returnflag"))


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


def q_mm_extract_features(spark, sf_dir):
    """Multimodal decode→feature plumbing over binary payloads
    (deterministic fake decoder; real codecs are a marked stub)."""
    from .llm.multimodal import attach_payloads, extract_features
    docs = _t(spark, sf_dir, "documents")
    media = attach_payloads(docs.filter(F.col("doc_id") < 120))
    return extract_features(media, n_features=16)


def q_mm_resize(spark, sf_dir):
    """Raster resize plumbing: decode → area-downsample to 8×8."""
    from .llm.multimodal import attach_payloads, resize_images
    docs = _t(spark, sf_dir, "documents")
    media = attach_payloads(docs.filter(F.col("doc_id") < 120))
    return resize_images(media, out_h=8, out_w=8)


def q_mm_frame_sample(spark, sf_dir):
    """Video frame-sampling plumbing: one row per sampled frame."""
    from .llm.multimodal import attach_payloads, frame_sample
    docs = _t(spark, sf_dir, "documents")
    media = attach_payloads(docs.filter(F.col("doc_id") < 120))
    return frame_sample(media)


QUERIES_PIPELINES: dict[str, dict] = {
    "lcmap_segment_detect": {"fn": q_lcmap_segment_detect, "sql": None},
    "lcmap_prediction":     {"fn": q_lcmap_prediction,     "sql": None},
    "llm_ann_topk":         {"fn": q_llm_ann_topk,         "sql": None},
    "llm_ann_ivf":          {"fn": q_llm_ann_ivf,          "sql": None},
    "src_chipmunk":         {"fn": q_src_chipmunk,         "sql": None},
    "approx_sketches":      {"fn": q_approx_sketches,      "sql": None},
    "mm_extract_features":  {"fn": q_mm_extract_features,  "sql": None},
    "mm_resize":            {"fn": q_mm_resize,            "sql": None},
    "mm_frame_sample":      {"fn": q_mm_frame_sample,      "sql": None},
}
