"""Streaming DSIR scorer: per-batch scores against the frozen weight
store must exactly equal the batch operator over the same documents,
and crash-replay of a micro-batch must be byte-idempotent."""

import os
import tempfile

from pyspark.sql import functions as F

from lcmap_blackmagic_spark.llm.text import dsir_doc_scores
from lcmap_blackmagic_spark.streaming.jobs import (build_dsir_store,
                                                   documents_stream,
                                                   dsir_score_batch,
                                                   dsir_score_stream)


def _mk_store(spark, sf_dir, base_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    target = docs.filter(F.col("source") == "src0")
    raw = docs.filter(F.col("source") != "src0")
    store_dir = os.path.join(base_dir, "weights")
    build_dsir_store(target, raw, store_dir)
    return docs, raw, store_dir


def test_dsir_stream_scores_equal_batch(spark, sf_dir):
    base_dir = tempfile.mkdtemp(prefix="dsir_stream_")
    docs, raw, store_dir = _mk_store(spark, sf_dir, base_dir)
    docs_dir = os.path.join(base_dir, "incoming")
    out_dir = os.path.join(base_dir, "scores")
    ckpt = os.path.join(base_dir, "ckpt")
    incoming = docs.filter(F.col("source") == "src1")
    for i in range(3):
        incoming.filter(F.col("doc_id") % 3 == i) \
            .coalesce(1).write.mode("append").parquet(docs_dir)

    q = (dsir_score_stream(documents_stream(spark, docs_dir),
                           store_dir, out_dir)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(180)

    got = {(r["doc_id"], r["n_tok"], r["wsum"], r["score_bp"])
           for r in spark.read.parquet(out_dir).collect()}
    wtab = spark.read.parquet(store_dir)
    want = {(r["doc_id"], r["n_tok"], r["wsum"], r["score_bp"])
            for r in dsir_doc_scores(incoming, wtab).collect()}
    assert got == want and got


def test_dsir_batch_replay_is_idempotent(spark, sf_dir):
    base_dir = tempfile.mkdtemp(prefix="dsir_replay_")
    docs, raw, store_dir = _mk_store(spark, sf_dir, base_dir)
    out_dir = os.path.join(base_dir, "scores")
    batch = docs.filter(F.col("source") == "src1")

    def snap():
        return {tuple(r) for r in spark.read.parquet(out_dir)
                .select("doc_id", "n_tok", "wsum", "score_bp",
                        "batch_id").collect()}

    dsir_score_batch(batch, 5, store_dir, out_dir)
    first = snap()
    dsir_score_batch(batch, 5, store_dir, out_dir)
    assert snap() == first and first


def test_dsir_unseen_feature_scores_with_smoothing_default(spark):
    """A token whose hashed bucket NO frozen corpus populated must
    still score (add-one smoothing default), not silently vanish
    from n_tok — the weight table materializes all DSIR_B buckets.
    With equal corpus sizes the unseen-feature weight is exactly
    DSIR_SCALE (ratio 1): (1·(NR+B)·S) div (1·(NT+B)) with NT=NR."""
    from lcmap_blackmagic_spark.llm.text import (DSIR_B, DSIR_SCALE,
                                                 dsir_weights)

    target = spark.createDataFrame([(1, "alpha beta")],
                                   "doc_id long, text string")
    raw = spark.createDataFrame([(2, "gamma delta")],
                                "doc_id long, text string")
    wtab = dsir_weights(target, raw)
    assert wtab.count() == DSIR_B
    novel = spark.createDataFrame(
        [(9, "zzz9q8x7 zzz9q8x7w zzz9q8x7v")],
        "doc_id long, text string")
    out = dsir_doc_scores(novel, wtab).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_tok"] == 3            # nothing dropped
    # every novel bucket carries the neutral smoothing weight
    assert r["score_bp"] == DSIR_SCALE
