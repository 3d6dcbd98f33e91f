"""Streaming semantic ingest dedup: flags must exactly equal the
shared batch operator (semdedup_cross_flags) applied per batch
against base store ∪ strictly earlier batches (all against the SAME
frozen cells), the store must accumulate, and crash-replay of a
micro-batch must be byte-idempotent."""

import os
import tempfile

from pyspark.sql import functions as F

from lcmap_blackmagic_spark.llm.semdedup import (assign_cells,
                                                 quantize,
                                                 semdedup_cross_flags)
from lcmap_blackmagic_spark.streaming.jobs import (_load_centroids,
                                                   build_semdedup_store,
                                                   embeddings_stream,
                                                   semdedup_batch,
                                                   semdedup_stream)


def _flags(spark, out_dir):
    return {(r["incoming_id"], r["n_partners"], r["canonical_partner"],
             r["max_cos2_bp"], r["batch_id"])
            for r in spark.read.parquet(out_dir).collect()}


def test_semdedup_stream_matches_batch_fold(spark, sf_dir):
    """3 micro-batches with update_store=True: each batch's flags
    must equal semdedup_cross_flags(batch, base ∪ earlier batches) —
    a semantic duplicate arriving two triggers after its partner is
    caught, and a batch is never compared against itself."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    base_dir = tempfile.mkdtemp(prefix="semdedup_stream_")
    emb_dir = os.path.join(base_dir, "incoming")
    store_dir = os.path.join(base_dir, "store")
    out_dir = os.path.join(base_dir, "flags")
    ckpt = os.path.join(base_dir, "ckpt")

    existing = emb.filter(F.col("vec_id") % 5 != 0)
    build_semdedup_store(existing, store_dir)
    incoming = emb.filter(F.col("vec_id") % 5 == 0)
    for i in range(3):
        (incoming.filter(F.col("vec_id") % 3 == i)
         .coalesce(1).write.mode("append").parquet(emb_dir))

    q = (semdedup_stream(embeddings_stream(spark, emb_dir),
                         store_dir, out_dir)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(180)

    got = {(r["incoming_id"], r["n_partners"], r["canonical_partner"],
            r["max_cos2_bp"])
           for r in spark.read.parquet(out_dir).collect()}

    # reference: fold batch-side in THE ORDER THE STREAM DELIVERED —
    # recovered exactly from the persisted _updates partitions (the
    # winnow-stream test's recovery recipe)
    cents = _load_centroids(spark, store_dir)
    updates = spark.read.parquet(store_dir + "_updates")
    done = assign_cells(quantize(existing), cents)
    want = set()
    bids = sorted(r["batch_id"] for r in
                  updates.select("batch_id").distinct().collect())
    for bid in bids:
        inc = (updates.filter(F.col("batch_id") == bid)
               .drop("batch_id"))
        for r in semdedup_cross_flags(inc, done).collect():
            want.add((r["incoming_id"], r["n_partners"],
                      r["canonical_partner"], r["max_cos2_bp"]))
        done = done.unionByName(inc)
    assert got == want and got


def test_semdedup_batch_replay_is_idempotent(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    base_dir = tempfile.mkdtemp(prefix="semdedup_replay_")
    store_dir = os.path.join(base_dir, "store")
    out_dir = os.path.join(base_dir, "flags")
    existing = emb.filter(F.col("vec_id") % 5 != 0)
    build_semdedup_store(existing, store_dir)
    batch = emb.filter(F.col("vec_id") % 5 == 0)

    def snapshot():
        upd = {(r["batch_id"], r["count"]) for r in
               spark.read.parquet(store_dir + "_updates")
               .groupBy("batch_id").count().collect()}
        return _flags(spark, out_dir), upd

    semdedup_batch(batch, 0, store_dir, out_dir)
    first = snapshot()
    assert first[0]                      # semantic dups exist at τ=0.30
    semdedup_batch(batch, 0, store_dir, out_dir)   # crash-replay
    assert snapshot() == first


def test_semdedup_static_store_never_writes_updates(spark, sf_dir):
    """update_store=False: flags computed against the frozen base
    only; no _updates partition may appear (the static-store twin)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    base_dir = tempfile.mkdtemp(prefix="semdedup_static_")
    store_dir = os.path.join(base_dir, "store")
    out_dir = os.path.join(base_dir, "flags")
    existing = emb.filter(F.col("vec_id") % 5 != 0)
    build_semdedup_store(existing, store_dir)
    batch = emb.filter(F.col("vec_id") % 5 == 0)

    semdedup_batch(batch, 0, store_dir, out_dir, update_store=False)
    assert not os.path.exists(store_dir + "_updates")
    cents = _load_centroids(spark, store_dir)
    want = {(r["incoming_id"], r["n_partners"], r["canonical_partner"],
             r["max_cos2_bp"])
            for r in semdedup_cross_flags(
                assign_cells(quantize(batch), cents),
                spark.read.parquet(store_dir)).collect()}
    got = {(r["incoming_id"], r["n_partners"], r["canonical_partner"],
            r["max_cos2_bp"])
           for r in spark.read.parquet(out_dir).collect()}
    assert got == want and got
