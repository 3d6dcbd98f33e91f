"""Streaming winnowing ingest dedup: flags must exactly equal the
shared batch operator (winnow_cross_flags) applied per batch against
base store ∪ strictly earlier batches, the store must accumulate,
and crash-replay of a micro-batch must be byte-idempotent."""

import os
import tempfile

from pyspark.sql import functions as F

from lcmap_blackmagic_spark.llm.dedup import (winnow_cross_flags,
                                              winnow_fingerprints)
from lcmap_blackmagic_spark.streaming.jobs import (documents_stream,
                                                   winnow_dedup_batch,
                                                   winnow_dedup_stream)


def _flags(spark, out_dir):
    return {(r["incoming_id"], r["n_partners"], r["max_shared"],
             r["canonical_partner"], r["batch_id"])
            for r in spark.read.parquet(out_dir).collect()}


def test_winnow_dedup_stream_matches_batch_fold(spark, sf_dir):
    """3 micro-batches with update_store=True: each batch's flags
    must equal winnow_cross_flags(batch, base ∪ earlier batches) —
    a duplicate arriving two triggers after its partner is caught,
    and a batch is never compared against itself."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base_dir = tempfile.mkdtemp(prefix="winnow_stream_")
    docs_dir = os.path.join(base_dir, "incoming")
    store_dir = os.path.join(base_dir, "store")
    out_dir = os.path.join(base_dir, "flags")
    ckpt = os.path.join(base_dir, "ckpt")

    existing = docs.filter(F.col("source") != "src1")
    winnow_fingerprints(existing).write.mode("overwrite") \
        .parquet(store_dir)
    incoming = docs.filter(F.col("source") == "src1")
    splits = [incoming.filter(F.col("doc_id") % 3 == i)
              for i in range(3)]
    for part in splits:
        part.coalesce(1).write.mode("append").parquet(docs_dir)

    q = (winnow_dedup_stream(documents_stream(spark, docs_dir),
                             store_dir, out_dir)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(180)

    got = {(r["incoming_id"], r["n_partners"], r["max_shared"],
            r["canonical_partner"])
           for r in spark.read.parquet(out_dir).collect()}

    # reference: fold batch-side in THE ORDER THE STREAM DELIVERED —
    # recovered EXACTLY from the persisted _updates partitions (every
    # batch writes its fingerprints there, flags or not; the earlier
    # flags-based recovery guessed wrong on zero-flag batches)
    updates = spark.read.parquet(store_dir + "_updates")
    base_fps = winnow_fingerprints(existing)
    want = set()
    done_fps = base_fps
    bids = sorted(r["batch_id"] for r in
                  updates.select("batch_id").distinct().collect())
    for bid in bids:
        inc_fps = (updates.filter(F.col("batch_id") == bid)
                   .drop("batch_id"))
        for r in winnow_cross_flags(inc_fps, done_fps).collect():
            want.add((r["incoming_id"], r["n_partners"],
                      r["max_shared"], r["canonical_partner"]))
        done_fps = done_fps.unionByName(inc_fps)
    assert got == want and got


def test_winnow_dedup_batch_replay_is_idempotent(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base_dir = tempfile.mkdtemp(prefix="winnow_replay_")
    store_dir = os.path.join(base_dir, "store")
    out_dir = os.path.join(base_dir, "flags")
    existing = docs.filter(F.col("source") != "src1")
    winnow_fingerprints(existing).write.mode("overwrite") \
        .parquet(store_dir)
    batch = docs.filter(F.col("source") == "src1")

    def snapshot():
        upd = {(r["batch_id"], r["count"]) for r in
               spark.read.parquet(store_dir + "_updates")
               .groupBy("batch_id").count().collect()}
        return _flags(spark, out_dir), upd

    winnow_dedup_batch(batch, 7, store_dir, out_dir)
    first = snapshot()
    winnow_dedup_batch(batch, 7, store_dir, out_dir)
    assert snapshot() == first
    assert first[0]    # the fixture corpus does contain near-dups


def test_winnow_static_store_never_self_compares(spark, sf_dir):
    """update_store=False: two deliveries of the SAME batch under
    different batch ids must produce identical per-batch flags —
    the store never grew, so the second delivery cannot see the
    first."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base_dir = tempfile.mkdtemp(prefix="winnow_static_")
    store_dir = os.path.join(base_dir, "store")
    out_dir = os.path.join(base_dir, "flags")
    existing = docs.filter(F.col("source") != "src1")
    winnow_fingerprints(existing).write.mode("overwrite") \
        .parquet(store_dir)
    batch = docs.filter(F.col("source") == "src1")
    winnow_dedup_batch(batch, 1, store_dir, out_dir,
                       update_store=False)
    winnow_dedup_batch(batch, 2, store_dir, out_dir,
                       update_store=False)
    rows = spark.read.parquet(out_dir).collect()
    b1 = {(r["incoming_id"], r["n_partners"], r["max_shared"],
           r["canonical_partner"]) for r in rows if r["batch_id"] == 1}
    b2 = {(r["incoming_id"], r["n_partners"], r["max_shared"],
           r["canonical_partner"]) for r in rows if r["batch_id"] == 2}
    assert b1 == b2 and b1
