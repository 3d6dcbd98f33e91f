"""Streaming ANN serve (search-at-ingest) over the shared semantic
vector store: each micro-batch's top-k results must exactly equal
the shared ranking helper (ann_store_topk) applied per batch against
base store ∪ strictly earlier batches under the same frozen cells;
crash-replay must be byte-idempotent; the static-index twin must
never write updates."""

import os
import tempfile

from pyspark.sql import functions as F

from lcmap_blackmagic_spark.llm.semdedup import assign_cells, quantize
from lcmap_blackmagic_spark.llm.similarity import ann_store_topk
from lcmap_blackmagic_spark.streaming.jobs import (_load_centroids,
                                                   ann_serve_batch,
                                                   ann_serve_stream,
                                                   build_semdedup_store,
                                                   embeddings_stream)


def _hits(spark, out_dir, with_batch=True):
    cols = ["qid", "rank", "nid", "dot", "q2", "n2"]
    if with_batch:
        cols.append("batch_id")
    return {tuple(r) for r in
            spark.read.parquet(out_dir).select(*cols).collect()}


def test_ann_serve_stream_matches_batch_fold(spark, sf_dir):
    """3 micro-batches with update_store=True: a vector arriving two
    triggers after a near neighbor must retrieve it, and a replayed
    batch must never retrieve from itself."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    base_dir = tempfile.mkdtemp(prefix="ann_serve_")
    emb_dir = os.path.join(base_dir, "incoming")
    store_dir = os.path.join(base_dir, "store")
    out_dir = os.path.join(base_dir, "hits")
    ckpt = os.path.join(base_dir, "ckpt")

    existing = emb.filter(F.col("vec_id") % 5 != 0)
    build_semdedup_store(existing, store_dir)
    incoming = emb.filter(F.col("vec_id") % 5 == 0)
    for i in range(3):
        (incoming.filter(F.col("vec_id") % 3 == i)
         .coalesce(1).write.mode("append").parquet(emb_dir))

    q = (ann_serve_stream(embeddings_stream(spark, emb_dir),
                          store_dir, out_dir)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(180)

    got = _hits(spark, out_dir, with_batch=False)

    # reference: fold batch-side in the order the stream delivered,
    # recovered from the persisted _updates partitions
    cents = _load_centroids(spark, store_dir)
    updates = spark.read.parquet(store_dir + "_updates")
    done = assign_cells(quantize(existing), cents)
    want = set()
    bids = sorted(r["batch_id"] for r in
                  updates.select("batch_id").distinct().collect())
    assert len(bids) >= 2                 # the fold is cross-batch
    for bid in bids:
        inc = (updates.filter(F.col("batch_id") == bid)
               .drop("batch_id"))
        for r in ann_store_topk(inc, done, cents).collect():
            want.add(tuple(r))
        done = done.unionByName(inc)
    assert got == want and got
    # every incoming nonzero vector got answers (the store is dense
    # enough that 2 probed cells are never empty on the fixtures)
    n_inc = assign_cells(quantize(incoming), cents).count()
    assert len({t[0] for t in got}) == n_inc


def test_ann_serve_replay_is_idempotent(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    base_dir = tempfile.mkdtemp(prefix="ann_serve_replay_")
    store_dir = os.path.join(base_dir, "store")
    out_dir = os.path.join(base_dir, "hits")
    existing = emb.filter(F.col("vec_id") % 5 != 0)
    build_semdedup_store(existing, store_dir)
    batch = emb.filter(F.col("vec_id") % 5 == 0)

    def snapshot():
        upd = {(r["batch_id"], r["count"]) for r in
               spark.read.parquet(store_dir + "_updates")
               .groupBy("batch_id").count().collect()}
        return _hits(spark, out_dir), upd

    ann_serve_batch(batch, 0, store_dir, out_dir)
    first = snapshot()
    assert first[0]
    ann_serve_batch(batch, 0, store_dir, out_dir)   # crash-replay
    assert snapshot() == first


def test_ann_serve_static_index_never_writes_updates(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    base_dir = tempfile.mkdtemp(prefix="ann_serve_static_")
    store_dir = os.path.join(base_dir, "store")
    out_dir = os.path.join(base_dir, "hits")
    existing = emb.filter(F.col("vec_id") % 5 != 0)
    build_semdedup_store(existing, store_dir)
    batch = emb.filter(F.col("vec_id") % 5 == 0)

    ann_serve_batch(batch, 0, store_dir, out_dir, update_store=False)
    assert not os.path.exists(store_dir + "_updates")
    cents = _load_centroids(spark, store_dir)
    want = {tuple(r) for r in ann_store_topk(
        assign_cells(quantize(batch), cents),
        spark.read.parquet(store_dir), cents).collect()}
    got = _hits(spark, out_dir, with_batch=False)
    assert got == want and got


def test_serve_delete_compact_lifecycle(spark, sf_dir):
    """The full store lifecycle against ONE vector store: serve →
    GDPR-delete a retrieved neighbor → the next batch can no longer
    retrieve it → compact → results still exactly match a recompute
    from the surviving store."""
    from lcmap_blackmagic_spark.streaming.jobs import (
        semdedup_store_delete, store_compact)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    base_dir = tempfile.mkdtemp(prefix="ann_lifecycle_")
    store_dir = os.path.join(base_dir, "store")
    out_dir = os.path.join(base_dir, "hits")
    existing = emb.filter(F.col("vec_id") % 5 != 0)
    build_semdedup_store(existing, store_dir)
    incoming = emb.filter(F.col("vec_id") % 5 == 0)
    b0 = incoming.filter(F.col("vec_id") % 2 == 0)
    b1 = incoming.filter(F.col("vec_id") % 2 == 1)

    ann_serve_batch(b0, 0, store_dir, out_dir)
    retrieved = sorted({t[2] for t in _hits(spark, out_dir)})
    victim = retrieved[0]
    semdedup_store_delete(spark, store_dir, [victim])

    ann_serve_batch(b1, 1, store_dir, out_dir)
    hits_b1 = {t for t in _hits(spark, out_dir) if t[6] == 1}
    assert hits_b1
    assert victim not in {t[2] for t in hits_b1}

    # compact (folds batch 0; batch 1 stays replayable), then pin
    # batch 1's results against a recompute from the surviving store
    res = store_compact(spark, store_dir)
    assert res["folded_batches"] == 1
    cents = _load_centroids(spark, store_dir)
    store = spark.read.parquet(store_dir)
    want = {tuple(r) + (1,) for r in ann_store_topk(
        assign_cells(quantize(b1), cents), store, cents).collect()}
    ann_serve_batch(b1, 1, store_dir, out_dir)   # replay post-compact
    assert {t for t in _hits(spark, out_dir) if t[6] == 1} == want
