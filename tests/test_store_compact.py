"""Compaction of the streaming dedup signature stores (round 14):
fold committed ``_updates`` batch partitions into the base store so
a long-running ingest stream's per-batch read set stays one store
instead of N partition directories.  Pins: (1) the NEXT batch's
flags are byte-identical with and without compaction; (2) a replay
of the retained (newest) batch still sees exactly the
pre-compaction read set; (3) re-running after a simulated
crash-after-swap converges (set-union fold, no row doubling);
(4) the semantic store compacts under the same contract with its
frozen centroids untouched."""

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from lcmap_blackmagic_spark.streaming.jobs import (
    _load_centroids, build_semdedup_store, ingest_dedup_batch,
    semdedup_batch, store_compact)


def _flags(spark, out_dir, batch_id):
    return {tuple(r) for r in
            spark.read.parquet(out_dir)
            .filter(F.col("batch_id") == batch_id)
            .select("incoming_id", "n_partners", "canonical_partner")
            .collect()}


def _read_set(spark, store_dir, below_batch):
    """The set of rows a batch job at ``below_batch`` actually
    compares against: base ∪ updates[batch_id < below_batch] — THE
    invariant compaction must preserve, vacuity-proof (it is never
    empty)."""
    base = spark.read.parquet(store_dir)
    updates_dir = store_dir.rstrip("/") + "_updates"
    if os.path.isdir(updates_dir):
        upd = (spark.read.parquet(updates_dir)
               .filter(F.col("batch_id") < below_batch)
               .drop("batch_id"))
        base = base.unionByName(upd)
    def h(v):
        return tuple(h(x) for x in v) if isinstance(v, list) else v
    return {tuple(h(x) for x in r) for r in base.collect()}


def _minhash_tree(spark, sf_dir):
    """base store + batches 0/1/2 of the minhash ingest protocol,
    returning (root, sig_dir, out_dir, batches)."""
    from lcmap_blackmagic_spark.llm.dedup import _minhash_doc_aggregate
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    root = tempfile.mkdtemp(prefix="mh_compact_")
    sig_dir = os.path.join(root, "signatures")
    out_dir = os.path.join(root, "flags")
    existing = docs.filter(F.col("source") != "src1")
    _minhash_doc_aggregate(existing, "doc_id", "text", 3, 8) \
        .write.mode("overwrite").parquet(sig_dir)
    incoming = docs.filter(F.col("source") == "src1")
    # src1's doc_ids have stride 20 (source ≡ doc_id mod 20), so a
    # plain %4 collapses to one batch; bucket by position instead
    batches = [incoming.filter(F.expr("(doc_id div 20) % 4") == i)
               for i in range(4)]
    for i in range(3):
        ingest_dedup_batch(batches[i], i, sig_dir, out_dir,
                           threshold=0.02)
    return root, sig_dir, out_dir, batches


def test_minhash_compact_preserves_next_batch_flags(spark, sf_dir):
    root, sig_dir, out_dir, batches = _minhash_tree(spark, sf_dir)
    twin = root + "_twin"
    shutil.copytree(root, twin)
    t_sig = os.path.join(twin, "signatures")
    t_out = os.path.join(twin, "flags")

    base_before = spark.read.parquet(sig_dir).count()
    upd = spark.read.parquet(sig_dir + "_updates")
    fold_rows = upd.filter(F.col("batch_id") < 2).count()

    res = store_compact(spark, sig_dir)          # default: keep b2
    assert res["folded_batches"] == 2
    assert res["folded_rows"] == fold_rows
    assert res["base_rows"] == base_before + fold_rows
    for bid, present in [(0, False), (1, False), (2, True)]:
        assert os.path.isdir(os.path.join(
            sig_dir + "_updates", f"batch_id={bid}")) is present

    # immediate re-compaction is a no-op (batch 2 stays replayable)
    res2 = store_compact(spark, sig_dir)
    assert res2["folded_batches"] == 0
    assert res2["base_rows"] == res["base_rows"]

    # the NEXT batch's read set — and therefore its flags — is
    # identical on both trees
    assert _read_set(spark, sig_dir, 3) == _read_set(spark, t_sig, 3)
    ingest_dedup_batch(batches[3], 3, sig_dir, out_dir,
                       threshold=0.02)
    ingest_dedup_batch(batches[3], 3, t_sig, t_out, threshold=0.02)
    got = _flags(spark, out_dir, 3)
    assert got == _flags(spark, t_out, 3) and got

    # batch 3 committed batch 2: the next compaction folds exactly
    # it and retains batch 3 as the new replayable tail
    res3 = store_compact(spark, sig_dir)
    assert res3["folded_batches"] == 1
    assert os.path.isdir(os.path.join(sig_dir + "_updates",
                                      "batch_id=3"))
    assert not os.path.isdir(os.path.join(sig_dir + "_updates",
                                          "batch_id=2"))


def test_compact_retained_batch_replay_is_exact(spark, sf_dir):
    root, sig_dir, out_dir, batches = _minhash_tree(spark, sf_dir)
    twin = root + "_twin"
    shutil.copytree(root, twin)

    flags_b2_before = _flags(spark, out_dir, 2)
    read_set_before = _read_set(spark, sig_dir, 2)
    store_compact(spark, sig_dir)
    # crash-replay of the retained newest batch: identical read set
    # (base now holds b0/b1, the strictly-earlier filter excludes
    # nothing new) and therefore identical flags
    assert _read_set(spark, sig_dir, 2) == read_set_before
    ingest_dedup_batch(batches[2], 2, sig_dir, out_dir,
                       threshold=0.02)
    assert _flags(spark, out_dir, 2) == flags_b2_before


def test_compact_crash_rerun_converges(spark, sf_dir):
    root, sig_dir, out_dir, _ = _minhash_tree(spark, sf_dir)
    twin = root + "_twin"
    shutil.copytree(root, twin)

    res = store_compact(spark, sig_dir, through_batch=1)
    # simulate the crash window: the swap landed but batch 1's
    # partition was never removed — its rows now sit on BOTH sides
    shutil.copytree(
        os.path.join(twin, "signatures_updates", "batch_id=1"),
        os.path.join(sig_dir + "_updates", "batch_id=1"))
    rerun = store_compact(spark, sig_dir, through_batch=1)
    assert rerun["folded_batches"] == 1
    assert rerun["base_rows"] == res["base_rows"]   # no doubling
    assert not os.path.isdir(
        os.path.join(sig_dir + "_updates", "batch_id=1"))


def test_semdedup_compact_folds_all_and_drops_updates(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    root = tempfile.mkdtemp(prefix="sem_compact_")
    store_dir = os.path.join(root, "store")
    out_dir = os.path.join(root, "flags")
    existing = emb.filter(F.col("vec_id") % 5 != 0)
    build_semdedup_store(existing, store_dir)
    incoming = emb.filter(F.col("vec_id") % 5 == 0)
    b0 = incoming.filter(F.col("vec_id") % 2 == 0)
    b1 = incoming.filter(F.col("vec_id") % 2 == 1)
    semdedup_batch(b0, 0, store_dir, out_dir)

    twin = root + "_twin"
    shutil.copytree(root, twin)

    cents = _load_centroids(spark, store_dir)
    # explicit watermark past the newest batch: fold EVERYTHING —
    # the updates dir must disappear (an empty one is unreadable)
    res = store_compact(spark, store_dir, through_batch=0)
    assert res["folded_batches"] == 1
    assert not os.path.exists(store_dir + "_updates")
    assert _load_centroids(spark, store_dir) == cents  # still frozen

    semdedup_batch(b1, 1, store_dir, out_dir)
    semdedup_batch(b1, 1, os.path.join(twin, "store"),
                   os.path.join(twin, "flags"))
    got = _flags(spark, out_dir, 1)
    assert got == _flags(spark, os.path.join(twin, "flags"), 1)
    assert got
