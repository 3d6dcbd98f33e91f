"""Deletion through the four streaming dedup signature stores
(round 14, VERDICT item 4): after deleting a document's signatures,
the NEXT micro-batch's flags must equal a batch recompute from the
surviving corpus — the deleted doc must stop suppressing (or
flagging) future near-dups — and replaying the delete job must be a
no-op.  One test per store family: MinHash signatures, winnowing
fingerprints, semantic cells, Bloom (rebuild)."""

import os
import tempfile

from pyspark.sql import functions as F

from lcmap_blackmagic_spark.llm.dedup import (_minhash_doc_aggregate,
                                              minhash_cross_flags,
                                              winnow_cross_flags,
                                              winnow_fingerprints)
from lcmap_blackmagic_spark.llm.semdedup import (assign_cells,
                                                 quantize,
                                                 semdedup_cross_flags)
from lcmap_blackmagic_spark.streaming.jobs import (
    _load_centroids, bloom_decontam_batch, bloom_store_rebuild,
    build_bloom_store, build_semdedup_store, ingest_dedup_batch,
    minhash_store_delete, semdedup_batch, semdedup_store_delete,
    store_delete, winnow_dedup_batch, winnow_store_delete)


def _rows(spark, d, cols):
    return {tuple(r) for r in spark.read.parquet(d).select(*cols)
            .collect()}


def test_minhash_store_delete_flag_exact(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base = tempfile.mkdtemp(prefix="mh_delete_")
    sig_dir = os.path.join(base, "signatures")
    out_dir = os.path.join(base, "flags")

    existing = docs.filter(F.col("source") != "src1")
    _minhash_doc_aggregate(existing, "doc_id", "text", 3, 8) \
        .write.mode("overwrite").parquet(sig_dir)
    incoming = docs.filter(F.col("source") == "src1")
    b0 = incoming.filter(F.col("doc_id") % 3 == 0)
    b1 = incoming.filter(F.col("doc_id") % 3 == 1)
    b2 = incoming.filter(F.col("doc_id") % 3 == 2)
    ingest_dedup_batch(b0, 0, sig_dir, out_dir, threshold=0.2)
    ingest_dedup_batch(b1, 1, sig_dir, out_dir, threshold=0.2)

    # delete: some base docs + ALL of batch 0 (must empty and DROP
    # its updates partition, not leave it to resurrect)
    del_base = [r["doc_id"] for r in
                existing.select("doc_id").limit(40).collect()]
    del_b0 = [r["doc_id"] for r in b0.select("doc_id").collect()]
    gone = del_base + del_b0
    res = minhash_store_delete(spark, sig_dir, gone)
    assert res["base_removed"] == len(del_base)
    assert res["updates_removed"] == len(del_b0)
    assert not os.path.exists(
        os.path.join(sig_dir + "_updates", "batch_id=0"))

    # next batch must flag EXACTLY as if the deleted docs had never
    # been ingested
    ingest_dedup_batch(b2, 2, sig_dir, out_dir, threshold=0.2)
    got = _rows(spark, out_dir, ["incoming_id", "n_partners",
                                 "canonical_partner", "batch_id"])
    got = {t for t in got if t[3] == 2}
    survivors = (existing.unionByName(b0).unionByName(b1)
                 .filter(~F.col("doc_id").isin(gone)))
    want_flags = minhash_cross_flags(
        _minhash_doc_aggregate(b2, "doc_id", "text", 3, 8),
        _minhash_doc_aggregate(survivors, "doc_id", "text", 3, 8),
        threshold=0.2)
    want = {(r["inc_id"], r["n_partners"], r["canonical_partner"], 2)
            for r in want_flags.collect()}
    assert got == want and got

    # replay: deleting the same ids again is a no-op
    before = _rows(spark, sig_dir, ["doc_id"])
    res2 = minhash_store_delete(spark, sig_dir, gone)
    assert res2 == {"base_removed": 0, "updates_removed": 0}
    assert _rows(spark, sig_dir, ["doc_id"]) == before


def test_winnow_store_delete_flag_exact(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base = tempfile.mkdtemp(prefix="win_delete_")
    store_dir = os.path.join(base, "store")
    out_dir = os.path.join(base, "flags")

    existing = docs.filter(F.col("source") != "src1")
    winnow_fingerprints(existing).write.mode("overwrite") \
        .parquet(store_dir)
    incoming = docs.filter(F.col("source") == "src1")
    # src1 doc_ids are all odd — split on a parity-free key
    b0 = incoming.filter(F.col("doc_id") % 3 == 0)
    b1 = incoming.filter(F.col("doc_id") % 3 != 0)
    winnow_dedup_batch(b0, 0, store_dir, out_dir)

    # delete some base docs plus ALL of batch 0: the updates dir
    # loses its only partition and must be REMOVED (an empty parquet
    # dir is unreadable), restoring the pre-first-batch state the
    # next batch's write recreates
    del_ids = ([r["doc_id"] for r in
                existing.select("doc_id").limit(40).collect()]
               + [r["doc_id"] for r in b0.select("doc_id").collect()])
    winnow_store_delete(spark, store_dir, del_ids)
    # a doc owns MULTIPLE fp rows — none may survive
    assert not (spark.read.parquet(store_dir)
                .filter(F.col("doc_id").isin(del_ids)).count())
    assert not os.path.isdir(store_dir + "_updates")

    winnow_dedup_batch(b1, 1, store_dir, out_dir)
    got = _rows(spark, out_dir, ["incoming_id", "n_partners",
                                 "max_shared", "canonical_partner",
                                 "batch_id"])
    got = {t for t in got if t[4] == 1}
    survivors = (existing.unionByName(b0)
                 .filter(~F.col("doc_id").isin(del_ids)))
    want = {(r["incoming_id"], r["n_partners"], r["max_shared"],
             r["canonical_partner"], 1)
            for r in winnow_cross_flags(
                winnow_fingerprints(b1),
                winnow_fingerprints(survivors)).collect()}
    assert got == want and got


def test_semdedup_store_delete_flag_exact(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    base = tempfile.mkdtemp(prefix="sem_delete_")
    store_dir = os.path.join(base, "store")
    out_dir = os.path.join(base, "flags")

    existing = emb.filter(F.col("vec_id") % 5 != 0)
    build_semdedup_store(existing, store_dir)
    incoming = emb.filter(F.col("vec_id") % 5 == 0)
    b0 = incoming.filter(F.col("vec_id") % 2 == 0)
    b1 = incoming.filter(F.col("vec_id") % 2 == 1)
    semdedup_batch(b0, 0, store_dir, out_dir)

    cents_before = _load_centroids(spark, store_dir)
    del_ids = ([r["vec_id"] for r in
                existing.select("vec_id").limit(60).collect()]
               + [r["vec_id"] for r in
                  b0.select("vec_id").limit(20).collect()])
    semdedup_store_delete(spark, store_dir, del_ids)
    # the fitted cells are a FROZEN model constant — deletion must
    # not refit them
    assert _load_centroids(spark, store_dir) == cents_before

    semdedup_batch(b1, 1, store_dir, out_dir)
    got = _rows(spark, out_dir, ["incoming_id", "n_partners",
                                 "canonical_partner", "max_cos2_bp",
                                 "batch_id"])
    got = {t for t in got if t[4] == 1}
    survivors = (existing.unionByName(b0)
                 .filter(~F.col("vec_id").isin(del_ids)))
    want = {(r["incoming_id"], r["n_partners"],
             r["canonical_partner"], r["max_cos2_bp"], 1)
            for r in semdedup_cross_flags(
                assign_cells(quantize(b1), cents_before),
                assign_cells(quantize(survivors), cents_before))
            .collect()}
    assert got == want and got


def test_bloom_store_rebuild_unflags_deleted(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base = tempfile.mkdtemp(prefix="bloom_delete_")
    store_dir = os.path.join(base, "bloom")
    out_dir = os.path.join(base, "flags")

    bench = docs.filter(F.col("source") == "src2")
    build_bloom_store(bench, store_dir)
    # probe: the bench docs themselves must all flag against the
    # full store (every n-gram is in the filter — no false negatives)
    probe = bench.limit(30)
    bloom_decontam_batch(probe, 0, store_dir, out_dir)
    flagged0 = {r["doc_id"] for r in
                spark.read.parquet(out_dir)
                .filter("batch_id = 0 AND dropped").collect()}
    probe_ids = {r["doc_id"] for r in probe.collect()}
    assert flagged0 == probe_ids

    # delete = rebuild from the surviving bench corpus; probes whose
    # only partner was deleted must stop flagging, and the result
    # must equal a FRESH store built from the survivors
    gone = [r["doc_id"] for r in bench.select("doc_id")
            .limit(15).collect()]
    survivors = bench.filter(~F.col("doc_id").isin(gone))
    bloom_store_rebuild(survivors, store_dir)
    bloom_decontam_batch(probe, 1, store_dir, out_dir)
    flagged1 = {r["doc_id"] for r in
                spark.read.parquet(out_dir)
                .filter("batch_id = 1 AND dropped").collect()}

    fresh_dir = os.path.join(base, "bloom_fresh")
    out2 = os.path.join(base, "flags_fresh")
    build_bloom_store(survivors, fresh_dir)
    bloom_decontam_batch(probe, 0, fresh_dir, out2)
    want = {r["doc_id"] for r in
            spark.read.parquet(out2).filter("dropped").collect()}
    assert flagged1 == want
    # surviving probes still flag (no false negatives), and the
    # deleted-only probes actually dropped out of the filter
    assert (probe_ids - set(gone)) <= flagged1
    assert flagged1 != flagged0


def test_dedup_store_delete_stream(spark, sf_dir):
    """Continuous deletion: two request micro-batches flow through
    dedup_store_delete_stream against a MinHash store and a semantic
    store at once; the surviving stores must equal direct
    store_delete calls with the same ids, the audit partitions must
    be batch_id-idempotent, and a replayed request file (same
    checkpoint wiped, stream re-run) must be a no-op on the stores."""
    from lcmap_blackmagic_spark.streaming.jobs import (
        dedup_store_delete_stream)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    base = tempfile.mkdtemp(prefix="deldstream_")
    sig_dir = os.path.join(base, "signatures")
    sem_dir = os.path.join(base, "semstore")
    req_dir = os.path.join(base, "requests")
    out_dir = os.path.join(base, "audit")
    ckpt = os.path.join(base, "ckpt")

    _minhash_doc_aggregate(docs, "doc_id", "text", 3, 8) \
        .write.mode("overwrite").parquet(sig_dir)
    build_semdedup_store(emb, sem_dir)

    doc_ids = [r["doc_id"] for r in
               docs.select("doc_id").limit(30).collect()]
    vec_ids = [r["vec_id"] for r in
               emb.select("vec_id").limit(20).collect()]
    reqs = ([(d, None) for d in doc_ids[:15]]
            + [(None, v) for v in vec_ids])
    spark.createDataFrame(reqs, "doc_id BIGINT, vec_id BIGINT") \
        .coalesce(1).write.mode("append").parquet(req_dir)
    spark.createDataFrame([(d, None) for d in doc_ids[15:]],
                          "doc_id BIGINT, vec_id BIGINT") \
        .coalesce(1).write.mode("append").parquet(req_dir)

    q = dedup_store_delete_stream(
        spark, req_dir, ckpt,
        {"minhash": sig_dir, "semantic": sem_dir}, out_dir=out_dir)
    q.awaitTermination(180)

    left_sig = {r["doc_id"] for r in
                spark.read.parquet(sig_dir).select("doc_id").collect()}
    left_sem = {r["vec_id"] for r in
                spark.read.parquet(sem_dir).select("vec_id").collect()}
    assert left_sig.isdisjoint(doc_ids)
    assert left_sem.isdisjoint(vec_ids)
    all_docs = {r["doc_id"] for r in docs.select("doc_id").collect()}
    assert left_sig == all_docs - set(doc_ids)

    audit = spark.read.parquet(out_dir).collect()
    assert sum(r["base_removed"] for r in audit
               if r["kind"] == "minhash") == len(doc_ids)

    # replay: wipe the checkpoint so the SAME request files re-fire —
    # deletion of already-deleted ids must change nothing
    import shutil
    shutil.rmtree(ckpt)
    q2 = dedup_store_delete_stream(
        spark, req_dir, ckpt,
        {"minhash": sig_dir, "semantic": sem_dir}, out_dir=out_dir)
    q2.awaitTermination(180)
    assert {r["doc_id"] for r in spark.read.parquet(sig_dir)
            .select("doc_id").collect()} == left_sig
    assert {r["vec_id"] for r in spark.read.parquet(sem_dir)
            .select("vec_id").collect()} == left_sem
