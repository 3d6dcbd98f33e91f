"""Streaming line-level (boilerplate) dedup: batch-k emissions must
exactly equal the batch llm_line_dedup rewrite over the corpus as of
batch k (pure-Python reference — no SQL shared with the engine),
crash-replay must be byte-idempotent, deletion from the granular
store must be exact-as-recount, and compaction must not change any
future batch's emissions."""

import os
import tempfile

from pyspark.sql import functions as F

from lcmap_blackmagic_spark.streaming.jobs import (
    build_line_store, dedup_store_delete_stream, documents_stream,
    line_dedup_batch, line_dedup_stream, line_store_delete,
    store_compact)

from .test_ext23 import _python_line_dedup


def _rewrites(spark, out_dir):
    return {(r["doc_id"], r["n_segs"], r["n_kept"], r["cleaned"])
            for r in spark.read.parquet(out_dir).collect()}


def _docs_dict(df):
    return {r["doc_id"]: r["text"]
            for r in df.select("doc_id", "text").collect()}


def test_line_stream_matches_batch_fold(spark, sf_dir):
    """3 micro-batches with update_store=True: each batch's rewrite
    must equal the batch-form rewrite over base ∪ batches ≤ k,
    restricted to batch k's docs — a segment crossing the
    boilerplate threshold two triggers after its first occurrences
    starts being excised from that trigger on."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base_dir = tempfile.mkdtemp(prefix="line_stream_")
    docs_dir = os.path.join(base_dir, "incoming")
    store_dir = os.path.join(base_dir, "store")
    out_dir = os.path.join(base_dir, "rewrites")
    ckpt = os.path.join(base_dir, "ckpt")

    existing = docs.filter(F.expr("(doc_id div 20) % 5 != 0"))
    build_line_store(existing, store_dir)
    incoming = docs.filter(F.expr("(doc_id div 20) % 5 = 0"))
    for i in range(3):
        (incoming.filter(F.expr(f"(doc_id div 20) % 3 = {i}"))
         .coalesce(1).write.mode("append").parquet(docs_dir))

    q = (line_dedup_stream(documents_stream(spark, docs_dir),
                           store_dir, out_dir)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(180)

    got = _rewrites(spark, out_dir)

    # reference: fold batches in THE ORDER THE STREAM DELIVERED —
    # recovered from the persisted _updates partitions
    updates = spark.read.parquet(store_dir + "_updates")
    bids = sorted(r["batch_id"] for r in
                  updates.select("batch_id").distinct().collect())
    all_docs = _docs_dict(docs)
    corpus = _docs_dict(existing)
    want = set()
    for bid in bids:
        batch_ids = [r["doc_id"] for r in
                     updates.filter(F.col("batch_id") == bid)
                     .select("doc_id").distinct().collect()]
        for did in batch_ids:
            corpus[did] = all_docs[did]
        ref = _python_line_dedup(corpus)
        for did in batch_ids:
            n_segs, n_kept, cleaned = ref[did]
            want.add((did, n_segs, n_kept, cleaned))
    assert got == want and got
    # the threshold must actually bite somewhere in the stream
    assert any(k < s for (_, s, k, _) in got)


def test_line_batch_replay_is_idempotent(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base_dir = tempfile.mkdtemp(prefix="line_replay_")
    store_dir = os.path.join(base_dir, "store")
    out_dir = os.path.join(base_dir, "rewrites")
    build_line_store(
        docs.filter(F.expr("(doc_id div 20) % 5 != 0")), store_dir)
    batch = docs.filter(F.expr("(doc_id div 20) % 5 = 0"))

    def snapshot():
        upd = spark.read.parquet(store_dir + "_updates")
        return (_rewrites(spark, out_dir),
                upd.count(),
                {tuple(r) for r in upd.collect()})

    line_dedup_batch(batch, 7, store_dir, out_dir)
    first = snapshot()
    line_dedup_batch(batch, 7, store_dir, out_dir)   # crash-replay
    assert snapshot() == first


def test_line_static_store_never_writes_updates(spark, sf_dir):
    """update_store=False pins the static-store twin: every batch is
    rewritten against base ∪ itself only (no cross-batch counts), and
    the store directory tree is never touched."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base_dir = tempfile.mkdtemp(prefix="line_static_")
    store_dir = os.path.join(base_dir, "store")
    out_dir = os.path.join(base_dir, "rewrites")
    existing = docs.filter(F.expr("(doc_id div 20) % 5 != 0"))
    build_line_store(existing, store_dir)
    incoming = docs.filter(F.expr("(doc_id div 20) % 5 = 0"))
    batches = [incoming.filter(F.expr(f"(doc_id div 20) % 3 = {i}"))
               for i in range(3)]
    for bid, b in enumerate(batches):
        line_dedup_batch(b, bid, store_dir, out_dir,
                         update_store=False)
    assert not os.path.isdir(store_dir + "_updates")
    got = _rewrites(spark, out_dir)
    base_corpus = _docs_dict(existing)
    want = set()
    for b in batches:
        corpus = dict(base_corpus)
        bd = _docs_dict(b)
        corpus.update(bd)
        ref = _python_line_dedup(corpus)
        for did in bd:
            n_segs, n_kept, cleaned = ref[did]
            want.add((did, n_segs, n_kept, cleaned))
    assert got == want and got


def test_line_batch_with_null_text_only_is_a_guarded_noop(spark):
    """NULL-text docs yield no segment rows; a batch of only those
    must not crash on a never-created updates dir, and the store
    must stay untouched."""
    base = spark.createDataFrame([(1, "some real text here")],
                                 "doc_id LONG, text STRING")
    d = tempfile.mkdtemp(prefix="line_nulltext_")
    store_dir = os.path.join(d, "store")
    out_dir = os.path.join(d, "rewrites")
    build_line_store(base, store_dir)
    nulls = spark.createDataFrame([(9, None)],
                                  "doc_id LONG, text STRING")
    line_dedup_batch(nulls, 0, store_dir, out_dir)
    assert not os.path.isdir(store_dir + "_updates")
    assert not os.path.isdir(out_dir)
    # a later real batch proceeds normally
    real = spark.createDataFrame([(10, "fresh words arriving now")],
                                 "doc_id LONG, text STRING")
    line_dedup_batch(real, 1, store_dir, out_dir)
    assert len(_rewrites(spark, out_dir)) == 1


def test_line_store_delete_is_exact_as_recount(spark):
    """Deleting docs lowers segment counts by exactly their
    multiplicity: a segment that was boilerplate only because of
    deleted docs stops being excised."""
    seg = "alpha beta gamma delta"
    base_rows = [(1, f"{seg} one extra words here"),
                 (2, f"{seg} two other filler text"),
                 (3, "completely different text body")]
    base = spark.createDataFrame(base_rows, "doc_id LONG, text STRING")
    batch = spark.createDataFrame(
        [(10, f"{seg} fresh incoming words")],
        "doc_id LONG, text STRING")

    for delete_first, want_excised in ((False, True), (True, False)):
        d = tempfile.mkdtemp(prefix="line_delete_")
        store_dir = os.path.join(d, "store")
        out_dir = os.path.join(d, "rewrites")
        build_line_store(base, store_dir)
        if delete_first:
            res = line_store_delete(spark, store_dir, [1])
            assert res["base_removed"] > 0
        line_dedup_batch(batch, 0, store_dir, out_dir)
        (got,) = _rewrites(spark, out_dir)
        # python recount over the surviving corpus + batch
        corpus = {r[0]: r[1] for r in base_rows}
        if delete_first:
            del corpus[1]
        corpus[10] = batch.collect()[0]["text"]
        assert got == (10,) + _python_line_dedup(corpus)[10]
        excised = got[2] < got[1]
        assert excised == want_excised


def test_line_delete_stream_kind(spark, sf_dir):
    """The 'line' kind rides the streaming delete-request path."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base_dir = tempfile.mkdtemp(prefix="line_delreq_")
    store_dir = os.path.join(base_dir, "store")
    req_dir = os.path.join(base_dir, "requests")
    ckpt = os.path.join(base_dir, "ckpt")
    build_line_store(docs, store_dir)
    doomed = [r["doc_id"] for r in
              docs.filter(F.expr("(doc_id div 20) % 10 = 0"))
              .select("doc_id").collect()]
    (spark.createDataFrame([(int(i), None) for i in doomed],
                           "doc_id LONG, vec_id LONG")
     .coalesce(1).write.parquet(req_dir))
    q = dedup_store_delete_stream(spark, req_dir, ckpt,
                                  {"line": store_dir})
    q.awaitTermination(120)
    left = {r["doc_id"] for r in
            spark.read.parquet(store_dir)
            .select("doc_id").distinct().collect()}
    assert left.isdisjoint(set(doomed)) and left


def test_line_store_compact_preserves_future_batches(spark, sf_dir):
    """store_compact folds committed update partitions; a later
    batch's emissions are identical with and without compaction."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    splits = [docs.filter(F.expr(f"(doc_id div 20) % 4 = {i}"))
              for i in range(4)]
    dirs = []
    for tag in ("plain", "compacted"):
        d = tempfile.mkdtemp(prefix=f"line_compact_{tag}_")
        store_dir = os.path.join(d, "store")
        out_dir = os.path.join(d, "rewrites")
        build_line_store(splits[0], store_dir)
        for bid in (1, 2):
            line_dedup_batch(splits[bid], bid, store_dir, out_dir)
        dirs.append((store_dir, out_dir))
    res = store_compact(spark, dirs[1][0])
    assert res["folded_batches"] == 1   # newest partition retained
    for store_dir, out_dir in dirs:
        line_dedup_batch(splits[3], 3, store_dir, out_dir)
    a = _rewrites(spark, dirs[0][1])
    b = _rewrites(spark, dirs[1][1])
    assert a == b
