"""Composed streaming curation (quality → MinHash ingest dedup →
Bloom decontam → DSIR scoring): per-batch funnel metrics must equal
composing the batch-side operators per delivered micro-batch, the
scored output must be flag/score-exact with the shared operators,
and crash-replay of a micro-batch must be byte-idempotent."""

import os
import tempfile

from pyspark.sql import functions as F

from lcmap_blackmagic_spark.llm.bloomfilter import doc_hit_flags
from lcmap_blackmagic_spark.llm.dedup import (_minhash_doc_aggregate,
                                              minhash_cross_flags)
from lcmap_blackmagic_spark.llm.text import dsir_doc_scores, dsir_weights
from lcmap_blackmagic_spark.streaming.jobs import (_load_bloom_bits,
                                                   build_bloom_store,
                                                   curation_batch,
                                                   curation_stream,
                                                   documents_stream)

def _tok():
    return F.size(F.split(F.lower(F.trim("text")), " "))


def _setup(spark, sf_dir, prefix):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base_dir = tempfile.mkdtemp(prefix=prefix)
    d = {k: os.path.join(base_dir, k) for k in
         ("incoming", "signatures", "bloom", "dsir", "out", "metrics",
          "ckpt")}
    existing = docs.filter(F.col("source") != "src1")
    _minhash_doc_aggregate(existing, "doc_id", "text", 3, 8) \
        .write.mode("overwrite").parquet(d["signatures"])
    build_bloom_store(docs.filter(F.col("source") == "src0"),
                      d["bloom"])
    dsir_weights(docs.filter(F.col("source") == "src0"),
                 docs.filter(F.col("source") != "src0")) \
        .write.mode("overwrite").parquet(d["dsir"])
    incoming = docs.filter(F.col("source") == "src1")
    return docs, existing, incoming, d


def _compose_reference(spark, inc_batch, sig_store, bloom_dir,
                       dsir_dir):
    """The batch-side composition curation_batch must match: quality
    → cross-flags vs the given store → bloom probe → DSIR score."""
    q = inc_batch.filter(_tok().between(30, 100))
    flagged = minhash_cross_flags(
        _minhash_doc_aggregate(q, "doc_id", "text", 3, 8),
        sig_store, threshold=0.2).select(
        F.col("inc_id").alias("doc_id"))
    deduped = q.join(flagged, "doc_id", "left_anti")
    bits = _load_bloom_bits(spark, bloom_dir)
    clean = (deduped.join(doc_hit_flags(deduped, bits), "doc_id",
                          "left")
             .filter(~F.coalesce(F.col("__hit"), F.lit(False)))
             .drop("__hit"))
    wtab = spark.read.parquet(dsir_dir)
    scored = clean.join(dsir_doc_scores(clean, wtab), "doc_id")
    return q, deduped, clean, scored


def test_curation_stream_matches_batch_composition(spark, sf_dir):
    """3 micro-batches: each batch's funnel row set and scored docs
    must equal the batch-side composition against base store ∪
    strictly earlier batches (recovered from the signature _updates
    partitions, the family's recovery recipe)."""
    docs, existing, incoming, d = _setup(spark, sf_dir, "curation_s_")
    for i in range(3):
        (incoming.filter(F.col("doc_id") % 3 == i)
         .coalesce(1).write.mode("append").parquet(d["incoming"]))

    q = (curation_stream(documents_stream(spark, d["incoming"]),
                         d["signatures"], d["bloom"], d["dsir"],
                         d["out"], d["metrics"])
         .option("checkpointLocation", d["ckpt"])
         .trigger(availableNow=True).start())
    q.awaitTermination(240)

    got_metrics = {(r["batch_id"], r["stage_id"], r["stage"],
                    r["n_docs"])
                   for r in spark.read.parquet(d["metrics"]).collect()}
    got_scored = {(r["doc_id"], r["score_bp"], r["batch_id"]) for r in
                  spark.read.parquet(d["out"])
                  .select("doc_id", "score_bp", "batch_id").collect()}

    updates = spark.read.parquet(d["signatures"] + "_updates")
    base = spark.read.parquet(d["signatures"])
    bids = sorted(r["batch_id"] for r in
                  updates.select("batch_id").distinct().collect())
    # batch membership: the updates partition carries the QUALITY
    # survivors; the full delivered batch is those plus the incoming
    # docs of the same split that failed the token cut — recover the
    # split by joining ids back against the incoming set
    want_metrics, want_scored = set(), set()
    store = base
    for bid in bids:
        q_ids = (updates.filter(F.col("batch_id") == bid)
                 .select("doc_id"))
        n_q = q_ids.count()
        # which of the 3 splits is this? the one whose quality ids
        # match exactly
        split = next(
            s for s in range(3)
            if (incoming.filter(F.col("doc_id") % 3 == s)
                .filter(_tok().between(30, 100))
                .join(q_ids, "doc_id").count()) == n_q
            and (incoming.filter(F.col("doc_id") % 3 == s)
                 .filter(_tok().between(30, 100)).count()) == n_q)
        inc_batch = incoming.filter(F.col("doc_id") % 3 == split)
        qd, deduped, clean, scored = _compose_reference(
            spark, inc_batch, store, d["bloom"], d["dsir"])
        for sid, name, frame in ((1, "start", inc_batch),
                                 (2, "quality", qd),
                                 (3, "dedup", deduped),
                                 (4, "decontam", clean)):
            want_metrics.add((bid, sid, name, frame.count()))
        for r in scored.select("doc_id", "score_bp").collect():
            want_scored.add((r["doc_id"], r["score_bp"], bid))
        store = store.unionByName(
            updates.filter(F.col("batch_id") == bid).drop("batch_id"))
    assert got_metrics == want_metrics and got_metrics
    assert got_scored == want_scored and got_scored


def test_curation_batch_replay_is_idempotent(spark, sf_dir):
    docs, existing, incoming, d = _setup(spark, sf_dir, "curation_r_")

    def snapshot():
        m = {tuple(r) for r in spark.read.parquet(d["metrics"])
             .collect()}
        o = {(r["doc_id"], r["score_bp"], r["batch_id"]) for r in
             spark.read.parquet(d["out"])
             .select("doc_id", "score_bp", "batch_id").collect()}
        upd = {(r["batch_id"], r["count"]) for r in
               spark.read.parquet(d["signatures"] + "_updates")
               .groupBy("batch_id").count().collect()}
        return m, o, upd

    curation_batch(incoming, 0, d["signatures"], d["bloom"],
                   d["dsir"], d["out"], d["metrics"])
    first = snapshot()
    assert first[0] and first[1]
    curation_batch(incoming, 0, d["signatures"], d["bloom"],
                   d["dsir"], d["out"], d["metrics"])   # crash-replay
    assert snapshot() == first


def test_curation_batch_empty_quality_still_writes_funnel(spark, sf_dir):
    """A micro-batch whose quality cut empties out must still land
    its funnel rows (zeros downstream) and must NOT create an empty
    signature _updates partition — and a following nonempty batch
    must work (the never-created-updates-dir read was a crash)."""
    docs, existing, incoming, d = _setup(spark, sf_dir, "curation_e_")
    # batch 0: every doc fails the token cut (impossible bounds)
    curation_batch(incoming, 0, d["signatures"], d["bloom"],
                   d["dsir"], d["out"], d["metrics"],
                   tok_min=10**6, tok_max=10**6 + 1)
    rows = {(r["stage_id"], r["n_docs"]) for r in
            spark.read.parquet(d["metrics"])
            .filter(F.col("batch_id") == 0).collect()}
    assert rows == {(1, incoming.count()), (2, 0), (3, 0), (4, 0)}
    assert not os.path.exists(d["signatures"] + "_updates")
    # batch 1: normal bounds — must not crash on the missing updates
    curation_batch(incoming, 1, d["signatures"], d["bloom"],
                   d["dsir"], d["out"], d["metrics"])
    assert spark.read.parquet(d["out"]).count() > 0
