"""Composed streaming curation WITH the semantic stage (quality →
MinHash ingest dedup → SemDeDup → Bloom decontam → DSIR scoring) —
the streaming twin of the batch ``llm_curation_sem`` funnel.  Pins:
per-batch scored output and funnel metrics equal the batch-side
composition of the shared operators folded in delivered order
(recovered from the two stores' _updates partitions), docs without
an embedding pass the semantic stage, and crash-replay of a
micro-batch is byte-idempotent."""

import os
import tempfile

from pyspark.sql import functions as F

from lcmap_blackmagic_spark.llm.bloomfilter import doc_hit_flags
from lcmap_blackmagic_spark.llm.dedup import (_minhash_doc_aggregate,
                                              minhash_cross_flags)
from lcmap_blackmagic_spark.llm.semdedup import semdedup_cross_flags
from lcmap_blackmagic_spark.llm.text import dsir_doc_scores, dsir_weights
from lcmap_blackmagic_spark.streaming.jobs import (_load_bloom_bits,
                                                   build_bloom_store,
                                                   build_semdedup_store,
                                                   curation_batch,
                                                   curation_stream,
                                                   documents_emb_stream)


def _tok():
    return F.size(F.split(F.lower(F.trim("text")), " "))


def _setup(spark, sf_dir, prefix):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    # doc_id ≡ vec_id (the llm_curation_sem alignment); every 7th
    # incoming doc deliberately arrives WITHOUT an embedding — it
    # must pass the semantic stage (no vector, no evidence)
    joined = docs.join(
        emb.select(F.col("vec_id").alias("doc_id"), "embedding"),
        "doc_id", "left").withColumn(
        "embedding",
        F.when(F.col("doc_id") % 7 == 0,
               F.lit(None).cast("array<float>"))
        .otherwise(F.col("embedding")))
    base_dir = tempfile.mkdtemp(prefix=prefix)
    d = {k: os.path.join(base_dir, k) for k in
         ("incoming", "signatures", "sem", "bloom", "dsir", "out",
          "metrics", "ckpt")}
    existing = joined.filter(F.col("source") != "src1")
    _minhash_doc_aggregate(existing, "doc_id", "text", 3, 8) \
        .write.mode("overwrite").parquet(d["signatures"])
    build_semdedup_store(
        emb.join(existing.select(F.col("doc_id").alias("vec_id")),
                 "vec_id", "semi"), d["sem"])
    build_bloom_store(docs.filter(F.col("source") == "src0"),
                      d["bloom"])
    dsir_weights(docs.filter(F.col("source") == "src0"),
                 docs.filter(F.col("source") != "src0")) \
        .write.mode("overwrite").parquet(d["dsir"])
    incoming = joined.filter(F.col("source") == "src1")
    return joined, existing, incoming, d


def test_sem_curation_stream_matches_batch_fold(spark, sf_dir):
    joined, existing, incoming, d = _setup(spark, sf_dir, "cur_sem_")
    for i in range(3):
        (incoming.filter(F.col("doc_id") % 3 == i)
         .coalesce(1).write.mode("append").parquet(d["incoming"]))

    q = (curation_stream(documents_emb_stream(spark, d["incoming"]),
                         d["signatures"], d["bloom"], d["dsir"],
                         d["out"], d["metrics"],
                         sem_store_dir=d["sem"])
         .option("checkpointLocation", d["ckpt"])
         .trigger(availableNow=True).start())
    q.awaitTermination(240)

    got_scored = {(r["doc_id"], r["score_bp"], r["batch_id"]) for r in
                  spark.read.parquet(d["out"])
                  .select("doc_id", "score_bp", "batch_id").collect()}
    got_metrics = {(r["batch_id"], r["stage_id"], r["stage"],
                    r["n_docs"])
                   for r in spark.read.parquet(d["metrics"]).collect()}

    # fold the batch-side composition in delivered order, recovered
    # from the two stores' _updates partitions (the house recipe)
    sig_upd = spark.read.parquet(d["signatures"] + "_updates")
    sem_upd = spark.read.parquet(d["sem"] + "_updates")
    done_sig = spark.read.parquet(d["signatures"])
    done_sem = spark.read.parquet(d["sem"])
    bits = _load_bloom_bits(spark, d["bloom"])
    wtab = spark.read.parquet(d["dsir"])
    bids = sorted(r["batch_id"] for r in
                  sig_upd.select("batch_id").distinct().collect())
    assert len(bids) == 3
    want_scored, want_metrics = set(), set()
    for bid in bids:
        inc_sig = (sig_upd.filter(F.col("batch_id") == bid)
                   .drop("batch_id"))
        q_ids = {r["doc_id"] for r in
                 inc_sig.select("doc_id").collect()}
        lex_flagged = {r["inc_id"] for r in
                       minhash_cross_flags(inc_sig, done_sig,
                                           threshold=0.2).collect()}
        dedup_ids = q_ids - lex_flagged
        inc_vec = (sem_upd.filter(F.col("batch_id") == bid)
                   .drop("batch_id"))
        sem_flagged = {r["incoming_id"] for r in
                       semdedup_cross_flags(inc_vec,
                                            done_sem).collect()}
        # embedding-less docs are never staged, so never flagged
        assert all(i % 7 != 0 for i in sem_flagged)
        sem_ids = dedup_ids - sem_flagged
        sem_docs = incoming.filter(
            F.col("doc_id").isin(list(sem_ids)))
        clean = (sem_docs.join(doc_hit_flags(sem_docs, bits),
                               "doc_id", "left")
                 .filter(~F.coalesce(F.col("__hit"), F.lit(False)))
                 .drop("__hit"))
        scored = clean.join(dsir_doc_scores(clean, wtab), "doc_id")
        n_clean = 0
        for r in scored.select("doc_id", "score_bp").collect():
            want_scored.add((r["doc_id"], r["score_bp"], bid))
            n_clean += 1
        want_metrics |= {(bid, 2, "quality", len(q_ids)),
                         (bid, 3, "dedup", len(dedup_ids)),
                         (bid, 4, "semdedup", len(sem_ids)),
                         (bid, 5, "decontam", n_clean)}
        done_sig = done_sig.unionByName(inc_sig)
        done_sem = done_sem.unionByName(inc_vec)

    assert got_scored == want_scored and got_scored
    assert {m for m in got_metrics if m[1] != 1} == want_metrics
    # the semantic stage genuinely dropped something in some batch
    by = {}
    for bid, sid, st, n in got_metrics:
        by[(bid, st)] = n
    assert any(by[(b, "semdedup")] < by[(b, "dedup")] for b in bids)


def test_sem_curation_replay_is_idempotent(spark, sf_dir):
    joined, existing, incoming, d = _setup(spark, sf_dir,
                                           "cur_sem_replay_")
    b0 = incoming.filter(F.col("doc_id") % 2 == 0)
    b1 = incoming.filter(F.col("doc_id") % 2 == 1)

    def run(df, bid):
        curation_batch(df, bid, d["signatures"], d["bloom"],
                       d["dsir"], d["out"], d["metrics"],
                       sem_store_dir=d["sem"])

    def snapshot():
        out = {tuple(r) for r in spark.read.parquet(d["out"])
               .select("doc_id", "score_bp", "batch_id").collect()}
        met = {tuple(r) for r in spark.read.parquet(d["metrics"])
               .select("batch_id", "stage_id", "stage", "n_docs")
               .collect()}
        sem = {(r["batch_id"], r["count"]) for r in
               spark.read.parquet(d["sem"] + "_updates")
               .groupBy("batch_id").count().collect()}
        return out, met, sem

    run(b0, 0)
    run(b1, 1)
    first = snapshot()
    assert first[0]
    run(b1, 1)          # crash-replay
    assert snapshot() == first
