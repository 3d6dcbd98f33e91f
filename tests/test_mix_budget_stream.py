"""Streaming token-budget enforcement: batches delivered in doc_id
order must fold to exactly the batch greedy selection at the same
budget (crossing doc included), a source whose budget is spent
accepts nothing in later batches, and crash-replay is
byte-idempotent (state is derived from the accepted output itself,
so there is no counter to double-apply)."""

import os
import tempfile

from pyspark.sql import functions as F

from lcmap_blackmagic_spark.llm.text import token_count
from lcmap_blackmagic_spark.streaming.jobs import (documents_stream,
                                                   mix_budget_batch,
                                                   mix_budget_stream)

BUDGET = 500   # ~40% of a source's sf0.001 total — the cap must bind


def _accepted(spark, out_dir):
    return {(r["doc_id"], r["source"], r["tok"], r["cum_tok"])
            for r in spark.read.parquet(out_dir)
            .select("doc_id", "source", "tok", "cum_tok").collect()}


def _batch_reference(docs):
    """The batch greedy rule, computed independently row-by-row."""
    rows = sorted(
        ((r["doc_id"], r["source"], r["tok"]) for r in
         docs.select("doc_id", "source",
                     token_count("text").cast("long").alias("tok"))
         .collect()))
    cum, want = {}, set()
    for doc_id, source, tok in rows:
        before = cum.get(source, 0)
        if before < BUDGET:
            want.add((doc_id, source, tok, before + tok))
        cum[source] = before + tok
    return want


def test_stream_fold_equals_batch_greedy_selection(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base = tempfile.mkdtemp(prefix="mix_budget_")
    in_dir = os.path.join(base, "incoming")
    out_dir = os.path.join(base, "accepted")
    ckpt = os.path.join(base, "ckpt")

    # contiguous doc_id ranges => stream arrival order == doc order
    ids = sorted(r["doc_id"] for r in docs.select("doc_id").collect())
    lo, hi = ids[len(ids) // 3], ids[2 * len(ids) // 3]
    parts = [docs.filter(F.col("doc_id") < lo),
             docs.filter((F.col("doc_id") >= lo)
                         & (F.col("doc_id") < hi)),
             docs.filter(F.col("doc_id") >= hi)]
    for p in parts:
        p.coalesce(1).write.mode("append").parquet(in_dir)

    q = (mix_budget_stream(documents_stream(spark, in_dir),
                           out_dir, BUDGET)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(180)

    got = _accepted(spark, out_dir)
    want = _batch_reference(docs)
    assert got == want and got
    # the budget genuinely bit: not everything was accepted
    assert len(got) < docs.count()
    # every source either crossed the budget (greedy: exactly once)
    # or ran out of documents before reaching it
    per, avail = {}, {}
    for _, source, tok, _ in got:
        per[source] = per.get(source, 0) + tok
    for r in docs.select("source",
                         token_count("text").cast("long")
                         .alias("tok")).collect():
        avail[r["source"]] = avail.get(r["source"], 0) + r["tok"]
    for source, total in per.items():
        assert total >= BUDGET or total == avail[source]
    assert any(total >= BUDGET for total in per.values())


def test_exhausted_source_accepts_nothing_later(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base = tempfile.mkdtemp(prefix="mix_budget_exhaust_")
    out_dir = os.path.join(base, "accepted")

    ids = sorted(r["doc_id"] for r in docs.select("doc_id").collect())
    mid = ids[len(ids) // 2]
    b0 = docs.filter(F.col("doc_id") < mid)
    b1 = docs.filter(F.col("doc_id") >= mid)
    mix_budget_batch(b0, 0, out_dir, BUDGET)
    after_b0 = _accepted(spark, out_dir)
    spent = {}
    for _, source, tok, _ in after_b0:
        spent[source] = spent.get(source, 0) + tok
    exhausted = {s for s, total in spent.items() if total >= BUDGET}
    assert exhausted                       # fixture spends some budget
    mix_budget_batch(b1, 1, out_dir, BUDGET)
    b1_rows = {(r["doc_id"], r["source"]) for r in
               spark.read.parquet(out_dir)
               .filter(F.col("batch_id") == 1)
               .select("doc_id", "source").collect()}
    assert not any(s in exhausted for _, s in b1_rows)


def test_replay_is_idempotent(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base = tempfile.mkdtemp(prefix="mix_budget_replay_")
    out_dir = os.path.join(base, "accepted")
    ids = sorted(r["doc_id"] for r in docs.select("doc_id").collect())
    mid = ids[len(ids) // 2]
    b0 = docs.filter(F.col("doc_id") < mid)
    b1 = docs.filter(F.col("doc_id") >= mid)
    mix_budget_batch(b0, 0, out_dir, BUDGET)
    mix_budget_batch(b1, 1, out_dir, BUDGET)
    first = _accepted(spark, out_dir)
    mix_budget_batch(b1, 1, out_dir, BUDGET)   # crash-replay
    assert _accepted(spark, out_dir) == first
    mix_budget_batch(b0, 0, out_dir, BUDGET)   # out-of-order replay
    assert _accepted(spark, out_dir) == first
