"""Streaming deterministic weighted sampling
(streaming.jobs.priority_sample_batch / priority_sample_stream):
the persisted winner store after N micro-batches must equal the
batch ``priority_sample`` over the union of all batches — priorities
are a pure function of the row id, so the merge loses nothing — and
a re-delivered batch must leave the store unchanged (idempotent
replay without tags)."""

import os
import tempfile

from pyspark.sql import functions as F

from lcmap_blackmagic_spark.operators.sampling import priority_sample
from lcmap_blackmagic_spark.registry import _t
from lcmap_blackmagic_spark.streaming.jobs import priority_sample_batch

K = 7


def _events(spark, sf_dir):
    return (_t(spark, sf_dir, "events")
            .select("event_id", "event_type",
                    (F.abs(F.hash("event_id")) % 100 + 1)
                    .cast("bigint").alias("w")))


def test_stream_matches_batch_and_replays_idempotently(spark, sf_dir):
    e = _events(spark, sf_dir)
    batches = [e.filter(F.col("event_id") % 3 == i) for i in range(3)]
    store = os.path.join(tempfile.mkdtemp(prefix="pss_"), "winners")
    for i, b in enumerate(batches):
        priority_sample_batch(b, i, store, "w", "event_id", K,
                              group_col="event_type")
    got = sorted(map(tuple, spark.read.parquet(store)
                 .select("event_type", "event_id").collect()))
    want = sorted(map(tuple, priority_sample(
        e, "w", "event_id", K, group_col="event_type")
        .select("event_type", "event_id").collect()))
    assert got == want and got            # flag-exact, non-trivial
    # per-group winner count is capped at K
    from collections import Counter
    assert max(Counter(g for g, _ in got).values()) <= K
    # replaying an already-folded batch is a no-op
    priority_sample_batch(batches[1], 1, store, "w", "event_id", K,
                          group_col="event_type")
    again = sorted(map(tuple, spark.read.parquet(store)
                   .select("event_type", "event_id").collect()))
    assert again == got


def test_ungrouped_stream_matches_batch(spark, sf_dir):
    e = _events(spark, sf_dir)
    store = os.path.join(tempfile.mkdtemp(prefix="pssu_"), "winners")
    for i in range(2):
        priority_sample_batch(e.filter(F.col("event_id") % 2 == i),
                              i, store, "w", "event_id", K)
    got = sorted(r.event_id for r in spark.read.parquet(store).collect())
    want = sorted(r.event_id for r in priority_sample(
        e, "w", "event_id", K).collect())
    assert got == want and len(got) == K
