"""Streaming expectations: CHECK-constraint policies on the INGEST
path (VERDICT r10 #5).  snapshot_ingest_stream lands micro-batches
into a constrained snapshot table under the quarantine policy — a
malformed event dead-letters to <table>/_quarantine with its
__violated reasons instead of failing the stream or landing in the
table; replay is a no-op on BOTH tables; and the streamed end-state
is flag-exact vs committing the same rows through the batch
quarantine path (the snapshot_expectations funnel's write)."""

import datetime
import os
import tempfile
import time

import pytest
from pyspark.sql import functions as F

from lcmap_blackmagic_spark import storage
from lcmap_blackmagic_spark.streaming.jobs import (EVENT,
                                                   snapshot_ingest_stream)


def _mk_events(spark):
    """Three time-ordered files (= micro-batches at
    maxFilesPerTrigger=1), each carrying one kind of violation."""
    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)

    def ev(i, typ, val):
        return (i, t0 + datetime.timedelta(minutes=i), i % 5, typ,
                val, "{}")

    batches = [
        [ev(1, "view", 10.0), ev(2, "click", -4.0),   # value_pos viol
         ev(3, "view", 3.0)],
        [ev(4, "bogus", 1.0),                         # type_ok viol
         ev(5, "click", 7.0)],
        [ev(6, "bogus", -1.0),                        # both viol
         ev(7, "view", 0.0)],
    ]
    d = tempfile.mkdtemp(prefix="sexp_events_")
    for rows in batches:
        (spark.createDataFrame(rows, EVENT).coalesce(1)
         .write.mode("append").parquet(d))
        time.sleep(0.05)        # distinct mtimes => stable file order
    all_rows = [r for b in batches for r in b]
    return d, spark.createDataFrame(all_rows, EVENT)


CONS = {"value_pos": "value >= 0",
        "type_ok": "event_type <> 'bogus'"}


def _run_stream(spark, events_dir, table_dir, checkpoint):
    q = snapshot_ingest_stream(spark, events_dir, table_dir,
                               checkpoint, available_now=True,
                               max_files_per_trigger=1)
    q.awaitTermination(120)


def _state(spark, table_dir):
    kept = sorted(r["event_id"] for r in
                  storage.read_snapshot(spark, table_dir).collect())
    qdir = os.path.join(table_dir, storage.SNAP_QUARANTINE)
    if storage.latest_version(qdir) is None:
        dead = {}
    else:
        dead = {r["event_id"]: sorted(r["__violated"]) for r in
                storage.read_snapshot(spark, qdir).collect()}
    return kept, dead


def test_quarantine_policy_on_the_ingest_path(spark):
    events_dir, _ = _mk_events(spark)
    table = tempfile.mkdtemp(prefix="sexp_tbl_")
    for name, expr in CONS.items():
        storage.set_snapshot_constraint(table, name, expr)
    _run_stream(spark, events_dir, table,
                tempfile.mkdtemp(prefix="sexp_ck_"))
    kept, dead = _state(spark, table)
    assert kept == [1, 3, 5, 7]
    assert dead == {2: ["value_pos"], 4: ["type_ok"],
                    6: ["type_ok", "value_pos"]}
    # one tagged commit per non-empty micro-batch
    assert storage.latest_version(table) == 3


def test_replay_is_a_noop_on_table_and_quarantine(spark):
    events_dir, _ = _mk_events(spark)
    table = tempfile.mkdtemp(prefix="sexp_tbl_")
    for name, expr in CONS.items():
        storage.set_snapshot_constraint(table, name, expr)
    _run_stream(spark, events_dir, table,
                tempfile.mkdtemp(prefix="sexp_ck_"))
    v1 = storage.latest_version(table)
    state1 = _state(spark, table)
    # a fresh checkpoint re-delivers every batch with the same ids —
    # the crash-replay shape; tags must suppress BOTH table appends
    # and quarantine re-appends
    _run_stream(spark, events_dir, table,
                tempfile.mkdtemp(prefix="sexp_ck2_"))
    assert storage.latest_version(table) == v1
    assert _state(spark, table) == state1
    qdir = os.path.join(table, storage.SNAP_QUARANTINE)
    assert storage.read_snapshot(spark, qdir).count() == 3  # no dups


def test_stream_matches_batch_quarantine_funnel(spark):
    """Flag-exactness: the streamed end-state equals committing the
    same rows through the batch quarantine write — same kept rows,
    same dead rows, same per-constraint violation counts (the
    snapshot_expectations funnel numbers)."""
    events_dir, all_df = _mk_events(spark)
    stbl = tempfile.mkdtemp(prefix="sexp_s_")
    btbl = tempfile.mkdtemp(prefix="sexp_b_")
    for t in (stbl, btbl):
        for name, expr in CONS.items():
            storage.set_snapshot_constraint(t, name, expr)
    _run_stream(spark, events_dir, stbl,
                tempfile.mkdtemp(prefix="sexp_ck_"))
    storage.write_snapshot(all_df, btbl, on_violation="quarantine")
    assert _state(spark, stbl) == _state(spark, btbl)

    def funnel(t):
        qdir = os.path.join(t, storage.SNAP_QUARANTINE)
        q = storage.read_snapshot(spark, qdir)
        per = (q.select(F.explode("__violated").alias("c"))
               .groupBy("c").count().collect())
        return (storage.read_snapshot(spark, t).count(),
                q.count(), sorted((r["c"], r["count"]) for r in per))

    assert funnel(stbl) == funnel(btbl)


def test_fail_policy_stops_the_stream(spark):
    """on_violation='fail' is the strict-contract variant: the bad
    micro-batch refuses to commit and the query errors out; nothing
    from that batch lands."""
    events_dir, _ = _mk_events(spark)
    table = tempfile.mkdtemp(prefix="sexp_f_")
    storage.set_snapshot_constraint(table, "value_pos", "value >= 0")
    q = snapshot_ingest_stream(spark, events_dir, table,
                               tempfile.mkdtemp(prefix="sexp_ckf_"),
                               available_now=True,
                               max_files_per_trigger=1,
                               on_violation="fail")
    with pytest.raises(Exception, match="value_pos"):
        q.awaitTermination(120)
        raise RuntimeError(str(q.exception()))
    # the violating batch is the FIRST: nothing may have landed
    assert storage.latest_version(table) is None
    qdir = os.path.join(table, storage.SNAP_QUARANTINE)
    assert storage.latest_version(qdir) is None   # fail never DLQs
